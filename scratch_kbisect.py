"""Kernel-only bisect: call admm_pallas_chunk directly at varying grid size
and chunk length to find what crashes the TPU worker."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_motion_planner_tpu.ops.pallas import admm_kernel as pk

B = int(sys.argv[1])
chunk_iters = int(sys.argv[2])
prec = sys.argv[3] if len(sys.argv) > 3 else "highest"

rng = np.random.default_rng(0)
n, m = 419, 488
f32 = jnp.float32

A = rng.standard_normal((B, m, n)).astype(np.float32) * 0.1
M = np.einsum("bmi,bmj->bij", A, A) + np.eye(n, dtype=np.float32)[None]
M_inv = np.linalg.inv(M)

operands = {
    "M_inv": pk.pad_mat(jnp.asarray(M_inv)),
    "A": pk.pad_mat(jnp.asarray(A)),
    "P": pk.pad_vec(jnp.full((B, n), 0.01, f32)),
    "q": pk.pad_vec(jnp.asarray(rng.standard_normal((B, n)), f32)),
    "lc": pk.pad_vec(jnp.full((B, m), -1.0, f32)),
    "uc": pk.pad_vec(jnp.full((B, m), 1.0, f32)),
    "lx": pk.pad_vec(jnp.full((B, n), -3.0, f32)),
    "ux": pk.pad_vec(jnp.full((B, n), 3.0, f32)),
    "rc": pk.pad_vec_ones(jnp.full((B, m), 0.1, f32)),
    "rx": pk.pad_vec_ones(jnp.full((B, n), 0.1, f32)),
    "D": pk.pad_vec_ones(jnp.ones((B, n), f32)),
    "E": pk.pad_vec_ones(jnp.ones((B, m), f32)),
}
state = {
    "x": pk.pad_vec(jnp.zeros((B, n), f32)),
    "zc": pk.pad_vec(jnp.zeros((B, m), f32)),
    "zx": pk.pad_vec(jnp.zeros((B, n), f32)),
    "yc": pk.pad_vec(jnp.zeros((B, m), f32)),
    "yx": pk.pad_vec(jnp.zeros((B, n), f32)),
    "done": jnp.zeros((B, 1), jnp.int32),
}

t0 = time.perf_counter()
new_state, used = pk.admm_pallas_chunk(
    operands, state, group=1, chunk_iters=chunk_iters, check_every=25,
    eps_abs=1e-3, eps_rel=1e-3, sigma=1e-6, alpha=1.6, mxu_precision=prec,
)
jax.block_until_ready(new_state["x"])
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
new_state, used = pk.admm_pallas_chunk(
    operands, state, group=1, chunk_iters=chunk_iters, check_every=25,
    eps_abs=1e-3, eps_rel=1e-3, sigma=1e-6, alpha=1.6, mxu_precision=prec,
)
jax.block_until_ready(new_state["x"])
dt = time.perf_counter() - t0
print(
    f"OK B={B} chunk={chunk_iters} prec={prec}: run {dt*1e3:.0f} ms "
    f"(compile {compile_s:.0f}s) used[:4]={np.asarray(used[:4])}",
    flush=True,
)
