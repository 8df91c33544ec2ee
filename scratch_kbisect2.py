"""Kernel-direct test with the real QP path's data features:
inf bounds, rho equality-row contrast, multiple sequential chunk calls."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_motion_planner_tpu.ops.pallas import admm_kernel as pk

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
mode = sys.argv[2] if len(sys.argv) > 2 else "all"  # inf | rho | chunks | all

rng = np.random.default_rng(0)
n, m, n_eq = 419, 488, 336
f32 = jnp.float32
INF = np.float32(np.inf)

A = rng.standard_normal((B, m, n)).astype(np.float32) * 0.1
M = np.einsum("bmi,bmj->bij", A, A) + np.eye(n, dtype=np.float32)[None]
M_inv = np.linalg.inv(M)

lc = np.full((B, m), -1.0, np.float32)
uc = np.full((B, m), 1.0, np.float32)
lx = np.full((B, n), -3.0, np.float32)
ux = np.full((B, n), 3.0, np.float32)
rc = np.full((B, m), 0.1, np.float32)
rx = np.full((B, n), 0.1, np.float32)
if mode in ("inf", "all"):
    lc[:, :n_eq] = uc[:, :n_eq] = 0.0
    uc[:, n_eq + 7 :: 8] = INF  # height rows upper = inf, like the planner
    ux[:, -20:] = INF  # slack columns upper = inf
if mode == "inf1e20":  # same pattern but big-finite instead of inf
    lc[:, :n_eq] = uc[:, :n_eq] = 0.0
    uc[:, n_eq + 7 :: 8] = 1e20
    ux[:, -20:] = 1e20
if mode in ("rho", "all"):
    rc[:, :n_eq] = 100.0  # rho_eq_scale contrast

operands = {
    "M_inv": pk.pad_mat(jnp.asarray(M_inv)),
    "A": pk.pad_mat(jnp.asarray(A)),
    "P": pk.pad_vec(jnp.full((B, n), 0.01, f32)),
    "q": pk.pad_vec(jnp.asarray(rng.standard_normal((B, n)), f32)),
    "lc": pk.pad_vec(jnp.asarray(lc)),
    "uc": pk.pad_vec(jnp.asarray(uc)),
    "lx": pk.pad_vec(jnp.asarray(lx)),
    "ux": pk.pad_vec(jnp.asarray(ux)),
    "rc": pk.pad_vec_ones(jnp.asarray(rc)),
    "rx": pk.pad_vec_ones(jnp.asarray(rx)),
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

n_chunks = 7 if mode in ("chunks", "all") else 1
t0 = time.perf_counter()
for c in range(n_chunks):
    state, used = pk.admm_pallas_chunk(
        operands, state, group=1, chunk_iters=100, check_every=25,
        eps_abs=1e-3, eps_rel=1e-3, sigma=1e-6, alpha=1.6,
        mxu_precision="highest",
    )
jax.block_until_ready(state["x"])
x = np.asarray(state["x"])
print(
    f"OK B={B} mode={mode} chunks={n_chunks}: {time.perf_counter()-t0:.1f}s "
    f"finite={np.isfinite(x).all()} done={np.asarray(state['done']).mean():.2f}",
    flush=True,
)
