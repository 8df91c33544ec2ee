#!/usr/bin/env python
"""Microbenchmark of the structured QP backend's per-iteration pieces on
the current default device. Times (per call, batched):

* apply_A / apply_AT (structured constraint operator)
* solve_arrow (group-tridiagonal factored solve)
* assemble + factor (once per solve)
* one fused ADMM iteration-equivalent composite

Usage: python experiments/micro_structured.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mpc_motion_planner_tpu.models.panda import make_panda_model
from mpc_motion_planner_tpu.ocp import make_ocp
from mpc_motion_planner_tpu.ops import qp_structured as qs
from mpc_motion_planner_tpu.ops import structure


def timeit(name, fn, *args, reps=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt*1e3:9.3f} ms")
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dt = jnp.float32
    ocp = make_ocp(make_panda_model(), dtype=dt)
    key = jax.random.PRNGKey(0)
    n_s = ocp.num_nodes
    n = ocp.num_var + n_s
    m = ocp.num_eq + ocp.num_ineq

    kq, kv, ku, kp = jax.random.split(key, 4)
    nodes, nq = ocp.num_nodes, ocp.nq
    X = jax.random.uniform(kq, (B, nodes, 2 * nq), dt, -2.0, 2.0)
    U = jax.random.uniform(ku, (B, nodes, nq), dt, -5.0, 5.0)
    p = jax.random.uniform(kp, (B,), dt, 0.5, 3.0)
    z = jax.vmap(ocp.pack)(X, U, p)

    with jax.default_matmul_precision("highest"):
        sa = jax.jit(lambda z: structure.build_structured_A(ocp, z, n_slack=n_s))(z)
        v = jax.random.normal(kv, (B, n), dt)
        w = jax.random.normal(kv, (B, m), dt)

        f_apply = jax.jit(lambda v: structure.apply_A(ocp, sa, v))
        f_applyT = jax.jit(lambda w: structure.apply_AT(ocp, sa, w))
        timeit("apply_A", f_apply, v)
        timeit("apply_AT", f_applyT, w)

        wr = jnp.abs(jax.random.normal(kv, (B, m), dt)) + 0.1
        K, nx = ocp.coll.order + 1, ocp.nx
        w_eq = wr[:, : ocp.num_eq].reshape(B, -1, K, nx)
        w_g = wr[:, ocp.num_eq :].reshape(B, nodes, -1)
        D = jnp.ones((B, n), dt)
        sig = jnp.ones((B, n), dt)

        f_asm = jax.jit(
            lambda w_eq, w_g: qs.assemble_banded_M(ocp, sa, w_eq, w_g, D, sig)
        )
        Mband, p_col, m_pp = timeit("assemble", f_asm, w_eq, w_g)

        f_fac = jax.jit(
            lambda Mband, p_col, m_pp: qs.factor_arrow(
                Mband, p_col, m_pp, ocp.coll.order
            )
        )
        fac = timeit("factor", f_fac, Mband, p_col, m_pp, reps=10)

        f_solve = jax.jit(
            lambda fac, v: qs.solve_arrow(ocp, fac, ocp.coll.order, v, n_s)
        )
        timeit("solve_arrow", f_solve, fac, v)

        f_ruiz = jax.jit(lambda: qs.ruiz_structured(ocp, sa, 10))
        timeit("ruiz(10)", f_ruiz, reps=10)

        # one ADMM-iteration equivalent: AT, solve, A, elementwise
        def iter_eq(v, w):
            rhs = structure.apply_AT(ocp, sa, w)
            xt = qs.solve_arrow(ocp, fac, ocp.coll.order, rhs, n_s)
            Ax = structure.apply_A(ocp, sa, xt)
            return Ax, xt

        f_iter = jax.jit(iter_eq)
        timeit("iter_equiv(AT+solve+A)", f_iter, v, w)


if __name__ == "__main__":
    main()
