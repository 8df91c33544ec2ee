"""Profiling / tracing utilities.

The reference's only instrumentation is a chrono timer around mpc.solve()
whose result is discarded (/root/reference/mpc_solver/motionPlanner.cpp:
182-196). Here profiling is a first-class subsystem (SURVEY.md §5):

* :func:`trace` — context manager around ``jax.profiler.trace`` for
  XLA/TPU timeline captures viewable in TensorBoard/Perfetto.
* :func:`time_fn` — wall-clock a jitted callable with compile/transfer
  excluded (warmup + block_until_ready), returning solves/s.
* :func:`stage_timings` — decompose a planner solve into its pipeline
  stages (warm start -> linearize -> QP -> line search) by timing each
  stage's jitted closure on the same inputs. Stages are timed separately
  (XLA fuses them in the real solve, so the sum slightly over-counts
  shared work — the numbers are for attribution, not accounting).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, repeats: int = 3, warmup: int = 1) -> Dict[str, float]:
    """Median wall time of ``jax.block_until_ready(fn(*args))`` in seconds."""
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    del out
    times.sort()
    return {
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "max_s": times[-1],
    }


def stage_timings(planner, current_state, target_state, repeats: int = 3):
    """Per-stage wall times of one batched solve.

    Returns a dict of stage -> timing dict (see :func:`time_fn`) with keys
    ``warm_start``, ``linearize``, ``qp``, ``line_search``, ``total`` plus
    ``batch`` and ``solves_per_s`` derived from ``total``.
    """
    from ..ops import sqp as sqp_mod
    from ..ops.qp import solve_box_qp

    ocp = planner.ocp
    B = current_state.shape[0]

    @jax.jit
    def warm(cur, tgt):
        traj = planner.plan_warm_start(cur, tgt)
        return planner.warm_start_vector(traj)

    z0 = warm(current_state, target_state)
    bounds = planner.nlp_bounds(current_state, target_state)

    @jax.jit
    def linearize(z):
        with jax.default_matmul_precision("highest"):
            return (
                jax.vmap(ocp.eq_residual)(z),
                jax.vmap(ocp.ineq_residual)(z),
                jax.vmap(ocp.constraint_matrix)(z),
                jax.vmap(ocp.cost_gradient)(z),
            )

    c_eq, g, A, h = linearize(z0)
    dt = z0.dtype
    P_diag = sqp_mod.hessian_regularization_diag(
        ocp, (B,), dt, planner.sqp_settings.reg_eps
    )
    lb_g = jnp.broadcast_to(bounds.lb_ineq, (B, ocp.num_ineq))
    ub_g = jnp.broadcast_to(bounds.ub_ineq, (B, ocp.num_ineq))
    lc = jnp.concatenate([-c_eq, lb_g - g], axis=-1)
    uc = jnp.concatenate([-c_eq, ub_g - g], axis=-1)
    lx = jnp.broadcast_to(bounds.lb_var, z0.shape) - z0
    ux = jnp.broadcast_to(bounds.ub_var, z0.shape) - z0

    @jax.jit
    def qp(P_diag, h, A, lc, uc, lx, ux):
        return solve_box_qp(P_diag, h, A, lc, uc, lx, ux, planner.qp_settings)

    sol = qp(P_diag, h, A, lc, uc, lx, ux)
    d = sol.x

    @jax.jit
    def line_search(z, d, h):
        with jax.default_matmul_precision("highest"):
            mu = jnp.full(z.shape[:1], 10.0, z.dtype)
            return sqp_mod._line_search(
                ocp, bounds, z, d, h, mu, planner.sqp_settings
            )

    total_fn = jax.jit(planner.solve)

    out = {
        "warm_start": time_fn(warm, current_state, target_state, repeats=repeats),
        "linearize": time_fn(linearize, z0, repeats=repeats),
        "qp": time_fn(qp, P_diag, h, A, lc, uc, lx, ux, repeats=repeats),
        "line_search": time_fn(line_search, z0, d, h, repeats=repeats),
        "total": time_fn(total_fn, current_state, target_state, repeats=repeats),
    }
    out["batch"] = B
    out["solves_per_s"] = B / out["total"]["median_s"]
    return out
