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


def stage_timings_structured(
    planner, current_state, target_state, repeats: int = 3,
    time_factor_kernel: bool | None = None,
):
    """Per-stage wall times of one batched solve on the PRODUCTION path
    (structured / structured_pallas QP backends, diagonal P).

    time_factor_kernel: include the Pallas factor kernel's own timing row.
    Default (None) = only on TPU — off-TPU the solve uses the XLA
    factorization and the kernel would run in interpret mode, whose
    multi-minute CPU compile measures nothing relevant.

    Unlike :func:`stage_timings` (which exercises the dense reference
    path), this decomposes the solve exactly as the structured SQP runs
    it: warm start -> linearize (residuals + matrix-free structured A +
    cost gradient) -> Ruiz -> banded-KKT assembly+factorization (both the
    XLA node-sequential path and the lane-major Pallas kernel, timed
    separately so the factor kernel's speedup is measured, not asserted)
    -> the full QP stage -> line search -> total. Stages are timed as
    separate jitted closures on identical inputs; XLA fuses them inside
    the real solve, so the sum over-counts slightly — attribution, not
    accounting.
    """
    import jax.numpy as jnp

    from ..ops import sqp as sqp_mod
    from ..ops.qp import QPSettings, _rho_pattern
    from ..ops.qp_structured import (
        assemble_banded_M,
        factor_banded,
        ruiz_structured,
        solve_box_qp_structured,
    )
    from ..ops.structure import build_structured_A

    ocp = planner.ocp
    B = current_state.shape[0]
    settings: QPSettings = planner.qp_settings

    @jax.jit
    def warm(cur, tgt):
        traj = planner.plan_warm_start(cur, tgt)
        return planner.warm_start_vector(traj)

    z0 = warm(current_state, target_state)
    bounds = planner.nlp_bounds(current_state, target_state)

    @jax.jit
    def linearize(z):
        # exactly the production SQP linearization: the fused constraints
        # kernel on TPU (values + exact Jacobians in one launch), the
        # jacfwd XLA path elsewhere — ocp.linearize_constraints_batch
        with jax.default_matmul_precision("highest"):
            c_eq = jax.vmap(ocp.eq_residual)(z)
            g, J = ocp.linearize_constraints_batch(z)
            return (
                c_eq,
                g,
                build_structured_A(ocp, z, J=J),
                jax.vmap(ocp.cost_gradient)(z),
            )

    c_eq, g, sa, h = linearize(z0)
    dt = jnp.float32  # the kernel path casts to f32 at the boundary
    sa32 = jax.tree_util.tree_map(lambda a: a.astype(dt), sa)
    P_diag = sqp_mod.hessian_regularization_diag(
        ocp, (B,), dt, planner.sqp_settings.reg_eps
    )
    lb_g = jnp.broadcast_to(bounds.lb_ineq, (B, ocp.num_ineq))
    ub_g = jnp.broadcast_to(bounds.ub_ineq, (B, ocp.num_ineq))
    lc = jnp.concatenate([-c_eq, lb_g - g], axis=-1).astype(dt)
    uc = jnp.concatenate([-c_eq, ub_g - g], axis=-1).astype(dt)
    lx = (jnp.broadcast_to(bounds.lb_var, z0.shape) - z0).astype(dt)
    ux = (jnp.broadcast_to(bounds.ub_var, z0.shape) - z0).astype(dt)
    h32 = h.astype(dt)

    @jax.jit
    def ruiz():
        with jax.default_matmul_precision("highest"):
            D, E = ruiz_structured(ocp, sa32, settings.ruiz_iters)
            return D.astype(dt), E.astype(dt)

    D, E = ruiz()
    K, nx = ocp.coll.order + 1, ocp.nx
    rho = jnp.full((B,), settings.rho, dt)
    pat_c = _rho_pattern(lc, uc, settings)
    pat_x = _rho_pattern(lx, ux, settings)
    rc = rho[:, None] * pat_c
    rx = rho[:, None] * pat_x
    sig = D * P_diag * D + jnp.asarray(settings.sigma, dt) + rx

    @jax.jit
    def assemble():
        with jax.default_matmul_precision("highest"):
            w = E * E * rc
            w_eq = w[:, : ocp.num_eq].reshape(B, -1, K, nx)
            w_g = w[:, ocp.num_eq :].reshape(B, ocp.num_nodes, -1)
            return assemble_banded_M(ocp, sa32, w_eq, w_g, D, sig)

    Mband, p_col, m_pp = assemble()

    @jax.jit
    def factor_xla(Mband, p_col, m_pp):
        with jax.default_matmul_precision("highest"):
            return factor_banded(Mband, p_col, m_pp, ocp.coll.order)

    if time_factor_kernel is None:
        time_factor_kernel = jax.default_backend() == "tpu"

    @jax.jit
    def factor_kernel(Mband, p_col, m_pp):
        from ..ops.pallas.banded_factor import factor_banded_pallas

        return factor_banded_pallas(Mband, p_col, m_pp, ocp.coll.order)

    if settings.backend == "structured_pallas":
        from ..ops.pallas.structured_admm import (
            solve_box_qp_structured_pallas as qp_solver,
        )
    else:
        qp_solver = solve_box_qp_structured

    # soft elastic rows exactly as the SQP builds them (SQPSettings)
    m = ocp.num_eq + ocp.num_ineq
    sqp_set = planner.sqp_settings
    soft_c = None
    if sqp_set.slack_penalty > 0:
        soft_c = jnp.zeros((B, m), dt).at[:, ocp.num_eq :].set(
            sqp_set.slack_penalty
        )
    soft_x = None
    if sqp_set.box_slack_penalty > 0:
        nodes, nx_, nu_ = ocp.num_nodes, ocp.nx, ocp.nu
        wx = jnp.zeros((ocp.num_var,), dt)
        wx = wx.at[nx_ : (nodes - 1) * nx_].set(sqp_set.box_slack_penalty)
        wx = wx.at[nodes * nx_ : nodes * (nx_ + nu_)].set(
            sqp_set.box_slack_penalty
        )
        soft_x = jnp.broadcast_to(wx, (B, ocp.num_var))

    @jax.jit
    def qp_stage(h32, lc, uc, lx, ux):
        return qp_solver(
            ocp, sa32, P_diag, h32, lc, uc, lx, ux, settings,
            soft_c=soft_c, soft_x=soft_x,
        )

    sol = qp_stage(h32, lc, uc, lx, ux)
    d = sol.x.astype(z0.dtype)

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
        "ruiz": time_fn(ruiz, repeats=repeats),
        "assemble_banded": time_fn(assemble, repeats=repeats),
        "factor_xla": time_fn(factor_xla, Mband, p_col, m_pp, repeats=repeats),
        "qp": time_fn(qp_stage, h32, lc, uc, lx, ux, repeats=repeats),
        "line_search": time_fn(line_search, z0, d, h, repeats=repeats),
        "total": time_fn(total_fn, current_state, target_state, repeats=repeats),
    }
    if time_factor_kernel:
        out["factor_kernel"] = time_fn(
            factor_kernel, Mband, p_col, m_pp, repeats=repeats
        )
    out["batch"] = B
    out["solves_per_s"] = B / out["total"]["median_s"]
    # the ADMM iteration loop = QP stage minus its setup (attribution);
    # the in-solve factor is the kernel on TPU, the XLA path elsewhere
    fkey = "factor_kernel" if time_factor_kernel else "factor_xla"
    out["admm_loop_derived_s"] = max(
        out["qp"]["median_s"]
        - out["ruiz"]["median_s"]
        - out["assemble_banded"]["median_s"]
        - out[fkey]["median_s"],
        0.0,
    )
    return out


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
