#!/usr/bin/env python
"""Convergence diagnostic for the structured QP backend on the chained
benchmark workload.

Replays the QP subproblems exactly as ops/sqp.py poses them (warm start,
elastic height slacks, dual warm starts between SQP steps) and records
per-problem convergence, iteration counts and final residuals for a few
settings variants, to answer:

* where do the unconverged 25-30% sit (primal vs dual residual)?
* does adaptive rho / kkt refinement / a different base rho fix them?

Usage: python experiments/conv_diag.py [batch] [variant ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from mpc_motion_planner_tpu.bench.harness import chain_states
from mpc_motion_planner_tpu.ops import structure
from mpc_motion_planner_tpu.ops.qp import QPSettings
from mpc_motion_planner_tpu.ops.qp_structured import solve_box_qp_structured
from mpc_motion_planner_tpu.ops.sqp import (
    constraint_violation,
    hessian_regularization_diag,
)
from mpc_motion_planner_tpu.planner import Margins, MotionPlanner

VARIANTS = {
    "base": dict(),
    "refine1": dict(kkt_refine=1),
    "rho_adapt50": dict(rho_update_every=50),
    "rho0.5": dict(rho=0.5),
    "rho_adapt25": dict(rho_update_every=25),
}


def qp_stats(planner, cur, tgt, qp_kw):
    """Run the full 2-step SQP, returning per-step QP diagnostics."""
    ocp = planner.ocp
    settings = planner.sqp_settings
    kw = dict(backend="structured", rho_update_every=0)
    kw.update(qp_kw)
    qp_settings = QPSettings(**kw)

    traj = planner.plan_warm_start(cur, tgt)
    z0 = planner.warm_start_vector(traj)
    bounds = planner.nlp_bounds(cur, tgt, None)

    B = z0.shape[0]
    dt = z0.dtype
    n = ocp.num_var
    m = ocp.num_eq + ocp.num_ineq
    n_s = ocp.num_nodes

    lb_var = jnp.broadcast_to(bounds.lb_var, z0.shape)
    ub_var = jnp.broadcast_to(bounds.ub_var, z0.shape)
    lb_g = jnp.broadcast_to(bounds.lb_ineq, (B, ocp.num_ineq))
    ub_g = jnp.broadcast_to(bounds.ub_ineq, (B, ocp.num_ineq))
    mu_s = jnp.asarray(settings.slack_penalty, dt)
    inf = jnp.asarray(jnp.inf, dt)

    @jax.jit
    def run(z0):
        from mpc_motion_planner_tpu.ops.sqp import _line_search

        z = z0
        lam_c = jnp.zeros((B, m), dt)
        lam_x = jnp.zeros((B, n), dt)
        out = []
        with jax.default_matmul_precision("highest"):
            for _ in range(settings.max_iter):
                c_eq = jax.vmap(ocp.eq_residual)(z)
                g = jax.vmap(ocp.ineq_residual)(z)
                sa = structure.build_structured_A(ocp, z, n_slack=n_s)
                h = jax.vmap(ocp.cost_gradient)(z)
                P_diag = hessian_regularization_diag(
                    ocp, (B,), dt, settings.reg_eps
                )
                lc = jnp.concatenate([-c_eq, lb_g - g], axis=-1)
                uc = jnp.concatenate([-c_eq, ub_g - g], axis=-1)
                lx = lb_var - z
                ux = ub_var - z
                P_qp = jnp.concatenate(
                    [P_diag, jnp.full((B, n_s), settings.reg_eps, dt)], axis=-1
                )
                h_qp = jnp.concatenate([h, jnp.full((B, n_s), mu_s)], axis=-1)
                lx_qp = jnp.concatenate([lx, jnp.zeros((B, n_s), dt)], axis=-1)
                ux_qp = jnp.concatenate([ux, jnp.full((B, n_s), inf)], axis=-1)
                yx0 = jnp.concatenate([lam_x, jnp.zeros((B, n_s), dt)], axis=-1)
                qp = solve_box_qp_structured(
                    ocp, sa, P_qp, h_qp, lc, uc, lx_qp, ux_qp, qp_settings,
                    yc0=lam_c, yx0=yx0,
                )
                out.append(
                    (qp.converged, qp.iterations, qp.prim_residual,
                     qp.dual_residual)
                )
                d = qp.x[:, :n]
                y_box = qp.y_box[:, :n]
                mu = jnp.maximum(
                    jnp.max(jnp.abs(qp.y_constraints), axis=-1),
                    jnp.max(jnp.abs(y_box), axis=-1),
                )
                alpha = _line_search(ocp, bounds, z, d, h, mu, settings)
                z = z + alpha[:, None] * d
                lam_c = lam_c + alpha[:, None] * (qp.y_constraints - lam_c)
                lam_x = lam_x + alpha[:, None] * (y_box - lam_x)
            z = jnp.clip(z, lb_var, ub_var)
            viol = constraint_violation(ocp, bounds, z)
        return out, viol

    return run(z0)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    names = sys.argv[2:] or ["base", "refine1", "rho_adapt50"]
    planner = MotionPlanner(margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1))
    key = jax.random.PRNGKey(0)
    cur, tgt = chain_states(planner, key, B)

    for name in names:
        kw = dict(VARIANTS[name])
        t0 = time.perf_counter()
        out, viol = jax.block_until_ready(qp_stats(planner, cur, tgt, kw))
        wall = time.perf_counter() - t0
        print(f"== {name} (B={B}, compile+run {wall:.1f}s) ==")
        for step, (conv, iters, rp, rd) in enumerate(out):
            conv = np.asarray(conv)
            iters = np.asarray(iters)
            rp, rd = np.asarray(rp), np.asarray(rd)
            bad = ~conv
            print(
                f"  step{step}: conv={conv.mean():.3f} "
                f"iters p50/p90/max={np.percentile(iters, 50):.0f}/"
                f"{np.percentile(iters, 90):.0f}/{iters.max()} "
            )
            if bad.any():
                print(
                    f"    unconverged: n={bad.sum()} "
                    f"rp p50/max={np.median(rp[bad]):.2e}/{rp[bad].max():.2e} "
                    f"rd p50/max={np.median(rd[bad]):.2e}/{rd[bad].max():.2e}"
                )
        viol = np.asarray(viol)
        print(f"  violation p50/p90/max={np.median(viol):.3f}/"
              f"{np.percentile(viol, 90):.2f}/{viol.max():.2f}")


if __name__ == "__main__":
    main()
