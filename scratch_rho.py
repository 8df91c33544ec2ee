"""rho0 / rho_eq_scale scan on REAL planner QP data (first SQP iteration),
CPU f32 — measures ADMM convergence rate/iterations without recompiling the
whole planner per config."""
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from mpc_motion_planner_tpu.planner import Margins, MotionPlanner
from mpc_motion_planner_tpu.ops import sqp as sqp_mod
from mpc_motion_planner_tpu.ops.qp import QPSettings, solve_box_qp
from mpc_motion_planner_tpu.bench.harness import chain_states

B = 32
planner = MotionPlanner(margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1))
cur, tgt = chain_states(planner, jax.random.PRNGKey(0), B)
ocp = planner.ocp

traj = planner.plan_warm_start(cur, tgt)
z0 = planner.warm_start_vector(traj)
bounds = planner.nlp_bounds(cur, tgt)

with jax.default_matmul_precision("highest"):
    c_eq = jax.vmap(ocp.eq_residual)(z0)
    g = jax.vmap(ocp.ineq_residual)(z0)
    A = jax.vmap(ocp.constraint_matrix)(z0)
    h = jax.vmap(ocp.cost_gradient)(z0)

dt = z0.dtype
P = sqp_mod.hessian_regularization_diag(ocp, (B,), dt, 0.01)
lb_g = jnp.broadcast_to(bounds.lb_ineq, (B, ocp.num_ineq))
ub_g = jnp.broadcast_to(bounds.ub_ineq, (B, ocp.num_ineq))
lc = jnp.concatenate([-c_eq, lb_g - g], axis=-1)
uc = jnp.concatenate([-c_eq, ub_g - g], axis=-1)
lx = jnp.broadcast_to(bounds.lb_var, z0.shape) - z0
ux = jnp.broadcast_to(bounds.ub_var, z0.shape) - z0

for rho in (0.03, 0.1, 0.3, 1.0):
    for eq in (1e2, 1e3, 1e4):
        s = QPSettings(max_iter=700, rho=rho, rho_eq_scale=eq)
        sol = solve_box_qp(P, h, A, lc, uc, lx, ux, s)
        it = np.asarray(sol.iterations)
        print(
            f"rho={rho:<5} eq={eq:<7.0f} conv={np.asarray(sol.converged).mean()*100:3.0f}% "
            f"iters p50={np.percentile(it,50):4.0f} p90={np.percentile(it,90):4.0f} "
            f"|d|={float(jnp.abs(sol.x).max()):.2f}",
            flush=True,
        )
