"""TPU full-solve measurement matrix: precision x kkt_refine."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_motion_planner_tpu.planner import Margins, MotionPlanner
from mpc_motion_planner_tpu.ops.qp import QPSettings
from mpc_motion_planner_tpu.bench.harness import chain_states

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
prec = sys.argv[2] if len(sys.argv) > 2 else "highest"
refine = int(sys.argv[3]) if len(sys.argv) > 3 else 0
rho_every = int(sys.argv[4]) if len(sys.argv) > 4 else 100
group = int(sys.argv[5]) if len(sys.argv) > 5 else 1

planner = MotionPlanner(
    margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1),
    qp_settings=QPSettings(
        backend="pallas", pallas_precision=prec, kkt_refine=refine,
        rho_update_every=rho_every, pallas_group=group,
    ),
)
cur, tgt = chain_states(planner, jax.random.PRNGKey(0), B)
solve = jax.jit(planner.solve)
t0 = time.perf_counter()
sol = jax.block_until_ready(solve(cur, tgt))
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
sol = jax.block_until_ready(solve(cur, tgt))
dt = time.perf_counter() - t0
v = np.asarray(sol.violation)
X, _, _ = sol.states()
err = np.abs(np.asarray(X[:, -1] - tgt)).max(-1)
it = np.asarray(sol.qp_iterations)
print(
    f"RESULT B={B} prec={prec} IR={refine}: {B/dt:.1f} solves/s ({dt*1e3:.0f} ms) "
    f"viol p50={np.percentile(v,50):.3f} p90={np.percentile(v,90):.2f} "
    f"err_ok={(err < 2e-2).mean()*100:.0f}% conv={np.asarray(sol.qp_converged).mean():.2f} "
    f"iters p50={np.percentile(it,50):.0f} (compile {compile_s:.0f}s)",
    flush=True,
)
