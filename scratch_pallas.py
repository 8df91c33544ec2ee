import jax, time, sys
import jax.numpy as jnp, numpy as np
from mpc_motion_planner_tpu.planner import Margins, MotionPlanner
from mpc_motion_planner_tpu.ops.qp import QPSettings
from mpc_motion_planner_tpu.bench.harness import chain_states

backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
planner = MotionPlanner(margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1),
                        qp_settings=QPSettings(backend=backend))
cur, tgt = chain_states(planner, jax.random.PRNGKey(0), B)
run = jax.jit(planner.solve)
sol = jax.block_until_ready(run(cur, tgt))
t0 = time.perf_counter(); sol = jax.block_until_ready(run(cur, tgt)); dt = time.perf_counter()-t0
v = np.asarray(sol.violation)
X, _, _ = sol.states(); err = np.abs(np.asarray(X[:, -1] - tgt)).max(-1)
print(f"{backend} B={B}: {B/dt:.1f} solves/s ({dt:.3f}s) viol p50={np.percentile(v,50):.4f} "
      f"p90={np.percentile(v,90):.3f} err p50={np.percentile(err,50):.4f} "
      f"qp_conv={np.asarray(sol.qp_converged).mean():.3f} qp_iters p50={np.percentile(np.asarray(sol.qp_iterations),50):.0f}")
