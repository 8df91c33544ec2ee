import jax, time, sys
import jax.numpy as jnp, numpy as np
from mpc_motion_planner_tpu.planner import Margins, MotionPlanner
from mpc_motion_planner_tpu.ops.qp import QPSettings
from mpc_motion_planner_tpu.ops.sqp import SQPSettings
from mpc_motion_planner_tpu.bench.harness import chain_states

B = 128
def timeit(name, planner):
    cur, tgt = chain_states(planner, jax.random.PRNGKey(0), B)
    run = jax.jit(planner.solve)
    jax.block_until_ready(run(cur, tgt))
    t0 = time.perf_counter(); jax.block_until_ready(run(cur, tgt)); dt = time.perf_counter()-t0
    print(f"{name}: {dt*1e3:.1f} ms ({B/dt:.1f}/s)")

m = Margins(0.8, 0.8, 0.6, 0.9, 0.1)
# full pallas
timeit("full pallas 700", MotionPlanner(margins=m, qp_settings=QPSettings(backend="pallas")))
# minimal QP budget = everything-else overhead
timeit("qp25 pallas    ", MotionPlanner(margins=m, qp_settings=QPSettings(backend="pallas", max_iter=25, rho_update_every=0)))
# no line search eval cost: sqp 1 iter, qp 25
timeit("sqp1 qp25      ", MotionPlanner(margins=m, sqp_settings=SQPSettings(max_iter=1), qp_settings=QPSettings(backend="pallas", max_iter=25, rho_update_every=0)))
