import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from mpc_motion_planner_tpu.planner import Margins, MotionPlanner
from mpc_motion_planner_tpu.bench.harness import chain_states

planner = MotionPlanner(margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1))
cur, tgt = chain_states(planner, jax.random.PRNGKey(0), 256)
traj = planner.plan_warm_start(cur, tgt)
p_end, v_end, a_end = traj.at_time(traj.duration)
perr = np.abs(np.asarray(p_end) - np.asarray(tgt[:, :7]))
verr = np.abs(np.asarray(v_end) - np.asarray(tgt[:, 7:]))
i, j = np.unravel_index(np.argmax(perr), perr.shape)
print("max pos err:", perr.max(), "at traj", i, "joint", j, " #>1e-3:", (perr.max(1)>1e-3).sum())
print("max vel err:", verr.max())
print("  dp:", float(tgt[i, j] - cur[i, j]), "v0:", float(cur[i, 7+j]), "vf:", float(tgt[i, 7+j]))
print("  duration:", float(traj.duration[i]))
d = np.asarray(traj.phase_dt[i, j]); jk = np.asarray(traj.phase_jerk[i, j])
print("  phase_dt:", d, "sum:", d.sum())
print("  jerks:", jk)
vmax = float((planner.margins.velocity*planner.limits.max_velocity)[j])
amax = float((planner.margins.acceleration*planner.limits.max_acceleration)[j])
jmax = float((planner.margins.jerk*planner.limits.max_jerk)[j])
print("  vmax,amax,jmax:", vmax, amax, jmax)
