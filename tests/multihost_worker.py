"""Worker for the multi-host (multi-process) mesh test.

Launched twice by tests/test_parallel.py::test_multihost_two_process_mesh
(SURVEY.md §4's multi-process CPU simulation pattern): each process gets 2
virtual CPU devices, joins a 2-process jax.distributed job (global mesh of
4), solves its local half of a 4-trajectory batch under shard_map, and
checks the psum'd global stats against a locally-computed reference.

Usage: python tests/multihost_worker.py <coordinator> <num_procs> <pid>
"""

import sys

coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mpc_motion_planner_tpu.parallel.mesh import (  # noqa: E402
    initialize_multihost,
)

# must run before any other jax device use
initialize_multihost(
    coordinator, num_procs, pid, local_device_count=2
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mpc_motion_planner_tpu.ops.qp import QPSettings  # noqa: E402
from mpc_motion_planner_tpu.ops.sqp import SQPSettings  # noqa: E402
from mpc_motion_planner_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    shard_batch_multihost,
    sharded_solve_fn,
)
from mpc_motion_planner_tpu.planner import Margins, MotionPlanner  # noqa: E402

assert jax.process_count() == num_procs
assert len(jax.devices()) == 2 * num_procs, jax.devices()

planner = MotionPlanner(
    margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1),
    sqp_settings=SQPSettings(max_iter=1),
    qp_settings=QPSettings(
        max_iter=50, check_every=10, rho_update_every=0, backend="structured"
    ),
)

B = 2 * num_procs * 1  # one trajectory per global device
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
q0, v0 = planner.sample_random_state(k1, (B,))
q1, v1 = planner.sample_random_state(k2, (B,))
cur = np.asarray(jnp.concatenate([q0, v0], -1))
tgt = np.asarray(jnp.concatenate([q1, v1], -1))

# local reference (all B problems on this process, no mesh)
sol_ref = jax.jit(lambda c, t: planner.solve(c, t))(
    jnp.asarray(cur), jnp.asarray(tgt)
)
ref_mean = float(jnp.mean(sol_ref.violation))
ref_max = float(jnp.max(sol_ref.violation))

# global mesh over both processes; each contributes its local slice
mesh = make_mesh()
lo = pid * (B // num_procs)
hi = lo + B // num_procs
cur_s, tgt_s = shard_batch_multihost(mesh, (cur[lo:hi], tgt[lo:hi]))
assert cur_s.shape == (B, 14), cur_s.shape

step = sharded_solve_fn(planner, mesh)
sol, stats = step(cur_s, tgt_s)

# stats are global psum-style reductions: every process sees the same
# values, equal to the local all-B reference
got_mean = float(jax.device_get(stats["mean_violation"].addressable_shards[0].data))
got_max = float(jax.device_get(stats["max_violation"].addressable_shards[0].data))
np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-8)
np.testing.assert_allclose(got_max, ref_max, rtol=1e-8)

# the local output shards match the corresponding reference slice
z_local = np.concatenate(
    [np.asarray(jax.device_get(s.data)) for s in sol.z.addressable_shards]
)
z_ref = np.asarray(sol_ref.z)[lo:hi]
np.testing.assert_allclose(z_local, z_ref, atol=2e-8)

print(f"MULTIHOST_OK pid={pid}", flush=True)
