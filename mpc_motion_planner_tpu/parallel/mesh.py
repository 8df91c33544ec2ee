"""Device-mesh scale-out for batched solves.

The workload's one real parallel axis is the scenario batch (SURVEY.md
§2.3): thousands of independent (start, goal) solves. Scaling is therefore
pure data parallelism over a 1-D mesh — states are sharded over the
``batch`` axis, the whole solve partitions cleanly under GSPMD (every op is
batched elementwise over trajectories apart from cheap scalar reductions in
the solver loops), and cross-device communication is limited to the
benchmark metric reductions (psum of violation counts / residual stats),
which ride ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = BATCH_AXIS):
    """Place a pytree of (B, ...) arrays with the batch dim sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def sharded_solve_fn(planner, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """A jitted solve over the mesh: states sharded on `axis_name`, solver
    state partitioned by GSPMD, plus psum-style aggregate stats.

    Returns fn(current, target) -> (Solution, stats dict with batch-global
    reductions).
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def step(current, target):
        sol = planner.solve(current, target)
        stats = {
            "mean_violation": jnp.mean(sol.violation),
            "max_violation": jnp.max(sol.violation),
            "mean_qp_iterations": jnp.mean(sol.qp_iterations.astype(jnp.float32)),
            "num_converged": jnp.sum(jnp.all(sol.qp_converged, axis=-1)),
        }
        return sol, stats

    return jax.jit(step, in_shardings=(sharding, sharding))
