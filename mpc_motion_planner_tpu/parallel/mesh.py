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


def shard_map_solve_fn(planner, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Per-shard dispatch of the FULL solve — the form that covers the fused
    Pallas backends (``backend='pallas'`` / ``'structured_pallas'``).

    GSPMD cannot partition a ``pallas_call`` grid or the host-side
    lane-major reshapes around it, so the production kernel path scales out
    with :func:`jax.shard_map` instead: every device runs the complete
    planner solve on its local batch shard (the workload is pure data
    parallelism — zero intra-solve communication), and the aggregate stats
    are batch-global reductions computed on the sharded outputs outside the
    shard_map (XLA inserts the psum-style collectives over ICI).

    The batch must divide evenly by the mesh size (callers pad; the solver
    itself pads each local batch to the kernel's lane multiple).

    Returns fn(current, target) -> (Solution, stats dict), jitted.
    """

    def local_solve(current, target):
        sol = planner.solve(current, target)
        # return only the batched leaves: Solution carries the (static,
        # unbatched) TranscribedOCP, which must not be sharded on batch
        return dict(
            z=sol.z, lam_c=sol.lam_c, lam_x=sol.lam_x,
            violation=sol.violation, qp_iterations=sol.qp_iterations,
            qp_converged=sol.qp_converged, step_sizes=sol.step_sizes,
            warm_start=sol.warm_start,
        )

    sharded = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        # the solve is independent per problem; no collectives inside
        check_vma=False,
    )

    def step(current, target):
        from ..planner import Solution

        sol = Solution(ocp=planner.ocp, **sharded(current, target))
        stats = {
            "mean_violation": jnp.mean(sol.violation),
            "max_violation": jnp.max(sol.violation),
            "mean_qp_iterations": jnp.mean(sol.qp_iterations.astype(jnp.float32)),
            "num_converged": jnp.sum(jnp.all(sol.qp_converged, axis=-1)),
        }
        return sol, stats

    return jax.jit(step)
