"""Parity tests for the fused per-node constraints kernel
(ops/pallas/constraints_kernel.py) — interpret mode off-TPU.

The kernel is the TPU fast path behind ocp.ineq_residual_batch /
ocp.linearize_constraints_batch (auto-enabled on TPU only); these tests
pin its values and exact Jacobians against the reference jacfwd path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_motion_planner_tpu.ops.pallas.constraints_kernel import (
    bake_model,
    fused_node_constraints,
)
from mpc_motion_planner_tpu.planner import Margins, MotionPlanner


@pytest.fixture(scope="module")
def planner():
    return MotionPlanner(margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1))


def test_fused_constraints_match_jacfwd_path(planner):
    """Values AND 21-tangent in-kernel Jacobians match the XLA
    ineq_residual / jacfwd node_constraint_jacobians to f32 rounding —
    including the (S*L)-padding path (F=57 not a multiple of 2*4)."""
    ocp = planner.ocp
    B = 3
    key = jax.random.PRNGKey(1)
    z = (jax.random.normal(key, (B, ocp.num_var)) * 0.4).astype(jnp.float32)
    X, U, _ = ocp.unpack(z)

    g_ref = jax.vmap(ocp.ineq_residual)(z).reshape(B, ocp.num_nodes, ocp.ng)
    J_ref = jax.vmap(ocp.node_constraint_jacobians)(z)

    g, J = fused_node_constraints(
        ocp, X, U, with_jac=True, sublanes=2, lanes=4
    )
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(J), np.asarray(J_ref), rtol=2e-4, atol=5e-5
    )


def test_bake_model_rejects_prismatic(planner):
    import dataclasses

    model = planner.model
    bad = dataclasses.replace(
        model, joint_types=(1,) + tuple(model.joint_types[1:])
    )
    with pytest.raises(NotImplementedError):
        bake_model(bad, planner.ocp.tool_frame)
