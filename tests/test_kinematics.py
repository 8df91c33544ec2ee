import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_motion_planner_tpu.models.panda import TOOL_FRAME, make_panda_model
from mpc_motion_planner_tpu.ops import kinematics, spatial


@pytest.fixture(scope="module")
def model():
    return make_panda_model()


@pytest.fixture(scope="module")
def tool(model):
    return model.frame(TOOL_FRAME)


def _rand_q(rng, n=7):
    lo = np.array([-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973])
    hi = np.array([2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973])
    return jnp.asarray(rng.uniform(lo, hi))


def test_fk_zero_config_tool_height(model, tool):
    """Hand-composed chain at q=0: joint origins climb the z-axis
    (0.333, +0.316, +0.384), the link4/link5 lateral offsets cancel
    (0.0825 - 0.0825), the cumulative flange rotation is Rx(180) so the
    +0.257 m tool offset points DOWN: tool at (0.088, 0, 1.033 - 0.257)."""
    q = jnp.zeros(7)
    R, p = kinematics.fk(model, q)
    Rf, pf = kinematics.frame_placement(model, q, tool)
    # atol reflects the 12-digit pi/2 constants carried by the URDF
    np.testing.assert_allclose(pf, [0.088, 0.0, 0.776], atol=1e-9)
    np.testing.assert_allclose(p[0], [0, 0, 0.333], atol=1e-9)
    np.testing.assert_allclose(p[6], [0.088, 0.0, 1.033], atol=1e-9)
    # flange z-axis flipped at q=0
    np.testing.assert_allclose(R[6] @ np.array([0, 0, 1.0]), [0, 0, -1.0], atol=1e-9)
    assert kinematics.frame_height(model, q, tool) == pytest.approx(0.776)


def test_fk_rotation_orthonormal(model, rng):
    q = _rand_q(np.random.default_rng(0))
    R, _ = kinematics.fk(model, q)
    for i in range(7):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-12)


def test_frame_jacobian_vs_autodiff(model, tool):
    """Linear rows equal d p_f / dq; angular rows satisfy
    skew(w_i) = (dR/dq_i) R^T."""
    rng = np.random.default_rng(1)
    q = _rand_q(rng)
    J = kinematics.frame_jacobian(model, q, tool)

    dp = jax.jacfwd(lambda qq: kinematics.frame_placement(model, qq, tool)[1])(q)
    np.testing.assert_allclose(J[:3], dp, atol=1e-10)

    dR = jax.jacfwd(lambda qq: kinematics.frame_placement(model, qq, tool)[0])(q)
    Rf, _ = kinematics.frame_placement(model, q, tool)
    for i in range(7):
        W = np.asarray(dR[..., i] @ Rf.T)
        w = np.array([W[2, 1], W[0, 2], W[1, 0]])
        np.testing.assert_allclose(np.asarray(J[3:, i]), w, atol=1e-10)


def test_local_vs_world_jacobian(model, tool):
    q = _rand_q(np.random.default_rng(2))
    Jw = kinematics.frame_jacobian(model, q, tool)
    Jl = kinematics.frame_jacobian_local(model, q, tool)
    Rf, _ = kinematics.frame_placement(model, q, tool)
    np.testing.assert_allclose(Rf @ Jl[:3], Jw[:3], atol=1e-10)
    np.testing.assert_allclose(Rf @ Jl[3:], Jw[3:], atol=1e-10)


def test_forward_inverse_velocities_roundtrip(model, tool):
    """inverse_velocities is a damped pseudo-inverse: for a feasible task
    velocity the roundtrip should be close (damping 1e-5)."""
    rng = np.random.default_rng(3)
    q = _rand_q(rng)
    lin = jnp.asarray(rng.normal(size=3) * 0.3)
    ang = jnp.zeros(3)
    qdot = kinematics.inverse_velocities(model, q, lin, ang, tool)
    v = kinematics.forward_velocities(model, q, qdot, tool)
    np.testing.assert_allclose(v[:3], lin, atol=1e-3)
    np.testing.assert_allclose(v[3:], ang, atol=1e-3)


def test_inverse_kinematics_converges(model, tool):
    rng = np.random.default_rng(4)
    q_true = _rand_q(rng)
    R_des, p_des = kinematics.frame_placement(model, q_true, tool)
    q0 = q_true + jnp.asarray(rng.normal(size=7) * 0.2)
    q_sol, ok = kinematics.inverse_kinematics(
        model, q0, R_des, p_des, tool, max_iters=300
    )
    assert bool(ok)
    R_sol, p_sol = kinematics.frame_placement(model, q_sol, tool)
    np.testing.assert_allclose(p_sol, p_des, atol=1e-4)
    np.testing.assert_allclose(R_sol, R_des, atol=1e-3)


def test_fk_vmap_jit(model, tool):
    rng = np.random.default_rng(5)
    qs = jnp.stack([_rand_q(rng) for _ in range(4)])
    heights = jax.jit(jax.vmap(lambda q: kinematics.frame_height(model, q, tool)))(qs)
    assert heights.shape == (4,)
    for k in range(4):
        assert heights[k] == pytest.approx(
            float(kinematics.frame_height(model, qs[k], tool))
        )
