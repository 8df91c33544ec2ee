import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_motion_planner_tpu.ops import kinematics

from mpc_motion_planner_tpu.models.panda import (
    make_panda_limits,
    make_panda_model,
)
from mpc_motion_planner_tpu.models.urdf import parse_urdf

REFERENCE_URDF = "/root/reference/robot_utils/panda-model/panda_arm.urdf"


@pytest.fixture(scope="module")
def urdf_model():
    if not os.path.exists(REFERENCE_URDF):
        pytest.skip("reference URDF not mounted (oracle cross-check only)")
    return parse_urdf(REFERENCE_URDF)


def test_builtin_model_matches_reference_urdf(urdf_model):
    """The hand-carried Panda constants must agree with parsing the
    reference URDF (fixed-joint fusion included)."""
    m = make_panda_model()
    assert m.joint_names == urdf_model.joint_names
    assert m.joint_types == urdf_model.joint_types
    np.testing.assert_allclose(m.tree_rotation, urdf_model.tree_rotation, atol=1e-12)
    np.testing.assert_allclose(m.tree_translation, urdf_model.tree_translation, atol=1e-12)
    np.testing.assert_allclose(m.axis, urdf_model.axis, atol=1e-12)
    np.testing.assert_allclose(m.mass, urdf_model.mass, atol=1e-12)
    np.testing.assert_allclose(m.com, urdf_model.com, atol=1e-12)
    np.testing.assert_allclose(m.inertia, urdf_model.inertia, atol=1e-12)
    for name in ("panda_tool", "panda_link8"):
        fa, fb = m.frames[name], urdf_model.frames[name]
        assert fa.parent_joint == fb.parent_joint
        np.testing.assert_allclose(fa.rotation, fb.rotation, atol=1e-12)
        np.testing.assert_allclose(fa.translation, fb.translation, atol=1e-12)


def test_tool_fusion(urdf_model):
    """Link 7 composite mass = link7 + 1 kg tool; tool frame at +0.257 m."""
    assert urdf_model.mass[6] == pytest.approx(7.35522e-01 + 1.0)
    np.testing.assert_allclose(
        urdf_model.frames["panda_tool"].translation, [0, 0, 0.257], atol=1e-12
    )
    # fused com lies between the two coms on the z segment
    assert 0.06 < urdf_model.com[6][2] < 0.257


def test_synthetic_urdf_roundtrip():
    """Parser handles inertial rpy rotation and prismatic joints."""
    urdf = """
    <robot name="toy">
      <link name="base"/>
      <link name="l1">
        <inertial>
          <origin rpy="0 0 1.5707963267948966" xyz="0.1 0 0"/>
          <mass value="2.0"/>
          <inertia ixx="1.0" ixy="0" ixz="0" iyy="2.0" iyz="0" izz="3.0"/>
        </inertial>
      </link>
      <link name="l2">
        <inertial><mass value="1.0"/>
          <inertia ixx="0.1" ixy="0" ixz="0" iyy="0.1" iyz="0" izz="0.1"/>
        </inertial>
      </link>
      <joint name="j1" type="revolute">
        <origin xyz="0 0 0.5"/><parent link="base"/><child link="l1"/>
        <axis xyz="0 0 1"/>
      </joint>
      <joint name="j2" type="prismatic">
        <origin xyz="0.2 0 0"/><parent link="l1"/><child link="l2"/>
        <axis xyz="1 0 0"/>
      </joint>
    </robot>
    """
    m = parse_urdf(urdf)
    assert m.joint_types == (0, 1)
    # inertia rotated by 90deg about z swaps ixx/iyy
    np.testing.assert_allclose(np.diag(m.inertia[0]), [2.0, 1.0, 3.0], atol=1e-9)
    np.testing.assert_allclose(m.com[0], [0.1, 0, 0], atol=1e-12)


def test_limits_constants():
    lim = make_panda_limits()
    np.testing.assert_allclose(lim.max_torque, [87, 87, 87, 87, 12, 12, 12])
    np.testing.assert_allclose(
        lim.max_velocity, [2.175, 2.175, 2.175, 2.175, 2.61, 2.61, 2.61]
    )
    assert lim.min_height == 0.05 and lim.max_linear_velocity == 1.7


def test_model_is_pytree():
    import jax

    m = make_panda_model()
    leaves = jax.tree_util.tree_leaves(m)
    assert len(leaves) > 5
    m32 = m.astype("float32")
    assert m32.mass.dtype.name == "float32"


# ---------------------------------------------------------------------------
# Branched-tree URDF (r05): the panda_mass.urdf variant — 7-joint arm +
# hand with TWO prismatic finger joints branching from the same link
# (/root/reference/robot_utils/panda-model/panda_mass.urdf; shipped by the
# reference as data referenced by no code, SURVEY §2.1).
# ---------------------------------------------------------------------------

MASS_URDF = "/root/reference/robot_utils/panda-model/panda_mass.urdf"


@pytest.fixture(scope="module")
def mass_model():
    if not os.path.exists(MASS_URDF):
        pytest.skip("reference panda_mass.urdf not available")
    return parse_urdf(MASS_URDF)


def test_mass_urdf_tree_structure(mass_model):
    m = mass_model
    assert m.nq == 9
    assert m.joint_names[:7] == tuple(f"panda_joint{i}" for i in range(1, 8))
    assert m.joint_names[7:] == ("panda_finger_joint1", "panda_finger_joint2")
    # both fingers branch from joint 7 (index 6) through the fixed hand
    assert m.parent == (-1, 0, 1, 2, 3, 4, 5, 6, 6)
    assert not m.is_serial
    assert m.joint_types[7] == m.joint_types[8] == 1  # prismatic
    # the fixed hand + grasptarget links fold into frames on joint 7
    assert m.frames["panda_hand"].parent_joint == 6
    assert m.frames["panda_grasptarget"].parent_joint == 6
    # ancestor masks: finger 1 moves with the whole arm + itself only
    assert m.ancestor_mask(7) == (True,) * 7 + (True, False)


def test_mass_urdf_fk_matches_arm_chain(mass_model, urdf_model):
    """The arm sub-chain of the branched model must place joints 1-7
    exactly like the serial panda_arm model (identical numbers in both
    URDFs), independent of the finger configuration."""
    rng = np.random.default_rng(5)
    q_arm = jnp.asarray(rng.uniform(-1.5, 1.5, 7))
    for q_f in (jnp.zeros(2), jnp.asarray([0.02, 0.035])):
        q = jnp.concatenate([q_arm, q_f])
        R9, p9 = kinematics.fk(mass_model, q)
        R7, p7 = kinematics.fk(urdf_model, q_arm)
        np.testing.assert_allclose(np.asarray(R9[:7]), np.asarray(R7), atol=1e-12)
        np.testing.assert_allclose(np.asarray(p9[:7]), np.asarray(p7), atol=1e-12)


def test_mass_urdf_finger_fk_is_prismatic(mass_model):
    """Moving a finger joint translates its frame along the world-rotated
    axis by exactly dq and leaves the OTHER branch untouched."""
    rng = np.random.default_rng(6)
    q0 = jnp.asarray(np.concatenate([rng.uniform(-1.5, 1.5, 7), [0.01, 0.02]]))
    dq = 0.015
    q1 = q0.at[7].add(dq)
    R0, p0 = kinematics.fk(mass_model, q0)
    R1, p1 = kinematics.fk(mass_model, q1)
    np.testing.assert_allclose(np.asarray(R0), np.asarray(R1), atol=1e-12)
    # the other finger and the arm do not move
    np.testing.assert_allclose(np.asarray(p0[:7]), np.asarray(p1[:7]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p0[8]), np.asarray(p1[8]), atol=1e-12)
    # finger 1 translates by dq along its world axis
    axis_w = np.asarray(R0[7]) @ np.asarray(mass_model.axis[7])
    np.testing.assert_allclose(
        np.asarray(p1[7] - p0[7]), dq * axis_w, atol=1e-12
    )


def test_mass_urdf_rnea_energy_oracle(mass_model):
    """Tree RNEA vs the Lagrangian oracle: at qdd = 0,
    tau = d/dt dL/dqd - dL/dq = C(q, qd) qd + g(q), and the gravity part
    alone is the potential-energy gradient. Validates the branched
    backward accumulation end-to-end."""
    from mpc_motion_planner_tpu.ops import rnea as R

    rng = np.random.default_rng(7)
    q = jnp.asarray(np.concatenate([rng.uniform(-1.2, 1.2, 7),
                                    [0.015, 0.025]]))
    qd = jnp.asarray(rng.uniform(-1.0, 1.0, 9))
    z = jnp.zeros(9)
    # gravity torques = dPE/dq
    g_rnea = R.rnea(mass_model, q, z, z)
    g_pe = jax.grad(lambda qq: R.potential_energy(mass_model, qq))(q)
    np.testing.assert_allclose(np.asarray(g_rnea), np.asarray(g_pe),
                               rtol=1e-9, atol=1e-10)
    # full bias torques via the Lagrangian: tau = d/dt(dKE/dqd) - dKE/dq + g
    # with qdd = 0: d/dt(dKE/dqd) = dq(dKE/dqd) qd
    dKE_dqd = jax.grad(lambda qq, vv: R.kinetic_energy(mass_model, qq, vv), 1)
    term1 = jax.jacfwd(lambda qq: dKE_dqd(qq, qd))(q) @ qd
    term2 = jax.grad(lambda qq: R.kinetic_energy(mass_model, qq, qd))(q)
    tau_lag = term1 - term2 + g_pe
    tau_rnea = R.rnea(mass_model, q, qd, z)
    np.testing.assert_allclose(np.asarray(tau_rnea), np.asarray(tau_lag),
                               rtol=1e-8, atol=1e-9)
    # mass matrix stays symmetric PSD on the tree
    M = R.crba(mass_model, q)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(np.asarray(M)) > 0)
