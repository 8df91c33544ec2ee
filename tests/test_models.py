import os

import numpy as np
import pytest

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
