"""Structure-of-arrays robot model pytree for serial kinematic chains.

Replaces the used slice of ``pinocchio::Model`` (see
/root/reference/robot_utils/pandaWrapper.cpp:5 and
/root/reference/mpc_solver/robot_ocp.hpp:48-53): a serial chain of revolute
or prismatic joints with per-link spatial inertias, plus named operational
frames rigidly attached to a joint (the reference's ``panda_tool``).

The model is a registered dataclass pytree so it can be closed over, donated,
vmapped and sharded like any other JAX value. Fixed URDF joints are folded
at parse time: their child-link inertias are fused into the parent moving
link and their frames recorded in ``frames`` (pinocchio's buildModel does the
same fusion for the zero-mass ``panda_link8`` and the 1 kg ``panda_tool``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

REVOLUTE = 0
PRISMATIC = 1


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Frame:
    """A fixed frame attached to moving joint ``parent_joint``."""

    parent_joint: int = dataclasses.field(metadata={"static": True})
    rotation: jax.Array  # (3,3) frame rotation in the parent joint frame
    translation: jax.Array  # (3,) frame origin in the parent joint frame


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RobotModel:
    """Rigid body model (structure of arrays over joints).

    Joints are stored in topological order (every parent precedes its
    children). ``parent`` holds each joint's parent joint index (-1 =
    world); the empty default means a serial chain (parent = i - 1), the
    only case the reference planner uses — branched trees (the
    ``panda_mass.urdf`` variant's two finger joints) are supported by the
    FK/RNEA/Jacobian layers via the same static tuple."""

    # Static per-joint metadata
    joint_types: Tuple[int, ...] = dataclasses.field(metadata={"static": True})
    joint_names: Tuple[str, ...] = dataclasses.field(metadata={"static": True})

    # (nj, 3, 3) / (nj, 3): fixed placement of joint i frame in parent frame
    tree_rotation: jax.Array
    tree_translation: jax.Array
    # (nj, 3) joint axis in the local joint frame
    axis: jax.Array
    # Composite link inertial parameters, expressed in the joint frame
    mass: jax.Array  # (nj,)
    com: jax.Array  # (nj, 3)
    inertia: jax.Array  # (nj, 3, 3) rotational inertia about the com
    # (3,) gravity acceleration in the world frame
    gravity: jax.Array

    # Named operational frames (static keys)
    frames: Dict[str, Frame] = dataclasses.field(default_factory=dict)

    # Parent joint index per joint (-1 = world); () = serial chain.
    parent: Tuple[int, ...] = dataclasses.field(
        default=(), metadata={"static": True}
    )

    @property
    def nq(self) -> int:
        return len(self.joint_types)

    @property
    def is_serial(self) -> bool:
        return self.parent == () or all(
            p == i - 1 for i, p in enumerate(self.parent)
        )

    def parent_indices(self) -> Tuple[int, ...]:
        """Effective parent index per joint (-1 = world)."""
        return self.parent or tuple(range(-1, self.nq - 1))

    def ancestor_mask(self, joint: int) -> Tuple[bool, ...]:
        """mask[i] = joint i is `joint` or one of its ancestors — the
        joints whose motion moves frames attached to `joint`."""
        par = self.parent_indices()
        mask = [False] * self.nq
        j = joint
        while j >= 0:
            mask[j] = True
            j = par[j]
        return tuple(mask)

    def astype(self, dtype) -> "RobotModel":
        cast = lambda x: jnp.asarray(x, dtype)
        return RobotModel(
            joint_types=self.joint_types,
            joint_names=self.joint_names,
            tree_rotation=cast(self.tree_rotation),
            tree_translation=cast(self.tree_translation),
            axis=cast(self.axis),
            mass=cast(self.mass),
            com=cast(self.com),
            inertia=cast(self.inertia),
            gravity=cast(self.gravity),
            frames={
                k: Frame(f.parent_joint, cast(f.rotation), cast(f.translation))
                for k, f in self.frames.items()
            },
            parent=self.parent,
        )

    def frame(self, name: str) -> Frame:
        return self.frames[name]
