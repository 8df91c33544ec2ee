"""Minimal URDF parser producing a :class:`RobotModel`.

Covers the URDF subset the reference robots use (serial chains of revolute /
prismatic joints, fixed joints with inertial payloads, inertial origins with
rpy): see /root/reference/robot_utils/panda-model/panda_arm.urdf. Fixed
joints are folded: their subtree inertias are fused into the closest moving
ancestor link (matching pinocchio::urdf::buildModel semantics) and each fixed
child link is registered as a named operational frame, so
``model.frame("panda_tool")`` replaces ``model.getFrameId("panda_tool")``
(/root/reference/robot_utils/pandaWrapper.cpp:11).

Parsing happens in float64 numpy on the host; the resulting model is cast to
the requested dtype.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

from .robot import Frame, PRISMATIC, REVOLUTE, RobotModel

_JOINT_TYPES = {"revolute": REVOLUTE, "continuous": REVOLUTE, "prismatic": PRISMATIC}


def _rpy_matrix(rpy: np.ndarray) -> np.ndarray:
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def _parse_origin(elem: Optional[ET.Element]):
    if elem is None:
        return np.eye(3), np.zeros(3)
    xyz = np.fromstring(elem.get("xyz", "0 0 0"), sep=" ")
    rpy = np.fromstring(elem.get("rpy", "0 0 0"), sep=" ")
    return _rpy_matrix(rpy), xyz


def _parse_inertial(link: ET.Element):
    """Return (mass, com, inertia_about_com) in the link frame."""
    inertial = link.find("inertial")
    if inertial is None:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    mass_el = inertial.find("mass")
    mass = float(mass_el.get("value")) if mass_el is not None else 0.0
    R, com = _parse_origin(inertial.find("origin"))
    inertia_el = inertial.find("inertia")
    if inertia_el is None:
        I = np.zeros((3, 3))
    else:
        g = lambda k: float(inertia_el.get(k, "0"))
        I = np.array(
            [
                [g("ixx"), g("ixy"), g("ixz")],
                [g("ixy"), g("iyy"), g("iyz")],
                [g("ixz"), g("iyz"), g("izz")],
            ]
        )
    # Rotate the inertia from the inertial frame into the link frame.
    return mass, com, R @ I @ R.T


def _skew(v: np.ndarray) -> np.ndarray:
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _fuse_inertia(m1, c1, i1, m2, c2, i2):
    """Fuse two (mass, com, inertia_about_com) triples in a common frame."""
    m = m1 + m2
    if m == 0.0:
        return 0.0, np.zeros(3), i1 + i2
    c = (m1 * c1 + m2 * c2) / m
    # parallel axis both to the new com
    d1, d2 = c1 - c, c2 - c
    shift = lambda mi, d: mi * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
    return m, c, i1 + shift(m1, d1) + i2 + shift(m2, d2)


def parse_urdf(
    source: str,
    gravity=(0.0, 0.0, -9.81),
    dtype=None,
) -> RobotModel:
    """Parse a URDF string or file path into a :class:`RobotModel`.

    Kinematic TREES are supported (r05): a link may carry several child
    joints — e.g. the ``panda_mass.urdf`` variant's hand with two
    prismatic finger joints (/root/reference/robot_utils/panda-model/
    panda_mass.urdf). Joints are emitted in topological (pre-)order and
    each records its parent moving joint; for the serial chains the
    planner uses, ``RobotModel.parent`` stays the implicit default.
    """
    if "<robot" in source:
        root = ET.fromstring(source)
    else:
        root = ET.parse(source).getroot()

    links: Dict[str, ET.Element] = {l.get("name"): l for l in root.findall("link")}
    joints: List[ET.Element] = root.findall("joint")
    child_of: Dict[str, List[ET.Element]] = {}
    has_parent = set()
    for j in joints:
        parent = j.find("parent").get("link")
        child_of.setdefault(parent, []).append(j)
        has_parent.add(j.find("child").get("link"))

    roots = [name for name in links if name not in has_parent]
    if len(roots) != 1:
        raise ValueError(f"expected a single root link, found {roots}")

    joint_types: List[int] = []
    joint_names: List[str] = []
    tree_R: List[np.ndarray] = []
    tree_p: List[np.ndarray] = []
    axes: List[np.ndarray] = []
    masses: List[float] = []
    coms: List[np.ndarray] = []
    inertias: List[np.ndarray] = []
    frames: Dict[str, Frame] = {}

    parents: List[int] = []

    def walk(link_name: str, fixed_R: np.ndarray, fixed_p: np.ndarray, moving_idx: int):
        """Traverse from `link_name`, which sits at (fixed_R, fixed_p) relative
        to the frame of moving joint `moving_idx` (-1 = world)."""
        for j in child_of.get(link_name, []):
            jR, jp = _parse_origin(j.find("origin"))
            R = fixed_R @ jR
            p = fixed_R @ jp + fixed_p
            child = j.find("child").get("link")
            jtype = j.get("type")
            if jtype == "fixed":
                # Fold: fuse the child inertia into the current moving link
                # and register the child link as an operational frame.
                m, c, I = _parse_inertial(links[child])
                if moving_idx < 0:
                    if m != 0.0:
                        raise ValueError("inertial mass attached before any moving joint")
                else:
                    cw = R @ c + p  # com in the moving joint frame
                    Iw = R @ I @ R.T
                    masses[moving_idx], coms[moving_idx], inertias[moving_idx] = _fuse_inertia(
                        masses[moving_idx], coms[moving_idx], inertias[moving_idx], m, cw, Iw
                    )
                frames[child] = Frame(moving_idx, R, p)
                walk(child, R, p, moving_idx)
            elif jtype in _JOINT_TYPES:
                idx = len(joint_names)
                parents.append(moving_idx)
                joint_names.append(j.get("name"))
                joint_types.append(_JOINT_TYPES[jtype])
                tree_R.append(R)
                tree_p.append(p)
                ax_el = j.find("axis")
                ax = (
                    np.fromstring(ax_el.get("xyz"), sep=" ")
                    if ax_el is not None
                    else np.array([1.0, 0.0, 0.0])
                )
                norm = np.linalg.norm(ax)
                axes.append(ax / norm if norm > 0 else ax)
                m, c, I = _parse_inertial(links[child])
                masses.append(m)
                coms.append(c)
                inertias.append(I)
                frames[child] = Frame(idx, np.eye(3), np.zeros(3))
                walk(child, np.eye(3), np.zeros(3), idx)
            else:
                raise ValueError(f"unsupported joint type '{jtype}'")

    walk(roots[0], np.eye(3), np.zeros(3), -1)

    model = RobotModel(
        joint_types=tuple(joint_types),
        joint_names=tuple(joint_names),
        tree_rotation=np.stack(tree_R),
        tree_translation=np.stack(tree_p),
        axis=np.stack(axes),
        mass=np.asarray(masses),
        com=np.stack(coms),
        inertia=np.stack(inertias),
        gravity=np.asarray(gravity, dtype=np.float64),
        frames=frames,
        parent=tuple(parents),
    )
    if dtype is not None:
        model = model.astype(dtype)
    return model
