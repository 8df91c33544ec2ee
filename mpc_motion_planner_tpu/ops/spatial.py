"""SO(3)/SE(3) and spatial (6D) vector algebra primitives.

All functions are pure, shape-static, dtype-following, and `vmap`/`jit` friendly.

Conventions
-----------
* Rotations are 3x3 matrices, translations are 3-vectors.
* A rigid placement ("oMi") is the pair ``(R, p)`` mapping local coords to world:
  ``x_world = R @ x_local + p``.
* Spatial *motion* vectors used internally by the dynamics algorithms follow
  Featherstone ordering ``[angular; linear]``.  The public kinematics API
  (task velocities, frame Jacobians) instead follows the ``[linear; angular]``
  ordering of the reference implementation (see
  /root/reference/robot_utils/pandaWrapper.cpp:77 where
  ``task_velocity << linear_velocity, angular_velocity``).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """3-vector -> skew-symmetric matrix such that skew(v) @ w = v x w."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def rpy_to_matrix(rpy):
    """URDF fixed-axis roll/pitch/yaw -> rotation matrix (R = Rz @ Ry @ Rx)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def axis_angle_to_matrix(axis, angle):
    """Rodrigues formula for a unit axis and an angle (both batched-ok)."""
    K = skew(axis)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.eye(3, dtype=K.dtype)
    return eye + s * K + (1.0 - c) * (K @ K)


def compose(R1, p1, R2, p2):
    """Compose two placements: (R1,p1) o (R2,p2)."""
    return R1 @ R2, R1 @ p2 + p1


def inverse(R, p):
    """Inverse placement."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ p)


def log3(R):
    """SO(3) logarithm -> rotation vector (theta * unit_axis).

    Numerically stable near theta = 0 (Taylor) and usable up to theta close
    to pi (the reference's IK error magnitudes stay well below pi).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part: (R - R^T)/2
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # w = 2 sin(theta) * axis ; scale = theta / (2 sin theta)
    small = theta < 1e-6
    sin_theta = jnp.sin(theta)
    safe_sin = jnp.where(small, 1.0, sin_theta)
    scale = jnp.where(small, 0.5 + theta**2 / 12.0, theta / (2.0 * safe_sin))
    return w * scale[..., None]


def _v_inv(w):
    """Inverse of the SO(3) left-Jacobian V(w) used by the SE(3) log.

    V^{-1} = I - 0.5 [w] + (1/t^2)(1 - t sin t / (2 (1-cos t))) [w]^2
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    W = skew(w)
    small = theta < 1e-6
    safe_t2 = jnp.where(small, 1.0, theta2)
    coeff = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - theta * jnp.sin(theta) / (2.0 * (1.0 - jnp.cos(theta)))) / safe_t2,
    )
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + coeff[..., None, None] * (W @ W)


def log6(R, p):
    """SE(3) logarithm -> (linear, angular) 6-vector, pinocchio ordering.

    Mirrors pinocchio::log6 as used by the damped-LS IK loop
    (/root/reference/robot_utils/pandaWrapper.cpp:35).
    """
    w = log3(R)
    v = jnp.einsum("...ij,...j->...i", _v_inv(w), p)
    return jnp.concatenate([v, w], axis=-1)


# ---------------------------------------------------------------------------
# Spatial (6D) vectors, Featherstone [angular; linear] block layout as
# (w, v) tuples of 3-vectors.  Used only inside the dynamics recursions.
# ---------------------------------------------------------------------------


def cross_motion(w1, v1, w2, v2):
    """Spatial cross product of motion vectors: (w1,v1) x (w2,v2)."""
    return jnp.cross(w1, w2), jnp.cross(w1, v2) + jnp.cross(v1, w2)


def cross_force(w, v, fw, fv):
    """Spatial cross product motion x* force: dual of cross_motion."""
    return jnp.cross(w, fw) + jnp.cross(v, fv), jnp.cross(w, fv)


def inertia_apply(mass, com, inertia_com, w, v):
    """Apply a spatial rigid-body inertia to a motion vector.

    Inertia is given by mass, center-of-mass offset `com` (in the same frame
    as (w, v)) and the 3x3 rotational inertia about the center of mass.
    Returns (angular momentum-ish, linear) force-vector pair:
        f_ang = I_o w + m c x v,   f_lin = m v - m c x w
    with I_o the rotational inertia about the frame origin.
    """
    mc = mass[..., None] * com
    # inertia about frame origin: Ic + m (c^T c I - c c^T)
    c2 = jnp.sum(com * com, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=inertia_com.dtype)
    i_o = inertia_com + mass[..., None, None] * (
        c2 * eye - com[..., :, None] * com[..., None, :]
    )
    f_ang = jnp.einsum("...ij,...j->...i", i_o, w) + jnp.cross(mc, v)
    f_lin = mass[..., None] * v - jnp.cross(mc, w)
    return f_ang, f_lin


def transform_motion(E, r, w, v):
    """Transform a motion vector from frame A to frame B.

    B is placed in A at translation `r` with `E` the rotation mapping
    A-coordinates to B-coordinates (E = R_B_in_A^T):
        w_B = E w_A,  v_B = E (v_A - r x w_A)
    """
    return (
        jnp.einsum("...ij,...j->...i", E, w),
        jnp.einsum("...ij,...j->...i", E, v - jnp.cross(r, w)),
    )


def transform_force_back(E, r, fw, fv):
    """Transform a force vector from frame B back to frame A (inverse-dual).

    With (E, r) as in `transform_motion`:
        f_A_lin = E^T f_B_lin
        f_A_ang = E^T f_B_ang + r x (E^T f_B_lin)
    """
    fv_a = jnp.einsum("...ji,...j->...i", E, fv)
    fw_a = jnp.einsum("...ji,...j->...i", E, fw) + jnp.cross(r, fv_a)
    return fw_a, fv_a
