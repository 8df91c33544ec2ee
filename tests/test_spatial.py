import jax
import jax.numpy as jnp
import numpy as np

from mpc_motion_planner_tpu.ops import spatial


def _numpy_V(w):
    """SO(3) left Jacobian, independent implementation for the log6 oracle."""
    t = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if t < 1e-9:
        return np.eye(3) + 0.5 * W
    return (
        np.eye(3)
        + (1 - np.cos(t)) / t**2 * W
        + (t - np.sin(t)) / t**3 * (W @ W)
    )


def test_skew_cross():
    rng = np.random.default_rng(1)
    v, w = rng.normal(size=3), rng.normal(size=3)
    np.testing.assert_allclose(
        spatial.skew(jnp.asarray(v)) @ w, np.cross(v, w), atol=1e-12
    )


def test_axis_angle_roundtrip_log3():
    rng = np.random.default_rng(2)
    for _ in range(10):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        angle = rng.uniform(-3.0, 3.0)
        R = spatial.axis_angle_to_matrix(jnp.asarray(axis), jnp.asarray(angle))
        # orthonormality
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-12)
        w = np.asarray(spatial.log3(R))
        expected = axis * angle
        # log returns the wrapped representative; compare rotations instead
        R2 = spatial.axis_angle_to_matrix(
            jnp.asarray(w / max(np.linalg.norm(w), 1e-12)),
            jnp.asarray(np.linalg.norm(w)),
        )
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-9)
        if abs(angle) < np.pi:
            np.testing.assert_allclose(w, expected, atol=1e-9)


def test_log3_small_angle():
    w = np.array([1e-9, -2e-9, 3e-9])
    axis = w / np.linalg.norm(w)
    R = spatial.axis_angle_to_matrix(jnp.asarray(axis), jnp.asarray(np.linalg.norm(w)))
    np.testing.assert_allclose(np.asarray(spatial.log3(R)), w, atol=1e-15)


def test_log6_oracle():
    rng = np.random.default_rng(3)
    for _ in range(10):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        angle = rng.uniform(-2.5, 2.5)
        w = axis * angle
        v = rng.normal(size=3)
        R = np.asarray(spatial.axis_angle_to_matrix(jnp.asarray(axis), jnp.asarray(angle)))
        p = _numpy_V(w) @ v
        out = np.asarray(spatial.log6(jnp.asarray(R), jnp.asarray(p)))
        np.testing.assert_allclose(out[:3], v, atol=1e-8)
        np.testing.assert_allclose(out[3:], w, atol=1e-8)


def test_compose_inverse():
    rng = np.random.default_rng(4)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    R = spatial.axis_angle_to_matrix(jnp.asarray(axis), 0.7)
    p = jnp.asarray(rng.normal(size=3))
    Ri, pi = spatial.inverse(R, p)
    Rc, pc = spatial.compose(R, p, Ri, pi)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pc), 0, atol=1e-12)


def test_rpy_matches_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(5)
    rpy = rng.uniform(-np.pi, np.pi, size=3)
    R = np.asarray(spatial.rpy_to_matrix(jnp.asarray(rpy)))
    R_ref = Rotation.from_euler("xyz", rpy).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-12)


def test_spatial_cross_products_match_6x6():
    """cross_motion/cross_force against the explicit 6x6 operator forms."""
    rng = np.random.default_rng(6)
    w, v = rng.normal(size=3), rng.normal(size=3)
    m_w, m_v = rng.normal(size=3), rng.normal(size=3)

    def sk(a):
        return np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])

    # [angular; linear] ordering
    crm = np.block([[sk(w), np.zeros((3, 3))], [sk(v), sk(w)]])
    out = np.concatenate(
        spatial.cross_motion(jnp.asarray(w), jnp.asarray(v), jnp.asarray(m_w), jnp.asarray(m_v))
    )
    np.testing.assert_allclose(out, crm @ np.concatenate([m_w, m_v]), atol=1e-12)

    crf = -crm.T  # force cross operator is minus transpose of motion cross
    f = rng.normal(size=6)
    out_f = np.concatenate(
        spatial.cross_force(jnp.asarray(w), jnp.asarray(v), jnp.asarray(f[:3]), jnp.asarray(f[3:]))
    )
    np.testing.assert_allclose(out_f, crf @ f, atol=1e-12)


def test_inertia_apply_symmetric_psd():
    rng = np.random.default_rng(7)
    mass = jnp.asarray(2.3)
    com = jnp.asarray(rng.normal(size=3) * 0.1)
    A = rng.normal(size=(3, 3)) * 0.1
    inertia = jnp.asarray(A @ A.T + 0.5 * np.eye(3))

    # Build the 6x6 by applying to basis vectors; check symmetry + PSD.
    cols = []
    for k in range(6):
        e = np.zeros(6)
        e[k] = 1.0
        out = spatial.inertia_apply(mass, com, inertia, jnp.asarray(e[:3]), jnp.asarray(e[3:]))
        cols.append(np.concatenate(out))
    I6 = np.stack(cols, axis=1)
    np.testing.assert_allclose(I6, I6.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(I6) > 0)


def test_transforms_are_adjoint():
    """<X* f, v> = <f, X v> duality between motion and force transforms."""
    rng = np.random.default_rng(8)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    E = np.asarray(spatial.axis_angle_to_matrix(jnp.asarray(axis), 1.1)).T
    r = rng.normal(size=3)
    v = rng.normal(size=6)
    f = rng.normal(size=6)

    vw, vv = spatial.transform_motion(jnp.asarray(E), jnp.asarray(r), jnp.asarray(v[:3]), jnp.asarray(v[3:]))
    fw, fv = spatial.transform_force_back(jnp.asarray(E), jnp.asarray(r), jnp.asarray(f[:3]), jnp.asarray(f[3:]))
    lhs = np.dot(f[:3], vw) + np.dot(f[3:], vv)  # <f_B, v_B>
    rhs = np.dot(np.asarray(fw), v[:3]) + np.dot(np.asarray(fv), v[3:])  # <f_A, v_A>
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)
