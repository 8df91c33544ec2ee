import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_motion_planner_tpu.models.panda import make_panda_limits, make_panda_model
from mpc_motion_planner_tpu.ocp import assemble_bounds, make_ocp


@pytest.fixture(scope="module")
def ocp():
    return make_ocp(make_panda_model())


def _rand_z(ocp, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (ocp.num_nodes, ocp.nx)) * scale
    U = rng.uniform(-2, 2, (ocp.num_nodes, ocp.nu)) * scale
    p = np.array([1.7])
    return ocp.pack(jnp.asarray(X), jnp.asarray(U), jnp.asarray(p))


def test_dimensions(ocp):
    assert ocp.num_var == 400
    # Gauss–Lobatto: defects at all 4 local nodes of each of 6 segments
    assert ocp.num_eq == 336
    assert ocp.num_ineq == 152
    assert ocp.num_nodes == 19


def test_pack_unpack_roundtrip(ocp):
    z = _rand_z(ocp)
    X, U, p = ocp.unpack(z)
    z2 = ocp.pack(X, U, p)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=0)
    assert ocp.cost(z) == pytest.approx(float(p))


def test_eq_residual_zero_on_exact_linear_trajectory(ocp):
    """q(tau) = q0 + p * tau * qd with constant qd and u = 0 satisfies the
    scaled dynamics exactly; the spline is degree-1 so defects vanish."""
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.uniform(-1, 1, 7))
    qd = jnp.asarray(rng.uniform(-1, 1, 7))
    p = 2.3
    t = ocp.coll.time_nodes[:, None]
    X = jnp.concatenate([q0 + p * t * qd, jnp.tile(qd, (19, 1))], axis=-1)
    U = jnp.zeros((19, 7))
    z = ocp.pack(X, U, jnp.asarray([p]))
    np.testing.assert_allclose(np.asarray(ocp.eq_residual(z)), 0, atol=1e-10)


def test_eq_jacobian_vs_autodiff(ocp):
    z = _rand_z(ocp, 2)
    A = ocp.eq_jacobian(z)
    A_ad = jax.jacfwd(ocp.eq_residual)(z)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ad), atol=1e-10)


def test_ineq_jacobian_vs_autodiff(ocp):
    z = _rand_z(ocp, 3, scale=0.5)
    A = ocp.ineq_jacobian(z)
    A_ad = jax.jacrev(ocp.ineq_residual)(z)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ad), atol=1e-8)
    # d g / d p is exactly zero (correct math; the reference writes a
    # nonzero value here, see robot_ocp.hpp:138 and the module docstring)
    np.testing.assert_allclose(np.asarray(A[:, -1]), 0, atol=0)


def test_ineq_values_are_torque_and_height(ocp):
    from mpc_motion_planner_tpu.ops import kinematics, rnea

    z = _rand_z(ocp, 4, scale=0.5)
    X, U, _ = ocp.unpack(z)
    g = ocp.ineq_residual(z).reshape(19, 8)
    for k in (0, 7, 18):
        tau = rnea.rnea(ocp.model, X[k, :7], X[k, 7:], U[k])
        h = kinematics.frame_height(ocp.model, X[k, :7], ocp.tool_frame)
        np.testing.assert_allclose(np.asarray(g[k, :7]), np.asarray(tau), atol=1e-12)
        assert g[k, 7] == pytest.approx(float(h))


def test_bounds_assembly(ocp):
    lim = make_panda_limits()
    rng = np.random.default_rng(5)
    cur = jnp.asarray(rng.uniform(-1, 1, 14))
    tgt = jnp.asarray(rng.uniform(-1, 1, 14))
    state_lb = jnp.concatenate([lim.min_position, -lim.max_velocity])
    state_ub = jnp.concatenate([lim.max_position, lim.max_velocity])
    b = assemble_bounds(
        ocp,
        cur,
        tgt,
        state_lb,
        state_ub,
        -lim.max_acceleration,
        lim.max_acceleration,
        0.0,
        10.0,
        jnp.concatenate([-lim.max_torque, jnp.asarray([0.05])]),
        jnp.concatenate([lim.max_torque, jnp.asarray([jnp.inf])]),
    )
    assert b.lb_var.shape == (400,)
    # node 0 pinned
    np.testing.assert_allclose(np.asarray(b.lb_var[:14]), np.asarray(cur), atol=0)
    np.testing.assert_allclose(np.asarray(b.ub_var[:14]), np.asarray(cur), atol=0)
    # node 18 gets target +- eps
    np.testing.assert_allclose(
        np.asarray(b.ub_var[18 * 14 : 19 * 14] - b.lb_var[18 * 14 : 19 * 14]),
        2e-2,
        atol=1e-12,
    )
    # p bounds land at the end
    assert float(b.lb_var[-1]) == 0.0 and float(b.ub_var[-1]) == 10.0
    # torque rows and height rows tile correctly
    assert float(b.lb_ineq[7]) == pytest.approx(0.05)
    assert float(b.ub_ineq[0]) == 87.0


def test_eq_residual_quadratic(ocp):
    """The line search evaluates candidate defects from the exact quadratic
    expansion (c is bilinear in (p, [X; U])); pin it against direct
    evaluation at several step sizes (ops/sqp._line_search)."""
    z = _rand_z(ocp, seed=3)
    d = _rand_z(ocp, seed=4, scale=0.3) - _rand_z(ocp, seed=5, scale=0.2)
    c0, c1, c2 = ocp.eq_residual_quadratic(z, d)
    for a in (0.0, 0.125, 0.5, 1.0):
        direct = ocp.eq_residual(z + a * d)
        quad = c0 + a * c1 + a * a * c2
        np.testing.assert_allclose(
            np.asarray(quad), np.asarray(direct), atol=1e-11
        )


def test_tau_p_column_matches_reference_fill(ocp):
    """tau_p_column=True replays robot_ocp.hpp:124,138: torque rows' p
    column = dtau/dv qdot + dtau/da qddot; height rows stay zero; every
    other column is untouched."""
    import dataclasses

    from mpc_motion_planner_tpu.ops import rnea

    z = _rand_z(ocp, seed=7)
    ocp_ref = dataclasses.replace(ocp, tau_p_column=True)
    A0 = np.asarray(ocp.ineq_jacobian(z))
    A1 = np.asarray(ocp_ref.ineq_jacobian(z))
    np.testing.assert_allclose(A0[:, :-1], A1[:, :-1], atol=0)
    assert np.all(A0[:, -1] == 0)
    X, U, _ = ocp.unpack(z)
    nq, ng = ocp.nq, ocp.ng
    for node in (0, 7, 18):
        x, u = X[node], U[node]
        tau_of = lambda v, a: rnea.rnea(ocp.model, x[:nq], v, a)
        Jv = jax.jacfwd(tau_of, argnums=0)(x[nq:], u)
        Ja = jax.jacfwd(tau_of, argnums=1)(x[nq:], u)
        expect = np.asarray(Jv @ x[nq:] + Ja @ u)
        got = A1[node * ng : node * ng + nq, -1]
        np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-10)
        # height row's p entry stays zero (robot_ocp.hpp:158-160)
        assert A1[node * ng + nq, -1] == 0.0
