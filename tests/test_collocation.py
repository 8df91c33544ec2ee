import jax.numpy as jnp
import numpy as np
import pytest

from mpc_motion_planner_tpu.ops.collocation import (
    cgl_points,
    cheb_diff_matrix,
    clenshaw_curtis_weights,
    derivative_at_nodes,
    interpolate,
    make_collocation,
)


def test_cgl_points_order3():
    np.testing.assert_allclose(cgl_points(3), [0.0, 0.25, 0.75, 1.0], atol=1e-15)


def test_diff_matrix_exact_on_polynomials():
    """D must differentiate polynomials up to the order exactly."""
    for order in (2, 3, 5):
        s = cgl_points(order)
        D = cheb_diff_matrix(order)
        for k in range(order + 1):
            np.testing.assert_allclose(
                D @ s**k, k * s ** max(k - 1, 0) * (1 if k else 0), atol=1e-10
            )


def test_quadrature_exact_on_polynomials():
    for order in (2, 3, 4):
        w = clenshaw_curtis_weights(order)
        s = cgl_points(order)
        assert w.sum() == pytest.approx(1.0)
        for k in range(order + 1):
            np.testing.assert_allclose(w @ s**k, 1.0 / (k + 1), atol=1e-12)


def test_nineteen_nodes():
    coll = make_collocation(3, 6)
    assert coll.num_nodes == 19
    t = np.asarray(coll.time_nodes)
    assert t.shape == (19,)
    assert t[0] == 0.0 and t[-1] == 1.0
    assert np.all(np.diff(t) > 0)
    # segment boundaries at multiples of 1/6
    np.testing.assert_allclose(t[::3], np.arange(7) / 6.0, atol=1e-15)


def test_derivative_at_nodes_sine():
    """Spline derivative of smooth data approximates the true derivative."""
    coll = make_collocation(3, 6)
    t = np.asarray(coll.time_nodes)
    vals = jnp.asarray(np.stack([np.sin(2 * np.pi * t), t**3], axis=-1))
    d = derivative_at_nodes(coll, vals)  # (6, 4, 2)
    idx = coll.segment_indices()
    true_d = np.stack([2 * np.pi * np.cos(2 * np.pi * t), 3 * t**2], axis=-1)
    # cubic segments over 1/6 intervals: ~1% relative accuracy on sine
    # (measured max abs error 0.0552 against a 2*pi derivative scale)
    np.testing.assert_allclose(np.asarray(d), true_d[idx], atol=0.06)
    # exact for the cubic component
    np.testing.assert_allclose(np.asarray(d)[..., 1], (3 * t**2)[idx], atol=1e-10)


def test_interpolation_exact_on_piecewise_cubic():
    coll = make_collocation(3, 6)
    t = np.asarray(coll.time_nodes)
    vals = jnp.asarray((2 * t**3 - t + 0.5)[:, None])
    tq = np.linspace(0, 1, 201)
    out = interpolate(coll, vals, jnp.asarray(tq))
    np.testing.assert_allclose(out[:, 0], 2 * tq**3 - tq + 0.5, atol=1e-12)


def test_interpolation_hits_nodes_exactly():
    coll = make_collocation(3, 6)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(19, 3)))
    out = interpolate(coll, vals, coll.time_nodes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vals), atol=1e-12)


def test_interpolation_clamps_out_of_range():
    coll = make_collocation(3, 6)
    vals = jnp.asarray(np.linspace(0, 1, 19)[:, None])
    lo = interpolate(coll, vals, jnp.asarray(-0.5))
    hi = interpolate(coll, vals, jnp.asarray(1.5))
    np.testing.assert_allclose(lo, [0.0], atol=1e-12)
    np.testing.assert_allclose(hi, [1.0], atol=1e-12)
