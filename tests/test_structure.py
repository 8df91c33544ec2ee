"""Parity of the matrix-free constraint operator vs the dense linearization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_motion_planner_tpu.models.panda import make_panda_model
from mpc_motion_planner_tpu.ocp import make_ocp
from mpc_motion_planner_tpu.ops import structure


@pytest.fixture(scope="module")
def ocp():
    return make_ocp(make_panda_model())


def _random_z(ocp, key, B):
    kq, kv, ku, kp = jax.random.split(key, 4)
    n, nq = ocp.num_nodes, ocp.nq
    X = jnp.concatenate(
        [
            jax.random.uniform(kq, (B, n, nq), minval=-2.0, maxval=2.0),
            jax.random.uniform(kv, (B, n, nq), minval=-2.0, maxval=2.0),
        ],
        axis=-1,
    )
    U = jax.random.uniform(ku, (B, n, nq), minval=-5.0, maxval=5.0)
    p = jax.random.uniform(kp, (B,), minval=0.5, maxval=3.0)
    return jax.vmap(ocp.pack)(X, U, p)


def test_materialize_matches_dense_jacobian(ocp):
    z = _random_z(ocp, jax.random.PRNGKey(0), 2)
    sa = structure.build_structured_A(ocp, z)
    dense = jax.vmap(ocp.constraint_matrix)(z)
    mat = structure.materialize(ocp, sa)
    np.testing.assert_allclose(np.asarray(mat), np.asarray(dense), atol=1e-10)


def test_apply_matches_dense_matvec(ocp):
    B = 3
    z = _random_z(ocp, jax.random.PRNGKey(1), B)
    sa = structure.build_structured_A(ocp, z)
    A = np.asarray(structure.materialize(ocp, sa))
    m, n = A.shape[1], A.shape[2]
    assert n == ocp.num_var

    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal((B, n)))
    w = jnp.asarray(rng.standard_normal((B, m)))
    np.testing.assert_allclose(
        np.asarray(structure.apply_A(ocp, sa, v)),
        np.einsum("bmn,bn->bm", A, np.asarray(v)),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(structure.apply_AT(ocp, sa, w)),
        np.einsum("bmn,bm->bn", A, np.asarray(w)),
        atol=1e-10,
    )


def test_operator_norm_matches_svd(ocp):
    B = 2
    z = _random_z(ocp, jax.random.PRNGKey(2), B)
    sa = structure.build_structured_A(ocp, z)
    rng = np.random.default_rng(3)
    D = jnp.asarray(rng.uniform(0.5, 2.0, (B, ocp.num_var)))
    E = jnp.asarray(rng.uniform(0.5, 2.0, (B, ocp.num_eq + ocp.num_ineq)))
    A = np.asarray(structure.materialize(ocp, sa))
    scaled = np.asarray(E)[:, :, None] * A * np.asarray(D)[:, None, :]
    exact = np.linalg.norm(scaled, ord=2, axis=(1, 2))
    est = np.asarray(structure.operator_norm(ocp, sa, D, E, iters=80))
    np.testing.assert_allclose(est, exact, rtol=1e-3)
