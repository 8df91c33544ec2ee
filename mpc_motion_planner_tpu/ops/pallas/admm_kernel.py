"""Pallas TPU kernel: fused VMEM-resident boxADMM iteration loop.

Performance rationale: the XLA path of :mod:`..qp` re-reads each problem's
KKT inverse (400x400) and constraint matrix (404x400) from HBM on every one
of the <=700 ADMM iterations — ~1.3 MB/element/iteration, which makes the
solver HBM-bandwidth-bound (~93 solves/s on v5e, flat in batch size). This
kernel loads both matrices into VMEM once per problem per CHUNK of
iterations and runs the chunk's loop entirely on-chip, cutting HBM traffic
by ~the chunk length (100x+).

OSQP-style adaptive rho is preserved by chunking: the caller runs the
kernel for `check/update`-sized chunks, evaluates residuals and rescales
rho (with a batched refactorization of the KKT inverse) between chunks —
so the hot loop stays fused while the adaptation semantics match the XLA
path. Full ADMM state (x, zc, zx, yc, yx, done) round-trips through the
kernel; converged elements exit their loop immediately.

Layout: n (variables) and m (constraint rows) both zero-padded to PAD=512
(MXU tile multiple). Vectors are (1, PAD) row vectors; M_inv is symmetric
so `x @ M_inv` IS the matvec; the two A contractions use dot_general on
either dimension. Padded variable entries stay exactly zero by
construction (zero matrix rows/cols + lb = ub = 0 box).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 512  # padded size for both variable and constraint dimensions


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def pad_vec(v):
    """(B, d) -> (B, 1, PAD) zero-padded row vectors."""
    return _pad_to(v, PAD, 1)[:, None, :]


def pad_vec_ones(v):
    """(B, d) -> (B, 1, PAD), padded entries set to 1 (divide-safe)."""
    B = v.shape[0]
    return jnp.concatenate(
        [v, jnp.ones((B, PAD - v.shape[1]), v.dtype)], axis=1
    )[:, None, :]


def pad_mat(M):
    return _pad_to(_pad_to(M, PAD, 1), PAD, 2)


def _admm_kernel(
    M_inv_ref,
    A_ref,
    P_ref,
    q_ref,
    lc_ref,
    uc_ref,
    lx_ref,
    ux_ref,
    rc_ref,
    rx_ref,
    D_ref,
    E_ref,
    x0_ref,
    zc0_ref,
    zx0_ref,
    yc0_ref,
    yx0_ref,
    done0_ref,
    x_out,
    zc_out,
    zx_out,
    yc_out,
    yx_out,
    done_out,
    used_out,
    *,
    chunk_iters: int,
    check_every: int,
    eps_abs: float,
    eps_rel: float,
    sigma: float,
    alpha: float,
):
    M_inv = M_inv_ref[0]  # (PAD, PAD), symmetric
    A = A_ref[0]  # (PAD, PAD): rows = constraints, cols = variables
    P = P_ref[0]  # vectors are (1, PAD) row vectors
    q = q_ref[0]
    lc, uc = lc_ref[0], uc_ref[0]
    lx, ux = lx_ref[0], ux_ref[0]
    rc, rx = rc_ref[0], rx_ref[0]
    D, E = D_ref[0], E_ref[0]

    f32 = jnp.float32
    contract = lambda v, dim: jax.lax.dot_general(
        v, A, (((1,), (dim,)), ((), ())), preferred_element_type=f32
    )
    a_matvec = lambda v: contract(v, 1)  # (1, m) = (A @ v^T)^T
    at_matvec = lambda w: contract(w, 0)  # (1, n) = (A^T @ w^T)^T
    m_solve = lambda v: jnp.dot(v, M_inv, preferred_element_type=f32)

    def residual_check(x, zc, zx, yc, yx):
        Ax = a_matvec(x)
        r_prim = jnp.maximum(
            jnp.max(jnp.abs((Ax - zc) / E)), jnp.max(jnp.abs(D * (x - zx)))
        )
        Aty = at_matvec(yc)
        r_dual = jnp.max(jnp.abs((P * x + q + Aty + yx) / D))
        scale_p = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ax / E)), jnp.max(jnp.abs(zc / E))),
            jnp.maximum(jnp.max(jnp.abs(D * x)), jnp.max(jnp.abs(D * zx))),
        )
        scale_d = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(P * x / D)), jnp.max(jnp.abs(q / D))),
            jnp.maximum(jnp.max(jnp.abs(Aty / D)), jnp.max(jnp.abs(yx / D))),
        )
        eps_p = eps_abs + eps_rel * scale_p
        eps_d = eps_abs + eps_rel * scale_d
        return (r_prim <= eps_p) & (r_dual <= eps_d)

    def cond(state):
        _, _, _, _, _, done, k = state
        return jnp.logical_and(k < chunk_iters, jnp.logical_not(done))

    def body(state):
        x, zc, zx, yc, yx, done, k = state

        rhs = sigma * x - q + at_matvec(rc * zc - yc) + (rx * zx - yx)
        xt = m_solve(rhs)
        zt_c = a_matvec(xt)

        x = alpha * xt + (1.0 - alpha) * x
        zc_arg = alpha * zt_c + (1.0 - alpha) * zc
        zc_new = jnp.clip(zc_arg + yc / rc, lc, uc)
        yc = yc + rc * (zc_arg - zc_new)
        zx_arg = alpha * xt + (1.0 - alpha) * zx
        zx_new = jnp.clip(zx_arg + yx / rx, lx, ux)
        yx = yx + rx * (zx_arg - zx_new)

        k = k + 1
        do_check = jnp.logical_or(k % check_every == 0, k >= chunk_iters)
        # lax.cond so the two extra residual matvecs only run at checkpoints
        conv = jax.lax.cond(
            do_check,
            lambda _: residual_check(x, zc_new, zx_new, yc, yx),
            lambda _: jnp.asarray(False),
            operand=None,
        )
        return x, zc_new, zx_new, yc, yx, conv, k

    state = (
        x0_ref[0],
        zc0_ref[0],
        zx0_ref[0],
        yc0_ref[0],
        yx0_ref[0],
        done0_ref[0, 0, 0] > 0,
        jnp.asarray(0, jnp.int32),
    )
    x, zc, zx, yc, yx, done, k = jax.lax.while_loop(cond, body, state)

    x_out[0] = x
    zc_out[0] = zc
    zx_out[0] = zx
    yc_out[0] = yc
    yx_out[0] = yx
    done_out[0] = jnp.full((1, 1), done.astype(jnp.int32), jnp.int32)
    used_out[0] = jnp.full((1, 1), k, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_iters",
        "check_every",
        "eps_abs",
        "eps_rel",
        "sigma",
        "alpha",
    ),
)
def admm_pallas_chunk(
    operands,
    state,
    *,
    chunk_iters: int,
    check_every: int,
    eps_abs: float,
    eps_rel: float,
    sigma: float,
    alpha: float,
):
    """Run one fused chunk of ADMM iterations.

    operands: dict with padded M_inv/A (B, PAD, PAD) and (B, 1, PAD)
    row-vector P, q, lc, uc, lx, ux, rc, rx, D, E (all float32).
    state: dict with x, zc, zx, yc, yx (B, 1, PAD) and done (B, 1, 1) int32.

    Returns the new state dict plus `used` (B,) iterations executed.
    """
    B = operands["q"].shape[0]
    f32 = jnp.float32

    kernel = functools.partial(
        _admm_kernel,
        chunk_iters=chunk_iters,
        check_every=check_every,
        eps_abs=eps_abs,
        eps_rel=eps_rel,
        sigma=sigma,
        alpha=alpha,
    )

    mat_spec = pl.BlockSpec((1, PAD, PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 1, PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec_shape = jax.ShapeDtypeStruct((B, 1, PAD), f32)
    scalar_shape = jax.ShapeDtypeStruct((B, 1, 1), jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[mat_spec, mat_spec] + [vec_spec] * 15 + [scalar_spec],
        out_specs=(vec_spec,) * 5 + (scalar_spec, scalar_spec),
        out_shape=(vec_shape,) * 5 + (scalar_shape, scalar_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(14.5 * 1024 * 1024),
        ),
    )(
        operands["M_inv"],
        operands["A"],
        operands["P"],
        operands["q"],
        operands["lc"],
        operands["uc"],
        operands["lx"],
        operands["ux"],
        operands["rc"],
        operands["rx"],
        operands["D"],
        operands["E"],
        state["x"],
        state["zc"],
        state["zx"],
        state["yc"],
        state["yx"],
        state["done"],
    )
    x, zc, zx, yc, yx, done, used = out
    new_state = dict(x=x, zc=zc, zx=zx, yc=yc, yx=yx, done=done)
    return new_state, used[:, 0, 0]
