"""Pallas TPU kernel: lane-major block-banded Cholesky + arrow factorization.

Why this kernel exists: the measured round-3 stage breakdown of the
production solve (B=1024, v5e) put `factor_banded` — the XLA node-sequential
banded Cholesky feeding the fused ADMM kernel — at ~129 ms, 2.5x the cost
of the ENTIRE 700-iteration fused ADMM loop (~52 ms). The XLA path runs 19
sequential `jnp.linalg.cholesky` / `triangular_solve` / tiny-einsum ops on
(B, 22, 22) blocks: each is a separate dispatch whose 22x22 shape wastes
the MXU (22/128 lanes) and pays full op overhead, so the factorization is
overhead-bound, not flop-bound (~70 MFLOP of real work).

This kernel puts the batch on the LANE axis (128 problems/program, the
same layout as ops/pallas/structured_admm.py) and runs the whole node
recursion in VMEM: per node, the band Schur updates, an unrolled 22-column
lane-parallel Cholesky, an unrolled 22-row forward-substitution inverse of
the diagonal factor, and the subdiagonal column blocks — pure VPU
broadcast-multiply-reduce with zero HBM traffic inside the recursion. The
arrow (time-parameter) column is eliminated in-kernel too (banded solve
for u, rank-1 Schur scalar s).

Numerical safety (TPU special-value rules, see structured_admm.py):
`sqrt` pivots are clamped to a tiny positive floor so breakdown produces
garbage-but-finite lanes instead of NaN/inf in VMEM; a per-lane `ok` flag
records any non-positive pivot and the host wrapper falls back to the
jitter-retrying XLA factorization for exactly those problems (the same
guard `qp_structured.factor_banded` applies, lifted to the batch level).

Reference parity: the factorization is algorithmically identical to
`qp_structured.banded_cholesky` (same M = A^T diag(w) A + diag(sig) from
polyMPC's boxADMM KKT form, /root/reference/mpc_solver/motionPlanner.hpp:
10-11); the kernel changes only WHERE the arithmetic runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32

# sqrt-pivot floor: breakdown lanes stay finite (no NaN into VMEM) and are
# detected via the ok flag instead.
_PIV_FLOOR = 1e-20

# Magnitude clamp applied to every computed factor entry / solve
# intermediate: a breakdown lane's floored pivot (1e-10) produces ~1e10
# columns whose repeated Schur products would overflow f32 to inf — which
# must never exist in VMEM (TPU special-value slow path). Legitimate
# entries of the Ruiz-scaled system sit many orders below 1e8. Clamp
# activation is NOT silent: any emitted factor entry at >= _SAT also
# clears the lane's ok flag (see _factor_kernel), so a legitimately
# huge-entry system (e.g. extreme per-problem rho from the adaptive-rho
# chunked path) refactors via the jitter-guarded XLA fallback instead of
# being silently corrupted.
_MAG = 1e8
_SAT = 0.99 * _MAG


def _fz(v):
    return jnp.clip(v, -_MAG, _MAG)


def _matmul_nt(A, Bm, blk):
    """C[a, b] = sum_c A[a, c] * B[b, c] for lane-major (blk, blk, L)."""
    acc = None
    for c in range(blk):
        t = A[:, c][:, None, :] * Bm[:, c][None, :, :]
        acc = t if acc is None else acc + t
    return acc


def _row_iota(blk):
    """(blk, 1) int32 row indices (pallas-safe: traced iota, not a captured
    numpy constant)."""
    return jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)


def _chol_lane(S, blk, ok):
    """Unrolled lane-parallel Cholesky of (blk, blk, L) SPD blocks.

    Returns (L, ok) with L lower-triangular (explicit zeros above) and ok
    multiplied by the per-lane positive-pivot indicator."""
    cols = []
    ridx = _row_iota(blk)
    for j in range(blk):
        d2 = S[j, j]  # (L,)
        ok = ok * (d2 > _PIV_FLOOR).astype(f32)
        d = jnp.sqrt(jnp.maximum(d2, _PIV_FLOOR))
        col = _fz(jnp.where(ridx >= j, S[:, j] / d[None, :], 0.0))  # (blk, L)
        cols.append(col)
        S = _fz(S - col[:, None, :] * col[None, :, :])
    return jnp.stack(cols, axis=1), ok  # (blk, blk, L): L[:, j] = cols[j]


def _tri_inv_lane(Lm, blk):
    """Unrolled forward-substitution inverse of lane-major lower-triangular
    (blk, blk, L): row i of X = L^-1 from rows < i."""
    rows = []
    ridx = _row_iota(blk)
    for i in range(blk):
        acc = jnp.where(ridx == i, 1.0, 0.0)  # one-hot (blk, 1)
        s = None
        for k in range(i):
            t = Lm[i, k][None, :] * rows[k]  # (blk, L)
            s = t if s is None else s + t
        if s is not None:
            acc = acc - s
        rows.append(_fz(acc / Lm[i, i][None, :]))
    return jnp.stack(rows, axis=0)  # (blk, blk, L)


def _factor_kernel(Mb_ref, pc_ref, mpp_ref, Ldi_out, Lsub_out, u_out, s_out,
                   ok_out, *, N: int, bw: int, blk: int):
    Mb = Mb_ref[0]  # (N, bw+1, blk, blk, L)
    pc = pc_ref[0]  # (N, blk, L)
    mpp = mpp_ref[0]  # (1, L)
    L_lanes = mpp.shape[-1]

    ok = jnp.ones((1, L_lanes), f32)
    zeros_blk = jnp.zeros((blk, blk, L_lanes), f32)
    Lcols = [[None] * bw for _ in range(N)]  # Lcols[k][d-1] = L[k+d, k]
    Ldi = []
    for k in range(N):
        S = Mb[k, 0]
        for j in range(max(0, k - bw), k):
            Ljk = Lcols[j][k - j - 1]  # L[k, j]
            S = _fz(S - _matmul_nt(Ljk, Ljk, blk))
        Lkk, ok = _chol_lane(S, blk, ok)
        Linv = _tri_inv_lane(Lkk, blk)
        Ldi.append(Linv)
        for d in range(1, bw + 1):
            if k + d >= N:
                Lcols[k][d - 1] = zeros_blk
                continue
            C = Mb[k, d]  # M[k+d, k]
            for j in range(max(0, k + d - bw), k):
                C = _fz(C - _matmul_nt(
                    Lcols[j][k + d - j - 1], Lcols[j][k - j - 1], blk
                ))
            # L[k+d, k] = C @ Linv^T
            Lcols[k][d - 1] = _fz(_matmul_nt(C, Linv, blk))

    # ---- banded solve for the arrow column u (same sweeps as the ADMM
    # kernel's banded_solve_t, with the freshly computed factors) ----
    ys = []
    for k in range(N):
        acc = pc[k]  # (blk, L)
        for d in range(1, min(bw, k) + 1):
            Lsb = Lcols[k - d][d - 1]  # L[k, k-d]
            acc = acc - jnp.sum(Lsb * ys[k - d][None], axis=1)
        ys.append(_fz(jnp.sum(Ldi[k] * acc[None], axis=1)))
    us = [None] * N
    for k in range(N - 1, -1, -1):
        acc = ys[k]
        for d in range(1, min(bw, N - 1 - k) + 1):
            acc = acc - jnp.sum(Lcols[k][d - 1] * us[k + d][:, None], axis=0)
        us[k] = _fz(jnp.sum(Ldi[k] * acc[:, None], axis=0))
    u = jnp.stack(us, axis=0)  # (N, blk, L)
    s = _fz(mpp - jnp.sum(jnp.sum(u * pc, axis=0), axis=0, keepdims=True))
    # the arrow Schur complement must be positive for an SPD system; the
    # ADMM kernel divides by it, so flag non-positive lanes too
    ok = ok * (s > _PIV_FLOOR).astype(f32)

    # clamp-activation detector: any emitted factor entry at/near the _MAG
    # clamp means _fz altered this lane's arithmetic (overflow cascade or a
    # genuinely huge-entry system) — clear ok so the host refactors it via
    # the XLA path instead of trusting silently-saturated factors.
    sat = jnp.zeros((1, L_lanes), f32)
    for blk_fac in Ldi:
        sat = jnp.maximum(sat, jnp.max(jnp.max(jnp.abs(blk_fac), 0), 0)[None])
    for k in range(N):
        for d in range(bw):
            sat = jnp.maximum(
                sat, jnp.max(jnp.max(jnp.abs(Lcols[k][d]), 0), 0)[None]
            )
    sat = jnp.maximum(sat, jnp.max(jnp.max(jnp.abs(u), 0), 0)[None])
    sat = jnp.maximum(sat, jnp.abs(s))
    ok = ok * (sat < _SAT).astype(f32)

    Ldi_out[0] = jnp.stack(Ldi, axis=0)  # (N, blk, blk, L)
    # (bw, N, blk, blk, L): Lsub[d-1, k] = L[k+d, k] — the ADMM kernel's
    # operand layout, emitted directly (no host moveaxis needed)
    Lsub_out[0] = jnp.stack(
        [jnp.stack([Lcols[k][d] for k in range(N)], axis=0) for d in range(bw)],
        axis=0,
    )
    u_out[0] = u
    s_out[0] = s
    ok_out[0] = (ok > 0.5).astype(jnp.int32)


def factor_banded_pallas(Mband, p_col, m_pp, bw: int, lanes: int = 128):
    """Lane-major kernel counterpart of qp_structured.factor_banded.

    Mband (B, N, bw+1, blk, blk), p_col (B, N, blk), m_pp (B,) — all cast
    to f32. Returns (fac, ok): fac = {"Ldi" (B, N, blk, blk), "Lsub_t"
    (B, bw, N, blk, blk) [the ADMM kernel's transposed layout], "u"
    (B, N, blk), "s" (B,)}, ok (B,) bool — False where a Cholesky pivot
    was non-positive (caller must refactor those via the XLA path)."""
    B, N, _, blk, _ = Mband.shape
    Mband = Mband.astype(f32)
    p_col = p_col.astype(f32)
    m_pp = m_pp.astype(f32)

    nb = -(-B // lanes)
    Bp = nb * lanes

    def pad(a, fill=0.0):
        if Bp == B:
            return a
        return jnp.concatenate(
            [a, jnp.full((Bp - B, *a.shape[1:]), fill, a.dtype)], axis=0
        )

    def cl(a):
        return jnp.moveaxis(a.reshape(nb, lanes, *a.shape[1:]), 1, -1)

    # identity-diagonal padding keeps dummy-lane pivots positive (no
    # spurious ok=False, no denormals in VMEM)
    eye_band = np.zeros((1, N, bw + 1, blk, blk), np.float32)
    eye_band[:, :, 0] = np.eye(blk, dtype=np.float32)
    Mb_p = pad(Mband, 0.0)
    if Bp != B:
        Mb_p = Mb_p.at[B:].set(jnp.asarray(eye_band))
    operands = [
        cl(Mb_p),
        cl(pad(p_col)),
        cl(pad(m_pp, 1.0)[:, None]),
    ]

    def spec(a):
        nd = a.ndim - 1
        return pl.BlockSpec(
            (1, *a.shape[1:]), lambda i, _nd=nd: (i,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    out_shapes = [
        (N, blk, blk, lanes),
        (bw, N, blk, blk, lanes),
        (N, blk, lanes),
        (1, lanes),
        (1, lanes),
    ]
    out_dtypes = [f32, f32, f32, f32, jnp.int32]
    out_shape = [
        jax.ShapeDtypeStruct((nb, *s), d)
        for s, d in zip(out_shapes, out_dtypes)
    ]
    out_specs = [
        pl.BlockSpec((1, *s), lambda i, _nd=len(s): (i,) + (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for s in out_shapes
    ]

    kernel = functools.partial(_factor_kernel, N=N, bw=bw, blk=blk)
    Ldi, Lsub_t, u, s, ok = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec(a) for a in operands],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands)

    def uncl(a):
        return jnp.moveaxis(a, -1, 1).reshape(-1, *a.shape[1:-1])[:B]

    fac = {
        "Ldi": uncl(Ldi),
        "Lsub_t": uncl(Lsub_t),
        "u": uncl(u),
        "s": uncl(s)[:, 0],
    }
    ok_b = uncl(ok)[:, 0] > 0
    return fac, ok_b
