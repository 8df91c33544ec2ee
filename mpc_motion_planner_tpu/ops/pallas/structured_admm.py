"""Pallas TPU kernel: fused VMEM-resident ADMM loop over the STRUCTURED
(matrix-free) constraint operator with node-level banded KKT factors.

Why this kernel exists: the XLA structured backend (ops/qp_structured.py)
already removed every dense per-problem matrix, but its hot loop still
re-reads the banded KKT factors (~226 KB/problem) from HBM on every one of
the <=700 ADMM iterations — at B=1024 that is ~460 MB/iteration, a hard
HBM-bandwidth floor of ~0.6 ms/iteration on v5e. This kernel loads each
chunk's factors into VMEM ONCE and runs the entire iteration loop on-chip.

Layout: the batch lives on the LANE axis (``lanes`` problems per grid
program, default 128 = the full lane width), and every per-problem tensor
keeps its natural structure on the leading/sublane axes:

    Ldi   (N, blk, blk, L)   diagonal Cholesky-factor inverses
    Lsub  (bw, N, blk, blk, L) subdiagonal factor blocks
    J     (N, ng, blk, L)    per-node inequality Jacobians
    x     split into X (N, nx, L), U (N, nu, L), p (1, L)

Per-problem small linear algebra (banded triangular sweeps, the structured
A/A^T applies) is broadcast-multiply-reduce over sublanes with all 128
lanes busy — pure VPU work with zero HBM traffic inside the loop. There
are no MXU ops at all: per-problem matrices are 22x22, far below MXU tile
size, and the batch axis is already saturated on lanes.

The ADMM semantics (residual checks, masked per-problem termination,
divergence freeze with done=2, flush-to-zero special-value hardening)
mirror ops/pallas/admm_kernel.py and ops/qp_structured.py. rho is fixed
WITHIN a kernel launch; OSQP-style adaptive rho (rho_update_every > 0)
runs as chunked dispatch with host-side residual-ratio rescaling and
banded refactorization between launches (same pattern as qp._solve_pallas
and the same update rule as the XLA backends).

Reference parity: same boxADMM algorithm as polyMPC's
(/root/reference/mpc_solver/motionPlanner.hpp:10-11) at the reference
budget (motionPlanner.cpp:16-19).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..structure import StructuredA, _static_indices, apply_A, apply_AT
from ..qp_structured import (
    assemble_banded_M,
    factor_banded,
    ruiz_structured,
)
from ..qp import _HARD, QPSettings, QPSolution, _rho_pattern
from .banded_factor import factor_banded_pallas

f32 = jnp.float32

# VMEM budget for the fused kernel. The r05 transposed factor copies
# (LdiT/LsubT/JtT, ~19 MB/program) push the double-buffered operand set
# past the old 100 MB limit at grid > 1 (the v5e has 128 MiB of VMEM);
# overridable for experiments via MPC_TPU_ADMM_VMEM_MB.
import os as _os

_VMEM_LIMIT_BYTES = int(
    float(_os.environ.get("MPC_TPU_ADMM_VMEM_MB", "127")) * 1024 * 1024
)


# ---------------------------------------------------------------------------
# Static geometry helpers
# ---------------------------------------------------------------------------


def _geom(ocp):
    order, S = ocp.coll.order, ocp.coll.num_segments
    K = order + 1
    nodes = ocp.num_nodes
    nx, nu, nq, ng = ocp.nx, ocp.nu, ocp.nq, ocp.ng
    blk = nx + nu
    seg_idx, first, second, valid2 = _static_indices(order, S)
    return dict(
        order=order, S=S, K=K, nodes=nodes, nx=nx, nu=nu, nq=nq, ng=ng,
        blk=blk, bw=order, num_eq=ocp.num_eq,
        Dm=np.asarray(ocp.coll.diff_matrix, np.float32),
        seg_idx=np.asarray(seg_idx),  # (S, K) node id per (segment, local)
        first=np.asarray(first),  # (nodes,) flat (s*K+k) covering index 1
        second=np.asarray(second),
        valid2=np.asarray(valid2, np.float32),
    )


def _split_z(ocp, v):
    """z-layout (B, num_var) -> dict of natural pieces."""
    nodes, nx, nu = ocp.num_nodes, ocp.nx, ocp.nu
    B = v.shape[0]
    return dict(
        X=v[:, : nodes * nx].reshape(B, nodes, nx),
        U=v[:, nodes * nx : nodes * (nx + nu)].reshape(B, nodes, nu),
        p=v[:, nodes * (nx + nu) : nodes * (nx + nu) + 1],
    )


def _join_z(ocp, pieces):
    B = pieces["X"].shape[0]
    return jnp.concatenate(
        [pieces["X"].reshape(B, -1), pieces["U"].reshape(B, -1), pieces["p"]],
        axis=-1,
    )


def _split_m(ocp, w):
    """m-layout (B, num_eq + num_ineq) -> (eq (B, S*K, nx), g (B, nodes, ng))."""
    B = w.shape[0]
    return (
        w[:, : ocp.num_eq].reshape(B, -1, ocp.nx),
        w[:, ocp.num_eq :].reshape(B, ocp.num_nodes, ocp.ng),
    )


def _join_m(ocp, eq, g):
    B = eq.shape[0]
    return jnp.concatenate([eq.reshape(B, -1), g.reshape(B, -1)], axis=-1)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

# Ordered operand names (all lane-major, leading block dim 1).
# thx: per-variable soft-l1 shrink thresholds soft_xs / rx (qp._soft_prox
# on the VARIABLE box — the elastic mode that keeps primal-infeasible
# linearized QPs convergent); hard rows carry the huge finite stand-in
# and reduce to the box clip.
_X_OPS = ("qs", "Ps", "rx", "lxs", "uxs", "thx", "D", "x0", "zx0", "yx0")
# thr: per-row soft-l1 shrink thresholds soft_s / rc (qp._soft_prox);
# hard rows carry the huge finite stand-in and reduce to the box clip.
_M_OPS = ("rc", "lcs", "ucs", "E", "thr", "zc0", "yc0")


def _structured_kernel(
    *refs,
    g: dict,
    max_iter: int,
    check_every: int,
    eps_abs: float,
    eps_rel: float,
    sigma: float,
    alpha: float,
    kkt_refine: int,
    sweep: str,
):
    nodes, nx, nu, nq, ng = g["nodes"], g["nx"], g["nu"], g["nq"], g["ng"]
    S, K, blk, bw = g["S"], g["K"], g["blk"], g["bw"]
    Dm = g["Dm"]  # numpy (K, K), baked in as scalar constants
    seg_idx, first, second, valid2 = (
        g["seg_idx"], g["first"], g["second"], g["valid2"],
    )

    it = iter(refs)

    def take():
        return next(it)[0]

    Ldi = take()  # (N, blk, blk, L)   [row, col]
    LdiT = take() if sweep in ("diag", "full") else None  # [col, row]
    Lsub = take()  # (bw, N, blk, blk, L)   [row, col]
    LsubT = take() if sweep == "full" else None  # [col, row]
    u_arr = take()  # (N, blk, L)
    s_arr = take()  # (1, L)
    Jt = take()  # (N, ng, blk, L)
    JtT = take() if sweep in ("diag", "full") else None  # (N, blk, ng, L)
    f_seg = take()  # (S*K, nx, L)
    p_t = take()  # (1, L)
    xop = {}
    for name in _X_OPS:
        xop[name] = dict(X=take(), U=take(), p=take())
    mop = {name: dict(eq=take(), g=take()) for name in _M_OPS}
    done0 = take()  # (1, L) int32
    outs = list(it)
    L = p_t.shape[-1]

    ftz = lambda v: jnp.clip(jnp.where(jnp.abs(v) < 1e-30, 0.0, v), -1e15, 1e15)

    def xmap(fn, *dicts):
        return {k: fn(*(d[k] for d in dicts)) for k in ("X", "U", "p")}

    def mmap(fn, *dicts):
        return {k: fn(*(d[k] for d in dicts)) for k in ("eq", "g")}

    def xmax(d):
        """max over all entries of an x-split dict -> (1, L)."""
        m = jnp.maximum(
            jnp.max(jnp.max(d["X"], axis=0), axis=0, keepdims=True),
            jnp.max(jnp.max(d["U"], axis=0), axis=0, keepdims=True),
        )
        m = jnp.maximum(m, d["p"])
        return m

    def mmax(d):
        return jnp.maximum(
            jnp.max(jnp.max(d["eq"], axis=0), axis=0, keepdims=True),
            jnp.max(jnp.max(d["g"], axis=0), axis=0, keepdims=True),
        )

    # ---- structured applies (lane-major) ----

    def matA_raw(v):
        """x-split v -> m-split of the RAW operator A @ v."""
        vX, vU, vp = v["X"], v["U"], v["p"]
        # segment gather (static): (S*K, nx, L) / (S*K, nu, L)
        vX_seg = jnp.stack([vX[int(n)] for n in seg_idx.reshape(-1)], axis=0)
        vU_seg = jnp.stack([vU[int(n)] for n in seg_idx.reshape(-1)], axis=0)
        # dX[s,k] = sum_j Dm[k,j] X[node(s,j)]
        rows = []
        for s in range(S):
            for k in range(K):
                acc = None
                for j in range(K):
                    term = float(Dm[k, j]) * vX_seg[s * K + j]
                    acc = term if acc is None else acc + term
                rows.append(acc)
        dX = jnp.stack(rows, axis=0)  # (S*K, nx, L)
        # f_lin[n] = [vX[n, nq:], vU[n]] (dynamics is linear)
        f_lin_seg = jnp.concatenate(
            [vX_seg[:, nq:, :], vU_seg], axis=1
        )  # (S*K, nx, L)
        eq = dX - p_t[None] * f_lin_seg - f_seg * vp[None]
        # inequality rows: J blocks over [X; U]. With a transposed copy
        # (sweep != legacy), contract over blk as the OUTER axis (sum over
        # axis 1) — a chain of vreg FMAs with per-component sublane
        # broadcasts — instead of a cross-sublane reduction over Jt's blk
        # axis, which Mosaic lowers to rotate-add trees (VERDICT r04 #1b
        # "fewer sublane broadcasts in the triangular sweeps").
        vn = jnp.concatenate([vX, vU], axis=1)  # (N, blk, L)
        if JtT is not None:
            gg = jnp.sum(JtT * vn[:, :, None, :], axis=1)  # (N, ng, L)
        else:
            gg = jnp.sum(Jt * vn[:, None, :, :], axis=2)  # (N, ng, L)
        return dict(eq=eq, g=gg)

    def matAT_raw(w):
        w_eq, w_g = w["eq"], w["g"]  # (S*K, nx, L), (N, ng, L)
        # E_D^T: t[s,j] = sum_k Dm[k,j] w_eq[s,k]
        rows = []
        for s in range(S):
            for j in range(K):
                acc = None
                for k in range(K):
                    term = float(Dm[k, j]) * w_eq[s * K + k]
                    acc = term if acc is None else acc + term
                rows.append(acc)
        t = jnp.stack(rows, axis=0)  # (S*K, nx, L)

        def seg_to_nodes(c):
            out = []
            for n in range(nodes):
                v = c[int(first[n])]
                if valid2[n] > 0:
                    v = v + c[int(second[n])]
                out.append(v)
            return jnp.stack(out, axis=0)  # (N, nx, L)

        X_out = seg_to_nodes(t)
        w_nodes = seg_to_nodes(w_eq)
        X_out = jnp.concatenate(
            [X_out[:, :nq, :], X_out[:, nq:, :] - p_t[None] * w_nodes[:, :nq, :]],
            axis=1,
        )
        U_out = -p_t[None] * w_nodes[:, nq:, :]
        # J^T blocks
        vn = jnp.sum(Jt * w_g[:, :, None, :], axis=1)  # (N, blk, L)
        X_out = X_out + vn[:, :nx, :]
        U_out = U_out + vn[:, nx : nx + nu, :]
        p_out = -jnp.sum(jnp.sum(f_seg * w_eq, axis=0), axis=0, keepdims=True)
        return dict(X=X_out, U=U_out, p=p_out)

    # Ruiz-scaled operator (identical to the XLA structured path's
    # matA/matAT closures): E A D and D A^T E.
    def matA(v):
        return mmap(
            lambda e, a: e * a,
            mop["E"],
            matA_raw(xmap(lambda d_, a: d_ * a, xop["D"], v)),
        )

    def matAT(w):
        return xmap(
            lambda d_, a: d_ * a,
            xop["D"],
            matAT_raw(mmap(lambda e, a: e * a, mop["E"], w)),
        )

    # ---- node blocks <-> x-split ----

    def to_blocks(v):
        return jnp.concatenate([v["X"], v["U"]], axis=1)  # (N, blk, L)

    def from_blocks(b, vp):
        return dict(X=b[:, :nx, :], U=b[:, nx : nx + nu, :], p=vp)

    def banded_solve_t(r):
        """(N, blk, L) solve with the lane-major banded factors.

        A contraction over the leading (outer) block axis is a chain of
        (blk, L)-vreg FMAs accumulating M_layout[j] * v[j] with v[j]
        sublane-broadcast; a contraction over the SUBLANE axis is a
        rotate-add reduction tree per output row (slower on the VPU —
        VERDICT r04 #1b). The backward sweep needs M^T @ v and gets the
        outer-axis form for free from the [row, col] blocks; the forward
        sweep needs M @ v, which is outer-axis only via TRANSPOSED copies
        ([col, row]). The `sweep` variant picks which copies exist:
        "legacy" = none (r04 behavior, forward contracts over sublanes),
        "diag" = LdiT + JtT only (the production default: the LsubT
        copies are what overflow VMEM at grid > 1 — 140.6 MB > 128 MB,
        measured), "full" = all copies (fits only at B <= 128 lanes).
        """
        ys = []
        for k in range(nodes):
            acc = r[k]
            for d in range(1, min(bw, k) + 1):
                if LsubT is not None:
                    # Lsub[d-1, k-d] @ ys[k-d] via the transposed copy
                    acc = acc - jnp.sum(
                        LsubT[d - 1, k - d] * ys[k - d][:, None], axis=0
                    )
                else:
                    acc = acc - jnp.sum(
                        Lsub[d - 1, k - d] * ys[k - d][None], axis=1
                    )
            if LdiT is not None:
                ys.append(jnp.sum(LdiT[k] * acc[:, None], axis=0))
            else:
                ys.append(jnp.sum(Ldi[k] * acc[None], axis=1))
        xs = [None] * nodes
        for k in range(nodes - 1, -1, -1):
            acc = ys[k]
            for d in range(1, min(bw, nodes - 1 - k) + 1):
                # Lsub[d-1, k]^T @ xs[k+d]: contract over the ROW index
                acc = acc - jnp.sum(Lsub[d - 1, k] * xs[k + d][:, None], axis=0)
            xs[k] = jnp.sum(Ldi[k] * acc[:, None], axis=0)
        return jnp.stack(xs, axis=0)

    def solve_arrow_t(rhs):
        rb = to_blocks(rhs)
        t = banded_solve_t(rb)
        z_p = (
            rhs["p"] - jnp.sum(jnp.sum(u_arr * rb, axis=0), axis=0, keepdims=True)
        ) / s_arr
        zb = t - u_arr * z_p[None]
        return from_blocks(zb, z_p)

    # ---- residuals (identical semantics to qp_structured.residuals) ----

    def residuals(x, zc, zx, yc, yx):
        Ax = matA(x)
        r_prim = jnp.maximum(
            mmax(mmap(lambda a, z, e: jnp.abs((a - z) / e), Ax, zc, mop["E"])),
            xmax(xmap(lambda d, a, b: jnp.abs(d * (a - b)), xop["D"], x, zx)),
        )
        Aty = matAT(yc)
        r_dual = xmax(
            xmap(
                lambda P, xx, q, at, yxx, d: jnp.abs((P * xx + q + at + yxx) / d),
                xop["Ps"], x, xop["qs"], Aty, yx, xop["D"],
            )
        )
        scale_p = jnp.maximum(
            jnp.maximum(
                mmax(mmap(lambda a, e: jnp.abs(a / e), Ax, mop["E"])),
                mmax(mmap(lambda z, e: jnp.abs(z / e), zc, mop["E"])),
            ),
            jnp.maximum(
                xmax(xmap(lambda d, a: jnp.abs(d * a), xop["D"], x)),
                xmax(xmap(lambda d, a: jnp.abs(d * a), xop["D"], zx)),
            ),
        )
        scale_d = jnp.maximum(
            jnp.maximum(
                xmax(xmap(lambda P, a, d: jnp.abs(P * a / d), xop["Ps"], x, xop["D"])),
                xmax(xmap(lambda q, d: jnp.abs(q / d), xop["qs"], xop["D"])),
            ),
            jnp.maximum(
                xmax(xmap(lambda at, d: jnp.abs(at / d), Aty, xop["D"])),
                xmax(xmap(lambda a, d: jnp.abs(a / d), yx, xop["D"])),
            ),
        )
        eps_p = eps_abs + eps_rel * scale_p
        eps_d = eps_abs + eps_rel * scale_d
        return (r_prim <= eps_p) & (r_dual <= eps_d), r_prim, r_dual

    # ---- the loop ----

    sig = xmap(lambda P, r: P + sigma + r, xop["Ps"], xop["rx"])

    def body(state):
        x, zc, zx, yc, yx, done, iters, rp, rd, k = state

        rhs = xmap(
            lambda xx, q, rz, yxx: sigma * xx - q + rz - yxx,
            x, xop["qs"],
            xmap(lambda r, z: r * z, xop["rx"], zx),
            yx,
        )
        atw = matAT(mmap(lambda r, z, y: r * z - y, mop["rc"], zc, yc))
        rhs = xmap(lambda a, b: a + b, rhs, atw)
        xt = solve_arrow_t(rhs)
        for _ in range(kkt_refine):
            Mxt = xmap(lambda s_, a: s_ * a, sig, xt)
            Mxt = xmap(
                lambda a, b: a + b, Mxt,
                matAT(mmap(lambda r, a: r * a, mop["rc"], matA(xt))),
            )
            xt = xmap(
                lambda a, b: a + b, xt,
                solve_arrow_t(xmap(lambda r, m_: r - m_, rhs, Mxt)),
            )
        zt_c = matA(xt)

        x_new = xmap(lambda a, b: ftz(alpha * a + (1 - alpha) * b), xt, x)
        zc_arg = mmap(lambda a, b: alpha * a + (1 - alpha) * b, zt_c, zc)

        def soft_upd(za, y, r, lo, hi, t):
            v = za + y / r
            box = jnp.clip(v, lo, hi)
            return ftz(v - jnp.clip(v - box, -t, t))

        zc_new = mmap(
            soft_upd,
            zc_arg, yc, mop["rc"], mop["lcs"], mop["ucs"], mop["thr"],
        )
        yc_new = mmap(
            lambda y, r, za, zn: ftz(y + r * (za - zn)),
            yc, mop["rc"], zc_arg, zc_new,
        )
        zx_arg = xmap(lambda a, b: alpha * a + (1 - alpha) * b, xt, zx)
        zx_new = xmap(
            soft_upd,
            zx_arg, yx, xop["rx"], xop["lxs"], xop["uxs"], xop["thx"],
        )
        yx_new = xmap(
            lambda y, r, za, zn: ftz(y + r * (za - zn)),
            yx, xop["rx"], zx_arg, zx_new,
        )

        keep = done != 0  # (1, L)
        sel_x = lambda old, new: xmap(
            lambda o, nn: jnp.where(keep, o, nn), old, new
        )
        sel_m = lambda old, new: mmap(
            lambda o, nn: jnp.where(keep, o, nn), old, new
        )
        x = sel_x(x, x_new)
        zx = sel_x(zx, zx_new)
        yx = sel_x(yx, yx_new)
        zc = sel_m(zc, zc_new)
        yc = sel_m(yc, yc_new)
        iters = jnp.where(keep, iters, iters + 1)
        k = k + 1

        def run_checks(args):
            x, zc, zx, yc, yx, done, rp, rd = args
            # divergence freeze (NaN-safe: ~(v <= thr) is True for NaN)
            mag = xmax(xmap(lambda a: jnp.abs(a), x))
            mag = jnp.maximum(mag, mmax(mmap(lambda a: jnp.abs(a), yc)))
            mag = jnp.maximum(mag, xmax(xmap(lambda a: jnp.abs(a), yx)))
            big = ~(mag <= 1e12)
            conv, rp_new, rd_new = residuals(x, zc, zx, yc, yx)
            active = done == 0
            rp = jnp.where(active, rp_new, rp)
            rd = jnp.where(active, rd_new, rd)
            done = jnp.where(
                active & big, 2, jnp.where(active & conv, 1, done)
            )
            return x, zc, zx, yc, yx, done, rp, rd

        do_check = jnp.logical_or(k % check_every == 0, k >= max_iter)
        x, zc, zx, yc, yx, done, rp, rd = jax.lax.cond(
            do_check,
            run_checks,
            lambda a: a,
            (x, zc, zx, yc, yx, done, rp, rd),
        )
        return x, zc, zx, yc, yx, done, iters, rp, rd, k

    def cond(state):
        *_, done, _, _, _, k = state
        return jnp.logical_and(
            k < max_iter, jnp.sum((done != 0).astype(jnp.int32)) < L
        )

    zeros = jnp.zeros((1, L), f32)
    state0 = (
        {k: xop["x0"][k] for k in ("X", "U", "p")},
        {k: mop["zc0"][k] for k in ("eq", "g")},
        {k: xop["zx0"][k] for k in ("X", "U", "p")},
        {k: mop["yc0"][k] for k in ("eq", "g")},
        {k: xop["yx0"][k] for k in ("X", "U", "p")},
        done0,
        jnp.zeros((1, L), jnp.int32),
        zeros,
        zeros,
        jnp.asarray(0, jnp.int32),
    )
    x, zc, zx, yc, yx, done, iters, rp, rd, _ = jax.lax.while_loop(
        cond, body, state0
    )

    o = iter(outs)

    def put(v):
        next(o)[0] = v

    for piece in ("X", "U", "p"):
        put(x[piece])
    put(zc["eq"]); put(zc["g"])
    for piece in ("X", "U", "p"):
        put(zx[piece])
    put(yc["eq"]); put(yc["g"])
    for piece in ("X", "U", "p"):
        put(yx[piece])
    put(done)
    put(iters)
    put(rp)
    put(rd)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _chunk_lane_major(a, nb, lanes):
    """(B, ...) -> (nb, ..., lanes)."""
    return jnp.moveaxis(a.reshape(nb, lanes, *a.shape[1:]), 1, -1)


def _unchunk(a):
    """(nb, ..., lanes) -> (B, ...)."""
    return jnp.moveaxis(a, -1, 1).reshape(-1, *a.shape[1:-1])


def solve_box_qp_structured_pallas(
    ocp,
    sa: StructuredA,
    P_diag,
    q,
    lc,
    uc,
    lx,
    ux,
    settings: QPSettings = QPSettings(),
    x0=None,
    yc0=None,
    yx0=None,
    soft_c=None,
    soft_x=None,
    lanes: int = 128,
) -> QPSolution:
    """Fused-kernel counterpart of qp_structured.solve_box_qp_structured.

    Same problem/solution semantics (including the optional soft-row l1
    weights soft_c and soft variable-box weights soft_x, see
    qp._soft_prox) with one restriction: P must be diagonal. OSQP-style adaptive rho (settings.rho_update_every > 0) runs
    as CHUNKED dispatch — the kernel executes rho_update_every iterations
    per launch with rho fixed in VMEM, and between launches the host
    rescales per-problem rho by the residual ratio and refactors the
    banded KKT system (same update rule as the XLA paths; the update
    cadence is exactly the chunk boundary, so it matches the XLA path when
    check_every divides rho_update_every).
    """
    if P_diag.ndim == 3:
        raise NotImplementedError(
            "dense P is only supported on the 'xla' backend"
        )
    with jax.default_matmul_precision("highest"):
        return _solve_impl(
            ocp, sa, P_diag, q, lc, uc, lx, ux, settings, x0, yc0, yx0,
            soft_c, soft_x, lanes,
        )


def _solve_impl(
    ocp, sa, P_diag, q, lc, uc, lx, ux, settings, x0, yc0, yx0, soft_c,
    soft_x, lanes,
):
    B, n = q.shape
    m = lc.shape[1]
    # The kernel is float32 (like ops/pallas/admm_kernel.py): cast all
    # problem data at the boundary so x64-mode callers work unchanged.
    dt = f32
    P_diag, q, lc, uc, lx, ux = (
        a.astype(dt) for a in (P_diag, q, lc, uc, lx, ux)
    )
    x0, yc0, yx0 = (
        None if a is None else a.astype(dt) for a in (x0, yc0, yx0)
    )
    sa = StructuredA(
        p=sa.p.astype(dt),
        f_rows=sa.f_rows.astype(dt),
        J=sa.J.astype(dt),
    )
    g = _geom(ocp)
    K, nx, nodes = g["K"], g["nx"], g["nodes"]

    # ---- Ruiz + scaling (identical to the XLA structured path) ----
    if settings.ruiz_iters > 0:
        D, E = ruiz_structured(ocp, sa, settings.ruiz_iters)
        D, E = D.astype(dt), E.astype(dt)
    else:
        D = jnp.ones((B, n), dt)
        E = jnp.ones((B, m), dt)

    Ps = D * P_diag * D
    qs = D * q
    # inf bounds never enter VMEM: +-1e20 stand-ins keep every kernel op on
    # the TPU fast path (inf/denormal operands route elementwise and MXU
    # ops through a microcoded slow path — measured 100x+ blowups, long
    # enough to trip the device watchdog; see ops/pallas/admm_kernel.py).
    finite = lambda a: jnp.clip(a, -1e20, 1e20)
    lcs, ucs = finite(E * lc), finite(E * uc)
    lxs, uxs = finite(lx / D), finite(ux / D)

    pat_c = _rho_pattern(lc, uc, settings)
    pat_x = _rho_pattern(lx, ux, settings)
    if soft_c is None:
        soft_s = jnp.full((B, m), _HARD, dt)
    else:
        soft_c = soft_c.astype(dt)
        soft_s = jnp.where(soft_c > 0, soft_c / E, _HARD)
    if soft_x is None:
        soft_xs = jnp.full((B, n), _HARD, dt)
    else:
        soft_x = soft_x.astype(dt)
        soft_xs = jnp.where(soft_x > 0, soft_x * D, _HARD)

    # ---- banded factorization (node-level, kernel form) ----
    # The factorization itself runs as a lane-major Pallas kernel
    # (ops/pallas/banded_factor.py): the XLA node-sequential path costs
    # ~129 ms at B=1024 on v5e — 2.5x the entire 700-iteration fused ADMM
    # loop — because its 19 batched 22x22 cholesky/trisolve/einsum steps
    # are per-op-overhead-bound. Breakdown lanes (non-positive pivot,
    # flagged in-kernel without producing NaN) fall back to the
    # jitter-guarded XLA factorization.
    num_eq = ocp.num_eq

    def factor(rho_s):
        rc = rho_s[:, None] * pat_c
        rx = rho_s[:, None] * pat_x
        w = E * E * rc
        w_eq = w[:, :num_eq].reshape(B, -1, K, nx)
        w_g = w[:, num_eq:].reshape(B, nodes, -1)
        sig = Ps + jnp.asarray(settings.sigma, dt) + rx
        Mband, p_col, m_pp = assemble_banded_M(ocp, sa, w_eq, w_g, D, sig)

        if jax.default_backend() != "tpu":
            # off-TPU (CPU test suite) the interpret-mode factor kernel is
            # far slower than XLA; use the XLA factorization there — the
            # kernel itself is parity-tested directly
            # (tests/test_qp_structured.py::test_pallas_factor_matches_xla).
            fb = factor_banded(Mband, p_col, m_pp, g["bw"])
            return {
                "Ldi": fb["Ldi"].astype(f32),
                "Lsub_t": jnp.moveaxis(fb["Lsub"], 2, 1).astype(f32),
                "u": fb["u"].astype(f32),
                "s": fb["s"].astype(f32),
            }, rc, rx

        fac_p, ok = factor_banded_pallas(
            Mband, p_col, m_pp, g["bw"], lanes=lanes
        )

        def fix(_):
            fb = factor_banded(Mband, p_col, m_pp, g["bw"])
            fb_t = {
                "Ldi": fb["Ldi"].astype(f32),
                "Lsub_t": jnp.moveaxis(fb["Lsub"], 2, 1).astype(f32),
                "u": fb["u"].astype(f32),
                "s": fb["s"].astype(f32),
            }
            sel = lambda a, b: jnp.where(
                ok.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            )
            return jax.tree_util.tree_map(sel, fac_p, fb_t)

        fac = jax.lax.cond(jnp.all(ok), lambda _: fac_p, fix, None)
        return fac, rc, rx

    rho_s = jnp.full((B,), settings.rho, dt)
    fac, rc, rx = factor(rho_s)

    # ---- initial state ----
    x = jnp.zeros((B, n), dt) if x0 is None else (x0 / D).astype(dt)
    yc = jnp.zeros((B, m), dt) if yc0 is None else (yc0 / E).astype(dt)
    yx = jnp.zeros((B, n), dt) if yx0 is None else (yx0 * D).astype(dt)
    # apply_A contracts with ocp.coll.diff_matrix, which is f64 in x64
    # mode — cast back so no f64 leaks into the kernel operands.
    Ax0 = (E * apply_A(ocp, sa, D * x)).astype(dt)
    zc = jnp.clip(Ax0, lcs, ucs)
    zx = jnp.clip(x, lxs, uxs)
    done = jnp.zeros((B,), jnp.int32)

    # ---- pad the batch to a lane multiple (dummies enter done=3) ----
    nb = -(-B // lanes)
    Bp = nb * lanes

    # Sweep-layout variant for the in-kernel triangular solves (see
    # banded_solve_t): "diag" is the production default; "full" adds the
    # LsubT copies, whose double-buffered input windows overflow the v5e's
    # 128 MB VMEM at grid > 1 (measured: 140.6 MB) — downgraded to "diag"
    # there; "legacy" reproduces the r04 kernel exactly.
    sweep = _os.environ.get("MPC_TPU_ADMM_SWEEP", "diag")
    if sweep not in ("legacy", "diag", "full"):
        raise ValueError(f"MPC_TPU_ADMM_SWEEP must be legacy/diag/full, "
                         f"got {sweep!r}")
    if sweep == "full" and nb > 1:
        sweep = "diag"

    def pad(a, fill=0.0):
        if Bp == B:
            return a
        return jnp.concatenate(
            [a, jnp.full((Bp - B, *a.shape[1:]), fill, a.dtype)], axis=0
        )

    Jt = sa.J  # (B, nodes, ng, blk)
    f_seg = sa.f_rows.reshape(B, -1, nx)

    cl = functools.partial(_chunk_lane_major, nb=nb, lanes=lanes)

    def spec(a):
        nd = a.ndim - 1
        return pl.BlockSpec(
            (1, *a.shape[1:]), lambda i, _nd=nd: (i,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    # outputs: x(3), zc(2), zx(3), yc(2), yx(3), done, iters, rp, rd
    npc = 3
    x_shapes = [
        (nodes, nx, lanes), (nodes, g["nu"], lanes), (1, lanes),
    ]
    m_shapes = [(g["S"] * K, nx, lanes), (nodes, g["ng"], lanes)]
    out_shapes = (
        x_shapes + m_shapes + x_shapes + m_shapes + x_shapes
        + [(1, lanes)] * 4
    )
    out_dtypes = [dt] * (3 * npc + 4) + [jnp.int32, jnp.int32, dt, dt]
    out_shape = [
        jax.ShapeDtypeStruct((nb, *s), d)
        for s, d in zip(out_shapes, out_dtypes)
    ]
    out_specs = [
        pl.BlockSpec((1, *s), lambda i, _nd=len(s): (i,) + (0,) * _nd,
                     memory_space=pltpu.VMEM)
        for s in out_shapes
    ]

    def dispatch(data, state, chunk_iters):
        """One kernel launch of `chunk_iters` ADMM iterations with rho
        fixed; state carried in scaled f32 z/m-layout. `data` holds every
        per-problem operand (factors + problem data) so the early-exit
        path can permute the batch between launches with one gather."""
        rc, rx = data["rc"], data["rx"]
        x, zc, zx = state["x"], state["zc"], state["zx"]
        yc, yx, done = state["yc"], state["yx"], state["done"]
        # cap the numerator BEFORE the divide: hard rows have weight 1e20
        # and the quotient by a small rc/rx would overflow f32 to inf —
        # which must never enter VMEM (the special-value slow-path hazard).
        # min(soft, _HARD * r) / r is exactly _HARD for hard rows (where
        # the shrink clip never binds) and semantically free otherwise: no
        # iterate magnitude ever approaches 1e20.
        thr = jnp.minimum(data["soft_s"], _HARD * rc) / rc
        thx = jnp.minimum(data["soft_xs"], _HARD * rx) / rx
        # transposed copies ([col, row] layout) for the forward triangular
        # sweep / the A-apply J contraction — see banded_solve_t; computed
        # here (XLA) so the kernel never pays in-VMEM transposes. Which
        # copies ship is the `sweep` variant's VMEM/speed trade-off.
        operands = [cl(pad(data["Ldi"]))]
        if sweep in ("diag", "full"):
            operands.append(cl(pad(jnp.swapaxes(data["Ldi"], -1, -2))))
        operands.append(cl(pad(data["Lsub_t"])))  # (B, bw, N, blk, blk)
        if sweep == "full":
            operands.append(cl(pad(jnp.swapaxes(data["Lsub_t"], -1, -2))))
        operands += [
            cl(pad(data["u"])),
            cl(pad(data["s"], 1.0)[:, None]),  # 1.0: divide-safe dummies
            cl(pad(data["Jt"])),
        ]
        if sweep in ("diag", "full"):
            operands.append(cl(pad(jnp.swapaxes(data["Jt"], -1, -2))))
        operands += [
            cl(pad(data["f_seg"])),
            cl(pad(data["pt"])[:, None]),
        ]
        xvals = dict(
            qs=data["qs"], Ps=data["Ps"], rx=rx, lxs=data["lxs"],
            uxs=data["uxs"], thx=thx, D=data["D"],
            x0=x, zx0=zx, yx0=yx,
        )
        # divide-safe padding for scale-like operands
        fills = dict(rx=1.0, D=1.0, uxs=1.0, lxs=-1.0, thx=1.0)
        for name in _X_OPS:
            pieces = _split_z(ocp, pad(xvals[name], fills.get(name, 0.0)))
            operands += [cl(pieces["X"]), cl(pieces["U"]), cl(pieces["p"])]
        mvals = dict(
            rc=rc, lcs=data["lcs"], ucs=data["ucs"], E=data["E"], thr=thr,
            zc0=zc, yc0=yc,
        )
        mfills = dict(rc=1.0, E=1.0, ucs=1.0, lcs=-1.0, thr=1.0)
        for name in _M_OPS:
            eqp, gp = _split_m(ocp, pad(mvals[name], mfills.get(name, 0.0)))
            operands += [cl(eqp), cl(gp)]
        operands.append(cl(pad(done, 3)[:, None]))

        kernel = functools.partial(
            _structured_kernel,
            g=g,
            max_iter=chunk_iters,
            check_every=settings.check_every,
            eps_abs=settings.eps_abs,
            eps_rel=settings.eps_rel,
            sigma=settings.sigma,
            alpha=settings.alpha,
            kkt_refine=settings.kkt_refine,
            sweep=sweep,
        )

        outs = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[spec(a) for a in operands],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES,
            ),
            interpret=jax.default_backend() != "tpu",
        )(*operands)

        o = iter(outs)

        def takex():
            d = dict(
                X=_unchunk(next(o)), U=_unchunk(next(o)), p=_unchunk(next(o))
            )
            return _join_z(ocp, d)[:B]

        def takem():
            return _join_m(ocp, _unchunk(next(o)), _unchunk(next(o)))[:B]

        new_state = dict(
            x=takex(), zc=takem(), zx=takex(), yc=takem(), yx=takex(),
            done=_unchunk(next(o))[:B, 0],
        )
        used = _unchunk(next(o))[:B, 0]
        rp = _unchunk(next(o))[:B, 0]
        rd = _unchunk(next(o))[:B, 0]
        return new_state, used, rp, rd

    # scaled operator applies for the host-side rho ratio (identical
    # formulas to qp_structured.residuals; one apply pair per boundary)
    def matA(v):
        return (E * apply_A(ocp, sa, D * v)).astype(dt)

    def matAT(w_):
        return (D * apply_AT(ocp, sa, E * w_)).astype(dt)

    def residual_ratio(x, zc, zx, yc, yx):
        Ax = matA(x)
        r_prim = jnp.maximum(
            jnp.max(jnp.abs((Ax - zc) / E), axis=-1),
            jnp.max(jnp.abs(D * (x - zx)), axis=-1),
        )
        Aty = matAT(yc)
        r_dual = jnp.max(jnp.abs((Ps * x + qs + Aty + yx) / D), axis=-1)
        scale_p = jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(Ax / E), axis=-1),
                jnp.max(jnp.abs(zc / E), axis=-1),
            ),
            jnp.maximum(
                jnp.max(jnp.abs(D * x), axis=-1),
                jnp.max(jnp.abs(D * zx), axis=-1),
            ),
        )
        scale_d = jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(Ps * x / D), axis=-1),
                jnp.max(jnp.abs(qs / D), axis=-1),
            ),
            jnp.maximum(
                jnp.max(jnp.abs(Aty / D), axis=-1),
                jnp.max(jnp.abs(yx / D), axis=-1),
            ),
        )
        return jnp.sqrt(
            (r_prim / jnp.maximum(scale_p, 1e-12))
            / jnp.maximum(r_dual / jnp.maximum(scale_d, 1e-12), 1e-12)
        )

    # ---- chunk cadence: adaptive rho owns the chunk size when enabled;
    # otherwise the early-exit compaction cadence (exit_schedule /
    # exit_warmup+exit_every); otherwise one monolithic dispatch ----
    early_exit = (
        settings.rho_update_every == 0
        and (settings.exit_every > 0 or settings.exit_schedule)
        and B > lanes
    )
    if settings.rho_update_every > 0:
        chunk = settings.rho_update_every
        sizes = [
            min(chunk, settings.max_iter - c * chunk)
            for c in range(-(-settings.max_iter // chunk))
        ]
    elif early_exit:
        if settings.exit_schedule:
            sizes = [int(s) for s in settings.exit_schedule.split(",")]
            if sum(sizes) != settings.max_iter or any(s <= 0 for s in sizes):
                raise ValueError(
                    f"exit_schedule {settings.exit_schedule!r} must be "
                    f"positive chunk lengths summing to max_iter "
                    f"({settings.max_iter})"
                )
        else:
            # warmup chunk first (one LATE compaction boundary is the
            # measured optimum — see QPSettings.exit_every), then
            # exit_every cadence for the remainder
            first = min(
                settings.exit_warmup or settings.exit_every,
                settings.max_iter,
            )
            sizes = [first]
            while sum(sizes) < settings.max_iter:
                sizes.append(
                    min(settings.exit_every, settings.max_iter - sum(sizes))
                )
        # Exact single-dispatch semantics require every compaction
        # boundary to coincide with a scheduled residual check — a
        # non-multiple chunk would silently add chunk-boundary checks and
        # change results vs exit_every=0 (ADVICE r04).
        bad = [s for s in sizes if s % settings.check_every != 0]
        if bad:
            raise ValueError(
                f"early-exit chunk sizes {sizes} must be multiples of "
                f"check_every ({settings.check_every}); offending: {bad}"
            )
    else:
        sizes = [settings.max_iter]
    if settings.rescue_iters > 0 and settings.rho_update_every == 0:
        # Straggler rescue: EXTEND the final chunk's in-kernel budget by
        # rescue_iters instead of appending another dispatch. On the
        # early-exit path the last chunk already follows a compaction
        # boundary, so only the straggler lane group(s) iterate past
        # max_iter — every all-done program exits before its first
        # iteration — and no extra whole-batch re-layout is paid
        # (measured r05 at B=2048: the append-a-dispatch variant cost 19%
        # throughput, 9336 -> 7584 solves/s, for the same conv gain; the
        # folded form reaches the identical effective straggler cap
        # max_iter + rescue_iters). Without early exit this degenerates
        # to the same extended masked budget as the XLA structured path.
        sizes[-1] += settings.rescue_iters
    n_chunks = len(sizes)

    data = dict(
        Ldi=fac["Ldi"], Lsub_t=fac["Lsub_t"], u=fac["u"], s=fac["s"],
        Jt=Jt, f_seg=f_seg, pt=sa.p,
        qs=qs, Ps=Ps, rc=rc, rx=rx, lxs=lxs, uxs=uxs, lcs=lcs, ucs=ucs,
        D=D, E=E, soft_s=soft_s, soft_xs=soft_xs,
    )
    state = dict(x=x, zc=zc, zx=zx, yc=yc, yx=yx, done=done)

    take = lambda tree, idx: jax.tree_util.tree_map(
        lambda a: jnp.take(a, idx, axis=0), tree
    )

    total_used = jnp.zeros((B,), jnp.int32)
    rp = jnp.zeros((B,), dt)
    rd = jnp.zeros((B,), dt)
    # orig[i] = original batch index of the problem currently at slot i
    # (identity unless the early-exit path permutes between chunks)
    orig = jnp.arange(B)
    for c in range(n_chunks):
        iters_c = sizes[c]
        # Every chunk dispatches unconditionally: a program whose 128
        # lanes are all done exits its while_loop before the first
        # iteration, so an all-done dispatch costs only the operand
        # copies (wrapping the launch in lax.cond would save those, but
        # pallas_call under data-dependent control flow is avoided —
        # keep the launch structure static).
        state, used, rp_c, rd_c = dispatch(data, state, iters_c)
        total_used = total_used + used
        # rp/rd only refresh for problems still active in this chunk
        rp = jnp.where(used > 0, rp_c, rp)
        rd = jnp.where(used > 0, rd_c, rd)
        if c < n_chunks - 1 and settings.rho_update_every > 0:
            ratio = residual_ratio(
                state["x"], state["zc"], state["zx"], state["yc"],
                state["yx"],
            )
            want = (state["done"] == 0) & ((ratio > 5.0) | (ratio < 0.2))
            rho_new = jnp.where(
                want,
                jnp.clip(rho_s * ratio, settings.rho_min, settings.rho_max),
                rho_s,
            )

            def refactor(_):
                return factor(rho_new)[0]

            fac = jax.lax.cond(
                jnp.any(want), refactor, lambda _: fac, operand=None
            )
            rho_s = rho_new
            rc = rho_s[:, None] * pat_c
            rx = rho_s[:, None] * pat_x
            data.update(
                Ldi=fac["Ldi"], Lsub_t=fac["Lsub_t"], u=fac["u"],
                s=fac["s"], rc=rc, rx=rx,
            )
        if early_exit and c < n_chunks - 1:
            # COMPACT: stable-sort still-active problems to the front so
            # they pack into the leading 128-lane groups; grid programs
            # whose lanes are all done then exit before their first
            # iteration. done is sticky, so the active set only shrinks
            # and the stable sort keeps relative order deterministic.
            perm = jnp.argsort(state["done"] != 0, stable=True)
            data = take(data, perm)
            state = take(state, perm)
            total_used = jnp.take(total_used, perm, axis=0)
            rp = jnp.take(rp, perm, axis=0)
            rd = jnp.take(rd, perm, axis=0)
            orig = jnp.take(orig, perm, axis=0)

    # un-permute: scatter slot results back to original batch positions
    def unperm(a):
        return jnp.zeros_like(a).at[orig].set(a)

    if early_exit:
        x_out = unperm(state["x"])
        yc_out = unperm(state["yc"])
        yx_out = unperm(state["yx"])
        done_out = unperm(state["done"])
        total_used = unperm(total_used)
        rp = unperm(rp)
        rd = unperm(rd)
    else:
        x_out, yc_out, yx_out = state["x"], state["yc"], state["yx"]
        done_out = state["done"]

    # D/E were captured unpermuted above, so unscaling uses the original
    # per-problem scalings regardless of the compaction path
    return QPSolution(
        x=D * x_out,
        y_constraints=E * yc_out,
        y_box=yx_out / D,
        converged=done_out == 1,
        iterations=total_used,
        prim_residual=rp,
        dual_residual=rd,
    )
