"""Structured (matrix-free) boxADMM backend for the transcribed OCP QPs.

Round 1 solved the QP subproblems with per-problem dense operators: each
ADMM iteration was three dependent (1, 512) x (512, 512) matvecs per
problem — one MXU row busy, ~1% utilization (the round-1 verdict's #1
finding). This backend removes every per-problem dense matrix:

* ``A @ v`` / ``A^T @ w`` run through :mod:`.structure` — the constraint
  matrix of the transcribed OCP is ``E_D + p*C_dyn + rank-1 + per-node
  J blocks`` with E_D/C_dyn shared by the whole batch, so the applies are
  small shared einsums whose wide axis is the batch.
* The ADMM x-update ``M x = rhs`` with ``M = diag(P) + sigma + rho_x +
  A^T diag(rho_c) A`` uses the block structure of M: ordering variables
  node-major ((x_k, u_k, s_k) per collocation node, the time parameter p
  last), M is block-banded with semi-bandwidth = the collocation order
  (only nodes sharing a spline segment couple) plus a dense p row/column
  (arrow). A batched block-banded Cholesky + rank-1 Schur complement for
  p factors it in O(nodes * bw^2 * blk^3) batched small GEMMs; each
  iteration's solve is two banded triangular sweeps of (B, blk, blk) @
  (B, blk) products — ~60k flops/problem instead of a 160k-MAC dense
  matvec that also re-reads a 640 KB inverse from HBM.
* Ruiz equilibration is computed structurally (inf-norms of E A D via the
  sparsity pattern) — the dense matrix is never materialized.

Semantics match :func:`.qp.solve_box_qp` (OSQP-style residuals, per-row
rho with equality scaling, adaptive rho with refactorization, masked
per-problem termination, divergence handling by the same residual checks)
— the linear solves are exact, as in polyMPC's boxADMM (sparse LDLT,
/root/reference/mpc_solver/motionPlanner.hpp:10-11), so convergence
behavior is that of the reference algorithm. A factorization (vs round
1's explicit inverse) is also backward-stable, which improves f32
convergence under the stiff rho_eq_scale weighting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .qp import _HARD, QPSettings, QPSolution, _rho_pattern, _soft_prox
from .structure import StructuredA, _static_indices, apply_A, apply_AT


def _dims(ocp):
    return (
        ocp.coll.order,
        ocp.coll.num_segments,
        ocp.num_nodes,
        ocp.nx,
        ocp.nu,
        ocp.ng,
        ocp.num_eq,
    )


def _node_cover(order: int, num_segments: int):
    """Static per-node covering segments: node n lies in segment(s)
    (sA, locA) and — for shared boundary nodes — (sB, locB)."""
    seg_idx, first, second, valid2 = _static_indices(order, num_segments)
    K = order + 1
    sA, lA = first // K, first % K
    sB, lB = second // K, second % K
    return sA, lA, sB, lB, valid2.astype(np.float64)


def _split_node_major(ocp, v):
    """(B, num_var) z-layout -> ((B, nodes, blk=nx+nu), (B,) p)."""
    _, _, nodes, nx, nu, _, _ = _dims(ocp)
    B = v.shape[0]
    X = v[:, : nodes * nx].reshape(B, nodes, nx)
    U = v[:, nodes * nx : nodes * (nx + nu)].reshape(B, nodes, nu)
    p = v[:, nodes * (nx + nu)]
    return jnp.concatenate([X, U], axis=-1), p


def _join_node_major(ocp, vb, vp):
    """Inverse of :func:`_split_node_major`."""
    _, _, nodes, nx, nu, _, _ = _dims(ocp)
    B = vb.shape[0]
    return jnp.concatenate(
        [
            vb[..., :nx].reshape(B, -1),
            vb[..., nx : nx + nu].reshape(B, -1),
            vp[:, None],
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Structured Ruiz equilibration
# ---------------------------------------------------------------------------


def ruiz_structured(ocp, sa: StructuredA, iters: int):
    """Inf-norm Ruiz scaling of A computed from its sparsity structure.

    Same sweep as qp._ruiz_equilibrate (col/row inf-norms of the scaled
    E A D, D *= 1/sqrt(colnorm), E *= 1/sqrt(rownorm)) without ever
    materializing A. Returns (D (B, n), E (B, m))."""
    order, S, nodes, nx, nu, ng, num_eq = _dims(ocp)
    K = order + 1
    nq = ocp.nq
    blk = nx + nu
    B = sa.p.shape[0]
    dt = sa.f_rows.dtype

    seg_idx, *_ = _static_indices(order, S)
    idx = jnp.asarray(seg_idx)  # (S, K)
    sA, lA, sB, lB, has2 = _node_cover(order, S)
    sA_, lA_, sB_, lB_ = (jnp.asarray(a) for a in (sA, lA, sB, lB))
    has2_ = jnp.asarray(has2, dt)

    absDm = jnp.abs(ocp.coll.diff_matrix).astype(dt)  # (K, K)
    p = jnp.abs(sa.p)
    absf = jnp.abs(sa.f_rows).reshape(B, S, K, nx)
    absJ = jnp.abs(sa.J).astype(dt)  # (B, nodes, ng, blk)

    d_nodes = jnp.ones((B, nodes, blk), dt)
    d_p = jnp.ones((B,), dt)
    e_eq = jnp.ones((B, S, K, nx), dt)
    e_g = jnp.ones((B, nodes, ng), dt)

    def scale(norm):
        return jnp.where(
            norm > 1e-10, 1.0 / jnp.sqrt(jnp.maximum(norm, 1e-10)), 1.0
        )

    for _ in range(iters):
        # ---- row inf-norms of E A D ----
        d_seg = d_nodes[:, idx, :nx]  # (B, S, K, nx) X-col scales per segment
        m_diff = jnp.max(
            absDm[None, None, :, :, None] * d_seg[:, :, None, :, :], axis=3
        )  # (B, S, k, nx): max_j |Dm[k,j]| d_X(node(s,j), i)
        d_v = d_nodes[:, idx, nq : nq + nx]  # V-col scale of row (s,k,i)
        r_eq = e_eq * jnp.maximum(
            jnp.maximum(m_diff, p[:, None, None, None] * d_v),
            absf * d_p[:, None, None, None],
        )
        r_g = e_g * jnp.max(absJ * d_nodes[:, :, None, :], axis=-1)

        # ---- column inf-norms of E A D ----
        def eq_col_contrib(s_, l_):
            e_cov = e_eq[:, s_]  # (B, nodes, K, nx) rows of the covering seg
            # X dims: rows (s, k, i) with coefficient |Dm[k, loc]|
            cD = jnp.max(
                absDm.T[l_][None, :, :, None] * e_cov, axis=2
            )  # (B, nodes, nx)
            # V dims c in [nq, nq+nx): row (s, loc(n, s), c - nq), coeff p
            e_row = jnp.take_along_axis(
                e_cov, l_[None, :, None, None], axis=2
            )[:, :, 0]  # (B, nodes, nx)
            cV = p[:, None, None] * e_row  # dims nq .. nq+nx
            return cD, cV

        cDA, cVA = eq_col_contrib(sA_, lA_)
        cDB, cVB = eq_col_contrib(sB_, lB_)
        h2 = has2_[None, :, None]
        cD = jnp.maximum(cDA, h2 * cDB)
        cV = jnp.maximum(cVA, h2 * cVB)

        c_nodes = jnp.zeros((B, nodes, blk), dt)
        c_nodes = c_nodes.at[..., :nx].set(cD)
        c_nodes = jnp.maximum(
            c_nodes,
            jnp.zeros_like(c_nodes).at[..., nq : nq + nx].set(cV),
        )
        cJ = jnp.max(absJ * e_g[..., None], axis=2)  # (B, nodes, blk)
        c_nodes = jnp.maximum(c_nodes, cJ) * d_nodes
        c_p = d_p * jnp.max(absf * e_eq, axis=(1, 2, 3))

        d_nodes = d_nodes * scale(c_nodes)
        d_p = d_p * scale(c_p)
        e_eq = e_eq * scale(r_eq)
        e_g = e_g * scale(r_g)

    D = _join_node_major(ocp, d_nodes, d_p)
    E = jnp.concatenate(
        [e_eq.reshape(B, num_eq), e_g.reshape(B, -1)], axis=-1
    )
    return D, E


# ---------------------------------------------------------------------------
# Block-banded + arrow assembly / factorization / solve
# ---------------------------------------------------------------------------


def _place(v, rows, cols, blk):
    """Embed per-dim values v (..., L) into (..., blk, blk) blocks at the
    static (rows[i], cols[i]) positions."""
    out = jnp.zeros((*v.shape[:-1], blk, blk), v.dtype)
    return out.at[..., jnp.asarray(rows), jnp.asarray(cols)].set(v)


def assemble_banded_M(ocp, sa: StructuredA, w_eq, w_g, D, sig):
    """Banded blocks of M = D A^T diag(w) A D + diag(sig) in node-major
    ordering, plus the p arrow column.

    w_eq (B, S, K, nx), w_g (B, nodes, ng): per-row weights E^2 * rho.
    D (B, n), sig (B, n) scaled diagonal (P_s + sigma + rho_x), both in
    z-layout.

    Returns (Mband, p_col, m_pp): Mband[b, k, d] = block M[node k+d, node
    k] (lower band, d = 0..order; d=0 blocks stored full-symmetric),
    p_col (B, nodes, blk), m_pp (B,).
    """
    order, S, nodes, nx, nu, ng, num_eq = _dims(ocp)
    K = order + 1
    nq = ocp.nq
    blk = nx + nu
    bw = order
    B = sa.p.shape[0]
    dt = w_eq.dtype

    Dm = ocp.coll.diff_matrix.astype(dt)  # (K, K): Dm[k, j]
    p = sa.p
    f_eq = sa.f_rows.reshape(B, S, K, nx)
    xdim = np.arange(nx)
    vdim = xdim + nq  # V(row dim i) lives at node-major dim i + nq

    d_nodes, d_p = _split_node_major(ocp, D)
    sig_nodes, sig_p = _split_node_major(ocp, sig)

    Mband = jnp.zeros((B, nodes, bw + 1, blk, blk), dt)

    def ncols(l):
        return np.arange(S) * order + l

    # (a) X-X: sum_k w[b,s,k,i] Dm[k,j] Dm[k,l]  (diagonal in i)
    T1 = jnp.einsum("bski,kj,kl->bsjli", w_eq, Dm, Dm)
    for j in range(K):
        for l in range(j + 1):
            Mband = Mband.at[:, ncols(l), j - l].add(
                _place(T1[:, :, j, l, :], xdim, xdim, blk)
            )

    # (b) X-V cross: row (s,k,i) couples X(node j, i) with V(node k, i+nq)
    T2 = (
        -p[:, None, None, None, None]
        * w_eq[:, :, :, None, :]
        * Dm[None, None, :, :, None]
    )  # (B, S, k, j, nx)
    for k in range(K):
        for j in range(K):
            val = T2[:, :, k, j, :]
            if j > k:
                Mband = Mband.at[:, ncols(k), j - k].add(
                    _place(val, xdim, vdim, blk)
                )
            elif j < k:
                Mband = Mband.at[:, ncols(j), k - j].add(
                    _place(val, vdim, xdim, blk)
                )
            else:
                Mband = Mband.at[:, ncols(k), 0].add(
                    _place(val, xdim, vdim, blk) + _place(val, vdim, xdim, blk)
                )

    # (c) V-V: p^2 w on the V diagonal
    T3 = (p**2)[:, None, None, None] * w_eq
    for k in range(K):
        Mband = Mband.at[:, ncols(k), 0].add(
            _place(T3[:, :, k, :], vdim, vdim, blk)
        )

    # (d) inequality rows: per-node J^T diag(w_g) J
    J = sa.J.astype(dt)
    Mband = Mband.at[:, :, 0].add(
        jnp.einsum("bngc,bng,bnge->bnce", J, w_g, J)
    )

    # ---- column scaling by D (rows of block d live on node k+d) ----
    d_shift = jnp.pad(d_nodes, ((0, 0), (0, bw), (0, 0)))
    for d in range(bw + 1):
        Mband = Mband.at[:, :, d].multiply(
            d_shift[:, d : d + nodes, :, None] * d_nodes[:, :, None, :]
        )

    # ---- p arrow ----
    wf = w_eq * f_eq
    pc_X = -jnp.einsum("bski,kj->bsji", wf, Dm)  # p vs X(node(s,j), i)
    pc_V = p[:, None, None, None] * wf  # p vs V(node(s,k), i+nq)
    p_col = jnp.zeros((B, nodes, blk), dt)
    for j in range(K):
        p_col = p_col.at[:, ncols(j), :nx].add(pc_X[:, :, j, :])
    for k in range(K):
        p_col = p_col.at[:, ncols(k), nq : nq + nx].add(pc_V[:, :, k, :])
    p_col = p_col * d_p[:, None, None] * d_nodes
    m_pp = jnp.sum(wf * f_eq, axis=(1, 2, 3)) * d_p**2

    # ---- scaled diagonal ----
    diag = np.arange(blk)
    Mband = Mband.at[:, :, 0, diag, diag].add(sig_nodes)
    m_pp = m_pp + sig_p
    return Mband, p_col, m_pp


def _tri_lower_inv(L):
    """Batched inverse of lower-triangular (B, ..., blk, blk)."""
    eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
    return jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True
    )


_GROUP = 3  # nodes per tridiagonal group (must be >= the band width)


def _to_group_tridiag(Mband, bw: int):
    """Regroup the node-level band into block-TRIDIAGONAL form over groups
    of `_GROUP` nodes. The no-fill segment structure guarantees adjacent
    groups only: a node-level (k, d <= bw <= _GROUP) block spans at most
    one group boundary. Fewer, larger sequential steps per solve — the
    triangular sweeps shrink from 2*nodes small matvecs to 2*ceil(nodes/3)
    (B, 3*blk) ones, which is what dominates ADMM iteration wall time.

    Returns (diag (B, G, gb, gb), sub (B, G-1, gb, gb)) with trailing
    dummy-identity padding nodes; d=0 node blocks are stored
    full-symmetric, higher-d blocks get mirrored into the upper triangle
    of the diagonal group blocks here."""
    B, N, _, blk, _ = Mband.shape
    G = -(-N // _GROUP)
    Np = G * _GROUP
    gb = _GROUP * blk
    dt = Mband.dtype
    diag = jnp.zeros((B, G, gb, gb), dt)
    sub = jnp.zeros((B, G - 1, gb, gb), dt)
    for k in range(N):
        gc, lc = divmod(k, _GROUP)
        for d in range(bw + 1):
            if k + d >= N:
                continue
            gr, lr = divmod(k + d, _GROUP)
            blkv = Mband[:, k, d]
            r0, c0 = lr * blk, lc * blk
            if gr == gc:
                diag = diag.at[:, gc, r0 : r0 + blk, c0 : c0 + blk].add(blkv)
                if d > 0:  # mirror into the upper triangle of the diag block
                    diag = diag.at[
                        :, gc, c0 : c0 + blk, r0 : r0 + blk
                    ].add(jnp.swapaxes(blkv, -1, -2))
            else:  # gr == gc + 1 (bw <= _GROUP)
                sub = sub.at[:, gc, r0 : r0 + blk, c0 : c0 + blk].add(blkv)
    # dummy padding nodes: identity diagonal, no coupling
    for k in range(N, Np):
        gc, lc = divmod(k, _GROUP)
        r0 = lc * blk
        diag = diag.at[:, gc, r0 : r0 + blk, r0 : r0 + blk].add(
            jnp.eye(blk, dtype=dt)
        )
    return diag, sub


def _tridiag_cholesky(diag, sub):
    """Batched block-tridiagonal Cholesky M = L L^T. Returns (Ld_inv
    (B, G, gb, gb) lower-triangular inverses of the diagonal factors,
    Lc (B, G-1, gb, gb) the subdiagonal factors L[g+1, g])."""
    G = diag.shape[1]
    Ld_inv, Lc = [], []
    S = diag[:, 0]
    for g in range(G):
        Lgg = jnp.linalg.cholesky(S)
        Linv = _tri_lower_inv(Lgg)
        Ld_inv.append(Linv)
        if g < G - 1:
            C = jnp.einsum("bij,bkj->bik", sub[:, g], Linv)  # L[g+1, g]
            Lc.append(C)
            S = diag[:, g + 1] - jnp.einsum("bij,bkj->bik", C, C)
    return jnp.stack(Ld_inv, 1), jnp.stack(Lc, 1)


def _tridiag_solve(Ld_inv, Lc, r):
    """Solve (L L^T) x = r for group-major r (B, G, gb)."""
    G = Ld_inv.shape[1]
    ys = []
    for g in range(G):
        acc = r[:, g]
        if g > 0:
            acc = acc - jnp.einsum("bij,bj->bi", Lc[:, g - 1], ys[g - 1])
        ys.append(jnp.einsum("bij,bj->bi", Ld_inv[:, g], acc))
    xs = [None] * G
    for g in range(G - 1, -1, -1):
        acc = ys[g]
        if g < G - 1:
            acc = acc - jnp.einsum("bji,bj->bi", Lc[:, g], xs[g + 1])
        xs[g] = jnp.einsum("bji,bj->bi", Ld_inv[:, g], acc)
    return jnp.stack(xs, axis=1)


def _pad_groups(r_nodes, G):
    """(B, N, blk) node-major -> (B, G, _GROUP*blk) group-major, padded."""
    B, N, blk = r_nodes.shape
    Np = G * _GROUP
    if Np != N:
        r_nodes = jnp.pad(r_nodes, ((0, 0), (0, Np - N), (0, 0)))
    return r_nodes.reshape(B, G, _GROUP * blk)


def factor_arrow(Mband, p_col, m_pp, bw: int):
    """Factor the banded + arrow system (group block-tridiagonal Cholesky
    + a rank-1 Schur complement for the time parameter p). Returns a
    pytree (dict) usable by :func:`solve_arrow`. Guards f32 Cholesky
    breakdown with a diagonal jitter retry (the factored form is
    backward-stable, but at rho_eq_scale=1e3 cond(M) can still exceed f32
    Cholesky range)."""
    blk = Mband.shape[-1]

    def run(jitter):
        Mb = Mband
        if jitter is not None:
            dg = np.arange(blk)
            Mb = Mband.at[:, :, 0, dg, dg].multiply(1.0 + jitter)
        diag, sub = _to_group_tridiag(Mb, bw)
        Ld_inv, Lc = _tridiag_cholesky(diag, sub)
        pc = _pad_groups(p_col, Ld_inv.shape[1])
        u = _tridiag_solve(Ld_inv, Lc, pc)
        s = m_pp - jnp.sum(u * pc, axis=(1, 2))
        return {"Ld_inv": Ld_inv, "Lc": Lc, "u": u, "s": s}

    fac = run(None)
    finite = jnp.all(jnp.isfinite(fac["Ld_inv"]), axis=(1, 2, 3)) & jnp.isfinite(
        fac["s"]
    )

    def retry(_):
        fac2 = run(1e-4)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                finite.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            ),
            fac,
            fac2,
        )

    return jax.lax.cond(jnp.all(finite), lambda _: fac, retry, None)


def solve_arrow(ocp, fac, bw: int, rhs):
    """Solve M x = rhs (z-layout rhs (B, n)) with the factored banded +
    arrow system."""
    r_b, r_p = _split_node_major(ocp, rhs)
    B, N, blk = r_b.shape
    G = fac["Ld_inv"].shape[1]
    rg = _pad_groups(r_b, G)
    t = _tridiag_solve(fac["Ld_inv"], fac["Lc"], rg)
    z_p = (r_p - jnp.sum(fac["u"] * rg, axis=(1, 2))) / fac["s"]
    z_b = (t - fac["u"] * z_p[:, None, None]).reshape(B, G * _GROUP, blk)[:, :N]
    return _join_node_major(ocp, z_b, z_p)


# ---------------------------------------------------------------------------
# Node-level block-banded Cholesky (the Pallas fused kernel's factor form)
# ---------------------------------------------------------------------------
#
# The group-tridiagonal factorization above stores DENSE inverses of the
# (3*blk x 3*blk) group diagonal factors — 56.6k floats/problem. At node
# level the band never fills beyond its width, so storing per-node diagonal
# inverses + the bw subdiagonal blocks is ~1.6x smaller (33.9k floats) and
# ~1.7x fewer solve flops — what the VMEM-resident kernel wants. The XLA
# while-loop path keeps the group form (fewer, larger sequential steps win
# when each step is a separate HBM-bound dispatch).


def banded_cholesky(Mband, bw: int):
    """Batched node-level block-banded Cholesky M = L L^T.

    Mband: (B, N, bw+1, blk, blk) with Mband[b, k, d] = M[k+d, k] (lower
    band; d=0 blocks full-symmetric). Returns:
      Ldi  (B, N, blk, blk)       inverses of the diagonal factors L[k, k]
      Lsub (B, N, bw, blk, blk)   Lsub[b, k, d-1] = L[k+d, k] (zero past
                                  the band / matrix end)
    """
    B, N, _, blk, _ = Mband.shape
    dt = Mband.dtype
    zeros = jnp.zeros((B, blk, blk), dt)
    # L[k+d, k] for computed columns, indexed [k][d-1]
    Lcols = [[None] * bw for _ in range(N)]
    Ldi = []
    for k in range(N):
        S = Mband[:, k, 0]
        for j in range(max(0, k - bw), k):
            Ljk = Lcols[j][k - j - 1]  # L[k, j]
            S = S - jnp.einsum("bij,bkj->bik", Ljk, Ljk)
        Lkk = jnp.linalg.cholesky(S)
        Linv = _tri_lower_inv(Lkk)
        Ldi.append(Linv)
        for d in range(1, bw + 1):
            if k + d >= N:
                Lcols[k][d - 1] = zeros
                continue
            C = Mband[:, k, d]  # M[k+d, k]
            for j in range(max(0, k + d - bw), k):
                # L[k+d, j] L[k, j]^T — both already computed
                C = C - jnp.einsum(
                    "bij,bkj->bik", Lcols[j][k + d - j - 1], Lcols[j][k - j - 1]
                )
            Lcols[k][d - 1] = jnp.einsum("bij,bkj->bik", C, Linv)
    Ldi = jnp.stack(Ldi, axis=1)
    Lsub = jnp.stack(
        [jnp.stack(col, axis=1) for col in Lcols], axis=1
    )  # (B, N, bw, blk, blk)
    return Ldi, Lsub


def banded_solve(Ldi, Lsub, r):
    """Solve (L L^T) x = r for node-major r (B, N, blk) with the factors of
    :func:`banded_cholesky`."""
    B, N, blk = r.shape
    bw = Lsub.shape[2]
    ys = []
    for k in range(N):
        acc = r[:, k]
        for d in range(1, min(bw, k) + 1):
            acc = acc - jnp.einsum("bij,bj->bi", Lsub[:, k - d, d - 1], ys[k - d])
        ys.append(jnp.einsum("bij,bj->bi", Ldi[:, k], acc))
    xs = [None] * N
    for k in range(N - 1, -1, -1):
        acc = ys[k]
        for d in range(1, min(bw, N - 1 - k) + 1):
            acc = acc - jnp.einsum("bji,bj->bi", Lsub[:, k, d - 1], xs[k + d])
        xs[k] = jnp.einsum("bji,bj->bi", Ldi[:, k], acc)
    return jnp.stack(xs, axis=1)


def factor_banded(Mband, p_col, m_pp, bw: int):
    """Node-level counterpart of :func:`factor_arrow`: block-banded
    Cholesky + rank-1 arrow Schur complement, with the same f32 breakdown
    guard (diagonal jitter retry)."""
    blk = Mband.shape[-1]

    def run(jitter):
        Mb = Mband
        if jitter is not None:
            dg = np.arange(blk)
            Mb = Mband.at[:, :, 0, dg, dg].multiply(1.0 + jitter)
        Ldi, Lsub = banded_cholesky(Mb, bw)
        u = banded_solve(Ldi, Lsub, p_col)
        s = m_pp - jnp.sum(u * p_col, axis=(1, 2))
        return {"Ldi": Ldi, "Lsub": Lsub, "u": u, "s": s}

    fac = run(None)
    finite = jnp.all(
        jnp.isfinite(fac["Ldi"]), axis=(1, 2, 3)
    ) & jnp.isfinite(fac["s"])

    def retry(_):
        fac2 = run(1e-4)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                finite.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            ),
            fac,
            fac2,
        )

    return jax.lax.cond(jnp.all(finite), lambda _: fac, retry, None)


def solve_arrow_banded(ocp, fac, rhs):
    """Solve M x = rhs with the node-level banded + arrow factors."""
    r_b, r_p = _split_node_major(ocp, rhs)
    t = banded_solve(fac["Ldi"], fac["Lsub"], r_b)
    z_p = (r_p - jnp.sum(fac["u"] * r_b, axis=(1, 2))) / fac["s"]
    z_b = t - fac["u"] * z_p[:, None, None]
    return _join_node_major(ocp, z_b, z_p)




# ---------------------------------------------------------------------------
# The structured ADMM loop
# ---------------------------------------------------------------------------


def solve_box_qp_structured(
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
) -> QPSolution:
    """Matrix-free counterpart of qp.solve_box_qp for the transcribed-OCP
    constraint operator. Same problem, settings and solution semantics
    (including the optional soft-row l1 weights soft_c and the soft
    variable-box weights soft_x, qp._soft_prox); `A` is given structurally
    (sa) instead of densely."""
    with jax.default_matmul_precision("highest"):
        return _solve_structured_impl(
            ocp, sa, P_diag, q, lc, uc, lx, ux, settings, x0, yc0, yx0,
            soft_c, soft_x,
        )


def _solve_structured_impl(
    ocp, sa, P_diag, q, lc, uc, lx, ux, settings, x0, yc0, yx0, soft_c=None,
    soft_x=None,
) -> QPSolution:
    B, n = q.shape
    m = lc.shape[1]
    dt = q.dtype
    order = ocp.coll.order
    bw = order
    nodes = ocp.num_nodes
    K = order + 1
    nx = ocp.nx

    # ---- Ruiz equilibration (structured) ----
    if settings.ruiz_iters > 0:
        D, E = ruiz_structured(ocp, sa, settings.ruiz_iters)
        D, E = D.astype(dt), E.astype(dt)
    else:
        D = jnp.ones((B, n), dt)
        E = jnp.ones((B, m), dt)

    Ps = D * P_diag * D
    qs = D * q
    lcs, ucs = E * lc, E * uc
    lxs, uxs = lx / D, ux / D

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
    sigma = jnp.asarray(settings.sigma, dt)
    alpha = jnp.asarray(settings.alpha, dt)
    rho0 = jnp.full((B,), settings.rho, dt)

    # scaled operator applies
    def matA(v):
        return E * apply_A(ocp, sa, D * v)

    def matAT(w):
        return D * apply_AT(ocp, sa, E * w)

    num_eq = ocp.num_eq

    def factor(rho_s):
        rc = rho_s[:, None] * pat_c
        rx = rho_s[:, None] * pat_x
        w = E * E * rc
        w_eq = w[:, :num_eq].reshape(B, -1, K, nx)
        w_g = w[:, num_eq:].reshape(B, nodes, -1)
        sig = Ps + sigma + rx
        Mband, p_col, m_pp = assemble_banded_M(ocp, sa, w_eq, w_g, D, sig)
        return factor_arrow(Mband, p_col, m_pp, bw)

    fac0 = factor(rho0)

    x = jnp.zeros((B, n), dt) if x0 is None else x0 / D
    yc = jnp.zeros((B, m), dt) if yc0 is None else yc0 / E
    yx = jnp.zeros((B, n), dt) if yx0 is None else yx0 * D

    zc = jnp.clip(matA(x), lcs, ucs)
    zx = jnp.clip(x, lxs, uxs)

    def residuals(x, zc, zx, yc, yx):
        Ax = matA(x)
        r_prim_c = jnp.max(jnp.abs((Ax - zc) / E), axis=-1)
        r_prim_x = jnp.max(jnp.abs(D * (x - zx)), axis=-1)
        r_prim = jnp.maximum(r_prim_c, r_prim_x)
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
        eps_p = settings.eps_abs + settings.eps_rel * scale_p
        eps_d = settings.eps_abs + settings.eps_rel * scale_d
        conv = (r_prim <= eps_p) & (r_dual <= eps_d)
        ratio = jnp.sqrt(
            (r_prim / jnp.maximum(scale_p, 1e-12))
            / jnp.maximum(r_dual / jnp.maximum(scale_d, 1e-12), 1e-12)
        )
        return r_prim, r_dual, conv, ratio

    # effective iteration cap: rescue_iters extends the masked loop (see
    # QPSettings.rescue_iters; converged problems are frozen, so results
    # for them are identical — only stragglers use the extra budget)
    cap = settings.max_iter + settings.rescue_iters

    def step(state):
        x, zc, zx, yc, yx, done, iters, rp, rd, rho_s, fac, k = state

        rc = rho_s[:, None] * pat_c
        rx = rho_s[:, None] * pat_x
        rhs = sigma * x - qs + matAT(rc * zc - yc) + (rx * zx - yx)
        xt = solve_arrow(ocp, fac, bw, rhs)
        for _ in range(settings.kkt_refine):
            Mxt = (Ps + sigma + rx) * xt + matAT(rc * matA(xt))
            xt = xt + solve_arrow(ocp, fac, bw, rhs - Mxt)
        zt_c = matA(xt)

        x_new = alpha * xt + (1.0 - alpha) * x
        zc_arg = alpha * zt_c + (1.0 - alpha) * zc
        zc_new = _soft_prox(
            zc_arg + yc / rc, lcs, ucs,
            jnp.minimum(soft_s, _HARD * rc) / rc,
        )
        yc_new = yc + rc * (zc_arg - zc_new)
        zx_arg = alpha * xt + (1.0 - alpha) * zx
        zx_new = _soft_prox(
            zx_arg + yx / rx, lxs, uxs,
            jnp.minimum(soft_xs, _HARD * rx) / rx,
        )
        yx_new = yx + rx * (zx_arg - zx_new)

        keep = done[:, None]
        x = jnp.where(keep, x, x_new)
        zc = jnp.where(keep, zc, zc_new)
        zx = jnp.where(keep, zx, zx_new)
        yc = jnp.where(keep, yc, yc_new)
        yx = jnp.where(keep, yx, yx_new)

        k = k + 1

        def check(args):
            x, zc, zx, yc, yx, done, iters, rp, rd, rho_s, fac = args
            rp_new, rd_new, conv, ratio = residuals(x, zc, zx, yc, yx)
            rp = jnp.where(done, rp, rp_new)
            rd = jnp.where(done, rd, rd_new)
            newly = conv & ~done
            iters = jnp.where(newly, k, iters)
            done = done | conv

            if settings.rho_update_every > 0:
                want = (
                    (k % settings.rho_update_every == 0)
                    & ~done
                    & ((ratio > 5.0) | (ratio < 0.2))
                )
                rho_new = jnp.where(
                    want,
                    jnp.clip(rho_s * ratio, settings.rho_min, settings.rho_max),
                    rho_s,
                )
                fac = jax.lax.cond(
                    jnp.any(want),
                    lambda _: factor(rho_new),
                    lambda _: fac,
                    operand=None,
                )
                rho_s = rho_new
            return x, zc, zx, yc, yx, done, iters, rp, rd, rho_s, fac

        args = (x, zc, zx, yc, yx, done, iters, rp, rd, rho_s, fac)
        x, zc, zx, yc, yx, done, iters, rp, rd, rho_s, fac = jax.lax.cond(
            (k % settings.check_every == 0) | (k >= cap),
            check,
            lambda a: a,
            args,
        )
        return x, zc, zx, yc, yx, done, iters, rp, rd, rho_s, fac, k

    def cond(state):
        *_, done, _, _, _, _, _, k = state
        return (k < cap) & ~jnp.all(done)

    zeros_b = jnp.zeros(B, dt)
    state = (
        x,
        zc,
        zx,
        yc,
        yx,
        jnp.zeros(B, bool),
        jnp.full(B, cap, jnp.int32),
        zeros_b,
        zeros_b,
        rho0,
        fac0,
        jnp.asarray(0, jnp.int32),
    )
    x, zc, zx, yc, yx, done, iters, rp, rd, *_ = jax.lax.while_loop(
        cond, step, state
    )

    return QPSolution(
        x=D * x,
        y_constraints=E * yc,
        y_box=yx / D,
        converged=done,
        iterations=iters,
        prim_residual=rp,
        dual_residual=rd,
    )
