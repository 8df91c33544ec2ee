"""Pallas TPU kernel: fused VMEM-resident boxADMM iteration loop.

Performance rationale: the XLA path of :mod:`..qp` re-reads each problem's
KKT inverse (400x400) and constraint matrix (488x400) from HBM on every one
of the <=700 ADMM iterations — ~1.3 MB/element/iteration, which makes the
solver HBM-bandwidth-bound. This kernel loads both matrices into VMEM once
per problem per CHUNK of iterations and runs the chunk's loop entirely
on-chip, cutting HBM traffic by ~the chunk length (100x+).

Latency hiding: a single problem's iteration is three dependent
(1, 512) x (512, 512) matvecs — each uses one MXU row and serializes on
the systolic-array latency, so one problem per program leaves the MXU
mostly idle. Each grid program therefore carries ``group`` (G) problems
and unrolls their matvecs back-to-back as straight-line code (no lax.cond
around them — conditional branches serialize and would block the
interleave): the G chains are independent, so their MXU ops pipeline.

Precision (``mxu_precision``): ADMM at eps 1e-3 on Ruiz-equilibrated data
cannot converge with 1-pass bf16 matvecs (error floor ~1e-2; measured
conv=0% on the planner workload), while Mosaic only exposes DEFAULT
(1-pass) and HIGHEST (6-pass) dot precisions. ``"split3"`` implements the
missing middle — the classic bf16x3 scheme — manually: matrices are stored
in VMEM as bf16 (hi, lo) SPLITS with A ~ A_hi + A_lo, vectors are split
per matvec, and A@v ~ A_hi@v_hi + A_hi@v_lo + A_lo@v_hi runs as three
1-pass bf16 MXU dots with f32 accumulation (the dropped A_lo@v_lo term is
O(2^-16) relative). Net: ~2x fewer MXU passes than HIGHEST *and* half the
VMEM per matrix, which doubles the feasible group size.

OSQP-style adaptive rho is preserved by chunking: the caller runs the
kernel for `check/update`-sized chunks, evaluates residuals and rescales
rho (with a batched refactorization of the KKT inverse) between chunks.
Full ADMM state (x, zc, zx, yc, yx, done) round-trips through the kernel;
converged problems are frozen by selects and the loop exits when the whole
group is done.

Layout: n (variables) and m (constraint rows) both zero-padded to PAD=512
(MXU tile multiple). Per-program vectors are (G, PAD) blocks; matrices are
stacked as (G*PAD, PAD) so each problem's square lives at a static row
offset. M_inv is symmetric so ``x @ M_inv`` IS the matvec; the two A
contractions use dot_general on either dimension. Padded variable entries
stay exactly zero by construction (zero matrix rows/cols + lb = ub = 0
box); padded batch entries (B not divisible by G) enter with done=1 and
are dropped by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..qp import _HARD  # single source of truth for the hard-row stand-in

PAD = 512  # padded size for both variable and constraint dimensions
bf16 = jnp.bfloat16
f32 = jnp.float32


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def pad_vec(v):
    """(B, d) -> (B, PAD) zero-padded."""
    return _pad_to(v, PAD, 1)


def pad_vec_ones(v):
    """(B, d) -> (B, PAD), padded entries set to 1 (divide-safe)."""
    B = v.shape[0]
    return jnp.concatenate([v, jnp.ones((B, PAD - v.shape[1]), v.dtype)], axis=1)


def pad_mat(M):
    """(B, r, c) -> (B, PAD, PAD)."""
    return _pad_to(_pad_to(M, PAD, 1), PAD, 2)


def bf16_split(a):
    """f32 array -> (hi, lo) bf16 pair with hi + lo ~ a (bf16x3 storage)."""
    hi = a.astype(bf16)
    lo = (a - hi.astype(f32)).astype(bf16)
    return hi, lo


def _admm_kernel(
    *refs,
    group: int,
    chunk_iters: int,
    check_every: int,
    hard: float,
    eps_abs: float,
    eps_rel: float,
    sigma: float,
    alpha: float,
    mxu_precision: str,
    kkt_refine: int,
):
    G = group
    split = mxu_precision in ("split3", "split4")
    n_mats = 4 if split else 2
    mat_refs = refs[:n_mats]
    (
        P_ref, q_ref, lc_ref, uc_ref, lx_ref, ux_ref, rc_ref, rx_ref,
        D_ref, E_ref, sc_ref, sx_ref, x0_ref, zc0_ref, zx0_ref, yc0_ref,
        yx0_ref, done0_ref,
        x_out, zc_out, zx_out, yc_out, yx_out, done_out, used_out,
    ) = refs[n_mats:]

    # (G, PAD) operand blocks; matrices stacked (G*PAD, PAD)
    P = P_ref[0]
    q = q_ref[0]
    lc, uc = lc_ref[0], uc_ref[0]
    lx, ux = lx_ref[0], ux_ref[0]
    rc, rx = rc_ref[0], rx_ref[0]
    D, E = D_ref[0], E_ref[0]
    # soft-row shrink thresholds (hard rows: huge finite). The numerator is
    # capped BEFORE the divide so the quotient can never overflow f32 to
    # inf inside VMEM, regardless of how small rc/rx get (`hard` is baked
    # in from qp._HARD; hard * rc keeps hard rows at exactly `hard` after
    # the divide, where the shrink clip never binds).
    thr = jnp.minimum(sc_ref[0], hard * rc) / rc
    thr_x = jnp.minimum(sx_ref[0], hard * rx) / rx

    prec = (
        jax.lax.Precision.DEFAULT
        if mxu_precision in ("default", "split3", "split4")
        else jax.lax.Precision.HIGHEST
    )

    def dot_dim(v, M, dim):
        return jax.lax.dot_general(
            v, M, (((1,), (dim,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )

    def mat(which, g):
        """which: 0 = M_inv, 1 = A. Returns f32 matrix or (hi, lo) pair."""
        if split:
            hi = mat_refs[2 * which][0, g * PAD : (g + 1) * PAD, :]
            lo = mat_refs[2 * which + 1][0, g * PAD : (g + 1) * PAD, :]
            return hi, lo
        return mat_refs[which][0, g * PAD : (g + 1) * PAD, :]

    def matvec(M, v, dim=1):
        """(1, PAD) @ matrix along `dim` (1: A@v / M_inv solve, 0: A^T@w)."""
        if split:
            hi, lo = M
            vh = v.astype(bf16)
            vl = (v - vh.astype(f32)).astype(bf16)
            acc = dot_dim(vh, hi, dim) + dot_dim(vl, hi, dim) + dot_dim(vh, lo, dim)
            if mxu_precision == "split4":
                # bf16x4: keep the lo x lo term too — error floor drops from
                # ~2^-16 (which the rho_eq_scale-weighted duals amplify into
                # divergence) to ~2^-24, i.e. f32-like, at 4 one-pass dots
                # vs HIGHEST's 6 passes.
                acc = acc + dot_dim(vl, lo, dim)
            return acc
        return dot_dim(v, M, dim)

    def residual_check(g, x, zc, zx, yc, yx):
        A = mat(1, g)
        xg, zcg, zxg = x[g : g + 1], zc[g : g + 1], zx[g : g + 1]
        ycg, yxg = yc[g : g + 1], yx[g : g + 1]
        Dg, Eg = D[g : g + 1], E[g : g + 1]
        Ax = matvec(A, xg, 1)
        r_prim = jnp.maximum(
            jnp.max(jnp.abs((Ax - zcg) / Eg)), jnp.max(jnp.abs(Dg * (xg - zxg)))
        )
        Aty = matvec(A, ycg, 0)
        r_dual = jnp.max(
            jnp.abs((P[g : g + 1] * xg + q[g : g + 1] + Aty + yxg) / Dg)
        )
        scale_p = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ax / Eg)), jnp.max(jnp.abs(zcg / Eg))),
            jnp.maximum(jnp.max(jnp.abs(Dg * xg)), jnp.max(jnp.abs(Dg * zxg))),
        )
        scale_d = jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(P[g : g + 1] * xg / Dg)),
                jnp.max(jnp.abs(q[g : g + 1] / Dg)),
            ),
            jnp.maximum(jnp.max(jnp.abs(Aty / Dg)), jnp.max(jnp.abs(yxg / Dg))),
        )
        eps_p = eps_abs + eps_rel * scale_p
        eps_d = eps_abs + eps_rel * scale_d
        return (r_prim <= eps_p) & (r_dual <= eps_d)

    def cond(state):
        _, _, _, _, _, done, k, _ = state
        # done is an int32 (G, 1) array — Mosaic needs >=2-D layouts and
        # can't extract bool scalars. Codes: 0 running, 1 converged,
        # 2 diverged-frozen.
        return jnp.logical_and(k < chunk_iters, jnp.sum(done != 0) < G)

    def body(state):
        x, zc, zx, yc, yx, done, k, used = state

        # ---- x-update matvecs, unrolled over the group so the G
        # independent MXU chains pipeline. Deliberately UNCONDITIONAL:
        # wrapping each problem's matvecs in lax.cond(done) serializes the
        # branches and blocks cross-problem MXU interleaving — the whole
        # point of grouping. Done problems waste their matvecs but are
        # frozen by the select below, and the loop exits once all are done.
        rhs = sigma * x - q + (rx * zx - yx)
        u = rc * zc - yc
        xt_rows = []
        ztc_rows = []
        for g in range(G):
            A = mat(1, g)
            Mi = mat(0, g)
            r = rhs[g : g + 1] + matvec(A, u[g : g + 1], 0)
            xt_g = matvec(Mi, r, 1)  # M_inv symmetric
            Ax_g = matvec(A, xt_g, 1)
            for _ in range(kkt_refine):
                # one step of iterative refinement on M xt = r, with M
                # applied in factored form (M = diag(P + sigma + rx)
                # + A^T diag(rc) A, all resident): recovers f64-like ADMM
                # convergence from the f32 explicit inverse (see QPSettings
                # .kkt_refine) at the cost of 3 extra matvecs.
                r2 = (
                    r
                    - (P[g : g + 1] + sigma + rx[g : g + 1]) * xt_g
                    - matvec(A, rc[g : g + 1] * Ax_g, 0)
                )
                xt_g = xt_g + matvec(Mi, r2, 1)
                Ax_g = matvec(A, xt_g, 1)
            xt_rows.append(xt_g)
            ztc_rows.append(Ax_g)
        xt = jnp.concatenate(xt_rows, axis=0)  # (G, PAD)
        zt_c = jnp.concatenate(ztc_rows, axis=0)

        # ---- elementwise updates, vectorized over the whole group ----
        # ftz: TPU special-value handling (denormals etc.) runs elementwise
        # and MXU ops through a microcoded slow path — measured 100x+
        # wall-time blowups once near-zero/huge values accumulate in the
        # state, long enough to trip the device watchdog on big grids.
        # Flushing the denormal range to exact zero every iteration keeps
        # all matvec inputs on the fast path for negligible VPU cost; the
        # symmetric clamp at 1e15 keeps diverging problems finite until the
        # next residual check freezes them (inf/nan would otherwise appear
        # within ~25 iterations of exponential blow-up and drag the whole
        # group onto the special-value slow path).
        ftz = lambda v: jnp.clip(
            jnp.where(jnp.abs(v) < 1e-30, 0.0, v), -1e15, 1e15
        )
        # ftz the projected z BEFORE the dual update so the stored z and
        # the dual step never disagree above the 1e15 clamp (they only
        # could when a bound is the 1e20 inf stand-in, i.e. on already-
        # diverging problems, but consistency keeps the invariant local).
        x_new = ftz(alpha * xt + (1.0 - alpha) * x)
        zc_arg = alpha * zt_c + (1.0 - alpha) * zc
        # soft-row prox (qp._soft_prox): hard rows have thr ~1e20/rc, where
        # the shrink clip never binds and this reduces to the box clip
        vc = zc_arg + yc / rc
        boxc = jnp.clip(vc, lc, uc)
        zc_new = ftz(vc - jnp.clip(vc - boxc, -thr, thr))
        yc_new = ftz(yc + rc * (zc_arg - zc_new))
        zx_arg = alpha * xt + (1.0 - alpha) * zx
        vx = zx_arg + yx / rx
        boxx = jnp.clip(vx, lx, ux)
        zx_new = ftz(vx - jnp.clip(vx - boxx, -thr_x, thr_x))
        yx_new = ftz(yx + rx * (zx_arg - zx_new))

        keep = done > 0  # (G, 1) broadcasts over (G, PAD)
        x = jnp.where(keep, x, x_new)
        zc = jnp.where(keep, zc, zc_new)
        zx = jnp.where(keep, zx, zx_new)
        yc = jnp.where(keep, yc, yc_new)
        yx = jnp.where(keep, yx, yx_new)
        used = jnp.where(keep, used, used + 1)

        k = k + 1
        do_check = jnp.logical_or(k % check_every == 0, k >= chunk_iters)

        def run_checks(_):
            # huge iterates mean ADMM divergence: freeze the problem with
            # code 2 (reported unconverged) before inf/nan reach the MXU
            # and hit the special-value slow path. (G, 1) layout — Mosaic
            # can't extract bool scalars.
            # NaN-safe: ~(max <= thr) is True for NaN too, so a state that
            # blew past inf/nan between checks still freezes
            big = ~(
                jnp.max(jnp.abs(x) + jnp.abs(yc) + jnp.abs(yx), axis=1,
                        keepdims=True)
                <= 1e12
            )
            convs = []
            for g in range(G):
                convs.append(
                    jax.lax.cond(
                        done[g, 0] > 0,
                        lambda _, g=g: done[g : g + 1, :],
                        lambda _, g=g: jnp.where(
                            big[g : g + 1, :],
                            jnp.full((1, 1), 2, jnp.int32),
                            residual_check(g, x, zc, zx, yc, yx).astype(
                                jnp.int32
                            )[None, None],
                        ),
                        operand=None,
                    )
                )
            return jnp.concatenate(convs, axis=0)

        conv = jax.lax.cond(do_check, run_checks, lambda _: done, operand=None)
        return x, zc, zx, yc, yx, conv, k, used

    state = (
        x0_ref[0],
        zc0_ref[0],
        zx0_ref[0],
        yc0_ref[0],
        yx0_ref[0],
        done0_ref[0],  # (G, 1) int32
        jnp.asarray(0, jnp.int32),
        jnp.zeros((G, 1), jnp.int32),
    )
    x, zc, zx, yc, yx, done, k, used = jax.lax.while_loop(cond, body, state)

    x_out[0] = x
    zc_out[0] = zc
    zx_out[0] = zx
    yc_out[0] = yc
    yx_out[0] = yx
    done_out[0] = done
    used_out[0] = used


@functools.partial(
    jax.jit,
    static_argnames=(
        "group",
        "chunk_iters",
        "check_every",
        "eps_abs",
        "eps_rel",
        "sigma",
        "alpha",
        "mxu_precision",
        "kkt_refine",
    ),
)
def admm_pallas_chunk(
    operands,
    state,
    *,
    group: int,
    chunk_iters: int,
    check_every: int,
    eps_abs: float,
    eps_rel: float,
    sigma: float,
    alpha: float,
    mxu_precision: str = "split3",
    kkt_refine: int = 0,
):
    """Run one fused chunk of ADMM iterations.

    operands: dict with padded M_inv/A (B, PAD, PAD) f32 and (B, PAD)
    vector P, q, lc, uc, lx, ux, rc, rx, D, E, sc, sx (all float32; sc/sx
    = scaled soft constraint-row / variable-box penalty weights,
    qp._HARD stand-in for hard rows).
    state: dict with x, zc, zx, yc, yx (B, PAD) and done (B, 1) int32.
    B must be a multiple of `group` (pad with done=1 dummies).

    Returns the new state dict plus `used` (B,) iterations executed.
    """
    B = operands["q"].shape[0]
    G = group
    assert B % G == 0, (B, G)
    nb = B // G
    split = mxu_precision in ("split3", "split4")

    kernel = functools.partial(
        _admm_kernel,
        group=G,
        chunk_iters=chunk_iters,
        check_every=check_every,
        hard=_HARD,
        eps_abs=eps_abs,
        eps_rel=eps_rel,
        sigma=sigma,
        alpha=alpha,
        mxu_precision=mxu_precision,
        kkt_refine=kkt_refine,
    )

    # matrices: (B, PAD, PAD) -> (nb, G*PAD, PAD); vectors: (B, PAD) -> (nb, G, PAD)
    as_mat = lambda M: M.reshape(nb, G * PAD, PAD)
    as_vec = lambda v: v.reshape(nb, G, PAD)

    if split:
        Mh, Ml = bf16_split(operands["M_inv"])
        Ah, Al = bf16_split(operands["A"])
        mats = [as_mat(Mh), as_mat(Ml), as_mat(Ah), as_mat(Al)]
    else:
        mats = [as_mat(operands["M_inv"]), as_mat(operands["A"])]

    mat_spec = pl.BlockSpec(
        (1, G * PAD, PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((1, G, PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, G, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec_shape = jax.ShapeDtypeStruct((nb, G, PAD), f32)
    scalar_shape = jax.ShapeDtypeStruct((nb, G, 1), jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[mat_spec] * len(mats) + [vec_spec] * 17 + [scalar_spec],
        out_specs=(vec_spec,) * 5 + (scalar_spec, scalar_spec),
        out_shape=(vec_shape,) * 5 + (scalar_shape, scalar_shape),
        compiler_params=pltpu.CompilerParams(
            # IR (kkt_refine) lengthens the per-problem dot chain and its
            # live Mosaic scratch past the 16 MiB default scoped budget at
            # large grids; v5e has headroom above that, so ask for more.
            vmem_limit_bytes=int(30 * 1024 * 1024),
        ),
        # off-TPU (tests), run the kernel in interpret mode so the pallas
        # backend stays covered by the CPU suite
        interpret=jax.default_backend() != "tpu",
    )(
        *mats,
        as_vec(operands["P"]),
        as_vec(operands["q"]),
        as_vec(operands["lc"]),
        as_vec(operands["uc"]),
        as_vec(operands["lx"]),
        as_vec(operands["ux"]),
        as_vec(operands["rc"]),
        as_vec(operands["rx"]),
        as_vec(operands["D"]),
        as_vec(operands["E"]),
        as_vec(operands["sc"]),
        as_vec(operands["sx"]),
        as_vec(state["x"]),
        as_vec(state["zc"]),
        as_vec(state["zx"]),
        as_vec(state["yc"]),
        as_vec(state["yx"]),
        state["done"].reshape(nb, G, 1),
    )
    x, zc, zx, yc, yx, done, used = out
    unvec = lambda v: v.reshape(B, PAD)
    new_state = dict(
        x=unvec(x),
        zc=unvec(zc),
        zx=unvec(zx),
        yc=unvec(yc),
        yx=unvec(yx),
        done=done.reshape(B, 1),
    )
    return new_state, used.reshape(B)
