"""Pallas TPU kernel: fused per-node constraint evaluation g = [tau; height]
and its exact Jacobian, with the batch on the (sublane, lane) axes.

Why this kernel exists: the round-4 stage breakdown (experiments/
r04_results.jsonl, v5e, B=1024) put `linearize` at ~59 ms and the merit
line search at ~59 ms per SQP step — together ~40% of the 287 ms solve —
while the fused ADMM loop itself had become small. Both stages are
dominated by per-node RNEA/FK evaluations: ~300 TINY elementwise/3-vector
XLA ops over (B, nodes[, candidates]) tensors, each op a separate
HBM-round-trip kernel, so the stages run at a few GFLOP/s — per-op
overhead-bound, ~100x below the VPU elementwise roofline.

This kernel computes the whole thing in VMEM: the flat evaluation batch
F = B * nodes (* line-search candidates) is laid out as (S=8 sublanes,
L=128 lanes) tiles — every "scalar" of the rigid-body recursion is an
(8, 128) f32 tile, every spatial 3-vector a triple of tiles — and the
7-joint Newton-Euler sweeps + tool FK unroll into straight-line VPU code
with zero HBM traffic between ops. The exact Jacobian dg/d[x;u] (the
ng x 21 block the structured QP needs) is produced by 21 forward-mode
tangent passes of the SAME straight-line function, traced in-kernel with
``jax.jvp`` under ``jax.vmap`` (tangents ride a leading 21-axis, so
Mosaic sees ~2x the op count of the value pass, not 21x).

Numerical safety: inputs are finite by construction (iterates clipped by
the SQP/ADMM path); the kernel itself introduces no divisions or special
values (sin/cos/polynomials only), so the TPU special-value hazard
(ops/pallas/admm_kernel.py) does not arise here.

Reference parity: same math as ops/rnea.rnea + ops/kinematics
.frame_height (the TPU-native equivalents of pinocchio rnea/FK used at
/root/reference/mpc_solver/robot_ocp.hpp:86-163); exactness of the
Jacobian is pinned against jax.jacfwd of the reference path in
tests/test_constraints_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.robot import PRISMATIC, RobotModel, Frame

f32 = jnp.float32


# ---------------------------------------------------------------------------
# Static model constants (baked into the kernel as python floats)
# ---------------------------------------------------------------------------


def bake_model(model: RobotModel, frame: Frame):
    """Extract the per-joint constants of a revolute chain as nested python
    float tuples (compile-time constants inside the kernel)."""
    if any(jt == PRISMATIC for jt in model.joint_types):
        raise NotImplementedError(
            "constraints kernel supports revolute chains only "
            "(the Panda); prismatic joints use the XLA path"
        )
    if not model.is_serial:
        raise NotImplementedError(
            "constraints kernel supports serial chains only; branched "
            "trees (panda_mass.urdf) use the XLA path"
        )
    as_t = lambda a: tuple(
        tuple(float(x) for x in row) if np.ndim(row) else float(row)
        for row in np.asarray(a)
    )
    nj = model.nq
    # convert the WHOLE captured arrays to numpy before any indexing:
    # model leaves are concrete host constants even inside a jit trace,
    # but jnp indexing ops on them would produce tracers
    tree_rot = np.asarray(model.tree_rotation, np.float64)
    tree_trans = np.asarray(model.tree_translation, np.float64)
    axes = np.asarray(model.axis, np.float64)
    masses = np.asarray(model.mass, np.float64)
    coms = np.asarray(model.com, np.float64)
    inertias = np.asarray(model.inertia, np.float64)
    joints = []
    for i in range(nj):
        R = tree_rot[i]
        t = tree_trans[i]
        ax = axes[i]
        K = np.array(
            [
                [0.0, -ax[2], ax[1]],
                [ax[2], 0.0, -ax[0]],
                [-ax[1], ax[0], 0.0],
            ]
        )
        m = float(masses[i])
        com = coms[i]
        Ic = inertias[i]
        # inertia about the frame origin (constant; spatial.inertia_apply
        # recomputes this per call — here it is baked once)
        c2 = float(com @ com)
        Io = Ic + m * (c2 * np.eye(3) - np.outer(com, com))
        joints.append(
            dict(
                R0=as_t(R), t=as_t(t), axis=as_t(ax), K=as_t(K),
                K2=as_t(K @ K), mass=m, mc=as_t(m * com), Io=as_t(Io),
            )
        )
    return dict(
        nj=nj,
        joints=tuple(joints),
        gravity=as_t(np.asarray(model.gravity, np.float64)),
        tool_parent=int(frame.parent_joint),
        tool_t=as_t(np.asarray(frame.translation, np.float64)),
    )


# ---------------------------------------------------------------------------
# Component-explicit spatial algebra on (.., S, L) tiles
# (3-vectors = tuples of tiles, 3x3 matrices = nested tuples; constants may
# be python floats — broadcasting against tiles is free)
# ---------------------------------------------------------------------------


def _mv(M, v):
    return tuple(
        M[i][0] * v[0] + M[i][1] * v[1] + M[i][2] * v[2] for i in range(3)
    )


def _mtv(M, v):
    return tuple(
        M[0][i] * v[0] + M[1][i] * v[1] + M[2][i] * v[2] for i in range(3)
    )


def _mm(A, B):
    return tuple(
        tuple(sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3))
        for i in range(3)
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _add(a, b):
    return tuple(a[i] + b[i] for i in range(3))


def _sub(a, b):
    return tuple(a[i] - b[i] for i in range(3))


def _scale(a, s):
    return tuple(a[i] * s for i in range(3))


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _axis_rot(j, q):
    """Rodrigues about the (constant unit) joint axis: R(q) entries are
    tiles; I + sin q K + (1 - cos q) K^2 (spatial.axis_angle_to_matrix)."""
    s, c = jnp.sin(q), jnp.cos(q)
    one_c = 1.0 - c
    K, K2 = j["K"], j["K2"]
    eye = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    return tuple(
        tuple(eye[a][b] + s * K[a][b] + one_c * K2[a][b] for b in range(3))
        for a in range(3)
    )


def lane_constraints(consts, xu):
    """g = [tau (nj); tool height] for lane-major inputs.

    xu: (2*nj + nj, ..., S, L) stacked [q; qdot; u] — exactly
    ocp.node_constraints' input split. Returns a list of nj+1 tiles.

    Mirrors ops/rnea.rnea (two Newton-Euler sweeps, gravity via the base
    acceleration trick, no URDF friction — pinocchio semantics) and
    ops/kinematics.frame_height, with every op a full-tile VPU op.
    """
    nj = consts["nj"]
    q = [xu[i] for i in range(nj)]
    qd = [xu[nj + i] for i in range(nj)]
    u = [xu[2 * nj + i] for i in range(nj)]
    zero = jnp.zeros_like(q[0])
    zv = (zero, zero, zero)

    g = consts["gravity"]
    v_w, v_v = zv, zv
    a_w = zv
    a_v = (-g[0] + zero, -g[1] + zero, -g[2] + zero)

    Es, vs, accs = [], [], []
    # world FK for the tool height, accumulated alongside the first sweep
    Rw = ((1.0 + zero, zero, zero), (zero, 1.0 + zero, zero), (zero, zero, 1.0 + zero))
    pw = zv
    height = None
    for i in range(nj):
        j = consts["joints"][i]
        Raxis = _axis_rot(j, q[i])
        # R_pi = R0 @ Raxis; E = R_pi^T maps parent coords -> joint coords
        R_pi = _mm(j["R0"], Raxis)
        E = tuple(tuple(R_pi[b][a] for b in range(3)) for a in range(3))
        r = j["t"]
        ax = j["axis"]

        # motion transform: w' = E w, v' = E (v - r x w)   (r constant)
        v_w_j = _mv(E, v_w)
        v_v_j = _mv(E, _sub(v_v, _cross(r, v_w)))
        sw_qd = _scale(ax, qd[i])
        v_w = _add(v_w_j, sw_qd)
        v_v = v_v_j

        a_w_j = _mv(E, a_w)
        a_v_j = _mv(E, _sub(a_v, _cross(r, a_w)))
        # velocity-product acceleration: (v x s qd) with s = [ax; 0]
        c_w = _cross(v_w, sw_qd)
        c_v = _cross(v_v, sw_qd)
        a_w = _add(_add(a_w_j, _scale(ax, u[i])), c_w)
        a_v = _add(a_v_j, c_v)

        Es.append(E)
        vs.append((v_w, v_v))
        accs.append((a_w, a_v))

        # world FK: compose (Rw, pw) with (R0, t) then the axis rotation
        pw = _add(_mv(Rw, r), pw)
        Rw = _mm(_mm(Rw, j["R0"]), Raxis)
        if i == consts["tool_parent"]:
            pt = _add(_mv(Rw, consts["tool_t"]), pw)
            height = pt[2]

    taus = [None] * nj
    f_w, f_v = zv, zv
    for i in range(nj - 1, -1, -1):
        j = consts["joints"][i]
        vw, vv = vs[i]
        aw, av = accs[i]
        # inertia_apply: f_ang = Io a_w + mc x a_v, f_lin = m a_v - mc x a_w
        Iw = _add(_mv(j["Io"], aw), _cross(j["mc"], av))
        Iv = _sub(_scale(av, j["mass"]), _cross(j["mc"], aw))
        hw = _add(_mv(j["Io"], vw), _cross(j["mc"], vv))
        hv = _sub(_scale(vv, j["mass"]), _cross(j["mc"], vw))
        # cross_force: b_ang = w x h_ang + v x h_lin, b_lin = w x h_lin
        bw = _add(_cross(vw, hw), _cross(vv, hv))
        bv = _cross(vw, hv)
        f_w = _add(f_w, _add(Iw, bw))
        f_v = _add(f_v, _add(Iv, bv))

        taus[i] = _dot(j["axis"], f_w)

        # force transform back to parent: fv' = E^T fv, fw' = E^T fw + r x fv'
        fv_p = _mtv(Es[i], f_v)
        fw_p = _add(_mtv(Es[i], f_w), _cross(j["t"], fv_p))
        f_w, f_v = fw_p, fv_p

    return taus + [height]


# ---------------------------------------------------------------------------
# Kernel + host wrapper
# ---------------------------------------------------------------------------


def _kernel(xu_ref, *out_refs, consts, with_jac: bool, n_in: int):
    xu = xu_ref[0]  # (n_in, S, L)

    def f(x):
        return jnp.stack(lane_constraints(consts, x), axis=0)

    g_out = out_refs[0]
    g_out[0] = f(xu)
    if with_jac:
        # 21 forward-mode tangent passes, batched on a leading axis so the
        # traced op count stays ~2x the value pass (ops act on
        # (n_in, n_in, S, L) / (n_in, ng, S, L) tiles). The one-hot basis
        # is built with full-rank iotas — Mosaic rejects the natural
        # eye[:, :, None, None] shape cast ("unsupported shape cast" for
        # (21,21)->(21,21,1,1)).
        shape = (n_in, n_in, *xu.shape[1:])
        i_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        basis = (i_idx == j_idx).astype(xu.dtype)
        jvp_one = lambda e: jax.jvp(f, (xu,), (e,))[1]
        J = jax.vmap(jvp_one)(basis)  # (n_in, ng, S, L)
        out_refs[1][0] = J


def fused_node_constraints(
    ocp, X, U, with_jac: bool = False, sublanes: int = 8, lanes: int = 128
):
    """Batched fused evaluation of the per-node constraints.

    X (B, nodes, nx), U (B, nodes, nu) -> g (B, nodes, ng)
    [, J (B, nodes, ng, nx+nu) when with_jac].

    The flat batch F = B * nodes is tiled as (S, L) = (sublanes, lanes)
    blocks (grid = ceil(F / (S*L)) programs); f32 like the other kernels.
    Callers flatten extra leading axes (e.g. line-search candidates) into
    B. Off-TPU this runs in interpret mode — use the XLA path there.
    """
    # trace-time only (python floats from concrete host arrays): zero
    # runtime cost, and no hashability requirement on ocp/model
    consts = bake_model(ocp.model, ocp.tool_frame)
    nx, nu, ng = ocp.nx, ocp.nu, ocp.ng
    n_in = nx + nu
    B, nodes = X.shape[0], X.shape[1]
    F = B * nodes
    T = sublanes * lanes
    nf = -(-F // T)
    Fp = nf * T

    xu = jnp.concatenate([X, U], axis=-1).reshape(F, n_in).astype(f32)
    if Fp != F:
        xu = jnp.concatenate(
            [xu, jnp.zeros((Fp - F, n_in), f32)], axis=0
        )
    # (F, n_in) -> (nf, n_in, S, L): scalars contiguous on (S, L) tiles
    xu = jnp.moveaxis(
        xu.reshape(nf, sublanes, lanes, n_in), 3, 1
    )

    out_shape = [jax.ShapeDtypeStruct((nf, ng, sublanes, lanes), f32)]
    if with_jac:
        out_shape.append(
            jax.ShapeDtypeStruct((nf, n_in, ng, sublanes, lanes), f32)
        )

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1, *shape), lambda i, _nd=nd: (i,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    outs = pl.pallas_call(
        functools.partial(
            _kernel, consts=consts, with_jac=with_jac, n_in=n_in
        ),
        grid=(nf,),
        in_specs=[spec(xu.shape[1:])],
        out_specs=[spec(s.shape[1:]) for s in out_shape],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        interpret=jax.default_backend() != "tpu",
    )(xu)

    def unlane(a):  # (nf, ..., S, L) -> (F, ...) with ... moved minor
        a = jnp.moveaxis(a, (-2, -1), (1, 2))  # (nf, S, L, ...)
        return a.reshape(Fp, *a.shape[3:])[:F]

    g = unlane(outs[0]).reshape(B, nodes, ng)
    if not with_jac:
        return g
    J = unlane(outs[1])  # (F, n_in, ng)
    J = jnp.swapaxes(J, 1, 2).reshape(B, nodes, ng, n_in)
    return g, J
