#!/usr/bin/env python
"""Mosaic capability probe for the fused structured-ADMM kernel.

The planned kernel keeps the batch on the LANE axis (128 problems/program)
and does per-problem small linear algebra as broadcast-multiply-reduce over
sublanes. This probe compiles each building block in isolation on the real
TPU so any unsupported op pattern surfaces before the kernel is written:

  r1: sublane reshape (266, B) -> (19, 14, B)        [z-layout -> node-major]
  r2: lane-batch matvec (22, 22, B) x (22, B)        [banded triangular solve]
  r3: static leading-dim gather via unrolled slices   [segment <-> node maps]
  r4: sublane concat (19,14,B)+(19,7,B)+(19,1,B)      [node block assembly]
  r5: while_loop with (1, B) int32 masks + reductions [ADMM loop control]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128


def run(name, kernel, args, out_shape):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )
        out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"{name}: OK {jax.tree_util.tree_map(jnp.shape, out)}")
        return out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    key = jax.random.PRNGKey(0)

    # r1: sublane reshape
    x = jax.random.normal(key, (266, B), jnp.float32)

    def k1(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(19, 14, B)

    o1 = run("r1 reshape", k1, [x], jax.ShapeDtypeStruct((19, 14, B), jnp.float32))
    if o1 is not None:
        assert np.allclose(np.asarray(o1), np.asarray(x).reshape(19, 14, B))

    # r2: lane-batch matvec via broadcast-reduce
    L = jax.random.normal(key, (22, 22, B), jnp.float32)
    r = jax.random.normal(key, (22, B), jnp.float32)

    def k2(L_ref, r_ref, o_ref):
        o_ref[:] = jnp.sum(L_ref[:] * r_ref[:][None, :, :], axis=1)

    o2 = run("r2 matvec", k2, [L, r], jax.ShapeDtypeStruct((22, B), jnp.float32))
    if o2 is not None:
        want = np.einsum("ijb,jb->ib", np.asarray(L), np.asarray(r))
        assert np.allclose(np.asarray(o2), want, atol=1e-4), "r2 wrong"

    # r3: static gather via unrolled leading-dim slices
    t = jax.random.normal(key, (24, 14, B), jnp.float32)
    first = np.arange(19) % 24
    second = (np.arange(19) * 7) % 24
    v2 = (np.arange(19) % 3 == 0).astype(np.float32)

    def k3(t_ref, o_ref):
        tv = t_ref[:]
        rows = [
            tv[first[n]] + v2[n] * tv[second[n]] for n in range(19)
        ]
        o_ref[:] = jnp.stack(rows, axis=0)

    o3 = run("r3 gather", k3, [t], jax.ShapeDtypeStruct((19, 14, B), jnp.float32))
    if o3 is not None:
        want = np.asarray(t)[first] + v2[:, None, None] * np.asarray(t)[second]
        assert np.allclose(np.asarray(o3), want, atol=1e-6), "r3 wrong"

    # r4: sublane concat into node blocks
    a = jax.random.normal(key, (19, 14, B), jnp.float32)
    b = jax.random.normal(key, (19, 7, B), jnp.float32)
    c = jax.random.normal(key, (19, 1, B), jnp.float32)

    def k4(a_ref, b_ref, c_ref, o_ref):
        o_ref[:] = jnp.concatenate([a_ref[:], b_ref[:], c_ref[:]], axis=1)

    run("r4 concat", k4, [a, b, c], jax.ShapeDtypeStruct((19, 22, B), jnp.float32))

    # r5: while_loop with masks + lane reductions + dynamic leading index
    s0 = jax.random.normal(key, (19, 22, B), jnp.float32)
    Lb = jax.random.normal(key, (19, 22, 22, B), jnp.float32) * 0.01

    def k5(s_ref, L_ref, o_ref):
        Lv = L_ref[:]

        def body(state):
            s, done, k = state
            rows = []
            for n in range(19):
                rows.append(jnp.sum(Lv[n] * s[n][None], axis=0))
            s_new = jnp.stack(rows, axis=0)
            big = jnp.max(jnp.abs(s_new), axis=(0, 1), keepdims=True) > 1e3
            done = jnp.logical_or(done, big[0])
            s = jnp.where(done[None, :, :] if done.ndim == 2 else done, s, s_new)
            return s, done, k + 1

        def cond(state):
            _, done, k = state
            return jnp.logical_and(k < 8, jnp.sum(done.astype(jnp.int32)) < B)

        done0 = jnp.zeros((1, B), jnp.bool_)
        s, done, k = jax.lax.while_loop(cond, body, (s_ref[:], done0, 0))
        o_ref[:] = s

    run("r5 loop", k5, [s0, Lb], jax.ShapeDtypeStruct((19, 22, B), jnp.float32))


if __name__ == "__main__":
    main()
