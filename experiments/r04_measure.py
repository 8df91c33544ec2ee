#!/usr/bin/env python
"""Round-4 TPU measurement driver (VERDICT r03 asks #1b, #6, #7, #8, #9).

Phases (run one per process so a device fault doesn't lose the batch;
results append to experiments/r04_results.jsonl):

    python experiments/r04_measure.py stage     # production stage breakdown
    python experiments/r04_measure.py iters     # QP iteration distribution
    python experiments/r04_measure.py latency   # batch-1/8/64 p50/p95
    python experiments/r04_measure.py b4096     # B=4096 violation control

The early-exit throughput sweep runs through bench.py directly
(BENCH_EXIT_EVERY=... python bench.py), see experiments/r04_run_tpu.sh.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r04_results.jsonl")


def emit(rec):
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def make_planner(exit_every=0, max_iter=700):
    from mpc_motion_planner_tpu.ops.qp import QPSettings
    from mpc_motion_planner_tpu.planner import Margins, MotionPlanner

    return MotionPlanner(
        margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1),
        qp_settings=QPSettings(
            backend="structured_pallas", kkt_refine=0, rho_update_every=0,
            max_iter=max_iter, exit_every=exit_every,
        ),
    )


def phase_stage(args):
    import jax

    from mpc_motion_planner_tpu.bench.harness import chain_states
    from mpc_motion_planner_tpu.utils.profiling import stage_timings_structured

    planner = make_planner(exit_every=args.exit_every)
    key = jax.random.PRNGKey(0)
    cur, tgt = chain_states(planner, key, args.batch)
    out = stage_timings_structured(planner, cur, tgt, repeats=args.repeats)
    out.update(phase="stage", device=str(jax.devices()[0]),
               exit_every=args.exit_every)
    emit(out)


def phase_iters(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpc_motion_planner_tpu.bench.harness import chain_states

    planner = make_planner()
    key = jax.random.PRNGKey(0)
    cur, tgt = chain_states(planner, key, args.batch)

    @jax.jit
    def run(cur, tgt):
        sol = planner.solve(cur, tgt)
        return sol.qp_iterations, sol.qp_converged

    iters, conv = jax.block_until_ready(run(cur, tgt))
    iters = np.asarray(iters)  # (B, 2)
    conv = np.asarray(conv)
    rec = {"phase": "iters", "batch": args.batch,
           "device": str(jax.devices()[0])}
    for s in range(iters.shape[1]):
        it, cv = iters[:, s], conv[:, s]
        rec[f"step{s}"] = {
            "conv_rate": round(float(cv.mean()), 4),
            "iters_p50": int(np.percentile(it, 50)),
            "iters_p90": int(np.percentile(it, 90)),
            "iters_p99": int(np.percentile(it, 99)),
            "iters_max": int(it.max()),
            # fraction of lane-group x iteration budget an oracle early
            # exit could skip: mean iters / max_iter
            "mean_iters": round(float(it.mean()), 1),
            # histogram over 100-iteration buckets (who is still active
            # at each chunk boundary -> sizes the exit_every chunks)
            "active_at": {
                str(k): int((it > k).sum()) for k in range(0, 700, 100)
            },
        }
    emit(rec)


def phase_hotspots(args):
    """Decompose the two non-QP hot stages (linearize 59 ms, line search
    59 ms at B=1024 per the stage phase) into their constituent ops, so
    the next optimization targets measurement, not guesses."""
    import jax
    import jax.numpy as jnp

    from mpc_motion_planner_tpu.bench.harness import chain_states
    from mpc_motion_planner_tpu.ops.structure import build_structured_A
    from mpc_motion_planner_tpu.utils.profiling import time_fn

    planner = make_planner()
    ocp = planner.ocp
    B = args.batch
    key = jax.random.PRNGKey(0)
    cur, tgt = chain_states(planner, key, B)

    @jax.jit
    def warm(cur, tgt):
        traj = planner.plan_warm_start(cur, tgt)
        return planner.warm_start_vector(traj)

    z0 = jax.block_until_ready(warm(cur, tgt))
    L = planner.sqp_settings.line_search_max_iter
    alphas = jnp.asarray([0.5 ** j for j in range(L)], z0.dtype)
    zL = jnp.reshape(z0[None] * alphas[:, None, None] + 0.0, (L * B, -1))

    hp = jax.default_matmul_precision("highest")

    def J(f):
        def g(*a):
            with hp:
                return f(*a)
        return jax.jit(g)

    # jacrev candidate: 8 reverse passes instead of 21 forward tangents
    # for the (ng=8) x (nx+nu=21) per-node constraint Jacobians
    nx = ocp.nx

    def node_jac_rev(z):
        X, U, _ = ocp.unpack(z)

        def g_of(xu):
            return ocp.node_constraints(xu[:nx], xu[nx:])

        return jax.vmap(jax.jacrev(g_of))(jnp.concatenate([X, U], axis=-1))

    from mpc_motion_planner_tpu.ops.qp_structured import ruiz_structured

    sa0 = build_structured_A(ocp, z0)

    fns = {
        # linearize parts
        "eq_residual": (J(jax.vmap(ocp.eq_residual)), (z0,)),
        "ineq_residual": (J(jax.vmap(ocp.ineq_residual)), (z0,)),
        "node_jacobians": (J(jax.vmap(ocp.node_constraint_jacobians)), (z0,)),
        "node_jacobians_rev": (J(jax.vmap(node_jac_rev)), (z0,)),
        "build_structured_A": (J(lambda z: build_structured_A(ocp, z)), (z0,)),
        # line-search parts: the merit evaluates L=10 candidates -> the
        # same residuals at 10x the batch
        "eq_residual_x10": (J(jax.vmap(ocp.eq_residual)), (zL,)),
        "ineq_residual_x10": (J(jax.vmap(ocp.ineq_residual)), (zL,)),
        # QP-setup parts
        "ruiz_10": (J(lambda: ruiz_structured(ocp, sa0, 10)), ()),
        "ruiz_4": (J(lambda: ruiz_structured(ocp, sa0, 4)), ()),
    }
    rec = {"phase": "hotspots", "batch": B, "device": str(jax.devices()[0])}
    for name, (fn, a) in fns.items():
        rec[name + "_ms"] = round(1e3 * time_fn(fn, *a, repeats=args.repeats)["median_s"], 3)
    emit(rec)


def phase_latency(args):
    import jax
    import numpy as np

    from mpc_motion_planner_tpu.bench.harness import chain_states

    planner = make_planner(exit_every=args.exit_every)
    key = jax.random.PRNGKey(0)
    for B in (1, 8, 64):
        cur, tgt = chain_states(planner, key, B)

        @jax.jit
        def run(cur, tgt):
            sol = planner.solve(cur, tgt)
            return sol.z

        jax.block_until_ready(run(cur, tgt))  # compile
        times = []
        for _ in range(args.repeats_latency):
            t0 = time.perf_counter()
            jax.block_until_ready(run(cur, tgt))
            times.append(time.perf_counter() - t0)
        t = np.asarray(times) * 1e3
        emit({
            "phase": "latency", "batch": B,
            "p50_ms": round(float(np.percentile(t, 50)), 3),
            "p95_ms": round(float(np.percentile(t, 95)), 3),
            "min_ms": round(float(t.min()), 3),
            "repeats": len(times),
            "exit_every": args.exit_every,
            "device": str(jax.devices()[0]),
        })


def phase_b4096(args):
    """Same 4096 chained states solved as one B=4096 dispatch vs four
    B=1024 dispatches: if the 4x-worse median violation of the round-3
    B=4096 row reproduces in the chunked solves, it is a workload
    property (longer chains contain harder pairs), not a batch-size
    regression of the kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpc_motion_planner_tpu.bench.harness import chain_states

    planner = make_planner(exit_every=args.exit_every)
    key = jax.random.PRNGKey(0)
    cur, tgt = chain_states(planner, key, 4096)

    @jax.jit
    def run(cur, tgt):
        sol = planner.solve(cur, tgt)
        return sol.violation, sol.qp_converged

    # four B=1024 dispatches over the same states
    viol_parts, conv_parts = [], []
    for i in range(0, 4096, 1024):
        v, c = jax.block_until_ready(run(cur[i:i + 1024], tgt[i:i + 1024]))
        viol_parts.append(np.asarray(v))
        conv_parts.append(np.asarray(c))
    viol_chunked = np.concatenate(viol_parts)
    conv_chunked = np.concatenate(conv_parts)

    # one B=4096 dispatch (fresh jit for the larger shape)
    v4, c4 = jax.block_until_ready(run(cur, tgt))
    v4, c4 = np.asarray(v4), np.asarray(c4)

    emit({
        "phase": "b4096_control",
        "chunked_1024x4": {
            "median_violation": float(np.median(viol_chunked)),
            "p90_violation": float(np.percentile(viol_chunked, 90)),
            "qp_conv_rate": round(float(conv_chunked.mean()), 4),
        },
        "single_4096": {
            "median_violation": float(np.median(v4)),
            "p90_violation": float(np.percentile(v4, 90)),
            "qp_conv_rate": round(float(c4.mean()), 4),
        },
        # per-quarter medians expose where in the chain the hard pairs sit
        "chunk_medians_1024x4": [
            float(np.median(p)) for p in viol_parts
        ],
        "quarter_medians_4096": [
            float(np.median(v4[i:i + 1024])) for i in range(0, 4096, 1024)
        ],
        "exit_every": args.exit_every,
        "device": str(jax.devices()[0]),
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "phase", choices=["stage", "iters", "hotspots", "latency", "b4096"]
    )
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--repeats-latency", type=int, default=30)
    ap.add_argument("--exit-every", type=int, default=0)
    args = ap.parse_args()
    {
        "stage": phase_stage,
        "iters": phase_iters,
        "hotspots": phase_hotspots,
        "latency": phase_latency,
        "b4096": phase_b4096,
    }[args.phase](args)


if __name__ == "__main__":
    main()
