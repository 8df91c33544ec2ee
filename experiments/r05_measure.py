#!/usr/bin/env python
"""Round-5 TPU measurement driver (VERDICT r04 asks #1-#5, #7).

Phases (run one per process so a device fault doesn't lose the batch;
results append to experiments/r05_results.jsonl):

    python experiments/r05_measure.py iterbench  # ADMM ms/iteration slope
    python experiments/r05_measure.py stage      # fresh stage breakdown
    python experiments/r05_measure.py hot        # hot-restart chain study
    python experiments/r05_measure.py taup       # d tau/d p column A/B
    python experiments/r05_measure.py iters      # QP iteration distribution

Throughput sweeps (exit_schedule / rescue_iters / ruiz_iters) run through
bench.py directly (see experiments/r05_run_tpu.sh).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r05_results.jsonl")


def emit(rec):
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def make_planner(sqp_schedules=None, **qp_kw):
    from mpc_motion_planner_tpu.ops.qp import QPSettings
    from mpc_motion_planner_tpu.ops.sqp import SQPSettings
    from mpc_motion_planner_tpu.planner import Margins, MotionPlanner

    kw = dict(
        backend="structured_pallas", kkt_refine=0, rho_update_every=0,
        max_iter=700,
    )
    kw.update(qp_kw)
    planner_kw = {}
    if sqp_schedules is not None:
        planner_kw["sqp_settings"] = SQPSettings(
            qp_step_schedules=sqp_schedules
        )
    return MotionPlanner(
        margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1),
        qp_settings=QPSettings(**kw),
        **planner_kw,
    )


def phase_iterbench(args):
    """ADMM per-iteration device cost: slope of solve time vs max_iter with
    convergence disabled (eps ~ 0, exit/compaction off) — every problem
    runs the full budget, so (t(600) - t(300)) / (2 QPs x 300 iters) is
    the fused kernel's per-iteration cost, free of every per-solve
    constant (tunnel floor, linearize, factorization, line search).
    Feeds the roofline note (KERNELS.md)."""
    import jax
    import numpy as np

    from mpc_motion_planner_tpu.bench.harness import chain_states

    B = args.batch
    key = jax.random.PRNGKey(0)
    times = {}
    for mi in (300, 600):
        planner = make_planner(
            max_iter=mi, exit_every=0, exit_warmup=0,
            eps_abs=1e-12, eps_rel=0.0,
        )
        cur, tgt = chain_states(planner, key, B)

        @jax.jit
        def run(cur, tgt):
            sol = planner.solve(cur, tgt)
            return sol.z

        jax.block_until_ready(run(cur, tgt))
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(run(cur, tgt))
            ts.append(time.perf_counter() - t0)
        times[mi] = float(np.median(ts))
    # 2 SQP iterations x 300 extra ADMM iterations each
    per_iter_us = 1e6 * (times[600] - times[300]) / (2 * 300)
    emit({
        "phase": "iterbench", "batch": B,
        "t300_ms": round(1e3 * times[300], 2),
        "t600_ms": round(1e3 * times[600], 2),
        "admm_us_per_iter_per_dispatch": round(per_iter_us, 2),
        # per-iteration cost is per GRID PROGRAM sequential; B/128 programs
        "us_per_iter_per_program": round(per_iter_us / max(B // 128, 1), 3),
        "device": str(jax.devices()[0]),
    })


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
    import numpy as np

    from mpc_motion_planner_tpu.bench.harness import chain_states

    planner = make_planner(rescue_iters=args.rescue_iters)
    key = jax.random.PRNGKey(0)
    cur, tgt = chain_states(planner, key, args.batch)

    @jax.jit
    def run(cur, tgt):
        sol = planner.solve(cur, tgt)
        return sol.qp_iterations, sol.qp_converged

    iters, conv = jax.block_until_ready(run(cur, tgt))
    iters = np.asarray(iters)
    conv = np.asarray(conv)
    rec = {"phase": "iters", "batch": args.batch,
           "rescue_iters": args.rescue_iters,
           "device": str(jax.devices()[0])}
    for s in range(iters.shape[1]):
        it, cv = iters[:, s], conv[:, s]
        rec[f"step{s}"] = {
            "conv_rate": round(float(cv.mean()), 4),
            "iters_p50": int(np.percentile(it, 50)),
            "iters_p99": int(np.percentile(it, 99)),
            "iters_max": int(it.max()),
            "unconverged": int((~cv).sum()),
        }
    emit(rec)


def phase_hot(args):
    """Hot-restart solves end-to-end (VERDICT r04 #3), two exercises on
    K-problem batches, M steps each, hot vs fresh arms on identical
    initial states:

    * "receding": the reseed's actual use case (motionPlanner.cpp:
      199-207) — the TARGET stays fixed and the start advances 10% of the
      remaining horizon along each arm's own previous solution. Hot seeds
      solve j>0 from solution j-1 (reseed_guess + carried duals) and
      skips OTG planning (solve_trajectory(false)); fresh re-plans an OTG
      warm start each step.
    * "newtarget": the benchmark chain shape (new random target each
      step) seeded hot vs fresh — measures whether re-seeding across a
      CHANGED target beats an OTG re-plan (CPU pilot says it does NOT:
      the old trajectory has the wrong shape for the new segment).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpc_motion_planner_tpu.bench.harness import sample_benchmark_targets

    K, M = args.chains, args.steps
    planner = make_planner()
    nq = planner.ocp.nq
    nx = planner.ocp.nx
    n0 = (planner.ocp.num_nodes - 1) * nx
    key = jax.random.PRNGKey(args.seed)
    q_t, qd_t = sample_benchmark_targets(planner, key, K * (M + 1))
    states = jnp.concatenate([q_t, qd_t], -1).reshape(M + 1, K, 2 * nq)

    def measure(sol, tgt):
        X, _, _ = sol.states()
        xT = sol.x_at(jnp.ones((), X.dtype))
        err = jnp.max(jnp.abs(xT - tgt), axis=-1)
        return sol.z, sol.lam_c, sol.lam_x, sol.violation, \
            sol.qp_iterations, sol.qp_converged, err, sol.final_time

    @jax.jit
    def solve_fresh(cur, tgt):
        return measure(planner.solve(cur, tgt), tgt)

    @jax.jit
    def solve_hot(cur, tgt, z_prev, lam_c, lam_x):
        z0 = z_prev.at[..., :nx].set(cur)
        z0 = z0.at[..., n0 : n0 + nx].set(tgt)
        return measure(
            planner.solve(cur, tgt, z0=z0, lam_c0=lam_c, lam_x0=lam_x), tgt
        )

    @jax.jit
    def advance(z, frac):
        """Start state at `frac` of the normalized horizon of solution z."""
        from mpc_motion_planner_tpu.ops.collocation import interpolate

        X = z[:, : planner.ocp.num_nodes * nx].reshape(-1, planner.ocp.num_nodes, nx)
        return jax.vmap(
            lambda Xb: interpolate(planner.ocp.coll, Xb, frac)
        )(X)

    def record_step(j, dt, out):
        _, _, _, viol, qp_it, qp_cv, err, tf = out
        qp_it = np.asarray(qp_it)
        return {
            "step": j,
            "wall_ms": round(1e3 * dt, 1),
            "qp_iters_mean": [round(float(qp_it[:, s].mean()), 1)
                              for s in range(qp_it.shape[1])],
            "conv": round(float(np.asarray(qp_cv).mean()), 4),
            "viol_p50": round(float(np.median(np.asarray(viol))), 4),
            "viol_p90": round(float(np.percentile(np.asarray(viol), 90)), 3),
            "err_max": round(float(np.asarray(err).max()), 6),
            "tol_hit": round(float((np.asarray(err) <= 1.1e-2).mean()), 4),
            "tf_p50": round(float(np.median(np.asarray(tf))), 3),
        }

    frac = jnp.asarray(0.1, states.dtype)

    for exercise in ("receding", "newtarget"):
        for arm in ("fresh", "hot"):
            cur, tgt = states[0], states[1]
            # compile both paths outside the timed loop
            out = jax.block_until_ready(solve_fresh(cur, tgt))
            if arm == "hot":
                jax.block_until_ready(solve_hot(cur, tgt, *out[:3]))
            steps = []
            t0 = time.perf_counter()
            out = jax.block_until_ready(solve_fresh(cur, tgt))
            steps.append(record_step(0, time.perf_counter() - t0, out))
            z, lam_c, lam_x = out[:3]
            for j in range(1, M):
                if exercise == "receding":
                    cur = jax.block_until_ready(advance(z, frac))
                else:
                    cur, tgt = tgt, states[j + 1]
                t0 = time.perf_counter()
                if arm == "hot":
                    out = jax.block_until_ready(
                        solve_hot(cur, tgt, z, lam_c, lam_x)
                    )
                else:
                    out = jax.block_until_ready(solve_fresh(cur, tgt))
                steps.append(record_step(j, time.perf_counter() - t0, out))
                z, lam_c, lam_x = out[:3]
            emit({
                "phase": "hot", "exercise": exercise, "arm": arm,
                "chains": K, "steps": M,
                "steady_wall_ms_mean": round(
                    float(np.mean([s["wall_ms"] for s in steps[1:]])), 1
                ),
                "per_step": steps,
                "device": str(jax.devices()[0]),
            })


def phase_taup(args):
    """A/B of the reference's nonzero d tau/d p Jacobian column
    (robot_ocp.hpp:124,138) vs the mathematically correct zero, on the
    chained workload with the DENSE 'xla' backend (the structured
    operators hard-code the zero column). Same states, same solver config;
    reports step acceptance, violation, terminal error and iterate
    distance between the two arms."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpc_motion_planner_tpu.bench.harness import chain_states

    B = args.batch
    results = {}
    planner = make_planner(backend="xla", kkt_refine=1)
    key = jax.random.PRNGKey(0)
    cur, tgt = chain_states(planner, key, B)
    for flag in (False, True):
        planner.ocp = dataclasses.replace(planner.ocp, tau_p_column=flag)

        @jax.jit
        def run(cur, tgt):
            sol = planner.solve(cur, tgt)
            X, _, _ = sol.states()
            xT = sol.x_at(jnp.ones((), X.dtype))
            err = jnp.max(jnp.abs(xT - tgt), axis=-1)
            return sol.z, sol.violation, sol.qp_converged, \
                sol.step_sizes, err

        z, viol, conv, alphas, err = jax.block_until_ready(run(cur, tgt))
        results[flag] = dict(
            z=np.asarray(z), viol=np.asarray(viol), conv=np.asarray(conv),
            alphas=np.asarray(alphas), err=np.asarray(err),
        )
    a, b = results[False], results[True]
    emit({
        "phase": "taup", "batch": B, "backend": "xla",
        "zero_col": {
            "viol_p50": round(float(np.median(a["viol"])), 4),
            "viol_p90": round(float(np.percentile(a["viol"], 90)), 3),
            "conv": round(float(a["conv"].mean()), 4),
            "err_max": round(float(a["err"].max()), 6),
            "alpha_mean": [round(float(a["alphas"][:, s].mean()), 3)
                           for s in range(a["alphas"].shape[1])],
        },
        "ref_col": {
            "viol_p50": round(float(np.median(b["viol"])), 4),
            "viol_p90": round(float(np.percentile(b["viol"], 90)), 3),
            "conv": round(float(b["conv"].mean()), 4),
            "err_max": round(float(b["err"].max()), 6),
            "alpha_mean": [round(float(b["alphas"][:, s].mean()), 3)
                           for s in range(b["alphas"].shape[1])],
        },
        "z_dist_p50": round(float(np.median(
            np.max(np.abs(a["z"] - b["z"]), axis=-1))), 5),
        "z_dist_max": round(float(np.max(np.abs(a["z"] - b["z"]))), 5),
        "device": str(jax.devices()[0]),
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "phase", choices=["iterbench", "stage", "hot", "taup", "iters"]
    )
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--exit-every", type=int, default=0)
    ap.add_argument("--rescue-iters", type=int, default=0)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    {
        "iterbench": phase_iterbench,
        "stage": phase_stage,
        "hot": phase_hot,
        "taup": phase_taup,
        "iters": phase_iters,
    }[args.phase](args)


if __name__ == "__main__":
    main()
