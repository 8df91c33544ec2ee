"""Headline benchmark: aggregate minimum-time MPC solve throughput per chip.

Runs the 1000-trajectory Panda benchmark workload (benchmark.cpp parity:
margins 0.8/0.8/0.6/0.9/0.1, chained start states, jerk-limited warm start,
2 SQP x <=700 ADMM iterations at eps 1e-3) as batched solves on the
available accelerator and reports solves/s.

Prints ONE JSON line:
    {"metric": "solves_per_s", "value": N, "unit": "solves/s",
     "vs_baseline": N, ...}

Baseline: the C++ reference publishes no numbers and cannot be built here
(polyMPC submodule is not vendored; no pinocchio/ruckig on the image).
vs_baseline divides by 50 solves/s — the ESTIMATED single-core C++ figure,
derived step-by-step in BASELINE.md "Measured baseline proxy" and chosen
because it is conservative: the measured same-code serial proxy
(examples/baseline_proxy.py, batch-1 float64 CPU solves of this exact
workload) is 2.5 solves/s, ~20x slower. Override with
BENCH_BASELINE=<solves/s>.
"""

import json
import os
import sys
import time

# See BASELINE.md "Measured baseline proxy" for both figures' provenance.
BASELINE_SOLVES_PER_S = float(os.environ.get("BENCH_BASELINE", "0")) or 50.0


def main():
    # B=2048 is the measured throughput-optimal operating point on the
    # v5e at the shipping config (9137 solves/s vs 8061 at B=1024, r04);
    # quality is batch-size-independent (the b4096 control, KERNELS.md).
    batch = int(os.environ.get("BENCH_BATCH", "2048"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mpc_motion_planner_tpu.bench.harness import chain_states
    from mpc_motion_planner_tpu.ops.qp import QPSettings
    from mpc_motion_planner_tpu.planner import Margins, MotionPlanner

    # "structured_pallas": the fused VMEM-resident kernel over the
    # matrix-free structured operator (the production TPU path; fastest
    # measured: 2184 solves/s at B=1024 on v5e, round 3). "structured":
    # the portable XLA path of the same algorithm (429/s at B=1024).
    # "pallas": the round-1 fused dense kernel. "xla": dense fallback.
    backend = os.environ.get("BENCH_QP_BACKEND", "structured_pallas")
    if jax.default_backend() == "cpu":
        # the fused kernels are TPU-only (interpret mode is far too slow
        # for a benchmark); fall back to the portable same-algorithm path
        if backend == "pallas":
            backend = "xla"
        elif backend == "structured_pallas":
            backend = "structured"
    # Pallas only: VMEM-resident chunks dispatched per solve-chunk.
    chunk = int(os.environ.get("BENCH_CHUNK", "32" if backend == "pallas" else "0"))

    # The structured backends' factored (backward-stable) KKT solves do not
    # need iterative refinement for f32 convergence — measured round 3 on
    # the kernel: refine=0 2629/s conv 0.828 vs refine=1 2185/s conv 0.833
    # at identical violation. The dense backends' explicit inverse DOES
    # need it (qp convergence 30% -> 80% with refine=1).
    refine = int(
        os.environ.get(
            "BENCH_KKT_REFINE",
            "0" if backend in ("structured", "structured_pallas") else "1",
        )
    )
    rho_every = int(os.environ.get("BENCH_RHO_EVERY", "0"))
    max_iter = int(os.environ.get("BENCH_QP_MAX_ITER", "700"))
    check_every = int(os.environ.get("BENCH_CHECK_EVERY", "25"))
    kkt_factor = os.environ.get("BENCH_KKT_FACTOR", "lu")
    # Ruiz equilibration sweeps (QPSettings.ruiz_iters): 2 measured best
    # on BOTH throughput and convergence (r05 bracket, KERNELS.md).
    ruiz_iters = int(os.environ.get("BENCH_RUIZ_ITERS", "2"))
    # Early-exit compaction for the fused structured kernel (see
    # QPSettings.exit_every/exit_warmup/exit_schedule): one late
    # compaction boundary (warmup 300, then a single 400-iteration
    # straggler chunk) measured best on the r04 sweep; uniform chunking
    # (exit_every=100/50 without warmup) measured SLOWER than no early
    # exit. Use multiples of check_every for exact single-dispatch
    # semantics. 0/0 disables. BENCH_EXIT_SCHEDULE (e.g. "150,150,400")
    # overrides both with an explicit chunk schedule.
    exit_every = int(os.environ.get("BENCH_EXIT_EVERY", "400"))
    exit_warmup = int(os.environ.get("BENCH_EXIT_WARMUP", "300"))
    exit_schedule = os.environ.get("BENCH_EXIT_SCHEDULE", "")
    # Straggler rescue: extra ADMM budget for problems unconverged after
    # max_iter (QPSettings.rescue_iters; nearly free on the compacted
    # early-exit path).
    rescue_iters = int(os.environ.get("BENCH_RESCUE_ITERS", "0"))
    # Per-SQP-step ADMM schedules (SQPSettings.qp_step_schedules), e.g.
    # "200,500;150,350" — the dual-warm-started step-1 QP converges
    # faster and can run a shorter warmup + budget. "auto" resolves to
    # the shipping schedule for the resolved backend (config.py);
    # "" disables (shared schedule for both steps).
    sqp_schedules = os.environ.get("BENCH_SQP_SCHEDULES", "auto")
    if sqp_schedules == "auto":
        from mpc_motion_planner_tpu.config import shipping_sqp_schedules

        sqp_schedules = shipping_sqp_schedules(backend)
    # ADMM penalty / over-relaxation knobs for operating-point sweeps.
    rho = float(os.environ.get("BENCH_RHO", "0.1"))
    alpha = float(os.environ.get("BENCH_ALPHA", "1.6"))
    # Fused constraints kernel routing (auto = on on TPU).
    fused_mode = os.environ.get("MPC_TPU_FUSED_CONSTRAINTS", "auto")

    def make_settings(backend):
        return QPSettings(
            backend=backend, kkt_refine=refine, rho_update_every=rho_every,
            max_iter=max_iter, check_every=check_every,
            kkt_factor=kkt_factor, exit_every=exit_every,
            exit_warmup=exit_warmup, exit_schedule=exit_schedule,
            rescue_iters=rescue_iters, ruiz_iters=ruiz_iters,
            rho=rho, alpha=alpha,
        )

    def make_run(backend, fused):
        import dataclasses as _dc

        from mpc_motion_planner_tpu.ops.sqp import SQPSettings

        planner = MotionPlanner(
            margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1),
            qp_settings=make_settings(backend),
            sqp_settings=SQPSettings(qp_step_schedules=sqp_schedules),
        )
        # fused-constraints routing is a STATIC ocp field (part of the jit
        # cache key); the fallback path rebuilds the planner with it off
        planner.ocp = _dc.replace(planner.ocp, fused_constraints=fused)

        @jax.jit
        def run_one(cur, tgt):
            sol = planner.solve(cur, tgt)
            X, _, _ = sol.states()
            # terminal error per the acceptance convention (SURVEY §4:
            # validate by re-simulation, not solver variables): the state
            # INTERPOLATED at t=1 — what a consumer sampling the
            # trajectory actually reaches — not the raw final collocation
            # variable. Both are reported; tol_hit_rate uses the
            # re-simulated one.
            xT = sol.x_at(jnp.ones((), X.dtype))  # (B, nx)
            err_sim = jnp.max(jnp.abs(xT - tgt), axis=-1)
            err_node = jnp.max(jnp.abs(X[:, -1] - tgt), axis=-1)
            return sol.z, sol.violation, err_sim, err_node, sol.qp_converged

        if chunk and backend == "pallas":
            def run(cur, tgt):
                outs = [
                    run_one(cur[i : i + chunk], tgt[i : i + chunk])
                    for i in range(0, cur.shape[0], chunk)
                ]
                return tuple(jnp.concatenate(parts) for parts in zip(*outs))
        else:
            run = run_one
        return planner, run

    planner, run = make_run(backend, fused_mode)
    key = jax.random.PRNGKey(0)
    current, target = chain_states(planner, key, batch)
    current = jax.device_put(current)
    target = jax.device_put(target)

    # compile + warm up; if any backend hits a device fault (axon tunnel
    # flakiness, kernel watchdog), fall back to the portable same-algorithm
    # XLA path rather than failing the benchmark run.
    fallback = {"pallas": "xla", "structured_pallas": "structured",
                "structured": "xla"}
    fused_used = fused_mode
    try:
        out = jax.block_until_ready(run(current, target))
    except Exception as e:  # noqa: BLE001 - jax runtime errors vary by backend
        if backend in fallback:
            nxt = fallback[backend]
            print(f"# {backend} backend failed ({type(e).__name__}); "
                  f"falling back to {nxt}\n# detail: {str(e)[:2000]}",
                  file=sys.stderr)
            # the fused constraints kernel is shared by all structured
            # backends — if the failure was in it, a same-config fallback
            # would hit it again, so the fallback runs with it disabled
            # (recorded in the result JSON as fused_constraints="off")
            backend = nxt
            fused_used = "off"
            planner, run = make_run(backend, fused_used)
            out = jax.block_until_ready(run(current, target))
        else:
            raise

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(current, target))
        times.append(time.perf_counter() - t0)

    z, violation, err_sim, err_node, qp_conv = out
    best = min(times)
    solves_per_s = batch / best
    # Terminal-accuracy accounting, honestly labeled: the solver's hard
    # terminal box is ±target_eps per joint (motionPlanner.hpp:44) but its
    # rows are only guaranteed to the QP's eps_abs primal tolerance, so
    # the threshold actually tested is target_eps + eps_abs — derived from
    # the settings instances actually used, and reported alongside the
    # measured worst per-joint error so the claim is read off the data.
    err_sim = np.asarray(err_sim)
    err_node = np.asarray(err_node)
    tol = planner.target_eps + planner.qp_settings.eps_abs
    ok = err_sim <= tol
    viol = np.asarray(violation)

    result = {
        "metric": "solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "batch": batch,
        "batch_wall_s": round(best, 4),
        # amortized per-solve time (batch wall / batch) — NOT a latency
        # percentile; a single solve's wall time is the full batch_wall_s
        "amortized_ms_per_solve": round(1e3 * best / batch, 4),
        # fraction of solves whose RE-SIMULATED final state (trajectory
        # interpolated at t=1, the acceptance convention) is inside the
        # terminal box + QP tolerance (per-joint, threshold below)
        "tol_hit_rate": round(float(ok.mean()), 4),
        "tol_threshold": tol,
        "terminal_err_inf_max": round(float(err_sim.max()), 6),
        # the raw final collocation variable's error, for comparison with
        # the re-simulated figure (they agree to interpolation rounding)
        "node_terminal_err_max": round(float(err_node.max()), 6),
        # l1 violation over all ~900 constraint rows; p90 included because
        # the median alone hides the heavy tail of the chained workload
        "median_violation": float(np.median(viol)),
        "p90_violation": round(float(np.percentile(viol, 90)), 4),
        # fraction of QP subproblems converged within the iteration budget
        "qp_conv_rate": round(float(np.asarray(qp_conv).mean()), 4),
        "qp_max_iter": max_iter,
        "kkt_refine": refine,
        "exit_every": exit_every,
        "exit_warmup": exit_warmup,
        "exit_schedule": exit_schedule,
        "sqp_schedules": sqp_schedules,
        "rescue_iters": rescue_iters,
        "ruiz_iters": ruiz_iters,
        "rho": rho,
        "alpha": alpha,
        "fused_constraints": fused_used,
        "qp_backend": backend,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
