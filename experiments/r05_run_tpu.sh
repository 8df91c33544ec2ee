#!/bin/bash
# Round-5 TPU measurement sequence (VERDICT r04 asks). TPU jobs are
# SERIALIZED (single exclusive device behind the axon tunnel); each
# bench.py invocation appends its JSON line, tagged, to
# experiments/r05_results.jsonl via the `run` helper.
#
# Usage: bash experiments/r05_run_tpu.sh <phase>
# Phases: sweeps | rescue | ruiz | measure | all
set -u
cd "$(dirname "$0")/.."
OUT=experiments/r05_results.jsonl

run() {  # run <tag> [ENV=...]... -- appends tagged bench line
  local tag="$1"; shift
  echo ">>> bench $tag: $*" >&2
  local line
  line=$(env "$@" timeout 900 python bench.py 2>>experiments/r05_sweep_stderr.log | tail -1)
  if [ -n "$line" ]; then
    python - "$tag" "$line" <<'EOF' >> "$OUT"
import json, sys, time
rec = json.loads(sys.argv[2]); rec["tag"] = sys.argv[1]
rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
print(json.dumps(rec))
EOF
    echo "$line" >&2
  else
    echo "!!! bench $tag produced no output" >&2
  fi
}

phase="${1:-all}"

if [ "$phase" = sweeps ] || [ "$phase" = all ]; then
  # headline + schedule sweep (VERDICT #1a): the [150,150,400] candidate
  # vs the r04 [300,400] default, plus the legacy-sweep kernel control
  run b2048_diag BENCH_BATCH=2048
  run b1024_legacy BENCH_BATCH=1024 MPC_TPU_ADMM_SWEEP=legacy
  run b2048_sched_150_150_400 BENCH_BATCH=2048 BENCH_EXIT_SCHEDULE=150,150,400
  run b2048_sched_200_200_300 BENCH_BATCH=2048 BENCH_EXIT_SCHEDULE=200,200,300
  run b2048_sched_150_550 BENCH_BATCH=2048 BENCH_EXIT_SCHEDULE=150,550
fi

if [ "$phase" = rescue ] || [ "$phase" = all ]; then
  # straggler rescue (VERDICT #2): extra compacted budget for the
  # unconverged tail at the best schedule
  run b2048_rescue700 BENCH_BATCH=2048 BENCH_RESCUE_ITERS=700
  run b2048_rescue1400 BENCH_BATCH=2048 BENCH_RESCUE_ITERS=1400
fi

if [ "$phase" = ruiz ] || [ "$phase" = all ]; then
  # VERDICT #4: Ruiz sweep-count trade-off
  run b2048_ruiz4 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=4
fi

if [ "$phase" = measure ] || [ "$phase" = all ]; then
  timeout 1800 python experiments/r05_measure.py iterbench --batch 1024
  timeout 1800 python experiments/r05_measure.py stage --batch 1024
  timeout 1800 python experiments/r05_measure.py iters --batch 2048 --rescue-iters 700
  timeout 2400 python experiments/r05_measure.py hot --chains 256 --steps 6
  timeout 1800 python experiments/r05_measure.py taup --batch 128
fi

if [ "$phase" = ruiz2 ]; then
  # follow-up after ruiz4 won (9670 solves/s, conv 0.9983 vs 9336/0.9939
  # at ruiz10): bracket the sweep count and combine with folded rescue
  run b2048_ruiz2 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=2
  run b2048_ruiz6 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=6
  run b2048_ruiz4_rescue700 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=4 BENCH_RESCUE_ITERS=700
  run b2048_ruiz4_rescue400 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=4 BENCH_RESCUE_ITERS=400
fi

if [ "$phase" = tune ]; then
  # static rho / over-relaxation sweep at the ruiz4 operating point — the
  # iteration count (p50 175/150) is the cost driver; a better fixed rho
  # or alpha shrinks it directly (adaptive rho measured counterproductive
  # r3, but a STATIC sweep was never run).
  run b2048_ruiz4_rho005 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=4 BENCH_RHO=0.05
  run b2048_ruiz4_rho02 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=4 BENCH_RHO=0.2
  run b2048_ruiz4_rho04 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=4 BENCH_RHO=0.4
  run b2048_ruiz4_alpha17 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=4 BENCH_ALPHA=1.7
  run b2048_ruiz4_alpha18 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=4 BENCH_ALPHA=1.8
fi

if [ "$phase" = ruiz0 ]; then
  # ruiz2 beat ruiz4 (9798/0.9990 vs 9670/0.9983): bracket to the floor.
  # ruiz0 = unscaled, the reference's own configuration
  # (motionPlanner.cpp:21 has scaling commented out).
  run b2048_ruiz1 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=1
  run b2048_ruiz0 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=0
  run b2048_ruiz2_rescue700 BENCH_BATCH=2048 BENCH_RUIZ_ITERS=2 BENCH_RESCUE_ITERS=700
fi

if [ "$phase" = steps ]; then
  # Per-SQP-step ADMM schedules (SQPSettings.qp_step_schedules): the
  # dual-warm-started step-1 QP converges faster (iters p50 125 vs 175,
  # p99 500 vs 638 at ruiz2) — shorten its warmup chunk + budget. Fresh
  # same-day control first; check_every=50 probes the residual-check
  # cost at the shipped schedule.
  run b2048_control BENCH_BATCH=2048
  run b2048_steps_200_300 BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="300,400;200,300"
  run b2048_steps_200_200 BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="300,400;200,200"
  run b2048_steps_250_450_200_300 BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="250,450;200,300"
  run b2048_check50 BENCH_BATCH=2048 BENCH_CHECK_EVERY=50
fi

if [ "$phase" = steps2 ]; then
  # refinement around the steps winner "250,450;200,300" (10750 solves/s
  # vs control 9798): push both warmup cuts deeper, fold rescue to
  # recover the conv dip (0.9990 -> 0.9978), re-measure the winner, and
  # take a clean control (the first control of the `steps` phase
  # collided with a stray same-device compile and recorded a bogus
  # 0.2 ms wall).
  run b2048_control2 BENCH_BATCH=2048
  run b2048_steps_250_450_150_350 BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="250,450;150,350"
  run b2048_steps_200_500_150_350 BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="200,500;150,350"
  run b2048_steps_winner_rescue200 BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="250,450;200,300" BENCH_RESCUE_ITERS=200
  run b2048_steps_winner_repeat BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="250,450;200,300"
fi

if [ "$phase" = steps3 ]; then
  # bracket the step-0 warmup to the floor around the steps2 winner
  # "200,500;150,350" (11169 solves/s, conv 0.9978): the old
  # one-schedule-for-both-steps [150,550] loss (8634 at ruiz10) does not
  # bind at ruiz2 + per-step budgets. Also fold rescue on the winner.
  run b2048_steps_150_550_150_350 BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="150,550;150,350"
  run b2048_steps_200_500_100_400 BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="200,500;100,400"
  run b2048_steps3_winner_rescue200 BENCH_BATCH=2048 BENCH_SQP_SCHEDULES="200,500;150,350" BENCH_RESCUE_ITERS=200
  run b4096_steps3_winner BENCH_BATCH=4096 BENCH_SQP_SCHEDULES="200,500;150,350"
fi

if [ "$phase" = bdep ]; then
  # batch-dependence of the per-step schedules: at B=250 (acceptance
  # protocol) the compacted batch is only ~2 programs, so warmup-cut
  # savings shrink while the extra boundary re-layout stays — measure
  # the crossover to set the shipping auto-resolution threshold.
  run b256_steps_winner BENCH_BATCH=256 BENCH_SQP_SCHEDULES="200,500;150,350"
  run b256_shared BENCH_BATCH=256 BENCH_SQP_SCHEDULES=""
  run b1024_steps_winner BENCH_BATCH=1024 BENCH_SQP_SCHEDULES="200,500;150,350"
  run b1024_shared BENCH_BATCH=1024 BENCH_SQP_SCHEDULES=""
fi

if [ "$phase" = rho2 ]; then
  # final rho bracket at the shipping schedule (the r05 rho sweep ran at
  # ruiz4 + shared schedule): if neither side wins, the operating point
  # is tuned.
  run b2048_winner_rho008 BENCH_BATCH=2048 BENCH_RHO=0.08
  run b2048_winner_rho012 BENCH_BATCH=2048 BENCH_RHO=0.12
fi
