#!/bin/bash
# Round-4 TPU session, part 2: remaining phases in priority order, with a
# PATIENT probe loop (the tunnel outage on 2026-08-21 lasted >30 min).
cd "$(dirname "$0")/.." || exit 1

probe() {
    # up to ~2h of waiting: 60 attempts x (<=120 s hang + 10 s)
    for i in $(seq 1 60); do
        if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(jnp.sum(x @ x)) == 128.0 * 128 * 128
print('probe ok:', jax.devices()[0])
" 2>/dev/null; then
            return 0
        fi
        echo "probe failed (attempt $i), retrying in 10s..."
        sleep 10
    done
    echo "TPU unreachable after 60 probes" >&2
    return 1
}

bench_ee() {
    ee=$1
    echo "=== bench exit_every=$ee ==="
    out=$(BENCH_EXIT_EVERY=$ee timeout 2400 python bench.py \
          2>>experiments/r04_sweep_stderr.log | tail -1)
    echo "$out"
    if [ -n "$out" ]; then
        echo "$out" >> experiments/r04_results.jsonl
    else
        echo "!!! bench exit_every=$ee produced no output" \
            | tee -a experiments/r04_failures.log
    fi
    probe || exit 1
}

run() {
    echo "=== $* ==="
    timeout 2400 "$@"
    rc=$?
    [ $rc -ne 0 ] && echo "!!! exited rc=$rc: $*" | tee -a experiments/r04_failures.log
    probe || exit 1
}

probe || exit 1
bench_ee 100
bench_ee 0
bench_ee 50
bench_ee 175
run python experiments/r04_measure.py hotspots
run python experiments/r04_measure.py latency --exit-every 100
echo "=== acceptance run (1000 trajectories) ==="
timeout 3600 python examples/benchmark.py --n 1000 --batch 250 \
    --qp-backend structured_pallas --exit-every 100 \
    --out analysis/benchmark_data_r04.txt \
    2>&1 | tee experiments/r04_acceptance.log | tail -5
probe || exit 1
run python experiments/r04_measure.py b4096 --exit-every 100
echo "done."
