#!/bin/bash
# Round-4 TPU measurement session. SERIALIZES all TPU jobs (single
# exclusive device behind a flaky tunnel); probes the device with a tiny
# matmul between jobs and retries for ~2 min after a fault (CLAUDE.md).
#
# Usage: bash experiments/r04_run_tpu.sh [phases...]
#   default phases: iters stage sweep latency b4096
cd "$(dirname "$0")/.." || exit 1
PHASES=("$@")
[ ${#PHASES[@]} -eq 0 ] && PHASES=(iters stage sweep latency b4096)

probe() {
    for i in $(seq 1 12); do
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
    echo "TPU unreachable after 12 probes" >&2
    return 1
}

run() {
    echo "=== $* ==="
    timeout 1800 "$@"
    rc=$?
    [ $rc -ne 0 ] && echo "!!! exited rc=$rc: $*" | tee -a experiments/r04_failures.log
    probe || exit 1
}

probe || exit 1
for ph in "${PHASES[@]}"; do
    case "$ph" in
        sweep)
            # early-exit cadence sweep through the headline bench
            for ee in 0 50 100 175 350; do
                echo "=== bench exit_every=$ee ==="
                out=$(BENCH_EXIT_EVERY=$ee timeout 1800 python bench.py \
                      2>>experiments/r04_sweep_stderr.log | tail -1)
                echo "$out"
                if [ -n "$out" ]; then
                    echo "$out" >> experiments/r04_results.jsonl
                else
                    echo "!!! bench exit_every=$ee produced no output" \
                        | tee -a experiments/r04_failures.log
                fi
                probe || exit 1
            done
            ;;
        latency)
            run python experiments/r04_measure.py latency --exit-every 100
            ;;
        b4096)
            run python experiments/r04_measure.py b4096 --exit-every 100
            ;;
        *)
            run python experiments/r04_measure.py "$ph"
            ;;
    esac
done
echo "done."
