#!/bin/bash
# Round-4 final config validation: fused constraints kernel x early-exit
# warmup schedule, each against the headline bench. Serialized, probed.
cd "$(dirname "$0")/.." || exit 1

probe() {
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
    return 1
}

cfg() {
    label=$1; shift
    echo "=== $label ==="
    out=$(env "$@" timeout 2400 python bench.py \
          2>>experiments/r04_final_stderr.log | tail -1)
    echo "$out"
    if [ -n "$out" ]; then
        echo "$out" >> experiments/r04_results.jsonl
    else
        echo "!!! $label produced no output" | tee -a experiments/r04_failures.log
    fi
    probe || exit 1
}

probe || exit 1
# A: fused constraints + warmup early exit (the full candidate config)
cfg fused+warmup MPC_TPU_FUSED_CONSTRAINTS=on BENCH_EXIT_WARMUP=300 BENCH_EXIT_EVERY=400
# B: fused constraints only
cfg fused-only MPC_TPU_FUSED_CONSTRAINTS=on BENCH_EXIT_WARMUP=0 BENCH_EXIT_EVERY=0
# C: warmup early exit only
cfg warmup-only MPC_TPU_FUSED_CONSTRAINTS=off BENCH_EXIT_WARMUP=300 BENCH_EXIT_EVERY=400
echo "done."
