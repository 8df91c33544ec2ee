"""Smoke test for the profiling subsystem."""

import jax

from mpc_motion_planner_tpu.ops.qp import QPSettings
from mpc_motion_planner_tpu.ops.sqp import SQPSettings
from mpc_motion_planner_tpu.planner import Margins, MotionPlanner
from mpc_motion_planner_tpu.utils.profiling import (
    stage_timings,
    stage_timings_structured,
    time_fn,
)


def test_stage_timings_smoke():
    planner = MotionPlanner(
        margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1),
        sqp_settings=SQPSettings(max_iter=1),
        qp_settings=QPSettings(max_iter=30, check_every=10, rho_update_every=0),
    )
    cur = jax.numpy.tile(
        jax.numpy.concatenate(
            [
                (planner.limits.max_position + planner.limits.min_position) / 2.0,
                jax.numpy.zeros(7, planner.limits.max_position.dtype),
            ]
        )[None],
        (2, 1),
    )
    tgt = cur + 0.1
    out = stage_timings(planner, cur, tgt, repeats=1)
    for stage in ("warm_start", "linearize", "qp", "line_search", "total"):
        assert out[stage]["median_s"] > 0.0
    assert out["batch"] == 2
    assert out["solves_per_s"] > 0.0


def test_stage_timings_structured_smoke():
    """Production-path decomposition runs and accounts for every stage
    (structured XLA backend on CPU; the TPU session swaps in
    structured_pallas on hardware)."""
    planner = MotionPlanner(
        margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1),
        sqp_settings=SQPSettings(max_iter=1),
        qp_settings=QPSettings(
            max_iter=30, check_every=10, rho_update_every=0,
            backend="structured", kkt_refine=0,
        ),
    )
    cur = jax.numpy.tile(
        jax.numpy.concatenate(
            [
                (planner.limits.max_position + planner.limits.min_position) / 2.0,
                jax.numpy.zeros(7, planner.limits.max_position.dtype),
            ]
        )[None],
        (2, 1),
    )
    tgt = cur + 0.1
    out = stage_timings_structured(planner, cur, tgt, repeats=1)
    # factor_kernel is TPU-only by default (off-TPU the solve uses the XLA
    # factorization; interpret-mode timing would measure nothing relevant)
    assert "factor_kernel" not in out
    for stage in (
        "warm_start", "linearize", "ruiz", "assemble_banded", "factor_xla",
        "qp", "line_search", "total",
    ):
        assert out[stage]["median_s"] > 0.0
    assert out["admm_loop_derived_s"] >= 0.0
    assert out["batch"] == 2


def test_time_fn():
    f = jax.jit(lambda x: x * 2.0)
    stats = time_fn(f, jax.numpy.ones(8), repeats=2)
    assert stats["min_s"] <= stats["median_s"] <= stats["max_s"]
