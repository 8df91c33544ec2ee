import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_motion_planner_tpu.bench.analysis import (
    accuracy_stats,
    decode,
    violation_counts,
)
from mpc_motion_planner_tpu.bench.harness import (
    benchmark_records,
    chain_states,
    sample_benchmark_targets,
    validate_trajectory,
)
from mpc_motion_planner_tpu.ops.qp import QPSettings
from mpc_motion_planner_tpu.ops.sqp import SQPSettings
from mpc_motion_planner_tpu.planner import Margins, MotionPlanner


@pytest.fixture(scope="module")
def planner():
    return MotionPlanner(margins=Margins(0.8, 0.8, 0.6, 0.9, 0.1))


def test_sample_benchmark_targets(planner):
    q, qd = sample_benchmark_targets(planner, jax.random.PRNGKey(0), 16)
    assert q.shape == (16, 7) and qd.shape == (16, 7)
    vmax = planner.margins.velocity * planner.limits.max_velocity
    assert np.all(np.abs(np.asarray(qd)) <= np.asarray(vmax) + 1e-9)
    # task-space speeds respect the cartesian caps after clamping
    task = jax.vmap(planner.forward_velocities)(q, qd)
    lin = np.linalg.norm(np.asarray(task[:, :3]), axis=-1)
    ang = np.linalg.norm(np.asarray(task[:, 3:]), axis=-1)
    assert np.all(lin <= planner.limits.max_linear_velocity + 1e-6)
    assert np.all(ang <= planner.limits.max_angular_velocity + 1e-6)


def test_chain_states(planner):
    cur, tgt = chain_states(planner, jax.random.PRNGKey(1), 10)
    assert cur.shape == (10, 14) and tgt.shape == (10, 14)
    # the chain: start_i = target_{i-1} (benchmark.cpp never resets current)
    np.testing.assert_allclose(np.asarray(cur[1:]), np.asarray(tgt[:-1]), atol=0)
    # first start: mid-range default at rest (motionPlanner.cpp:5-8)
    mid = (planner.limits.max_position + planner.limits.min_position) / 2
    np.testing.assert_allclose(np.asarray(cur[0, :7]), np.asarray(mid), atol=1e-12)
    np.testing.assert_allclose(np.asarray(cur[0, 7:]), 0, atol=0)


def test_validate_trajectory_flags(planner):
    # A resting trajectory passes everything
    B, N = 2, 50
    q = jnp.tile(jnp.asarray([0.0, -0.5, 0.0, -2.0, 0.0, 1.6, 0.0]), (B, N + 1, 1))
    zeros = jnp.zeros((B, N + 1, 7))
    time = jnp.tile(jnp.linspace(0, 1, N + 1)[None], (B, 1))
    checks = validate_trajectory(planner, time, q, zeros, zeros)
    assert np.all(np.asarray(checks.jerk) == 1)
    assert np.all(np.asarray(checks.collision) == 1)
    assert np.all(np.asarray(checks.linear_velocity) == 1)

    # A trajectory whose tool dips below the table trips the collision flag
    # tool height at this configuration is -0.198 m (below the table plane)
    q_low = q.at[0, 10].set(jnp.asarray([0.0, 1.5, 0.0, -1.0, 0.0, 1.5, 0.0]))
    checks2 = validate_trajectory(planner, time, q_low, zeros, zeros)
    assert int(checks2.collision[0]) == 0
    assert int(checks2.collision[1]) == 1


@pytest.fixture(scope="module")
def small_run(planner):
    cur, tgt = chain_states(planner, jax.random.PRNGKey(2), 4)
    sol = planner.solve(cur, tgt)
    rec, checks_rk, checks_mpc = benchmark_records(planner, sol, tgt)
    return cur, tgt, sol, rec, checks_rk, checks_mpc


def test_records_layout(small_run):
    cur, tgt, sol, rec, _, _ = small_run
    assert rec.shape == (4, 162)
    d = decode(np.asarray(rec))
    # target columns round-trip
    np.testing.assert_allclose(d["target"], np.asarray(tgt), atol=0)
    # extrema bracket: min <= max everywhere
    assert np.all(d["min_rk"] <= d["max_rk"] + 1e-12)
    assert np.all(d["min_mpc"] <= d["max_mpc"] + 1e-12)
    # flags are 0/1
    assert set(np.unique(d["flags"])) <= {0.0, 1.0}


def test_analysis_summaries(small_run, planner):
    *_, rec, _, _ = small_run
    counts = violation_counts(np.asarray(rec), planner.limits, planner.margins)
    assert set(counts) == {"ruckig", "mpc"}
    for c in counts.values():
        assert set(c) == {
            "position", "velocity", "acceleration", "torque",
            "jerk", "task_velocity", "collision",
        }
        assert all(0 <= v <= 4 for v in c.values())
    stats = accuracy_stats(np.asarray(rec))
    assert stats["ruckig"]["pos_err_p50"] < 0.3
    assert 0.0 <= stats["mpc"]["within_tolerance"] <= 1.0

    from mpc_motion_planner_tpu.bench.analysis import violation_magnitudes

    mags = violation_magnitudes(np.asarray(rec), planner.limits, planner.margins)
    for p in ("ruckig", "mpc"):
        for cat in ("position", "velocity", "acceleration", "torque"):
            s = mags[p][cat]
            assert 0.0 <= s["p50"] <= s["p99"] <= s["max"]
            assert s["rel_max"] >= 0.0
        # a category with zero violation count must have zero magnitude
        for cat in ("position", "velocity", "acceleration", "torque"):
            if counts[p][cat] == 0:
                assert mags[p][cat]["max"] <= 1e-6


def test_io_roundtrip(tmp_path, small_run):
    from mpc_motion_planner_tpu.utils.io import (
        read_benchmark_records,
        write_benchmark_records,
    )

    *_, rec, _, _ = small_run
    path = tmp_path / "bench.txt"
    write_benchmark_records(path, np.asarray(rec[:2]))
    write_benchmark_records(path, np.asarray(rec[2:]))  # append mode
    back = read_benchmark_records(path)
    np.testing.assert_allclose(back, np.asarray(rec), rtol=1e-6)


def test_optimal_solution_format(tmp_path, planner, small_run):
    from mpc_motion_planner_tpu.utils.io import write_optimal_solution

    cur, tgt, sol, *_ = small_run
    rk = planner.sample_warm_start(sol.warm_start, 200)
    mpc = sol.sample(200)
    unb = lambda tup: tuple(np.asarray(x[0]) for x in tup)
    path = tmp_path / "optimal_solution.txt"
    write_optimal_solution(path, np.asarray(tgt[0]), unb(rk), unb(mpc))
    data = np.loadtxt(path)
    assert data.shape == (1 + 201 + 201, 29)
    np.testing.assert_allclose(data[0, 1:15], np.asarray(tgt[0]), atol=1e-6)
