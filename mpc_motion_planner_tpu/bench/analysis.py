"""Benchmark analysis: violation counting and accuracy statistics.

Python-native reproduction of the reference's plotly notebooks
(/root/reference/analysis/benchmark_analysis.ipynb): decodes the 162-column
benchmark rows (cell 1 layout), counts per-category limit violations for
both planners (cell 3) and summarizes final-state error distributions
(cells 4-5) — returning plain dicts/arrays instead of plots so the results
are scriptable and testable.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# 162-column record layout (benchmark.cpp:163-194)
_N = 28  # non-time rows per trajectory matrix: q(7) qd(7) qdd(7) tau(7)
MIN_RK = slice(0, _N)
MAX_RK = slice(_N, 2 * _N)
MIN_MPC = slice(2 * _N, 3 * _N)
MAX_MPC = slice(3 * _N, 4 * _N)
ERR_RK = slice(112, 126)
ERR_MPC = slice(126, 140)
FLAGS = slice(140, 148)  # jerk/lin/ang/collision x (rk, mpc)
TARGET = slice(148, 162)


def decode(records: np.ndarray) -> Dict[str, np.ndarray]:
    records = np.asarray(records)
    assert records.shape[-1] == 162, records.shape
    return {
        "min_rk": records[:, MIN_RK],
        "max_rk": records[:, MAX_RK],
        "min_mpc": records[:, MIN_MPC],
        "max_mpc": records[:, MAX_MPC],
        "err_rk": records[:, ERR_RK],
        "err_mpc": records[:, ERR_MPC],
        "flags": records[:, FLAGS],
        "target": records[:, TARGET],
    }


def violation_counts(records: np.ndarray, limits, margins) -> Dict[str, Dict[str, int]]:
    """Per-category violation counts for both planners (notebook cell 3).

    Extremum-based categories (position / velocity / acceleration / torque)
    compare the recorded row min/max against the margin-scaled limits;
    flag-based categories (jerk / task velocity / collision) come from the
    re-simulation pass flags.
    """
    d = decode(records)
    lo_q = np.asarray(limits.min_position)
    hi_q = np.asarray(limits.max_position)
    safety = (1.0 - margins.position) * (hi_q - lo_q) / 2.0
    box = {
        "position": (lo_q + safety, hi_q - safety, slice(0, 7)),
        "velocity": (
            -margins.velocity * np.asarray(limits.max_velocity),
            margins.velocity * np.asarray(limits.max_velocity),
            slice(7, 14),
        ),
        "acceleration": (
            -margins.acceleration * np.asarray(limits.max_acceleration),
            margins.acceleration * np.asarray(limits.max_acceleration),
            slice(14, 21),
        ),
        "torque": (
            -margins.torque * np.asarray(limits.max_torque),
            margins.torque * np.asarray(limits.max_torque),
            slice(21, 28),
        ),
    }
    out: Dict[str, Dict[str, int]] = {}
    tol = 1e-6
    for planner_name, mn, mx in (
        ("ruckig", d["min_rk"], d["max_rk"]),
        ("mpc", d["min_mpc"], d["max_mpc"]),
    ):
        counts = {}
        for cat, (lo, hi, cols) in box.items():
            bad = np.any(
                (mn[:, cols] < lo - tol) | (mx[:, cols] > hi + tol), axis=-1
            )
            counts[cat] = int(bad.sum())
        base = 0 if planner_name == "ruckig" else 4
        f = d["flags"]
        counts["jerk"] = int((f[:, base + 0] == 0).sum())
        counts["task_velocity"] = int(
            ((f[:, base + 1] == 0) | (f[:, base + 2] == 0)).sum()
        )
        counts["collision"] = int((f[:, base + 3] == 0).sum())
        out[planner_name] = counts
    return out


def violation_magnitudes(records, limits, margins) -> Dict[str, Dict[str, Dict[str, float]]]:
    """Worst-case violation magnitudes per extremum category (the
    counts in :func:`violation_counts` say how OFTEN a box is exceeded;
    this says by HOW MUCH). For each trajectory, the largest overshoot of
    the margin-scaled box across joints; reported as p50/p99/max over the
    batch, plus the max relative to the per-joint limit. Complements the
    notebook's binary counts with the worst-case tracking the
    infeasible-warm-start failure mode needs (the overshoots bound the
    damage the l1 elastic rows allow)."""
    d = decode(records)
    lo_q = np.asarray(limits.min_position)
    hi_q = np.asarray(limits.max_position)
    safety = (1.0 - margins.position) * (hi_q - lo_q) / 2.0
    box = {
        "position": (lo_q + safety, hi_q - safety, slice(0, 7)),
        "velocity": (
            -margins.velocity * np.asarray(limits.max_velocity),
            margins.velocity * np.asarray(limits.max_velocity),
            slice(7, 14),
        ),
        "acceleration": (
            -margins.acceleration * np.asarray(limits.max_acceleration),
            margins.acceleration * np.asarray(limits.max_acceleration),
            slice(14, 21),
        ),
        "torque": (
            -margins.torque * np.asarray(limits.max_torque),
            margins.torque * np.asarray(limits.max_torque),
            slice(21, 28),
        ),
    }
    out: Dict[str, Dict[str, Dict[str, float]]] = {}
    for planner_name, mn, mx in (
        ("ruckig", d["min_rk"], d["max_rk"]),
        ("mpc", d["min_mpc"], d["max_mpc"]),
    ):
        stats = {}
        for cat, (lo, hi, cols) in box.items():
            over = np.maximum(mx[:, cols] - hi, 0.0) + np.maximum(
                lo - mn[:, cols], 0.0
            )
            worst = over.max(axis=1)  # (n,) per-trajectory worst joint
            span = np.maximum(np.abs(hi), np.abs(lo))
            stats[cat] = {
                "p50": float(np.percentile(worst, 50)),
                "p99": float(np.percentile(worst, 99)),
                "max": float(worst.max()),
                "rel_max": float((over / span).max()),
            }
        out[planner_name] = stats
    return out


def accuracy_stats(records: np.ndarray) -> Dict[str, Dict[str, float]]:
    """Final-state error statistics (notebook cells 4-5)."""
    d = decode(records)
    out = {}
    for name, err in (("ruckig", d["err_rk"]), ("mpc", d["err_mpc"])):
        eq = np.linalg.norm(err[:, :7], axis=-1)
        ev = np.linalg.norm(err[:, 7:], axis=-1)
        out[name] = {
            "pos_err_p50": float(np.percentile(eq, 50)),
            "pos_err_p95": float(np.percentile(eq, 95)),
            "pos_err_max": float(eq.max()),
            "vel_err_p50": float(np.percentile(ev, 50)),
            "vel_err_p95": float(np.percentile(ev, 95)),
            "vel_err_max": float(ev.max()),
            # fraction inside the reference's per-joint 1e-2 terminal box
            # scale (a generous infinity-norm check)
            "within_tolerance": float(
                np.mean(
                    (np.abs(err[:, :7]).max(-1) < 2e-2)
                    & (np.abs(err[:, 7:]).max(-1) < 2e-2)
                )
            ),
        }
    return out
