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
    """Per-category violation counts for both planners — STRICT convention.

    Extremum-based categories (position / velocity / acceleration / torque)
    compare the recorded row min/max against the MARGIN-SCALED limits (the
    boxes the solver was actually asked to respect) with a 1e-6 tolerance;
    flag-based categories (jerk / task velocity / collision) come from the
    re-simulation pass flags. This is deliberately stricter than the
    reference notebook's reporting — for numbers directly comparable to
    what `benchmark_analysis.ipynb` cell 3 prints, use
    :func:`violation_counts_reference`.
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


def violation_counts_reference(records: np.ndarray, limits) -> Dict[str, Dict[str, int]]:
    """Reference-faithful failure counts: EXACTLY the quantities the
    reference notebook's cell 3 computes and prints
    (/root/reference/analysis/benchmark_analysis.ipynb, "Counting MPC
    failures" / "Counting RK failures").

    Reference conventions reproduced verbatim (they differ from
    :func:`violation_counts` on purpose):

    * Extrema are compared against the FULL Franka limits (the notebook's
      hard-coded position_limit / velocity_limit / acceleration_limit /
      torque_limit arrays == the unscaled ``limits`` fields) — no margin
      scaling and no tolerance, even when the benchmark ran with margins.
    * Acceleration and torque merge into one ``torqueAccel`` category.
    * The MPC counts SUM the per-direction counts (a trajectory exceeding
      both the min and the max bound counts twice; torqueAccel can count a
      single trajectory up to 4x), while the Ruckig counts OR them (each
      trajectory counts at most once) — the notebook's asymmetry, kept.
    * ``taskVelocity`` tests only the LINEAR-velocity flag (the notebook
      indexes ``flag[1:2]``, which excludes the angular flag at index 2).

    Keys mirror the notebook's DataFrame columns, plus ``total`` (the
    notebook's ``failure_rk`` / ``failure_mpc`` sums).
    """
    d = decode(records)
    lo_q = np.asarray(limits.min_position)
    hi_q = np.asarray(limits.max_position)
    v_lim = np.asarray(limits.max_velocity)
    a_lim = np.asarray(limits.max_acceleration)
    t_lim = np.asarray(limits.max_torque)

    def count(rows):  # rows: (n,) bool -> int
        return int(np.count_nonzero(rows))

    out: Dict[str, Dict[str, int]] = {}
    f = d["flags"]
    for planner_name, mn, mx, base in (
        ("ruckig", d["min_rk"], d["max_rk"], 0),
        ("mpc", d["min_mpc"], d["max_mpc"], 4),
    ):
        q_hi = np.any(mx[:, 0:7] > hi_q, axis=-1)
        q_lo = np.any(mn[:, 0:7] < lo_q, axis=-1)
        v_hi = np.any(mx[:, 7:14] > v_lim, axis=-1)
        v_lo = np.any(mn[:, 7:14] < -v_lim, axis=-1)
        a_hi = np.any(mx[:, 14:21] > a_lim, axis=-1)
        a_lo = np.any(mn[:, 14:21] < -a_lim, axis=-1)
        t_hi = np.any(mx[:, 21:28] > t_lim, axis=-1)
        t_lo = np.any(mn[:, 21:28] < -t_lim, axis=-1)
        if planner_name == "mpc":  # notebook sums the direction counts
            pos = count(q_hi) + count(q_lo)
            vel = count(v_hi) + count(v_lo)
            ta = count(a_hi) + count(a_lo) + count(t_hi) + count(t_lo)
        else:  # notebook ORs them for Ruckig
            pos = count(q_hi | q_lo)
            vel = count(v_hi | v_lo)
            ta = count(a_hi | a_lo | t_hi | t_lo)
        c = {
            "position_fails": pos,
            "velocity_fails": vel,
            "torqueAccel_fails": ta,
            "Jerk_fails": count(f[:, base + 0] == 0),
            # flag[1:2] == the linear-velocity flag only (notebook quirk)
            "taskVelocity_fails": count(f[:, base + 1] == 0),
            "collision_fails": count(f[:, base + 3] == 0),
        }
        c["total"] = sum(c.values())
        out[planner_name] = c
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
            # a degenerate zero bound (margin or limit 0) must not emit
            # inf/nan into the reported JSON
            rel = np.where(span > 0, over / np.where(span > 0, span, 1.0), 0.0)
            stats[cat] = {
                "p50": float(np.percentile(worst, 50)),
                "p99": float(np.percentile(worst, 99)),
                "max": float(worst.max()),
                "rel_max": float(rel.max()),
            }
        out[planner_name] = stats
    return out


def accuracy_stats(
    records: np.ndarray, target_eps: float = 1e-2, eps_abs: float = 1e-3
) -> Dict[str, Dict[str, float]]:
    """Final-state error statistics (notebook cells 4-5).

    l2-norm percentiles mirror the notebook's error CDF (cell 5). The
    box-hit fractions are labeled for exactly what they test:

    * ``within_target_box``: per-joint max |error| <= target_eps — the
      solver's hard terminal box (motionPlanner.hpp:44, ±1e-2).
    * ``within_box_plus_tol``: <= target_eps + eps_abs — the box the ADMM
      termination criterion actually guarantees (the terminal-state rows
      are satisfied only to the QP's eps_abs primal tolerance), the honest
      "did the solve do what it promises" number.
    * ``err_inf_*``: percentiles of the per-joint max |error| (positions
      and velocities pooled), so the claim thresholds above can be read
      off the distribution directly.
    """
    d = decode(records)
    out = {}
    for name, err in (("ruckig", d["err_rk"]), ("mpc", d["err_mpc"])):
        eq = np.linalg.norm(err[:, :7], axis=-1)
        ev = np.linalg.norm(err[:, 7:], axis=-1)
        einf = np.abs(err).max(-1)  # (n,) per-joint max over q and qdot
        out[name] = {
            "pos_err_p50": float(np.percentile(eq, 50)),
            "pos_err_p95": float(np.percentile(eq, 95)),
            "pos_err_max": float(eq.max()),
            "vel_err_p50": float(np.percentile(ev, 50)),
            "vel_err_p95": float(np.percentile(ev, 95)),
            "vel_err_max": float(ev.max()),
            "err_inf_p50": float(np.percentile(einf, 50)),
            "err_inf_p95": float(np.percentile(einf, 95)),
            "err_inf_max": float(einf.max()),
            "within_target_box": float(np.mean(einf <= target_eps)),
            "within_box_plus_tol": float(np.mean(einf <= target_eps + eps_abs)),
        }
    return out
