"""Text log writers matching the reference's output formats, so the
reference's analysis notebooks can consume our results unchanged.

* ``write_optimal_solution``: the 29-column trajectory dump of
  /root/reference/examples/offline_trajectory.cpp:62-106 — one target line,
  then N+1 rows for the warm-start trajectory and N+1 rows for the MPC
  trajectory (columns: time, q x7, qd x7, qdd x7, tau x7).
* ``write_benchmark_records``: append-mode 162-column rows of
  /root/reference/examples/benchmark.cpp:163-194.
"""

from __future__ import annotations

import os

import numpy as np


def _traj_matrix(time, q, qd, qdd, tau) -> np.ndarray:
    """(N+1, 29) block: [time, q, qd, qdd, tau]."""
    return np.concatenate(
        [np.asarray(time)[:, None], q, qd, qdd, tau], axis=-1
    )


def write_optimal_solution(path, target_state, rk_traj, mpc_traj):
    """rk_traj / mpc_traj: tuples (time, q, qd, qdd, tau), unbatched."""
    target_state = np.asarray(target_state)
    header = np.concatenate([[0.0], target_state, np.zeros(14)])[None, :]
    rk = _traj_matrix(*map(np.asarray, rk_traj))
    mpc = _traj_matrix(*map(np.asarray, mpc_traj))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        np.savetxt(f, header)
        np.savetxt(f, rk)
        np.savetxt(f, mpc)


def write_benchmark_records(path, records, append: bool = True):
    """records: (B, 162) array; appended like benchmark.cpp:165."""
    records = np.asarray(records)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a" if append else "w") as f:
        np.savetxt(f, records)


def read_benchmark_records(path) -> np.ndarray:
    return np.loadtxt(path).reshape(-1, 162)
