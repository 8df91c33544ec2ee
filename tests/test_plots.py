"""Smoke tests for the analysis plotting layer (notebook equivalents)."""

import numpy as np
import pytest

from mpc_motion_planner_tpu.bench import plots
from mpc_motion_planner_tpu.models.panda import make_panda_limits, make_panda_model
from mpc_motion_planner_tpu.planner import Margins
from mpc_motion_planner_tpu.utils import io

matplotlib = pytest.importorskip("matplotlib")

MARGINS = Margins(0.8, 0.8, 0.6, 0.9, 0.1)


def _fake_traj(n=11, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 1.5, n)
    return (
        t,
        rng.normal(size=(n, 7)) * 0.3,
        rng.normal(size=(n, 7)) * 0.5,
        rng.normal(size=(n, 7)),
        rng.normal(size=(n, 7)) * 5.0,
    )


def test_optimal_solution_roundtrip_and_grid(tmp_path):
    target = np.linspace(-0.5, 0.5, 14)
    rk, mpc = _fake_traj(seed=1), _fake_traj(seed=2)
    path = tmp_path / "optimal_solution.txt"
    io.write_optimal_solution(path, target, rk, mpc)

    tgt, rk_l, mpc_l = plots.load_optimal_solution(path, n_points=11)
    np.testing.assert_allclose(tgt, target, atol=1e-12)
    np.testing.assert_allclose(rk_l["q"], rk[1], atol=1e-12)
    np.testing.assert_allclose(mpc_l["tau"], mpc[4], atol=1e-12)

    limits = make_panda_limits()
    fig = plots.plot_trajectory_grid(
        tgt, rk_l, mpc_l, limits, MARGINS, save_path=tmp_path / "grid.png"
    )
    assert (tmp_path / "grid.png").exists()
    assert len(fig.axes) == 28

    model = make_panda_model()
    plots.plot_ee_path(
        model, model.frame("panda_tool"), rk_l, mpc_l,
        save_path=tmp_path / "ee.png",
    )
    assert (tmp_path / "ee.png").exists()


def test_benchmark_plots(tmp_path):
    rng = np.random.default_rng(3)
    records = rng.normal(size=(16, 162))
    records[:, 140:148] = (rng.uniform(size=(16, 8)) > 0.2).astype(float)
    limits = make_panda_limits()

    plots.plot_extrema_scatter(
        records, limits, MARGINS, save_path=tmp_path / "scatter.png"
    )
    plots.plot_error_cdf(records, save_path=tmp_path / "cdf.png")
    assert (tmp_path / "scatter.png").exists()
    assert (tmp_path / "cdf.png").exists()
