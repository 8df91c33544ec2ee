"""TPU experiment: split4 (bf16x4) kernel precision vs HIGHEST baseline.

Measures full-solve latency AND solution quality (violation percentiles,
QP convergence fraction) so a fast-but-divergent config is rejected.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_motion_planner_tpu.planner import Margins, MotionPlanner
from mpc_motion_planner_tpu.ops.qp import QPSettings
from mpc_motion_planner_tpu.bench.harness import chain_states

B = 128
m = Margins(0.8, 0.8, 0.6, 0.9, 0.1)


def run(name, qp_settings):
    planner = MotionPlanner(margins=m, qp_settings=qp_settings)
    cur, tgt = chain_states(planner, jax.random.PRNGKey(0), B)
    solve = jax.jit(planner.solve)
    t0 = time.perf_counter()
    sol = jax.block_until_ready(solve(cur, tgt))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    sol = jax.block_until_ready(solve(cur, tgt))
    dt = time.perf_counter() - t0
    viol = np.asarray(sol.violation)
    conv = np.asarray(sol.qp_converged)
    print(
        f"{name:28s} {dt * 1e3:7.1f} ms  {B / dt:7.1f}/s  "
        f"viol p50={np.median(viol):.3g} p95={np.percentile(viol, 95):.3g} "
        f"max={viol.max():.3g}  qp_conv={conv.mean() * 100:.0f}%  "
        f"(compile {compile_s:.0f}s)",
        flush=True,
    )


run("pallas highest G1 (base)", QPSettings(backend="pallas"))
run("pallas split4 G1", QPSettings(backend="pallas", pallas_precision="split4"))
run(
    "pallas split4 G2",
    QPSettings(backend="pallas", pallas_precision="split4", pallas_group=2),
)
