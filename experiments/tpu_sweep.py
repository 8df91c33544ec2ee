#!/usr/bin/env python
"""Serialized TPU backend x config sweep for the headline bench.

Runs bench.py in a fresh subprocess per config (the TPU is a single
exclusive device behind a flaky tunnel: jobs must be serialized, and a
fresh process per run avoids wedged-runtime carryover). Between runs a
tiny-matmul probe retries until the device answers, per CLAUDE.md.

Appends one JSON line per config to the output file (default
experiments/tpu_sweep_results.jsonl) with the config alongside bench.py's
own JSON. Usage:

    python experiments/tpu_sweep.py [--out FILE] [--only NAME ...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = (
    "import jax, jax.numpy as jnp; x = jnp.ones((128, 128));"
    "print(float((x @ x).sum()))"
)

# name -> env overrides for bench.py
CONFIGS = {
    # the production kernel at increasing batch
    "sp_b128_r1": {"BENCH_QP_BACKEND": "structured_pallas", "BENCH_BATCH": "128"},
    "sp_b1024_r1": {"BENCH_QP_BACKEND": "structured_pallas", "BENCH_BATCH": "1024"},
    "sp_b2048_r1": {"BENCH_QP_BACKEND": "structured_pallas", "BENCH_BATCH": "2048"},
    "sp_b4096_r1": {"BENCH_QP_BACKEND": "structured_pallas", "BENCH_BATCH": "4096"},
    # refine / residual-check cadence / iteration budget knobs
    "sp_b1024_r0": {
        "BENCH_QP_BACKEND": "structured_pallas",
        "BENCH_BATCH": "1024",
        "BENCH_KKT_REFINE": "0",
    },
    "sp_b1024_r1_ce50": {
        "BENCH_QP_BACKEND": "structured_pallas",
        "BENCH_BATCH": "1024",
        "BENCH_CHECK_EVERY": "50",
    },
    "sp_b1024_r1_it350": {
        "BENCH_QP_BACKEND": "structured_pallas",
        "BENCH_BATCH": "1024",
        "BENCH_QP_MAX_ITER": "350",
    },
    # the portable XLA backends for the table
    "st_b1024_r0": {"BENCH_QP_BACKEND": "structured", "BENCH_BATCH": "1024"},
    "st_b1024_r0_chol": {
        "BENCH_QP_BACKEND": "structured",
        "BENCH_BATCH": "1024",
        "BENCH_KKT_FACTOR": "cholesky",
    },
    # round-1 dense kernel, chunked (recorded for the table)
    "pl_b1024_r1_c32": {
        "BENCH_QP_BACKEND": "pallas",
        "BENCH_BATCH": "1024",
        "BENCH_CHUNK": "32",
    },
    "xla_b1024_r1": {"BENCH_QP_BACKEND": "xla", "BENCH_BATCH": "1024"},
}


def probe(max_wait=600):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            r = subprocess.run(
                [sys.executable, "-c", PROBE], capture_output=True, timeout=240
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(15)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "experiments", "tpu_sweep_results.jsonl"))
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()

    names = args.only or list(CONFIGS)
    for name in names:
        env_over = CONFIGS[name]
        if not probe():
            rec = {"name": name, "error": "device probe failed"}
        else:
            env = dict(os.environ, **env_over)
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py")],
                    capture_output=True, timeout=args.timeout, env=env, text=True,
                )
                line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    rec = {"error": f"rc={r.returncode}",
                           "stderr_tail": r.stderr[-500:]}
            except subprocess.TimeoutExpired:
                rec = {"error": "timeout"}
            rec = {"name": name, "env": env_over,
                   "wall_s": round(time.time() - t0, 1), **rec}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
