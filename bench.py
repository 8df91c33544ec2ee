#!/usr/bin/env python
"""Headline benchmark shim — the driver runs ``python bench.py``.

The implementation lives in :mod:`mpc_motion_planner_tpu.bench.headline`
(also installed as the ``mpc-tpu-bench`` console script, pyproject.toml);
this file only makes the repo checkout runnable without installation.
Prints ONE JSON line: {"metric": "solves_per_s", "value": N, ...}.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mpc_motion_planner_tpu.bench.headline import main

if __name__ == "__main__":
    main()
