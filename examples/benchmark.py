#!/usr/bin/env python
"""Acceptance-benchmark shim (see RESULTS.md "How to reproduce").

The implementation lives in :mod:`mpc_motion_planner_tpu.bench.acceptance`
(also installed as the ``mpc-tpu-acceptance`` console script); this file
keeps the documented ``python examples/benchmark.py`` command working from
a bare checkout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpc_motion_planner_tpu.bench.acceptance import main

if __name__ == "__main__":
    main()
