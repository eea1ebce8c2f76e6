#!/usr/bin/env python
"""Bisect the 128-cube bench regression (BENCH_r01 40.1 -> BENCH_r02 34.9 fps)
by toggling the round-2 landings one at a time under the REAL bench harness.

Usage: /opt/venv/bin/python scripts/diag_regression.py [dims]
One TPU process at a time; each config re-jits (persistent cache covers
repeats)."""

import json
import sys

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dynfu_tpu.utils.benchmarks import run_benchmark  # noqa: E402

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 128

CONFIGS = [
    ("current-defaults", {}),
    ("no-tiers", {"corr_escalate": 0, "corr_rescue": 0}),
    ("no-escalate", {"corr_escalate": 0}),
    ("no-rescue", {"corr_rescue": 0}),
    ("single-outer-solve", {"num_iter": 1, "nonlinear_iter": 1}),
    ("short-linear", {"linear_iter": 32}),
]

for name, ov in CONFIGS:
    try:
        r = run_benchmark(volume_dims=dims, overrides=ov, check_counters=False)
        print(json.dumps({"config": name, **{k: r[k] for k in (
            "value", "frame_ms", "median_vertex_err_mm",
            "mc_dropped_cells", "corr_dropped")}}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"config": name, "error": repr(e)}), flush=True)
