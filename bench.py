#!/usr/bin/env python
"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: end-to-end non-rigid DynamicFusion frames/s per chip at the
reference's own configuration (640x480 depth, 128-cube TSDF — the dims the
reference hardcodes for its non-rigid path). vs_baseline is fps / 30 (the
BASELINE.md target; the reference repo publishes no numbers of its own).
"""

import json
import sys


def main() -> int:
    from dynfu_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import os

    from dynfu_tpu.utils.benchmarks import run_benchmark

    dims = int(os.environ.get("DYNFU_BENCH_DIMS", "128"))
    result = run_benchmark(volume_dims=dims)
    print(json.dumps({
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }))
    print(f"# detail: {json.dumps(result)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
