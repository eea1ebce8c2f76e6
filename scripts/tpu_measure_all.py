"""One-process TPU measurement batch: run after a tunnel outage to
re-measure every benchmark in a single session (shared compile cache,
strictly sequential — never run two TPU processes at once).

Usage: /opt/venv/bin/python scripts/tpu_measure_all.py [--quick]
Prints one JSON line per benchmark; failures in one benchmark don't stop
the rest.
"""
import json
import sys
import traceback

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

QUICK = "--quick" in sys.argv


def run(tag, fn):
    try:
        r = fn()
        print(json.dumps({"bench": tag, **r}), flush=True)
    except Exception as e:
        traceback.print_exc()
        print(json.dumps({"bench": tag, "error": str(e)[:300]}), flush=True)


def main():
    from dynfu_tpu.utils.benchmarks import (
        run_benchmark, run_fusion_benchmark, run_rigid_benchmark,
        run_stage_benchmark, run_umbrella_benchmark)

    run("stage_512", lambda: run_stage_benchmark(volume_dims=512))
    run("nonrigid_128", lambda: run_benchmark(volume_dims=128))
    run("nonrigid_512", lambda: run_benchmark(volume_dims=512))
    run("rigid_512_stencil", lambda: run_rigid_benchmark(volume_dims=512))
    if not QUICK:
        run("fusion_512", lambda: run_fusion_benchmark(volume_dims=512))
        run("fusion_512_se3", lambda: run_fusion_benchmark(
            volume_dims=512, rotations=True))
        run("fusion_512_se3_movingcam", lambda: run_fusion_benchmark(
            volume_dims=512, rotations=True, camera_motion=0.002))
        run("fusion_512_se3_movingcam_simreg", lambda: run_fusion_benchmark(
            volume_dims=512, rotations=True, camera_motion=0.002,
            similarity_reg=True))
        run("umbrella_512", lambda: run_umbrella_benchmark(volume_dims=512))
        run("umbrella_512_fullscene", lambda: run_umbrella_benchmark(
            volume_dims=512, foreground=False))
        from dynfu_tpu.utils.benchmarks import run_fusion_stage_benchmark
        run("fusion_stage_512", lambda: run_fusion_stage_benchmark(
            volume_dims=512))
        # scripts/diag/tpu_kernel_path_cert.py is run SEPARATELY (its own
        # process would overlap this one's TPU session)


if __name__ == "__main__":
    main()
