"""Benchmark harness: end-to-end non-rigid fusion frames/s.

Workload = the reference's own non-rigid configuration (SURVEY §6): 640x480
depth stream at fx=fy=525, 128-cube TSDF over 3 m (the dims the reference
hardcodes for marching cubes, dyn_fusion.cpp:10), full DynamicFusion loop —
preprocess, clear+integrate, marching cubes, warp, correspondence, GN solve,
node insertion — on a synthetically deforming sphere.

vs_baseline is measured against the 30 fps/chip target from BASELINE.md
(the reference publishes no numbers of its own; SURVEY §6).
"""

from __future__ import annotations

import time

import numpy as np

from dynfu_tpu.core.camera import Intr
from dynfu_tpu.engine.dynfusion import DynFusion
from dynfu_tpu.engine.params import DynFuParams, KinFuParams
from dynfu_tpu.io.datasets import sphere_depth
from dynfu_tpu.utils.timers import sync

TARGET_FPS = 30.0  # BASELINE.md north-star target


def run_rigid_benchmark(
    volume_dims: int = 512,
    frames: int = 10,
    warmup: int = 3,
    rows: int = 480,
    cols: int = 640,
) -> dict:
    """Rigid kfusion pipeline benchmark (BASELINE config 2): TSDF integrate
    + raycast + multi-scale point-to-plane ICP on a slowly-moving camera at
    the reference's rigid defaults (512-cube over 3 m)."""
    import dataclasses

    from dynfu_tpu.engine.kinfu import KinFu

    intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
    params = dataclasses.replace(
        KinFuParams.default_params(), rows=rows, cols=cols, intr=intr,
        volume_dims=(volume_dims,) * 3,
    )
    engine = KinFu(params)
    cx, cy = intr.cx, intr.cy

    scene = [((0.0, 0.0, 1.5), 0.5), ((0.55, 0.35, 1.6), 0.2),
             ((-0.5, -0.4, 1.7), 0.25)]

    def frame(i):
        cam_t = np.asarray([0.002 * i, -0.001 * i, 0.003 * i])
        ds = []
        for c, r in scene:
            d = sphere_depth(tuple(np.asarray(c) - cam_t), r, rows, cols,
                             525.0, 525.0, cx, cy)
            ds.append(np.where(d == 0, np.iinfo(np.int32).max, d))
        out = np.stack(ds).min(axis=0)
        return np.where(out == np.iinfo(np.int32).max, 0, out).astype(np.int32)

    for i in range(warmup):
        engine(frame(i))
    sync(engine.prev_pyr[0][0])

    t0 = time.perf_counter()
    for i in range(warmup, warmup + frames):
        engine(frame(i))
    sync(engine.prev_pyr[0][0])
    dt = (time.perf_counter() - t0) / frames

    R, t = engine.get_camera_pose()
    want = np.asarray([0.002, -0.001, 0.003]) * (warmup + frames - 1)
    ate_mm = float(np.linalg.norm(np.asarray(t) - want)) * 1e3
    return {
        "metric": f"rigid_fusion_fps_{volume_dims}cube",
        "value": round(1.0 / dt, 3),
        "unit": "frames/s",
        "vs_baseline": round(1.0 / dt / TARGET_FPS, 4),
        "frame_ms": round(dt * 1e3, 1),
        "ate_mm": round(ate_mm, 2),
    }


def run_benchmark(
    volume_dims: int = 128,
    frames: int = 12,
    warmup: int = 3,
    rows: int = 480,
    cols: int = 640,
    max_nodes: int = 0,
    max_vertices: int = 0,
) -> dict:
    intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
    # buffer capacities sized to the isosurface vertex count, which grows
    # ~quadratically with volume resolution
    if volume_dims >= 384:
        caps = dict(max_vertices=1 << 18, max_mc_voxels=1 << 17,
                    max_nodes=1024, max_new_nodes=512)
    elif volume_dims >= 192:
        caps = dict(max_vertices=1 << 16, max_mc_voxels=1 << 14,
                    max_nodes=512, max_new_nodes=256)
    else:
        caps = dict(max_vertices=1 << 15, max_mc_voxels=1 << 13,
                    max_nodes=256, max_new_nodes=128)
    if max_nodes:
        caps["max_nodes"] = max_nodes
    if max_vertices:
        caps["max_vertices"] = max_vertices
    params = DynFuParams(
        kinfu=KinFuParams(
            rows=rows, cols=cols, intr=intr,
            volume_dims=(volume_dims,) * 3,
        ),
        **caps,
    )
    engine = DynFusion(params)
    cx, cy = cols / 2 - 0.5, rows / 2 - 0.5

    # pre-generate the input frames: the benchmark measures the FUSION
    # pipeline; the reference's fps meter likewise excludes image decode
    # (cv::imread runs before the SampledScopeTime scope, demo.cpp:85-95)
    n_total = warmup + frames + 3
    _frames = [
        sphere_depth((0.004 * i, 0.0, 1.5), 0.5, rows, cols, 525.0, 525.0,
                     cx, cy)
        for i in range(n_total)
    ]

    def frame(i):
        return _frames[i]

    for i in range(warmup):
        engine(frame(i))
        wv, _ = engine.warped_cloud()
        sync(wv)

    # throughput: stream all frames, one final sync — how a deployed
    # pipeline runs (and how the reference's per-frame cudaDeviceSynchronize
    # behaves, whose sync cost is microseconds; this host's TPU tunnel
    # round-trip is ~28 ms, which would otherwise dominate)
    t0 = time.perf_counter()
    for i in range(warmup, warmup + frames):
        engine(frame(i))
    wv, _ = engine.warped_cloud()
    sync(wv)
    dt = (time.perf_counter() - t0) / frames
    fps = 1.0 / dt

    # tracking quality at the last throughput frame (before the extra
    # latency-measurement frames accumulate more motion)
    wv, wm = engine.warped_cloud()
    v = np.asarray(wv)[np.asarray(wm)]
    center = np.asarray((0.004 * (warmup + frames - 1), 0.0, 1.5)) - np.asarray(
        (-1.5, -1.5, 0.5)
    )
    err_mm = float(np.median(np.abs(np.linalg.norm(v - center, axis=-1) - 0.5))) * 1e3

    # latency: per-frame wall time including a host sync every frame
    t0 = time.perf_counter()
    for i in range(warmup + frames, warmup + frames + 3):
        engine(frame(i))
        wv, _ = engine.warped_cloud()
        sync(wv)
    latency_ms = (time.perf_counter() - t0) / 3 * 1e3

    return {
        "metric": f"nonrigid_fusion_fps_{volume_dims}cube",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / TARGET_FPS, 4),
        "frame_ms": round(dt * 1e3, 1),
        "latency_ms": round(latency_ms, 1),
        "median_vertex_err_mm": round(err_mm, 3),
    }
