#!/usr/bin/env python
"""Per-frame instrumentation of the SE(3) fusion divergence at 512-cube.

run_fusion_benchmark(512, rotations=True) measured warped error ~8 m with
every correspondence dropped; 128/256-cube are sub-millimeter. This drives
the same engine frame by frame and prints the solve stats, the node
translation magnitudes, and the warped error per frame to find the frame
and mechanism of the explosion."""

import sys

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from dynfu_tpu.core.camera import Intr  # noqa: E402
from dynfu_tpu.engine.dynfusion import DynFusion  # noqa: E402
from dynfu_tpu.engine.params import DynFuParams, KinFuParams  # noqa: E402
from dynfu_tpu.io.datasets import sphere_depth  # noqa: E402

import json

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 512
overrides = json.loads(sys.argv[2]) if len(sys.argv) > 2 else {}
rows, cols = 480, 640
intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
caps = DynFuParams.caps_for_volume(dims, fusion=True)
params = DynFuParams(
    kinfu=KinFuParams(rows=rows, cols=cols, intr=intr,
                      volume_dims=(dims,) * 3),
    solver_rotations=True,
    **caps,
)
if overrides:
    import dataclasses
    params = dataclasses.replace(params, **overrides)
print({'dims': dims, 'overrides': overrides}, flush=True)
engine = DynFusion(params, mode="fusion")
vol_t = np.asarray((-1.5, -1.5, 0.5))
radius = 0.5

for i in range(16):
    d = sphere_depth((0.004 * i, 0.0, 1.5), radius, rows, cols,
                     525.0, 525.0, intr.cx, intr.cy)
    engine(d)
    wv, wm = engine.warped_cloud()
    v = np.asarray(wv)[np.asarray(wm)]
    center = np.asarray((0.004 * i, 0.0, 1.5)) - vol_t
    werr = float(np.median(np.abs(np.linalg.norm(v - center, axis=-1)
                                  - radius))) * 1e3
    cv = np.asarray(engine.canonical.vertices)[np.asarray(
        engine.canonical.mask)]
    ccenter = np.asarray((0.0, 0.0, 1.5)) - vol_t
    cerr = float(np.median(np.abs(np.linalg.norm(cv - ccenter, axis=-1)
                                  - radius))) * 1e3
    wf = engine.warpfield
    dqs = np.asarray(wf.dqs)[np.asarray(wf.mask)]
    # translation part of each node DQ: t = 2 * dual * conj(real)
    tmag = np.linalg.norm(dqs[:, 4:8], axis=1) * 2  # upper bound-ish
    fs = engine.last_frame_stats
    line = {
        "frame": i,
        "warped_err_mm": round(werr, 3),
        "canonical_err_mm": round(cerr, 3),
        "nodes": int(wf.count),
        "t_dual_max": round(float(tmag.max()), 4) if len(tmag) else 0,
        "t_dual_med": round(float(np.median(tmag)), 4) if len(tmag) else 0,
    }
    if fs is not None:
        line["corr_dropped"] = int(fs.corr_dropped)
        line["final_cost"] = float(fs.solve.final_cost)
        if hasattr(fs.solve, "cg_iters"):
            line["cg_iters"] = int(fs.solve.cg_iters)
        line["mc_dropped"] = int(fs.mc_dropped)
        line["band"] = int(fs.band.n_band)
        line["captured"] = int(fs.band.n_captured)
    print(line, flush=True)
