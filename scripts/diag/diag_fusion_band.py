"""Diagnose the 512-cube SE(3)-fusion active-band size per frame.

The r4 measurement batch crashed run_fusion_benchmark(512, rotations=True)
with a band-compaction overflow (n_captured < n_band at
fusion_max_active = 786432).  This prints the per-frame band trajectory
under a deliberately oversized cap so the preset can be sized tightly.

Usage (TPU): /opt/venv/bin/python scripts/diag/diag_fusion_band.py [max_active_log2]
"""
import dataclasses
import sys
import time

import numpy as np

from dynfu_tpu.core.camera import Intr
from dynfu_tpu.engine.dynfusion import DynFusion
from dynfu_tpu.engine.params import DynFuParams, KinFuParams
from dynfu_tpu.io.datasets import sphere_depth

cap_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 21
dims = 512
rows, cols = 480, 640
intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
caps = DynFuParams.caps_for_volume(dims, fusion=True)
caps["fusion_max_active"] = 1 << cap_log2
params = DynFuParams(
    kinfu=KinFuParams(rows=rows, cols=cols, intr=intr,
                      volume_dims=(dims,) * 3),
    solver_rotations=True,
    **caps,
)
engine = DynFusion(params, mode="fusion")
cx, cy = cols / 2 - 0.5, rows / 2 - 0.5
n_total = 15
frames = [
    sphere_depth((0.004 * i, 0.0, 1.5), 0.5, rows, cols, 525.0, 525.0, cx, cy)
    for i in range(n_total)
]
vol_t = np.asarray((-1.5, -1.5, 0.5))

for i in range(n_total):
    t0 = time.perf_counter()
    engine(frames[i])
    wv, wm = engine.warped_cloud()
    v = np.asarray(wv)[np.asarray(wm)]
    dt = time.perf_counter() - t0
    center = np.asarray((0.004 * i, 0.0, 1.5)) - vol_t
    err = float(np.median(np.abs(np.linalg.norm(v - center, axis=-1) - 0.5))) * 1e3
    fs = engine.last_frame_stats
    if i == 0:
        print(f"frame 0 bootstrap: {dt*1e3:.0f} ms, n_canon={int(np.asarray(engine.canonical.mask).sum())}")
        continue
    print(
        f"frame {i:2d}: {dt*1e3:6.0f} ms  n_band={int(fs.band.n_band):7d} "
        f"captured={int(fs.band.n_captured):7d} updated={int(fs.band.n_updated):7d} "
        f"mc_drop={int(fs.mc_dropped)} corr_drop={int(fs.corr_dropped)} "
        f"warped_err={err:.3f} mm",
        flush=True,
    )
