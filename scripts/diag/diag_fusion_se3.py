"""Per-frame diagnostics for the 512-cube SE(3) fusion benchmark: where
does the MC capacity overflow come from (band growth? warp blow-up?), and
what do the error/stat trajectories look like frame by frame.

Usage: PYTHONPATH=. /opt/venv/bin/python scripts/diag_fusion_se3.py [dims]
"""
import json
import sys

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dynfu_tpu.core.camera import Intr
from dynfu_tpu.engine.dynfusion import DynFusion
from dynfu_tpu.engine.params import DynFuParams, KinFuParams
from dynfu_tpu.io.datasets import sphere_depth
from dynfu_tpu.utils.benchmarks import _caps_for

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 512
rows, cols = 480, 640
intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
caps = _caps_for(dims)
params = DynFuParams(
    kinfu=KinFuParams(rows=rows, cols=cols, intr=intr,
                      volume_dims=(dims,) * 3),
    solver_rotations=True,
    **caps,
)
engine = DynFusion(params, mode="fusion")
cx, cy = cols / 2 - 0.5, rows / 2 - 0.5
vol_t = np.asarray((-1.5, -1.5, 0.5))
radius = 0.5

for i in range(15):
    d = sphere_depth((0.004 * i, 0.0, 1.5), radius, rows, cols, 525.0, 525.0,
                     cx, cy)
    engine(d)
    rec = {"frame": i}
    fs = engine.last_frame_stats
    if fs is not None:
        rec.update(
            mc_dropped=int(fs.mc_dropped),
            corr_dropped=int(fs.corr_dropped),
            n_band=int(fs.band.n_band),
            n_captured=int(fs.band.n_captured),
            n_updated=int(fs.band.n_updated),
        )
        if hasattr(fs.solve, "mean_rot_deg"):
            rec["mean_rot_deg"] = round(float(fs.solve.mean_rot_deg), 4)
        rec["final_cost"] = round(float(fs.solve.final_cost), 6)
    v = np.asarray(engine.canonical.vertices)[np.asarray(engine.canonical.mask)]
    rec["n_verts"] = int(v.shape[0])
    center = np.asarray((0.0, 0.0, 1.5)) - vol_t
    rec["canon_err_mm"] = round(float(np.median(
        np.abs(np.linalg.norm(v - center, axis=-1) - radius))) * 1e3, 3)
    wv, wm = engine.warped_cloud()
    w = np.asarray(wv)[np.asarray(wm)]
    wc = np.asarray((0.004 * i, 0.0, 1.5)) - vol_t
    rec["warp_err_mm"] = round(float(np.median(
        np.abs(np.linalg.norm(w - wc, axis=-1) - radius))) * 1e3, 3)
    nodes = engine.warpfield
    rec["n_nodes"] = int(nodes.count)
    print(json.dumps(rec), flush=True)
