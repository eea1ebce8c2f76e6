"""Per-frame pose-recovery diagnosis of the rigid 512-cube benchmark
(its ATE has measured EXACTLY 26.84 mm in every round — deterministic
under-correction, not noise) and of the fusion moving-camera path.

Prints per frame: true camera translation, estimated, step error.

Usage (TPU): /opt/venv/bin/python scripts/diag/diag_pose_drift.py [dims]
"""
import sys

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import dataclasses  # noqa: E402

from dynfu_tpu.core.camera import Intr  # noqa: E402
from dynfu_tpu.engine.kinfu import KinFu  # noqa: E402
from dynfu_tpu.engine.params import KinFuParams  # noqa: E402
from dynfu_tpu.io.datasets import sphere_depth  # noqa: E402

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 512
rows, cols = 480, 640
intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
params = dataclasses.replace(
    KinFuParams.default_params(), rows=rows, cols=cols, intr=intr,
    volume_dims=(dims,) * 3,
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


for i in range(13):
    engine(frame(i))
    R, t = engine.get_camera_pose()
    t = np.asarray(t)
    want = np.asarray([0.002, -0.001, 0.003]) * i
    ang = np.degrees(np.arccos(np.clip((np.trace(np.asarray(R)) - 1) / 2,
                                       -1, 1)))
    print(f"frame {i:2d}: want {want * 1e3} mm  got {t * 1e3} mm  "
          f"err {np.linalg.norm(t - want) * 1e3:6.2f} mm  rot {ang:.3f} deg",
          flush=True)
