"""Compare certificate-failure counts at the 512-cube workload across the
correspondence paths: xwindow (sorted), iwindow XLA, iwindow Pallas."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from dynfu_tpu.core.camera import Intr
from dynfu_tpu.engine.dynfusion import DynFusion
from dynfu_tpu.engine.params import DynFuParams, KinFuParams
from dynfu_tpu.io.datasets import sphere_depth
from dynfu_tpu.mesh.mc import marching_cubes
from dynfu_tpu.ops import knn
from dynfu_tpu.utils.benchmarks import _caps_for
from dynfu_tpu.volume import tsdf as tv
from dynfu_tpu.ops import imgproc
from dynfu_tpu.warp import field as wfield

rows, cols = 480, 640
dims = int(os.environ.get("DIMS", "512"))
intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
params = DynFuParams(
    kinfu=KinFuParams(rows=rows, cols=cols, intr=intr,
                      volume_dims=(dims,) * 3),
    **_caps_for(dims),
)
engine = DynFusion(params)
cx, cy = cols / 2 - 0.5, rows / 2 - 0.5
for i in range(15):
    engine(sphere_depth((0.004 * i, 0.0, 1.5), 0.5, rows, cols,
                        525.0, 525.0, cx, cy))

depth = jnp.asarray(sphere_depth((0.004 * 15, 0.0, 1.5), 0.5, rows, cols,
                                 525.0, 525.0, cx, cy), jnp.int32)
dp = engine.dynfu_params
config = engine.tsdf_config
vol, wf, c, pose = engine.vol, engine.warpfield, engine.canonical, engine.poses[-1]

dists = imgproc.compute_dists(depth, intr)
vol2 = tv.integrate_separable(tv.clear(vol), dists, pose, intr, config)
verts, n_verts, _ = marching_cubes(
    vol2, config, max_voxels=dp.max_mc_voxels, max_verts=dp.max_vertices)
live_m = jnp.arange(verts.shape[0]) < n_verts
wv, wn = wfield.warp_points_normals(wf, c.vertices, c.normals)
live = np.asarray(live_m)
print("n_verts", int(n_verts), "P(mask)", int(np.asarray(c.mask).sum()),
      "P cap", wv.shape[0], flush=True)

# how x-sorted are the two clouds?
v_np = np.asarray(verts)[live]
wv_np0 = np.asarray(wv)
msk = np.asarray(c.mask)
for name, x in (("live", v_np[:, 0]), ("warped(valid)", wv_np0[msk][:, 0])):
    inv = np.abs(np.argsort(np.argsort(x)) - np.arange(len(x)))
    print(f"{name}: rank displacement median {np.median(inv):.0f} "
          f"p99 {np.percentile(inv, 99):.0f} max {inv.max()}", flush=True)

def count(tag, fn):
    out, exact = fn()
    exact = np.asarray(exact)
    failed = live & ~exact
    print(f"{tag}: failed {failed.sum()}", flush=True)
    return failed

f_0 = count("xwindow base (no tiers)", lambda: knn.nn1_gather_xwindow(
    verts, wv, None, c.mask, live_m))
f_e = count("xwindow + escalate 16384", lambda: knn.nn1_gather_xwindow(
    verts, wv, None, c.mask, live_m, escalate=16384))
f_a = count("xwindow + escalate + rescue 4096", lambda: knn.nn1_gather_xwindow(
    verts, wv, None, c.mask, live_m, escalate=16384, rescue=4096))

# timing of the full tiered call (amortized over repeats, host readback)
import time
from dynfu_tpu.utils.timers import sync
for _ in range(2):
    v2, e2 = knn.nn1_gather_xwindow(verts, wv, None, c.mask, live_m,
                                    escalate=16384, rescue=4096)
    sync(e2)
t0 = time.perf_counter()
REP = 10
for _ in range(REP):
    v2, e2 = knn.nn1_gather_xwindow(verts, wv, None, c.mask, live_m,
                                    escalate=16384, rescue=4096)
    sync(e2)
print("tiered corr total: %.1f ms" % ((time.perf_counter() - t0) / REP * 1e3))
