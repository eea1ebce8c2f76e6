"""Diagnose which 512-cube correspondence queries fail the x-window
certificate and what the rescue costs."""

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
dims = 512
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

out, exact = knn.nn1_gather_xwindow(verts, wv, None, c.mask, live_m)
exact = np.asarray(exact)
live = np.asarray(live_m)
verts_np = np.asarray(verts)
failed = live & ~exact
print("n_verts", int(n_verts), "failed", failed.sum())

fidx = np.where(failed)[0]
print("failed index range:", fidx.min() if len(fidx) else "-",
      fidx.max() if len(fidx) else "-")
fx = verts_np[failed, 0]
print("failed x stats: min %.4f max %.4f" % (fx.min(), fx.max()))
allx = verts_np[live, 0]
print("all x range: %.4f .. %.4f" % (allx.min(), allx.max()))
# distance to true NN for the failed ones (numpy exact on a subsample)
wv_np = np.asarray(wv)[np.asarray(c.mask)]
sub = fidx[:: max(1, len(fidx) // 200)]
d = ((verts_np[sub, None, :] - wv_np[None, :, :]) ** 2).sum(-1).min(1)
print("failed true NN dist mm: median %.3f max %.3f"
      % (np.median(np.sqrt(d)) * 1e3, np.sqrt(d.max()) * 1e3))
# block structure: which 4096-query blocks do failures live in?
blocks = np.bincount(fidx // 4096, minlength=64)
print("failures per query block:", {i: int(v) for i, v in enumerate(blocks) if v})
# x-extent of each failing block vs window coverage
ws = np.sort(wv_np[:, 0])
for b in np.where(blocks > 0)[0][:6]:
    qb = verts_np[b * 4096:(b + 1) * 4096]
    qbv = qb[live[b * 4096:(b + 1) * 4096]]
    qmid = qbv[:, 0].mean() if len(qbv) else float("nan")
    lo = np.searchsorted(ws[:: 4096], qmid) - 1
    lo = np.clip(lo - 1, 0, max(len(ws) // 4096 - 3, 0))
    w0, w1 = ws[lo * 4096], ws[min(lo * 4096 + 3 * 4096, len(ws)) - 1]
    print(f"block {b}: q x [{qbv[:,0].min():.4f},{qbv[:,0].max():.4f}] "
          f"qmid {qmid:.4f} window x [{w0:.4f},{w1:.4f}]")
