"""Isolate the chained-state cost of the parity-512 frame: the stage
benchmark times the fused program on FIXED inputs (32 ms) while the
streaming engine loop measures ~46 ms/frame. Modes:

  fixed    _nonrigid_frame(args) x12, same args every call, one sync
  chained  volume+warpfield outputs feed the next call, one sync
  engine   DynFusion() streaming loop (the benchmark's shape)

Usage (TPU): /opt/venv/bin/python scripts/diag/diag_chain.py [dims]
"""
import sys
import time

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from dynfu_tpu.core.camera import Intr  # noqa: E402
from dynfu_tpu.engine.dynfusion import DynFusion, _nonrigid_frame  # noqa: E402
from dynfu_tpu.engine.params import DynFuParams, KinFuParams  # noqa: E402
from dynfu_tpu.io.datasets import sphere_depth  # noqa: E402
from dynfu_tpu.utils.timers import sync  # noqa: E402

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 512
rows, cols = 480, 640
intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
caps = DynFuParams.caps_for_volume(dims)
params = DynFuParams(
    kinfu=KinFuParams(rows=rows, cols=cols, intr=intr,
                      volume_dims=(dims,) * 3),
    **caps,
)
engine = DynFusion(params)
cx, cy = cols / 2 - 0.5, rows / 2 - 0.5
FRAMES = 12
frames_np = [
    np.asarray(sphere_depth((0.004 * i, 0.0, 1.5), 0.5, rows, cols, 525.0,
                            525.0, cx, cy), np.int32)
    for i in range(FRAMES + 3)
]
for i in range(3):
    engine(frames_np[i])
    wv, _ = engine.warped_cloud()
    sync(wv)

dp, cfg, p = engine.dynfu_params, engine.tsdf_config, engine.params
c, pose = engine.canonical, engine.poses[-1]
depth = jnp.asarray(frames_np[3], jnp.int32)
kw = dict(dp=dp, intr=p.intr, config=cfg, strict_parity=True,
          integrate_mode="separable", canonical_mult=engine.canonical_mult)
args0 = (engine.vol, engine.warpfield, c.vertices, c.normals, c.mask)

out = _nonrigid_frame(*args0, depth, pose, **kw)
sync(out[8])

for rep in range(2):
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        out = _nonrigid_frame(*args0, depth, pose, **kw)
    sync(out[8])
    print(f"fixed  : {(time.perf_counter() - t0) / FRAMES * 1e3:6.1f} ms",
          flush=True)

    vol, wf = args0[0], args0[1]
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        out = _nonrigid_frame(vol, wf, *args0[2:], depth, pose, **kw)
        vol, wf = out[0], out[1]
    sync(out[8])
    print(f"chained: {(time.perf_counter() - t0) / FRAMES * 1e3:6.1f} ms",
          flush=True)

    t0 = time.perf_counter()
    for i in range(3, 3 + FRAMES):
        engine(frames_np[i])
    wv, _ = engine.warped_cloud()
    sync(wv)
    print(f"engine : {(time.perf_counter() - t0) / FRAMES * 1e3:6.1f} ms",
          flush=True)

# --- isolate engine internals: same depth every frame, device-resident ---
import jax

dev_depth = jax.device_put(depth)
jax.block_until_ready(dev_depth)
for rep in range(2):
    t0 = time.perf_counter()
    host_ts = []
    for _ in range(FRAMES):
        h0 = time.perf_counter()
        engine(dev_depth)
        host_ts.append(time.perf_counter() - h0)
    wv, _ = engine.warped_cloud()
    sync(wv)
    dt = (time.perf_counter() - t0) / FRAMES
    print(f"engine-samedepth: {dt * 1e3:6.1f} ms  "
          f"host-side per call: {np.median(host_ts) * 1e3:.1f} ms "
          f"max {max(host_ts) * 1e3:.1f}", flush=True)

# --- manual replica of the engine's per-frame pattern -------------------
from dynfu_tpu.engine.dynfusion import Frame

c2 = engine.canonical
vol, wf = engine.vol, engine.warpfield
pose2 = engine.poses[-1]
for rep in range(2):
    t0 = time.perf_counter()
    for i in range(FRAMES):
        out = _nonrigid_frame(vol, wf, c2.vertices, c2.normals, c2.mask,
                              dev_depth, pose2, **kw)
        vol, wf = out[0], out[1]
        cw = Frame(c2.idx, out[2], out[3], c2.mask)
        live = Frame(i, out[4], out[5], out[6])
        stats = out[9]
    sync(out[8])
    print(f"replica: {(time.perf_counter() - t0) / FRAMES * 1e3:6.1f} ms",
          flush=True)

# --- engine loop with host pose checks stubbed --------------------------
engine._aligned = lambda pose: True
engine._rotation_angle = lambda pose: 0.0
for rep in range(2):
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        engine(dev_depth)
    wv, _ = engine.warped_cloud()
    sync(wv)
    print(f"engine-stubbed: {(time.perf_counter() - t0) / FRAMES * 1e3:6.1f} ms",
          flush=True)

# --- engine loop, window-end sync WITHOUT warped_cloud ------------------
for rep in range(2):
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        engine(dev_depth)
    sync(engine.canonical_warped.vertices)
    print(f"engine-nosoup : {(time.perf_counter() - t0) / FRAMES * 1e3:6.1f} ms",
          flush=True)
t0 = time.perf_counter()
wv, _ = engine.warped_cloud()
sync(wv)
print(f"warped_cloud alone: {(time.perf_counter() - t0) * 1e3:6.1f} ms",
      flush=True)

# --- warped_cloud steady-state (second call after jit cache) ------------
for rep in range(3):
    t0 = time.perf_counter()
    wv, _ = engine.warped_cloud()
    sync(wv)
    print(f"warped_cloud rep{rep}: {(time.perf_counter() - t0) * 1e3:6.1f} ms",
          flush=True)
