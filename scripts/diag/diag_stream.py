"""Split the parity-512 streaming overhead: fused-program time vs
host-side per-frame costs (depth upload over the tunnel, dispatch).

Modes timed over identical 12-frame windows (warm engine):
  host    engine(numpy depth) per frame — run_benchmark's loop
  staged  engine(device-resident depth) — all frames jax.device_put ahead

Usage (TPU): /opt/venv/bin/python scripts/diag/diag_stream.py [dims]
"""
import sys
import time

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynfu_tpu.core.camera import Intr  # noqa: E402
from dynfu_tpu.engine.dynfusion import DynFusion  # noqa: E402
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
n_total = 3 + 4 * FRAMES
frames_np = [
    np.asarray(sphere_depth((0.004 * i, 0.0, 1.5), 0.5, rows, cols, 525.0,
                            525.0, cx, cy), np.int32)
    for i in range(n_total)
]

for i in range(3):
    engine(frames_np[i])
    wv, _ = engine.warped_cloud()
    sync(wv)


def window(tag, lo, inputs):
    t0 = time.perf_counter()
    for i in range(lo, lo + FRAMES):
        engine(inputs[i])
    wv, _ = engine.warped_cloud()
    sync(wv)
    dt = (time.perf_counter() - t0) / FRAMES
    print(f"{tag}: {dt * 1e3:6.1f} ms/frame", flush=True)


window("host  1", 3, frames_np)
frames_dev = [jax.device_put(jnp.asarray(f)) for f in frames_np]
jax.block_until_ready(frames_dev)
window("staged1", 3 + FRAMES, frames_dev)
window("host  2", 3 + 2 * FRAMES, frames_np)
window("staged2", 3 + 3 * FRAMES, frames_dev)
