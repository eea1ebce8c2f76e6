"""TPU check: knn_pallas.knn_gather_tpu vs ops.knn.knn_gather, and the
warp_points_normals stage they feed, timed exactly like the stage bench
(probe the smallest output leaf, 10 iters)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynfu_tpu.ops import knn, knn_pallas
from dynfu_tpu.utils import jaxcache
from dynfu_tpu.warp import field as wfield

jaxcache.enable_compilation_cache()
print("default_backend:", jax.default_backend(),
      " platform:", jax.devices()[0].platform,
      " pallas available():", knn_pallas.available())

rng = np.random.default_rng(0)
Q, D, F, k = 224_958, 1024, 13, 8
queries = rng.uniform(-1.5, 1.5, (Q, 3)).astype(np.float32)
normals = rng.normal(size=(Q, 3)).astype(np.float32)
points = rng.uniform(-1.5, 1.5, (D, 3)).astype(np.float32)
table = rng.normal(size=(D, F)).astype(np.float32)
mask = np.ones(D, bool)
mask[900:] = False

qj, nj = jnp.asarray(queries), jnp.asarray(normals)
pj, tj, mj = jnp.asarray(points), jnp.asarray(table), jnp.asarray(mask)
wf = wfield.init_warpfield(points[:900], weights=0.08, capacity=D)


def sync1(x):
    # tiny readback: one row sliced ON DEVICE then pulled
    np.asarray(jax.device_get(x[:1]))


xla = jax.jit(lambda q, p, t, m: knn.knn_gather(q, p, k, t, m))
pal = jax.jit(lambda q, p, t, m: knn_pallas.knn_gather_tpu(q, p, k, t, m))


def clock(name, fn, iters=10):
    out = fn()
    sync1(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync1(out[0])
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms/call")
    return out

clock("knn_gather xla", lambda: xla(qj, pj, tj, mj))
clock("knn_gather pallas", lambda: pal(qj, pj, tj, mj))
clock("warp_points_normals (engine path)",
      lambda: wfield.warp_points_normals(wf, qj, nj))
