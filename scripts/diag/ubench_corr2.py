"""Isolate correspondence variants + warp at the 512-cube workload."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dynfu_tpu.ops import knn  # noqa: E402
from dynfu_tpu.warp import field as wfield  # noqa: E402

rng = np.random.default_rng(1)
Q = P = 1 << 18
# surface-like nearly-sorted clouds
t = np.sort(rng.random(P).astype(np.float32)) * 2.0
pts = np.stack([t, np.cos(t * 9) * 0.4, np.sin(t * 9) * 0.4], -1)
perm = np.argsort(np.arange(P) + rng.integers(-6, 7, P), kind="stable")
pts = pts[perm].astype(np.float32)
qrs = (pts + rng.normal(size=(Q, 3)).astype(np.float32) * 0.002).astype(np.float32)
qj, pj = jnp.asarray(qrs), jnp.asarray(pts)
pm = jnp.ones((P,), bool)
qm = jnp.ones((Q,), bool)


def clock(name, fn, iters=10):
    out = fn()
    leaf = min(jax.tree_util.tree_leaves(out),
               key=lambda x: getattr(x, "size", 1 << 62))
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    leaf = min(jax.tree_util.tree_leaves(out),
               key=lambda x: getattr(x, "size", 1 << 62))
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms")
    return out


import os  # noqa: E402

v, e = clock("xwindow+pallas sweep (rescue 4096)",
             lambda: knn.nn1_gather_xwindow(qj, pj, None, pm, qm,
                                            rescue=4096))
print("  exact frac:", float(np.asarray(e).mean()))

os.environ["DYNFU_NO_PALLAS"] = "1"
v2, e2 = clock("xwindow XLA sweep (rescue 4096)",
               lambda: knn.nn1_gather_xwindow(qj, pj, None, pm, qm,
                                              rescue=4096))
print("  exact frac:", float(np.asarray(e2).mean()))
clock("xwindow sorted XLA (rescue 4096)",
      lambda: knn.nn1_gather_xwindow(qj, pj, None, pm, qm, rescue=4096))
del os.environ["DYNFU_NO_PALLAS"]

# rescue-free versions to see sweep-only cost
clock("xwindow pallas sweep only",
      lambda: knn.nn1_gather_xwindow(qj, pj, None, pm, qm))
os.environ["DYNFU_NO_PALLAS"] = "1"
clock("xwindow XLA sweep only",
      lambda: knn.nn1_gather_xwindow(qj, pj, None, pm, qm))
del os.environ["DYNFU_NO_PALLAS"]

# warp for comparison (pallas kNN inside)
wf = wfield.init_warpfield(pts[:900], weights=0.08, capacity=1024)
nrm = jnp.asarray(rng.normal(size=(Q, 3)), jnp.float32)
clock("warp_points_normals", lambda: wfield.warp_points_normals(wf, qj, nrm))
