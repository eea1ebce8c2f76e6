"""TPU check: gram_pallas.data_normal_tpu vs gn._dense_data_normal."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dynfu_tpu.solver import gn, gram_pallas  # noqa: E402

rng = np.random.default_rng(0)
N, K, D = 1 << 18, 8, 1024
idx = jnp.asarray(rng.integers(0, D, (N, K)), jnp.int32)
w = jnp.asarray(rng.random((N, K)), jnp.float32)
s2 = jnp.asarray(rng.random(N), jnp.float32)
delta = jnp.asarray(rng.normal(size=(N, 3)) * 0.01, jnp.float32)


def sync1(x):
    np.asarray(jax.device_get(x[:1, :1]))


xla = jax.jit(lambda i, ww, s, d: gn._dense_data_normal(None, i, ww, s, d, D))
pal = jax.jit(lambda i, ww, s, d: gram_pallas.data_normal_tpu(i, ww, s, d, D))

A1, b1 = xla(idx, w, s2, delta)
A2, b2 = pal(idx, w, s2, delta)
A1, b1, A2, b2 = map(np.asarray, (A1, b1, A2, b2))
s = np.abs(A1).max()
print("A max abs diff (rel):", np.abs(A1 - A2).max() / s)
print("b max abs diff:", np.abs(b1 - b2).max())

for name, fn in [("xla", xla), ("pallas", pal)]:
    out = fn(idx, w, s2, delta)
    sync1(out[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(idx, w, s2, delta)
    sync1(out[0])
    print(f"{name}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms/call")
