"""Microbench: correspondence components at the 512-cube workload scale.

Q = P = 262144 points (the 512-cube max_vertices), block = 8192.
Times: (a) lax.sort with payloads, (b) windowed distance via padded-K=128
HIGHEST matmul (round-1 formulation), (c) windowed distance via unrolled
elementwise broadcasts, (d) one-hot value fetch matmul.
"""
import time

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from dynfu_tpu.utils.timers import sync

Q = P = 1 << 18
BLOCK = 8192
W = 3 * BLOCK

rng = np.random.default_rng(0)
pts = rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32)
qs = (pts + rng.normal(0, 0.003, (P, 3))).astype(np.float32)
vals = rng.uniform(-1, 1, (P, 3)).astype(np.float32)

pts_d = jnp.asarray(pts)
qs_d = jnp.asarray(qs)
vals_d = jnp.asarray(vals)


def clock(name, fn, *args, iters=10):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return out


@jax.jit
def sort6(p, v):
    ops = (p[:, 0], p[:, 1], p[:, 2], v[:, 0], v[:, 1], v[:, 2])
    return jax.lax.sort(ops, num_keys=1)


@jax.jit
def sort3(p):
    return jax.lax.sort((p[:, 0], p[:, 1], p[:, 2]), num_keys=1)


@jax.jit
def sort1(p):
    return jnp.sort(p[:, 0])


_hi = jax.lax.Precision.HIGHEST


def _pad_coords(x):
    return jnp.pad(x, ((0, 0), (0, 128 - x.shape[1])))


@jax.jit
def win_matmul(q, p):
    # the round-1 inner loop: per query block, (B,128)@(128,3B) HIGHEST
    nqb = Q // BLOCK

    def one(i, acc):
        qb = jax.lax.dynamic_slice_in_dim(q, i * BLOCK, BLOCK, 0)
        pb = jax.lax.dynamic_slice_in_dim(p, (i * BLOCK) % (P - W), W, 0)
        pn = jnp.sum(pb * pb, axis=-1)
        cross = jnp.matmul(_pad_coords(qb), _pad_coords(pb).T, precision=_hi)
        qn = jnp.sum(qb * qb, axis=-1, keepdims=True)
        d = jnp.maximum(qn - 2.0 * cross + pn[None, :], 0.0)
        j = jnp.argmin(d, axis=-1)
        return acc + jnp.sum(j)

    return jax.lax.fori_loop(0, nqb, one, jnp.int32(0))


@jax.jit
def win_elemwise(q, p):
    nqb = Q // BLOCK

    def one(i, acc):
        qb = jax.lax.dynamic_slice_in_dim(q, i * BLOCK, BLOCK, 0)
        pb = jax.lax.dynamic_slice_in_dim(p, (i * BLOCK) % (P - W), W, 0)
        dx = qb[:, 0:1] - pb[None, :, 0]
        dy = qb[:, 1:2] - pb[None, :, 1]
        dz = qb[:, 2:3] - pb[None, :, 2]
        d = dx * dx + dy * dy + dz * dz
        j = jnp.argmin(d, axis=-1)
        return acc + jnp.sum(j)

    return jax.lax.fori_loop(0, nqb, one, jnp.int32(0))


@jax.jit
def fetch_onehot(q, p, v):
    nqb = Q // BLOCK
    iota3 = jnp.arange(W, dtype=jnp.int32)

    def one(i, acc):
        qb = jax.lax.dynamic_slice_in_dim(q, i * BLOCK, BLOCK, 0)
        pb = jax.lax.dynamic_slice_in_dim(p, (i * BLOCK) % (P - W), W, 0)
        vb = jax.lax.dynamic_slice_in_dim(v, (i * BLOCK) % (P - W), W, 0)
        dx = qb[:, 0:1] - pb[None, :, 0]
        dy = qb[:, 1:2] - pb[None, :, 1]
        dz = qb[:, 2:3] - pb[None, :, 2]
        d = dx * dx + dy * dy + dz * dz
        j = jnp.argmin(d, axis=-1)
        oh = (iota3[None, :] == j[:, None]).astype(jnp.bfloat16)
        got = jax.lax.dot_general(
            oh, vb.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + jnp.sum(got)

    return jax.lax.fori_loop(0, nqb, one, jnp.float32(0))


print(f"backend: {jax.default_backend()}  Q=P={Q}  block={BLOCK}")
clock("lax.sort 1 key", sort1, pts_d)
clock("lax.sort 1 key + 2 payload", sort3, pts_d)
clock("lax.sort 1 key + 5 payload", sort6, pts_d, vals_d)
clock("windowed dist: K=128 HIGHEST matmul", win_matmul, qs_d, pts_d)
clock("windowed dist: elementwise broadcast", win_elemwise, qs_d, pts_d)
clock("windowed dist + onehot fetch (bf16)", fetch_onehot, qs_d, pts_d, vals_d)
