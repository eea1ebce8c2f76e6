"""Pallas TPU kernel: bounded-window stencil fetch in VMEM.

The rigid ICP's association fetch (rigid/icp.py `_fetch_stencil`) computes
out[y, x] = img[vi[y, x], ui[y, x]] for flows bounded by a per-level
radius, as (2R+1)^2 shifted whole-image selects. As XLA ops each shifted
select streams the (H, W, 6) image through HBM — ~(2R+1)^2 x 7.4 MB per
ICP iteration at level 0, and the 19-iteration schedule measured ~32 ms
of the fused rigid frame (round-5 knockout profile).

Here the image lives in VMEM for the whole select chain: one grid step
per channel loads its (H, W) plane once, applies the (2R+1)^2 rolls +
selects on-chip, and writes the fetched plane once — HBM traffic drops
from ~(2R+1)^2 reads to exactly one read + one write of the image.

Semantics match `_fetch_stencil` exactly: NaN where no offset in
[-R, R]^2 matches the pixel's (vi - y, ui - x) flow; the roll is circular
but a wrapped row/column can never satisfy its offset's equality test
(vi/ui are clipped to the image by the caller), so wrap pixels are never
selected — same argument as the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stencil_kernel(vi_ref, ui_ref, img_ref, out_ref, *, radius: int):
    vi = vi_ref[:]
    ui = ui_ref[:]
    H, W = vi.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    dy = vi - ys
    dx = ui - xs
    img = img_ref[0]  # (H, W) channel plane, resident in VMEM
    acc = jnp.full((H, W), jnp.nan, jnp.float32)
    for oy in range(-radius, radius + 1):
        ry = pltpu.roll(img, (-oy) % H, 0)  # out[y] = img[y + oy]
        for ox in range(-radius, radius + 1):
            sh = pltpu.roll(ry, (-ox) % W, 1)
            sel = (dy == oy) & (dx == ox)
            acc = jnp.where(sel, sh, acc)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def fetch_stencil_tpu(
    img: jnp.ndarray,  # (H, W, C) f32
    vi: jnp.ndarray,  # (H, W) i32, clipped to [0, H)
    ui: jnp.ndarray,  # (H, W) i32, clipped to [0, W)
    radius: int,
    interpret: bool = False,
) -> jnp.ndarray:
    H, W, C = img.shape
    imgc = jnp.transpose(img.astype(jnp.float32), (2, 0, 1))  # channel-major
    out = pl.pallas_call(
        functools.partial(_stencil_kernel, radius=radius),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((H, W), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        # the unrolled (2R+1)^2 roll chain's temporaries exceed the 16 MB
        # default scoped-vmem budget at 640x480; the physical VMEM is
        # larger — raise the scoped limit instead of tiling H (y-rolls
        # across tile boundaries would need halo plumbing)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(vi, ui, imgc)
    return jnp.transpose(out, (1, 2, 0))


def available() -> bool:
    """Pallas path is for real TPU execution; CPU tests keep the XLA
    formulation. Gated off by DYNFU_NO_PALLAS=1 (A/B benching) and inside
    multi-device traces (ops/pallas_config.no_pallas — GSPMD cannot
    partition a pallas_call)."""
    from dynfu_tpu.ops.pallas_config import pallas_enabled

    return pallas_enabled()
