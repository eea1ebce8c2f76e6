"""Pallas TPU kernel: data-term normal-equation assembly for the GN solver.

Computes A = W^T diag(s2) W (D, D) and b = W^T (s2 * delta) (D, 3) from the
K-sparse data-weight rows (gn._dense_data_normal's math) in one fused pass:

* the XLA formulation materializes a dense (chunk, D) one-hot strip in HBM
  per chunk and re-reads it for two HIGH-precision matmuls (~2-3 GB of
  strip traffic at the 512-cube workload, on top of the matmul passes);
* this kernel builds the strip in BOTH MXU-native layouts directly in VMEM
  — Ws (D, TQ) with nodes on sublanes for the left operand, W (TQ, D) with
  nodes on lanes for the right — so the Gram update is a single
  (D,TQ)x(TQ,D) contraction per tile with no transposes and no HBM strips.

Precision matches the XLA path's HIGH (3-pass bf16): both operands are
split hi/lo in bf16 and combined as hi@hi + hi@lo + lo@hi, f32-faithful for
weight-scale (<=1) values. The reference accumulates the same sums in plain
f32 atomics (Opt's hypergraph reduction, opt_solver.cpp:56-105).

Provenance: replaces the Opt/Terra JtJ assembly of the reference
(include/dynfu/utils/terra/energy.t, src/dynfu/utils/opt_solver.cpp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split_bf16(x):
    """hi/lo bf16 split of an f32 operand (two 8-bit mantissa halves)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_hi, a_lo, b, dn):
    """HIGH-class contraction: 3-pass bf16 (hi@hi + hi@lo + lo@hi) against
    a pre-split left operand; the right operand is split here."""
    f32 = jnp.float32
    b_hi, b_lo = _split_bf16(b)
    acc = jax.lax.dot_general(a_hi, b_hi, dn, preferred_element_type=f32)
    acc = acc + jax.lax.dot_general(a_hi, b_lo, dn,
                                    preferred_element_type=f32)
    return acc + jax.lax.dot_general(a_lo, b_hi, dn,
                                     preferred_element_type=f32)


def _gram_kernel(idxT_ref, wsT_ref, wT_ref, dT_ref, a_ref, b_ref, *, k, D):
    """One TQ-vertex tile: accumulate A += Ws @ W^T and b += Ws @ delta,
    everything in the single nodes-on-sublanes (D, TQ) layout (the rhs
    contraction rides the MXU's transposed-operand path). wsT already
    carries the s2 scaling (folded outside — one elementwise multiply on
    (K, N) is cheaper than shipping s2 separately)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)
        b_ref[:] = jnp.zeros_like(b_ref)

    TQ = idxT_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (D, TQ), 0)
    ws = jnp.zeros((D, TQ), jnp.float32)  # s2-scaled
    w = jnp.zeros((D, TQ), jnp.float32)  # unscaled
    for r in range(k):
        hit = rows == idxT_ref[r:r + 1, :]
        ws = ws + jnp.where(hit, wsT_ref[r:r + 1, :], 0.0)
        w = w + jnp.where(hit, wT_ref[r:r + 1, :], 0.0)

    dn_t = (((1,), (1,)), ((), ()))  # contract the TQ axis of both
    a_hi, a_lo = _split_bf16(ws)
    a_ref[:] = a_ref[:] + _dot3(a_hi, a_lo, w, dn_t)
    b_ref[:] = b_ref[:] + _dot3(a_hi, a_lo, dT_ref[:], dn_t)


@functools.partial(jax.jit, static_argnames=("D", "tq", "interpret"))
def data_normal_tpu(
    data_idx: jnp.ndarray,  # (N, K) int32 neighbor node ids
    data_w: jnp.ndarray,  # (N, K) f32 weights (invalid slots = 0)
    s2: jnp.ndarray,  # (N,) f32 per-vertex robust weight
    delta: jnp.ndarray,  # (N, 3) f32 data constants
    D: int,  # node capacity (A is (D, D))
    tq: int = 256,
    interpret: bool = False,
):
    """(A (D, D) f32, b (D, 3) f32) — drop-in for gn._dense_data_normal."""
    N, K = data_idx.shape
    Np = _round_up(max(N, tq), tq)
    Dp = _round_up(D, 128)

    idx = jnp.full((Np, K), Dp, jnp.int32).at[:N].set(data_idx)
    w = jnp.zeros((Np, K), jnp.float32).at[:N].set(data_w)
    ws = w * jnp.pad(s2, (0, Np - N))[:, None]
    d = jnp.zeros((Np, 8), jnp.float32).at[:N, :3].set(delta)

    grid = (Np // tq,)
    A, b = pl.pallas_call(
        functools.partial(_gram_kernel, k=K, D=Dp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Dp, Dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((Dp, 8), jnp.float32),
        ],
        interpret=interpret,
    )(idx.T, ws.T, w.T, d.T)
    return A[:D, :D], b[:D, :3]


_MONO_GROUPS = 5  # 10 monomial Grams in 5 pairs: (D, D) f32 accumulators
#                    must stay VMEM-resident per grid step, so the grid's
#                    second axis walks PAIRS (2 x 4 MB at D=1024 + strips
#                    fits the ~16 MB budget)


def _mono_gram_kernel(idxT_ref, wsT_ref, yT_ref, dT_ref, a_ref, rhs_ref,
                      *, k, D):
    """One (vertex-tile, monomial-pair) grid step: build the s2-scaled
    weight strip in the nodes-on-sublanes layout and contract it against
    its two monomial-scaled copies. Monomial order matches
    se3._monomial_grams: [1, yx, yy, yz, yx2, yxyy, yxyz, yy2, yyyz, yz2],
    walked as pairs (2g, 2g+1)."""
    g = pl.program_id(0)  # SLOW axis: the (2, D, D) accumulator block
    i = pl.program_id(1)  # stays VMEM-resident across the vertex sweep

    @pl.when((i == 0) & (g == 0))
    def _():
        rhs_ref[:] = jnp.zeros_like(rhs_ref)

    @pl.when(i == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    TQ = idxT_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (D, TQ), 0)
    ws = jnp.zeros((D, TQ), jnp.float32)
    for r in range(k):
        hit = rows == idxT_ref[r:r + 1, :]
        ws = ws + jnp.where(hit, wsT_ref[r:r + 1, :], 0.0)

    yx = yT_ref[0:1, :]
    yy = yT_ref[1:2, :]
    yz = yT_ref[2:3, :]
    one = jnp.ones_like(yx)
    monos = [one, yx, yy, yz, yx * yx, yx * yy, yx * yz, yy * yy,
             yy * yz, yz * yz]

    dn_t = (((1,), (1,)), ((), ()))
    a_hi, a_lo = _split_bf16(ws)
    for j in range(2):
        m = g * 2 + j
        sel = jnp.zeros_like(one)
        for mm in range(10):  # static select of this step's monomial
            sel = jnp.where(m == mm, monos[mm], sel)
        a_ref[j] = a_ref[j] + _dot3(a_hi, a_lo, ws * sel, dn_t)

    @pl.when(g == 0)
    def _():
        # rhs sums once per vertex tile: Ws @ [sqrt(s2) delta | sqrt(s2)
        # y x delta]^T (the sqrt(s2) on the d side completes the s2 fold)
        rhs_ref[:] = rhs_ref[:] + _dot3(a_hi, a_lo, dT_ref[:], dn_t)


@functools.partial(jax.jit, static_argnames=("D", "tq", "interpret"))
def monomial_grams_tpu(
    data_idx: jnp.ndarray,  # (N, K) int32 neighbor node ids
    data_w: jnp.ndarray,  # (N, K) f32 weights (invalid slots = 0)
    s2: jnp.ndarray,  # (N,) f32 per-vertex robust weight
    y: jnp.ndarray,  # (N, 3) f32 current warped positions
    delta: jnp.ndarray,  # (N, 3) f32 data constants
    D: int,
    tq: int = 256,
    interpret: bool = False,
):
    """(B (10, D, D), Bu (D, 3), Bw (D, 3)) — drop-in for
    se3._monomial_grams, strips built in VMEM (the XLA formulation
    materializes a (chunk, D) strip in HBM and re-reads it for every
    monomial matmul). The sqrt(s2) trick folds the per-vertex robust
    weight into ONE strip so B_m = (sqrt(s2) W)^T diag(m) (sqrt(s2) W)
    and the rhs completes the fold on the delta side."""
    N, K = data_idx.shape
    Np = _round_up(max(N, tq), tq)
    Dp = _round_up(D, 128)

    idx = jnp.full((Np, K), Dp, jnp.int32).at[:N].set(data_idx)
    w = jnp.zeros((Np, K), jnp.float32).at[:N].set(data_w)
    rs2 = jnp.sqrt(jnp.maximum(jnp.pad(s2, (0, Np - N)), 0.0))
    ws = w * rs2[:, None]
    yp = jnp.zeros((Np, 8), jnp.float32).at[:N, :3].set(y)
    dp = jnp.zeros((Np, 8), jnp.float32)
    dp = dp.at[:N, :3].set(delta).at[:N, 3:6].set(jnp.cross(y, delta))
    dp = dp * rs2[:, None]

    grid = (_MONO_GROUPS, Np // tq)
    B, rhs = pl.pallas_call(
        functools.partial(_mono_gram_kernel, k=K, D=Dp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, tq), lambda g, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tq), lambda g, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tq), lambda g, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tq), lambda g, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, Dp, Dp), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, 8), lambda g, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((10, Dp, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((Dp, 8), jnp.float32)],
        interpret=interpret,
    )(idx.T, ws.T, yp.T, dp.T)
    return B[:, :D, :D], rhs[:D, :3], rhs[:D, 3:6]


def available() -> bool:
    """Pallas path is for real TPU execution; CPU tests keep the XLA
    formulation. Gated off by DYNFU_NO_PALLAS=1 (A/B benching) and inside
    multi-device traces (ops/pallas_config.no_pallas — GSPMD cannot
    partition a pallas_call)."""
    from dynfu_tpu.ops.pallas_config import pallas_enabled

    return pallas_enabled()
