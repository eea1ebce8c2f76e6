"""The REAL DynFusion engine frame under a device mesh.

`dist/spmd.py` shards a reduced demo pipeline (raycast-sourced vertices).
This module puts the engine's actual per-frame programs — including
marching cubes, windowed 1-NN correspondence, Gauss-Newton solve and node
insertion (`engine/dynfusion._nonrigid_frame`), and the persistent-canonical
fusion frame (`_fusion_frame`) — under a `jax.sharding.Mesh`, the multi-chip
mandate of SURVEY §2/§7 that has no counterpart in the single-GPU reference.

Sharding layout (1-D mesh, axis "x"):

* TSDF volume block-partitioned along its x axis: P('x', None, None).
  integrate/raycast/marching-cubes stencils that cross block faces (the
  ±1-voxel cube corners of MC, raycast's interpolation taps) are handled by
  the XLA SPMD partitioner, which materializes exactly the halo exchanges a
  hand-written ppermute would: a shifted-slice read like F[1:, ...] on a
  blocked array lowers to a CollectivePermute of the one boundary plane
  over ICI. This is the TPU-first formulation of the reference-era
  "halo exchange" — declare the layout, let the compiler place the
  collectives — and `tests/test_dist.py::test_sharded_engine_frame_matches`
  proves the stitched result is bit-identical to one device.
* Vertex-indexed buffers (canonical frame, MC output) row-sharded: P('x').
  The dense-strip GN normal equations then assemble per-shard partials that
  GSPMD reduces with one psum (the Schur-style reduction).
* Node state (WarpField) replicated — it is small (<= 1k nodes) and every
  shard's vertices may reference any node.

Provenance: the reference is single-process single-GPU (SURVEY §2 — no
DP/TP/PP, transport is cudaMemcpy only); this layer is the capability the
TPU build adds on top.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dynfu_tpu.engine import dynfusion as dyn
from dynfu_tpu.ops import pallas_config
from dynfu_tpu.engine.params import DynFuParams
from dynfu_tpu.solver import gn
from dynfu_tpu.solver import se3 as se3_solver
from dynfu_tpu.volume import tsdf as tv
from dynfu_tpu.warp import field as wfield


def _shardings(mesh: Mesh):
    blocked = NamedSharding(mesh, P("x", None, None))
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("x"))
    vol_s = tv.TsdfVolume(tsdf=blocked, weight=blocked, pose_r=repl,
                          pose_t=repl)
    wf_s = jax.tree_util.tree_map(
        lambda _: repl, wfield.WarpField(pos=0, dqs=0, w=0, mask=0, count=0))
    return blocked, repl, rows, vol_s, wf_s


def _kernel_path(mesh: Mesh, dp: DynFuParams,
                 interpret: bool) -> dyn.ShardKernels:
    """The shard_map Pallas sections for the three hottest vertex stages,
    composable INSIDE the sharded frame's jit (the missing piece round 3
    left: the standalone wrappers in dist/shard_{warp,corr,gram}.py were
    tested but never ran in the sharded frame, so multi-chip paid the
    slower XLA formulations).

    * warp — embarrassingly parallel over row-sharded vertices, node state
      replicated: each device runs the fused kernel (ops/warp_pallas.py),
      zero collectives.
    * correspondence — queries row-sharded, warped point set replicated
      (GSPMD inserts the one all-gather where the warp's row-sharded output
      meets the replicated in_spec): each device runs the FULL tiered
      x-window 1-NN incl. the graph-payload fetch. Per-query independence
      makes the stitched result exactly the single-chip answer whenever the
      per-shard tier capacities hold (dp capacities apply PER SHARD here —
      strictly more rescue budget than one chip).
    * Gram — per-device fused VMEM assembly over the row-sharded data rows
      + ONE psum of (A, b): the Schur-style reduction over ICI.

    `interpret` selects the Pallas interpreter (CPU virtual-mesh
    validation) for warp/Gram; the correspondence sweep falls back to the
    XLA formulation on CPU (the interpreter is prohibitively slow at sweep
    sizes) — the kernels themselves are certified against the XLA
    formulations by their single-chip tests.
    """
    from jax import shard_map

    from dynfu_tpu.ops import knn, warp_pallas
    from dynfu_tpu.solver import gram_pallas

    rows, repl = P("x"), P()

    def warp_fn(wf, cv, cn):
        def local(cv, cn, pos, dqs, w, mask):
            wp, wn, _, _ = warp_pallas.warp_fused_tpu(
                cv, cn, pos, dqs, w, mask, k=wfield.KNN, blend="dqb",
                tq=1024, interpret=interpret)
            return wp, wn

        fn = shard_map(local, mesh=mesh,
                       in_specs=(rows, rows, repl, repl, repl, repl),
                       out_specs=(rows, rows), check_vma=False)
        return fn(cv, cn, wf.pos, wf.dqs, wf.w, wf.mask)

    def corr_fn(live_v, wv, warped_mask, live_m, wf):
        def local(q, qm, pts, pm, pos, dqs, w, nmask, count):
            wf_local = wfield.WarpField(pos=pos, dqs=dqs, w=w, mask=nmask,
                                        count=count)
            # re-enable the Pallas dispatch inside the per-device body (the
            # enclosing GSPMD trace runs under no_pallas); on CPU the
            # backend check keeps the XLA sweep
            with pallas_config.force_pallas():
                return knn.nn1_gather_xwindow(
                    q, pts, None, pm, qm,
                    rescue=dp.corr_rescue, escalate=dp.corr_escalate,
                    window_blocks=dp.corr_window_blocks,
                    values_fn=dyn._graph_payload(wf_local, dp))

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(rows, rows, repl, repl, repl, repl, repl, repl, repl),
            out_specs=(rows, rows), check_vma=False)
        return fn(live_v, live_m, wv, warped_mask,
                  wf.pos, wf.dqs, wf.w, wf.mask, wf.count)

    def gram_fn(data_idx, data_w, s2, delta, D):
        def local(di, dw, s2_, dl):
            A, b = gram_pallas.data_normal_tpu(di, dw, s2_, dl, D,
                                               interpret=interpret)
            return jax.lax.psum(A, "x"), jax.lax.psum(b, "x")

        fn = shard_map(local, mesh=mesh, in_specs=(rows, rows, rows, rows),
                       out_specs=(repl, repl), check_vma=False)
        return fn(data_idx, data_w, s2, delta)

    return dyn.ShardKernels(warp_fn=warp_fn, corr_fn=corr_fn,
                            gram_fn=gram_fn)


def sharded_engine_frame(
    mesh: Mesh,
    dp: DynFuParams,
    intr,
    config: tv.TsdfConfig,
    strict_parity: bool = True,
    integrate_mode: str = "separable",
    with_mult: bool = False,
    kernel_path: bool = False,
    interpret: bool | None = None,
):
    """The engine's `_nonrigid_frame` jitted over `mesh`.

    Returns step(vol, wf, canonical_v, canonical_n, canonical_m, depth_mm,
    pose) with the same signature/outputs as the single-chip program:
    (vol, wf, wv, wn, live_v, live_n, live_m, mesh_verts, n_verts, stats).
    With `with_mult=True` the step takes a trailing canonical_mult arg
    (soup multiplicities for insertion centroids; the multi-chip driver
    passes it, matching the single-chip engine).

    Inputs must be placed accordingly (`place_engine_state` does it); the
    outputs keep the volume blocked and the vertex buffers row-sharded so
    frames chain without host round-trips.
    """
    blocked, repl, rows, vol_s, wf_s = _shardings(mesh)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = _kernel_path(mesh, dp, interpret) if kernel_path else None

    def step(vol, wf, canonical_v, canonical_n, canonical_m, depth_mm, pose,
             *mult):
        # GSPMD cannot partition a pallas_call over sharded operands; the
        # sharded trace forces the XLA formulations (which partition
        # cleanly and are what test_dist certifies vs single-device).
        # With kernel_path=True the three hottest vertex stages instead run
        # their fused Pallas kernels per device via shard_map sections
        # (`_kernel_path`), re-enabling the dispatch inside their bodies.
        # the UNJITTED body: the inner jit's trace cache does not key on
        # the pallas flag, so going through it could replay a
        # pallas-containing jaxpr traced for single-chip use
        with pallas_config.no_pallas():
            return dyn._nonrigid_frame.__wrapped__(
                vol, wf, canonical_v, canonical_n, canonical_m, depth_mm,
                pose, dp=dp, intr=intr, config=config,
                strict_parity=strict_parity,
                integrate_mode=integrate_mode,
                canonical_mult=mult[0] if mult else None,
                kernels=kern,
            )

    solve_proto = (se3_solver.Se3Stats(0, 0, 0, 0)
                   if (dp.solver_rotations and not strict_parity)
                   else gn.SolveStats(0, 0, 0, 0))
    stats_s = dyn.FrameStats(
        solve=jax.tree_util.tree_map(lambda _: repl, solve_proto),
        mc_dropped=repl, corr_dropped=repl,
    )
    out_s = (vol_s, wf_s, rows, rows, rows, rows, rows, rows, repl, stats_s)
    in_s = (vol_s, wf_s, rows, rows, rows, repl, (repl, repl))
    if with_mult:
        in_s = in_s + (rows,)
    return jax.jit(step, in_shardings=in_s, out_shardings=out_s)


def sharded_fusion_frame(mesh: Mesh, dp: DynFuParams, intr,
                         config: tv.TsdfConfig,
                         solve_enabled: bool = True):
    """The persistent-canonical `_fusion_frame` (mode="fusion") over `mesh`:
    projective correspondence + GN solve + warped-back band integration +
    corner-convention MC + node insertion, volume blocked / vertices
    row-sharded / nodes replicated.

    `solve_enabled=False` builds the warm-up variant (integrate without a
    solve — DynFuParams.fusion_warmup_frames); a multi-chip driver that
    honors warm-up builds both step programs and switches after
    `fusion_warmup_frames` frames, like the single-chip engine does."""
    blocked, repl, rows, vol_s, wf_s = _shardings(mesh)

    def step(vol, wf, canonical_v, canonical_n, canonical_m, depth_mm, pose):
        with pallas_config.no_pallas():
            return dyn._fusion_frame.__wrapped__(
                vol, wf, canonical_v, canonical_n, canonical_m, depth_mm,
                pose, dp=dp, intr=intr, config=config,
                solve_enabled=solve_enabled,
            )

    solve_proto = (se3_solver.Se3Stats(0, 0, 0, 0) if dp.solver_rotations
                   else gn.SolveStats(0, 0, 0, 0))
    stats_s = dyn.FusionFrameStats(
        solve=jax.tree_util.tree_map(lambda _: repl, solve_proto),
        mc_dropped=repl, corr_dropped=repl,
        band=jax.tree_util.tree_map(
            lambda _: repl, dyn.vfusion.FusionStats(0, 0, 0)),
    )
    out_s = (vol_s, wf_s, rows, rows, rows, repl, rows, rows, stats_s)
    in_s = (vol_s, wf_s, rows, rows, rows, repl, (repl, repl))
    return jax.jit(step, in_shardings=in_s, out_shardings=out_s)


def sharding_overhead(n_devices: int = 8, iters: int = 5) -> dict:
    """Measure the sharded engine frame's wall time on an n-device mesh vs
    1 device (SURVEY §5 scaling-efficiency measurement). On the virtual CPU
    mesh this quantifies SPMD partitioning/collective overhead only — all
    "devices" share the host — so read it as an upper bound on the
    communication fraction, not as hardware scaling."""
    import time

    from dynfu_tpu.dist.spmd import make_mesh
    from dynfu_tpu.engine.dynfusion import DynFusion
    from dynfu_tpu.engine.params import DynFuParams, KinFuParams
    from dynfu_tpu.io.datasets import sphere_depth
    from dynfu_tpu.core.camera import Intr
    from dynfu_tpu.utils.timers import sync

    rows, cols = 120, 160
    intr = Intr(131.25, 131.25, cols / 2 - 0.5, rows / 2 - 0.5)
    dim = max(4 * n_devices, 64)
    params = DynFuParams(
        kinfu=KinFuParams(rows=rows, cols=cols, intr=intr,
                          volume_dims=(dim,) * 3),
        max_vertices=1 << 13, max_mc_voxels=1 << 11,
        max_nodes=128, max_new_nodes=64,
    )
    engine = DynFusion(params)
    d0 = sphere_depth((0.0, 0.0, 1.5), 0.5, rows, cols,
                      intr.fx, intr.fy, intr.cx, intr.cy)
    d1 = sphere_depth((0.01, 0.0, 1.5), 0.5, rows, cols,
                      intr.fx, intr.fy, intr.cx, intr.cy)
    engine(d0)
    dp, cfg = engine.dynfu_params, engine.tsdf_config
    c, pose = engine.canonical, engine.poses[-1]
    args = (engine.vol, engine.warpfield, c.vertices, c.normals, c.mask,
            jnp.asarray(d1, jnp.int32), pose)

    out = {}
    for n in (1, n_devices):
        mesh = make_mesh(n)
        step = sharded_engine_frame(mesh, dp, intr, cfg, strict_parity=True)
        placed = place_engine_state(mesh, *args)
        r = step(*placed)  # compile + warm
        sync(r[8])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = step(*placed)
        sync(r[8])
        out[f"ms_{n}dev"] = round(
            (time.perf_counter() - t0) / iters * 1e3, 2)
    out["overhead_x"] = round(out[f"ms_{n_devices}dev"] / out["ms_1dev"], 3)
    return out


def place_engine_state(mesh: Mesh, vol, wf, canonical_v, canonical_n,
                       canonical_m, depth_mm, pose):
    """device_put engine state onto the mesh with the layout the sharded
    frame programs expect."""
    blocked, repl, rows, _, _ = _shardings(mesh)
    put = jax.device_put
    vol = tv.TsdfVolume(put(vol.tsdf, blocked), put(vol.weight, blocked),
                        put(vol.pose_r, repl), put(vol.pose_t, repl))
    wf = jax.tree_util.tree_map(lambda x: put(x, repl), wf)
    return (vol, wf, put(canonical_v, rows), put(canonical_n, rows),
            put(canonical_m, rows), put(depth_mm, repl),
            jax.tree_util.tree_map(lambda x: put(x, repl), pose))
