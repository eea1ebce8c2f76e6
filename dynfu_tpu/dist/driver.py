"""Multi-chip engine driver: frame-0 bootstrap + sharded frame chaining.

The reference is single-GPU (SURVEY §2) — this layer is the repo's
distributed differentiator. `ShardedDynFusion` wraps the single-chip
`DynFusion` host orchestration around the mesh-jitted frame programs
(dist/engine_spmd.py):

* frame 0 bootstraps through the plain engine (marching cubes, canonical
  dedup, node sampling — one-time host work), then the state pytree is
  `device_put` onto the mesh (volume blocked along x, vertex buffers
  row-sharded, nodes replicated);
* frames k>=1 run the sharded step with all state device-resident —
  volumes and vertex buffers never leave the mesh between frames;
* outputs (warped_cloud, canonical, stats) and checkpoints read back
  through the same engine attributes, so `utils.checkpoint` works
  unchanged (a resumed driver re-places the restored state on the mesh).

Launch: single-process multi-device works out of the box; multi-HOST runs
call `dist.runtime.init_distributed()` first (the CLI does) so
`jax.devices()` spans the slice and the same mesh code covers it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynfu_tpu.dist.engine_spmd import (place_engine_state,
                                        sharded_engine_frame,
                                        sharded_fusion_frame)
from dynfu_tpu.dist.spmd import make_mesh
from dynfu_tpu.engine.dynfusion import DynFusion, Frame
from dynfu_tpu.engine.params import DynFuParams


class ShardedDynFusion:
    """DynFusion over an N-device mesh. Same call surface as the engine:
    `__call__(depth_mm) -> bool`, `warped_cloud()`, `canonical`,
    `last_frame_stats`, `poses`."""

    def __init__(self, params: Optional[DynFuParams] = None,
                 mode: str = "parity", n_devices: int = 0,
                 mesh=None):
        self.engine = DynFusion(params, mode=mode)
        if mode == "fixed":
            raise NotImplementedError(
                "sharded driver supports parity and fusion modes; fixed "
                "mode's rigid-ICP pyramid chaining is single-device")
        self.mode = mode
        self.mesh = mesh if mesh is not None else make_mesh(
            n_devices or len(jax.devices()))
        self._step = None
        self._step_warmup = None
        self._state = None  # (vol, wf, canonical_v, canonical_n, canonical_m)
        self._mult = None

    # -- engine surface ------------------------------------------------------
    @property
    def frame_counter(self):
        return self.engine.frame_counter

    @property
    def poses(self):
        return self.engine.poses

    @property
    def canonical(self):
        return self.engine.canonical

    @property
    def last_frame_stats(self):
        return self.engine.last_frame_stats

    def warped_cloud(self):
        return self.engine.warped_cloud()

    def mesh(self):
        return self.engine.mesh_vertices

    def render(self, flag: int = 0):
        return self.engine.render(flag)

    def _build_steps(self):
        e = self.engine
        dp, intr, cfg = e.dynfu_params, e.params.intr, e.tsdf_config
        if self.mode == "fusion":
            self._step = sharded_fusion_frame(self.mesh, dp, intr, cfg,
                                              solve_enabled=True)
            if dp.fusion_warmup_frames > 0:
                self._step_warmup = sharded_fusion_frame(
                    self.mesh, dp, intr, cfg, solve_enabled=False)
        else:
            self._step = sharded_engine_frame(
                self.mesh, dp, intr, cfg, strict_parity=True,
                with_mult=self._mult is not None)

    def _place(self):
        """device_put the engine's current state onto the mesh."""
        e = self.engine
        c = e.canonical
        placed = place_engine_state(
            self.mesh, e.vol, e.warpfield, c.vertices, c.normals, c.mask,
            jnp.zeros((e.params.rows, e.params.cols), jnp.int32),
            e.poses[-1])
        self._state = placed[:5]
        if self.mode != "fusion" and e.canonical_mult is not None:
            from dynfu_tpu.dist.engine_spmd import _shardings

            _, _, rows, _, _ = _shardings(self.mesh)
            self._mult = jax.device_put(e.canonical_mult, rows)

    def __call__(self, depth_mm) -> bool:
        e = self.engine
        if e.frame_counter == 0:
            ok = e(depth_mm)  # single-device bootstrap (host dedup etc.)
            self._place()
            self._build_steps()
            return ok

        from dynfu_tpu.dist.engine_spmd import _shardings

        _, repl, _, _, _ = _shardings(self.mesh)
        depth = jax.device_put(jnp.asarray(depth_mm, jnp.int32), repl)
        e.poses.append(e.poses[-1])  # identity increment (parity/fusion)
        pose = jax.tree_util.tree_map(lambda x: jax.device_put(
            jnp.asarray(x), repl), e.poses[-1])
        vol, wf, cv, cn, cm = self._state

        if self.mode == "fusion":
            dp = e.dynfu_params
            step = self._step
            if (self._step_warmup is not None
                    and e.frame_counter <= dp.fusion_warmup_frames):
                step = self._step_warmup
            (vol, wf, new_v, new_n, new_m, n_verts, wv2, wn2,
             e.last_frame_stats) = step(vol, wf, cv, cn, cm, depth, pose)
            self._state = (vol, wf, new_v, new_n, new_m)
            e.vol, e.warpfield = vol, wf
            e.canonical = Frame(e.frame_counter, new_v, new_n, new_m)
            e.canonical_warped = Frame(e.frame_counter, wv2, wn2, new_m)
            e.mesh_vertices = (new_v, n_verts)
        else:
            args = (vol, wf, cv, cn, cm, depth, pose)
            if self._mult is not None:
                args = args + (self._mult,)
            (vol, wf, wv, wn, live_v, live_n, live_m, mesh_verts, n_verts,
             e.last_frame_stats) = self._step(*args)
            self._state = (vol, wf, cv, cn, cm)
            e.vol, e.warpfield = vol, wf
            e.canonical_warped = Frame(e.canonical.idx, wv, wn, cm)
            e.live = Frame(e.frame_counter, live_v, live_n, live_m)
            e.mesh_vertices = (mesh_verts, n_verts)
        e.last_solve_stats = e.last_frame_stats.solve
        e.frame_counter += 1
        return True
