"""Checkpoint / resume of the full reconstruction state.

The reference has NO checkpointing (SURVEY §5): its only persistent outputs
are per-frame .pcd/.vtk artifacts, and any failure restarts reconstruction
from scratch (KinFu::reset). Because this engine's entire state is a
functional pytree — {TSDF volume, weights, pose history, warp-field nodes,
canonical frame, frame index} — checkpointing is a single serialization, and
a multi-host job can resume mid-sequence after preemption.

Format: one .npz per checkpoint (atomic rename), no extra dependencies.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:  # pragma: no cover
    from dynfu_tpu.engine.dynfusion import DynFusion


def save_checkpoint(engine: "DynFusion", path: str) -> None:
    """Serialize engine state to `path` (.npz, atomically)."""
    from dynfu_tpu.engine.dynfusion import Frame

    arrays = {
        "tsdf": np.asarray(engine.vol.tsdf),
        "weight": np.asarray(engine.vol.weight),
        "pose_r": np.asarray(engine.vol.pose_r),
        "pose_t": np.asarray(engine.vol.pose_t),
        "poses_r": np.stack([np.asarray(r) for r, _ in engine.poses]),
        "poses_t": np.stack([np.asarray(t) for _, t in engine.poses]),
    }
    meta = {"frame_counter": engine.frame_counter, "has_warpfield": False}
    if engine.warpfield is not None:
        wf = engine.warpfield
        arrays.update(
            wf_pos=np.asarray(wf.pos), wf_dqs=np.asarray(wf.dqs),
            wf_w=np.asarray(wf.w), wf_mask=np.asarray(wf.mask),
            wf_count=np.asarray(wf.count),
        )
        meta["has_warpfield"] = True
    for name, frame in (("canonical", engine.canonical),
                        ("canonical_warped", engine.canonical_warped)):
        if frame is not None:
            arrays[f"{name}_v"] = np.asarray(frame.vertices)
            arrays[f"{name}_n"] = np.asarray(frame.normals)
            arrays[f"{name}_m"] = np.asarray(frame.mask)
            meta[f"{name}_idx"] = int(frame.idx)
    if getattr(engine, "soup_inverse", None) is not None:
        arrays["soup_inverse"] = np.asarray(engine.soup_inverse)
        arrays["soup_mask"] = np.asarray(engine.soup_mask)
        arrays["canonical_mult"] = np.asarray(engine.canonical_mult)
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)

    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    # NB suffix must end in .npz or numpy appends one, breaking the rename
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(engine: "DynFusion", path: str) -> "DynFusion":
    """Restore engine state from `path` in place; returns the engine."""
    import jax.numpy as jnp

    from dynfu_tpu.engine.dynfusion import Frame
    from dynfu_tpu.warp.field import WarpField

    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())

    engine.vol = engine.vol._replace(
        tsdf=jnp.asarray(z["tsdf"]),
        weight=jnp.asarray(z["weight"]),
        pose_r=jnp.asarray(z["pose_r"]),
        pose_t=jnp.asarray(z["pose_t"]),
    )
    # Poses are HOST numpy pairs (kinfu reset invariant): pose composition
    # must run in host f32, not on-device bf16 matmul, and the per-frame
    # dispatch checks must not pay a device readback.
    engine.poses = [
        (np.asarray(r, np.float32), np.asarray(t, np.float32))
        for r, t in zip(z["poses_r"], z["poses_t"])
    ]
    engine.frame_counter = int(meta["frame_counter"])
    if meta["has_warpfield"]:
        engine.warpfield = WarpField(
            pos=jnp.asarray(z["wf_pos"]), dqs=jnp.asarray(z["wf_dqs"]),
            w=jnp.asarray(z["wf_w"]), mask=jnp.asarray(z["wf_mask"]),
            count=jnp.asarray(z["wf_count"]),
        )
    for name in ("canonical", "canonical_warped"):
        if f"{name}_v" in z:
            setattr(engine, name, Frame(
                idx=int(meta[f"{name}_idx"]),
                vertices=jnp.asarray(z[f"{name}_v"]),
                normals=jnp.asarray(z[f"{name}_n"]),
                mask=jnp.asarray(z[f"{name}_m"]),
            ))
    if "soup_inverse" in z:
        engine.soup_inverse = jnp.asarray(z["soup_inverse"])
        engine.soup_mask = jnp.asarray(z["soup_mask"])
        engine.canonical_mult = jnp.asarray(z["canonical_mult"])
    else:
        engine.soup_inverse = None
        engine.soup_mask = None
        engine.canonical_mult = None

    # derived state: fixed-mode engines track against a raycast reference
    # pyramid, which is a pure function of the restored volume + pose
    if not getattr(engine, "strict_parity", True) and engine.frame_counter > 0:
        from dynfu_tpu.ops import imgproc

        pts, nrm = engine._raycast(engine.poses[-1])
        prev = [(pts, nrm)]
        for _ in range(1, engine.levels):
            prev.append(imgproc.resize_points_normals(*prev[-1]))
        engine.prev_pyr = prev
    return engine
