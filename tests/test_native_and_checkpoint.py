"""Native loader parity with the PIL path, and checkpoint/resume."""

import os

import numpy as np
import pytest

from dynfu_tpu.io import meshio
from dynfu_tpu.io.datasets import generate_synthetic
from dynfu_tpu.io.native_loader import DepthLoader, available
from dynfu_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_native_loader_matches_pil(tmp_path):
    root = generate_synthetic(str(tmp_path / "seq"), frames=4, h=64, w=80)
    depths, _ = meshio.list_dataset(root)
    ldr = DepthLoader(depths, queue_depth=2, threads=2)
    try:
        for i in range(len(ldr)):
            ref = meshio.load_depth_png(depths[i])
            np.testing.assert_array_equal(ldr[i], ref)
    finally:
        ldr.close()


@pytest.mark.skipif(not available(), reason="no native toolchain")
def test_native_loader_is_native(tmp_path):
    root = generate_synthetic(str(tmp_path / "seq"), frames=1, h=32, w=40)
    depths, _ = meshio.list_dataset(root)
    ldr = DepthLoader(depths)
    assert ldr.native
    ldr.close()


def _tiny_engine():

    from dynfu_tpu.core.camera import Intr
    from dynfu_tpu.engine.dynfusion import DynFusion
    from dynfu_tpu.engine.params import DynFuParams, KinFuParams
    from dynfu_tpu.io.datasets import sphere_depth

    params = DynFuParams(
        kinfu=KinFuParams(
            rows=48, cols=64, intr=Intr(70.0, 70.0, 31.5, 23.5),
            volume_dims=(32, 32, 32), volume_size=(1.0, 1.0, 1.0),
            volume_pose_t=(-0.5, -0.5, 0.25),
        ),
        max_nodes=64, max_vertices=3 * 1024, max_mc_voxels=1 << 11,
        max_new_nodes=32, node_sample_step=32,
    )
    df = DynFusion(params)
    depth = sphere_depth((0.0, 0.0, 0.6), 0.2, 48, 64, 70.0, 70.0, 31.5, 23.5)
    return df, depth


def test_checkpoint_roundtrip(tmp_path):
    df, depth = _tiny_engine()
    df(depth)
    df(depth)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(df, path)

    df2, depth2 = _tiny_engine()
    load_checkpoint(df2, path)
    assert df2.frame_counter == df.frame_counter
    np.testing.assert_array_equal(np.asarray(df2.vol.tsdf), np.asarray(df.vol.tsdf))
    np.testing.assert_array_equal(
        np.asarray(df2.warpfield.pos), np.asarray(df.warpfield.pos)
    )
    # resumed engine continues identically to the uninterrupted one
    df(depth)
    df2(depth)
    a, _ = df.warped_cloud()
    b, _ = df2.warped_cloud()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
