"""Coverage for the auxiliary subsystems: device info, distributed
bootstrap, native-loader stress, fixed-mode checkpointing."""

import numpy as np

from dynfu_tpu.utils.device import check_platform, device_count, print_short_device_info
from dynfu_tpu.dist import init_distributed, is_primary


def test_device_info(capsys):
    assert device_count() >= 8  # conftest's virtual mesh
    line = print_short_device_info()
    assert "Device 0" in line
    assert check_platform() in (True, False)


def test_distributed_bootstrap_noop_single_host(monkeypatch):
    monkeypatch.delenv("DYNFU_COORDINATOR", raising=False)
    assert init_distributed() is False
    assert is_primary() is True
    # explicit single-process config is also a no-op
    assert init_distributed("localhost:1234", num_processes=1, process_id=0) is False


def test_native_loader_stress(tmp_path):
    """Many frames through a small ring with several workers stays ordered
    and bit-exact — including threads > queue_depth, where two workers can
    wait on the SAME ring slot: the ordered slot-grant predicate
    (dynfu_loader.cpp work()) must hand the slot to the LOWER claim, or an
    unordered condvar wakeup deadlocks consumer against worker (a
    full-suite run once hung here for 20+ minutes)."""
    from dynfu_tpu.io import meshio
    from dynfu_tpu.io.datasets import generate_synthetic
    from dynfu_tpu.io.native_loader import DepthLoader

    root = generate_synthetic(str(tmp_path / "seq"), frames=12, h=40, w=56)
    depths, _ = meshio.list_dataset(root)
    want = [meshio.load_depth_png(p) for p in depths]
    for qd, th in [(3, 3), (2, 6), (1, 4)]:
        for _ in range(3):
            ldr = DepthLoader(depths, queue_depth=qd, threads=th)
            try:
                for i in range(len(ldr)):
                    np.testing.assert_array_equal(ldr[i], want[i])
            finally:
                ldr.close()


def test_checkpoint_fixed_mode(tmp_path):
    """Checkpoint/resume also round-trips the fixed-mode engine (pose
    history beyond identity)."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import scene_depth, small_dynfu_params

    from dynfu_tpu.engine.dynfusion import DynFusion
    from dynfu_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    df = DynFusion(small_dynfu_params(), strict_parity=False)
    df(scene_depth())
    df(scene_depth(cam_t=np.array([0.003, 0.0, 0.004])))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(df, path)

    df2 = DynFusion(small_dynfu_params(), strict_parity=False)
    load_checkpoint(df2, path)
    assert df2.frame_counter == df.frame_counter
    R1, t1 = df.get_camera_pose()
    R2, t2 = df2.get_camera_pose()
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(R1), np.asarray(R2))


def test_rigid_benchmark_smoke():
    """run_rigid_benchmark executes end-to-end at a consistent tiny config."""
    from dynfu_tpu.utils import benchmarks

    r = benchmarks.run_rigid_benchmark(volume_dims=64, frames=2, warmup=1,
                                       rows=96, cols=128)
    assert r["unit"] == "frames/s" and r["value"] > 0
    assert np.isfinite(r["ate_mm"])


def test_checkpoint_fixed_mode_resumes_tracking(tmp_path):
    """After resume, the fixed-mode engine keeps tracking immediately (the
    raycast reference pyramid is rebuilt from the restored volume)."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import scene_depth, small_dynfu_params

    from dynfu_tpu.engine.dynfusion import DynFusion
    from dynfu_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    df = DynFusion(small_dynfu_params(), strict_parity=False)
    df(scene_depth())
    df(scene_depth())
    path = str(tmp_path / "ck.npz")
    save_checkpoint(df, path)

    df2 = DynFusion(small_dynfu_params(), strict_parity=False)
    load_checkpoint(df2, path)
    assert df2.prev_pyr is not None and len(df2.prev_pyr) == df2.levels
    m = np.array([0.004, 0.0, 0.005])
    df2(scene_depth(cam_t=m))
    _, t = df2.get_camera_pose()
    np.testing.assert_allclose(np.asarray(t), m, atol=8e-3)


def test_print_device_info():
    from dynfu_tpu.utils.device import print_device_info

    out = print_device_info()
    assert "platform" in out and "visible devices" in out


def test_stage_benchmark_smoke():
    """run_stage_benchmark produces a timing for every pipeline stage."""
    from dynfu_tpu.utils import benchmarks

    r = benchmarks.run_stage_benchmark(volume_dims=64, iters=1,
                                       rows=96, cols=128, warmup_frames=2)
    expected = {"preprocess_dists", "clear_integrate", "marching_cubes",
                "warp_canonical", "correspondence_1nn", "gn_solve",
                "node_insertion", "fused_full_frame"}
    assert expected <= set(r["stages_ms"])
    assert all(v >= 0 for v in r["stages_ms"].values())
    assert r["n_mesh_verts"] > 0


def test_checkpoint_fusion_se3_mode_resumes(tmp_path):
    """Fusion mode + SE(3) rotations: a checkpointed engine resumes with a
    bit-identical persistent canonical volume and node state, and the
    continuation matches an uninterrupted run frame for frame."""
    import dataclasses
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import (CENTER, RADIUS, small_dynfu_params,
                               sphere_depth)

    from dynfu_tpu.engine.dynfusion import DynFusion
    from dynfu_tpu.utils import checkpoint

    params = dataclasses.replace(small_dynfu_params(),
                                 solver_rotations=True, se3_relinearize=2)
    seq = [sphere_depth((CENTER[0] + 0.004 * i, CENTER[1], CENTER[2]),
                        RADIUS) for i in range(6)]

    ref = DynFusion(params, mode="fusion")
    for f in seq:
        ref(f)

    a = DynFusion(params, mode="fusion")
    for f in seq[:3]:
        a(f)
    path = str(tmp_path / "ck.npz")
    checkpoint.save_checkpoint(a, path)

    b = DynFusion(params, mode="fusion")
    checkpoint.load_checkpoint(b, path)
    np.testing.assert_array_equal(np.asarray(b.vol.tsdf, np.float32),
                                  np.asarray(a.vol.tsdf, np.float32))
    np.testing.assert_array_equal(np.asarray(b.warpfield.dqs),
                                  np.asarray(a.warpfield.dqs))
    for f in seq[3:]:
        b(f)

    np.testing.assert_array_equal(
        np.asarray(b.vol.tsdf, np.float32),
        np.asarray(ref.vol.tsdf, np.float32))
    np.testing.assert_allclose(np.asarray(b.warpfield.dqs),
                               np.asarray(ref.warpfield.dqs), atol=1e-7)
