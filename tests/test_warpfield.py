"""Warp-field behavior tests: DQB semantics, unsupported-vertex detection,
voxel-grid node insertion — pinned to warp_field.cpp / node.cpp behavior."""

import numpy as np

from dynfu_tpu.core import dualquat as dq
from dynfu_tpu.warp import field as wfield


def grid_nodes():
    g = np.stack(np.meshgrid(*[np.arange(2.0)] * 3, indexing="ij"), -1).reshape(-1, 3)
    return g.astype(np.float32) * 2.0 - 0.5  # 8 nodes around origin


def test_transformation_weight_formula():
    # node.cpp:29-36: exp(-d^2 / (2 w^2))
    w = wfield.transformation_weights(
        np.array([1.0, 0, 0], np.float32), np.float32(2.0), np.array([0.0, 0, 0], np.float32)
    )
    assert abs(float(w) - np.exp(-1.0 / 8.0)) < 1e-6


def test_dqb_identity_nodes_is_identity():
    wf = wfield.init_warpfield(grid_nodes(), weights=2.0)
    pts = np.array([[0.1, 0.2, 0.3], [0, 0, 0]], np.float32)
    blend = wfield.calc_dqb(wf, pts)
    out = dq.dq_transform_point(blend, pts)
    np.testing.assert_allclose(np.asarray(out), pts, atol=1e-6)


def test_dqb_translation_blend_equals_weighted_sum():
    """For identity rotations, DQB (sequential product, warp_field.cpp:127-148)
    equals the weighted translation sum used by the energy (energy.t:47-55)."""
    nodes = grid_nodes()
    rng = np.random.RandomState(0)
    trans = 0.01 * rng.randn(8, 3).astype(np.float32)
    dqs = np.asarray(dq.dq_from_translation(trans))
    wf = wfield.init_warpfield(nodes, dqs=dqs, weights=2.0)

    pts = np.array([[0.2, -0.1, 0.4]], np.float32)
    idx, _ = wfield.find_neighbors(wf, pts)
    w = np.asarray(
        wfield.transformation_weights(nodes[np.asarray(idx[0])], 2.0, pts[0][None, :])
    )
    expected = pts[0] + (w[:, None] * trans[np.asarray(idx[0])]).sum(0)

    blend = wfield.calc_dqb(wf, pts)
    out = np.asarray(dq.dq_transform_point(blend, pts))[0]
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_unsupported_mask():
    # warp_field.cpp:34-61: unsupported iff min_k dist/dg_w >= 1
    wf = wfield.init_warpfield(grid_nodes(), weights=0.5)
    pts = np.array([[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]], np.float32)
    m = np.asarray(wfield.unsupported_mask(wf, pts))
    # origin is ~0.87 from nearest node -> ratio 1.73 >= 1 -> unsupported;
    # use a supported point right on a node
    pts2 = np.array([[-0.5, -0.5, -0.5], [10.0, 10.0, 10.0]], np.float32)
    m2 = np.asarray(wfield.unsupported_mask(wf, pts2))
    assert not m2[0] and m2[1]
    assert m[1]


def test_voxel_downsample_centroids():
    pts = np.array(
        [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [0.30, 0.30, 0.30]], np.float32
    )
    mask = np.ones(3, bool)
    cent, cmask = wfield.voxel_downsample(pts, mask, 0.05, 8)
    cent, cmask = np.asarray(cent), np.asarray(cmask)
    assert cmask.sum() == 2
    got = cent[cmask]
    np.testing.assert_allclose(got[0], [0.015, 0.015, 0.015], atol=1e-6)
    np.testing.assert_allclose(got[1], [0.30, 0.30, 0.30], atol=1e-6)


def test_insert_nodes_and_capacity():
    wf = wfield.init_warpfield(grid_nodes(), weights=2.0, capacity=12)
    new = np.array([[5.0, 5.0, 5.0], [6.0, 6.0, 6.0]], np.float32)
    wf2 = wfield.insert_nodes(wf, new, np.array([True, True]), dg_w=0.2)
    assert int(wf2.count) == 10
    np.testing.assert_allclose(np.asarray(wf2.pos[8]), [5.0, 5.0, 5.0])
    assert float(wf2.w[9]) == np.float32(0.2)
    # overflow beyond capacity is dropped, not wrapped
    many = np.tile(np.array([[7.0, 7.0, 7.0]], np.float32), (5, 1))
    wf3 = wfield.insert_nodes(wf2, many, np.ones(5, bool), dg_w=0.2)
    assert int(wf3.count) == 12


def test_update_warpfield_adds_nodes_for_far_vertices():
    wf = wfield.init_warpfield(grid_nodes(), weights=0.2, capacity=64)
    verts = np.concatenate(
        [
            np.tile(np.array([[5.0, 5.0, 5.0]], np.float32), (10, 1)),
            grid_nodes(),
        ]
    )
    mask = np.ones(len(verts), bool)
    wf2 = wfield.update_warpfield(wf, verts, mask, epsilon=0.1)
    assert int(wf2.count) == 9  # one new 5cm cell
    np.testing.assert_allclose(np.asarray(wf2.pos[8]), [5.0, 5.0, 5.0], atol=1e-5)
    assert abs(float(wf2.w[8]) - 0.2) < 1e-6  # dg_w = 2 * epsilon


def test_compose_translations_left():
    # node.cpp:19-23: dg_se3 <- new * old
    nodes = grid_nodes()
    base = np.asarray(dq.dq_from_euler(0.0, np.pi / 4, 0.0, 0.1, 0.0, 0.0))
    wf = wfield.init_warpfield(nodes, dqs=np.tile(base, (8, 1)), weights=2.0)
    t = np.tile(np.array([[0.0, 0.2, 0.0]], np.float32), (8, 1))
    wf2 = wfield.compose_translations(wf, t)
    expected = dq.dq_mul(dq.dq_from_translation(t[0]), base)
    np.testing.assert_allclose(np.asarray(wf2.dqs[0]), np.asarray(expected), atol=1e-6)


def test_unsupported_tiered_matches_exact():
    """The 1-NN-prefiltered unsupported test (_unsupported_tiered) decides
    exactly like the full 8-NN ratio whenever the ambiguous shell fits the
    compaction cap — including mixed dg_w values, where the nearest node
    can fail its own ratio while a farther, wider node supports."""
    import jax.numpy as jnp

    from dynfu_tpu.warp import field as wfield

    rng = np.random.RandomState(17)
    pos = rng.rand(64, 3).astype(np.float32) * 2.0
    w = rng.choice([0.2, 0.3, 0.5], 64).astype(np.float32)
    wf = wfield.init_warpfield(pos, weights=w, capacity=96)
    verts = (rng.rand(4096, 3).astype(np.float32) * 3.0) - 0.5
    vmask = rng.rand(4096) < 0.9

    exact = np.asarray(wfield.unsupported_mask(
        wf, jnp.asarray(verts), jnp.asarray(vmask)))
    tiered = np.asarray(wfield._unsupported_tiered(
        wf, jnp.asarray(verts), jnp.asarray(vmask), cap=4096))
    np.testing.assert_array_equal(tiered, exact)


def test_update_warpfield_aabb_gates_out_of_volume_candidates():
    """aabb: unsupported vertices OUTSIDE the volume are verts dragged off
    by a rogue warp, not new geometry — no node is inserted for them
    (the 512-cube fusion insertion cascade, warp/field.py docstring)."""
    wf = wfield.init_warpfield(grid_nodes(), weights=0.2, capacity=64)
    verts = np.concatenate(
        [
            np.tile(np.array([[5.0, 5.0, 5.0]], np.float32), (10, 1)),
            grid_nodes(),
        ]
    )
    mask = np.ones(len(verts), bool)
    wf2 = wfield.update_warpfield(wf, verts, mask, epsilon=0.1,
                                  aabb=((0.0,) * 3, (3.0,) * 3))
    assert int(wf2.count) == 8  # the far candidate is outside the box
    wf3 = wfield.update_warpfield(wf, verts, mask, epsilon=0.1,
                                  aabb=((0.0,) * 3, (6.0,) * 3))
    assert int(wf3.count) == 9  # inside a larger box it inserts as before
