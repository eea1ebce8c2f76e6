"""ops/warp_pallas.py (interpret mode): the fused warp kernel matches the
XLA warp paths — both blend semantics, the normal quirks, and the
unsupported ratio."""

import numpy as np
import jax.numpy as jnp

from dynfu_tpu.ops import warp_pallas
from dynfu_tpu.warp import field as wfield


def _field(rng, n=12, cap=16):
    nodes = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.6
    wf = wfield.init_warpfield(
        nodes, weights=rng.uniform(0.1, 0.4, n).astype(np.float32),
        capacity=cap)
    # non-trivial node transforms: small rotations + translations
    from dynfu_tpu.core import dualquat as dq

    rod = jnp.asarray(rng.randn(cap, 3).astype(np.float32) * 0.05)
    t = jnp.asarray(rng.randn(cap, 3).astype(np.float32) * 0.01)
    dqs = dq.dq_from_rodrigues(rod, t)
    return wf._replace(dqs=jnp.where(wf.mask[:, None], dqs, wf.dqs))


def test_fused_warp_matches_dqb_path():
    rng = np.random.RandomState(3)
    wf = _field(rng)
    pts = jnp.asarray((rng.rand(300, 3).astype(np.float32) - 0.5) * 0.6)
    nrm = jnp.asarray(rng.randn(300, 3).astype(np.float32))

    want_p, want_n = wfield.warp_points_normals(wf, pts, nrm)
    got_p, got_n, bdq, ratio = warp_pallas.warp_fused_tpu(
        pts, nrm, wf.pos, wf.dqs, wf.w, wf.mask, k=8, blend="dqb",
        tq=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n),
                               atol=2e-5)
    # blended dq matches calc_dqb
    want_dq = wfield.calc_dqb(wf, pts)
    np.testing.assert_allclose(np.asarray(bdq), np.asarray(want_dq),
                               atol=2e-5)
    # unsupported ratio matches the XLA mask's quantity
    unsup = np.asarray(wfield.unsupported_mask(wf, pts))
    np.testing.assert_array_equal(np.asarray(ratio) >= 1.0, unsup)


def test_fused_warp_matches_dlb_path():
    rng = np.random.RandomState(11)
    wf = _field(rng)
    pts = jnp.asarray((rng.rand(257, 3).astype(np.float32) - 0.5) * 0.6)
    nrm = rng.randn(257, 3).astype(np.float32)
    nrm = jnp.asarray(nrm / np.linalg.norm(nrm, axis=-1, keepdims=True))

    want_p, want_n = wfield.warp_points_normals_dlb(wf, pts, nrm)
    got_p, got_n, _, _ = warp_pallas.warp_fused_tpu(
        pts, nrm, wf.pos, wf.dqs, wf.w, wf.mask, k=8, blend="dlb",
        tq=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n),
                               atol=2e-5)


def test_fused_warp_unsupported_far_points():
    """Queries out of every node's reach warp by identity (DLB) and report
    ratio >= 1."""
    rng = np.random.RandomState(7)
    wf = _field(rng, n=6)
    far = jnp.asarray(np.full((130, 3), 30.0, np.float32))
    nrm = jnp.asarray(np.tile([0.0, 0.0, 1.0], (130, 1)).astype(np.float32))
    got_p, got_n, _, ratio = warp_pallas.warp_fused_tpu(
        far, nrm, wf.pos, wf.dqs, wf.w, wf.mask, k=8, blend="dlb",
        tq=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(far), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(nrm), atol=1e-5)
    assert (np.asarray(ratio) >= 1.0).all()


def test_no_pallas_scope_disables_dispatch(monkeypatch):
    """ops/pallas_config.no_pallas(): the sharded engine traces rely on it
    to force the XLA formulations (GSPMD cannot partition a pallas_call)."""
    import jax

    from dynfu_tpu.ops import pallas_config
    from dynfu_tpu.ops import knn_pallas, corr_pallas
    from dynfu_tpu.solver import gram_pallas

    monkeypatch.delenv("DYNFU_NO_PALLAS", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert knn_pallas.available()
    assert corr_pallas.available()
    assert gram_pallas.available()
    assert warp_pallas.available()
    with pallas_config.no_pallas():
        assert not knn_pallas.available()
        assert not warp_pallas.available()
        with pallas_config.no_pallas():  # nestable
            assert not gram_pallas.available()
        assert not corr_pallas.available()
    assert warp_pallas.available()
    monkeypatch.setenv("DYNFU_NO_PALLAS", "1")
    assert not warp_pallas.available()


def test_no_pallas_scope_forces_retrace():
    """The no_pallas() boundary must invalidate inner jit caches: a jaxpr
    traced OUTSIDE the scope (pallas dispatch on) must not replay inside
    it (pallas off), and vice versa — the flag is not part of any jit
    cache key (dist/engine_spmd.py relies on this)."""
    import jax
    import jax.numpy as jnp

    from dynfu_tpu.ops import pallas_config

    calls = []

    @jax.jit
    def fn(x):
        calls.append(pallas_config.pallas_enabled())
        return x + 1

    fn(jnp.ones(3))  # trace 1 (outside)
    fn(jnp.ones(3))  # cached — no new trace
    assert len(calls) == 1
    with pallas_config.no_pallas():
        fn(jnp.ones(3))  # boundary cleared the cache -> trace 2
        fn(jnp.ones(3))  # cached inside the scope
    assert len(calls) == 2
    fn(jnp.ones(3))  # exit boundary cleared again -> trace 3
    assert len(calls) == 3
