"""dist/runtime.py: multi-host bootstrap plumbing. A real pod slice is not
available in CI, so these tests pin the decision logic — when init is a
no-op, which env vars feed it, and the single-process primary contract."""

import numpy as np  # noqa: F401  (conftest import ordering)

from dynfu_tpu.dist import runtime


def test_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("DYNFU_COORDINATOR", raising=False)
    monkeypatch.delenv("DYNFU_NUM_PROCESSES", raising=False)
    assert runtime.init_distributed() is False


def test_noop_for_single_process(monkeypatch):
    monkeypatch.setenv("DYNFU_COORDINATOR", "host0:9876")
    monkeypatch.setenv("DYNFU_NUM_PROCESSES", "1")
    assert runtime.init_distributed() is False


def test_env_vars_feed_initialize(monkeypatch):
    """A configured coordinator must reach jax.distributed.initialize with
    the env-derived arguments (intercepted — no real rendezvous in CI)."""
    import jax

    calls = {}

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setenv("DYNFU_COORDINATOR", "host0:9876")
    monkeypatch.setenv("DYNFU_NUM_PROCESSES", "4")
    monkeypatch.setenv("DYNFU_PROCESS_ID", "2")
    assert runtime.init_distributed() is True
    assert calls == {"addr": "host0:9876", "n": 4, "pid": 2}


def test_already_initialized_is_idempotent(monkeypatch):
    import jax

    def raise_already(**kw):
        raise RuntimeError("distributed runtime already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", raise_already)
    monkeypatch.setenv("DYNFU_COORDINATOR", "host0:9876")
    monkeypatch.setenv("DYNFU_NUM_PROCESSES", "4")
    monkeypatch.setenv("DYNFU_PROCESS_ID", "0")
    assert runtime.init_distributed() is True


def test_other_runtime_errors_propagate(monkeypatch):
    import jax
    import pytest

    def raise_other(**kw):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", raise_other)
    with pytest.raises(RuntimeError, match="unreachable"):
        runtime.init_distributed("host0:9876", 4, 1)


def test_is_primary_single_process():
    assert runtime.is_primary() is True
