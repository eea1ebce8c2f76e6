"""dist/runtime.py: multi-host bootstrap plumbing.

The mock tests pin the decision logic (when init is a no-op, which env vars
feed it, the single-process primary contract); the live test at the bottom
runs a REAL 2-process rendezvous — coordinator service on localhost, a mesh
spanning both processes, and a psum through it — which is what caught the
eager `dynfu_tpu.dist` package imports initializing the XLA backend before
`jax.distributed.initialize` could run (dist/__init__.py is lazy for that
reason)."""

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


_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1"
                           " --xla_cpu_max_isa=AVX2")
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
os.environ["DYNFU_COORDINATOR"] = f"localhost:{port}"
os.environ["DYNFU_NUM_PROCESSES"] = "2"
os.environ["DYNFU_PROCESS_ID"] = str(pid)
sys.path.insert(0, repo)
from dynfu_tpu.dist import runtime
assert runtime.init_distributed() is True
assert jax.process_count() == 2, jax.process_count()
assert runtime.is_primary() is (pid == 0)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map
devs = jax.devices()  # spans BOTH processes
assert len(devs) == 2, devs
mesh = Mesh(np.array(devs), ("d",))
local = jnp.full((1,), float(pid + 1))
arr = jax.make_array_from_single_device_arrays(
    (2,), NamedSharding(mesh, P("d")),
    [jax.device_put(local, jax.local_devices()[0])])
f = jax.jit(shard_map(lambda x: jax.lax.psum(x, "d"), mesh=mesh,
                      in_specs=P("d"), out_specs=P()))
shard = [s.data for s in f(arr).addressable_shards][0]
val = float(np.asarray(shard)[0])
assert val == 3.0, val
print(f"PSUM_OK pid={pid} val={val}", flush=True)
"""


def test_real_two_process_rendezvous(tmp_path):
    """Genuine multi-process run: 2 CPU processes, coordinator on a
    localhost port, `init_distributed` on both, a 2-device global mesh,
    and a cross-process psum(1+2)=3 verified on each process."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    try:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
    except OSError:
        import pytest

        pytest.skip("localhost sockets unavailable in this environment")

    repo = str(Path(__file__).resolve().parent.parent)
    script = tmp_path / "dist_worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    for pid, (rc, out) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"PSUM_OK pid={pid} val=3.0" in out
