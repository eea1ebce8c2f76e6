"""Test configuration: run everything on CPU with 8 virtual devices.

This is the "fake backend" trick the reference never had (its gtest suite
required a physical CUDA GPU): multi-chip sharding tests execute on a virtual
8-device CPU mesh via XLA's host-platform device-count flag.

NOTE: this environment's TPU plugin ('axon') ignores the JAX_PLATFORMS env
var, so we must use the config API before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # this host class reports AMX/AVX512 features whose XLA:CPU codegen
    # intermittently SIGSEGVs under suite-level load (cpu_aot_loader logs a
    # machine-feature mismatch first); capping the ISA avoids those paths
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from dynfu_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def _collect_target_files(args):
    """Test files a pytest invocation will load into ONE process."""
    from pathlib import Path

    files = set()
    for a in args:
        p = Path(a.split("::", 1)[0])
        if p.is_dir():
            files.update(p.rglob("test_*.py"))
        elif p.suffix == ".py" and p.exists():
            files.add(p.resolve())
    return files


def pytest_cmdline_main(config):
    """Route monolithic invocations through the crash-proof per-file gate.

    ``pytest tests -q`` — the obvious invocation — intermittently dies with
    an XLA:CPU fatal signal once a few hundred jit programs accumulate in one
    process (codegen-under-suite-load; the AVX2 ISA cap above reduced but did
    not eliminate it — see scripts/run_tests.py). Every file passes in an
    isolated process, so any invocation that would load >1 test file into one
    process is transparently re-dispatched as one pytest subprocess per file
    (same tests, same flags, bounded blast radius). Single-file invocations
    (including the gate's own subprocesses) run in-process as usual.
    Set DYNFU_TEST_SINGLE_PROC=1 to force the monolithic path (e.g. to
    reproduce the crash).
    """
    if os.environ.get("DYNFU_TEST_SINGLE_PROC"):
        return None
    files = _collect_target_files(config.args)
    if len(files) <= 1:
        return None
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import run_tests

    # Forward non-positional flags (-q, -x, -k EXPR, ...) to the per-file
    # subprocesses; positional targets are replaced by the per-file split.
    raw = list(config.invocation_params.args)
    positional = set(config.args)
    extra = [a for a in raw if a not in positional]
    print("[dynfu gate] multi-file invocation -> per-file subprocesses "
          "(scripts/run_tests.py; DYNFU_TEST_SINGLE_PROC=1 to force "
          "one process)", flush=True)
    return run_tests.main(["-j2", *sorted(str(f) for f in files), *extra])
