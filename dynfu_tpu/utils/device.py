"""Device enumeration / info — analog of the reference's CUDA device
management (kfusion::cuda::getCudaEnabledDeviceCount / setDevice /
printCudaDeviceInfo, include/kfusion/kinfu.hpp:23-31, src/kfusion/core.cpp:
8-211). The pre-Fermi capability gate becomes a platform sanity check."""

from __future__ import annotations


def device_count() -> int:
    import jax

    return len(jax.devices())


def devices():
    import jax

    return jax.devices()


def print_short_device_info(index: int = 0) -> str:
    """One-line device summary (printShortCudaDeviceInfo analog)."""
    import jax

    d = jax.devices()[index]
    line = (
        f"Device {index}: {d.device_kind} (platform {d.platform}, "
        f"process {d.process_index}, {device_count()} device(s) visible)"
    )
    print(line)
    return line


def check_platform() -> bool:
    """True when running on an accelerator backend (the moral analog of the
    reference's checkIfPreFermiGPU refusal, core.cpp:31-38: warn-and-continue
    rather than hard-exit when only CPU is available)."""
    import jax

    plat = jax.devices()[0].platform
    if plat == "cpu":
        print("Warning: running on CPU — TPU acceleration not available")
        return False
    return True
