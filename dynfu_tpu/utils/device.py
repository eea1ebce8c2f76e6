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


def print_device_info(index: int = 0) -> str:
    """Multi-line device report (printCudaDeviceInfo analog, core.cpp:40+)."""
    import jax

    d = jax.devices()[index]
    lines = [
        f"Device {index}: {d.device_kind}",
        f"  platform:        {d.platform}",
        f"  process index:   {d.process_index}",
        f"  id:              {d.id}",
        f"  visible devices: {device_count()}",
    ]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats:
        for k in ("bytes_in_use", "bytes_limit"):
            if k in stats:
                lines.append(f"  {k}: {stats[k] / 2**20:.0f} MiB")
    out = "\n".join(lines)
    print(out)
    return out


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
