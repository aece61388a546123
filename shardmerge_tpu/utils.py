"""Small utilities (parity with reference shard/tensor/util.py helpers)."""

from __future__ import annotations


def host_device_count_flags(existing: str, n: int) -> str:
    """XLA_FLAGS value forcing ``n`` virtual host (CPU) devices, replacing
    any count already present in ``existing`` (used by the driver dryrun and
    the multi-process test harness — must stay in sync, hence shared)."""
    import re

    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", existing or ""
    )
    return (flags + f" --xla_force_host_platform_device_count={n}").strip()


def get_device() -> str:
    """Best available device kind ("tpu" | "gpu" | "cpu").

    Parity: reference shard/tensor/util.py:67-68 (cuda -> mps -> cpu); here
    placement is JAX's, so this is informational.
    """
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError:
        return "cpu"
