"""Small utilities (parity with reference shard/tensor/util.py helpers)."""

from __future__ import annotations


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
