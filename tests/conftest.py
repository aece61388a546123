"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
exercised without TPU hardware (mirrors the reference's offline test strategy,
reference tests/conftest.py, with faked transport and tmp_path storage).

The env vars MUST be set before jax is imported anywhere.
"""

import os
import sys
from pathlib import Path

# Force CPU even when the harness presets JAX_PLATFORMS (e.g. the axon TPU
# tunnel, whose sitecustomize calls jax.config.update("jax_platforms", ...)
# at interpreter startup): tests must not depend on TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# Synthetic tiny-model fixtures: a 2-layer Llama-shaped model split into 3
# shards (mirrors reference tests/conftest.py:125-141 mock_model_index).
# ---------------------------------------------------------------------------

TINY_SHAPES = {
    "model.embed_tokens.weight": (32, 16),
    "model.layers.0.self_attn.q_proj.weight": (16, 16),
    "model.layers.0.self_attn.k_proj.weight": (8, 16),
    "model.layers.0.self_attn.v_proj.weight": (8, 16),
    "model.layers.0.self_attn.o_proj.weight": (16, 16),
    "model.layers.0.mlp.gate_proj.weight": (24, 16),
    "model.layers.0.mlp.up_proj.weight": (24, 16),
    "model.layers.0.mlp.down_proj.weight": (16, 24),
    "model.layers.0.input_layernorm.weight": (16,),
    "model.layers.0.post_attention_layernorm.weight": (16,),
    "model.layers.1.self_attn.q_proj.weight": (16, 16),
    "model.layers.1.self_attn.k_proj.weight": (8, 16),
    "model.layers.1.self_attn.v_proj.weight": (8, 16),
    "model.layers.1.self_attn.o_proj.weight": (16, 16),
    "model.layers.1.mlp.gate_proj.weight": (24, 16),
    "model.layers.1.mlp.up_proj.weight": (24, 16),
    "model.layers.1.mlp.down_proj.weight": (16, 24),
    "model.layers.1.input_layernorm.weight": (16,),
    "model.layers.1.post_attention_layernorm.weight": (16,),
    "model.norm.weight": (16,),
    "lm_head.weight": (32, 16),
}

TINY_SHARD_MAP = {}
for _name in TINY_SHAPES:
    if "layers.1" in _name or "model.norm" in _name or "lm_head" in _name:
        _shard = "model-00002-of-00003.safetensors"
    elif "layers.0" in _name:
        _shard = "model-00001-of-00003.safetensors"
    else:
        _shard = "model-00003-of-00003.safetensors"
    TINY_SHARD_MAP[_name] = _shard


def make_tiny_model(path: Path, seed: int, dtype="float32", scale: float = 1.0):
    """Write a tiny sharded safetensors model directory; returns tensor dict."""
    import ml_dtypes

    from shardmerge_tpu.io import safetensors_io as stio

    np_dtype = np.dtype(ml_dtypes.bfloat16) if dtype == "bfloat16" else np.dtype(dtype)
    gen = np.random.default_rng(seed)
    tensors = {
        name: (gen.standard_normal(shape) * scale).astype(np.float32).astype(np_dtype)
        for name, shape in TINY_SHAPES.items()
    }
    path.mkdir(parents=True, exist_ok=True)
    shards = {}
    for name, shard in TINY_SHARD_MAP.items():
        shards.setdefault(shard, {})[name] = tensors[name]
    for shard, content in shards.items():
        stio.save_file(content, path / shard, metadata={"format": "pt"})
    index = {
        "metadata": {"total_size": int(sum(t.nbytes for t in tensors.values()))},
        "weight_map": dict(TINY_SHARD_MAP),
    }
    import json

    with open(path / "model.safetensors.index.json", "w") as f:
        json.dump(index, f, indent=2)
    return tensors


@pytest.fixture
def tiny_model_factory(tmp_path):
    def factory(name: str, seed: int, dtype="float32", scale: float = 1.0):
        path = tmp_path / name
        tensors = make_tiny_model(path, seed, dtype=dtype, scale=scale)
        return path, tensors

    return factory
