"""YAML-backed merge configuration.

Parity surface: reference shard/config.py (MergeModel fields :24-40,
MergeConfig fields/properties :42-101, from_yaml validation :103-126).
Differences from the reference, by design:

- dtypes are plain strings resolved to numpy/ml_dtypes dtypes (no torch).
- ``device`` keeps the reference's config-file slot but means less here:
  per-tensor placement is decided by JAX (TPU if present). "cpu" forces the
  host CPU backend for the whole run; any other value probes the default
  backend for liveness at CLI startup (backend.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np
import yaml


class ConfigError(ValueError):
    """Raised for invalid merge configuration files."""


_DTYPE_ALIASES = {
    "bfloat16": "bfloat16",
    "bf16": "bfloat16",
    "float16": "float16",
    "fp16": "float16",
    "half": "float16",
    "float32": "float32",
    "fp32": "float32",
    "float": "float32",
    "float64": "float64",
    "fp64": "float64",
}


def resolve_dtype(name: str):
    """Resolve a dtype string to a numpy dtype (ml_dtypes for bfloat16)."""
    canonical = _DTYPE_ALIASES.get(name)
    if canonical is None:
        raise ConfigError(f"Unsupported output_dtype: {name!r}")
    if canonical == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(canonical)


@dataclass
class MergeModel:
    """One finetuned model participating in the merge.

    Field semantics parity: reference shard/config.py:24-40.
    """

    model: str
    base: str
    alpha: float = 1.0
    is_input: bool = False
    is_output: bool = False
    is_norm: bool = False
    start_layer: int = 0
    end_layer: int = -1

    def use_layer_index(self, layer_index: int) -> bool:
        # Parity: reference shard/config.py:35-40 (note: sentinel layers
        # INPUT_LAYER=-1 / OUTPUT_LAYER=-2 compare below start_layer=0 and are
        # therefore excluded by default, same as the reference).
        if self.start_layer > layer_index:
            return False
        if self.end_layer != -1 and self.end_layer < layer_index:
            return False
        return True


@dataclass
class MergeConfig:
    """Top-level merge configuration.

    Field semantics parity: reference shard/config.py:42-101.
    """

    finetune_merge: List[MergeModel]
    output_base_model: str
    output_dir: str
    output_dtype: str = "bfloat16"
    device: str = "tpu"  # "cpu" forces host CPU; else JAX default (probed)
    clean_cache: bool = False
    cache_dir: str = "cache"
    storage_dir: str = "storage"
    # TPU-native extensions (absent fields keep reference-config files valid):
    write_through: bool = False  # per-tensor shard rewrite (reference behavior)
    merge_method: str = "fourier"  # fourier | fourier-legacy | addition |
    # task-addition | ties | dare | linear | slerp
    # Engine-specific knobs (e.g. ties: {density, lam}; dare: {drop_rate,
    # combine, seed}). Keys are validated against the chosen engine's OPTIONS
    # set at run time — a typo fails loudly instead of silently merging with
    # defaults.
    method_options: dict = field(default_factory=dict)
    # Row-shard huge tensors over all devices. None = auto: when more than
    # one device is visible, a mesh is created and tensors >= shard_min_bytes
    # (or >= the huge-tensor working-set bound) merge sharded instead of
    # falling back to the host CPU backend. False disables; True logs when
    # requested with a single device.
    shard_tensors: Optional[bool] = None
    shard_min_bytes: int = 1 << 30  # sharding threshold (per-tensor fp32 bytes)
    hbm_budget_gb: Optional[float] = None  # spill delta stack to host RAM above this
    distributed: bool = False  # force jax.distributed.initialize (GCE TPU
    # pods auto-detect the cluster only inside initialize itself)
    exact_imag: bool = False  # reproduce the reference's literal double-FFT
    # imaginary recursion everywhere (6 FFTs/pair) instead of the analytic
    # identity on large tensors (bit-parity mode; see merge/fourier.py)

    @property
    def input_model(self) -> Optional[MergeModel]:
        for model in self.finetune_merge:
            if model.is_input:
                return model
        return None

    @property
    def output_model(self) -> Optional[MergeModel]:
        for model in self.finetune_merge:
            if model.is_output:
                return model
        return None

    @property
    def output_path(self) -> Path:
        return Path(self.output_dir)

    @property
    def cache_path(self) -> Path:
        return Path(self.cache_dir)

    @property
    def storage_path(self) -> Path:
        return Path(self.storage_dir)

    @property
    def output_astype(self) -> np.dtype:
        return resolve_dtype(self.output_dtype)

    def update(self, config: Optional[dict] = None, **kwargs):
        # Parity: reference shard/config.py:83-90 (silently ignores unknown keys).
        for key, value in (config or {}).items():
            if hasattr(self, key):
                setattr(self, key, value)
        for key, value in kwargs.items():
            if hasattr(self, key):
                setattr(self, key, value)

    def to_dict(self) -> dict:
        # Parity: reference shard/config.py:92-101 (flattens finetune_merge to names).
        return {
            "output_base_model": self.output_base_model,
            "finetune_merge": [model.model for model in self.finetune_merge],
            "output_dir": self.output_dir,
            "device": self.device,
            "clean_cache": self.clean_cache,
            "cache_dir": self.cache_dir,
            "storage_dir": self.storage_dir,
        }

    @classmethod
    def from_yaml(cls, config_path: Path) -> "MergeConfig":
        """Load and validate a YAML configuration.

        Parity: reference shard/config.py:103-126, with ConfigError in place
        of click.BadParameter so the config layer stays CLI-agnostic.
        """
        with open(config_path) as f:
            config = yaml.safe_load(f)

        if not isinstance(config, dict):
            raise ConfigError("Configuration file must contain a YAML mapping")

        required = ["output_base_model", "finetune_merge", "output_dir"]
        missing = [key for key in required if key not in config]
        if missing:
            raise ConfigError(
                f"Missing required configuration fields: {', '.join(missing)}"
            )

        if not isinstance(config["finetune_merge"], list):
            raise ConfigError("finetune_merge must be a list of model entries")

        try:
            config["finetune_merge"] = [
                MergeModel(**model) for model in config["finetune_merge"]
            ]
        except TypeError as e:
            raise ConfigError(f"Invalid finetune_merge entry: {e}") from e

        if "method_options" in config and not isinstance(
            config["method_options"], dict
        ):
            raise ConfigError("method_options must be a mapping")

        try:
            cfg = cls(**config)
        except TypeError as e:
            raise ConfigError(f"Invalid configuration field: {e}") from e
        resolve_dtype(cfg.output_dtype)  # validate eagerly
        return cfg
