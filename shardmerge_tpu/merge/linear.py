"""Linear (weighted-average) merge.

A post-reference capability (no counterpart in /root/reference): the
classic task-arithmetic weighted average — per tensor,

    out = base + sum_m(alpha_m * (ft_m - base)) / Z

with ``Z = sum_m(alpha_m)`` when ``normalize`` (the default, making the
output a true alpha-weighted mean of the finetunes: alphas that sum to 1
interpolate, anything else is rescaled to) or ``Z = 1`` (raw task
arithmetic; distinguishable from the ``addition`` engine in that the base
is added back and alphas apply — addition reproduces the reference's
no-alpha/no-base quirk, shard/merge/addition.py:70-82).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..io.writer import ShardLayer
from .base import MergeTensorsBase

logger = logging.getLogger(__name__)


@jax.jit
def _linear_reduce(base, deltas, inv_z):
    return base.astype(jnp.float32) + jnp.sum(deltas, axis=0) * inv_z


class LinearMerge(MergeTensorsBase):
    """out = base + weighted mean (or raw sum) of alpha-scaled deltas."""

    OPTIONS = frozenset({"normalize"})

    def __init__(self, *args, normalize: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.normalize = bool(normalize)

    def get_readme(self) -> str:
        how = (
            "an alpha-weighted average of the finetune deltas"
            if self.normalize
            else "the sum of the alpha-scaled finetune deltas"
        )
        return f"""# Merged Model

Base Model: {self.config.output_base_model}
Finetuned Models:
{chr(10).join('- ' + model.model for model in self.config.finetune_merge)}

Merged linearly: the base model plus {how}.
"""

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        models, base = await self._delta_engine_inputs(shard_layer)
        if models is None:
            return base
        deltas = await self.get_delta_for_models(models, shard_layer)
        z = sum(m.alpha for m in models) if self.normalize else 1.0
        if self.normalize and abs(z) < 1e-12:
            raise ValueError(
                f"linear normalize=True with alphas summing to {z}; "
                "the weighted mean is undefined"
            )
        out = _linear_reduce(base, jnp.stack(deltas), jnp.float32(1.0 / z))
        return np.asarray(out)
