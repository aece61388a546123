"""TIES-style sign-agreement addition merge.

Parity: reference shard/merge/taskaddition.py:27-82 — stack the deltas, take
the majority sign ``sign(sum(sign(delta)))``, zero out entries whose sign
disagrees, and sum.

REF-QUIRK taskaddition.py:69-79: like AdditionMerge, the base tensor is NOT
added back; reproduced (``add_base=True`` gates the fix).
"""

from __future__ import annotations

import asyncio
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..io.writer import ShardLayer
from .base import MergeTensorsBase

logger = logging.getLogger(__name__)


@jax.jit
def _ties_sum(base, fts):
    base = base.astype(jnp.float32)
    deltas = jnp.stack([ft.astype(jnp.float32) - base for ft in fts], axis=0)
    signs = jnp.sign(deltas)
    majority = jnp.sign(jnp.sum(signs, axis=0))
    mask = signs == majority[None]
    return jnp.sum(deltas * mask, axis=0)


class TaskAdditionMerge(MergeTensorsBase):
    """Addition merge with majority sign agreement."""

    OPTIONS = frozenset({"add_base"})

    def __init__(self, *args, add_base: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.add_base = add_base

    def get_readme(self) -> str:
        return f"""# Merged Model

Base Model: {self.config.output_base_model}
Finetuned Models:
{chr(10).join('- ' + model.model for model in self.config.finetune_merge)}

This model was created by computing and combining the delta weights
from each finetuned model relative to the base model, using sign agreement.
"""

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        logger.info("Processing layer: %s", shard_layer.layer_name)
        base = await self._fetch(
            self.config.output_base_model, shard_layer.layer_name
        )
        fts = await asyncio.gather(
            *[
                self._fetch(m.model, shard_layer.layer_name)
                for m in self.config.finetune_merge
            ]
        )
        out = _ties_sum(base, list(fts))
        if self.add_base:
            out = out + base.astype(jnp.float32)
        return np.asarray(out)
