"""Delta-addition merge. Parity: reference shard/merge/addition.py:27-82.

REF-QUIRK addition.py:70-82: the reference returns the SUM OF DELTAS without
adding the base tensor back; reproduced as-is (flag-gated fix available via
``add_base=True``).

Documented deviation (precision upgrade): the reference subtracts and
accumulates in the loaded checkpoint dtype (typically bf16,
addition.py:70-80); this engine computes the delta sum in fp32 and lets the
writer quantize once to ``output_dtype``. Accumulating N bf16 roundings
vs one final rounding differs by at most N ulps of bf16 — strictly less
rounding error, same contract direction as the repo-wide fp32 delta policy
(merge/base.py _delta_fp32).
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
def _sum_deltas(base, fts):
    base = base.astype(jnp.float32)
    out = jnp.zeros_like(base)
    for ft in fts:
        out = out + (ft.astype(jnp.float32) - base)
    return out


class AdditionMerge(MergeTensorsBase):
    """out = sum(ft - base)."""

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
from each finetuned model relative to the base model.
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
        out = _sum_deltas(base, list(fts))
        if self.add_base:
            out = out + base.astype(jnp.float32)
        return np.asarray(out)
