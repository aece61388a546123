"""DARE merging: random delta drop + rescale, then sum or sign-elect.

A post-reference capability (no counterpart in /root/reference): the DARE
procedure of Yu et al. 2024 ("Language Models are Super Mario") — most
entries of a finetune delta are redundant, so drop each independently with
probability ``drop_rate`` and rescale the survivors by ``1/(1-drop_rate)``
to keep the delta's expectation, THEN combine across models:

- ``combine="sum"``  — plain sum of the sparsified deltas (DARE-linear).
- ``combine="ties"`` — sign election + disjoint mean over the sparsified
  deltas (DARE-TIES; no magnitude trim — the random drop replaces it).

Determinism contract: the Bernoulli mask for (tensor, model m) derives from
``fold_in(fold_in(key(seed), crc32(tensor_name)), m)`` — a pure function of
the config, never of execution order. Re-running a resumed merge therefore
regenerates bit-identical masks, preserving the artifact-is-the-checkpoint
resume property (SURVEY.md §5 checkpoint/resume).

Output is ``base + lam * combined`` by default (``add_base=False`` gates the
delta-artifact mode); like the TIES engine, there is no reference quirk to
reproduce here.
"""

from __future__ import annotations

import asyncio
import logging
import zlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import INPUT_LAYER, OUTPUT_LAYER
from ..io.writer import ShardLayer
from .base import MergeTensorsBase
from .ties import elect_disjoint_mean

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnums=(3,))
def _dare_reduce(base, deltas, keys, combine_ties, keep_prob, lam, add_base):
    masks = jax.vmap(
        lambda k: jax.random.bernoulli(k, p=keep_prob, shape=deltas.shape[1:])
    )(keys)
    kept = jnp.where(masks, deltas / keep_prob, 0.0)
    if combine_ties:
        combined = elect_disjoint_mean(
            kept.reshape(kept.shape[0], -1)
        ).reshape(kept.shape[1:])
    else:
        combined = jnp.sum(kept, axis=0)
    out = lam * combined
    return jnp.where(add_base, out + base.astype(jnp.float32), out)


class DareMerge(MergeTensorsBase):
    """Drop-and-rescale delta merge (DARE), linear or TIES-combined."""

    OPTIONS = frozenset({"drop_rate", "combine", "seed", "lam", "add_base"})

    def __init__(
        self,
        *args,
        drop_rate: float = 0.9,
        combine: str = "sum",
        seed: int = 0,
        lam: float = 1.0,
        add_base: bool = True,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        if not 0.0 <= drop_rate < 1.0:
            raise ValueError(f"dare drop_rate must be in [0, 1), got {drop_rate}")
        if combine not in ("sum", "ties"):
            raise ValueError(
                f"dare combine must be 'sum' or 'ties', got {combine!r}"
            )
        self.drop_rate = float(drop_rate)
        self.combine = combine
        self.seed = int(seed)
        self.lam = float(lam)
        self.add_base = bool(add_base)

    def get_readme(self) -> str:
        return f"""# Merged Model

Base Model: {self.config.output_base_model}
Finetuned Models:
{chr(10).join('- ' + model.model for model in self.config.finetune_merge)}

Merged with DARE: {self.drop_rate:.0%} of each model's delta entries were
dropped at random (seed={self.seed}) and the survivors rescaled to keep the
delta's expectation, then combined via {self.combine}
(lambda={self.lam}).
"""

    def _mask_keys(self, tensor_name: str, n_models: int) -> jnp.ndarray:
        root = jax.random.key(self.seed)
        named = jax.random.fold_in(
            root, zlib.crc32(tensor_name.encode()) & 0x7FFFFFFF
        )
        return jnp.stack(
            [jax.random.fold_in(named, m) for m in range(n_models)]
        )

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        if shard_layer.layer_number == INPUT_LAYER:
            self.stats.tensors_passthrough += 1
            return await self._passthrough(shard_layer, "input")
        if shard_layer.layer_number == OUTPUT_LAYER:
            self.stats.tensors_passthrough += 1
            return await self._passthrough(shard_layer, "output")

        models = [
            m
            for m in self.config.finetune_merge
            if m.use_layer_index(shard_layer.layer_number)
        ]
        base = await self.get_base_output_tensor(shard_layer)
        if not models:
            logger.warning(
                "No models cover layer %s; passing base through",
                shard_layer.layer_name,
            )
            return np.asarray(base)

        await asyncio.gather(
            *[
                self.index_manager.preload_tensor(m.model, shard_layer.layer_name)
                for m in models
            ]
        )
        deltas = await self.get_delta_for_models(models, shard_layer)
        out = _dare_reduce(
            base,
            jnp.stack(deltas),
            self._mask_keys(shard_layer.layer_name, len(models)),
            self.combine == "ties",
            jnp.float32(1.0 - self.drop_rate),
            jnp.float32(self.lam),
            jnp.bool_(self.add_base),
        )
        return np.asarray(out)
