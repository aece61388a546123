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

import logging
import zlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.writer import ShardLayer
from .base import MergeTensorsBase
from .ties import elect_disjoint_mean

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnums=(4,))
def _dare_reduce(base, deltas, seed, name_crc, combine_ties, keep_prob, lam,
                 add_base):
    # key derivation lives INSIDE the jit: eagerly it is ~N+3 device
    # dispatches per tensor, and on the tunneled-TPU host every dispatch is
    # a ~24 ms relay round-trip (CLAUDE.md); traced, it fuses into the one
    # merge call. Same functional ops -> bit-identical masks.
    named = jax.random.fold_in(jax.random.key(seed), name_crc)
    keys = jnp.stack(
        [jax.random.fold_in(named, m) for m in range(deltas.shape[0])]
    )
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

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        models, base = await self._delta_engine_inputs(shard_layer)
        if models is None:
            return base
        deltas = await self.get_delta_for_models(models, shard_layer)
        out = _dare_reduce(
            base,
            jnp.stack(deltas),
            jnp.uint32(self.seed),
            jnp.uint32(zlib.crc32(shard_layer.layer_name.encode()) & 0x7FFFFFFF),
            self.combine == "ties",
            jnp.float32(1.0 - self.drop_rate),
            jnp.float32(self.lam),
            jnp.bool_(self.add_base),
        )
        return np.asarray(out)
