"""DELLA merging: magnitude-ranked stochastic drop, rescale, election.

A post-reference capability (no counterpart in /root/reference): the DELLA
procedure of Deep et al. 2024 ("DELLA-Merging: Reducing Interference in
Model Merging through Magnitude-Based Sampling", arXiv:2406.11617) — DARE's
drop-and-rescale, but with the drop probability of each entry set by its
magnitude RANK instead of a uniform coin (MAGPRUNE): large entries are
likelier to survive, small ones likelier to drop, and the survivor rescale
``1/k_i`` keeps the delta's expectation elementwise.

Per tensor, with fp32 alpha-weighted deltas ``d_m = alpha_m * (ft_m - base)``:

1. **Rank** — within each matrix row (the whole tensor for 1-D), rank
   entries by ``|d_m|`` descending (rank 0 = largest).
2. **Assign keep probabilities** — linear in the rank fraction
   ``f = rank / max(row_len - 1, 1)``::

       k_i = density + epsilon * (1/2 - f_i)

   so the row's mean keep probability is ``density`` and the spread is
   ``epsilon`` (``epsilon = 0`` degenerates to DARE with
   ``keep = density``). Validation requires ``0 < density - epsilon/2``
   and ``density + epsilon/2 <= 1`` so every k_i is a probability.
3. **Drop + rescale** — Bernoulli(k_i) per entry; survivors scale by
   ``1/k_i``.
4. **Combine** — ``combine="ties"`` (default, the paper's choice): sign
   election + disjoint mean over the sampled deltas
   (:func:`..ties.elect_disjoint_mean`); ``combine="sum"`` sums them.

Determinism contract (same as the DARE engine): the per-(tensor, model)
randomness derives from ``fold_in(fold_in(key(seed), crc32(name)), m)`` — a
pure function of the config, never of execution order, so resumed merges
regenerate bit-identical masks (SURVEY.md §5 checkpoint/resume).

Output is ``base + lam * combined`` (``add_base=False`` gates the
delta-artifact mode). Like TIES/DARE there is no reference quirk to
reproduce. The rank is per-row like the paper's row-wise MAGPRUNE; ties in
magnitude take adjacent ranks in stable argsort order (deterministic).
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


def keep_probs(deltas: jnp.ndarray, density: float, epsilon: float):
    """Per-entry keep probabilities from within-row magnitude ranks.

    ``deltas``: (N, R, C) — rank over the trailing C axis. Returned shape
    matches. Rank 0 (largest |.|) gets ``density + epsilon/2``; the
    smallest gets ``density - epsilon/2``; single-entry rows get exactly
    ``density``.
    """
    mags = jnp.abs(deltas)
    # rank[i] = position of entry i in the descending-|.| order:
    # double argsort of the negated magnitudes (stable, deterministic)
    order = jnp.argsort(-mags, axis=-1)
    ranks = jnp.argsort(order, axis=-1).astype(jnp.float32)
    c = deltas.shape[-1]
    if c == 1:  # a single-entry row has no rank spread: exactly density
        frac = jnp.full_like(ranks, 0.5)
    else:
        frac = ranks / jnp.float32(c - 1)
    return jnp.float32(density) + jnp.float32(epsilon) * (0.5 - frac)


@partial(jax.jit, static_argnums=(4,))
def _della_reduce(
    base, deltas, seed, name_crc, combine_ties, density, epsilon, lam,
    add_base,
):
    # key derivation INSIDE the jit (see dare.py: eager fold_ins are ~N+3
    # relay round-trips per tensor); same functional ops -> identical masks
    named = jax.random.fold_in(jax.random.key(seed), name_crc)
    flat = deltas.reshape(deltas.shape[0], -1, deltas.shape[-1])
    probs = keep_probs(flat, density, epsilon)
    keys = jnp.stack(
        [jax.random.fold_in(named, m) for m in range(deltas.shape[0])]
    )
    masks = jax.vmap(jax.random.bernoulli)(keys, probs)
    kept = jnp.where(masks, flat / probs, 0.0)
    if combine_ties:
        combined = elect_disjoint_mean(kept.reshape(kept.shape[0], -1))
    else:
        combined = jnp.sum(kept, axis=0).reshape(-1)
    out = lam * combined.reshape(deltas.shape[1:])
    return jnp.where(add_base, out + base.astype(jnp.float32), out)


class DellaMerge(MergeTensorsBase):
    """Magnitude-ranked drop-and-rescale delta merge (DELLA)."""

    OPTIONS = frozenset(
        {"density", "epsilon", "combine", "seed", "lam", "add_base"}
    )

    def __init__(
        self,
        *args,
        density: float = 0.2,
        epsilon: float = 0.1,
        combine: str = "ties",
        seed: int = 0,
        lam: float = 1.0,
        add_base: bool = True,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        if epsilon < 0.0:
            raise ValueError(f"della epsilon must be >= 0, got {epsilon}")
        lo, hi = density - epsilon / 2.0, density + epsilon / 2.0
        if not (0.0 < lo and hi <= 1.0):
            raise ValueError(
                f"della density={density} with epsilon={epsilon} puts keep "
                f"probabilities in [{lo}, {hi}], outside (0, 1]"
            )
        if combine not in ("sum", "ties"):
            raise ValueError(
                f"della combine must be 'sum' or 'ties', got {combine!r}"
            )
        self.density = float(density)
        self.epsilon = float(epsilon)
        self.combine = combine
        self.seed = int(seed)
        self.lam = float(lam)
        self.add_base = bool(add_base)

    def get_readme(self) -> str:
        return f"""# Merged Model

Base Model: {self.config.output_base_model}
Finetuned Models:
{chr(10).join('- ' + model.model for model in self.config.finetune_merge)}

Merged with DELLA: each delta entry was dropped with probability set by
its within-row magnitude rank (mean keep {self.density:.0%}, spread
{self.epsilon:.0%}, seed={self.seed}), survivors rescaled to keep the
delta's expectation, then combined via {self.combine}
(lambda={self.lam}).
"""

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        models, base = await self._delta_engine_inputs(shard_layer)
        if models is None:
            return base
        deltas = await self.get_delta_for_models(models, shard_layer)
        out = _della_reduce(
            base,
            jnp.stack(deltas),
            jnp.uint32(self.seed),
            jnp.uint32(zlib.crc32(shard_layer.layer_name.encode()) & 0x7FFFFFFF),
            self.combine == "ties",
            jnp.float32(self.density),
            jnp.float32(self.epsilon),
            jnp.float32(self.lam),
            jnp.bool_(self.add_base),
        )
        return np.asarray(out)
