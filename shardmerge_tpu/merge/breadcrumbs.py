"""Model Breadcrumbs merging: mask both tails of each delta's magnitudes.

A post-reference capability (no counterpart in /root/reference): the
procedure of Davari & Belilovsky 2023 ("Model Breadcrumbs: Scaling
Multi-Task Model Merging with Sparse Masks", arXiv:2312.06795) — per-model
task deltas carry interference at BOTH ends of the magnitude distribution:
near-zero noise and a few dominant outliers. Each delta is therefore
masked to its middle magnitude band before combining.

Per tensor, with fp32 alpha-weighted deltas ``d_m = alpha_m * (ft_m - base)``:

1. **Mask the tails** — drop the ``beta`` fraction of SMALLEST-|.| entries
   and the ``gamma`` fraction of LARGEST-|.| entries of each model's delta;
   keep the band between. Both thresholds are EXACT order statistics of
   ``|d_m|`` (ops/select.py bit-bisection — no sort, no quantile
   approximation, per the repo-wide percentile policy). Tie semantics,
   documented and pinned by test: entries equal to the LOWER threshold are
   kept (it is the smallest surviving magnitude — inclusive, like the TIES
   trim); entries equal to the UPPER threshold are dropped (it is the
   smallest discarded magnitude — the top-gamma set is computed first).
2. **Combine** — ``combine="sum"`` (default, the paper: the masked deltas
   add onto the base) or ``combine="ties"`` (sign election + disjoint mean,
   mergekit's breadcrumbs_ties variant).

Output is ``base + lam * combined`` (``add_base=False`` gates the
delta-artifact mode). The mask is per-tensor, not checkpoint-global, for
the same streaming/resume reasons as the TIES engine (see ties.py scope
note). No randomness: breadcrumbs is fully deterministic.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.writer import ShardLayer
from ..ops.select import kth_smallest_nonneg
from .base import MergeTensorsBase
from .ties import elect_disjoint_mean

logger = logging.getLogger(__name__)


def tail_counts(n: int, beta: float, gamma: float):
    """(k_low, k_top): how many smallest / largest entries are dropped from
    an n-element tensor. The COUNT-space band is kept nonempty on
    degenerate tiny tensors; note the guarantee is count-space only —
    mask_tails works in VALUE space, so a tensor whose magnitudes all tie
    at the upper threshold still zeroes entirely under the documented
    exclusive-high tie policy (all entries equal the smallest discarded
    magnitude)."""
    k_low = int(round(beta * n))
    k_top = int(round(gamma * n))
    if k_low + k_top >= n:  # degenerate tiny tensors: keep the band nonempty
        k_top = min(k_top, n - 1)
        k_low = min(k_low, n - 1 - k_top)
    return k_low, k_top


@partial(jax.jit, static_argnums=(1, 2))
def mask_tails(deltas: jnp.ndarray, k_low: int, k_top: int) -> jnp.ndarray:
    """Zero the k_low smallest-|.| and k_top largest-|.| entries of each row
    of a (N, numel) delta stack; exact per-model thresholds."""
    mags = jnp.abs(deltas)
    n = deltas.shape[-1]
    out = deltas
    if k_top > 0:
        # s[n - k_top] is the smallest of the top-gamma set: drop >= it
        hi = jax.vmap(lambda m: kth_smallest_nonneg(m, n - k_top))(mags)
        out = jnp.where(mags >= hi[:, None], 0.0, out)
    if k_low > 0:
        # s[k_low] is the smallest survivor of the low cut: keep >= it
        lo = jax.vmap(lambda m: kth_smallest_nonneg(m, k_low))(mags)
        out = jnp.where(mags >= lo[:, None], out, 0.0)
    return out


@partial(jax.jit, static_argnums=(2, 3, 4))
def _breadcrumbs_reduce(base, deltas, k_low, k_top, combine_ties, lam,
                        add_base):
    flat = deltas.reshape(deltas.shape[0], -1)
    banded = mask_tails(flat, k_low, k_top)
    if combine_ties:
        combined = elect_disjoint_mean(banded)
    else:
        combined = jnp.sum(banded, axis=0)
    out = lam * combined.reshape(deltas.shape[1:])
    return jnp.where(add_base, out + base.astype(jnp.float32), out)


class BreadcrumbsMerge(MergeTensorsBase):
    """Two-tail magnitude-masked delta merge (Model Breadcrumbs)."""

    OPTIONS = frozenset({"beta", "gamma", "combine", "lam", "add_base"})

    def __init__(
        self,
        *args,
        beta: float = 0.85,
        gamma: float = 0.01,
        combine: str = "sum",
        lam: float = 1.0,
        add_base: bool = True,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        if not 0.0 <= beta < 1.0:
            raise ValueError(f"breadcrumbs beta must be in [0, 1), got {beta}")
        if not 0.0 <= gamma < 1.0:
            raise ValueError(
                f"breadcrumbs gamma must be in [0, 1), got {gamma}"
            )
        if beta + gamma >= 1.0:
            raise ValueError(
                f"breadcrumbs beta + gamma must be < 1 (got {beta} + {gamma}"
                " — the kept band would be empty)"
            )
        if combine not in ("sum", "ties"):
            raise ValueError(
                f"breadcrumbs combine must be 'sum' or 'ties', got {combine!r}"
            )
        self.beta = float(beta)
        self.gamma = float(gamma)
        self.combine = combine
        self.lam = float(lam)
        self.add_base = bool(add_base)

    def get_readme(self) -> str:
        return f"""# Merged Model

Base Model: {self.config.output_base_model}
Finetuned Models:
{chr(10).join('- ' + model.model for model in self.config.finetune_merge)}

Merged with Model Breadcrumbs: each delta was masked to its middle
magnitude band (bottom {self.beta:.0%} and top {self.gamma:.0%} of entries
dropped), then combined via {self.combine} (lambda={self.lam}).
"""

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        models, base = await self._delta_engine_inputs(shard_layer)
        if models is None:
            return base
        deltas = await self.get_delta_for_models(models, shard_layer)
        stack = jnp.stack(deltas)
        k_low, k_top = tail_counts(
            int(np.prod(stack.shape[1:])), self.beta, self.gamma
        )
        out = _breadcrumbs_reduce(
            base,
            stack,
            k_low,
            k_top,
            self.combine == "ties",
            jnp.float32(self.lam),
            jnp.bool_(self.add_base),
        )
        return np.asarray(out)
