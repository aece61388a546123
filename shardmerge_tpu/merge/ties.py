"""TIES merging: trim, elect sign, disjoint mean.

A post-reference capability (the reference's nearest relative is the
sign-agreement sum of shard/merge/taskaddition.py:67-79, which neither trims
nor averages): the full TIES-Merging procedure of Yadav et al. 2023
("Resolving Interference When Merging Models"), built on this repo's exact
order-statistic machinery.

Per tensor, with fp32 alpha-weighted deltas ``d_m = alpha_m * (ft_m - base)``:

1. **Trim** — keep each model's top ``density`` fraction of entries by
   magnitude, zero the rest. The threshold is the EXACT order statistic of
   ``|d_m|`` (ops/select.py bit-bisection — no sort, no quantile
   approximation, per the repo-wide percentile policy). Entries tied with
   the threshold value are all kept, the same inclusive semantics the
   fourier cutoff uses.
2. **Elect** — per entry, the sign of the summed trimmed values (magnitude
   mass, not a head count: one large delta outvotes two small opposing
   ones).
3. **Disjoint mean** — average the trimmed values whose sign matches the
   elected sign; entries with no agreeing survivor merge to zero.

Output is ``base + lam * merged`` — unlike the reproduced addition /
task-addition quirks, this engine has no reference parity contract, so it
does the useful thing by default (``add_base=False`` gates it off for
delta-artifact workflows).

Scope note: the trim is per-tensor, not global over the whole checkpoint
(the streaming one-pass-per-layer pipeline cannot see a global magnitude
distribution without a second pass). This matches the common practice of
public merge toolkits and keeps the engine resume-safe: a tensor's output
depends only on that tensor's inputs.
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

logger = logging.getLogger(__name__)


def keep_count(n: int, density: float) -> int:
    """How many entries of an n-element tensor survive the trim."""
    return max(1, min(n, int(round(density * n))))


def elect_disjoint_mean(stack: jnp.ndarray) -> jnp.ndarray:
    """Sign election + disjoint mean over a (N, ...) delta stack.

    The elected sign gamma is the sign of the per-entry sum (mass vote);
    the merged value is the mean of the nonzero entries agreeing with
    gamma, or zero when none agree (gamma == 0 only when the entry cancels
    exactly or every model zeroed it)."""
    gamma = jnp.sign(jnp.sum(stack, axis=0))
    agree = (jnp.sign(stack) == gamma[None]) & (stack != 0.0)
    total = jnp.sum(jnp.where(agree, stack, 0.0), axis=0)
    count = jnp.sum(agree.astype(jnp.float32), axis=0)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


@partial(jax.jit, static_argnums=(1,))
def trim_stack(deltas: jnp.ndarray, k_keep: int) -> jnp.ndarray:
    """Zero all but (at least) the k_keep largest-|.|-valued entries of each
    row of a (N, numel)-flattened delta stack; exact per-model thresholds."""
    mags = jnp.abs(deltas)
    n = deltas.shape[-1]
    if k_keep >= n:
        return deltas
    # 0-indexed: sorted ascending s[0..n-1]; the top k_keep live at indices
    # n-k_keep..n-1, so the inclusive threshold is s[n - k_keep].
    thr = jax.vmap(lambda m: kth_smallest_nonneg(m, n - k_keep))(mags)
    return jnp.where(mags >= thr[:, None], deltas, 0.0)


@partial(jax.jit, static_argnums=(2,))
def _ties_reduce(base, deltas, k_keep, lam, add_base):
    flat = deltas.reshape(deltas.shape[0], -1)
    merged = elect_disjoint_mean(trim_stack(flat, k_keep))
    out = lam * merged.reshape(deltas.shape[1:])
    return jnp.where(add_base, out + base.astype(jnp.float32), out)


class TiesMerge(MergeTensorsBase):
    """Trim / elect-sign / disjoint-mean delta merge (TIES)."""

    OPTIONS = frozenset({"density", "lam", "add_base"})

    def __init__(
        self,
        *args,
        density: float = 0.2,
        lam: float = 1.0,
        add_base: bool = True,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        if not 0.0 < density <= 1.0:
            raise ValueError(f"ties density must be in (0, 1], got {density}")
        self.density = float(density)
        self.lam = float(lam)
        self.add_base = bool(add_base)

    def get_readme(self) -> str:
        return f"""# Merged Model

Base Model: {self.config.output_base_model}
Finetuned Models:
{chr(10).join('- ' + model.model for model in self.config.finetune_merge)}

Merged with TIES: each model's delta was trimmed to its top
{self.density:.0%} of entries by magnitude, a sign was elected per entry
by summed mass, and agreeing entries were averaged (lambda={self.lam}).
"""

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        models, base = await self._delta_engine_inputs(shard_layer)
        if models is None:
            return base
        deltas = await self.get_delta_for_models(models, shard_layer)
        stack = jnp.stack(deltas)
        k_keep = keep_count(int(np.prod(stack.shape[1:])), self.density)
        out = _ties_reduce(
            base,
            stack,
            k_keep,
            jnp.float32(self.lam),
            jnp.bool_(self.add_base),
        )
        return np.asarray(out)
