"""Model Stock merging: angle-derived interpolation toward the base.

A post-reference capability (no counterpart in /root/reference): the
closed-form method of Jang et al. 2024 ("Model Stock: All we need is just a
few fine-tuned models", arXiv:2403.19522). Finetuned weights of the same
base lie on a thin shell around a center; the center is approximated by
interpolating between the finetunes' average and the BASE with a ratio
computed from the angle between the task deltas — no search, no extra
forward passes.

Per tensor, with raw deltas ``d_m = ft_m - base`` (N >= 2 models):

1. ``cos_theta`` — the mean pairwise cosine similarity over all model
   pairs (the paper assumes a shared angle; averaging is its N-model
   estimator). Zero-norm deltas contribute cosine 0.
2. ``t = N*cos_theta / (1 + (N-1)*cos_theta)`` — the paper's ratio of the
   projected center. When the denominator is ~0 (pathologically
   anti-aligned deltas) or ``t`` falls outside [0, 1], it is clamped into
   [0, 1]: the interpolation contract (between base and the finetune
   average) is kept rather than extrapolated.
3. ``out = base + t * mean(d_m)`` — i.e. ``(1-t)*base + t*avg(finetunes)``.

Deliberate deviations, documented:

- Per-TENSOR ratio, not per-layer-group: the streaming one-tensor-at-a-time
  pipeline computes t from exactly the tensor being merged (the paper's
  per-layer granularity coincides when a "layer" is one weight matrix).
- ``alpha`` is IGNORED (warned once): the geometry argument needs raw
  deltas; scaling them would fake the angle. There are no other knobs —
  Model Stock's whole point is being hyperparameter-free, so OPTIONS is
  empty and the engine refuses configs with fewer than two finetunes.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigError
from ..io.writer import ShardLayer
from .base import MergeTensorsBase

logger = logging.getLogger(__name__)


@jax.jit
def _stock_reduce(base, deltas):
    n = deltas.shape[0]  # static under jit
    flat = deltas.reshape(n, -1)
    gram = flat @ flat.T  # (N, N): pairwise dots
    norms = jnp.sqrt(jnp.diagonal(gram))
    denom = jnp.outer(norms, norms)
    cos = jnp.where(denom > 0.0, gram / jnp.maximum(denom, 1e-30), 0.0)
    # mean over the N*(N-1)/2 distinct pairs == (sum(off-diagonal)) / (N^2-N)
    cos_theta = (jnp.sum(cos) - jnp.trace(cos)) / jnp.float32(n * n - n)
    t_denom = 1.0 + (n - 1) * cos_theta
    t = jnp.where(
        jnp.abs(t_denom) > 1e-6, n * cos_theta / t_denom, 0.0
    )
    t = jnp.clip(t, 0.0, 1.0)
    return base.astype(jnp.float32) + t * jnp.mean(deltas, axis=0), t


class ModelStockMerge(MergeTensorsBase):
    """Angle-ratio interpolation between the base and the finetune mean."""

    OPTIONS = frozenset()

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if len(self.config.finetune_merge) < 2:
            raise ConfigError(
                "model-stock needs at least two finetunes (the ratio is "
                f"computed from the angle between their deltas); got "
                f"{len(self.config.finetune_merge)}"
            )
        if any(m.alpha != 1.0 for m in self.config.finetune_merge):
            logger.warning(
                "model-stock ignores per-model alpha values: the "
                "interpolation ratio is derived from the raw delta "
                "geometry (arXiv:2403.19522)"
            )

    def get_readme(self) -> str:
        return f"""# Merged Model

Base Model: {self.config.output_base_model}
Finetuned Models:
{chr(10).join('- ' + model.model for model in self.config.finetune_merge)}

Merged with Model Stock: per tensor, the base was interpolated toward the
average of the finetunes with the ratio t = N cos(theta) / (1 + (N-1)
cos(theta)) derived from the mean pairwise angle between the task deltas.
"""

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        models, base = await self._delta_engine_inputs(shard_layer)
        if models is None:
            return base
        if len(models) < 2:
            logger.warning(
                "model-stock: only %d model(s) cover layer %s; passing "
                "base through (the angle ratio needs two deltas)",
                len(models),
                shard_layer.layer_name,
            )
            self.stats.tensors_passthrough += 1
            return np.asarray(base)
        deltas = await self.get_delta_for_models(
            models, shard_layer, apply_alpha=False
        )
        out, _t = _stock_reduce(base, jnp.stack(deltas))
        return np.asarray(out)
