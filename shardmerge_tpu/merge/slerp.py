"""Weight-space SLERP merge.

A post-reference capability: per-tensor spherical interpolation between two
checkpoints — with one configured finetune the endpoints are (base, ft); with
two they are (ft1, ft2). ``t`` rides ``method_options`` (0 = first endpoint,
1 = second).

This is deliberately NOT the reference's FFT-component slerp
(shard/tensor/functions.py:24-43, reproduced in ops/blend.py for the fourier
engines): that variant mixes an unnormalized v0 with a unit relative vector —
correct for its masked spectral blend, wrong for whole weight tensors. Here
each tensor is treated as one flat vector with the standard construction:

    u_i = v_i / ||v_i||                     (endpoint directions)
    out_dir = (sin((1-t)θ)·u0 + sin(tθ)·u1) / sin(θ),  θ = acos(u0·u1)
    out = out_dir · ((1-t)·||v0|| + t·||v1||)          (norms lerped)

falling back to plain lerp when the endpoints are near-colinear
(|dot| > 0.9995 — sin(θ) degenerates; this also covers tensors identical
between the endpoints, e.g. untouched embeddings) or when either norm is
zero.
"""

from __future__ import annotations

import asyncio
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import INPUT_LAYER, OUTPUT_LAYER
from ..io.writer import ShardLayer
from .base import MergeTensorsBase

logger = logging.getLogger(__name__)

_COLINEAR = 0.9995


@jax.jit
def _slerp_pair(v0, v1, t):
    v0 = v0.astype(jnp.float32)
    v1 = v1.astype(jnp.float32)
    n0 = jnp.sqrt(jnp.sum(v0 * v0))
    n1 = jnp.sqrt(jnp.sum(v1 * v1))
    safe0 = jnp.maximum(n0, 1e-12)
    safe1 = jnp.maximum(n1, 1e-12)
    u0 = v0 / safe0
    u1 = v1 / safe1
    dot = jnp.clip(jnp.sum(u0 * u1), -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-12)
    out_dir = (
        jnp.sin((1.0 - t) * theta) * u0 + jnp.sin(t * theta) * u1
    ) / sin_theta
    spherical = out_dir * ((1.0 - t) * n0 + t * n1)
    lerp = (1.0 - t) * v0 + t * v1
    degenerate = (jnp.abs(dot) > _COLINEAR) | (n0 == 0.0) | (n1 == 0.0)
    return jnp.where(degenerate, lerp, spherical)


class SlerpMerge(MergeTensorsBase):
    """Spherical interpolation between exactly two checkpoints."""

    OPTIONS = frozenset({"t"})

    def __init__(self, *args, t: float = 0.5, **kwargs):
        super().__init__(*args, **kwargs)
        if not 0.0 <= t <= 1.0:
            raise ValueError(f"slerp t must be in [0, 1], got {t}")
        self.t = float(t)
        n = len(self.config.finetune_merge)
        if n not in (1, 2):
            raise ValueError(
                f"slerp interpolates exactly two checkpoints: configure one "
                f"finetune (endpoints base -> model) or two (model -> model); "
                f"got {n}"
            )

    def get_readme(self) -> str:
        names = [m.model for m in self.config.finetune_merge]
        if len(names) == 1:
            endpoints = f"{self.config.output_base_model} -> {names[0]}"
        else:
            endpoints = f"{names[0]} -> {names[1]}"
        return f"""# Merged Model

Base Model: {self.config.output_base_model}
Finetuned Models:
{chr(10).join('- ' + n for n in names)}

Merged by per-tensor spherical interpolation (t={self.t}) along
{endpoints}, with lerp fallback for near-colinear tensors.
"""

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
        name = shard_layer.layer_name
        if not models:
            logger.warning("No models cover layer %s; passing base through", name)
            return np.asarray(await self.get_base_output_tensor(shard_layer))

        if len(self.config.finetune_merge) == 1:
            uris = [self.config.output_base_model, models[0].model]
        else:
            # endpoints are the two configured finetunes, in order; a
            # layer-gated endpoint falls back to the base model so the arc
            # stays defined at every layer
            uris = []
            for m in self.config.finetune_merge:
                if m in models:
                    uris.append(m.model)
                else:
                    logger.warning(
                        "slerp endpoint %s gated out at layer %s; using base",
                        m.model,
                        name,
                    )
                    uris.append(self.config.output_base_model)
        # warm both endpoint shards, then fetch concurrently: per-layer wall
        # is max() of the two downloads, not their sum
        await asyncio.gather(
            *[self.index_manager.preload_tensor(u, name) for u in uris]
        )
        v0, v1 = await asyncio.gather(
            self._fetch(uris[0], name), self._fetch(uris[1], name)
        )
        out = _slerp_pair(v0, v1, jnp.float32(self.t))
        return np.asarray(out)
