"""Legacy in-RAM Fourier merge engine.

Parity surface: reference shard/merge/fourier.py:35-205 (the older module;
same class name ``FourierMerge`` in the reference — renamed here to avoid
the collision). Differences from the fast path, reproduced:

- real cosine-similarity correlation via correlate_pairs (:131-132) instead
  of the norm-product pseudo-correlation
- target_norm = MEDIAN of delta norms (:124) — torch's lower median for even
  counts, not numpy's midpoint average
- ``task_add_models`` side stack applied at the end with
  task_arithmetic_fft2(agreement=False, t=1) (:191-196)
- REF-QUIRK (:168-171): regime-(c) alphas are looked up by *stack index*
  into config.finetune_merge, which is only correct while the stack order
  matches the config order (acknowledged-unverified in the reference)
- deltas are computed against the OUTPUT base model tensor
  (``ft_tensor -= base_tensor``, :108-113) — the legacy engine never reads
  ``model.base``, unlike the fast engine's per-model bases (base.py:121-137)
- REF-QUIRK (:112-114): model identity for the task-add membership check is
  looked up as ``config.finetune_merge[i]`` where ``i`` enumerates only the
  layer-gated-IN models — when ``use_layer_index`` filters a model out, the
  identities (and hence task-add membership) of the following models shift
- input/output passthrough RAISES when no is_input/is_output model is
  configured (:59-77; the fast path falls back to the base model)
- result is returned un-cast (:198-205); the writer applies output_dtype

Documented deviation (precision upgrade): the reference subtracts in the
LOADED checkpoint dtype (typically bf16, fourier.py:113) and hands those
bf16 deltas to correlate_pairs/norms; this engine computes deltas and norms
in fp32 (the spectral kernels promote to fp32 either way via
``fft_transform(x.float())``, functions.py:45-58, so only the subtraction
and correlation precision differ).
"""

from __future__ import annotations

import asyncio
import logging
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import MergeConfig
from ..constants import INPUT_LAYER, OUTPUT_LAYER
from ..io.writer import ShardLayer
from ..ops import blend
from ..ops.pairing import correlated_pairs, cosine_correlation
from .base import MergeTensorsBase
from .fourier import (
    _batched_norms,
    _pair_add,
    _pair_lowratio,
    _pair_slerp,
)

logger = logging.getLogger(__name__)


def _lower_median(values: List[float]) -> float:
    """torch.median semantics: the lower of the two middle elements."""
    s = sorted(values)
    return s[(len(s) - 1) // 2]


class LegacyFourierMerge(MergeTensorsBase):
    def __init__(
        self,
        config: MergeConfig,
        task_add_models: Optional[List[str]] = None,
        target_norm_offset: float = 1e-10,
        cull_start_pct: float = 0.20,
        index_manager=None,
        **kwargs,
    ):
        super().__init__(config, index_manager, **kwargs)
        self.task_add_models = task_add_models or []
        self.target_norm_offset = target_norm_offset
        self.cull_start_pct = cull_start_pct

    def get_readme(self) -> str:
        models = "\n".join(f"- {m.model}" for m in self.config.finetune_merge)
        return f"""# SLERP-FFT Merged Model
Base: {self.config.output_base_model}
Models merged:
{models}
"""

    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        if shard_layer.layer_number == INPUT_LAYER:
            model = next(
                (m for m in self.config.finetune_merge if m.is_input), None
            )
            if model is None:
                raise ValueError("No input model found")
            return await self.index_manager.get_tensor(
                model.model, shard_layer.layer_name
            ).get()

        if shard_layer.layer_number == OUTPUT_LAYER:
            model = next(
                (m for m in self.config.finetune_merge if m.is_output), None
            )
            if model is None:
                raise ValueError("No output model found")
            return await self.index_manager.get_tensor(
                model.model, shard_layer.layer_name
            ).get()

        base_tensor = await self.get_base_output_tensor(shard_layer)

        models = [
            m
            for m in self.config.finetune_merge
            if m.use_layer_index(shard_layer.layer_number)
        ]
        await asyncio.gather(
            *[
                self.index_manager.preload_tensor(m.model, shard_layer.layer_name)
                for m in models
            ]
        )

        layer_stack = []  # (name, delta) pairs, HBM resident
        add_stack = []
        for i, model in enumerate(models):
            # Legacy deltas subtract the OUTPUT base tensor; model.base is
            # never consulted (reference fourier.py:108-113).
            ft = await self._fetch(model.model, shard_layer.layer_name)
            delta = ft.astype(jnp.float32) - base_tensor
            # REF-QUIRK fourier.py:112-114: identity looked up by position in
            # the gated-in list against the FULL config list.
            identity = self.config.finetune_merge[i]
            if identity.model in self.task_add_models:
                add_stack.append((identity.model, delta))
            else:
                layer_stack.append((identity.model, delta))

        if not layer_stack:
            logger.warning(
                "No models cover layer %s; passing base through",
                shard_layer.layer_name,
            )
            return np.asarray(base_tensor)

        mean_norms = _batched_norms([d for _, d in layer_stack])
        target_norm = _lower_median(mean_norms) + self.target_norm_offset
        cull_pct = self.cull_start_pct
        inf_flags = []
        nan_counts = []

        while len(layer_stack) > 1:
            logger.info(
                "Processing %d layers : %s",
                len(layer_stack),
                ", ".join(n for n, _ in layer_stack),
            )
            correlation = cosine_correlation(
                jnp.stack([d for _, d in layer_stack], axis=0)
            )
            current_norms = _batched_norms([d for _, d in layer_stack])
            next_stack = []

            for x, y, _corr in correlated_pairs(correlation, way="least"):
                if y < 0:
                    next_stack.append(layer_stack[x])
                    continue

                (a_key, a), (b_key, b) = layer_stack[x], layer_stack[y]
                norm_a, norm_b = current_norms[x], current_norms[y]
                if abs(norm_a) < abs(norm_b):
                    a, b = b, a
                    a_key, b_key = b_key, a_key
                    norm_a, norm_b = norm_b, norm_a

                cnorm_a = abs(norm_a / target_norm)
                cnorm_b = abs(norm_b / target_norm)
                n_ratio = cnorm_b / (cnorm_a + 1e-10)

                if cnorm_a < 1e-6:
                    merged = _pair_add(a, b)
                elif cnorm_b < 1e-6 or n_ratio < 0.1:
                    # legacy path does NOT weight-scale b (fourier.py:163-166)
                    scaled_a = a * jnp.float32(target_norm / norm_a)
                    merged = blend.task_arithmetic_fft2(
                        scaled_a, b, jnp.float32(1.0), agreement=True
                    )
                else:
                    # REF-QUIRK fourier.py:168-171: alphas indexed by stack
                    # position into the config list.
                    a_weight = self.config.finetune_merge[x].alpha
                    b_weight = self.config.finetune_merge[y].alpha
                    a_prop = a_weight / (a_weight + b_weight)
                    if norm_b < 1e-4 or norm_a < 1e-4:
                        merged = (a / norm_a) * target_norm
                    else:
                        ratio = norm_b / (norm_a + 1e-10)
                        numel = a.size
                        if ratio < 0.1:
                            merged, nan_count, has_inf = _pair_lowratio(
                                a,
                                b,
                                jnp.float32(norm_a),
                                jnp.float32(norm_b),
                                jnp.float32(a_prop),
                                jnp.float32(target_norm),
                            )
                        else:
                            merged, nan_count, has_inf = _pair_slerp(
                                a,
                                b,
                                jnp.float32(norm_a),
                                jnp.float32(norm_b),
                                jnp.float32(a_prop),
                                jnp.int32(blend.cutoff_rank(numel, 0.08)),
                                jnp.int32(blend.cull_rank(numel, cull_pct)),
                                jnp.int32(blend.cull_limit(numel, cull_pct)),
                                jnp.float32(target_norm),
                                use_cutoff=True,
                                use_cull=cull_pct > 0,
                            )
                        inf_flags.append(has_inf)
                        nan_counts.append(nan_count)

                next_stack.append((f"{a_key}_{b_key}", merged))

            layer_stack = next_stack
            cull_pct = cull_pct / 2.0

        result_tensor = layer_stack[0][1]

        # task-add side stack applied at the end (fourier.py:191-196)
        for model_name, ft_tensor in add_stack:
            result_tensor = blend.task_arithmetic_fft2(
                result_tensor, ft_tensor, jnp.float32(1.0), agreement=False
            )
            logger.info("Arithmetic merged %s", model_name)

        result_tensor = base_tensor + result_tensor
        result_tensor = jnp.where(jnp.isnan(result_tensor), 0.0, result_tensor)

        if nan_counts:
            scrubbed = int(sum(int(c) for c in nan_counts))
            if scrubbed:
                # reference functions.py:211-213 logs when scrubbing NaNs
                logger.info("Warning: NaN in ifft output: %d", scrubbed)
                self.stats.nans_scrubbed += scrubbed
        if inf_flags and bool(jnp.any(jnp.stack(inf_flags))):
            raise ValueError("Inf in ifft output")
        if bool(jnp.any(jnp.isinf(result_tensor))):
            raise ValueError(
                f"Inf in merged tensor for {shard_layer.layer_name}"
            )
        # legacy path returns un-cast fp32 (fourier.py:198-205)
        return np.asarray(result_tensor)
