"""Merge orchestration base.

Parity surface: reference shard/merge/base.py:96-223 (MergeTensorsBase).
The reference's unused TaskRunner (base.py:37-94, dead code) is intentionally
not carried over.

Data flow per tensor: host numpy (mmap view / download) -> ``jax.device_put``
-> fp32 delta on device -> reduction -> ``base + delta`` -> bf16 -> host ->
writer. Device placement is implicit (the default JAX device, i.e. the TPU
when present); tests run the same code on CPU.
"""

from __future__ import annotations

import asyncio
import logging
import os
import time
from abc import ABC, abstractmethod
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MergeConfig, MergeModel
from ..constants import INPUT_LAYER, OUTPUT_LAYER
from ..io.index import HFMultiModelIndex
from ..io.writer import ModelWriter, ShardLayer
from ..ops.profiling import MergeStats, phase_profiler

logger = logging.getLogger(__name__)


@jax.jit
def _delta_fp32(ft, base):
    """(finetune - base) in fp32 (reference base.py:121-137 without alpha)."""
    return ft.astype(jnp.float32) - base.astype(jnp.float32)


@jax.jit
def _scale(x, alpha):
    return x * alpha


class MergeTensorsBase(ABC):
    """Merges multiple finetuned models by computing and combining deltas."""

    # YAML ``method_options`` keys this engine accepts (validated by the CLI
    # so a typo'd knob fails loudly instead of merging with defaults).
    OPTIONS: frozenset = frozenset()

    def __init__(
        self,
        config: MergeConfig,
        index_manager=None,
        **_ignored,  # engines absorb wiring kwargs they don't use
    ):
        self.config = config
        # explicit None check: an empty OfflineMultiModelIndex is falsy (__len__)
        self.index_manager = (
            index_manager if index_manager is not None else HFMultiModelIndex()
        )
        self.stats = MergeStats()
        # (model_uri, tensor_name) -> device array already placed this
        # layer; see _fetch. NOTE: safe only while no kernel donates its
        # inputs (none in the merge path does).
        self._placed: dict = {}
        # tensor names whose merge already completed — guards late
        # device-prefetch tasks from re-staging (and thus leaking) buffers
        self._released_layers: set = set()
        # how many layers ahead to stage on-device (<= prefetch_depth);
        # DMA for layer n+1 then overlaps layer n's compute on real hosts
        self.device_prefetch_depth = _ignored.get(
            "device_prefetch_depth",
            int(os.environ.get("SHARDMERGE_DEVICE_PREFETCH", "1")),
        )
        # tensor name -> true (pre-padding) row count, for engines that pad
        # rows to shard tensors whose row count does not divide the mesh
        self._true_rows: dict = {}
        # Tensors below this element count compute on the host CPU backend:
        # their math is trivial, and keeping them off the accelerator avoids
        # a per-shape TPU compile and a dispatch round-trip for every
        # layernorm-sized tensor (a Llama family has ~2x layers of them).
        self.small_tensor_numel = _ignored.get("small_tensor_numel", 1 << 18)
        # How many layers ahead to start host reads (SURVEY.md §7 step 4:
        # double-buffered host->HBM pipeline; the reads for layer n+1..n+k
        # run in worker threads while layer n computes/transfers). 0 = off.
        # Env override so CLI runs (rehearsals) can A/B the pipeline depth.
        self.prefetch_depth = _ignored.get(
            "prefetch_depth",
            int(os.environ.get("SHARDMERGE_PREFETCH_DEPTH", "2")),
        )
        # Tensors ABOVE this element count compute on the host CPU backend:
        # the FFT pair merge holds ~6-8 fp32 copies of the tensor live
        # (inputs + two complex half-spectra + masks + result), so a 70B
        # embed/lm_head (128256x8192, 4.2 GB fp32) blows a 16 GB HBM even
        # alone — measured: its merge kernel fails to compile on a v5e
        # (scripts/kernel70b_probe.py). 2^29 elements ~ 2 GB fp32 ~ 16 GB
        # working set. Mesh-sharded runs ignore this (the working set
        # divides across devices).
        self.huge_tensor_numel = _ignored.get(
            "huge_tensor_numel",
            int(os.environ.get("SHARDMERGE_HUGE_TENSOR_NUMEL", str(1 << 29))),
        )

    @abstractmethod
    def get_readme(self) -> str:
        """README text for the output model."""
        return "No readme defined"

    @abstractmethod
    async def _merge_layer(self, shard_layer: ShardLayer) -> np.ndarray:
        """Produce the merged tensor for one layer."""
        raise NotImplementedError

    def _sharding_for(self, host: np.ndarray):
        """Placement policy for a host tensor; None = default single device.
        Engines override to shard huge tensors over a mesh."""
        return None

    def _on_device_band(self, numel: int) -> bool:
        """True when a tensor of ``numel`` elements merges on the default
        accelerator (the single policy shared by demand placement and
        device prefetch; see __init__ for the band rationale)."""
        return self.small_tensor_numel <= numel < self.huge_tensor_numel

    def _device_for(self, host: np.ndarray):
        """Small AND huge tensors are pinned to the host CPU backend (see
        __init__: small ones to dodge per-shape compiles + dispatch
        round-trips, huge ones because their merge working set exceeds
        device HBM)."""
        if self._on_device_band(host.size):
            return None
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            return None
        if jax.devices()[0].platform == "cpu":
            return None  # already on CPU; leave placement implicit
        if host.size >= self.huge_tensor_numel:
            logger.info(
                "tensor of %.1fM elements exceeds the device working-set "
                "budget; merging on the host CPU backend", host.size / 1e6
            )
        return cpus[0]

    def _pad_rows_for(self, host: np.ndarray, sharding) -> int:
        """Zero-padding rows needed for an even row shard (0 = none).
        Engines that shard override the policy via _sharding_for; the pad is
        recorded per tensor name in ``_true_rows`` so merge kernels can slice
        the true spectrum (parallel/fft2d.py padded layouts)."""
        return 0

    async def _fetch(self, model_uri: str, tensor_name: str) -> jnp.ndarray:
        """Fetch a tensor to the device (single host->HBM transfer).

        Placement is deduped per (model, tensor) within a layer: a
        2-finetune merge otherwise uploads the shared base tensor three
        times (once per delta + once as the output base) — the index cache
        dedupes the host READ but each ``device_put`` is its own wire
        transfer (reference base.py:121-137 re-fetches the same way, but
        its cost is a host dict lookup, not a PCIe/relay copy). The cache
        is released as soon as the layer's merge returns
        (``_release_placed``) so device-memory holding time does not grow.
        """
        key = (model_uri, tensor_name)
        cached = self._placed.get(key)
        if cached is not None:
            self.stats.h2d_dedup_hits += 1
            return cached
        t0 = time.perf_counter()
        host = await self.index_manager.get_tensor(model_uri, tensor_name).get()
        t1 = time.perf_counter()
        self.stats.span_fetch_s += t1 - t0
        cached = self._placed.get(key)  # a device-prefetch task may have won
        if cached is not None:
            self.stats.h2d_dedup_hits += 1
            return cached
        try:
            placed = self._place(host, tensor_name)
            self._placed[key] = placed
            self.stats.h2d_bytes += host.nbytes
            return placed
        finally:
            self.stats.span_h2d_s += time.perf_counter() - t1

    def _place(self, host: np.ndarray, tensor_name: str) -> jnp.ndarray:
        sharding = self._sharding_for(host)
        if sharding:
            pad = self._pad_rows_for(host, sharding)
            if pad:
                self._true_rows[tensor_name] = host.shape[0]
                host = np.pad(host, ((0, pad),) + ((0, 0),) * (host.ndim - 1))
            self.stats.tensors_sharded += 1
            return jax.device_put(host, sharding)
        device = self._device_for(host)
        return jax.device_put(host, device) if device else jax.device_put(host)

    async def get_base_output_tensor(self, shard_layer: ShardLayer) -> jnp.ndarray:
        """Base-model tensor in fp32 (reference base.py:117-119)."""
        t = await self._fetch(self.config.output_base_model, shard_layer.layer_name)
        return t.astype(jnp.float32)

    async def _passthrough(self, shard_layer: ShardLayer, which: str) -> np.ndarray:
        """Input/output layer passthrough with base-model fallback
        (reference fast_fourier.py:104-130); shared by every engine that
        honors the is_input/is_output flags."""
        flag = "is_input" if which == "input" else "is_output"
        chosen = next(
            (m for m in self.config.finetune_merge if getattr(m, flag)), None
        )
        if chosen is None:
            chosen = MergeModel(
                model=self.config.output_base_model,
                base=self.config.output_base_model,
            )
        logger.info(
            "Passthrough - %s is an %s layer, using %s",
            shard_layer.layer_name,
            which,
            chosen.model,
        )
        return await self.index_manager.get_tensor(
            chosen.model, shard_layer.layer_name
        ).get()

    async def _delta_engine_inputs(self, shard_layer: ShardLayer):
        """The shared prologue of the delta-stack engines (ties / dare /
        linear): input/output passthrough gates, per-layer model filtering
        via use_layer_index, base fetch, and a concurrent shard warm-up.

        Returns ``(models, base_fp32)`` for a real merge, or
        ``(None, finished_tensor)`` when the layer resolves without one
        (sentinel passthrough, or every model layer-gated out)."""
        if shard_layer.layer_number == INPUT_LAYER:
            self.stats.tensors_passthrough += 1
            return None, await self._passthrough(shard_layer, "input")
        if shard_layer.layer_number == OUTPUT_LAYER:
            self.stats.tensors_passthrough += 1
            return None, await self._passthrough(shard_layer, "output")

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
            return None, np.asarray(base)

        await asyncio.gather(
            *[
                self.index_manager.preload_tensor(m.model, shard_layer.layer_name)
                for m in models
            ]
        )
        return models, base

    async def get_delta_for_models(
        self,
        models: List[MergeModel],
        shard_layer: ShardLayer,
        apply_alpha: bool = True,
    ) -> List[jnp.ndarray]:
        """Per-model fp32 deltas ``(ft - base) [* alpha]``.

        Parity: reference base.py:121-137 — base tensors are fetched once per
        distinct base uri (the index memory cache provides the reuse).
        """
        results = []
        name = shard_layer.layer_name
        for model in models:
            base_tensor = await self._fetch(model.base, name)
            model_tensor = await self._fetch(model.model, name)
            delta = _delta_fp32(model_tensor, base_tensor)
            if apply_alpha:
                delta = _scale(delta, jnp.float32(model.alpha))
            results.append(delta)
        # the finetune (and any non-output base) inputs are consumed by the
        # deltas; dropping their cache refs lets HBM reclaim them during the
        # multi-round reduction — otherwise the stepwise path pins N+1 input
        # tensors that the hbm_budget spill accounting never sees
        for model in models:
            self._placed.pop((model.model, name), None)
            if model.base != self.config.output_base_model:
                self._placed.pop((model.base, name), None)
        return results

    async def initialize(self):
        """Register all models and validate identical key sets
        (reference base.py:139-162)."""
        await self._add_model(self.config.output_base_model)
        self.index_doc = self.index_manager.get_index(self.config.output_base_model)

        for model in self.config.finetune_merge:
            await self._add_model(model.base)
            await self._add_model(model.model)

        base_keys = self.index_manager.get_model_keys(self.config.output_base_model)
        for model in self.config.finetune_merge:
            model_keys = self.index_manager.get_model_keys(model.model)
            missing_keys = base_keys - model_keys
            extra_keys = model_keys - base_keys
            if missing_keys or extra_keys:
                raise ValueError(
                    f"Model {model.model} architecture mismatch with base model "
                    f"{self.config.output_base_model}\n"
                    f"Missing keys: {missing_keys}\n"
                    f"Extra keys: {extra_keys}"
                )

    async def _add_model(self, model_uri: str):
        """add_model across both index flavors (HF is async, offline is not)."""
        result = self.index_manager.add_model(model_uri)
        if asyncio.iscoroutine(result):
            await result

    def _is_primary(self) -> bool:
        """Multi-host: only process 0 writes output files."""
        try:
            return jax.process_index() == 0
        except Exception:
            return True

    def _to_host(self, tensor) -> np.ndarray:
        """Device->host, gathering cross-host shards first (collective —
        every process must call it for every tensor, in order)."""
        if isinstance(tensor, jax.Array) and not tensor.is_fully_addressable:
            return self._gather_cross_host(tensor)
        return np.asarray(tensor)

    def _gather_cross_host(self, tensor) -> np.ndarray:
        """Gather a cross-host-sharded tensor in bounded row blocks.

        ``process_allgather`` of a whole tensor materializes a full host
        copy on EVERY process — at 70B scale (4.2 GB embed) that is P full
        copies for one write. Instead gather row blocks of at most
        SHARDMERGE_GATHER_BLOCK_BYTES (default 256 MiB): the primary
        assembles the result into one preallocated array; other processes
        hold a single transient block (they participate in the collectives
        but never keep the data — their writer is read_only)."""
        from jax.experimental import multihost_utils

        limit = int(
            os.environ.get("SHARDMERGE_GATHER_BLOCK_BYTES", 256 << 20)
        )
        if tensor.ndim < 2 or tensor.nbytes <= limit:
            return np.asarray(
                multihost_utils.process_allgather(tensor, tiled=True)
            )
        rows = tensor.shape[0]
        step = max(1, limit // max(tensor.nbytes // rows, 1))
        primary = self._is_primary()
        out = np.empty(tensor.shape, tensor.dtype) if primary else None
        for r0 in range(0, rows, step):
            blk = multihost_utils.process_allgather(
                tensor[r0:r0 + step], tiled=True
            )
            if primary:
                out[r0:r0 + step] = np.asarray(blk)
            del blk
        if primary:
            return out
        # non-primary: stats/bookkeeping see the true logical size but no
        # memory is retained (zero-stride broadcast; read_only writers
        # never touch the data)
        return np.broadcast_to(
            np.zeros((), tensor.dtype), tensor.shape
        )

    def get_writer(
        self, layer_order: List[str], read_only: Optional[bool] = None
    ) -> ModelWriter:
        """``read_only=True`` forces a writer that never touches the output
        directory (dry-run planning); default: primary process writes."""
        return ModelWriter(
            base_index=self.index_doc,
            output_path=self.config.output_path,
            layer_order=layer_order,
            output_astype=self.config.output_astype,
            write_through=self.config.write_through,
            # overlap shard file IO with compute; finalize() drains
            background_flush=True,
            # multi-host: non-primary processes run the merge loop for the
            # collectives but never touch the output directory
            read_only=(
                read_only if read_only is not None else not self._is_primary()
            ),
        )

    async def merge(self, device: Optional[str] = None):
        """Run the full merge (reference base.py:173-210).

        ``device`` is accepted for CLI parity and ignored: placement is JAX's
        default device.
        """
        await self.initialize()
        logger.info("init complete")

        layer_order = self.index_manager.get_layer_order(
            self.config.output_base_model
        )
        writer = self.get_writer(layer_order)

        for shard_layers in writer.shard_layers():
            pending = [sl for sl in shard_layers if not sl.written]
            await self._process_layers(writer, pending)

        writer.finalize()

        readme = self.get_readme()
        if readme is None:
            readme = "No README defined"
            logger.warning("No README defined. Using default.")
        if self._is_primary():
            with open(self.config.output_path / "README.md", "w") as f:
                f.write(readme)
        logger.info("Merge complete. Output saved to %s", self.config.output_path)
        logger.info("Merge stats: %s", self.stats.summary())

    def _prefetch_layer(
        self, shard_layer: ShardLayer, to_device: bool = False
    ) -> None:
        """Start background host reads for every tensor this layer will
        fetch (fire-and-forget; ``preload_tensor`` dedupes against demand
        fetches). Engines with narrower model coverage may override.

        ``to_device=True`` additionally stages the tensor on its target
        device once the host read lands, so the H2D DMA overlaps the
        current layer's compute (SURVEY.md §7 step 4's double buffering).
        Only tensors in the device-routed size band are staged — small ones
        merge on the host CPU backend anyway, and huge ones would add a
        multi-GB host memcpy alongside the running merge.
        """
        if shard_layer.layer_number in (INPUT_LAYER, OUTPUT_LAYER):
            # passthrough layers host-copy ONE source tensor (the first
            # finetune flagged is_input/is_output, else the base —
            # fourier.py _passthrough); reading anything else ahead is
            # wasted IO, and no device array is ever used
            flag = (
                "is_input"
                if shard_layer.layer_number == INPUT_LAYER
                else "is_output"
            )
            chosen = next(
                (m for m in self.config.finetune_merge if getattr(m, flag)),
                None,
            )
            uris = [chosen.model if chosen else self.config.output_base_model]
            to_device = False
        else:
            uris = [self.config.output_base_model]
            for m in self.config.finetune_merge:
                try:
                    covered = m.use_layer_index(shard_layer.layer_number)
                except Exception:
                    covered = True
                if covered:
                    uris += [m.model, m.base]
        # cross-process runs must not device-stage: a sharded device_put's
        # issue order would depend on per-process IO timing, and multihost
        # transports require identical op order on every process (see
        # parallel/pipeline.py stack_stages)
        if to_device:
            try:
                to_device = jax.process_count() == 1
            except Exception:
                pass
        async def _quiet(coro):
            try:
                await coro
            except Exception:  # noqa: BLE001 — prefetch must never fail a merge
                logger.debug("prefetch skipped", exc_info=True)

        name = shard_layer.layer_name

        async def _stage(uri):
            await self.index_manager.preload_tensor(uri, name)
            if not to_device or name in self._released_layers:
                return
            key = (uri, name)
            if key in self._placed:
                return
            host = await self.index_manager.get_tensor(uri, name).get()
            if not self._on_device_band(host.size):
                return
            # re-check: the demand path may have placed it while the host
            # read was in flight, and the layer may have finished entirely
            if key in self._placed or name in self._released_layers:
                return
            self._placed[key] = self._place(host, name)
            self.stats.h2d_bytes += host.nbytes

        for uri in dict.fromkeys(uris):
            asyncio.create_task(_quiet(_stage(uri)))

    async def _process_layers(
        self, writer: ModelWriter, shard_layers: List[ShardLayer]
    ):
        # Software pipeline (SURVEY.md §7 step 4): while layer n's result is
        # still computing / copying device->host, layer n+1's shard preloads,
        # host reads and host->HBM transfers already run. The deferred
        # write-back (one layer deep) keeps at most one extra output tensor
        # alive; ``prefetch_depth`` layers of host reads run ahead in worker
        # threads.
        shard_layer = None
        pending = None  # (shard_layer, device_or_host_tensor)

        def flush(entry):
            layer, tensor = entry
            self._check_deferred(layer.layer_name)
            t0 = time.perf_counter()
            # waits on the async D2H copy; gathers cross-host shards
            host_tensor = self._to_host(tensor)
            writer.add_tensor(layer.layer_name, host_tensor)
            self.stats.span_flush_s += time.perf_counter() - t0
            self.stats.tensors_merged += 1
            self.stats.bytes_written += host_tensor.nbytes
            self._evict_layer(layer.layer_name)

        try:
            for i, shard_layer in enumerate(shard_layers):
                for j, ahead in enumerate(
                    shard_layers[i + 1:i + 1 + self.prefetch_depth]
                ):
                    self._prefetch_layer(
                        ahead, to_device=j < self.device_prefetch_depth
                    )
                t0 = time.perf_counter()
                with phase_profiler(f"merge {shard_layer.layer_name}"):
                    out_tensor = await self._merge_layer(shard_layer)
                self.stats.span_merge_s += time.perf_counter() - t0
                self._release_placed(shard_layer.layer_name)
                if hasattr(out_tensor, "copy_to_host_async"):
                    out_tensor.copy_to_host_async()
                if pending is not None:
                    flush(pending)
                pending = (shard_layer, out_tensor)
            if pending is not None:
                flush(pending)
        except Exception as e:
            name = shard_layer.layer_name if shard_layer else "?"
            logger.error("Error processing %s: %s", name, e)
            raise

    def _release_placed(self, tensor_name: str):
        """Drop the layer's placed-device-array cache entries (any pending
        async computation keeps the underlying buffers alive on its own)."""
        self._released_layers.add(tensor_name)
        for key in [k for k in self._placed if k[1] == tensor_name]:
            del self._placed[key]

    def _check_deferred(self, layer_name: str):
        """Hook for engines that defer device-side validity checks (e.g. Inf
        flags) to write-back time; default: nothing deferred."""

    def _evict_layer(self, tensor_name: str):
        """Release the layer's tensors from the index memory cache (the
        reference's cache grows unboundedly; see io/index.py)."""
        models = {self.config.output_base_model}
        for m in self.config.finetune_merge:
            models.add(m.model)
            models.add(m.base)
        for model in models:
            self.index_manager.release_tensor(model, tensor_name)
        self._true_rows.pop(tensor_name, None)
