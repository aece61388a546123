"""Multi-model safetensors index resolution and async tensor fetch.

Parity surface: reference shard/index.py — ModelShard (:30-36), TensorPromise
(:38-58), HFMultiModelIndex (:60-276), OfflineMultiModelIndex (:279-500).

Differences from the reference, by design:
- Tensors resolve to numpy arrays (zero-copy mmap views via
  shardmerge_tpu.io.safetensors_io); device placement is the merge engine's
  job (single ``jax.device_put`` per tensor instead of per-op ``.to()``).
- The canonical weight ordering lives in one function shared by both index
  classes (the reference duplicates it verbatim, index.py:132-187/:349-404).
- The in-memory tensor cache is claim-free but *evictable*
  (``release_tensor``/``clear_memory_cache``); the reference's
  ``_tensor_downloads`` grows without bound (index.py:79, :265).
- Shard downloads honor the model's registered revision (the reference
  hardcodes ``main``, index.py:233,247 — quirk fixed; does not affect
  numerics).
"""

from __future__ import annotations

import asyncio
import json
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from .download import DownloadManager
from .safetensors_io import SafeTensorsReader

logger = logging.getLogger(__name__)

__all__ = [
    "ModelShard",
    "TensorPromise",
    "HFMultiModelIndex",
    "OfflineMultiModelIndex",
    "ordered_weights",
]


@dataclass
class ModelShard:
    """A model weight shard and its metadata (reference index.py:30-36)."""

    filename: str
    contained_keys: List[str]
    weight_map: Dict[str, str]
    local_path: Optional[Path] = None


class TensorPromise:
    """A promise for an eventual (host, numpy) tensor (reference index.py:38-58)."""

    def __init__(self, model_uri: str, tensor_name: str):
        self.model_uri = model_uri
        self.tensor_name = tensor_name
        self._future: asyncio.Future = asyncio.get_event_loop().create_future()

    async def get(self) -> np.ndarray:
        return await self._future

    def set_result(self, tensor: np.ndarray):
        if not self._future.done():
            self._future.set_result(tensor)

    def set_exception(self, exc: Exception):
        if not self._future.done():
            self._future.set_exception(exc)


def _synthesize_single_file_index(model_path: Path) -> dict:
    """A one-shard index dict for a single-file `model.safetensors`
    checkpoint, built from the safetensors header (keys + byte sizes only —
    no tensor data is read)."""
    shard = "model.safetensors"
    with SafeTensorsReader(model_path / shard) as reader:
        names = list(reader.keys())
        total = sum(reader.nbytes(n) for n in names)
    return {
        "metadata": {"total_size": total},
        "weight_map": {name: shard for name in names},
    }


# packed weight-only formats that register as merge inputs: the public
# index presents decoded .weight keys, parts decode lazily per module
PACKED_PARTS = {
    "gptq": ("qweight", "qzeros", "scales", "g_idx"),
    "awq": ("qweight", "qzeros", "scales"),
}


def packed_quant_info(qc: dict) -> Optional[dict]:
    """Normalize a config.json ``quantization_config`` into
    ``{"fmt", "bits", "v1"}`` for the packed formats this index can decode
    (GPTQ, AWQ gemm), None for unquantized/MXFP4 (MXFP4 merges via the
    loader path, not the index). Unsupported AWQ serializations raise —
    silently treating their packed parts as unknown keys would fail the
    merge's key-set validation with a much worse message."""
    method = (qc or {}).get("quant_method")
    if method == "gptq":
        return {
            "fmt": "gptq",
            "bits": int(qc.get("bits", 4)),
            # v1 stores zero-1; gptqmodel marks v2 via checkpoint_format
            "v1": qc.get("checkpoint_format", "gptq") != "gptq_v2",
        }
    if method == "awq":
        version = qc.get("version", "gemm")
        if version != "gemm":
            raise ValueError(
                f"AWQ version {version!r} is not decodable; only the "
                "Hub-dominant 'gemm' serialization is supported"
            )
        if qc.get("zero_point", True) is not True:
            raise ValueError(
                "symmetric AWQ (zero_point: false) is not decodable; only "
                "asymmetric gemm checkpoints are supported"
            )
        return {"fmt": "awq", "bits": int(qc.get("bits", 4)), "v1": False}
    return None


def _virtualize_packed_index(index: dict, fmt: str):
    """(virtual_index, modules) for a GPTQ/AWQ weight map, or None when no
    packed modules exist. The virtual map presents each module's
    ``root.weight`` (mapped to its qweight's shard, for ordering and
    prefetch granularity); passthrough tensors keep their entries.
    ``modules``: virtual key -> module root."""
    required = PACKED_PARTS[fmt]
    parts_by_root: Dict[str, dict] = {}
    passthrough: Dict[str, str] = {}
    for key, shard in index["weight_map"].items():
        part = key.rsplit(".", 1)[-1]
        if part in required:
            root = key.rsplit(".", 1)[0]
            parts_by_root.setdefault(root, {})[part] = shard
        else:
            passthrough[key] = shard
    if not parts_by_root:
        return None
    virtual = dict(passthrough)
    modules = {}
    for root, parts in sorted(parts_by_root.items()):
        missing = set(required) - set(parts)
        if missing:
            raise ValueError(
                f"{fmt.upper()} module {root!r} is missing {sorted(missing)}"
            )
        virtual[root + ".weight"] = parts["qweight"]
        modules[root + ".weight"] = root
    return (
        {
            "metadata": dict(index.get("metadata", {})),
            "weight_map": virtual,
        },
        modules,
    )


def ordered_weights(weight_map: Dict[str, str]) -> List[str]:
    """Canonical weight ordering: embed_tokens, per-layer components (sorted
    alphabetically within each layer), model.norm, lm_head, then everything
    else sorted.

    Parity: reference index.py:132-187 (and its verbatim duplicate
    :349-404), including the completeness check. Documented deviation:
    the reference discovers the component set from layer 0 and projects it
    onto every layer, which crashes its own completeness check on
    heterogeneous stacks (Llama-4 interleaves dense and MoE layers, so
    layer 1 has feed_forward.experts.* where layer 0 has
    feed_forward.gate_proj.*); components are discovered PER LAYER here.
    For homogeneous stacks the orderings are identical.
    """
    weights = list(weight_map.keys())

    embed_weights = sorted(w for w in weights if "embed_tokens" in w)
    layer_weights = [w for w in weights if "layers." in w]
    norm_weights = sorted(w for w in weights if "model.norm.weight" in w)
    lm_head_weights = sorted(w for w in weights if "lm_head" in w)
    special = set(embed_weights + layer_weights + norm_weights + lm_head_weights)
    other_weights = sorted(w for w in weights if w not in special)

    per_layer: Dict[int, List[str]] = {}
    for w in layer_weights:
        layer_num = int(w.split("layers.")[1].split(".")[0])
        per_layer.setdefault(layer_num, []).append(w)

    sorted_layer_weights = [
        w for layer_num in sorted(per_layer) for w in sorted(per_layer[layer_num])
    ]

    result = (
        embed_weights
        + sorted_layer_weights
        + norm_weights
        + lm_head_weights
        + other_weights
    )

    result_set, weights_set = set(result), set(weights)
    if result_set != weights_set:
        missing = weights_set - result_set
        extra = result_set - weights_set
        raise ValueError(
            f"Weight ordering mismatch! Missing: {missing}, Extra: {extra}"
        )
    return result


class _IndexBase:
    """Shared bookkeeping for both index flavors."""

    def __init__(self):
        self.model_indexes: Dict[str, Dict] = {}
        self.model_shards: Dict[str, Dict[str, ModelShard]] = {}
        self._tensor_cache: Dict[Tuple[str, str], np.ndarray] = {}
        self._ordered_weights: Dict[str, List[str]] = {}
        # (model, tensor) -> promises awaiting one in-flight load. Without
        # this, a prefetch racing a demand fetch for the same tensor would
        # read (or download) the shard twice; the reference has the same
        # hazard but never prefetches (index.py:195-221).
        self._inflight: Dict[Tuple[str, str], List[TensorPromise]] = {}
        # model id -> {"pairs", "scale", "base"} for PEFT LoRA adapters
        # registered as models (tensors fuse base + scale*B@A lazily;
        # see _adapter_promise)
        self._adapters: Dict[str, dict] = {}
        # model id -> {"fmt", "bits", "v1", "modules": {vkey: root},
        # "raw": id} for GPTQ/AWQ checkpoints registered as models: the
        # public index presents .weight keys, decoded lazily from the
        # packed parts of a hidden raw registration (see _packed_promise)
        self._packed: Dict[str, dict] = {}

    def _packed_promise(
        self, model_id: str, tensor_name: str
    ) -> Optional[TensorPromise]:
        """A lazily-decoded TensorPromise when ``model_id`` is a GPTQ/AWQ
        model AND ``tensor_name`` is one of its quantized modules, else
        None (passthrough tensors use the normal shard path)."""
        pk = self._packed.get(model_id)
        if pk is None:
            return None
        root = pk["modules"].get(tensor_name)
        if root is None:
            return None
        promise = TensorPromise(model_id, tensor_name)
        cached = self._tensor_cache.get((model_id, tensor_name))
        if cached is not None:
            promise.set_result(cached)
            return promise
        key = (model_id, tensor_name)
        waiters = self._inflight.get(key)
        if waiters is not None:
            waiters.append(promise)
            return promise
        self._inflight[key] = [promise]
        part_promises = {
            part: self.get_tensor(pk["raw"], f"{root}.{part}")
            for part in PACKED_PARTS[pk["fmt"]]
        }
        asyncio.create_task(
            self._decode_packed_tensor(promise, pk, part_promises)
        )
        return promise

    async def _decode_packed_tensor(
        self, promise: TensorPromise, pk: dict, part_promises: dict
    ):
        try:
            parts = {
                name: await p.get() for name, p in part_promises.items()
            }

            def compute():
                from ..models.quant import dequant_awq, dequant_gptq

                if pk["fmt"] == "awq":
                    return dequant_awq(
                        parts["qweight"],
                        parts["qzeros"],
                        parts["scales"],
                        bits=pk["bits"],
                    )
                return dequant_gptq(
                    parts["qweight"],
                    parts["qzeros"],
                    parts["scales"],
                    parts["g_idx"],
                    pk["bits"],
                    v1_zero_offset=pk["v1"],
                )

            w = await asyncio.to_thread(compute)
            # the packed parts were claimed under the raw id; drop them —
            # the decoded weight is what the merge re-fetches
            for name in part_promises:
                self._tensor_cache.pop(
                    (pk["raw"], f"{pk['modules'][promise.tensor_name]}.{name}"),
                    None,
                )
            self._tensor_cache[(promise.model_uri, promise.tensor_name)] = w
            self._settle_load(promise, w)
        except Exception as e:
            logger.exception(
                "Failed to decode %s tensor %s of %s",
                pk["fmt"].upper(),
                promise.tensor_name,
                promise.model_uri,
            )
            self._settle_load(promise, None, e)

    def _register_packed(self, model_id: str, index: dict, info: dict):
        """Shared GPTQ/AWQ registration: register the RAW packed index
        under a hidden id and record the module map. Returns
        (virtual_index, raw_id), or None when the weight map holds no
        packed modules (a mislabeled config). Callers wire the raw id
        into their backend's shard resolution (paths / revisions)."""
        virt = _virtualize_packed_index(index, info["fmt"])
        if virt is None:
            return None
        raw_id = model_id + "#raw"
        virtual_index, modules = virt
        self._register_index(raw_id, index)
        self._packed[model_id] = {**info, "modules": modules, "raw": raw_id}
        logger.info(
            "Registered %s model %r (%d quantized modules, bits=%d): "
            "tensors decode on the fly",
            info["fmt"].upper(),
            model_id,
            len(modules),
            info["bits"],
        )
        return virtual_index, raw_id

    def _register_adapter_entry(
        self,
        model_id: str,
        pairs: dict,
        scale: float,
        base_id: str,
        evict_base: bool = False,
    ):
        """Mirror the base's index/shards/ordering onto an adapter model
        id (an adapter IS identity + low-rank delta) after validating its
        targets exist in the base."""
        missing = sorted(
            set(pairs) - set(self.model_indexes[base_id]["weight_map"])
        )
        if missing:
            raise KeyError(
                f"adapter {model_id!r} targets tensors absent from its "
                f"base {base_id!r}: {missing[:4]}"
                f"{'...' if len(missing) > 4 else ''}"
            )
        self.model_indexes[model_id] = self.model_indexes[base_id]
        self.model_shards[model_id] = self.model_shards[base_id]
        self._ordered_weights[model_id] = self._ordered_weights[base_id]
        self._adapters[model_id] = {
            "pairs": pairs,
            "scale": float(scale),
            "base": base_id,
            # True when the base was registered only to serve this adapter:
            # the merge loop's per-layer eviction never touches it, so the
            # fuse path must drop each base tensor after use or the whole
            # base checkpoint accumulates in the host cache
            "evict_base": bool(evict_base),
        }
        logger.info(
            "Registered LoRA adapter %r on base %r (%d tensor pairs, "
            "scale %g): tensors fuse on the fly",
            model_id,
            base_id,
            len(pairs),
            scale,
        )

    def _adapter_promise(
        self, model_id: str, tensor_name: str
    ) -> Optional[TensorPromise]:
        """A lazily-fused TensorPromise when ``model_id`` is a registered
        adapter, else None (caller falls through to shard loading)."""
        ad = self._adapters.get(model_id)
        if ad is None:
            return None
        promise = TensorPromise(model_id, tensor_name)
        cached = self._tensor_cache.get((model_id, tensor_name))
        if cached is not None:
            promise.set_result(cached)
            return promise
        # dedupe concurrent fuses of the same tensor via _inflight
        key = (model_id, tensor_name)
        waiters = self._inflight.get(key)
        if waiters is not None:
            waiters.append(promise)
            return promise
        self._inflight[key] = [promise]
        base_promise = self.get_tensor(ad["base"], tensor_name)
        asyncio.create_task(
            self._fuse_adapter_tensor(promise, ad, base_promise)
        )
        return promise

    async def _fuse_adapter_tensor(
        self, promise: TensorPromise, ad: dict, base_promise: TensorPromise
    ):
        try:
            base = await base_promise.get()
            pair = ad["pairs"].get(promise.tensor_name)
            if pair is None:
                fused = base  # untargeted: the base tensor, byte-identical
            else:

                def compute():
                    # same math and cast as tools/fuse_lora._fused, so the
                    # on-the-fly and on-disk fusions are byte-identical
                    delta = (
                        pair["B"].astype(np.float32)
                        @ pair["A"].astype(np.float32)
                    ) * np.float32(ad["scale"])
                    return (base.astype(np.float32) + delta).astype(
                        base.dtype
                    )

                fused = await asyncio.to_thread(compute)
            if ad.get("evict_base") and pair is not None:
                # base registered only for this adapter: nothing else will
                # evict its tensors (cf. _decode_packed_tensor's part drop).
                # Untargeted tensors pass through by reference — popping
                # those would orphan the shared array, not free it.
                self._tensor_cache.pop(
                    (ad["base"], promise.tensor_name), None
                )
            self._tensor_cache[(promise.model_uri, promise.tensor_name)] = (
                fused
            )
            self._settle_load(promise, fused)
        except Exception as e:
            logger.exception(
                "Failed to fuse adapter tensor %s of %s",
                promise.tensor_name,
                promise.model_uri,
            )
            self._settle_load(promise, None, e)

    def _join_or_start_load(
        self, promise: TensorPromise, shard_key: Tuple[str, str]
    ) -> None:
        """Attach ``promise`` to an in-flight load of the same tensor, or
        start one (subclass ``_load_tensor`` does the IO)."""
        key = (promise.model_uri, promise.tensor_name)
        waiters = self._inflight.get(key)
        if waiters is not None:
            waiters.append(promise)
            return
        self._inflight[key] = [promise]
        asyncio.create_task(self._load_tensor(promise, shard_key))

    def _settle_load(
        self,
        promise: TensorPromise,
        tensor: Optional[np.ndarray],
        exc: Optional[Exception] = None,
    ) -> None:
        """Resolve every promise joined to this load (incl. ``promise``)."""
        key = (promise.model_uri, promise.tensor_name)
        for p in self._inflight.pop(key, [promise]):
            if exc is not None:
                p.set_exception(exc)
            else:
                p.set_result(tensor)

    def _register_index(self, model_id: str, index: dict):
        if "weight_map" not in index:
            raise ValueError(f"Index for {model_id!r} missing 'weight_map' key")
        self.model_indexes[model_id] = index
        shard_contents: Dict[str, List[str]] = {}
        for tensor_name, shard_file in index["weight_map"].items():
            shard_contents.setdefault(shard_file, []).append(tensor_name)
        self.model_shards[model_id] = {
            shard_file: ModelShard(
                filename=shard_file,
                contained_keys=tensor_keys,
                weight_map={k: shard_file for k in tensor_keys},
            )
            for shard_file, tensor_keys in shard_contents.items()
        }
        self._ordered_weights[model_id] = ordered_weights(index["weight_map"])
        logger.info(
            "Initialized %d shards for model %s", len(shard_contents), model_id
        )

    def _resolve(self, model_id: str) -> str:
        """Map an external model reference to the registered id (the offline
        index accepts both directory names and full paths)."""
        return model_id

    def get_layer_order(self, model_id: str) -> List[str]:
        model_id = self._resolve(model_id)
        if model_id not in self._ordered_weights:
            raise KeyError(f"Model {model_id} not found in index")
        return self._ordered_weights[model_id].copy()

    def get_model_keys(self, model_id: str) -> Set[str]:
        model_id = self._resolve(model_id)
        if model_id not in self.model_indexes:
            raise KeyError(f"Model {model_id} not found in index")
        return set(self.model_indexes[model_id]["weight_map"].keys())

    def get_index(self, model_id: str) -> Dict:
        """The raw index.json dict for a model."""
        model_id = self._resolve(model_id)
        if model_id not in self.model_indexes:
            raise KeyError(f"Model {model_id} not found in index")
        return self.model_indexes[model_id]

    def release_tensor(self, model_id: str, tensor_name: str):
        """Evict one tensor from the in-memory cache."""
        self._tensor_cache.pop((self._resolve(model_id), tensor_name), None)

    def clear_memory_cache(self):
        self._tensor_cache.clear()

    def __contains__(self, model_id: str) -> bool:
        return self._resolve(model_id) in self.model_indexes

    def __len__(self) -> int:
        return len(self.model_indexes)


class HFMultiModelIndex(_IndexBase):
    """Index backed by HuggingFace Hub downloads (reference index.py:60-276)."""

    def __init__(
        self,
        download_manager: Optional[DownloadManager] = None,
        cache_path: Optional[Path] = None,
        endpoint: Optional[str] = None,
        token: Optional[str] = None,
    ):
        super().__init__()
        from .download import hf_auth_headers

        # index/config/header fetches carry the same HF token the shard
        # streams use (gated repos need it on EVERY request type)
        self.headers = hf_auth_headers(token)
        self.download_manager = download_manager
        self.cache_path = (
            Path(cache_path)
            if cache_path
            else Path.home() / ".cache" / "shardmerge_tpu"
        )
        self.cache_path.mkdir(parents=True, exist_ok=True)
        self._revisions: Dict[str, str] = {}
        # HF_ENDPOINT is the standard huggingface_hub override; it also lets
        # tests serve indexes/shards from a local aiohttp server.
        import os

        self.endpoint = (
            endpoint or os.environ.get("HF_ENDPOINT") or "https://huggingface.co"
        ).rstrip("/")

    async def add_model(self, model_uri: str, revision: str = "main"):
        """Fetch (or load from storage) a model's safetensors index.

        Parity: reference index.py:82-130 — the index json is cached in
        ``storage_dir/<model>/model.safetensors.index.json`` and reused.
        """
        if model_uri in self.model_indexes:
            return

        if model_uri.startswith(("/", "./", "../", "~")):
            # An absolute/relative path here means a local directory that
            # does not exist (the offline index handles real ones). Joined
            # into storage_path it would win the join and mkdir itself into
            # existence — fail loudly instead.
            raise FileNotFoundError(
                f"Model reference {model_uri!r} is a filesystem path, not a "
                "HuggingFace repo id. Offline (local-directory) mode requires "
                "every model reference to be an existing local directory — "
                "check the paths in the config."
            )

        model_path = self.download_manager.storage_path / model_uri
        model_index_path = model_path / "model.safetensors.index.json"
        model_path.mkdir(parents=True, exist_ok=True)

        if model_index_path.exists():
            logger.info("Model %s already in storage; loading index", model_uri)
            with open(model_index_path) as f:
                index = json.load(f)
        elif (model_path / "adapter_config.json").exists():
            # PEFT adapter persisted by a previous run: re-register from
            # storage (its base re-resolves recursively, storage-first)
            await self._register_hub_adapter(model_uri, model_path)
            return
        else:
            import aiohttp

            index_url = (
                f"{self.endpoint}/{model_uri}/raw/{revision}/"
                "model.safetensors.index.json"
            )
            async with aiohttp.ClientSession(headers=self.headers) as session:
                async with session.get(index_url) as response:
                    if response.status in (401, 403):
                        from .download import auth_error

                        raise auth_error(response.status, index_url)
                    if response.status == 404:
                        # Single-file checkpoint: models under the 5 GB
                        # shard cutoff ship one model.safetensors and no
                        # index (the reference 404s here, index.py:98). A
                        # one-shard index is synthesized from the
                        # safetensors HEADER — streamed and aborted after
                        # the header bytes, so --dry-run keeps its
                        # no-weight-fetch contract — and persisted so
                        # re-runs load it straight from storage. The file
                        # itself downloads lazily via _load_tensor.
                        try:
                            index = await self._fetch_single_file_index(
                                model_uri, revision, session
                            )
                        except FileNotFoundError as no_weights:
                            # Third possibility: a PEFT LoRA adapter repo
                            # (adapter_config.json + adapter_model.
                            # safetensors, no full checkpoint) — fetch the
                            # small adapter files, register the adapter's
                            # base, and fuse lazily per tensor.
                            self._revisions[model_uri] = revision
                            try:
                                await self._fetch_adapter_files(
                                    model_uri, revision, session, model_path
                                )
                            except FileNotFoundError:
                                raise no_weights from None
                            await self._register_hub_adapter(
                                model_uri, model_path
                            )
                            return
                        with open(model_index_path, "w") as f:
                            json.dump(index, f)
                    else:
                        response.raise_for_status()
                        text = await response.text()
                        with open(model_index_path, "w") as f:
                            f.write(text)
                        index = json.loads(text)
                        logger.info("Fetched index for model %s", model_uri)

        self._revisions[model_uri] = revision
        index = await self._maybe_register_hub_packed(
            model_uri, revision, model_path, index
        )
        self._register_index(model_uri, index)

    async def _maybe_register_hub_packed(
        self, model_uri: str, revision: str, model_path: Path, index: dict
    ) -> dict:
        """Hub GPTQ/AWQ repos register as ordinary models: when the weight
        map carries packed ``.qweight`` modules, fetch the repo's
        config.json (storage-first; persisted so re-runs register offline),
        read its quantization_config, and stand up the hidden raw
        registration — the returned virtual index presents decoded
        ``.weight`` keys. Unquantized repos return ``index`` unchanged
        with ZERO extra requests (the qweight probe is local)."""
        if not any(
            k.endswith(".qweight") for k in index.get("weight_map", {})
        ):
            return index
        cfg_file = model_path / "config.json"
        if cfg_file.is_file():
            cfg_doc = json.loads(cfg_file.read_text())
        else:
            import aiohttp

            cfg_url = f"{self.endpoint}/{model_uri}/raw/{revision}/config.json"
            async with aiohttp.ClientSession(headers=self.headers) as session:
                async with session.get(cfg_url) as response:
                    if response.status in (401, 403):
                        from .download import auth_error

                        raise auth_error(response.status, cfg_url)
                    if response.status == 404:
                        logger.warning(
                            "Model %s has packed qweight tensors but no "
                            "config.json announcing the format; registering "
                            "raw (the merge's key-set validation will "
                            "likely fail)",
                            model_uri,
                        )
                        return index
                    response.raise_for_status()
                    cfg_doc = json.loads(await response.text())
            # .tmp + rename: a truncated config.json would poison every
            # future registration of this repo (same pattern as
            # _fetch_adapter_files)
            cfg_tmp = model_path / "config.json.tmp"
            cfg_tmp.write_text(json.dumps(cfg_doc))
            cfg_tmp.rename(cfg_file)
        info = packed_quant_info(cfg_doc.get("quantization_config") or {})
        if info is None:
            return index
        reg = self._register_packed(model_uri, index, info)
        if reg is None:
            return index
        virtual_index, raw_id = reg
        # raw shard downloads ride the PUBLIC repo: same URL, same storage
        # partition, shared claims (see _dl_uri)
        self._revisions[raw_id] = revision
        return virtual_index

    async def _fetch_single_file_index(
        self, model_uri: str, revision: str, session
    ) -> dict:
        """One-shard index from the remote file's safetensors header.

        Streams ``model.safetensors`` only until the 8-byte length prefix
        plus the JSON header have arrived, then drops the connection — a
        multi-GB checkpoint costs a few hundred KB here, and the weights
        download lazily through the normal shard machinery."""
        import struct

        self._revisions[model_uri] = revision
        shard_url = self._shard_url(model_uri, "model.safetensors")
        async with session.get(shard_url) as resp:
            if resp.status in (401, 403):
                from .download import auth_error

                raise auth_error(resp.status, shard_url)
            if resp.status == 404:
                raise FileNotFoundError(
                    f"{model_uri}: neither model.safetensors.index.json nor "
                    f"model.safetensors exists at revision {revision!r}"
                )
            resp.raise_for_status()
            buf = b""
            need = None
            async for chunk in resp.content.iter_chunked(1 << 16):
                buf += chunk
                if need is None and len(buf) >= 8:
                    (hlen,) = struct.unpack("<Q", buf[:8])
                    need = 8 + hlen
                if need is not None and len(buf) >= need:
                    break
        if need is None or len(buf) < need:
            raise ValueError(
                f"{model_uri}: model.safetensors truncated before its header"
            )
        header = json.loads(buf[8:need])
        header.pop("__metadata__", None)
        total = sum(
            e["data_offsets"][1] - e["data_offsets"][0]
            for e in header.values()
        )
        logger.info(
            "Synthesized single-file index for model %s from the remote "
            "header (%d tensors)",
            model_uri,
            len(header),
        )
        return {
            "metadata": {"total_size": total},
            "weight_map": {name: "model.safetensors" for name in header},
        }

    async def _fetch_adapter_files(
        self, model_uri: str, revision: str, session, model_path: Path
    ):
        """Download a hub adapter's two small files into storage
        (atomically: .tmp then rename), so re-runs register offline.

        Weights land FIRST: offline re-registration keys on
        adapter_config.json existing, so writing the config last makes a
        crash between the two files invisible (the next run re-fetches)
        instead of leaving a config-without-weights directory that every
        later add_model trips over."""
        for name in ("adapter_model.safetensors", "adapter_config.json"):
            url = self._shard_url(model_uri, name)
            async with session.get(url) as resp:
                if resp.status in (401, 403):
                    from .download import auth_error

                    raise auth_error(resp.status, url)
                if resp.status == 404:
                    raise FileNotFoundError(
                        f"{model_uri}: no {name} at revision {revision!r}"
                    )
                resp.raise_for_status()
                data = await resp.read()
            tmp = model_path / (name + ".tmp")
            tmp.write_bytes(data)
            tmp.rename(model_path / name)
        logger.info(
            "Fetched LoRA adapter files for %s (%d bytes of weights)",
            model_uri,
            (model_path / "adapter_model.safetensors").stat().st_size,
        )

    async def _register_hub_adapter(self, model_uri: str, model_path: Path):
        """Register a downloaded adapter: resolve its base REPO (hub id
        from base_model_name_or_path), then mirror the base's index with
        lazy per-tensor fusion (_register_adapter_entry)."""
        from ..tools.fuse_lora import load_adapter

        pairs, scale = load_adapter(model_path)
        cfg = json.loads((model_path / "adapter_config.json").read_text())
        base_ref = str(cfg.get("base_model_name_or_path") or "")
        if not base_ref:
            raise ValueError(
                f"hub adapter {model_uri} has no base_model_name_or_path; "
                "cannot resolve its base checkpoint"
            )
        implicit_base = base_ref not in self.model_indexes
        await self.add_model(base_ref)
        self._register_adapter_entry(
            model_uri, pairs, scale, base_ref, evict_base=implicit_base
        )

    @staticmethod
    def _dl_uri(model_uri: str) -> str:
        """Download-manager partition/URL identity for a model id: a packed
        model's hidden '<repo>#raw' registration downloads the PUBLIC
        repo's files — same URL, same storage partition, shared claims —
        so a shard holding both packed modules and passthrough tensors
        transfers once."""
        return model_uri.rsplit("#raw", 1)[0]

    def _shard_url(self, model_uri: str, shard_name: str) -> str:
        revision = self._revisions.get(model_uri, "main")
        return (
            f"{self.endpoint}/{self._dl_uri(model_uri)}/resolve/{revision}/"
            f"{shard_name}?download=true"
        )

    def get_tensor(self, model_uri: str, tensor_name: str) -> TensorPromise:
        """Promise for a tensor; fulfilled from the in-memory cache or by an
        async shard download + mmap read (reference index.py:195-221)."""
        if model_uri not in self.model_indexes:
            raise KeyError(f"Model {model_uri} not found in index")
        index = self.model_indexes[model_uri]
        if tensor_name not in index["weight_map"]:
            raise KeyError(f"Tensor {tensor_name} not found in model {model_uri}")

        promise = TensorPromise(model_uri, tensor_name)

        cached = self._tensor_cache.get((model_uri, tensor_name))
        if cached is not None:
            promise.set_result(cached)
            return promise

        fused = self._adapter_promise(model_uri, tensor_name)
        if fused is not None:
            return fused
        decoded = self._packed_promise(model_uri, tensor_name)
        if decoded is not None:
            return decoded

        shard_name = index["weight_map"][tensor_name]
        self._join_or_start_load(promise, (model_uri, shard_name))
        return promise

    async def preload_tensor(self, model_uri: str, tensor_name: str):
        """Warm the shard containing ``tensor_name`` (reference index.py:223-236;
        no_claims=-1 marks an unclaimed warm download)."""
        try:
            ad = self._adapters.get(model_uri)
            if ad is not None:
                # an adapter's shards live in its BASE repo; warm there
                return await self.preload_tensor(ad["base"], tensor_name)
            index = self.model_indexes[model_uri]
            if tensor_name not in index["weight_map"]:
                raise KeyError(
                    f"Tensor {tensor_name} not found in model {model_uri}"
                )
            shard_name = index["weight_map"][tensor_name]
            await self.download_manager.cache_file(
                self._dl_uri(model_uri),
                self._shard_url(model_uri, shard_name),
                no_claims=-1,
            )
        except Exception:
            logger.exception(
                "Failed to preload tensor %s from %s", tensor_name, model_uri
            )

    async def _load_tensor(self, promise: TensorPromise, shard_key: Tuple[str, str]):
        try:
            model_uri, shard_name = shard_key
            shard = self.model_shards[model_uri][shard_name]
            shard_url = self._shard_url(model_uri, shard_name)
            dl_uri = self._dl_uri(model_uri)
            await self.download_manager.cache_file(
                dl_uri, shard_url, no_claims=len(shard.contained_keys)
            )
            task = self.download_manager.downloads[(dl_uri, shard_url)]
            async with task.lock:  # held until the transfer completes
                path = await self.download_manager.get_file(
                    dl_uri, shard_url, claim=True
                )
                if not path:
                    raise RuntimeError(f"Failed to get shard {shard_name}")
                shard.local_path = path

            def read():
                with SafeTensorsReader(shard.local_path) as reader:
                    return reader.get_tensor(promise.tensor_name, copy=True)

            tensor = await asyncio.to_thread(read)
            self._tensor_cache[(model_uri, promise.tensor_name)] = tensor
            self._settle_load(promise, tensor)
        except Exception as e:
            logger.exception(
                "Failed to load tensor %s from %s/%s",
                promise.tensor_name,
                shard_key[0],
                shard_key[1],
            )
            self._settle_load(promise, None, e)


class OfflineMultiModelIndex(_IndexBase):
    """Index over local model directories only (reference index.py:279-500);
    the model id is the directory name.

    Beyond-reference extension: a directory holding a PEFT LoRA adapter
    (``adapter_config.json`` + ``adapter_model.safetensors``, no full
    checkpoint) registers as a model too — its tensors resolve to
    ``base + (alpha/r)·B@A`` fused ON THE FLY against the adapter's
    declared base checkpoint (cached per tensor, computed off-thread).
    A merge config can therefore list LoRA finetunes directly, with no
    intermediate fused checkpoint doubling disk. The fusion math is
    byte-identical to tools/fuse_lora.py's on-disk fusion."""

    def __init__(self):
        super().__init__()
        self.model_paths: Dict[str, Path] = {}
        self._aliases: Dict[str, str] = {}

    def _resolve(self, model_id: str) -> str:
        return self._aliases.get(str(model_id), str(model_id))

    def add_model(self, model_path: Path):
        model_path = Path(model_path)
        if not model_path.is_dir():
            raise NotADirectoryError(
                f"Provided model path is not a directory: {model_path}"
            )
        model_id = model_path.name
        if model_id in self.model_indexes:
            logger.warning("Model %r already added. Skipping.", model_id)
            return

        model_index_path = model_path / "model.safetensors.index.json"
        if model_index_path.exists():
            with open(model_index_path) as f:
                try:
                    index = json.load(f)
                except json.JSONDecodeError as e:
                    raise ValueError(
                        f"Failed to parse index file {model_index_path}: {e}"
                    ) from e
        elif (model_path / "model.safetensors").exists():
            # Single-file checkpoint (HF models under the 5 GB shard cutoff
            # ship one model.safetensors and no index). The reference cannot
            # resolve these (index.py:297-301 requires the index file);
            # synthesize an equivalent one-shard index from the file header
            # so they flow through the same machinery. The writer then
            # mirrors this synthesized layout: a single output shard plus an
            # index.json — valid HF layout, readable by every loader.
            index = _synthesize_single_file_index(model_path)
        elif (model_path / "adapter_config.json").exists():
            # a PEFT LoRA adapter directory: fuse against its base lazily
            self._register_adapter(model_id, model_path)
            return
        else:
            raise FileNotFoundError(
                "Neither 'model.safetensors.index.json', 'model.safetensors' "
                f"nor a PEFT 'adapter_config.json' found in {model_path}"
            )

        # GPTQ/AWQ checkpoints (config.json quantization_config) register
        # a hidden raw index for the packed parts, and the PUBLIC index
        # presents decoded .weight keys — so a local quantized finetune is
        # an ordinary merge input (key sets match the base; tensors decode
        # lazily, see _packed_promise)
        cfg_file = model_path / "config.json"
        if cfg_file.is_file():
            qc = (
                json.loads(cfg_file.read_text()).get("quantization_config")
                or {}
            )
            info = packed_quant_info(qc)
            if info is not None:
                # raw path FIRST: _load_tensor resolves raw reads by path
                self.model_paths[model_id + "#raw"] = model_path
                reg = self._register_packed(model_id, index, info)
                if reg is None:
                    self.model_paths.pop(model_id + "#raw", None)
                else:
                    index, _ = reg

        self.model_paths[model_id] = model_path
        try:
            self._register_index(model_id, index)
        except Exception:
            # roll back the partial registration (reference index.py:339-345)
            self.model_paths.pop(model_id, None)
            self.model_indexes.pop(model_id, None)
            self.model_shards.pop(model_id, None)
            self._packed.pop(model_id, None)
            raise
        # allow lookups by the exact path string used by the caller's config
        self._aliases[model_id] = model_id
        self._aliases[str(model_path)] = model_id
        self._aliases[str(model_path.resolve())] = model_id

    def _register_adapter(self, model_id: str, model_path: Path):
        """Register a PEFT adapter dir: tensors mirror its base's key set
        and resolve to base + scale·B@A. The base comes from the adapter's
        ``base_model_name_or_path`` — an already-registered model (by id,
        path or alias) or a local checkpoint directory to register now."""
        from ..tools.fuse_lora import load_adapter

        pairs, scale = load_adapter(model_path)
        cfg = json.loads((model_path / "adapter_config.json").read_text())
        base_ref = str(cfg.get("base_model_name_or_path") or "")
        base_id = self._aliases.get(base_ref)
        implicit_base = False
        if base_id is None and base_ref and Path(base_ref).is_dir():
            self.add_model(Path(base_ref))
            base_id = self._resolve(base_ref)
            implicit_base = True
        if base_id is None or base_id not in self.model_indexes:
            raise FileNotFoundError(
                f"adapter {model_path} declares base_model_name_or_path="
                f"{base_ref!r}, which is neither a registered model nor a "
                "local checkpoint directory; set it to the adapter's base "
                "checkpoint (or register that base first)"
            )
        self.model_paths[model_id] = model_path
        try:
            # key set, shard layout and canonical ordering ARE the base's
            # (identity plus a low-rank delta)
            self._register_adapter_entry(
                model_id, pairs, scale, base_id, evict_base=implicit_base
            )
        except Exception:
            # same rollback discipline as add_model's packed path: a failed
            # validation must not leave a half-registered model behind
            self.model_paths.pop(model_id, None)
            raise
        self._aliases[model_id] = model_id
        self._aliases[str(model_path)] = model_id
        self._aliases[str(model_path.resolve())] = model_id

    def get_tensor(self, model_id: str, tensor_name: str) -> TensorPromise:
        model_id = self._resolve(model_id)
        if model_id not in self.model_indexes:
            raise KeyError(
                f"Model ID {model_id!r} not found in index. "
                "Add the model with add_model(Path(...)) first."
            )
        index = self.model_indexes[model_id]
        if tensor_name not in index["weight_map"]:
            raise KeyError(f"Tensor {tensor_name!r} not found in model {model_id!r}")

        promise = TensorPromise(model_id, tensor_name)
        cached = self._tensor_cache.get((model_id, tensor_name))
        if cached is not None:
            promise.set_result(cached)
            return promise

        fused = self._adapter_promise(model_id, tensor_name)
        if fused is not None:
            return fused
        decoded = self._packed_promise(model_id, tensor_name)
        if decoded is not None:
            return decoded

        shard_name = index["weight_map"][tensor_name]
        self._join_or_start_load(promise, (model_id, shard_name))
        return promise

    async def preload_tensor(self, model_id: str, tensor_name: str):
        """Read the tensor into the memory cache ahead of demand.

        The reference's preload only warms the *download* (index.py:223-236),
        which for local files is a no-op; here the disk read itself is the
        transport, so prefetch means doing the read (in a worker thread,
        deduped against demand fetches via ``_join_or_start_load``)."""
        model_id = self._resolve(model_id)
        if model_id not in self.model_indexes:
            raise KeyError(f"Model {model_id} not found in index")
        key = (model_id, tensor_name)
        if key in self._tensor_cache or key in self._inflight:
            return
        try:
            await self.get_tensor(model_id, tensor_name).get()
        except Exception:
            # demand fetch will surface the error with full context
            logger.exception(
                "Failed to preload tensor %r from %r", tensor_name, model_id
            )

    async def _load_tensor(self, promise: TensorPromise, shard_key: Tuple[str, str]):
        model_id, shard_name = shard_key
        local_shard_path = None
        try:
            model_base_path = self.model_paths.get(model_id)
            if not model_base_path:
                raise RuntimeError(
                    f"Internal error: base path for model {model_id!r} not found"
                )
            local_shard_path = model_base_path / shard_name
            if not local_shard_path.exists():
                raise FileNotFoundError(f"Shard file not found: {local_shard_path}")

            def read():
                with SafeTensorsReader(local_shard_path) as reader:
                    return reader.get_tensor(promise.tensor_name, copy=True)

            tensor = await asyncio.to_thread(read)
            self._tensor_cache[(model_id, promise.tensor_name)] = tensor
            self._settle_load(promise, tensor)
        except Exception as e:
            logger.exception(
                "Failed to load tensor %r from model %r shard %r (%s)",
                promise.tensor_name,
                model_id,
                shard_name,
                local_shard_path,
            )
            self._settle_load(promise, None, e)
