"""Index tests: ordered-weights semantics, offline index, and the HF index
end-to-end against a local server (index fetch + shard download + tensor read)."""

import asyncio
import json

import numpy as np
import pytest

from shardmerge_tpu.io.download import DownloadManager
from shardmerge_tpu.io.index import (
    HFMultiModelIndex,
    OfflineMultiModelIndex,
    ordered_weights,
)

from .conftest import TINY_SHAPES, TINY_SHARD_MAP
from .test_io_download import LocalServer


def test_ordered_weights_llama_shape():
    order = ordered_weights(TINY_SHARD_MAP)
    assert order[0] == "model.embed_tokens.weight"
    assert order[-2] == "model.norm.weight" or order[-1] == "lm_head.weight"
    # layer 0 components all precede layer 1 components
    i0 = max(i for i, w in enumerate(order) if "layers.0" in w)
    i1 = min(i for i, w in enumerate(order) if "layers.1" in w)
    assert i0 < i1
    # components alphabetical within a layer
    comps = [w for w in order if w.startswith("model.layers.0.")]
    assert comps == sorted(comps)
    assert set(order) == set(TINY_SHARD_MAP)


def test_ordered_weights_heterogeneous_layers():
    # layers may carry different component sets (Llama-4 interleaves dense
    # and MoE layers) — components are discovered per layer, nothing is
    # dropped, layer order and within-layer alphabetical order hold. The
    # reference projects layer 0's components onto every layer and crashes
    # its own completeness check on this shape (index.py:181-186) —
    # documented deviation.
    weight_map = {
        "model.embed_tokens.weight": "a",
        "model.layers.0.mlp.weight": "a",
        "model.layers.1.mlp.weight": "a",
        "model.layers.1.extra.weight": "a",
    }
    order = ordered_weights(weight_map)
    assert set(order) == set(weight_map)
    assert order == [
        "model.embed_tokens.weight",
        "model.layers.0.mlp.weight",
        "model.layers.1.extra.weight",
        "model.layers.1.mlp.weight",
    ]


def test_offline_index_roundtrip(tiny_model_factory):
    path, tensors = tiny_model_factory("model-a", seed=1)

    async def main():
        index = OfflineMultiModelIndex()
        index.add_model(path)
        assert "model-a" in index
        assert len(index) == 1
        keys = index.get_model_keys("model-a")
        assert keys == set(TINY_SHARD_MAP)
        order = index.get_layer_order("model-a")
        assert set(order) == keys

        promise = index.get_tensor("model-a", "model.layers.0.mlp.gate_proj.weight")
        got = await promise.get()
        np.testing.assert_array_equal(
            got, tensors["model.layers.0.mlp.gate_proj.weight"]
        )
        # second fetch hits the memory cache (same object)
        again = await index.get_tensor(
            "model-a", "model.layers.0.mlp.gate_proj.weight"
        ).get()
        assert again is got
        # eviction works
        index.release_tensor("model-a", "model.layers.0.mlp.gate_proj.weight")
        fresh = await index.get_tensor(
            "model-a", "model.layers.0.mlp.gate_proj.weight"
        ).get()
        assert fresh is not got
        np.testing.assert_array_equal(fresh, got)

    asyncio.run(main())


def test_offline_index_errors(tmp_path, tiny_model_factory):
    index = OfflineMultiModelIndex()
    with pytest.raises(NotADirectoryError):
        index.add_model(tmp_path / "nope")
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        index.add_model(empty)

    path, _ = tiny_model_factory("model-b", seed=2)
    index.add_model(path)
    with pytest.raises(KeyError):
        index.get_tensor("unknown", "x")
    with pytest.raises(KeyError):
        index.get_tensor("model-b", "not.a.tensor")


def test_hf_index_end_to_end(tmp_path, tiny_model_factory):
    """Full network path: index json over HTTP, shard download, mmap read."""
    src_path, tensors = tiny_model_factory("src", seed=3)

    async def main():
        async with LocalServer() as server:
            # serve the model's index and shards at HF-style URLs
            with open(src_path / "model.safetensors.index.json", "rb") as f:
                server.blobs["/org/model/raw/main/model.safetensors.index.json"] = (
                    f.read()
                )
            for shard in set(TINY_SHARD_MAP.values()):
                server.blobs[f"/org/model/resolve/main/{shard}"] = (
                    src_path / shard
                ).read_bytes()

            storage = tmp_path / "storage"
            manager = DownloadManager(storage_path=storage)
            index = HFMultiModelIndex(
                download_manager=manager,
                cache_path=tmp_path / "cache",
                endpoint=server.base,
            )
            await index.add_model("org/model")
            assert index.get_model_keys("org/model") == set(TINY_SHARD_MAP)

            # index json was cached into storage
            assert (storage / "org/model/model.safetensors.index.json").exists()

            name = "model.layers.1.self_attn.q_proj.weight"
            await index.preload_tensor("org/model", name)
            got = await index.get_tensor("org/model", name).get()
            np.testing.assert_array_equal(got, tensors[name])

            # add_model again is a no-op; re-adding from storage works too
            await index.add_model("org/model")
            index2 = HFMultiModelIndex(
                download_manager=manager,
                cache_path=tmp_path / "cache",
                endpoint="http://127.0.0.1:1",  # unreachable: storage must hit
            )
            await index2.add_model("org/model")
            assert index2.get_model_keys("org/model") == set(TINY_SHARD_MAP)

    asyncio.run(main())


def test_hf_index_concurrent_same_shard(tmp_path, tiny_model_factory):
    """Concurrent get_tensor calls for tensors of one shard must not corrupt
    the claim accounting (reference benign race, download.py:152-157)."""
    src_path, tensors = tiny_model_factory("src2", seed=4)

    async def main():
        async with LocalServer() as server:
            with open(src_path / "model.safetensors.index.json", "rb") as f:
                server.blobs["/o/m/raw/main/model.safetensors.index.json"] = f.read()
            for shard in set(TINY_SHARD_MAP.values()):
                server.blobs[f"/o/m/resolve/main/{shard}"] = (
                    src_path / shard
                ).read_bytes()

            manager = DownloadManager(storage_path=tmp_path / "st")
            index = HFMultiModelIndex(
                download_manager=manager,
                cache_path=tmp_path / "c",
                endpoint=server.base,
            )
            await index.add_model("o/m")
            names = [
                n
                for n, s in TINY_SHARD_MAP.items()
                if s == "model-00001-of-00003.safetensors"
            ]
            results = await asyncio.gather(
                *[index.get_tensor("o/m", n).get() for n in names]
            )
            for n, r in zip(names, results):
                np.testing.assert_array_equal(r, tensors[n])
            # the shard was downloaded exactly once
            hits = [
                k
                for k in server.hits
                if k.endswith("model-00001-of-00003.safetensors")
            ]
            assert server.hits[hits[0]] == 1

    asyncio.run(main())


def test_ordered_weights_moe_namings():
    """MoE checkpoints (mixtral block_sparse_moe.*, qwen3-moe mlp.experts.*)
    flow through the layer-0 component discovery without loss; expert
    indices order as strings (experts.10 < experts.2), matching the
    reference's sorted() semantics (reference index.py:158-161)."""
    for gate, expert_fmt in [
        ("block_sparse_moe.gate.weight", "block_sparse_moe.experts.{e}.w1.weight"),
        ("mlp.gate.weight", "mlp.experts.{e}.gate_proj.weight"),
    ]:
        weight_map = {"model.embed_tokens.weight": "a", "model.norm.weight": "a"}
        for layer in range(2):
            weight_map[f"model.layers.{layer}.self_attn.q_proj.weight"] = "a"
            weight_map[f"model.layers.{layer}.{gate}"] = "a"
            for e in range(12):
                weight_map[
                    f"model.layers.{layer}." + expert_fmt.format(e=e)
                ] = "a"
        order = ordered_weights(weight_map)
        assert set(order) == set(weight_map)
        comps = [w for w in order if w.startswith("model.layers.0.")]
        assert comps == sorted(comps)  # string sort: experts.10 < experts.2
        i0 = max(i for i, w in enumerate(order) if ".layers.0." in w)
        i1 = min(i for i, w in enumerate(order) if ".layers.1." in w)
        assert i0 < i1


def test_offline_concurrent_fetches_share_one_read(
    tiny_model_factory, monkeypatch
):
    """A prefetch racing a demand fetch (or two demand fetches) for the same
    tensor must issue exactly one disk read (``_join_or_start_load``)."""
    import shardmerge_tpu.io.index as index_mod

    path, tensors = tiny_model_factory("model-dedupe", seed=5)
    real_reader = index_mod.SafeTensorsReader
    opens = []

    class CountingReader(real_reader):
        def __init__(self, p, *a, **k):
            opens.append(str(p))
            super().__init__(p, *a, **k)

    monkeypatch.setattr(index_mod, "SafeTensorsReader", CountingReader)
    name = "model.layers.0.mlp.gate_proj.weight"

    async def main():
        index = OfflineMultiModelIndex()
        index.add_model(path)
        p1 = index.get_tensor("model-dedupe", name)
        p2 = index.get_tensor("model-dedupe", name)
        pre = asyncio.create_task(index.preload_tensor("model-dedupe", name))
        a, b, _ = await asyncio.gather(p1.get(), p2.get(), pre)
        assert a is b
        np.testing.assert_array_equal(a, tensors[name])
        assert len(opens) == 1, opens
        # preload of an uncached tensor does the read; a later demand fetch
        # then hits the cache
        index.release_tensor("model-dedupe", name)
        await index.preload_tensor("model-dedupe", name)
        assert len(opens) == 2
        c = await index.get_tensor("model-dedupe", name).get()
        assert len(opens) == 2
        np.testing.assert_array_equal(c, tensors[name])

    asyncio.run(main())


def test_offline_load_failure_rejects_all_waiters(tiny_model_factory):
    """Every promise joined to one failed load gets the exception."""
    path, _ = tiny_model_factory("model-fail", seed=6)
    name = "model.layers.0.mlp.gate_proj.weight"

    async def main():
        index = OfflineMultiModelIndex()
        index.add_model(path)
        # break the shard file path after registration
        index.model_paths["model-fail"] = path / "nonexistent"
        p1 = index.get_tensor("model-fail", name)
        p2 = index.get_tensor("model-fail", name)
        for p in (p1, p2):
            with pytest.raises(FileNotFoundError):
                await p.get()
        # the inflight entry is gone; a fixed path works again
        index.model_paths["model-fail"] = path
        got = await index.get_tensor("model-fail", name).get()
        assert got is not None

    asyncio.run(main())


def _make_single_file_model(path, seed):
    """A tiny SINGLE-FILE checkpoint: one model.safetensors, no index."""
    from shardmerge_tpu.io import safetensors_io as stio

    gen = np.random.default_rng(seed)
    tensors = {
        name: gen.standard_normal(shape).astype(np.float32)
        for name, shape in TINY_SHAPES.items()
    }
    path.mkdir(parents=True, exist_ok=True)
    stio.save_file(tensors, path / "model.safetensors", metadata={"format": "pt"})
    return tensors


def test_offline_single_file_checkpoint(tmp_path):
    """Directories holding one model.safetensors and no index resolve via a
    synthesized one-shard index (the reference requires the index file)."""
    from shardmerge_tpu.io.index import OfflineMultiModelIndex

    tensors = _make_single_file_model(tmp_path / "sf", seed=7)

    async def main():
        index = OfflineMultiModelIndex()
        index.add_model(tmp_path / "sf")
        assert index.get_model_keys("sf") == set(TINY_SHAPES)
        order = index.get_layer_order("sf")
        assert order[0] == "model.embed_tokens.weight"
        name = "model.layers.1.mlp.down_proj.weight"
        got = await index.get_tensor("sf", name).get()
        np.testing.assert_array_equal(got, tensors[name])
        # the synthesized index reports real sizes
        doc = index.get_index("sf")
        assert doc["metadata"]["total_size"] == sum(
            t.nbytes for t in tensors.values()
        )
        assert set(doc["weight_map"].values()) == {"model.safetensors"}

    asyncio.run(main())


def test_offline_single_file_merge_end_to_end(tmp_path):
    """A full merge over single-file checkpoints writes a mirrored
    single-shard output (model.safetensors + a now-materialized index)."""
    import json as _json

    from shardmerge_tpu.config import MergeConfig, MergeModel
    from shardmerge_tpu.io.index import OfflineMultiModelIndex
    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
    from shardmerge_tpu.merge import AdditionMerge

    base_t = _make_single_file_model(tmp_path / "base", seed=8)
    ft_t = _make_single_file_model(tmp_path / "ft", seed=9)

    index = OfflineMultiModelIndex()
    index.add_model(tmp_path / "base")
    index.add_model(tmp_path / "ft")
    config = MergeConfig(
        finetune_merge=[
            MergeModel(model=str(tmp_path / "ft"), base=str(tmp_path / "base"))
        ],
        output_base_model=str(tmp_path / "base"),
        output_dir=str(tmp_path / "merged"),
        cache_dir=str(tmp_path / "cache"),
        storage_dir=str(tmp_path / "storage"),
        output_dtype="float32",
    )
    merger = AdditionMerge(config, index_manager=index, add_base=True)
    asyncio.run(merger.merge())

    out_dir = tmp_path / "merged"
    idx = _json.loads((out_dir / "model.safetensors.index.json").read_text())
    assert set(idx["weight_map"].values()) == {"model.safetensors"}
    with SafeTensorsReader(out_dir / "model.safetensors") as r:
        name = "model.layers.0.mlp.up_proj.weight"
        got = r.get_tensor(name, copy=True)
    np.testing.assert_allclose(
        got, ft_t[name], rtol=1e-5, atol=1e-6
    )  # base + (ft - base)


def test_hf_single_file_checkpoint(tmp_path):
    """Hub models without an index (single-file, under the shard cutoff):
    the 404 on index.json falls back to downloading model.safetensors,
    synthesizing the index, and persisting it for re-runs."""
    blob_dir = tmp_path / "src"
    tensors = _make_single_file_model(blob_dir, seed=11)

    async def main():
        async with LocalServer() as server:
            # no index.json blob -> the server 404s it
            server.blobs["/org/single/resolve/main/model.safetensors"] = (
                blob_dir / "model.safetensors"
            ).read_bytes()

            storage = tmp_path / "storage"
            manager = DownloadManager(storage_path=storage)
            index = HFMultiModelIndex(
                download_manager=manager,
                cache_path=tmp_path / "cache",
                endpoint=server.base,
            )
            await index.add_model("org/single")
            assert index.get_model_keys("org/single") == set(TINY_SHAPES)
            name = "model.layers.0.self_attn.k_proj.weight"
            got = await index.get_tensor("org/single", name).get()
            np.testing.assert_array_equal(got, tensors[name])

            # synthesized index persisted -> re-add from storage, offline
            assert (
                storage / "org/single/model.safetensors.index.json"
            ).exists()
            index2 = HFMultiModelIndex(
                download_manager=manager,
                cache_path=tmp_path / "cache",
                endpoint="http://127.0.0.1:1",  # unreachable: storage must hit
            )
            await index2.add_model("org/single")
            got2 = await index2.get_tensor("org/single", name).get()
            np.testing.assert_array_equal(got2, tensors[name])

    asyncio.run(main())


def test_hf_hub_lora_adapter(tmp_path, tiny_model_factory):
    """Hub LoRA adapter repos (adapter_config.json + adapter_model.
    safetensors, no full checkpoint) register as models: the 404 chain
    falls through index -> single-file -> adapter, the small adapter
    files persist to storage, the base repo resolves recursively, and
    tensors fuse base + (alpha/r)*B@A lazily — including on a re-run
    with the network unreachable."""
    from shardmerge_tpu.io.safetensors_io import save_file

    src_path, tensors = tiny_model_factory("hubbase", seed=21)

    # build adapter blobs (rank 2 on one q_proj)
    target = "model.layers.0.self_attn.q_proj.weight"
    od, idim = tensors[target].shape
    gen = np.random.default_rng(23)
    a = gen.standard_normal((2, idim)).astype(np.float32)
    b = gen.standard_normal((od, 2)).astype(np.float32)
    adir = tmp_path / "blob_adapter"
    adir.mkdir()
    mod = target[: -len(".weight")]
    save_file(
        {
            f"base_model.model.{mod}.lora_A.weight": a,
            f"base_model.model.{mod}.lora_B.weight": b,
        },
        adir / "adapter_model.safetensors",
    )
    adapter_cfg = json.dumps(
        {
            "r": 2,
            "lora_alpha": 4,
            "peft_type": "LORA",
            "base_model_name_or_path": "org/hubbase",
        }
    ).encode()

    async def main():
        async with LocalServer() as server:
            with open(src_path / "model.safetensors.index.json", "rb") as f:
                server.blobs[
                    "/org/hubbase/raw/main/model.safetensors.index.json"
                ] = f.read()
            for shard in set(TINY_SHARD_MAP.values()):
                server.blobs[f"/org/hubbase/resolve/main/{shard}"] = (
                    src_path / shard
                ).read_bytes()
            # the adapter repo serves ONLY its two adapter files
            server.blobs["/org/lora/resolve/main/adapter_config.json"] = (
                adapter_cfg
            )
            server.blobs[
                "/org/lora/resolve/main/adapter_model.safetensors"
            ] = (adir / "adapter_model.safetensors").read_bytes()

            storage = tmp_path / "storage"
            manager = DownloadManager(storage_path=storage)
            index = HFMultiModelIndex(
                download_manager=manager,
                cache_path=tmp_path / "cache",
                endpoint=server.base,
            )
            await index.add_model("org/lora")
            assert index.get_model_keys("org/lora") == set(TINY_SHAPES)

            got = await index.get_tensor("org/lora", target).get()
            want = (
                tensors[target].astype(np.float32) + 2.0 * (b @ a)
            ).astype(tensors[target].dtype)
            np.testing.assert_array_equal(got, want)
            # untargeted tensors pass the base through byte-identical
            other = "model.layers.1.mlp.down_proj.weight"
            got2 = await index.get_tensor("org/lora", other).get()
            np.testing.assert_array_equal(got2, tensors[other])

            # adapter files persisted -> re-run fully from storage
            assert (storage / "org/lora/adapter_config.json").exists()
            index2 = HFMultiModelIndex(
                download_manager=manager,
                cache_path=tmp_path / "cache",
                endpoint="http://127.0.0.1:1",  # unreachable
            )
            await index2.add_model("org/lora")
            got3 = await index2.get_tensor("org/lora", target).get()
            np.testing.assert_array_equal(got3, want)

            # a repo with NONE of the three layouts still errors clearly
            with pytest.raises(FileNotFoundError, match="neither"):
                await index.add_model("org/empty")

    asyncio.run(main())


def test_hf_hub_quantized_repo(tmp_path, tiny_model_factory):
    """Hub GPTQ/AWQ repos register as ordinary models: the weight map's
    packed .qweight modules trigger a config.json fetch (persisted to
    storage), the quantization_config stands up the hidden raw
    registration, and the public index presents decoded .weight keys —
    key-set-identical to a raw checkpoint, so the repo is a valid merge
    input. This repo is single-file AND AWQ, exercising the synthesized
    header index falling through to packed registration. Raw part
    downloads ride the PUBLIC repo's storage partition (one transfer per
    shard), and a re-run with the network unreachable registers fully
    from storage."""
    from shardmerge_tpu.io.safetensors_io import save_file
    from shardmerge_tpu.models.quant import dequant_awq

    _, tensors = tiny_model_factory("qbase", seed=31)

    group = 8
    rng = np.random.default_rng(33)
    awq_order = [0, 2, 4, 6, 1, 3, 5, 7]

    def pack_awq(vals):
        rows, out = vals.shape
        packed = np.zeros((rows, out // 8), np.uint32)
        for k in range(8):
            packed |= vals[:, awq_order[k]::8].astype(np.uint32) << np.uint32(
                4 * k
            )
        return packed.astype(np.int32)

    target = "model.layers.0.self_attn.q_proj.weight"
    blob_tensors = {}
    expected = {}
    for k, v in tensors.items():
        if k.endswith("proj.weight"):
            out_dim, in_dim = v.shape
            root = k[: -len(".weight")]
            q = rng.integers(0, 16, (in_dim, out_dim))
            zeros = rng.integers(0, 16, (in_dim // group, out_dim))
            scales = (
                rng.standard_normal((in_dim // group, out_dim)) * 0.05
            ).astype(np.float16)
            blob_tensors[f"{root}.qweight"] = pack_awq(q)
            blob_tensors[f"{root}.qzeros"] = pack_awq(zeros)
            blob_tensors[f"{root}.scales"] = scales
            expected[k] = dequant_awq(
                blob_tensors[f"{root}.qweight"],
                blob_tensors[f"{root}.qzeros"],
                blob_tensors[f"{root}.scales"],
            )
        else:
            blob_tensors[k] = v
            expected[k] = v

    blob_dir = tmp_path / "blob"
    blob_dir.mkdir()
    save_file(blob_tensors, blob_dir / "model.safetensors")
    cfg_doc = json.dumps(
        {
            "model_type": "llama",
            "quantization_config": {
                "quant_method": "awq",
                "bits": 4,
                "group_size": group,
                "zero_point": True,
                "version": "gemm",
            },
        }
    ).encode()

    async def main():
        async with LocalServer() as server:
            # single-file repo: no index.json (404 -> header synth)
            server.blobs["/org/awq/resolve/main/model.safetensors"] = (
                blob_dir / "model.safetensors"
            ).read_bytes()
            server.blobs["/org/awq/raw/main/config.json"] = cfg_doc

            storage = tmp_path / "storage"
            manager = DownloadManager(storage_path=storage)
            index = HFMultiModelIndex(
                download_manager=manager,
                cache_path=tmp_path / "cache",
                endpoint=server.base,
            )
            await index.add_model("org/awq")

            # public key set mirrors a raw checkpoint's
            assert index.get_model_keys("org/awq") == set(tensors)

            got = await index.get_tensor("org/awq", target).get()
            np.testing.assert_array_equal(got, expected[target])
            other = "model.embed_tokens.weight"  # passthrough tensor
            got2 = await index.get_tensor("org/awq", other).get()
            np.testing.assert_array_equal(got2, tensors[other])

            # one header-synth GET + one full transfer — raw and public
            # reads share the download (no duplicate fetch per identity)
            shard_hits = server.hits.get(
                "/org/awq/resolve/main/model.safetensors", 0
            )
            assert shard_hits == 2, server.hits

            # config.json persisted -> re-run fully from storage
            assert (storage / "org/awq/config.json").exists()
            index2 = HFMultiModelIndex(
                download_manager=manager,
                cache_path=tmp_path / "cache",
                endpoint="http://127.0.0.1:1",  # unreachable
            )
            await index2.add_model("org/awq")
            got3 = await index2.get_tensor("org/awq", target).get()
            np.testing.assert_array_equal(got3, expected[target])

    asyncio.run(main())


def test_hf_index_token_on_every_request_type(tmp_path, tiny_model_factory):
    """Gated-repo end-to-end: the resolved token must ride the index
    fetch AND the shard streams (the reference's raw downloader is
    unauthenticated — download.py:241-257); an anonymous attempt surfaces
    the actionable 401 error instead of an opaque failure."""
    import pytest

    from .test_io_download import _no_ambient_hf_auth

    src_path, tensors = tiny_model_factory("gatedsrc", seed=9)

    def run(monkeypatched=None):
        async def main():
            async with LocalServer() as server:
                with open(src_path / "model.safetensors.index.json", "rb") as f:
                    server.blobs[
                        "/org/gated/raw/main/model.safetensors.index.json"
                    ] = f.read()
                for shard in set(TINY_SHARD_MAP.values()):
                    server.blobs[f"/org/gated/resolve/main/{shard}"] = (
                        src_path / shard
                    ).read_bytes()
                server.require_token = "sekret"

                # anonymous: actionable error from the index fetch
                anon = HFMultiModelIndex(
                    download_manager=DownloadManager(
                        storage_path=tmp_path / "anon"
                    ),
                    cache_path=tmp_path / "anon_cache",
                    endpoint=server.base,
                )
                with pytest.raises(RuntimeError, match="HF_TOKEN"):
                    await anon.add_model("org/gated")

                # authenticated: index + shard + tensor read all succeed,
                # every request carried the header
                manager = DownloadManager(
                    storage_path=tmp_path / "storage", token="sekret"
                )
                index = HFMultiModelIndex(
                    download_manager=manager,
                    cache_path=tmp_path / "cache",
                    endpoint=server.base,
                    token="sekret",
                )
                await index.add_model("org/gated")
                name = "model.layers.1.self_attn.q_proj.weight"
                await index.preload_tensor("org/gated", name)
                got = await index.get_tensor("org/gated", name).get()
                np.testing.assert_array_equal(got, tensors[name])
                assert all(
                    v == "Bearer sekret"
                    for p, v in server.auth.items()
                    if server.hits[p] and v is not None
                )
                # both request types actually carried it
                assert (
                    server.auth[
                        "/org/gated/raw/main/model.safetensors.index.json"
                    ]
                    == "Bearer sekret"
                )
                shard_paths = [
                    p for p in server.auth if "/resolve/main/" in p
                ]
                assert shard_paths and all(
                    server.auth[p] == "Bearer sekret" for p in shard_paths
                )

        asyncio.run(main())

    # no ambient auth: monkeypatch env inline (function-scoped)
    mp = pytest.MonkeyPatch()
    try:
        _no_ambient_hf_auth(mp, tmp_path)
        run()
    finally:
        mp.undo()
