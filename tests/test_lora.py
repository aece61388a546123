"""LoRA training (parallel/lora.py): frozen base, trained factor pairs.

Beyond-reference capability (the reference has no training); these tests
pin the contracts that make it safe: identity at init, gradients confined
to the adapters, sharded == single-device trajectories, the QLoRA
quantized-base path, and the PEFT export fusing back exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shardmerge_tpu.models.llama import (
    ModelConfig,
    forward_train,
    init_params,
)
from shardmerge_tpu.parallel.lora import (
    lora_init,
    lora_to_peft,
    make_lora_train_step,
    merge_lora,
)
from shardmerge_tpu.parallel.mesh import make_mesh


def _cfg(**kw):
    return ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        **kw,
    )


def _batch(cfg, seed=0, B=4, T=9):
    return jax.random.randint(
        jax.random.PRNGKey(seed), (B, T + 1), 0, cfg.vocab_size
    )


def test_lora_init_is_identity():
    """B = 0 at init: the merged model IS the base (logit-identical)."""
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh(("dp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    lora = lora_init(mesh, params, rank=4, seed=3)
    merged = merge_lora(params, lora, 1.0)
    # values must be BIT-identical (B=0 -> delta exactly 0); materialize to
    # host first so mesh placement can't reassociate the forward's sums
    for i, layer in enumerate(params["layers"]):
        for name in ("q_proj", "down_proj"):
            np.testing.assert_array_equal(
                np.asarray(merged["layers"][i][name]),
                np.asarray(layer[name]),
            )
    merged_host = jax.tree.map(np.asarray, merged)
    ids = _batch(cfg)[:, :-1]
    np.testing.assert_array_equal(
        np.asarray(forward_train(merged_host, cfg, ids)),
        np.asarray(forward_train(params, cfg, ids)),
    )


def test_lora_trains_only_adapters():
    """Two decreasing steps; the base stays bit-identical; the factors and
    ONLY the factors carry optimizer state."""
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    before = jax.tree.map(lambda x: np.array(x), params)

    mesh = make_mesh(("dp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    init_state, train_step = make_lora_train_step(
        mesh, cfg, rank=4, learning_rate=1e-2, seed=5
    )
    state = init_state(params)
    a0 = np.array(state["lora"]["layers"][0]["q_proj"]["A"])

    batch = _batch(cfg, seed=2)
    state, loss0 = train_step(state, batch)
    state, loss1 = train_step(state, batch)
    assert np.isfinite(float(loss0))
    assert float(loss1) < float(loss0)

    after = jax.tree.map(lambda x: np.asarray(x), state["params"])
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)
    assert not np.array_equal(
        a0, np.asarray(state["lora"]["layers"][0]["q_proj"]["A"])
    )
    # optimizer state is adapter-sized: every moment leaf matches a lora
    # leaf count, none matches the full-model leaf count
    n_lora = len(jax.tree.leaves(state["lora"]))
    n_opt = len(jax.tree.leaves(state["opt_state"]))
    assert n_opt in (2 * n_lora, 2 * n_lora + 1, 2 * n_lora + 2)


def test_lora_sharded_matches_single_device():
    """The dp x tp LoRA step equals the 1-device step (same math, GSPMD
    placement only)."""
    cfg = _cfg()

    def run(mesh):
        params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
        init_state, train_step = make_lora_train_step(
            mesh, cfg, rank=4, learning_rate=1e-2, seed=9
        )
        state = init_state(params)
        losses = []
        for s in range(3):
            state, loss = train_step(state, _batch(cfg, seed=10 + s))
            losses.append(float(loss))
        return losses

    single = run(make_mesh(("dp", "tp"), devices=jax.devices()[:1],
                           shape=(1, 1)))
    sharded = run(make_mesh(("dp", "tp"), devices=jax.devices()[:4],
                            shape=(2, 2)))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_qlora_quantized_base():
    """QLoRA: int8 frozen base + fp32 adapters — the step runs, the loss
    decreases, and the base stays quantized dicts throughout."""
    from shardmerge_tpu.constants import LORA_TARGET_PROJECTIONS as proj
    from shardmerge_tpu.models.quant import quantize

    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    qparams = {
        **params,
        "layers": [
            {k: (quantize(v, 8) if k in proj else v) for k, v in layer.items()}
            for layer in params["layers"]
        ],
    }
    mesh = make_mesh(("dp", "tp"), devices=jax.devices()[:4], shape=(2, 2))
    init_state, train_step = make_lora_train_step(
        mesh, cfg, rank=4, learning_rate=1e-2, seed=13
    )
    state = init_state(qparams)
    batch = _batch(cfg, seed=14)
    state, loss0 = train_step(state, batch)
    state, loss1 = train_step(state, batch)
    assert np.isfinite(float(loss0)) and float(loss1) < float(loss0)
    assert isinstance(state["params"]["layers"][0]["q_proj"], dict)


def test_lora_remat_matches_unremat():
    cfg = _cfg()

    def run(remat):
        params = init_params(cfg, jax.random.PRNGKey(15), dtype=jnp.float32)
        mesh = make_mesh(("dp", "tp"), devices=jax.devices()[:2],
                         shape=(2, 1))
        init_state, train_step = make_lora_train_step(
            mesh, cfg, rank=4, learning_rate=1e-2, seed=17, remat=remat
        )
        state = init_state(params)
        state, loss = train_step(state, _batch(cfg, seed=18))
        return float(loss), np.asarray(
            state["lora"]["layers"][0]["q_proj"]["B"]
        )

    l0, b0 = run(False)
    l1, b1 = run(True)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    np.testing.assert_allclose(b1, b0, rtol=1e-5, atol=1e-7)


def test_lora_export_fuses_back(tmp_path):
    """Train on a real HF llama checkpoint, export with lora_to_peft, fuse
    with tools/fuse_lora — the fused checkpoint equals the in-memory
    merged model (the whole adapter loop closes)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
    from shardmerge_tpu.models.loader import load_params
    from shardmerge_tpu.tools.fuse_lora import fuse_lora

    torch.manual_seed(3)
    config = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    base_dir = tmp_path / "base"
    LlamaForCausalLM(config).eval().to(torch.float32).save_pretrained(
        str(base_dir), safe_serialization=True
    )
    cfg = ModelConfig.from_pretrained(base_dir)
    params = load_params(base_dir, cfg, dtype=jnp.float32)

    mesh = make_mesh(("dp", "tp"), devices=jax.devices()[:2], shape=(2, 1))
    init_state, train_step = make_lora_train_step(
        mesh, cfg, rank=4, learning_rate=1e-2, seed=19
    )
    state = init_state(params)
    for s in range(2):
        state, _ = train_step(state, _batch(cfg, seed=20 + s))

    adapter_dir = tmp_path / "adapter"
    summary = lora_to_peft(
        state["lora"], adapter_dir, rank=4, alpha=4.0,
        base_model=str(base_dir),
    )
    assert summary["tensors"] == 2 * 7  # 2 layers x 7 projections

    fused_dir = tmp_path / "fused"
    fuse_lora(base_dir, adapter_dir, fused_dir)

    merged = merge_lora(state["params"], state["lora"], 1.0)
    fused = load_params(fused_dir, cfg, dtype=jnp.float32)
    for i in range(cfg.num_hidden_layers):
        for name in ("q_proj", "o_proj", "down_proj"):
            np.testing.assert_allclose(
                np.asarray(fused["layers"][i][name]),
                np.asarray(merged["layers"][i][name]),
                rtol=1e-5,
                atol=1e-6,
                err_msg=f"layer {i} {name}",
            )


def test_load_params_accepts_adapter_dir(tmp_path):
    """load_params on a PEFT adapter DIRECTORY equals load_params on the
    fuse-lora'd checkpoint, leaf for leaf (raw and int8-quantized loads) —
    generate/serve take a LoRA finetune with no fused copy on disk."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from shardmerge_tpu.models.loader import load_params
    from shardmerge_tpu.tools.extract_lora import extract_lora
    from shardmerge_tpu.tools.fuse_lora import fuse_lora

    torch.manual_seed(5)
    config = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    base_dir = tmp_path / "base"
    LlamaForCausalLM(config).eval().to(torch.float32).save_pretrained(
        str(base_dir), safe_serialization=True
    )
    torch.manual_seed(6)
    ft_dir = tmp_path / "ft"
    LlamaForCausalLM(config).eval().to(torch.float32).save_pretrained(
        str(ft_dir), safe_serialization=True
    )
    adapter_dir = tmp_path / "adapter"
    extract_lora(base_dir, ft_dir, adapter_dir, rank=4)
    fused_dir = tmp_path / "fused"
    fuse_lora(base_dir, adapter_dir, fused_dir)

    cfg = ModelConfig.from_pretrained(base_dir)
    for quant in (None, 8):
        via_adapter = load_params(
            adapter_dir, cfg, dtype=jnp.float32, quant_bits=quant
        )
        via_fused = load_params(
            fused_dir, cfg, dtype=jnp.float32, quant_bits=quant
        )
        for a, f in zip(
            jax.tree.leaves(via_adapter), jax.tree.leaves(via_fused)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(f))

    # the engine surface resolves config (and tokenizer fallback) too
    from shardmerge_tpu.models.loader import resolve_checkpoint_dir

    weights_dir, adapter = resolve_checkpoint_dir(adapter_dir)
    assert weights_dir == base_dir and len(adapter["pairs"]) == 14

    # dangling adapter targets fail loudly at load
    import json as _json

    bad_cfg = _json.loads((adapter_dir / "adapter_config.json").read_text())
    bad = tmp_path / "bad_adapter"
    bad.mkdir()
    import shutil

    shutil.copyfile(
        adapter_dir / "adapter_model.safetensors",
        bad / "adapter_model.safetensors",
    )
    bad_cfg["base_model_name_or_path"] = str(base_dir)
    (bad / "adapter_config.json").write_text(_json.dumps(bad_cfg))
    # point a pair at a tensor the base does not have
    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader, save_file

    with SafeTensorsReader(bad / "adapter_model.safetensors") as r:
        tensors = {k: np.asarray(r.get_tensor(k)) for k in r.keys()}
    a_key = next(k for k in tensors if k.endswith("lora_A.weight"))
    b_key = a_key.replace("lora_A", "lora_B")
    tensors[
        "base_model.model.model.layers.9.self_attn.q_proj.lora_A.weight"
    ] = tensors[a_key]
    tensors[
        "base_model.model.model.layers.9.self_attn.q_proj.lora_B.weight"
    ] = tensors[b_key]
    save_file(tensors, bad / "adapter_model.safetensors")
    with pytest.raises(ValueError, match="absent from the base"):
        load_params(bad, cfg, dtype=jnp.float32)


def test_lora_validation():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(21), dtype=jnp.float32)
    mesh = make_mesh(("dp", "tp"), devices=jax.devices()[:2], shape=(2, 1))
    with pytest.raises(ValueError, match="positive"):
        lora_init(mesh, params, rank=0)
    with pytest.raises(ValueError, match="matched no layer"):
        lora_init(mesh, params, rank=4, targets=("nonexistent_proj",))
