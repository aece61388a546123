"""Mixtral / MoE support: forward parity vs HF transformers and a merge over
an irregular expert-weight shard layout (BASELINE config 4)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shardmerge_tpu.models.llama import ModelConfig, init_params


def test_moe_forward_matches_transformers(tmp_path):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(11)
    config = MixtralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = MixtralForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "mixtral"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.num_local_experts == 4
    params = load_params(path, cfg, dtype=jnp.float32)
    assert "experts" in params["layers"][0]
    assert len(params["layers"][0]["experts"]) == 4

    ids = np.array([[3, 17, 99, 54, 8]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()

    from .test_models import _run_forward

    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)


def test_moe_train_step_runs():
    from shardmerge_tpu.parallel.mesh import make_mesh
    from shardmerge_tpu.parallel.train import make_train_step

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=64,
    )
    mesh = make_mesh(("dp", "tp"), shape=(2, 4))
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    init_state, train_step = make_train_step(mesh, cfg)
    state = init_state(params)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 10)), jnp.int32
    )
    state, loss = train_step(state, batch)
    assert np.isfinite(float(loss))


MIXTRAL_TINY_SHAPES = {
    "model.embed_tokens.weight": (32, 16),
    "model.norm.weight": (16,),
    "lm_head.weight": (32, 16),
}
for _l in range(2):
    MIXTRAL_TINY_SHAPES[f"model.layers.{_l}.self_attn.q_proj.weight"] = (16, 16)
    MIXTRAL_TINY_SHAPES[f"model.layers.{_l}.self_attn.k_proj.weight"] = (8, 16)
    MIXTRAL_TINY_SHAPES[f"model.layers.{_l}.self_attn.v_proj.weight"] = (8, 16)
    MIXTRAL_TINY_SHAPES[f"model.layers.{_l}.self_attn.o_proj.weight"] = (16, 16)
    MIXTRAL_TINY_SHAPES[f"model.layers.{_l}.input_layernorm.weight"] = (16,)
    MIXTRAL_TINY_SHAPES[f"model.layers.{_l}.post_attention_layernorm.weight"] = (16,)
    MIXTRAL_TINY_SHAPES[f"model.layers.{_l}.block_sparse_moe.gate.weight"] = (4, 16)
    for _e in range(4):
        for _w, _shape in [("w1", (24, 16)), ("w2", (16, 24)), ("w3", (24, 16))]:
            MIXTRAL_TINY_SHAPES[
                f"model.layers.{_l}.block_sparse_moe.experts.{_e}.{_w}.weight"
            ] = _shape


def _make_mixtral_model(path, seed):
    """Tiny mixtral-shaped model with a deliberately irregular shard layout
    (experts split across shard boundaries mid-layer)."""
    from shardmerge_tpu.io import safetensors_io as stio

    gen = np.random.default_rng(seed)
    tensors = {
        name: gen.standard_normal(shape).astype(np.float32)
        for name, shape in MIXTRAL_TINY_SHAPES.items()
    }
    names = sorted(tensors)
    # irregular: uneven split into 3 shards by cumulative count
    cuts = [len(names) // 5, len(names) // 2]
    shard_of = {}
    for i, name in enumerate(names):
        if i < cuts[0]:
            shard_of[name] = "model-00001-of-00003.safetensors"
        elif i < cuts[1]:
            shard_of[name] = "model-00002-of-00003.safetensors"
        else:
            shard_of[name] = "model-00003-of-00003.safetensors"
    path.mkdir(parents=True, exist_ok=True)
    shards = {}
    for name, shard in shard_of.items():
        shards.setdefault(shard, {})[name] = tensors[name]
    for shard, content in shards.items():
        stio.save_file(content, path / shard, metadata={"format": "pt"})
    with open(path / "model.safetensors.index.json", "w") as f:
        json.dump({"metadata": {}, "weight_map": shard_of}, f)
    return tensors, shard_of


def test_mixtral_merge_end_to_end(tmp_path):
    import asyncio

    from shardmerge_tpu.config import MergeConfig, MergeModel
    from shardmerge_tpu.io.index import OfflineMultiModelIndex
    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader
    from shardmerge_tpu.merge import FourierMerge

    base_path = tmp_path / "base"
    ft_path = tmp_path / "ft"
    base_t, shard_of = _make_mixtral_model(base_path, seed=1)
    ft_t, _ = _make_mixtral_model(ft_path, seed=2)

    config = MergeConfig(
        finetune_merge=[MergeModel(model=str(ft_path), base=str(base_path))],
        output_base_model=str(base_path),
        output_dir=str(tmp_path / "merged"),
        cache_dir=str(tmp_path / "cache"),
        storage_dir=str(tmp_path / "storage"),
    )
    index = OfflineMultiModelIndex()
    index.add_model(base_path)
    index.add_model(ft_path)
    merger = FourierMerge(config, index_manager=index)
    asyncio.run(merger.merge())

    # output mirrors the irregular layout exactly
    out_index = json.load(
        open(tmp_path / "merged" / "model.safetensors.index.json")
    )
    assert out_index["weight_map"] == shard_of

    out = {}
    for shard in set(shard_of.values()):
        with SafeTensorsReader(tmp_path / "merged" / shard) as r:
            for k in r.keys():
                out[k] = r.get_tensor(k, copy=True)
    assert set(out) == set(MIXTRAL_TINY_SHAPES)
    # single finetune: expert weights pass through as base + delta == ft
    name = "model.layers.1.block_sparse_moe.experts.2.w1.weight"
    np.testing.assert_allclose(
        out[name].astype(np.float32), ft_t[name], rtol=1e-2, atol=1e-2
    )


def test_capacity_dispatch_matches_dense():
    """Sparse capacity-based MoE dispatch == dense-and-mask when no expert
    overflows its capacity (capacity_factor = n_experts guarantees it)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shardmerge_tpu.models.llama import ModelConfig, init_params, _ffn

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, cfg.hidden_size), jnp.float32)

    dense = _ffn(cfg, layer, x)
    cap_cfg = dataclasses.replace(
        cfg, moe_dispatch="capacity",
        moe_capacity_factor=float(cfg.num_local_experts),  # no drops possible
    )
    sparse = _ffn(cap_cfg, layer, x)
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense), rtol=2e-5, atol=2e-6
    )

    # at a realistic factor the path still runs jitted with static shapes
    cap_cfg = dataclasses.replace(cfg, moe_dispatch="capacity")
    out = jax.jit(lambda p, x: _ffn(cap_cfg, p, x))(layer, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_expert_parallel_matches_single_device():
    """EP dispatch over an 8-device 'ep' mesh == single-device capacity
    dispatch == dense-and-mask MoE (at non-dropping capacity)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shardmerge_tpu.models.llama import ModelConfig, init_params, _ffn
    from shardmerge_tpu.parallel.mesh import make_mesh
    from shardmerge_tpu.parallel.moe import expert_parallel_ffn, shard_experts

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=8,
        num_experts_per_tok=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    layer = params["layers"][0]
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 12, cfg.hidden_size), jnp.float32
    )

    dense = np.asarray(_ffn(cfg, layer, x))

    mesh = make_mesh(("ep",))
    gate_w, gate_bias, W1, W3, W2 = shard_experts(mesh, layer)
    assert gate_bias is None
    # non-dropping capacity: equality with dense must be exact-class
    ep = np.asarray(
        expert_parallel_ffn(
            mesh, cfg, gate_w, gate_bias, W1, W3, W2, x,
            capacity_factor=float(cfg.num_local_experts),
        )
    )
    np.testing.assert_allclose(ep, dense, rtol=2e-5, atol=2e-6)

    # and it equals the single-device capacity dispatch at a tight capacity
    cap_cfg = dataclasses.replace(cfg, moe_dispatch="capacity")
    single = np.asarray(_ffn(cap_cfg, layer, x))
    ep_tight = np.asarray(
        expert_parallel_ffn(mesh, cfg, gate_w, gate_bias, W1, W3, W2, x)
    )
    np.testing.assert_allclose(ep_tight, single, rtol=2e-5, atol=2e-6)


def test_expert_parallel_deepseek_matches_dense():
    """The deepseek grouped router (sigmoid + selection bias + shared
    experts) rides the same EP dispatch: 8-device 'ep' == dense-and-mask
    single device, and the single-device capacity path agrees too."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shardmerge_tpu.models.llama import ModelConfig, _ffn, init_params
    from shardmerge_tpu.parallel.mesh import make_mesh
    from shardmerge_tpu.parallel.moe import expert_parallel_ffn, shard_experts

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        moe_intermediate_size=24,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=4,
        model_type="deepseek_v3",
        kv_lora_rank=16,
        qk_nope_head_dim=8,
        qk_rope_head_dim=4,
        v_head_dim=8,
        num_local_experts=8,
        num_experts_per_tok=2,
        n_shared_experts=1,
        n_group=4,
        topk_group=2,
        topk_method="noaux_tc",
        routed_scaling_factor=2.5,
    )
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    layer = params["layers"][0]
    # nonzero selection bias so the biased-selection path matters
    layer["gate_bias"] = jax.random.normal(jax.random.PRNGKey(4), (8,)) * 0.2
    x = jax.random.normal(
        jax.random.PRNGKey(5), (2, 12, cfg.hidden_size), jnp.float32
    )

    dense = np.asarray(_ffn(cfg, layer, x))

    cap_cfg = dataclasses.replace(
        cfg, moe_dispatch="capacity",
        moe_capacity_factor=float(cfg.num_local_experts),
    )
    single_cap = np.asarray(_ffn(cap_cfg, layer, x))
    np.testing.assert_allclose(single_cap, dense, rtol=2e-5, atol=2e-6)

    mesh = make_mesh(("ep",))
    gate_w, gate_bias, W1, W3, W2 = shard_experts(mesh, layer)
    assert gate_bias is not None
    ep = np.asarray(
        expert_parallel_ffn(
            mesh, cfg, gate_w, gate_bias, W1, W3, W2, x,
            capacity_factor=float(cfg.num_local_experts),
            shared=(
                layer["shared_gate_proj"],
                layer["shared_up_proj"],
                layer["shared_down_proj"],
            ),
        )
    )
    np.testing.assert_allclose(ep, dense, rtol=2e-5, atol=2e-6)


def test_stack_expert_weights_for_capacity_dispatch():
    """Engine-side pre-stacking: experts convert to stacked (n_exp, ., .)
    arrays once (no per-forward restack), outputs unchanged; quantized
    experts refuse the conversion and keep the dense path."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shardmerge_tpu.models.llama import (
        ModelConfig,
        _ffn,
        init_params,
        stack_expert_weights,
    )

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        moe_dispatch="capacity",
        moe_capacity_factor=4.0,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, cfg.hidden_size), jnp.float32)
    before = _ffn(cfg, layer, x)

    assert stack_expert_weights(params)
    assert "experts" not in layer and "experts_stacked" in layer
    after = _ffn(cfg, layer, x)
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))

    # quantized experts: conversion refused, dense path still works
    from shardmerge_tpu.models.quant import quantize

    qparams = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    for e in qparams["layers"][0]["experts"]:
        for k in ("w1", "w3", "w2"):
            e[k] = quantize(e[k], bits=8)
    assert not stack_expert_weights(qparams)
    assert "experts" in qparams["layers"][0]
    out = _ffn(cfg, qparams["layers"][0], x)
    assert out.shape == x.shape


def test_ep_train_matches_dense_mask_mixtral():
    """'ep' composed into TRAINING: loss and grads of the expert-sharded
    (dp x ep) step equal the dense-and-mask single-device step, and a
    2-step adamw trajectory tracks the unsharded one exactly (the
    default no-drop capacity makes the dispatch a re-layout, not an
    approximation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from shardmerge_tpu.models.llama import (
        ModelConfig,
        init_params,
        stack_expert_weights,
    )
    from shardmerge_tpu.parallel.mesh import make_mesh
    from shardmerge_tpu.parallel.moe import make_ep_loss, make_ep_train_step
    from shardmerge_tpu.parallel.train import _loss_fn

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=8,
        num_experts_per_tok=2,
        norm_topk_prob=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(10), dtype=jnp.float32)
    sparams = init_params(cfg, jax.random.PRNGKey(10), dtype=jnp.float32)
    assert stack_expert_weights(sparams)
    batch = jax.random.randint(jax.random.PRNGKey(11), (4, 13), 0, 64)

    ref_loss, ref_grads = jax.value_and_grad(_loss_fn)(params, cfg, batch)

    mesh = make_mesh(("dp", "ep"), shape=(2, 4))
    loss_fn = make_ep_loss(mesh, cfg, sparams)
    ep_loss, ep_grads = jax.value_and_grad(loss_fn)(sparams, batch)
    np.testing.assert_allclose(float(ep_loss), float(ref_loss), rtol=1e-5)
    for li in range(cfg.num_hidden_layers):
        for wi, name in enumerate(("w1", "w3", "w2")):
            want = np.stack(
                [
                    np.asarray(e[name])
                    for e in ref_grads["layers"][li]["experts"]
                ]
            )
            got = np.asarray(ep_grads["layers"][li]["experts_stacked"][wi])
            np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(ep_grads["layers"][0]["q_proj"]),
        np.asarray(ref_grads["layers"][0]["q_proj"]),
        rtol=5e-4,
        atol=5e-5,
    )

    # 2-step trajectory == a plain single-device adamw on the dense loss
    tx = optax.adamw(1e-2)
    opt = tx.init(params)
    p_ref = params
    for _ in range(2):
        l_ref, g = jax.value_and_grad(_loss_fn)(p_ref, cfg, batch)
        upd, opt = tx.update(g, opt, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)

    init_state, train_step = make_ep_train_step(
        mesh, cfg, sparams, learning_rate=1e-2
    )
    state = init_state(sparams)
    state, l0 = train_step(state, batch)
    state, l1 = train_step(state, batch)
    np.testing.assert_allclose(float(l1), float(l_ref), rtol=1e-5)
    # the expert moments are genuinely ep-sharded
    mu = state["opt_state"][0].mu["layers"][0]["experts_stacked"][0]
    assert mu.sharding.spec[0] == "ep", mu.sharding.spec


def test_ep_train_matches_dense_mask_deepseek():
    """The deepseek grouped router (sigmoid scores, selection bias,
    grouped top-k, shared experts, MLA attention) trains under 'ep' with
    loss/grads equal to the dense-and-mask step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shardmerge_tpu.models.llama import (
        ModelConfig,
        init_params,
        stack_expert_weights,
    )
    from shardmerge_tpu.parallel.mesh import make_mesh
    from shardmerge_tpu.parallel.moe import make_ep_loss
    from shardmerge_tpu.parallel.train import _loss_fn

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        moe_intermediate_size=24,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        model_type="deepseek_v3",
        kv_lora_rank=16,
        qk_nope_head_dim=8,
        qk_rope_head_dim=4,
        v_head_dim=8,
        num_local_experts=8,
        num_experts_per_tok=2,
        n_shared_experts=1,
        n_group=4,
        topk_group=2,
        topk_method="noaux_tc",
        routed_scaling_factor=2.5,
    )
    params = init_params(cfg, jax.random.PRNGKey(12), dtype=jnp.float32)
    sparams = init_params(cfg, jax.random.PRNGKey(12), dtype=jnp.float32)
    for p in (params, sparams):
        for li, layer in enumerate(p["layers"]):
            layer["gate_bias"] = (
                jax.random.normal(jax.random.PRNGKey(20 + li), (8,)) * 0.2
            )
    assert stack_expert_weights(sparams)
    batch = jax.random.randint(jax.random.PRNGKey(13), (2, 13), 0, 64)

    ref_loss, ref_grads = jax.value_and_grad(_loss_fn)(params, cfg, batch)
    mesh = make_mesh(("ep",))  # ep-only mesh composes too
    loss_fn = make_ep_loss(mesh, cfg, sparams)
    ep_loss, ep_grads = jax.value_and_grad(loss_fn)(sparams, batch)
    np.testing.assert_allclose(float(ep_loss), float(ref_loss), rtol=1e-5)
    for wi, name in enumerate(("w1", "w3", "w2")):
        want = np.stack(
            [np.asarray(e[name]) for e in ref_grads["layers"][1]["experts"]]
        )
        got = np.asarray(ep_grads["layers"][1]["experts_stacked"][wi])
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(ep_grads["layers"][0]["shared_gate_proj"]),
        np.asarray(ref_grads["layers"][0]["shared_gate_proj"]),
        rtol=5e-4,
        atol=5e-5,
    )


def test_ep_loss_refusals():
    import jax
    import jax.numpy as jnp
    import pytest

    from shardmerge_tpu.models.llama import ModelConfig, init_params
    from shardmerge_tpu.parallel.mesh import make_mesh
    from shardmerge_tpu.parallel.moe import make_ep_loss

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=8,
        num_experts_per_tok=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(14), dtype=jnp.float32)
    mesh = make_mesh(("ep",))
    with pytest.raises(ValueError, match="stack_expert_weights"):
        make_ep_loss(mesh, cfg, params)  # unstacked expert lists
