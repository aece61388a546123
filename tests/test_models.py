"""Model tests: JAX Llama/Qwen2 forward vs HF transformers (torch CPU),
KV-cache decode equivalence, quantization, sampling, inference engine."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shardmerge_tpu.models.llama import (
    ModelConfig,
    forward,
    init_kv_cache,
    init_params,
    rope_tables,
)


def _tiny_cfg(**kw):
    defaults = dict(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def _run_forward(cfg, params, ids, cache_len=32):
    T = ids.shape[1]
    rope = rope_tables(cfg, cache_len)
    kv = init_kv_cache(cfg, ids.shape[0], cache_len, jnp.float32)
    positions = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(ids.shape[0], 0)
    logits, kv = forward(
        params,
        cfg,
        ids,
        positions,
        kv,
        cache_pos=0,
        rope=rope,
        attn_len=T,
    )
    return logits, kv


def _save_hf_model(hf_model, cfg_dict, path):
    path.mkdir(parents=True, exist_ok=True)
    hf_model.save_pretrained(str(path), safe_serialization=True)


@pytest.fixture(scope="module")
def hf_llama(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    model = LlamaForCausalLM(config).eval().to(torch.float32)
    path = tmp_path_factory.mktemp("hf_llama")
    _save_hf_model(model, config, path)
    return model, path


def test_forward_matches_transformers(hf_llama):
    import torch

    from shardmerge_tpu.models.loader import load_model, load_params

    model, path = hf_llama
    cfg = ModelConfig.from_pretrained(path)
    params = load_params(path, cfg, dtype=jnp.float32)

    ids = np.array([[1, 5, 9, 42, 77, 3]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()

    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=2e-4)


def test_qwen2_biases_match_transformers(tmp_path):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(1)
    config = Qwen2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = Qwen2ForCausalLM(config).eval().to(torch.float32)
    # give the biases nonzero values so the test is meaningful
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_proj.bias.uniform_(-0.5, 0.5)
            layer.self_attn.k_proj.bias.uniform_(-0.5, 0.5)
            layer.self_attn.v_proj.bias.uniform_(-0.5, 0.5)
    path = tmp_path / "qwen2"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.attention_bias
    params = load_params(path, cfg, dtype=jnp.float32)
    ids = np.array([[2, 8, 33, 100]], np.int32)
    import torch as _t

    with _t.no_grad():
        expected = model(_t.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=2e-4)


def test_llama3_rope_scaling_matches_transformers(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(2)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
    )
    model = LlamaForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "llama3"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    params = load_params(path, cfg, dtype=jnp.float32)
    ids = np.array([[3, 60, 119, 7, 22, 90, 11]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids), cache_len=64)
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=2e-4)


def test_kv_cache_decode_matches_full_forward(rng):
    cfg = _tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 7)), jnp.int32)

    full_logits, _ = _run_forward(cfg, params, ids)

    # prefill 6 tokens then decode token 7
    cache_len = 32
    rope = rope_tables(cfg, cache_len)
    kv = init_kv_cache(cfg, 1, cache_len, jnp.float32)
    logits_p, kv = forward(
        params,
        cfg,
        ids[:, :6],
        jnp.arange(6, dtype=jnp.int32)[None, :],
        kv,
        cache_pos=0,
        rope=rope,
        attn_len=6,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :6]), rtol=1e-4, atol=1e-5
    )
    logits_d, _ = forward(
        params,
        cfg,
        ids[:, 6:7],
        jnp.asarray([[6]], jnp.int32),
        kv,
        cache_pos=6,
        rope=rope,
        attn_len=7,
    )
    np.testing.assert_allclose(
        np.asarray(logits_d[:, 0]),
        np.asarray(full_logits[:, 6]),
        rtol=1e-4,
        atol=1e-5,
    )


def test_tied_embeddings():
    cfg = _tiny_cfg(tie_word_embeddings=True)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    assert "lm_head" not in params
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits, _ = _run_forward(cfg, params, ids)
    assert logits.shape == (1, 3, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_quantization_roundtrip(rng):
    from shardmerge_tpu.models.quant import dequant, quantize

    w = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
    for bits, tol in [(8, 0.02), (4, 0.3)]:
        wq = quantize(w, bits=bits)
        back = dequant(wq, jnp.float32)
        assert back.shape == w.shape
        max_err = float(jnp.max(jnp.abs(back - w)))
        scale = float(jnp.max(jnp.abs(w)))
        assert max_err <= tol * scale, (bits, max_err)


def test_int4_split_half_matmul_matches_dense_dequant(rng):
    """dequant_matmul's packed-int4 path decomposes the GEMV into two
    half-matmuls over the split-half nibble layout (low nibbles = columns
    [0, K/2), high = [K/2, K)); it must compute the same product as
    x @ dequant(W).T up to fp32 reduction order."""
    from shardmerge_tpu.models.quant import dequant, dequant_matmul, quantize

    w = jnp.asarray(rng.standard_normal((24, 64)).astype(np.float32))
    wq = quantize(w, bits=4)
    assert wq["q"].dtype == jnp.uint8 and wq["q"].shape == (24, 32)
    for lead in [(3,), (2, 5)]:
        x = jnp.asarray(rng.standard_normal(lead + (64,)).astype(np.float32))
        got = dequant_matmul(x, wq)
        want = x @ dequant(wq, jnp.float32).T
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_int4_pallas_kernel_matches_dense_dequant(rng):
    """The fused Pallas GEMV (quant_kernels.int4_matmul, interpret mode on
    this CPU suite) must reproduce x @ dequant(W).T; its f32 accumulator
    makes it at least as accurate as the XLA decomposition."""
    from shardmerge_tpu.models.quant import dequant, quantize
    from shardmerge_tpu.models.quant_kernels import int4_matmul, supported

    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    wq = quantize(w, bits=4)
    assert supported((1, 256), wq["q"].shape)
    want = None
    for lead in [(1,), (3,), (2, 4)]:
        x = jnp.asarray(rng.standard_normal(lead + (256,)).astype(np.float32))
        got = int4_matmul(x, wq["q"], wq["scale"])
        want = x @ dequant(wq, jnp.float32).T
        assert got.shape == want.shape
        # the kernel folds the +8 nibble offset out of the matmul
        # (x @ u.T - 8*sum(x)), a different f32 association than the
        # dense product — agreement is to f32 rounding, not bitwise
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
        )
    # differentiable w.r.t. x (frozen-base training paths)
    x = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum(int4_matmul(v, wq["q"], wq["scale"])))(x)
    g2 = jax.grad(lambda v: jnp.sum(v @ dequant(wq, jnp.float32).T))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=5e-4, atol=5e-4)


def test_int4_kernel_routing(rng, monkeypatch):
    """dequant_matmul routes aligned decode shapes to the Pallas kernel
    when forced on (env=1), never on the CPU backend by default (auto
    means kernel on real accelerators only), and refuses unaligned
    shapes regardless."""
    from shardmerge_tpu.models import quant
    from shardmerge_tpu.models.quant_kernels import supported

    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    wq = quant.quantize(w, bits=4)
    x = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))

    monkeypatch.setenv("SHARDMERGE_INT4_KERNEL", "")
    assert not quant._use_int4_kernel(x, wq["q"])  # cpu backend -> XLA
    monkeypatch.setenv("SHARDMERGE_INT4_KERNEL", "1")
    assert quant._use_int4_kernel(x, wq["q"])
    forced = quant.dequant_matmul(x, wq)  # interpret-mode kernel
    monkeypatch.setenv("SHARDMERGE_INT4_KERNEL", "0")
    assert not quant._use_int4_kernel(x, wq["q"])
    xla = quant.dequant_matmul(x, wq)
    np.testing.assert_allclose(
        np.asarray(forced), np.asarray(xla), rtol=5e-4, atol=5e-4
    )
    # unaligned N (not a multiple of 128) is unsupported
    w_odd = jnp.asarray(rng.standard_normal((24, 256)).astype(np.float32))
    assert not supported((2, 256), quant.quantize(w_odd, bits=4)["q"].shape)
    # oversized token batches stay on XLA (prefill regime)
    assert not supported((128, 256), wq["q"].shape)
    # GSPMD traces (mesh-sharded serving, auto-sharded train steps) run
    # inside suppress_int4_kernel(), which beats even the force env var —
    # and the suppression must NOT leak outside the scope
    monkeypatch.setenv("SHARDMERGE_INT4_KERNEL", "1")
    with quant.suppress_int4_kernel():
        assert not quant._use_int4_kernel(x, wq["q"])
    assert quant._use_int4_kernel(x, wq["q"])
    # the callable wrapper used by sharded engines / train steps scopes
    # each call the same way
    scoped = quant.scoped_without_int4_kernel(
        lambda: quant._use_int4_kernel(x, wq["q"])
    )
    assert not scoped()
    assert quant._use_int4_kernel(x, wq["q"])


def test_int4_stacked_pack_roundtrip(rng):
    """3-D expert stacks pack/unpack on the middle (reduction) dim with the
    same split-half layout; host-numpy and jnp packers must agree."""
    from shardmerge_tpu.models.quant import (
        dequant_stacked,
        quantize_stacked,
    )

    w = rng.standard_normal((3, 16, 8)).astype(np.float32)
    host = quantize_stacked(w, bits=4)
    dev = quantize_stacked(jnp.asarray(w), bits=4)
    assert host["q3"].shape == (3, 8, 8)
    np.testing.assert_array_equal(host["q3"], np.asarray(dev["q3"]))
    back = np.asarray(dequant_stacked(dev, jnp.float32))
    scale = np.max(np.abs(w), axis=1, keepdims=True)
    assert np.max(np.abs(back - w)) <= 0.3 * np.max(scale)


def test_quantized_forward_close(rng):
    from shardmerge_tpu.models.quant import quantize

    cfg = _tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    qparams = jax.tree.map(lambda x: x, params)  # shallow copy
    qparams["layers"] = [
        {
            k: (quantize(v, 8) if k.endswith("_proj") else v)
            for k, v in layer.items()
        }
        for layer in params["layers"]
    ]
    ids = jnp.asarray([[1, 5, 9]], jnp.int32)
    base_logits, _ = _run_forward(cfg, params, ids)
    q_logits, _ = _run_forward(cfg, qparams, ids)
    # int8 weight quantization keeps logits close
    np.testing.assert_allclose(
        np.asarray(q_logits), np.asarray(base_logits), rtol=0.2, atol=0.2
    )


def test_quantized_deepseek_forward_close(tmp_path):
    """int8 weight quantization covers the MLA projections (kv_b_proj is
    dequantized at use for the absorbed einsums) and the shared experts."""
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(15)
    config = DeepseekV3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        q_lora_rank=24,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        n_routed_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=1,
        n_group=2,
        topk_group=1,
        max_position_embeddings=256,
        rope_scaling=None,
        tie_word_embeddings=False,
    )
    model = DeepseekV3ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "dsq"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    params = load_params(path, cfg, dtype=jnp.float32)
    qparams = load_params(path, cfg, dtype=jnp.float32, quant_bits=8)
    assert isinstance(qparams["layers"][0]["kv_b_proj"], dict)
    assert isinstance(qparams["layers"][1]["shared_gate_proj"], dict)
    ids = jnp.asarray([[3, 19, 77, 101]], jnp.int32)
    base_logits, _ = _run_forward(cfg, params, ids)
    q_logits, _ = _run_forward(cfg, qparams, ids)
    np.testing.assert_allclose(
        np.asarray(q_logits), np.asarray(base_logits), rtol=0.2, atol=0.2
    )


def test_sampling_greedy_and_topk():
    from shardmerge_tpu.models.sampling import sample_token

    logits = jnp.asarray([[1.0, 5.0, 3.0, 0.0]], jnp.float32)
    mask = jnp.zeros((1, 4), bool)
    key = jax.random.PRNGKey(0)
    assert int(sample_token(logits, key, mask, greedy=True)[0]) == 1
    # top_k=1 must always pick the argmax regardless of randomness
    for seed in range(5):
        tok = sample_token(
            logits, jax.random.PRNGKey(seed), mask, 1.0, 1, 1.0, 1.0
        )
        assert int(tok[0]) == 1
    # top_p tiny -> argmax too
    tok = sample_token(logits, key, mask, 1.0, 0, 1e-6, 1.0)
    assert int(tok[0]) == 1


def test_sampling_repetition_penalty():
    from shardmerge_tpu.models.sampling import sample_token

    logits = jnp.asarray([[2.0, 1.9]], jnp.float32)
    # token 0 was generated; with a strong penalty token 1 wins
    mask = jnp.asarray([[True, False]])
    tok = sample_token(
        logits, jax.random.PRNGKey(0), mask, 1.0, 0, 1.0, 2.0, greedy=True
    )
    assert int(tok[0]) == 1


class StubTokenizer:
    """Minimal tokenizer for engine tests: one token per character."""

    chat_template = None
    eos_token_id = 0

    def encode(self, text):
        return [ord(c) % 96 + 2 for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr((i - 2) % 96 + 32) for i in ids if i != 0)


def test_inference_engine_stream(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(7)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    model = LlamaForCausalLM(config).eval()
    path = tmp_path / "m"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.inference import InferenceEngine

    engine = InferenceEngine.from_pretrained(
        str(path), tokenizer=StubTokenizer()
    )
    chunks = list(
        engine.stream_generation(
            "hi", max_new_tokens=8, greedy=True, use_template=False
        )
    )
    text = "".join(chunks)
    assert 0 < len(text) <= 9
    # deterministic greedy decoding
    chunks2 = list(
        engine.stream_generation(
            "hi", max_new_tokens=8, greedy=True, use_template=False
        )
    )
    assert "".join(chunks2) == text

    # the fused loop costs exactly ONE device call per generated token
    # (sample + penalty-mask update + forward) after the single-chunk
    # prefill — the dispatch budget the serving latency model relies on
    calls = {"fused": 0, "prefill": 0}
    orig_fused, orig_step = engine._fused_decode, engine._decode_step

    def count_fused(*a, **k):
        calls["fused"] += 1
        return orig_fused(*a, **k)

    def count_step(*a, **k):
        calls["prefill"] += 1
        return orig_step(*a, **k)

    engine._fused_decode, engine._decode_step = count_fused, count_step
    list(
        engine.stream_generation(
            "hi", max_new_tokens=8, greedy=True, use_template=False
        )
    )
    engine._fused_decode, engine._decode_step = orig_fused, orig_step
    assert calls["prefill"] == 1
    assert calls["fused"] <= 8  # == tokens generated (EOS may end early)

    # chunked decode (S steps per dispatch) emits the same tokens as the
    # step-per-dispatch loop, for greedy AND sampled decoding (the PRNG
    # split order is identical), in ceil(N/S) dispatches
    for greedy in (True, False):
        ref = "".join(
            engine.stream_generation(
                "hi", max_new_tokens=8, greedy=greedy, use_template=False
            )
        )
        calls = {"n": 0}
        orig_build = engine._build_chunk_decode

        def counting_build(S):
            inner = orig_build(S)

            def counted(*a, **k):
                calls["n"] += 1
                return inner(*a, **k)

            return counted

        engine._decode_chunks.clear()
        engine._build_chunk_decode = counting_build
        chunked = "".join(
            engine.stream_generation(
                "hi",
                max_new_tokens=8,
                greedy=greedy,
                use_template=False,
                decode_chunk=3,
            )
        )
        engine._build_chunk_decode = orig_build
        engine._decode_chunks.clear()
        assert chunked == ref
        assert calls["n"] <= 3  # ceil(8/3) full-size chunks of 3 each
        # (the last chunk's surplus token is discarded on host)


def test_prefix_cache_skips_shared_system_prompt(tmp_path):
    """Exact prefix caching: the second request sharing a long system
    prompt implants the cached KV slab and prefills only the remainder —
    same output as a cold engine, fewer prefill dispatches, and the LRU
    respects its slot budget."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(21)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    LlamaForCausalLM(config).eval().save_pretrained(
        str(tmp_path / "m"), safe_serialization=True
    )
    from shardmerge_tpu.inference import InferenceEngine

    system = "You are a helpful assistant. " * 4  # 116 chars -> 116 tokens
    prompts = [system + "first question", system + "second question?"]

    def gen(engine, prompt, meta=None):
        return "".join(
            engine.stream_generation(
                prompt, max_new_tokens=6, greedy=True, use_template=False,
                meta=meta,
            )
        )

    cold = InferenceEngine.from_pretrained(
        str(tmp_path / "m"), tokenizer=StubTokenizer()
    )
    cold.prompt_chunk = 64  # several prefill chunks at this prompt size
    want = [gen(cold, p) for p in prompts]

    warm = InferenceEngine.from_pretrained(
        str(tmp_path / "m"), tokenizer=StubTokenizer(),
        prefix_cache_slots=2,
    )
    warm.prompt_chunk = 64
    prefill_calls = {"n": 0}
    orig = warm._decode_step

    def counting(*a, **k):
        prefill_calls["n"] += 1
        return orig(*a, **k)

    warm._decode_step = counting
    meta0, meta1 = {}, {}
    got0 = gen(warm, prompts[0], meta0)
    first_request_prefills = prefill_calls["n"]
    got1 = gen(warm, prompts[1], meta1)
    second_request_prefills = prefill_calls["n"] - first_request_prefills
    warm._decode_step = orig

    assert [got0, got1] == want  # byte-identical to the cold engine
    assert meta0["prefix_cache_hit_tokens"] == 0
    # prompt is ~130 tokens; the shared prefix covers the first 64/128
    # bucket(s), so the second request prefills strictly less
    assert meta1["prefix_cache_hit_tokens"] >= 64
    assert second_request_prefills < first_request_prefills

    # LRU budget: a third distinct prefix evicts the oldest
    gen(warm, "Completely different system prompt. " * 4 + "hi")
    gen(warm, "Yet another unrelated preamble here. " * 4 + "hi")
    assert len(warm._prefix_cache) <= 2

    # byte budget: slabs that cannot fit the device budget are rejected
    tight = InferenceEngine.from_pretrained(
        str(tmp_path / "m"), tokenizer=StubTokenizer(),
        prefix_cache_slots=4, prefix_cache_bytes=64,
    )
    gen(tight, prompts[0])
    assert len(tight._prefix_cache) == 0
    assert tight._prefix_cache_used == 0

    # the speculative path uses the cache too (target AND draft slabs)
    spec = InferenceEngine.from_pretrained(
        str(tmp_path / "m"), tokenizer=StubTokenizer(),
        draft_model=str(tmp_path / "m"), prefix_cache_slots=4,
    )
    spec_meta0, spec_meta1 = {}, {}
    s0 = gen(spec, prompts[0], spec_meta0)
    s1 = gen(spec, prompts[1], spec_meta1)
    assert [s0, s1] == want  # speculative == plain greedy, warm or cold
    assert spec_meta0["prefix_cache_hit_tokens"] == 0
    assert spec_meta1["prefix_cache_hit_tokens"] >= 64
    kinds = {k for (k, _) in spec._prefix_cache}
    assert kinds == {"t", "d"}


def test_serve_single_prompt_uses_prefix_cache():
    """ModelServer routes single-prompt requests through the stream path
    when the engine has prefix caching, and the cache populates."""
    import json as _json
    import urllib.request

    from shardmerge_tpu.inference import InferenceEngine
    from shardmerge_tpu.models.llama import ModelConfig, init_params
    from shardmerge_tpu.serve import ModelServer

    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    engine = InferenceEngine(
        cfg, params, StubTokenizer(), prefix_cache_slots=2
    )
    server = ModelServer(engine, model_id="pfx")
    port = server.start(port=0)
    system = "the shared system preamble goes here. " * 3

    def post(prompt):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=_json.dumps(
                {"prompt": prompt, "max_tokens": 4, "greedy": True}
            ).encode(),
        )
        with urllib.request.urlopen(req) as resp:
            return _json.loads(resp.read())["choices"][0]["text"]

    try:
        t1 = post(system + "one")
        assert len(engine._prefix_cache) == 1  # slab stored
        t2 = post(system + "one")  # identical prompt: full-prefix hit
        assert t2 == t1
    finally:
        server.stop()


def test_generate_batch_chunked_matches_stepwise(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(11)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    LlamaForCausalLM(config).eval().save_pretrained(
        str(tmp_path / "m"), safe_serialization=True
    )
    from shardmerge_tpu.inference import InferenceEngine

    engine = InferenceEngine.from_pretrained(
        str(tmp_path / "m"), tokenizer=StubTokenizer()
    )
    prompts = ["hello there", "hi"]
    ref = engine.generate_batch(
        prompts, max_new_tokens=7, greedy=True, use_template=False
    )
    chunked = engine.generate_batch(
        prompts, max_new_tokens=7, greedy=True, use_template=False,
        decode_chunk=4,
    )
    assert chunked == ref


def test_inference_engine_streams_deepseek(tmp_path):
    """The engine's generic load/prefill/decode path serves MLA models (the
    compressed cache rides the same opaque kv pytree)."""
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(13)
    config = DeepseekV3Config(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        q_lora_rank=16,
        kv_lora_rank=16,
        qk_nope_head_dim=8,
        qk_rope_head_dim=4,
        v_head_dim=8,
        n_routed_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=1,
        n_group=2,
        topk_group=1,
        max_position_embeddings=512,
        rope_scaling=None,
        tie_word_embeddings=False,
    )
    model = DeepseekV3ForCausalLM(config).eval()
    path = tmp_path / "ds"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.inference import InferenceEngine

    engine = InferenceEngine.from_pretrained(str(path), tokenizer=StubTokenizer())
    text = "".join(
        engine.stream_generation(
            "hi", max_new_tokens=6, greedy=True, use_template=False
        )
    )
    assert 0 < len(text) <= 7


def test_speculative_decoding_exact_and_fewer_dispatches(tmp_path):
    """Greedy speculative decoding emits EXACTLY the plain-greedy sequence —
    with a weak (differently-seeded) draft and with a perfect (identical)
    draft — and the perfect draft provably cuts target dispatches."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    def make(seed, path):
        torch.manual_seed(seed)
        config = LlamaConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=1,
            num_attention_heads=2,
            num_key_value_heads=2,
            max_position_embeddings=512,
        )
        LlamaForCausalLM(config).eval().save_pretrained(
            str(path), safe_serialization=True
        )

    make(7, tmp_path / "target")
    make(8, tmp_path / "weak_draft")

    from shardmerge_tpu.inference import InferenceEngine

    def run(engine, **kw):
        # target dispatches = prefill/verify forwards (_decode_step) plus
        # the plain loop's fused sample+forward steps (_fused_decode)
        calls = {"target": 0}
        orig = engine._decode_step
        orig_fused = engine._fused_decode

        def counting(*a, **k):
            calls["target"] += 1
            return orig(*a, **k)

        def counting_fused(*a, **k):
            calls["target"] += 1
            return orig_fused(*a, **k)

        engine._decode_step = counting
        engine._fused_decode = counting_fused
        text = "".join(
            engine.stream_generation(
                "hello there", max_new_tokens=16, greedy=True,
                use_template=False, **kw,
            )
        )
        engine._decode_step = orig
        engine._fused_decode = orig_fused
        return text, calls["target"]

    plain = InferenceEngine.from_pretrained(
        str(tmp_path / "target"), tokenizer=StubTokenizer()
    )
    expected, plain_calls = run(plain)

    weak = InferenceEngine.from_pretrained(
        str(tmp_path / "target"),
        tokenizer=StubTokenizer(),
        draft_model=str(tmp_path / "weak_draft"),
        speculation_k=4,
    )
    got, _ = run(weak)
    assert got == expected  # exactness does not depend on draft quality

    perfect = InferenceEngine.from_pretrained(
        str(tmp_path / "target"),
        tokenizer=StubTokenizer(),
        draft_model=str(tmp_path / "target"),
        speculation_k=4,
    )
    got2, perfect_calls = run(perfect)
    assert got2 == expected
    # a perfect draft accepts every proposal: ceil(16/4) verify dispatches
    # (+0 from prefill) vs one per token in the plain loop
    assert perfect_calls < plain_calls
    assert perfect_calls <= -(-16 // 4) + 1

    # sampling (non-greedy) falls back to the plain path and still works
    sampled = "".join(
        weak.stream_generation(
            "hello", max_new_tokens=4, greedy=False, use_template=False
        )
    )
    assert isinstance(sampled, str)

    # the whole round (catch-up + proposal scan + verify) is ONE dispatch
    round_calls = {"n": 0}
    orig_round = perfect._spec_round

    def counting_round(*a, **kw):
        round_calls["n"] += 1
        return orig_round(*a, **kw)

    perfect._spec_round = counting_round
    got3, _ = run(perfect)
    perfect._spec_round = orig_round
    assert got3 == expected
    assert round_calls["n"] <= -(-16 // 4) + 1

    # speculative decoding composes with tensor-parallel serving: the
    # verify dispatch runs on the sharded target, the draft stays local.
    # Compare sharded-vs-sharded: GSPMD collectives reorder reductions, so
    # sharded logits can resolve fp near-ties differently than unsharded
    plain_sharded = InferenceEngine.from_pretrained(
        str(tmp_path / "target"), tokenizer=StubTokenizer(), shard=True
    )
    expected_sharded, _ = run(plain_sharded)
    spec_sharded = InferenceEngine.from_pretrained(
        str(tmp_path / "target"),
        tokenizer=StubTokenizer(),
        draft_model=str(tmp_path / "target"),
        speculation_k=4,
        shard=True,
    )
    assert spec_sharded.mesh is not None
    got4, _ = run(spec_sharded)
    assert got4 == expected_sharded

    # meta reports finish_reason; max_new_tokens=0 emits nothing (both paths)
    meta = {}
    out0 = "".join(
        perfect.stream_generation(
            "hi", max_new_tokens=0, greedy=True, use_template=False, meta=meta
        )
    )
    assert out0 == "" and meta["finish_reason"] == "length"
    assert (
        "".join(
            plain.stream_generation(
                "hi", max_new_tokens=0, greedy=True, use_template=False
            )
        )
        == ""
    )


def test_sharded_serving_matches_single_device(tmp_path):
    """shard=True tensor-parallelizes the engine over the 8-device harness:
    greedy streaming output equals the unsharded engine's, for both raw and
    int8-quantized weights (quantized {q, scale} leaves shard too)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(21)
    # 8 kv heads so the head axis divides the 8-device mesh (indivisible
    # head counts keep a replicated cache — still correct, not asserted)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        max_position_embeddings=512,
    )
    model = LlamaForCausalLM(config).eval()
    path = tmp_path / "m"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.inference import InferenceEngine

    def gen(engine):
        return "".join(
            engine.stream_generation(
                "sharding test", max_new_tokens=10, greedy=True,
                use_template=False,
            )
        )

    plain = gen(InferenceEngine.from_pretrained(str(path), tokenizer=StubTokenizer()))
    sharded_engine = InferenceEngine.from_pretrained(
        str(path), tokenizer=StubTokenizer(), shard=True
    )
    assert sharded_engine.mesh is not None
    assert sharded_engine._kv_head_sharding is not None

    # streaming placement: the loader itself must put weights straight
    # onto their tensor-parallel shardings (a bigger-than-one-chip model
    # cannot stage on the default device first)
    from jax.sharding import Mesh
    from shardmerge_tpu.models.loader import load_params

    direct = load_params(
        path, mesh=Mesh(np.asarray(jax.devices()), ("tp",))
    )
    assert not direct["layers"][0]["q_proj"].sharding.is_fully_replicated
    assert direct["norm"].sharding.is_fully_replicated
    # params really are distributed
    q0 = sharded_engine.params["layers"][0]["q_proj"]
    assert not q0.sharding.is_fully_replicated
    assert gen(sharded_engine) == plain

    plain_q = gen(
        InferenceEngine.from_pretrained(
            str(path), tokenizer=StubTokenizer(), load_in_8bit=True
        )
    )
    sharded_q = gen(
        InferenceEngine.from_pretrained(
            str(path), tokenizer=StubTokenizer(), load_in_8bit=True, shard=True
        )
    )
    assert sharded_q == plain_q


def test_chunked_prefill_matches_monolithic(tmp_path):
    """Prefill in small chunks (prompt_chunk=8 -> 4+ chunks for a 30-token
    prompt) emits exactly what the single-chunk prefill emits — streaming,
    batched, and speculative paths."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(22)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    LlamaForCausalLM(config).eval().save_pretrained(
        str(tmp_path / "m"), safe_serialization=True
    )

    from shardmerge_tpu.inference import InferenceEngine

    prompt = "the quick brown fox jumps over"  # 30 chars -> 30 tokens

    def engine(chunk=None, **kw):
        e = InferenceEngine.from_pretrained(
            str(tmp_path / "m"), tokenizer=StubTokenizer(), **kw
        )
        if chunk:
            e.prompt_chunk = chunk
        return e

    def gen(e):
        return "".join(
            e.stream_generation(
                prompt, max_new_tokens=8, greedy=True, use_template=False
            )
        )

    expected = gen(engine())
    assert gen(engine(chunk=8)) == expected

    big = engine()
    small = engine(chunk=8)
    prompts = [prompt, "lazy dog"]
    assert small.generate_batch(
        prompts, max_new_tokens=6, greedy=True, use_template=False
    ) == big.generate_batch(
        prompts, max_new_tokens=6, greedy=True, use_template=False
    )

    spec = engine(chunk=8, draft_model=str(tmp_path / "m"))
    assert gen(spec) == expected


def test_dynamic_batcher_coalesces_compatible_requests():
    """Concurrent requests with matching sampling params merge into ONE
    lockstep decode (padded to a power-of-two batch, padding rows dropped);
    incompatible params form their own group; engine errors reach every
    waiter."""
    import threading as th

    from shardmerge_tpu.serve import ModelServer

    calls = []
    gate = th.Event()

    class FakeEngine:
        cfg = type("C", (), {"vocab_size": 128})()
        draft_cfg = None

        def generate_batch(self, prompts, return_meta=False, **kw):
            gate.wait(timeout=5)  # hold the first group until all enqueued
            calls.append((list(prompts), dict(kw)))
            if kw.get("seed") == 666:
                raise RuntimeError("device on fire")
            return [f"r:{p}" for p in prompts], ["stop"] * len(prompts)

    # generous window: this 1-core host can schedule threads very late
    server = ModelServer(FakeEngine(), batch_window_ms=2000.0)
    kwargs = {"greedy": True, "max_new_tokens": 4, "seed": 0}
    results = {}

    def post(name, prompts, kw):
        results[name] = server._generate(prompts, kw)

    import time

    threads = [
        th.Thread(target=post, args=(f"t{i}", [f"p{i}"], dict(kwargs)))
        for i in range(3)
    ]
    for t in threads:
        t.start()
    time.sleep(0.5)  # compatible trio enqueued within the window
    hot = th.Thread(
        target=post, args=("hot", ["ph"], {**kwargs, "max_new_tokens": 9})
    )
    hot.start()
    threads.append(hot)
    time.sleep(0.3)
    gate.set()
    for t in threads:
        t.join(timeout=20)

    assert all(not t.is_alive() for t in threads)
    for i in range(3):
        assert results[f"t{i}"]["choices"][0]["text"] == f"r:p{i}"
    assert results["hot"]["choices"][0]["text"] == "r:ph"
    # the three compatible single prompts shared one padded call; the
    # incompatible one ran alone
    sizes = sorted(len(p) for p, _ in calls)
    assert len(calls) == 2, calls
    assert sizes == [1, 4]  # 3 prompts padded to the power-of-two bucket
    merged = next(p for p, kw in calls if len(p) == 4)
    assert merged[3] == merged[2]  # pad row repeats the last prompt

    # non-greedy requests bypass the batcher (coalescing would make the
    # sampled output depend on batch companions despite the seed)
    out = server._generate(["solo"], {**kwargs, "greedy": False})
    assert out["choices"][0]["text"] == "r:solo"
    assert calls[-1][0] == ["solo"]  # unpadded, ungrouped

    # errors propagate to every waiter in the group
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="device on fire"):
        server._generate(["x"], {**kwargs, "seed": 666})
    server.stop()
    with _pytest.raises(RuntimeError, match="server stopped"):
        server.batcher.submit(["late"], kwargs)


def test_serve_routes_greedy_single_prompt_to_speculative():
    """ModelServer._generate uses the speculative stream for single greedy
    prompts when a draft is loaded, and the batched path otherwise."""
    from shardmerge_tpu.serve import ModelServer

    calls = []

    class FakeEngine:
        cfg = type("C", (), {"vocab_size": 128})()
        draft_cfg = object()  # draft loaded

        def stream_generation(self, prompt, meta=None, **kw):
            calls.append("spec")
            if meta is not None:
                meta["finish_reason"] = "stop"
            yield "spec-out"

        def generate_batch(self, prompts, return_meta=False, **kw):
            calls.append("batch")
            return [f"b:{p}" for p in prompts], ["length"] * len(prompts)

    server = ModelServer(FakeEngine(), model_id="m")
    out = server._generate(["hi"], {"greedy": True, "max_new_tokens": 4})
    assert out["choices"][0]["text"] == "spec-out"
    assert out["choices"][0]["finish_reason"] == "stop"
    out = server._generate(["a", "b"], {"greedy": True, "max_new_tokens": 4})
    assert [c["text"] for c in out["choices"]] == ["b:a", "b:b"]
    out = server._generate(["hi"], {"greedy": False, "max_new_tokens": 4})
    assert out["choices"][0]["text"] == "b:hi"
    assert calls == ["spec", "batch", "batch"]


def test_inference_engine_rejects_double_quant(tmp_path):
    from shardmerge_tpu.inference import InferenceEngine

    with pytest.raises(ValueError, match="both 4-bit and 8-bit"):
        InferenceEngine.from_pretrained(
            str(tmp_path), load_in_4bit=True, load_in_8bit=True
        )


class ChatStubTokenizer(StubTokenizer):
    chat_template = "stub"

    def apply_chat_template(self, messages, tokenize=True, add_generation_prompt=True):
        assert messages[-1]["role"] == "user"
        text = " ".join(m["content"] for m in messages)
        return self.encode(text)


def test_inference_engine_chat_template(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(9)
    config = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    LlamaForCausalLM(config).eval().save_pretrained(
        str(tmp_path / "m"), safe_serialization=True
    )
    from shardmerge_tpu.inference import ChatMessage, InferenceEngine

    engine = InferenceEngine.from_pretrained(
        str(tmp_path / "m"), tokenizer=ChatStubTokenizer()
    )
    chunks = list(
        engine.stream_generation(
            "question",
            max_new_tokens=4,
            greedy=True,
            system_prompt="sys",
            previous_messages=[ChatMessage(role="assistant", content="prev")],
        )
    )
    assert chunks  # template path produced output


def test_prompt_bucketing_consistent(tmp_path):
    """Two prompts of different lengths within one bucket produce sane,
    deterministic output (padding must not leak into logits)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(10)
    config = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    LlamaForCausalLM(config).eval().save_pretrained(
        str(tmp_path / "m"), safe_serialization=True
    )
    from shardmerge_tpu.inference import InferenceEngine

    engine = InferenceEngine.from_pretrained(
        str(tmp_path / "m"), tokenizer=StubTokenizer()
    )
    a = "".join(
        engine.stream_generation("ab", max_new_tokens=5, greedy=True, use_template=False)
    )
    b = "".join(
        engine.stream_generation("ab", max_new_tokens=5, greedy=True, use_template=False)
    )
    assert a == b
    # a longer prompt in the same bucket also works
    c = "".join(
        engine.stream_generation(
            "abcdefghij", max_new_tokens=5, greedy=True, use_template=False
        )
    )
    assert isinstance(c, str)


def test_engine_8bit_quantized_close(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(14)
    config = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    LlamaForCausalLM(config).eval().save_pretrained(
        str(tmp_path / "m"), safe_serialization=True
    )
    from shardmerge_tpu.inference import InferenceEngine
    from .test_models import StubTokenizer  # self-import ok at module level

    full = InferenceEngine.from_pretrained(str(tmp_path / "m"), tokenizer=StubTokenizer())
    q8 = InferenceEngine.from_pretrained(
        str(tmp_path / "m"), load_in_8bit=True, tokenizer=StubTokenizer()
    )
    out_full = "".join(
        full.stream_generation("abc", max_new_tokens=6, greedy=True, use_template=False)
    )
    out_q8 = "".join(
        q8.stream_generation("abc", max_new_tokens=6, greedy=True, use_template=False)
    )
    # int8 weight quantization should rarely flip greedy tokens on a tiny model;
    # at minimum both produce valid output of the same length scale
    assert out_q8 and out_full


def test_gemma_matches_transformers(tmp_path):
    """Gemma-1: (1+w) RMSNorm, sqrt(hidden) embed scale, GeGLU, tied head."""
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(4)
    config = GemmaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        hidden_activation="gelu_pytorch_tanh",
    )
    model = GemmaForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "gemma"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.is_gemma and cfg.tie_word_embeddings
    assert cfg.hidden_act == "gelu_pytorch_tanh"
    params = load_params(path, cfg, dtype=jnp.float32)
    ids = np.array([[3, 7, 29, 55, 101]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=2e-4)


def test_gemma2_matches_transformers(tmp_path):
    """Gemma-2: post-norm blocks, logit softcapping, query_pre_attn_scalar,
    alternating sliding-window attention, explicit head_dim."""
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(5)
    config = Gemma2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        hidden_activation="gelu_pytorch_tanh",
        query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        sliding_window=4,  # shorter than the prompt so the window matters
    )
    model = Gemma2ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "gemma2"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.is_gemma2 and cfg.sliding_window == 4
    assert cfg.layer_is_sliding(0) and not cfg.layer_is_sliding(1)
    params = load_params(path, cfg, dtype=jnp.float32)
    assert "pre_feedforward_layernorm" in params["layers"][0]
    ids = np.array([[2, 9, 31, 60, 99, 12, 47, 88]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)


def test_phi3_fused_weights_match_transformers(tmp_path):
    """Phi-3: fused qkv_proj / gate_up_proj checkpoints split on load."""
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(6)
    config = Phi3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        pad_token_id=0,  # default 32000 overflows the tiny vocab
    )
    model = Phi3ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "phi3"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    params = load_params(path, cfg, dtype=jnp.float32)
    assert "q_proj" in params["layers"][0]
    assert "gate_proj" in params["layers"][0]
    ids = np.array([[4, 11, 76, 23]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=2e-4)


def test_phi3_longrope_matches_transformers(tmp_path):
    """Phi-3 128k checkpoints ship rope_scaling type 'longrope': per-dim
    short/long inverse-frequency factors plus a cos/sin attention factor
    derived from max/original position embeddings. Compare within the
    original window (short factors + attention factor active since
    factor = max/original = 2 > 1)."""
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(7)
    short = [1.0 + 0.05 * i for i in range(8)]
    long = [2.0 + 0.1 * i for i in range(8)]
    config = Phi3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        original_max_position_embeddings=32,
        rope_theta=10000.0,
        rope_scaling={
            "type": "longrope",
            "short_factor": short,
            "long_factor": long,
        },
        tie_word_embeddings=False,
        pad_token_id=0,
    )
    model = Phi3ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "phi3lr"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.original_max_position_embeddings == 32
    params = load_params(path, cfg, dtype=jnp.float32)
    ids = np.array([[5, 19, 44, 91, 7, 63]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    # cache_len == original window -> short factors, like HF's default init
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids), cache_len=32)
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=2e-4)


def test_unknown_rope_scaling_raises():
    import pytest as _pytest

    from shardmerge_tpu.models.llama import rope_tables

    cfg = _tiny_cfg(rope_scaling={"type": "dynamic", "factor": 2.0})
    with _pytest.raises(NotImplementedError, match="dynamic"):
        rope_tables(cfg, 16)

    # yarn is supported (deepseek context extension) and contracts the
    # interpolated low frequencies
    cfg_yarn = _tiny_cfg(
        rope_scaling={
            "type": "yarn",
            "factor": 4.0,
            "original_max_position_embeddings": 8,
        }
    )
    cos, _ = rope_tables(cfg_yarn, 16)
    cos0, _ = rope_tables(_tiny_cfg(), 16)
    assert not np.allclose(np.asarray(cos), np.asarray(cos0))


def test_qwen3_qk_norm_matches_transformers(tmp_path):
    """Qwen3: per-head q/k RMSNorm before RoPE, explicit head_dim, no
    attention biases."""
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(8)
    config = Qwen3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = Qwen3ForCausalLM(config).eval().to(torch.float32)
    # nontrivial norm weights so the q/k norms are actually exercised
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.uniform_(0.5, 1.5)
            layer.self_attn.k_norm.weight.uniform_(0.5, 1.5)
    path = tmp_path / "qwen3"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.qk_norm and not cfg.attention_bias
    params = load_params(path, cfg, dtype=jnp.float32)
    assert "q_norm" in params["layers"][0]
    ids = np.array([[6, 14, 83, 27, 119]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=2e-4)


def test_mistral_sliding_window_matches_transformers(tmp_path):
    """Mistral: llama arch + sliding-window attention on EVERY layer. The
    window is shorter than the prompt so the mask actually matters."""
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(9)
    config = MistralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        sliding_window=3,
        tie_word_embeddings=False,
    )
    model = MistralForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "mistral"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.sliding_window == 3
    assert cfg.layer_is_sliding(0) and cfg.layer_is_sliding(1)
    params = load_params(path, cfg, dtype=jnp.float32)
    ids = np.array([[2, 9, 31, 60, 99, 12, 47, 88]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=2e-4)


def test_qwen3_moe_matches_transformers(tmp_path):
    """Qwen3-MoE: mlp.gate/mlp.experts naming, moe_intermediate_size
    narrower than the dense width, norm_topk_prob honored, q/k norms."""
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(10)
    config = Qwen3MoeConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = Qwen3MoeForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "qwen3moe"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.num_local_experts == 4 and cfg.moe_intermediate_size == 48
    assert cfg.norm_topk_prob and cfg.qk_norm
    params = load_params(path, cfg, dtype=jnp.float32)
    layer0 = params["layers"][0]
    assert "experts" in layer0 and layer0["experts"][0]["w1"].shape == (48, 64)
    ids = np.array([[1, 22, 87, 45, 103, 9]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)

    # capacity dispatch must agree with the dense-and-mask path here too
    import dataclasses

    cfg_cap = dataclasses.replace(
        cfg, moe_dispatch="capacity", moe_capacity_factor=float(cfg.num_local_experts)
    )
    logits_cap, _ = _run_forward(cfg_cap, params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(logits_cap), np.asarray(logits), rtol=1e-5, atol=1e-5
    )


def test_deepseek_v2_matches_transformers(tmp_path):
    """DeepSeek-V2: MLA attention (q_lora bottleneck, compressed-latent kv,
    absorbed kv_b matmuls, interleaved rope on the shared pe dims) +
    group-limited-greedy softmax MoE routing with shared experts and dense
    first_k layers."""
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(11)
    config = DeepseekV2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        q_lora_rank=24,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        n_routed_experts=8,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=1,
        topk_method="group_limited_greedy",
        n_group=4,
        topk_group=2,
        routed_scaling_factor=1.5,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    model = DeepseekV2ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "dsv2"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.is_mla and cfg.rope_interleave and cfg.qk_head_dim == 24
    assert cfg.topk_method == "group_limited_greedy"
    params = load_params(path, cfg, dtype=jnp.float32)
    assert "q_a_proj" in params["layers"][0]
    assert "experts" not in params["layers"][0]  # dense first_k layer
    assert "shared_gate_proj" in params["layers"][1]
    ids = np.array([[3, 17, 91, 54, 120, 8]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)


def test_deepseek_v3_matches_transformers(tmp_path):
    """DeepSeek-V3: sigmoid router with e_score_correction_bias selection
    (top-2-sum group limiting), normalized top-k weights x
    routed_scaling_factor, yarn rope with the mscale^2 score-scale fold."""
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(12)
    config = DeepseekV3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        q_lora_rank=24,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        n_routed_experts=8,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=1,
        n_group=4,
        topk_group=2,
        norm_topk_prob=True,
        routed_scaling_factor=2.5,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rope_interleave=True,
        rope_scaling={
            "rope_type": "yarn",
            "factor": 2.0,
            "beta_fast": 32,
            "beta_slow": 1,
            "mscale": 1.0,
            "mscale_all_dim": 1.0,
            "original_max_position_embeddings": 64,
        },
        tie_word_embeddings=False,
        attention_bias=False,
    )
    model = DeepseekV3ForCausalLM(config).eval().to(torch.float32)
    # nonzero selection bias so the bias-for-selection/unbiased-weights
    # asymmetry is actually exercised
    with torch.no_grad():
        for layer in model.model.layers[config.first_k_dense_replace :]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    path = tmp_path / "dsv3"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.topk_method == "noaux_tc" and cfg.rope_interleave
    # yarn mscale_all_dim folds into the score scale (mscale(2.0)^2)
    assert cfg.mla_softmax_scale != cfg.qk_head_dim**-0.5
    params = load_params(path, cfg, dtype=jnp.float32)
    assert "gate_bias" in params["layers"][1]
    ids = np.array([[5, 44, 73, 12, 99, 2]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)

    # the capacity (serving) dispatch must agree with dense-and-mask on the
    # checkpoint weights too
    import dataclasses

    cfg_cap = dataclasses.replace(
        cfg,
        moe_dispatch="capacity",
        moe_capacity_factor=float(cfg.num_local_experts),
    )
    logits_cap, _ = _run_forward(cfg_cap, params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(logits_cap), np.asarray(logits), rtol=1e-5, atol=1e-5
    )


def test_gpt_oss_matches_transformers(tmp_path):
    """GPT-OSS: attention sinks in the softmax normalization, per-layer
    sliding/full alternation via layer_types, q/k/v/o biases, yarn rope
    (truncate=False), and the fused-interleaved clamped-SwiGLU MoE with a
    biased top-k-then-softmax router."""
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(14)
    config = GptOssConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=3,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = GptOssForCausalLM(config).eval().to(torch.float32)
    # biases init to zero; randomize so the q/k/v/o-bias and router-bias
    # paths actually matter
    with torch.no_grad():
        for layer in model.model.layers:
            for mod in (
                layer.self_attn.q_proj,
                layer.self_attn.k_proj,
                layer.self_attn.v_proj,
                layer.self_attn.o_proj,
            ):
                mod.bias.uniform_(-0.3, 0.3)
            layer.mlp.router.bias.uniform_(-0.5, 0.5)
            layer.mlp.experts.gate_up_proj_bias.uniform_(-0.3, 0.3)
            layer.mlp.experts.down_proj_bias.uniform_(-0.3, 0.3)
    path = tmp_path / "gptoss"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.layer_types == ("sliding_attention", "full_attention")
    assert cfg.layer_is_sliding(0) and not cfg.layer_is_sliding(1)
    assert cfg.attention_bias and cfg.sliding_window == 3
    assert cfg.rope_scaling["rope_type"] == "yarn"
    params = load_params(path, cfg, dtype=jnp.float32)
    layer0 = params["layers"][0]
    assert "sinks" in layer0 and "o_bias" in layer0
    assert layer0["gptoss_experts"]["gate_up"].shape == (4, 64, 96)
    ids = np.array([[7, 61, 113, 28, 84, 3, 55, 19]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)


def test_quantized_gptoss_forward_close(tmp_path):
    """int8 (and int4) quantization covers the fused gpt-oss expert stacks
    (per-expert, per-output-channel scales; dequantized at use)."""
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(16)
    config = GptOssConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=3,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = GptOssForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "gq"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    params = load_params(path, cfg, dtype=jnp.float32)
    ids = jnp.asarray([[9, 31, 64, 120]], jnp.int32)
    base_logits, _ = _run_forward(cfg, params, ids)

    for bits in (8, 4):
        qparams = load_params(path, cfg, dtype=jnp.float32, quant_bits=bits)
        e0 = qparams["layers"][0]["gptoss_experts"]
        assert isinstance(e0["gate_up"], dict) and "q3" in e0["gate_up"]
        q_logits, _ = _run_forward(cfg, qparams, ids)
        tol = 0.2 if bits == 8 else 0.8
        np.testing.assert_allclose(
            np.asarray(q_logits), np.asarray(base_logits), rtol=tol, atol=tol
        )


def test_gpt_oss_kv_cache_decode_matches_full(rng):
    """Prefill + decode through the cache reproduce the full forward with
    sinks and per-layer sliding windows active."""
    cfg = _tiny_cfg(
        model_type="gpt_oss",
        head_dim_override=16,
        attention_bias=True,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=3,
        layer_types=("sliding_attention", "full_attention"),
    )
    params = init_params(cfg, jax.random.PRNGKey(9), dtype=jnp.float32)
    # nonzero sinks so the sink path matters
    for layer in params["layers"]:
        layer["sinks"] = jax.random.normal(
            jax.random.PRNGKey(10), (cfg.num_attention_heads,)
        )
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 7)), jnp.int32)
    full_logits, _ = _run_forward(cfg, params, ids, cache_len=16)

    cache_len = 16
    rope = rope_tables(cfg, cache_len)
    kv = init_kv_cache(cfg, 1, cache_len, jnp.float32)
    T0 = 4
    pos = jnp.arange(T0, dtype=jnp.int32)[None, :]
    logits, kv = forward(
        params, cfg, ids[:, :T0], pos, kv, cache_pos=0, rope=rope, attn_len=T0
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :T0]), rtol=1e-4, atol=1e-4
    )
    for t in range(T0, 7):
        logits, kv = forward(
            params,
            cfg,
            ids[:, t : t + 1],
            jnp.full((1, 1), t, jnp.int32),
            kv,
            cache_pos=t,
            rope=rope,
            attn_len=t + 1,
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]),
            np.asarray(full_logits[:, t]),
            rtol=1e-4,
            atol=1e-4,
        )


def test_smollm3_nope_matches_transformers(tmp_path):
    """SmolLM3: per-layer NoPE (no_rope_layers gates rotary off every 4th
    layer by default) with tied embeddings."""
    import torch
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    torch.manual_seed(17)
    config = SmolLM3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        use_sliding_window=False,
        pad_token_id=0,  # default 128004 exceeds the tiny vocab
    )
    model = SmolLM3ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "smollm3"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    # default interval-4 pattern: every 4th layer is NoPE
    assert cfg.no_rope_layers == (1, 1, 1, 0)
    assert cfg.layer_uses_rope(0) and not cfg.layer_uses_rope(3)
    assert cfg.tie_word_embeddings
    params = load_params(path, cfg, dtype=jnp.float32)
    ids = np.array([[4, 29, 88, 17, 110, 6]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)


def test_olmo2_matches_transformers(tmp_path):
    """Olmo2: post-norm residuals with NO input layernorm, and RMSNorm over
    the FULL projected q/k vectors before the head split."""
    import torch
    from transformers import Olmo2Config, Olmo2ForCausalLM

    torch.manual_seed(18)
    config = Olmo2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        pad_token_id=0,
    )
    model = Olmo2ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "olmo2"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.is_olmo2 and cfg.qk_norm_full
    params = load_params(path, cfg, dtype=jnp.float32)
    layer0 = params["layers"][0]
    assert "input_layernorm" not in layer0
    assert layer0["q_norm"].shape == (64,)  # FULL q width, not head_dim
    assert "post_feedforward_layernorm" in layer0
    ids = np.array([[6, 41, 95, 13, 77, 2]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)

    # cache decode equivalence through the post-norm structure
    cache_len = 16
    rope = rope_tables(cfg, cache_len)
    kv = init_kv_cache(cfg, 1, cache_len, jnp.float32)
    full_logits = logits
    logits_p, kv = forward(
        params, cfg, jnp.asarray(ids[:, :4]),
        jnp.arange(4, dtype=jnp.int32)[None, :], kv,
        cache_pos=0, rope=rope, attn_len=4,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :4]),
        rtol=1e-4, atol=1e-4,
    )
    step_logits, _ = forward(
        params, cfg, jnp.asarray(ids[:, 4:5]),
        jnp.full((1, 1), 4, jnp.int32), kv,
        cache_pos=4, rope=rope, attn_len=5,
    )
    np.testing.assert_allclose(
        np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, 4]),
        rtol=1e-4, atol=1e-4,
    )


def test_glm4_matches_transformers(tmp_path):
    """GLM-4: sandwich norms (its post_attention_layernorm is the PRE-ffn
    norm — loader remaps onto the gemma2-structure slots) and partial
    INTERLEAVED rotary (factor 0.5, (2i, 2i+1) pairs), q/k/v biases."""
    import torch
    from transformers import Glm4Config, Glm4ForCausalLM

    torch.manual_seed(19)
    config = Glm4Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        attention_bias=True,
        partial_rotary_factor=0.5,
        tie_word_embeddings=False,
        pad_token_id=0,
    )
    model = Glm4ForCausalLM(config).eval().to(torch.float32)
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_proj.bias.uniform_(-0.3, 0.3)
            layer.self_attn.k_proj.bias.uniform_(-0.3, 0.3)
            layer.self_attn.v_proj.bias.uniform_(-0.3, 0.3)
    path = tmp_path / "glm4"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.rope_interleave and cfg.rope_dims == 8  # head_dim 16 x 0.5
    params = load_params(path, cfg, dtype=jnp.float32)
    layer0 = params["layers"][0]
    assert "pre_feedforward_layernorm" in layer0  # remapped sandwich norm
    assert "q_bias" in layer0
    ids = np.array([[8, 52, 99, 23, 71, 5]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)


def test_smollm3_config_derives_nope_and_sliding():
    """config.json files that omit no_rope_layers/layer_types get HF's
    derived defaults: NoPE every no_rope_layer_interval layers, sliding
    attention exactly on the NoPE layers when use_sliding_window."""
    base = {
        "model_type": "smollm3",
        "vocab_size": 64,
        "hidden_size": 32,
        "intermediate_size": 64,
        "num_hidden_layers": 8,
        "num_attention_heads": 4,
    }
    cfg = ModelConfig.from_hf_config(dict(base))
    assert cfg.no_rope_layers == (1, 1, 1, 0, 1, 1, 1, 0)
    assert not cfg.layer_uses_rope(3) and cfg.layer_uses_rope(2)
    assert cfg.sliding_window is None  # use_sliding_window defaults off

    cfg_sw = ModelConfig.from_hf_config(
        {**base, "use_sliding_window": True, "sliding_window": 4}
    )
    assert cfg_sw.sliding_window == 4
    assert cfg_sw.layer_is_sliding(3) and not cfg_sw.layer_is_sliding(2)

    cfg_i2 = ModelConfig.from_hf_config(
        {**base, "no_rope_layer_interval": 2}
    )
    assert cfg_i2.no_rope_layers == (1, 0) * 4


def test_gpt_oss_mxfp4_checkpoint_raises_clear_error(tmp_path):
    """Official gpt-oss releases ship MXFP4 expert tensors
    (gate_up_proj_blocks/_scales); the loader must name the format instead
    of dying on int('gate_up_proj_blocks')."""
    import json as _json

    from shardmerge_tpu.io import safetensors_io as stio
    from shardmerge_tpu.models.loader import load_params

    path = tmp_path / "mx"
    path.mkdir()
    stio.save_file(
        {
            "model.embed_tokens.weight": np.zeros((8, 4), np.float32),
            "model.layers.0.mlp.experts.gate_up_proj_blocks": np.zeros(
                (2, 4, 4), np.float32
            ),
        },
        path / "model.safetensors",
        metadata={"format": "pt"},
    )
    with open(path / "config.json", "w") as f:
        _json.dump(
            {
                "model_type": "gpt_oss",
                "vocab_size": 8,
                "hidden_size": 4,
                "intermediate_size": 4,
                "num_hidden_layers": 1,
                "num_attention_heads": 2,
            },
            f,
        )
    with pytest.raises(ValueError, match="MXFP4"):
        load_params(path)


def test_deepseek_kv_cache_decode_matches_full(rng):
    """Prefill + single-token decodes through the compressed MLA cache
    reproduce the full-sequence forward."""
    cfg = _tiny_cfg(
        model_type="deepseek_v3",
        num_key_value_heads=4,
        q_lora_rank=24,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        rope_interleave=True,
        num_local_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        n_shared_experts=1,
        first_k_dense_replace=1,
        n_group=2,
        topk_group=1,
        topk_method="noaux_tc",
        routed_scaling_factor=2.0,
    )
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 7)), jnp.int32)

    full_logits, _ = _run_forward(cfg, params, ids, cache_len=16)

    cache_len = 16
    rope = rope_tables(cfg, cache_len)
    kv = init_kv_cache(cfg, 2, cache_len, jnp.float32)
    assert set(kv) == {"ckv", "kpe"} and kv["ckv"].shape[-1] == 32
    T0 = 4
    pos = jnp.arange(T0, dtype=jnp.int32)[None, :].repeat(2, 0)
    logits, kv = forward(
        params, cfg, ids[:, :T0], pos, kv, cache_pos=0, rope=rope, attn_len=T0
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :T0]), rtol=1e-4, atol=1e-4
    )
    for t in range(T0, 7):
        pos_t = jnp.full((2, 1), t, jnp.int32)
        logits, kv = forward(
            params,
            cfg,
            ids[:, t : t + 1],
            pos_t,
            kv,
            cache_pos=t,
            rope=rope,
            attn_len=t + 1,
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]),
            np.asarray(full_logits[:, t]),
            rtol=1e-4,
            atol=1e-4,
        )


def test_generate_batch_matches_single(tmp_path):
    """Batched generation (left-padded ragged prompts, shared cache slots,
    token_valid masking) reproduces the single-sequence greedy output for
    every row — i.e. padding never leaks into attention."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(11)
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    model = LlamaForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "m"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.inference import InferenceEngine

    engine = InferenceEngine.from_pretrained(str(path), tokenizer=StubTokenizer())
    prompts = ["hi", "a much longer prompt with many tokens", "mid size one"]
    singles = [
        "".join(
            engine.stream_generation(
                p, max_new_tokens=12, greedy=True, use_template=False
            )
        )
        for p in prompts
    ]
    batch = engine.generate_batch(
        prompts, max_new_tokens=12, greedy=True, use_template=False
    )
    assert batch == singles

    # sampled path: deterministic across calls with the same seed
    s1 = engine.generate_batch(
        prompts, max_new_tokens=6, use_template=False, seed=3
    )
    s2 = engine.generate_batch(
        prompts, max_new_tokens=6, use_template=False, seed=3
    )
    assert s1 == s2 and len(s1) == 3

    # finish reasons: rows that never hit EOS report "length"
    texts, reasons = engine.generate_batch(
        prompts, max_new_tokens=4, greedy=True, use_template=False,
        return_meta=True,
    )
    assert len(texts) == len(reasons) == 3
    for t, r in zip(texts, reasons):
        assert r in ("stop", "length")
        if r == "length":
            assert len(t) > 0


def test_generate_batch_empty_and_errors(tmp_path):
    from shardmerge_tpu.inference import InferenceEngine
    from shardmerge_tpu.models.llama import ModelConfig, init_params

    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    engine = InferenceEngine(cfg, params, StubTokenizer())
    assert engine.generate_batch([]) == []
    with pytest.raises(ValueError, match="empty prompt"):
        engine.generate_batch(["ok", ""], use_template=False)


def test_model_server_endpoints(tmp_path):
    """HTTP serving surface: health, models, single + batched completions,
    and 400s on malformed requests."""
    import json as _json
    import urllib.request

    from shardmerge_tpu.inference import InferenceEngine
    from shardmerge_tpu.models.llama import ModelConfig, init_params
    from shardmerge_tpu.serve import ModelServer

    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    engine = InferenceEngine(cfg, params, StubTokenizer())
    server = ModelServer(engine, model_id="tiny-test")
    port = server.start(port=0)
    base = f"http://127.0.0.1:{port}"

    def call(path, payload=None):
        if payload is None:
            req = urllib.request.Request(base + path)
        else:
            req = urllib.request.Request(
                base + path,
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, _json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read())

    try:
        status, body = call("/health")
        assert status == 200 and body["model"] == "tiny-test"
        status, body = call("/v1/models")
        assert status == 200 and body["data"][0]["id"] == "tiny-test"

        status, body = call(
            "/v1/completions",
            {"prompt": "hi", "max_tokens": 6, "greedy": True},
        )
        assert status == 200 and len(body["choices"]) == 1
        single = body["choices"][0]["text"]
        # random weights never emit EOS id 0 here in 6 tokens -> truncated
        assert body["choices"][0]["finish_reason"] in ("stop", "length")

        status, body = call(
            "/v1/completions",
            {"prompt": ["hi", "longer prompt here"], "max_tokens": 6,
             "greedy": True},
        )
        assert status == 200 and len(body["choices"]) == 2
        assert body["choices"][0]["text"] == single  # batch == single greedy

        # throughput mode over HTTP: chunked decode emits identical text
        status, body = call(
            "/v1/completions",
            {"prompt": "hi", "max_tokens": 6, "greedy": True,
             "decode_chunk": 3},
        )
        assert status == 200 and body["choices"][0]["text"] == single

        for bad in [{}, {"prompt": []}, {"prompt": ["ok", ""]},
                    {"prompt": "x", "max_tokens": 0},
                    {"prompt": ["x"] * 65},  # batch cap
                    {"prompt": "y" * (256 * 1024 + 1)},  # length cap
                    {"prompt": "x", "temperature": "hot"},
                    {"prompt": "x", "decode_chunk": 0},
                    {"prompt": "x", "decode_chunk": 65}]:
            status, body = call("/v1/completions", bad)
            assert status == 400 and "error" in body, bad
        status, _ = call("/nope")
        assert status == 404
    finally:
        server.stop()


def test_model_server_sse_streaming():
    """`stream: true` returns Server-Sent Events whose joined deltas equal
    the non-streamed completion, ending with a finish_reason event and the
    [DONE] sentinel; list prompts with stream are a 400."""
    import json as _json
    import urllib.request
    from urllib.error import HTTPError

    from shardmerge_tpu.inference import InferenceEngine
    from shardmerge_tpu.models.llama import ModelConfig, init_params
    from shardmerge_tpu.serve import ModelServer

    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    params = init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    engine = InferenceEngine(cfg, params, StubTokenizer())
    server = ModelServer(engine, model_id="sse-test")
    port = server.start(port=0)
    base = f"http://127.0.0.1:{port}/v1/completions"

    def post(payload):
        return urllib.request.urlopen(
            urllib.request.Request(
                base,
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            ),
            timeout=120,
        )

    try:
        plain = _json.loads(
            post({"prompt": "hi", "greedy": True, "max_tokens": 8}).read()
        )["choices"][0]

        with post(
            {"prompt": "hi", "greedy": True, "max_tokens": 8, "stream": True}
        ) as resp:
            assert resp.headers["Content-Type"] == "text/event-stream"
            lines = [
                l[len("data: "):]
                for l in resp.read().decode().splitlines()
                if l.startswith("data: ")
            ]
        assert lines[-1] == "[DONE]"
        events = [_json.loads(l) for l in lines[:-1]]
        text = "".join(e["choices"][0]["text"] for e in events)
        assert text == plain["text"]
        assert events[-1]["choices"][0]["finish_reason"] == plain["finish_reason"]
        assert all(
            e["choices"][0]["finish_reason"] is None for e in events[:-1]
        )
        # token accounting rides the final stream event
        usage = events[-1]["usage"]
        assert usage["prompt_tokens"] == 2  # "hi" = 2 stub tokens
        assert (
            usage["total_tokens"]
            == usage["prompt_tokens"] + usage["completion_tokens"]
        )

        try:
            post({"prompt": ["a", "b"], "stream": True, "max_tokens": 4})
            assert False, "expected 400"
        except HTTPError as e:
            assert e.code == 400
            assert "stream" in _json.loads(e.read())["error"]
    finally:
        server.stop()


def test_model_server_chat_completions():
    """/v1/chat/completions: templateless tokenizers render a role-tagged
    transcript (history preserved), the response carries an assistant
    message, streaming emits delta chunks, and malformed conversations
    400."""
    import json as _json
    import urllib.request
    from urllib.error import HTTPError

    from shardmerge_tpu.inference import InferenceEngine
    from shardmerge_tpu.models.llama import ModelConfig, init_params
    from shardmerge_tpu.serve import ModelServer

    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=1024,
    )
    params = init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    engine = InferenceEngine(cfg, params, StubTokenizer())
    server = ModelServer(engine, model_id="chat-test")
    port = server.start(port=0)
    base = f"http://127.0.0.1:{port}/v1/chat/completions"

    def post(payload):
        return urllib.request.urlopen(
            urllib.request.Request(
                base,
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            ),
            timeout=120,
        )

    msgs = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hello"},
        {"role": "assistant", "content": "hi"},
        {"role": "user", "content": "again"},
    ]
    try:
        res = _json.loads(
            post({"messages": msgs, "greedy": True, "max_tokens": 8}).read()
        )
        assert res["object"] == "chat.completion"
        choice = res["choices"][0]
        assert choice["message"]["role"] == "assistant"
        assert choice["finish_reason"] in ("stop", "length")
        # templateless fallback: the engine saw the full transcript
        expected_prompt = (
            "system: be brief\nuser: hello\nassistant: hi\nuser: again"
            "\nassistant:"
        )
        expected = "".join(
            engine.stream_generation(
                expected_prompt, max_new_tokens=8, greedy=True,
                use_template=False,
            )
        )
        assert choice["message"]["content"] == expected

        # streaming: delta chunks joined == the non-streamed message
        with post(
            {"messages": msgs, "greedy": True, "max_tokens": 8,
             "stream": True}
        ) as resp:
            lines = [
                l[len("data: "):]
                for l in resp.read().decode().splitlines()
                if l.startswith("data: ")
            ]
        assert lines[-1] == "[DONE]"
        events = [_json.loads(l) for l in lines[:-1]]
        assert events[0]["object"] == "chat.completion.chunk"
        text = "".join(
            e["choices"][0]["delta"].get("content", "") for e in events
        )
        assert text == expected

        for bad in (
            {"messages": []},
            {"messages": [{"role": "robot", "content": "x"}]},
            {"messages": [{"role": "user", "content": ""}]},
            {"messages": [{"role": "assistant", "content": "x"}]},
            {"messages": [{"role": "system", "content": "only sys"}]},
        ):
            try:
                post(bad)
                assert False, f"expected 400 for {bad}"
            except HTTPError as e:
                assert e.code == 400
    finally:
        server.stop()


def test_model_server_stats_and_warmup():
    """/v1/stats reports uptime, per-kind request counts, token tallies,
    and pool/prefix-cache counters; warmup() compiles the hot path before
    any request arrives."""
    import json as _json
    import urllib.request

    from shardmerge_tpu.inference import InferenceEngine
    from shardmerge_tpu.models.llama import ModelConfig, init_params
    from shardmerge_tpu.serve import ModelServer

    cfg = ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=1024,
    )
    params = init_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    engine = InferenceEngine(
        cfg, params, StubTokenizer(), prefix_cache_slots=2
    )
    server = ModelServer(
        engine, model_id="stats", continuous_slots=2,
        continuous_cache_len=256,
    )
    spent = server.warmup()
    assert spent > 0
    port = server.start(port=0)
    base = f"http://127.0.0.1:{port}"

    def call(path, payload=None):
        if payload is None:
            return _json.load(urllib.request.urlopen(base + path, timeout=60))
        req = urllib.request.Request(
            base + path,
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        return _json.load(urllib.request.urlopen(req, timeout=120))

    try:
        call("/v1/completions", {"prompt": "hi", "max_tokens": 4,
                                 "greedy": True})
        call("/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hey"}],
            "max_tokens": 4,
        })
        stats = call("/v1/stats")
        assert stats["model"] == "stats"
        assert stats["uptime_s"] >= 0
        assert stats["requests"].get("completions") == 1
        assert stats["requests"].get("chat") == 1
        assert stats["tokens"]["completion_tokens"] >= 1
        pool = stats["continuous_pool"]
        assert pool["slots"] == 2 and pool["joins"] >= 2  # warmup + request
        assert "prefix_cache" in stats
    finally:
        server.stop()


def _tiny_llama4(tmp_path, seed=21):
    import torch
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    torch.manual_seed(seed)
    config = Llama4TextConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=48,
        intermediate_size_mlp=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=2,
        interleave_moe_layer_step=2,
        no_rope_layers=[1, 1, 1, 0],
        attention_chunk_size=4,
        attn_temperature_tuning=True,
        floor_scale=2.0,
        attn_scale=0.1,
        use_qk_norm=True,
        max_position_embeddings=256,
        tie_word_embeddings=False,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
    )
    model = Llama4ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "llama4"
    model.save_pretrained(str(path), safe_serialization=True)
    return model, path


def test_llama4_matches_transformers(tmp_path):
    """Llama-4: interleaved dense/MoE stacks, chunk-aligned local attention
    on rope layers (attention_chunk_size=4 < seq len, so chunking bites),
    temperature-scaled queries on the NoPE layer (floor_scale=2 so the
    log1p term is nonzero at short positions), weightless L2 q/k norm after
    the interleaved-pair rope, and the input-scaled sigmoid top-k MoE with
    an always-on shared expert."""
    import torch

    from shardmerge_tpu.models.loader import load_params

    model, path = _tiny_llama4(tmp_path)
    cfg = ModelConfig.from_pretrained(path)
    assert cfg.model_type == "llama4_text"
    assert cfg.moe_layers == (1, 3)
    assert cfg.layer_types == (
        "chunked_attention",
        "chunked_attention",
        "chunked_attention",
        "full_attention",
    )
    assert cfg.layer_is_chunked(0) and not cfg.layer_is_chunked(3)
    assert cfg.layer_is_moe(1) and not cfg.layer_is_moe(0)
    assert not cfg.layer_uses_rope(3)
    assert cfg.qk_norm_l2 and cfg.attn_temperature_tuning
    assert cfg.rope_interleave

    params = load_params(path, cfg, dtype=jnp.float32)
    layer1 = params["layers"][1]
    assert "llama4_experts" in layer1 and "shared_gate_proj" in layer1
    assert layer1["llama4_experts"]["gate_up"].shape == (4, 64, 96)
    assert "llama4_experts" not in params["layers"][0]  # dense layer

    ids = np.array([[7, 61, 113, 28, 84, 3, 55, 19]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)


def test_llama4_kv_cache_decode_matches_full(tmp_path):
    """Prefill + one-token decode steps reproduce the full-sequence logits —
    the chunked mask and NoPE temperature scaling must hold for T=1 queries
    at arbitrary cache positions."""
    from shardmerge_tpu.models.loader import load_params

    _, path = _tiny_llama4(tmp_path, seed=22)
    cfg = ModelConfig.from_pretrained(path)
    params = load_params(path, cfg, dtype=jnp.float32)

    ids = np.array([[5, 99, 14, 73, 21, 8, 120, 44]], np.int32)
    full_logits, _ = _run_forward(cfg, params, jnp.asarray(ids), cache_len=16)

    rope = rope_tables(cfg, 16)
    kv = init_kv_cache(cfg, 1, 16, jnp.float32)
    pre = 3
    positions = jnp.arange(pre, dtype=jnp.int32)[None, :]
    logits, kv = forward(
        params, cfg, jnp.asarray(ids[:, :pre]), positions, kv,
        cache_pos=0, rope=rope, attn_len=pre,
    )
    steps = [np.asarray(logits)[:, -1]]
    for t in range(pre, ids.shape[1]):
        positions = jnp.full((1, 1), t, jnp.int32)
        logits, kv = forward(
            params, cfg, jnp.asarray(ids[:, t : t + 1]), positions, kv,
            cache_pos=t, rope=rope, attn_len=t + 1,
        )
        steps.append(np.asarray(logits)[:, -1])
    for i, got in enumerate(steps):
        np.testing.assert_allclose(
            got, np.asarray(full_logits)[:, pre - 1 + i], rtol=2e-4, atol=2e-5
        )


def test_llama4_quantized_forward_close(tmp_path):
    """int8 weight-only quantization covers the fused llama4 expert stacks."""
    from shardmerge_tpu.models.loader import load_params

    _, path = _tiny_llama4(tmp_path, seed=23)
    cfg = ModelConfig.from_pretrained(path)
    params = load_params(path, cfg, dtype=jnp.float32)
    ids = jnp.asarray([[9, 31, 64, 120]], jnp.int32)
    base_logits, _ = _run_forward(cfg, params, ids)

    qparams = load_params(path, cfg, dtype=jnp.float32, quant_bits=8)
    e1 = qparams["layers"][1]["llama4_experts"]
    assert isinstance(e1["gate_up"], dict) and "q3" in e1["gate_up"]
    q_logits, _ = _run_forward(cfg, qparams, ids)
    np.testing.assert_allclose(
        np.asarray(q_logits), np.asarray(base_logits), rtol=0.2, atol=0.2
    )


def test_llama4_sharded_serving_matches_single_device(tmp_path):
    """Llama-4 tensor-parallel serving: the fused expert stacks shard over
    the EXPERT dim (8 experts / 8 devices), the routed contraction
    all-reduces via GSPMD, and greedy output equals the unsharded engine."""
    import torch
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    torch.manual_seed(24)
    config = Llama4TextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=48,
        intermediate_size_mlp=64,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=8,
        num_local_experts=8,  # divides the 8-device mesh
        num_experts_per_tok=2,
        interleave_moe_layer_step=2,
        no_rope_layers=[1, 0],
        attention_chunk_size=4,
        attn_temperature_tuning=True,
        floor_scale=2.0,
        use_qk_norm=True,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = Llama4ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "l4tp"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.inference import InferenceEngine

    def gen(engine):
        return "".join(
            engine.stream_generation(
                "expert sharding", max_new_tokens=8, greedy=True,
                use_template=False,
            )
        )

    plain = gen(
        InferenceEngine.from_pretrained(str(path), tokenizer=StubTokenizer())
    )
    sharded_engine = InferenceEngine.from_pretrained(
        str(path), tokenizer=StubTokenizer(), shard=True
    )
    e1 = sharded_engine.params["layers"][1]["llama4_experts"]
    assert not e1["gate_up"].sharding.is_fully_replicated
    assert tuple(e1["gate_up"].sharding.spec) == ("tp", None, None)
    assert gen(sharded_engine) == plain

    # streaming load places the stacks straight onto the expert sharding
    from jax.sharding import Mesh

    from shardmerge_tpu.models.loader import load_params

    direct = load_params(
        path, mesh=Mesh(np.asarray(jax.devices()), ("tp",))
    )
    d1 = direct["layers"][1]["llama4_experts"]
    assert not d1["gate_up"].sharding.is_fully_replicated
    assert not d1["down"].sharding.is_fully_replicated


def test_gptoss_expert_stacks_shard_over_experts(tmp_path):
    """GPT-OSS fused stacks (previously replicated under tp) now shard the
    expert dim; sharded greedy serving equals single-device."""
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM

    torch.manual_seed(25)
    config = GptOssConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        head_dim=8,
        num_local_experts=8,
        num_experts_per_tok=2,
        sliding_window=3,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = GptOssForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "gotp"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.inference import InferenceEngine

    def gen(engine):
        return "".join(
            engine.stream_generation(
                "expert sharding", max_new_tokens=8, greedy=True,
                use_template=False,
            )
        )

    plain = gen(
        InferenceEngine.from_pretrained(str(path), tokenizer=StubTokenizer())
    )
    sharded_engine = InferenceEngine.from_pretrained(
        str(path), tokenizer=StubTokenizer(), shard=True
    )
    e0 = sharded_engine.params["layers"][0]["gptoss_experts"]
    assert tuple(e0["gate_up"].sharding.spec) == ("tp", None, None)
    assert tuple(e0["down_bias"].sharding.spec) == ("tp", None)
    assert gen(sharded_engine) == plain


def test_llama4_forward_train_matches_serving_prefill(tmp_path):
    """forward_train reproduces the HF-validated serving prefill on Llama-4:
    the chunked mask, post-rope L2 q/k norm, NoPE temperature scaling, and
    the input-scaled MoE all hold on the cache-free train path (and under
    remat)."""
    from shardmerge_tpu.models.llama import forward_train
    from shardmerge_tpu.models.loader import load_params

    _, path = _tiny_llama4(tmp_path, seed=26)
    cfg = ModelConfig.from_pretrained(path)
    params = load_params(path, cfg, dtype=jnp.float32)

    ids = np.array([[7, 61, 113, 28, 84, 3, 55, 19]], np.int32)
    serve_logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    train_logits = forward_train(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(train_logits), np.asarray(serve_logits),
        rtol=2e-4, atol=2e-5,
    )
    remat_logits = forward_train(params, cfg, jnp.asarray(ids), remat=True)
    np.testing.assert_allclose(
        np.asarray(remat_logits), np.asarray(train_logits),
        rtol=1e-6, atol=1e-7,
    )


def test_gptoss_mxfp4_checkpoint_loads(tmp_path):
    """Official-release MXFP4 gpt-oss expert tensors (gate_up_proj_blocks/
    _scales: e2m1 nibbles + e8m0 per-block scales) decode at load. The
    numpy decoder is pinned elementwise against transformers' OWN
    convert_moe_packed_tensors (integrations/mxfp4.py — the authoritative
    decode of OpenAI's releases), and the MXFP4 checkpoint's forward
    equals the forward on the oracle-dequantized raw checkpoint."""
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM
    from transformers.integrations.mxfp4 import convert_moe_packed_tensors

    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader, save_file
    from shardmerge_tpu.models.loader import load_params

    torch.manual_seed(33)
    config = GptOssConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=64,  # both contraction dims multiples of 32
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=3,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    model = GptOssForCausalLM(config).eval().to(torch.float32)
    src = tmp_path / "src"
    model.save_pretrained(str(src), safe_serialization=True)

    with SafeTensorsReader(src / "model.safetensors") as r:
        tensors = {k: np.array(r.get_tensor(k)) for k in r.keys()}

    rng = np.random.default_rng(34)
    mx_tensors = {}
    raw_tensors = {}
    shapes = {"gate_up_proj": (4, 128, 2, 16), "down_proj": (4, 64, 2, 16)}
    for k, v in tensors.items():
        if k.endswith(("experts.gate_up_proj", "experts.down_proj")):
            stem = k.rsplit(".", 1)[-1]
            blocks = rng.integers(
                0, 256, shapes[stem], dtype=np.uint8
            )
            scales = rng.integers(
                121, 131, shapes[stem][:-1], dtype=np.uint8
            )
            expect = convert_moe_packed_tensors(
                torch.from_numpy(blocks),
                torch.from_numpy(scales),
                dtype=torch.float32,
            ).numpy()
            mx_tensors[k + "_blocks"] = blocks
            mx_tensors[k + "_scales"] = scales
            raw_tensors[k] = expect
        else:
            mx_tensors[k] = v
            raw_tensors[k] = v

    mx_dir = tmp_path / "mxfp4"
    raw_dir = tmp_path / "raw"
    for d, t in ((mx_dir, mx_tensors), (raw_dir, raw_tensors)):
        d.mkdir()
        save_file(t, d / "model.safetensors")
        (d / "config.json").write_text((src / "config.json").read_text())

    cfg = ModelConfig.from_pretrained(raw_dir)
    p_mx = load_params(mx_dir, cfg, dtype=jnp.float32)
    p_raw = load_params(raw_dir, cfg, dtype=jnp.float32)
    for i in range(2):
        for gk in ("gate_up", "down"):
            np.testing.assert_array_equal(
                np.asarray(p_mx["layers"][i]["gptoss_experts"][gk]),
                np.asarray(p_raw["layers"][i]["gptoss_experts"][gk]),
                err_msg=f"layer {i} {gk}",
            )

    from shardmerge_tpu.models.llama import forward_train

    ids = jax.random.randint(jax.random.PRNGKey(35), (2, 7), 0, 128)
    np.testing.assert_array_equal(
        np.asarray(forward_train(p_mx, cfg, ids)),
        np.asarray(forward_train(p_raw, cfg, ids)),
    )

    # incomplete pairs (blocks without scales) fail loudly
    broken = dict(mx_tensors)
    broken.pop("model.layers.0.mlp.experts.gate_up_proj_scales")
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    save_file(broken, bad_dir / "model.safetensors")
    (bad_dir / "config.json").write_text((src / "config.json").read_text())
    with pytest.raises(ValueError, match="incomplete MXFP4"):
        load_params(bad_dir, cfg, dtype=jnp.float32)


def test_gptq_checkpoint_loads(tmp_path):
    """AutoGPTQ-format checkpoints decode at load (qweight/qzeros/scales/
    g_idx per module, bits 4 and 8, v1 zero-1 offset and v2, incl. a
    desc_act-shuffled g_idx). The packing in this test is written from the
    format spec independently of the decoder; the GPTQ checkpoint's
    forward equals the forward on the expected raw weights."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader, save_file
    from shardmerge_tpu.models.llama import forward_train
    from shardmerge_tpu.models.loader import load_params

    torch.manual_seed(44)
    config = LlamaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    src = tmp_path / "src"
    LlamaForCausalLM(config).eval().to(torch.float32).save_pretrained(
        str(src), safe_serialization=True
    )
    with SafeTensorsReader(src / "model.safetensors") as r:
        tensors = {k: np.array(r.get_tensor(k)) for k in r.keys()}

    group = 16
    rng = np.random.default_rng(45)

    def pack_cols(vals, bits):
        """Pack along axis 0 rows into int32, little-end-first nibbles."""
        per = 32 // bits
        v = vals.astype(np.uint32).reshape(vals.shape[0] // per, per, -1)
        out = np.zeros((v.shape[0], v.shape[2]), np.uint32)
        for k in range(per):
            out |= v[:, k, :] << np.uint32(bits * k)
        return out.astype(np.int32)

    def make_module(out_dim, in_dim, bits, v1, shuffle):
        maxq = (1 << bits) - 1
        n_groups = in_dim // group
        q = rng.integers(0, maxq + 1, (in_dim, out_dim))
        zeros = rng.integers(1 if v1 else 0, maxq + 1, (n_groups, out_dim))
        scales = (rng.standard_normal((n_groups, out_dim)) * 0.02).astype(
            np.float16
        )
        g_idx = np.arange(in_dim, dtype=np.int32) // group
        if shuffle:  # desc_act: rows visit groups in shuffled order
            g_idx = rng.permutation(g_idx).astype(np.int32)
        # expected weight from the format definition
        w = scales.astype(np.float32)[g_idx] * (
            q.astype(np.float32) - zeros.astype(np.float32)[g_idx]
        )
        parts = {
            "qweight": pack_cols(q, bits),
            "qzeros": pack_cols(
                (zeros - (1 if v1 else 0)).T, bits
            ).T.copy(),
            "scales": scales,
            "g_idx": g_idx,
        }
        return parts, np.ascontiguousarray(w.T)  # ours is (out, in)

    for bits, v1 in ((4, True), (8, False)):
        gq_tensors = {}
        raw_tensors = {}
        first = True
        for k, v in tensors.items():
            if k.startswith("model.layers.") and k.endswith(
                ("q_proj.weight", "k_proj.weight", "v_proj.weight",
                 "o_proj.weight", "gate_proj.weight", "up_proj.weight",
                 "down_proj.weight")
            ):
                root = k[: -len(".weight")]
                out_dim, in_dim = v.shape
                parts, w = make_module(
                    out_dim, in_dim, bits, v1, shuffle=first
                )
                first = False  # one desc_act module exercises g_idx
                for pname, pval in parts.items():
                    gq_tensors[f"{root}.{pname}"] = pval
                raw_tensors[k] = w
            else:
                gq_tensors[k] = v
                raw_tensors[k] = v

        gq_dir = tmp_path / f"gptq{bits}"
        raw_dir = tmp_path / f"raw{bits}"
        cfg_doc = json.loads((src / "config.json").read_text())
        cfg_doc["quantization_config"] = {
            "quant_method": "gptq",
            "bits": bits,
            "group_size": group,
            "desc_act": True,
            **({} if v1 else {"checkpoint_format": "gptq_v2"}),
        }
        for d, t, doc in (
            (gq_dir, gq_tensors, cfg_doc),
            (raw_dir, raw_tensors, json.loads((src / "config.json").read_text())),
        ):
            d.mkdir()
            save_file(t, d / "model.safetensors")
            (d / "config.json").write_text(json.dumps(doc))

        cfg = ModelConfig.from_pretrained(raw_dir)
        p_gq = load_params(gq_dir, cfg, dtype=jnp.float32)
        p_raw = load_params(raw_dir, cfg, dtype=jnp.float32)
        for i in range(2):
            for name in ("q_proj", "k_proj", "down_proj"):
                np.testing.assert_allclose(
                    np.asarray(p_gq["layers"][i][name]),
                    np.asarray(p_raw["layers"][i][name]),
                    rtol=1e-6,
                    atol=1e-7,
                    err_msg=f"bits={bits} layer {i} {name}",
                )
        ids = jax.random.randint(jax.random.PRNGKey(46), (2, 7), 0, 96)
        np.testing.assert_allclose(
            np.asarray(forward_train(p_gq, cfg, ids)),
            np.asarray(forward_train(p_raw, cfg, ids)),
            rtol=1e-5,
            atol=1e-6,
        )

    # incomplete modules fail loudly
    broken = dict(gq_tensors)
    broken.pop("model.layers.0.self_attn.q_proj.g_idx")
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    save_file(broken, bad_dir / "model.safetensors")
    (bad_dir / "config.json").write_text(json.dumps(cfg_doc))
    with pytest.raises(ValueError, match="incomplete GPTQ"):
        load_params(bad_dir, ModelConfig.from_pretrained(raw_dir),
                    dtype=jnp.float32)

    # unsupported quant methods name themselves
    bnb_dir = tmp_path / "bnb"
    bnb_dir.mkdir()
    save_file(tensors, bnb_dir / "model.safetensors")
    doc = json.loads((src / "config.json").read_text())
    doc["quantization_config"] = {"quant_method": "bitsandbytes", "bits": 4}
    (bnb_dir / "config.json").write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="bitsandbytes"):
        load_params(bnb_dir, ModelConfig.from_pretrained(raw_dir),
                    dtype=jnp.float32)


def test_awq_checkpoint_loads(tmp_path):
    """AutoAWQ gemm-format checkpoints decode at load (qweight/qzeros/
    scales per module, 4-bit, AWQ's interleaved pack order, contiguous
    groups, true zeros). The packing in this test is written from the
    format spec independently of the decoder: nibble k of each int32
    holds logical column [0,2,4,6,1,3,5,7][k] of its 8-wide pack."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from shardmerge_tpu.io.safetensors_io import SafeTensorsReader, save_file
    from shardmerge_tpu.models.llama import forward_train
    from shardmerge_tpu.models.loader import load_params

    torch.manual_seed(47)
    config = LlamaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    src = tmp_path / "src"
    LlamaForCausalLM(config).eval().to(torch.float32).save_pretrained(
        str(src), safe_serialization=True
    )
    with SafeTensorsReader(src / "model.safetensors") as r:
        tensors = {k: np.array(r.get_tensor(k)) for k in r.keys()}

    group = 16
    rng = np.random.default_rng(48)
    awq_order = [0, 2, 4, 6, 1, 3, 5, 7]

    def pack_awq(vals):
        """(rows, out) int4 values -> (rows, out/8) int32, AWQ order."""
        rows, out = vals.shape
        packed = np.zeros((rows, out // 8), np.uint32)
        for k in range(8):
            logical = vals[:, awq_order[k]::8].astype(np.uint32)
            packed |= logical << np.uint32(4 * k)
        return packed.astype(np.int32)

    def make_module(out_dim, in_dim):
        n_groups = in_dim // group
        q = rng.integers(0, 16, (in_dim, out_dim))
        zeros = rng.integers(0, 16, (n_groups, out_dim))
        scales = (rng.standard_normal((n_groups, out_dim)) * 0.02).astype(
            np.float16
        )
        g = np.arange(in_dim) // group
        w = scales.astype(np.float32)[g] * (
            q.astype(np.float32) - zeros.astype(np.float32)[g]
        )
        parts = {
            "qweight": pack_awq(q),
            "qzeros": pack_awq(zeros),
            "scales": scales,
        }
        return parts, np.ascontiguousarray(w.T)  # ours is (out, in)

    awq_tensors = {}
    raw_tensors = {}
    for k, v in tensors.items():
        if k.startswith("model.layers.") and k.endswith(
            ("q_proj.weight", "k_proj.weight", "v_proj.weight",
             "o_proj.weight", "gate_proj.weight", "up_proj.weight",
             "down_proj.weight")
        ):
            root = k[: -len(".weight")]
            out_dim, in_dim = v.shape
            parts, w = make_module(out_dim, in_dim)
            for pname, pval in parts.items():
                awq_tensors[f"{root}.{pname}"] = pval
            raw_tensors[k] = w
        else:
            awq_tensors[k] = v
            raw_tensors[k] = v

    awq_dir = tmp_path / "awq"
    raw_dir = tmp_path / "raw"
    cfg_doc = json.loads((src / "config.json").read_text())
    cfg_doc["quantization_config"] = {
        "quant_method": "awq",
        "bits": 4,
        "group_size": group,
        "zero_point": True,
        "version": "gemm",
    }
    for d, t, doc in (
        (awq_dir, awq_tensors, cfg_doc),
        (raw_dir, raw_tensors, json.loads((src / "config.json").read_text())),
    ):
        d.mkdir()
        save_file(t, d / "model.safetensors")
        (d / "config.json").write_text(json.dumps(doc))

    cfg = ModelConfig.from_pretrained(raw_dir)
    p_awq = load_params(awq_dir, cfg, dtype=jnp.float32)
    p_raw = load_params(raw_dir, cfg, dtype=jnp.float32)
    for i in range(2):
        for name in ("q_proj", "o_proj", "gate_proj"):
            np.testing.assert_allclose(
                np.asarray(p_awq["layers"][i][name]),
                np.asarray(p_raw["layers"][i][name]),
                rtol=1e-6,
                atol=1e-7,
                err_msg=f"layer {i} {name}",
            )
    ids = jax.random.randint(jax.random.PRNGKey(49), (2, 7), 0, 96)
    np.testing.assert_allclose(
        np.asarray(forward_train(p_awq, cfg, ids)),
        np.asarray(forward_train(p_raw, cfg, ids)),
        rtol=1e-5,
        atol=1e-6,
    )

    # incomplete modules fail loudly
    broken = dict(awq_tensors)
    broken.pop("model.layers.0.self_attn.q_proj.qzeros")
    bad_dir = tmp_path / "bad_awq"
    bad_dir.mkdir()
    save_file(broken, bad_dir / "model.safetensors")
    (bad_dir / "config.json").write_text(json.dumps(cfg_doc))
    with pytest.raises(ValueError, match="incomplete AWQ"):
        load_params(bad_dir, cfg, dtype=jnp.float32)

    # non-gemm serializations and symmetric checkpoints refuse by name
    for override, match in (
        ({"version": "exllama"}, "exllama"),
        ({"zero_point": False}, "zero_point"),
    ):
        d = tmp_path / f"awq_{match}"
        d.mkdir()
        save_file(awq_tensors, d / "model.safetensors")
        doc = dict(cfg_doc)
        doc["quantization_config"] = {
            **cfg_doc["quantization_config"], **override
        }
        (d / "config.json").write_text(json.dumps(doc))
        with pytest.raises(ValueError, match=match):
            load_params(d, cfg, dtype=jnp.float32)


def test_gemma3_matches_transformers(tmp_path):
    """Gemma-3: DUAL rope (sliding layers at rope_local_base_freq with no
    scaling, global layers at rope_theta with linear scaling), gemma-style
    per-head q/k RMSNorm, sandwich norms, 5:1-style sliding pattern (here
    2:1 via sliding_window_pattern), no softcapping."""
    import torch
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    torch.manual_seed(8)
    config = Gemma3TextConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0,
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        sliding_window=4,  # shorter than the prompt so the window matters
        sliding_window_pattern=2,
        query_pre_attn_scalar=16,
        hidden_activation="gelu_pytorch_tanh",
    )
    model = Gemma3ForCausalLM(config).eval().to(torch.float32)
    path = tmp_path / "gemma3"
    model.save_pretrained(str(path), safe_serialization=True)

    from shardmerge_tpu.models.loader import load_params

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.is_gemma3 and cfg.rope_local_base_freq == 10_000.0
    assert cfg.layer_is_sliding(0) and not cfg.layer_is_sliding(1)
    assert cfg.qk_norm
    params = load_params(path, cfg, dtype=jnp.float32)
    assert "pre_feedforward_layernorm" in params["layers"][0]
    assert "q_norm" in params["layers"][0]
    ids = np.array([[2, 9, 31, 60, 99, 12, 47, 88]], np.int32)
    with torch.no_grad():
        expected = model(torch.from_numpy(ids).long()).logits.numpy()
    logits, _ = _run_forward(cfg, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=2e-3, atol=3e-4)

    # the train path agrees with serving (rope selection per layer rides
    # layer_rope in both)
    from shardmerge_tpu.models.llama import forward_train

    train_logits = forward_train(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(train_logits), expected, rtol=2e-3, atol=3e-4
    )


def test_stop_sequences_stream_and_batch():
    """OpenAI 'stop' semantics on the engine paths: generation halts at
    the EARLIEST occurrence, the stop text is never returned (streamed
    chunks withhold partial stop prefixes), finish_reason is 'stop' —
    and the batch path truncates per row identically."""
    cfg = ModelConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=2048,
    )
    from shardmerge_tpu.inference import InferenceEngine

    params = init_params(cfg, jax.random.PRNGKey(57), jnp.float32)
    engine = InferenceEngine(cfg, params, StubTokenizer())

    full = "".join(
        engine.stream_generation(
            "stop test", max_new_tokens=32, greedy=True, use_template=False
        )
    )
    assert len(full) > 10
    stop_str = full[6:9]
    want = full[: full.find(stop_str)]

    meta = {}
    chunks = list(
        engine.stream_generation(
            "stop test",
            max_new_tokens=32,
            greedy=True,
            use_template=False,
            stop=[stop_str],
            meta=meta,
        )
    )
    assert "".join(chunks) == want
    assert meta["finish_reason"] == "stop"
    assert all(stop_str not in c for c in chunks)

    # batch path: the stopped row truncates, the other runs to budget
    texts, reasons = engine.generate_batch(
        ["stop test", "x"],
        max_new_tokens=32,
        greedy=True,
        use_template=False,
        stop=[stop_str],
        return_meta=True,
    )
    assert texts[0] == want
    assert stop_str not in texts[0]
