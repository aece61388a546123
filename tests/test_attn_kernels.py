"""Flash-decode attention kernel: value agreement with the XLA einsum
path (interpret mode on CPU), routing rules, and end-to-end decode logits
through forward() for plain, sliding-window, and left-padded batch cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shardmerge_tpu.models.attn_kernels import (
    flash_decode,
    supported,
    use_flash_decode,
)
from shardmerge_tpu.models.llama import (
    ModelConfig,
    forward,
    init_kv_cache,
    init_params,
    rope_tables,
)


def _flash_cfg(**kw):
    # head_dim must be a lane multiple (128) for the kernel to engage
    defaults = dict(
        vocab_size=128,
        hidden_size=256,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def _reference_attention(q, k, v, mask):
    """The einsum/softmax semantics of models/llama.py _attention, in f32."""
    scores = jnp.einsum(
        "bhgd,bhsd->bhgs", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    scores = scores + mask[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhgs,bhsd->bhgd", probs, v.astype(jnp.float32))


@pytest.mark.parametrize(
    "b,kvh,g,d,s",
    [(1, 2, 4, 128, 256), (2, 1, 1, 128, 512), (1, 4, 2, 256, 128)],
)
def test_flash_decode_matches_reference(rng, b, kvh, g, d, s):
    q = jnp.asarray(rng.standard_normal((b, kvh, g, d)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((b, kvh, s, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    v = jnp.asarray(
        rng.standard_normal((b, kvh, s, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    # per-row masks with a masked TAIL (decode: slots beyond attn_len) and
    # random interior holes (continuous-pool gaps / token_valid padding)
    valid = rng.random((b, s)) > 0.25
    valid[:, s // 2 :] = False
    valid[:, 0] = True  # decode always sees >= 1 valid slot
    mask = jnp.where(jnp.asarray(valid), 0.0, jnp.float32(-1e9))

    got = flash_decode(q, k, v, mask)
    want = _reference_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_flash_decode_all_but_first_block_masked(rng):
    """A fully-masked leading region (sliding-window decode deep in the
    bucket) must not poison the online softmax."""
    b, kvh, g, d, s = 1, 1, 4, 128, 512
    q = jnp.asarray(rng.standard_normal((b, kvh, g, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, kvh, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, kvh, s, d)).astype(np.float32))
    valid = np.zeros((b, s), bool)
    valid[:, -7:] = True  # only the last few slots of the last block
    mask = jnp.where(jnp.asarray(valid), 0.0, jnp.float32(-1e9))
    got = flash_decode(q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), mask)
    want = _reference_attention(
        q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), mask
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    assert np.isfinite(np.asarray(got)).all()


def test_flash_decode_routing(monkeypatch):
    from shardmerge_tpu.models import quant

    cfg = _flash_cfg()
    layer = {}
    q_shape = (1, 1, 2, 128)

    monkeypatch.setenv("SHARDMERGE_FLASH_DECODE", "")
    # auto mode: CPU backend stays on XLA
    assert not use_flash_decode(cfg, layer, 1, q_shape, 256)
    monkeypatch.setenv("SHARDMERGE_FLASH_DECODE", "1")
    assert use_flash_decode(cfg, layer, 1, q_shape, 256)
    monkeypatch.setenv("SHARDMERGE_FLASH_DECODE", "0")
    assert not use_flash_decode(cfg, layer, 1, q_shape, 256)

    monkeypatch.setenv("SHARDMERGE_FLASH_DECODE", "1")
    # prefill (T>1), sinks, softcapping: XLA path
    assert not use_flash_decode(cfg, layer, 4, q_shape, 256)
    assert not use_flash_decode(cfg, {"sinks": 1}, 1, q_shape, 256)
    capped = _flash_cfg(attn_logit_softcapping=50.0)
    assert not use_flash_decode(capped, layer, 1, q_shape, 256)
    # unaligned head_dim / bucket
    assert not supported((1, 1, 2, 64), 256)
    assert not supported(q_shape, 96)
    # GSPMD-traced programs (mesh-sharded serving) suppress all Pallas
    # kernels, this one included
    with quant.suppress_int4_kernel():
        assert not use_flash_decode(cfg, layer, 1, q_shape, 256)
    assert use_flash_decode(cfg, layer, 1, q_shape, 256)


def _decode_logits(cfg, params, ids, cache_len, monkeypatch, mode):
    """Prefill ids[:, :-1], then decode the last token; return its logits."""
    monkeypatch.setenv("SHARDMERGE_FLASH_DECODE", mode)
    B, T = ids.shape
    rope = rope_tables(cfg, cache_len)
    kv = init_kv_cache(cfg, B, cache_len, jnp.float32)
    pos = jnp.arange(T - 1, dtype=jnp.int32)[None, :].repeat(B, 0)
    _, kv = forward(
        params, cfg, ids[:, :-1], pos, kv, cache_pos=0, rope=rope,
        attn_len=T - 1,
    )
    logits, _ = forward(
        params,
        cfg,
        ids[:, -1:],
        jnp.full((B, 1), T - 1, jnp.int32),
        kv,
        cache_pos=T - 1,
        rope=rope,
        attn_len=T,
    )
    return np.asarray(logits[:, -1])


@pytest.mark.parametrize("sliding", [None, 8])
def test_forward_decode_flash_matches_xla(rng, monkeypatch, sliding):
    cfg = _flash_cfg(sliding_window=sliding)
    params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 17)), jnp.int32)
    xla = _decode_logits(cfg, params, ids, 128, monkeypatch, "0")
    flash = _decode_logits(cfg, params, ids, 128, monkeypatch, "1")
    np.testing.assert_allclose(flash, xla, rtol=2e-5, atol=2e-5)
