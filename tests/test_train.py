"""Sharded (dp, tp) training-step tests and driver entry contract."""

import jax
import jax.numpy as jnp
import numpy as np

from shardmerge_tpu.models.llama import ModelConfig, init_params
from shardmerge_tpu.parallel.mesh import make_mesh
from shardmerge_tpu.parallel.train import make_train_step, shard_params


def _cfg():
    return ModelConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )


def test_train_step_runs_and_descends():
    mesh = make_mesh(("dp", "tp"), shape=(2, 4))
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    init_state, train_step = make_train_step(mesh, cfg, learning_rate=1e-2)
    state = init_state(params)

    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16)), jnp.int32
    )
    losses = []
    for _ in range(5):
        state, loss = train_step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # same batch repeated: loss must drop
    assert losses[-1] < losses[0]


def test_zero1_matches_replicated_and_shards_moments():
    """ZeRO-1: dp-partitioned Adam moments produce the SAME training
    trajectory as the replicated optimizer (identical math, different
    placement), the moment arrays really are sharded over 'dp' (per-device
    shard bytes = total/dp), and the step count replicates."""
    mesh = make_mesh(("dp", "tp"), shape=(4, 2))
    cfg = _cfg()
    batch = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, (4, 16)),
        jnp.int32,
    )

    results = {}
    for zero1 in (False, True):
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        init_state, train_step = make_train_step(
            mesh, cfg, learning_rate=1e-2, zero1=zero1
        )
        state = init_state(params)
        losses = []
        for _ in range(3):
            state, loss = train_step(state, batch)
            losses.append(float(loss))
        results[zero1] = (losses, state)

    np.testing.assert_allclose(
        results[True][0], results[False][0], rtol=1e-5
    )
    ref_embed = np.asarray(results[False][1]["params"]["embed_tokens"])
    z1_embed = np.asarray(results[True][1]["params"]["embed_tokens"])
    np.testing.assert_allclose(z1_embed, ref_embed, rtol=1e-4, atol=1e-6)

    # the moments are genuinely dp-partitioned
    adam = results[True][1]["opt_state"][0]  # ScaleByAdamState
    mu_leaf = adam.mu["layers"][0]["q_proj"]
    spec = mu_leaf.sharding.spec
    assert "dp" in spec, spec
    shard_bytes = mu_leaf.addressable_shards[0].data.nbytes
    assert shard_bytes * mesh.devices.size == mu_leaf.nbytes  # 1/(dp*tp) each
    # replicated baseline holds dp full copies of the same leaf
    rep_leaf = results[False][1]["opt_state"][0].mu["layers"][0]["q_proj"]
    rep_bytes = rep_leaf.addressable_shards[0].data.nbytes
    assert rep_bytes == shard_bytes * mesh.shape["dp"]
    assert int(adam.count) == 3


def test_custom_optimizer_passthrough():
    """tx= accepts any optax transformation (clipping + schedule chain);
    zero1 still finds and shards the adam moments inside the chain while
    the chain's own counters replicate."""
    import optax

    mesh = make_mesh(("dp", "tp"), shape=(4, 2))
    cfg = _cfg()
    batch = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.vocab_size, (4, 16)),
        jnp.int32,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(1e-2, 100)),
    )
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    init_state, train_step = make_train_step(
        mesh, cfg, zero1=True, tx=tx
    )
    state = init_state(params)
    losses = []
    for _ in range(3):
        state, loss = train_step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    adam_states = [
        s
        for s in jax.tree.leaves(
            state["opt_state"],
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert adam_states, "chain must contain the adam state"
    mu_leaf = adam_states[0].mu["layers"][0]["q_proj"]
    assert "dp" in mu_leaf.sharding.spec, mu_leaf.sharding.spec


def test_grad_accum_matches_full_batch():
    """grad_accum=K (K microbatches scanned in one jit, fp32 gradient
    accumulation, one optimizer step on the mean) reproduces the
    unaccumulated step: same loss, same updated params."""
    mesh = make_mesh(("dp", "tp"), shape=(2, 4))
    cfg = _cfg()
    batch = jnp.asarray(
        np.random.default_rng(9).integers(0, cfg.vocab_size, (8, 16)),
        jnp.int32,
    )

    def run(accum):
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        init_state, train_step = make_train_step(
            mesh, cfg, learning_rate=1e-2, grad_accum=accum
        )
        state = init_state(params)
        state, loss = train_step(state, batch)
        return float(loss), state

    loss1, state1 = run(1)
    loss4, state4 = run(4)
    np.testing.assert_allclose(loss4, loss1, rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            # atol floor: grad reduction order differs (K partial sums vs
            # one), and adam's eps region amplifies ~1e-7 grad noise into
            # ~5e-6 update noise on near-zero-variance coordinates
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=5e-6
        ),
        state4["params"],
        state1["params"],
    )

    # composes with master_fp32 + zero1 (bf16 params, fp32 sharded state)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    init_state, train_step = make_train_step(
        mesh, cfg, learning_rate=1e-3,
        grad_accum=2, master_fp32=True, zero1=True,
    )
    state = init_state(params)
    state, loss = train_step(state, batch)
    assert np.isfinite(float(loss))


def test_master_fp32_accumulates_sub_ulp_updates():
    """bf16 training with fp32 master weights: updates smaller than one
    bf16 ulp accumulate in the master instead of vanishing in the cast.
    With lr=1e-3 the adam step (~lr) is under half an ulp of the norm
    weights (1.0, ulp 0.0078), so plain-bf16 training leaves them frozen
    at init while the master version moves them. Composes with zero1:
    same trajectory, master sharded over dp."""
    mesh = make_mesh(("dp", "tp"), shape=(2, 4))
    cfg = _cfg()
    batch = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (4, 16)),
        jnp.int32,
    )

    def run(master_fp32, zero1=False, steps=5):
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
        init_state, train_step = make_train_step(
            mesh, cfg, learning_rate=1e-3,
            master_fp32=master_fp32, zero1=zero1,
        )
        state = init_state(params)
        losses = []
        for _ in range(steps):
            state, loss = train_step(state, batch)
            losses.append(float(loss))
        return losses, state

    _, plain = run(False)
    m_losses, m_state = run(True)

    norm_plain = np.asarray(
        plain["params"]["layers"][0]["input_layernorm"], np.float32
    )
    norm_master = np.asarray(
        m_state["params"]["layers"][0]["input_layernorm"], np.float32
    )
    assert np.all(norm_plain == 1.0), "sub-ulp updates should vanish in bf16"
    assert np.any(norm_master != 1.0), "master must accumulate sub-ulp steps"
    assert m_state["params"]["norm"].dtype == jnp.bfloat16
    assert m_state["master"]["norm"].dtype == jnp.float32

    # zero1 composes: identical trajectory, fp32 master is dp-sharded
    z_losses, z_state = run(True, zero1=True)
    np.testing.assert_allclose(z_losses, m_losses, rtol=1e-5)
    master_leaf = z_state["master"]["layers"][0]["q_proj"]
    flat_axes = set()
    for entry in master_leaf.sharding.spec:
        if entry is not None:
            flat_axes.update(
                entry if isinstance(entry, tuple) else (entry,)
            )
    assert "dp" in flat_axes, master_leaf.sharding.spec


def test_checkpoint_roundtrip_mesh_migration_and_zero1_resume(tmp_path):
    """Train-state checkpointing: a snapshot taken mid-training resumes
    with the exact same loss trajectory — on the same mesh, on a
    DIFFERENT mesh layout (dp/tp transposed), and into a ZeRO-1 state
    (replicated moments re-placed as dp shards at restore). Mismatched
    configurations fail loudly."""
    import pytest

    from shardmerge_tpu.parallel.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    cfg = _cfg()
    batch = jnp.asarray(
        np.random.default_rng(7).integers(0, cfg.vocab_size, (4, 16)),
        jnp.int32,
    )
    mesh = make_mesh(("dp", "tp"), shape=(2, 4))
    init_state, train_step = make_train_step(mesh, cfg, learning_rate=1e-2)
    state = init_state(init_params(cfg, jax.random.PRNGKey(0), jnp.float32))
    for _ in range(2):
        state, _ = train_step(state, batch)
    save_train_state(tmp_path, state, step=2)

    ref_losses = []
    for _ in range(2):
        state, loss = train_step(state, batch)
        ref_losses.append(float(loss))

    # restore onto a transposed mesh; template VALUES are irrelevant
    # (different seed) — only structure + placement are taken from it
    mesh2 = make_mesh(("dp", "tp"), shape=(4, 2))
    init2, step2 = make_train_step(mesh2, cfg, learning_rate=1e-2)
    template = init2(init_params(cfg, jax.random.PRNGKey(9), jnp.float32))
    restored, step = restore_train_state(tmp_path, template)
    assert step == 2
    losses2 = []
    for _ in range(2):
        restored, loss = step2(restored, batch)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses2, ref_losses, rtol=1e-5)

    # replicated checkpoint -> ZeRO-1 resume: same trajectory, moments
    # land dp-sharded
    z1_init, z1_step = make_train_step(
        mesh2, cfg, learning_rate=1e-2, zero1=True
    )
    z1_template = z1_init(
        init_params(cfg, jax.random.PRNGKey(11), jnp.float32)
    )
    z1_state, _ = restore_train_state(tmp_path, z1_template)
    mu = z1_state["opt_state"][0].mu["layers"][0]["q_proj"]
    assert "dp" in mu.sharding.spec
    z1_state, z1_loss = z1_step(z1_state, batch)
    np.testing.assert_allclose(float(z1_loss), ref_losses[0], rtol=1e-5)

    # replicated checkpoint -> FSDP resume: params land dp-sharded too
    fs_init, fs_step = make_train_step(
        mesh2, cfg, learning_rate=1e-2, fsdp=True
    )
    fs_template = fs_init(
        init_params(cfg, jax.random.PRNGKey(13), jnp.float32)
    )
    fs_state, _ = restore_train_state(tmp_path, fs_template)
    q = fs_state["params"]["layers"][0]["q_proj"]
    assert (
        q.addressable_shards[0].data.nbytes * mesh2.devices.size == q.nbytes
    )
    fs_state, fs_loss = fs_step(fs_state, batch)
    np.testing.assert_allclose(float(fs_loss), ref_losses[0], rtol=1e-5)

    # a different architecture cannot restore silently
    import dataclasses

    wrong = dataclasses.replace(cfg, num_hidden_layers=1)
    w_init, _ = make_train_step(mesh2, wrong)
    w_template = w_init(
        init_params(wrong, jax.random.PRNGKey(1), jnp.float32)
    )
    with pytest.raises(ValueError, match="leaves|shape"):
        restore_train_state(tmp_path, w_template)


def test_train_step_new_family_layer_keys():
    """param_shardings replicates keys without a Megatron rule (sinks,
    router bias, fused gpt-oss experts, q/k norms) instead of KeyError-ing;
    the gpt-oss train step runs and descends (sinks active in block_train),
    and a qwen3-style qk_norm model trains too."""
    import dataclasses

    gpt = ModelConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim_override=8,
        model_type="gpt_oss",
        attention_bias=True,
        num_local_experts=4,
        num_experts_per_tok=2,
        sliding_window=3,
        layer_types=("sliding_attention", "full_attention"),
        max_position_embeddings=64,
    )
    mesh = make_mesh(("dp", "tp"), shape=(8, 1))
    params = init_params(gpt, jax.random.PRNGKey(1), dtype=jnp.float32)
    for layer in params["layers"]:
        layer["sinks"] = jax.random.normal(jax.random.PRNGKey(2), (4,))
    init_state, train_step = make_train_step(mesh, gpt, learning_rate=1e-2)
    state = init_state(params)
    batch = jnp.asarray(
        np.random.default_rng(1).integers(0, gpt.vocab_size, (8, 12)),
        jnp.int32,
    )
    losses = []
    for _ in range(4):
        state, loss = train_step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]

    # sinks change the loss (block_train really uses them)
    params2 = init_params(gpt, jax.random.PRNGKey(1), dtype=jnp.float32)
    for layer in params2["layers"]:
        layer["sinks"] = jnp.full((4,), 5.0)
    state2 = init_state(params2)
    _, loss2 = train_step(state2, batch)
    assert abs(float(loss2) - losses[0]) > 1e-6

    qwen3 = dataclasses.replace(_cfg(), qk_norm=True, model_type="qwen3")
    mesh2 = make_mesh(("dp", "tp"), shape=(2, 4))
    p3 = init_params(qwen3, jax.random.PRNGKey(3), dtype=jnp.float32)
    init3, step3 = make_train_step(mesh2, qwen3)
    s3 = init3(p3)
    _, l3 = step3(s3, batch[:2])
    assert np.isfinite(float(l3))


def test_sharded_params_match_unsharded_forward():
    from shardmerge_tpu.models.llama import forward_train

    mesh = make_mesh(("dp", "tp"), shape=(1, 8))
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 12)), jnp.int32
    )
    base = forward_train(params, cfg, ids)
    sharded = shard_params(mesh, params)
    out = jax.jit(lambda p: forward_train(p, cfg, ids))(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=2e-4, atol=2e-4)


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and np.all(np.isfinite(np.asarray(out)))


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_dryrun_multichip_hostile_env():
    """The round-1 driver ran dryrun_multichip in a process whose default JAX
    platform was the axon TPU (sitecustomize force-registers it); eager ops
    landed there and crashed (MULTICHIP_r01.json). The wrapper must detect the
    foreign platform and re-exec itself onto pure-CPU virtual devices.

    This spawns a fresh interpreter WITHOUT any CPU-forcing env — exactly the
    driver's conditions on this host — and requires success.
    """
    import os
    import subprocess
    import sys
    from pathlib import Path

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        env=env,
        cwd=str(repo),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK: 8 devices" in proc.stdout


def test_fsdp_matches_replicated_and_shards_params():
    """FSDP (zero3-style): the params themselves partition over 'dp' on
    top of their 'tp' placement, moments/master mirror them, and the
    training trajectory equals the replicated step's. Per-device weight
    bytes drop to 1/(dp*tp)."""
    mesh = make_mesh(("dp", "tp"), shape=(4, 2))
    cfg = _cfg()
    batch = jnp.asarray(
        np.random.default_rng(7).integers(0, cfg.vocab_size, (4, 16)),
        jnp.int32,
    )

    results = {}
    for fsdp in (False, True):
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        init_state, train_step = make_train_step(
            mesh, cfg, learning_rate=1e-2, fsdp=fsdp
        )
        state = init_state(params)
        losses = []
        for _ in range(3):
            state, loss = train_step(state, batch)
            losses.append(float(loss))
        results[fsdp] = (losses, state)

    np.testing.assert_allclose(results[True][0], results[False][0], rtol=1e-5)
    ref = np.asarray(results[False][1]["params"]["embed_tokens"])
    got = np.asarray(results[True][1]["params"]["embed_tokens"])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)

    import pytest

    # weights genuinely dp x tp partitioned: 1/(dp*tp) bytes per device
    q = results[True][1]["params"]["layers"][0]["q_proj"]
    flat_spec = [a for e in q.sharding.spec if e for a in
                 (e if isinstance(e, tuple) else (e,))]
    assert "dp" in flat_spec and "tp" in flat_spec, q.sharding.spec
    assert (
        q.addressable_shards[0].data.nbytes * mesh.devices.size == q.nbytes
    )
    # moments MIRROR the param placement (no second-dim extension)
    adam = results[True][1]["opt_state"][0]
    mu = adam.mu["layers"][0]["q_proj"]
    assert mu.sharding == q.sharding
    assert int(adam.count) == 3

    with pytest.raises(ValueError, match="subsumed"):
        make_train_step(mesh, cfg, zero1=True, fsdp=True)

    # composes with master_fp32 + remat + grad_accum
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    init_state, train_step = make_train_step(
        mesh, cfg, learning_rate=1e-2, fsdp=True, master_fp32=True,
        remat=True, grad_accum=2,
    )
    state = init_state(params)
    state, loss = train_step(state, batch)
    np.testing.assert_allclose(
        float(loss), results[False][0][0], rtol=1e-5
    )
    m = state["master"]["layers"][0]["q_proj"]  # fp32 master: fsdp-sharded
    assert m.addressable_shards[0].data.nbytes * mesh.devices.size == m.nbytes
