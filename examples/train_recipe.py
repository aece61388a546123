#!/usr/bin/env python
"""End-to-end production training recipe on 8 virtual CPU devices.

Demonstrates the full training stack on a tiny llama so it runs anywhere
(no TPU needed; on a real pod, drop the CPU forcing and size the mesh to
your slice):

- dp x tp mesh, Megatron param shardings
- bf16 params + fp32 master weights (``master_fp32``)
- ZeRO-1 optimizer-state sharding over dp (``zero1``)
- gradient accumulation (``grad_accum``) + gradient checkpointing
  (``remat``)
- a custom optax chain (global-norm clipping + cosine schedule) via
  ``tx=``
- atomic checkpointing mid-run, then restore onto a TRANSPOSED mesh and
  continue — the trajectory is identical to the uninterrupted run.
- a QLoRA finale: the trained model frozen int8-quantized, rank-4
  adapters trained on top, exported as a PEFT adapter (fuse-lora
  consumes it).

Run:  python examples/train_recipe.py
"""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DEV = 8


def _reexec_on_cpu():
    """Re-exec with 8 virtual CPU devices unless already set up."""
    if os.environ.get("_TRAIN_RECIPE_CHILD") == "1":
        return
    from shardmerge_tpu.utils import host_device_count_flags

    env = dict(os.environ)
    env["_TRAIN_RECIPE_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = host_device_count_flags(env.get("XLA_FLAGS", ""), N_DEV)
    os.execve(sys.executable, [sys.executable, __file__], env)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from shardmerge_tpu.models.llama import ModelConfig, init_params
    from shardmerge_tpu.parallel.checkpoint import (
        restore_train_state,
        save_train_state,
    )
    from shardmerge_tpu.parallel.mesh import make_mesh
    from shardmerge_tpu.parallel.train import make_train_step

    cfg = ModelConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(3e-3, 200)),
    )
    recipe = dict(
        remat=True, zero1=True, master_fp32=True, grad_accum=2, tx=tx
    )

    mesh = make_mesh(("dp", "tp"), shape=(4, 2))
    init_state, train_step = make_train_step(mesh, cfg, **recipe)
    state = init_state(init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16))

    rng = np.random.default_rng(0)

    def batch(step):
        return jnp.asarray(
            rng.integers(0, cfg.vocab_size, (8, 33)), jnp.int32
        )

    ckpt_dir = Path("/tmp/train_recipe_ckpt")
    for step in range(6):
        state, loss = train_step(state, batch(step))
        print(f"step {step}: loss {float(loss):.4f}", flush=True)
        if step == 2:
            save_train_state(ckpt_dir, state, step=step)
            print(f"  checkpointed at step {step} -> {ckpt_dir}")

    # resume on a TRANSPOSED mesh from the step-2 snapshot
    mesh2 = make_mesh(("dp", "tp"), shape=(2, 4))
    init2, step2 = make_train_step(mesh2, cfg, **recipe)
    template = init2(init_params(cfg, jax.random.PRNGKey(1), jnp.bfloat16))
    restored, at_step = restore_train_state(ckpt_dir, template)
    print(f"restored step-{at_step} snapshot onto a (2, 4) mesh")

    rng = np.random.default_rng(0)
    for step in range(6):  # replay the same stream
        b = batch(step)
        if step <= at_step:
            continue
        restored, loss = step2(restored, b)
        print(f"resumed step {step}: loss {float(loss):.4f}", flush=True)

    adam = next(
        s
        for s in jax.tree.leaves(
            restored["opt_state"],
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
        )
        if isinstance(s, optax.ScaleByAdamState)
    )
    mu = adam.mu["layers"][0]["q_proj"]
    print(
        "zero1 moment sharding:", mu.sharding.spec,
        "| master dtype:", restored["master"]["norm"].dtype,
        "| params dtype:", restored["params"]["norm"].dtype,
    )

    # the same snapshot also restores onto an FSDP recipe (ZeRO-3: the
    # params themselves shard over dp; moments/master mirror them).
    # Replay the SAME batch stream so the printed loss is directly
    # comparable to "resumed step 3" above.
    fs_recipe = dict(recipe, zero1=False, fsdp=True)
    fs_init, fs_step = make_train_step(mesh2, cfg, **fs_recipe)
    fs_template = fs_init(
        init_params(cfg, jax.random.PRNGKey(2), jnp.bfloat16)
    )
    fs_state, _ = restore_train_state(ckpt_dir, fs_template)
    rng = np.random.default_rng(0)
    fs_batches = [batch(i) for i in range(at_step + 2)]
    fs_state, fs_loss = fs_step(fs_state, fs_batches[at_step + 1])
    q = fs_state["params"]["layers"][0]["q_proj"]
    print(
        f"fsdp resume (same step-3 batch): loss {float(fs_loss):.4f} "
        f"| param sharding", q.sharding.spec,
        f"| per-device bytes {q.addressable_shards[0].data.nbytes}",
        f"of {q.nbytes}",
    )

    # --- QLoRA finale: freeze the trained model int8-quantized, train
    # rank-4 adapters only (optimizer state is adapter-sized), export
    # them as a PEFT adapter directory (fuse-lora consumes it)
    from shardmerge_tpu.constants import LORA_TARGET_PROJECTIONS as proj
    from shardmerge_tpu.models.quant import quantize
    from shardmerge_tpu.parallel.lora import (
        lora_to_peft,
        make_lora_train_step,
    )
    host = jax.tree.map(np.asarray, restored["params"])
    qbase = {
        **host,
        "layers": [
            {k: (quantize(v, 8) if k in proj else v) for k, v in layer.items()}
            for layer in host["layers"]
        ],
    }
    lora_init_state, lora_step = make_lora_train_step(
        mesh2, cfg, rank=4, learning_rate=1e-3, seed=0
    )
    lstate = lora_init_state(qbase)
    for step in range(3):
        lstate, loss = lora_step(lstate, batch(step))
        print(f"qlora step {step}: loss {float(loss):.4f}", flush=True)
    adapter_dir = Path("/tmp/train_recipe_lora")
    summary = lora_to_peft(lstate["lora"], adapter_dir, rank=4, alpha=4.0)
    n_lora = sum(
        leaf.size for leaf in jax.tree.leaves(lstate["lora"])
    )
    n_full = sum(leaf.size for leaf in jax.tree.leaves(host))
    print(
        f"qlora adapter: {summary['tensors']} tensor pairs "
        f"({n_lora / n_full:.2%} of full-model params) -> {adapter_dir}"
    )


if __name__ == "__main__":
    _reexec_on_cpu()
    main()
