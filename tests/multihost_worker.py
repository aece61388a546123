"""Worker entry for the multi-process (multi-host analogue) tests.

Modes (argv[1]):
- a config path — run the production ``merge`` CLI inside a process that
  joins a jax.distributed CPU cluster (the coordination triple arrives via
  JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, read by
  parallel/multihost.initialize_distributed);
- ``pp`` — join the cluster and run a pipeline-parallel forward whose
  stage-to-stage ppermute edges cross the process boundary (a gemma2-style
  alternating sliding-window config, so the per-layer schedule also runs
  cross-process), then compare against the local single-device forward and
  print ``PP-OK``.
- ``cp`` — join the cluster and run ring attention over a 'cp' mesh whose
  K/V-block ppermute hops each cross a process boundary (forward AND a
  grad through the flash recombination), compare against full single-
  device causal attention, and print ``CP-OK``.

Invoked by tests/test_multihost.py — not a test module itself.

The platform is forced to CPU via the config API before any backend
initialization: on this harness a sitecustomize force-registers a TPU
platform that env vars alone cannot override (see tests/conftest.py).
"""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def pp_main() -> None:
    import dataclasses
    import logging

    # the harness greps for multihost's "distributed runtime up" INFO line
    # to confirm the cluster formed (the merge CLI configures logging; this
    # mode must too)
    logging.basicConfig(level=logging.INFO)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from shardmerge_tpu.models.llama import (
        ModelConfig,
        forward_train,
        init_params,
    )
    from shardmerge_tpu.parallel.multihost import initialize_distributed
    from shardmerge_tpu.parallel.pipeline import (
        pipeline_forward_train,
        stack_stages,
    )
    from jax.sharding import Mesh

    assert initialize_distributed(), "cluster did not form"
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_stages = len(devs)
    mesh = Mesh(np.asarray(devs), axis_names=("pp",))

    cfg = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2 * n_stages,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    cfg = dataclasses.replace(cfg, model_type="gemma2", sliding_window=3)

    import jax.numpy as jnp

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    print("phase: init done", flush=True)
    pp_params = stack_stages(mesh, params, n_stages)
    print("phase: stacked", flush=True)
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (4, 9), 0, cfg.vocab_size
    )
    want = np.asarray(forward_train(params, cfg, ids))
    print("phase: local forward done", flush=True)
    got = np.asarray(pipeline_forward_train(mesh, cfg, pp_params, ids, 2))
    print("phase: pp forward done", flush=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    print(f"PP-OK max|diff|={np.abs(got - want).max():.3e}", flush=True)


def cp_main() -> None:
    import logging

    logging.basicConfig(level=logging.INFO)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from shardmerge_tpu.parallel.multihost import initialize_distributed
    from shardmerge_tpu.parallel.ring import ring_attention

    assert initialize_distributed(), "cluster did not form"
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    mesh = Mesh(np.asarray(devs), axis_names=("cp",))

    B, H, KVH, T, D = 2, 4, 2, 8 * len(devs), 8
    scale = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)  # same seed everywhere: replicated inputs
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KVH, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KVH, T, D)), jnp.float32)

    def full_attention(q):
        group = H // KVH
        qg = q.reshape(B, KVH, group, T, D)
        scores = jnp.einsum("bkgtd,bksd->bkgts", qg, k) * scale
        causal = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(causal[None, None, None], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bkgts,bksd->bkgtd", probs, v).reshape(B, H, T, D)

    want = np.asarray(full_attention(q))
    print("phase: local attention done", flush=True)

    def check_local_shards(global_arr, ref, **tol):
        """Compare this process's addressable shards of a cross-process
        sharded array against the matching slices of the local reference —
        no gather needed, and every process checks its own sequence rows."""
        shards = global_arr.addressable_shards
        assert shards, "process holds no shards"
        diffs = []
        for s in shards:
            got_block = np.asarray(s.data)
            ref_block = ref[s.index]
            np.testing.assert_allclose(got_block, ref_block, **tol)
            diffs.append(np.abs(got_block - ref_block).max())
        return max(diffs)

    got_sharded = ring_attention(mesh, q, k, v, scale)
    d_fwd = check_local_shards(got_sharded, want, rtol=1e-5, atol=1e-6)
    print("phase: cp forward done", flush=True)

    # a grad flowing through the cross-process ring (flash recombination +
    # ppermute transpose): must match the full-attention grad. The whole
    # loss runs under ONE jit: eager device_put's transpose cannot reshard
    # a cross-process cotangent ("input that is not fully addressable"),
    # but inside jit the reshard is just an SPMD sharding constraint.
    from jax.sharding import NamedSharding, PartitionSpec as P

    w_host = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    g_full = np.asarray(
        jax.grad(lambda q: jnp.sum(full_attention(q) * w_host))(q)
    )
    w = jax.device_put(w_host, NamedSharding(mesh, P()))
    q_g = jax.device_put(q, NamedSharding(mesh, P(None, None, "cp", None)))
    g_fn = jax.jit(
        jax.grad(lambda qq: jnp.sum(ring_attention(mesh, qq, k, v, scale) * w))
    )
    g_ring = g_fn(q_g)
    check_local_shards(g_ring, g_full, rtol=1e-4, atol=1e-5)
    print(f"CP-OK max|diff|={d_fwd:.3e}", flush=True)


def main() -> None:
    arg = sys.argv[1]
    if arg == "pp":
        pp_main()
        return
    if arg == "cp":
        cp_main()
        return

    import jax

    jax.config.update("jax_platforms", "cpu")

    from shardmerge_tpu.cli import cli

    cli.main(args=["merge", arg], standalone_mode=True)


if __name__ == "__main__":
    main()
