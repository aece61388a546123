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


def main() -> None:
    arg = sys.argv[1]
    if arg == "pp":
        pp_main()
        return

    import jax

    jax.config.update("jax_platforms", "cpu")

    from shardmerge_tpu.cli import cli

    cli.main(args=["merge", arg], standalone_mode=True)


if __name__ == "__main__":
    main()
