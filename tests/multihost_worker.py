"""Worker entry for the two-process multihost merge test.

Runs the production ``merge`` CLI inside a process that joins a
jax.distributed CPU cluster (the coordination triple arrives via
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, read by
parallel/multihost.initialize_distributed). Invoked by
tests/test_multihost.py — not a test module itself.

The platform is forced to CPU via the config API before any backend
initialization: on this harness a sitecustomize force-registers a TPU
platform that env vars alone cannot override (see tests/conftest.py).
"""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    config_path = sys.argv[1]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from shardmerge_tpu.cli import cli

    cli.main(args=["merge", config_path], standalone_mode=True)


if __name__ == "__main__":
    main()
