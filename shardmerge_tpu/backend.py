"""Backend selection + liveness probing for CLI entry points.

The reference picks its device eagerly (shard/tensor/util.py:67-68,
cuda -> mps -> cpu) and a dead CUDA runtime fails its first allocation
loudly. JAX on a remote/tunneled TPU fails WORSE: a dead runtime makes
``jax.devices()`` (or the first dispatch) block forever with no
diagnostic, which turns a production merge/serve launch into a silent
hang (observed live on the axon relay — see CLAUDE.md). Two defenses,
both CLI-entry-point-only (library code never probes):

- ``--device cpu`` becomes an honored request: the CPU backend is forced
  via the config API *before* any device is touched (env vars cannot
  override a host sitecustomize that set ``jax_platforms`` already).
- Otherwise the default backend is probed in a SUBPROCESS with a
  deadline (the hang mode cannot be timed out in-process: there is no
  async API around backend init). A dead backend becomes an explicit
  ``BackendError`` naming the escape hatches instead of an infinite
  hang. The probe costs one python+jax startup (~seconds) on healthy
  hosts; ``SHARDMERGE_SKIP_BACKEND_PROBE=1`` skips it for latency-
  critical automation that owns its own health checking.

Merges are resumable, so fail-fast (not silent CPU fallback) is the
right default for the CLI: a 70B merge silently falling back to host
CPU would "work" for days. bench.py keeps its own fallback-to-CPU probe
because a labeled non-TPU artifact beats no artifact.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
from typing import Optional

logger = logging.getLogger(__name__)

_PROBE_CODE = (
    "import jax\n"
    "d = jax.devices()\n"
    "import jax.numpy as jnp\n"
    "float(jnp.sum(jnp.ones((4,))))\n"
    "print('platform:', d[0].platform)\n"
)


class BackendError(RuntimeError):
    """The default JAX backend is unreachable (probe timed out/failed)."""


def force_cpu_backend() -> None:
    """Pin this process to the host CPU backend.

    Must run before any jax device touch; uses the config API because a
    host sitecustomize may have already overridden ``JAX_PLATFORMS``.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")


def _configured_platforms() -> str:
    """The process's jax_platforms config value ("" when unset)."""
    import jax

    return jax.config.jax_platforms or ""


def _probe_default_backend(
    timeout_s: float, attempts: int, probe_code: str = _PROBE_CODE
) -> Optional[str]:
    """Run a tiny jax program in a subprocess; return its platform name,
    or None if every attempt hung or crashed."""
    for attempt in range(1, attempts + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe_code],
                capture_output=True,
                text=True,
                timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            logger.warning(
                "backend probe %d/%d: no answer in %.0fs "
                "(remote TPU runtime stalled?)",
                attempt,
                attempts,
                timeout_s,
            )
            continue
        if proc.returncode != 0:
            logger.warning(
                "backend probe %d/%d exited %d: %s",
                attempt,
                attempts,
                proc.returncode,
                (proc.stderr or "").strip().splitlines()[-1:],
            )
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("platform:"):
                return line.split(":", 1)[1].strip()
        return "unknown"
    return None


def resolve_backend(
    requested: Optional[str] = None,
    *,
    probe_timeout_s: Optional[float] = None,
    attempts: int = 2,
    _probe_code: str = _PROBE_CODE,
) -> str:
    """Resolve the compute backend for a CLI entry point.

    ``requested`` is the user's ``--device`` / config ``device`` value:
    "cpu"/"host" force the host CPU backend immediately (no probe);
    anything else ("tpu", None, ...) means "the default backend", which
    is probed for liveness first. Returns the platform name in use.

    Raises BackendError when the default backend cannot be reached —
    with the fixes (``--device cpu``, skip env) in the message.
    """
    req = (requested or "").strip().lower()
    if req in ("cpu", "host"):
        force_cpu_backend()
        return "cpu"

    if os.environ.get("SHARDMERGE_SKIP_BACKEND_PROBE") == "1":
        return "unprobed"

    if _configured_platforms() == "cpu":
        return "cpu"  # already pinned to CPU; nothing to probe

    if probe_timeout_s is None:
        probe_timeout_s = float(
            os.environ.get("SHARDMERGE_BACKEND_PROBE_TIMEOUT", "120")
        )
    platform = _probe_default_backend(
        probe_timeout_s, attempts, probe_code=_probe_code
    )
    if platform is None:
        raise BackendError(
            "the default JAX backend did not answer a liveness probe "
            f"({attempts} attempts x {probe_timeout_s:.0f}s) — on tunneled "
            "TPU hosts this means the device relay is down and any device "
            "touch would hang forever. Fixes: restore the TPU runtime and "
            "retry (merges resume); run on the host with --device cpu; or "
            "set SHARDMERGE_SKIP_BACKEND_PROBE=1 if the backend is known "
            "healthy."
        )
    logger.info("backend probe OK: default platform is %s", platform)
    return platform
