"""Backend resolution + dead-runtime probing (shardmerge_tpu/backend.py).

Why this exists: on tunneled/remote TPU hosts a dead device runtime makes
``jax.devices()`` block FOREVER (observed live on this host's relay) — the
CLI must convert that hang into either an honored ``--device cpu`` or a
loud, actionable error. The reference has no analogue (a dead CUDA runtime
fails its first allocation; shard/tensor/util.py:67-68 picks eagerly).
"""

from __future__ import annotations

import pytest

from shardmerge_tpu import backend


def test_resolve_cpu_forces_host_backend():
    import jax

    assert backend.resolve_backend("cpu") == "cpu"
    assert jax.devices()[0].platform == "cpu"


def test_resolve_host_alias():
    assert backend.resolve_backend("host") == "cpu"


def test_probe_skipped_when_already_pinned_to_cpu(monkeypatch):
    """Under the test conftest jax_platforms is "cpu": no subprocess may
    spawn (CLI latency on CPU-only runs, and tests must never probe)."""

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("probe subprocess must not run")

    monkeypatch.setattr(backend, "_probe_default_backend", boom)
    assert backend.resolve_backend(None) == "cpu"
    assert backend.resolve_backend("tpu") == "cpu"


def test_skip_env_bypasses_probe(monkeypatch):
    monkeypatch.setenv("SHARDMERGE_SKIP_BACKEND_PROBE", "1")
    monkeypatch.setattr(
        backend, "_configured_platforms", lambda: "axon,cpu"
    )

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("probe subprocess must not run")

    monkeypatch.setattr(backend, "_probe_default_backend", boom)
    assert backend.resolve_backend(None) == "unprobed"


def test_probe_subprocess_hang_times_out():
    """A probe that never answers (the relay hang mode) returns None
    within the deadline instead of blocking."""
    assert (
        backend._probe_default_backend(
            timeout_s=1.0,
            attempts=1,
            probe_code="import time; time.sleep(60)",
        )
        is None
    )


def test_probe_subprocess_crash_returns_none():
    assert (
        backend._probe_default_backend(
            timeout_s=10.0, attempts=1, probe_code="raise SystemExit(3)"
        )
        is None
    )


def test_probe_subprocess_healthy_reports_platform():
    assert (
        backend._probe_default_backend(
            timeout_s=30.0,
            attempts=1,
            probe_code="print('platform: quux')",
        )
        == "quux"
    )


def test_dead_default_backend_raises_actionable_error(monkeypatch):
    monkeypatch.setattr(
        backend, "_configured_platforms", lambda: "axon,cpu"
    )
    monkeypatch.setattr(
        backend, "_probe_default_backend", lambda *a, **k: None
    )
    with pytest.raises(backend.BackendError) as ei:
        backend.resolve_backend(None)
    msg = str(ei.value)
    assert "--device cpu" in msg
    assert "SHARDMERGE_SKIP_BACKEND_PROBE" in msg


def test_merge_cli_reports_dead_backend(monkeypatch, tmp_path):
    """The merge CLI surfaces BackendError as a clean error naming the
    escape hatches — not an infinite hang, not a stack trace."""
    import yaml
    from click.testing import CliRunner

    from shardmerge_tpu.cli import cli
    from tests.conftest import make_tiny_model

    for name, seed in [("base", 1), ("ft1", 2)]:
        make_tiny_model(tmp_path / name, seed=seed)
    cfg = {
        "output_base_model": str(tmp_path / "base"),
        "finetune_merge": [
            {
                "model": str(tmp_path / "ft1"),
                "base": str(tmp_path / "base"),
                "alpha": 0.5,
            }
        ],
        "output_dir": str(tmp_path / "out"),
        "cache_dir": str(tmp_path / "cache"),
        "storage_dir": str(tmp_path / "storage"),
    }
    cfg_file = tmp_path / "config.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))

    monkeypatch.setattr(
        backend, "_configured_platforms", lambda: "axon,cpu"
    )
    monkeypatch.setattr(
        backend, "_probe_default_backend", lambda *a, **k: None
    )
    result = CliRunner().invoke(cli, ["merge", str(cfg_file)])
    assert result.exit_code != 0
    assert "liveness probe" in result.output
    assert "--device cpu" in result.output

    # --device cpu is the escape hatch: same run now proceeds (and the
    # dead-probe monkeypatch must never be consulted).
    result = CliRunner().invoke(
        cli, ["merge", str(cfg_file), "--device", "cpu", "--dry-run"]
    )
    assert result.exit_code == 0, result.output
    assert "plan OK" in result.output
