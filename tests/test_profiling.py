"""Profiling/observability coverage."""

import logging

from shardmerge_tpu.ops.profiling import MergeStats, device_memory_stats, phase_profiler
from shardmerge_tpu.utils import get_device


def test_phase_profiler_logs_when_enabled(caplog):
    with caplog.at_level(logging.INFO, logger="shardmerge_tpu.ops.profiling"):
        with phase_profiler("unit-test-phase", display=True):
            _ = sum(range(1000))
    assert any("unit-test-phase" in r.message for r in caplog.records)


def test_phase_profiler_silent_when_disabled(caplog):
    with caplog.at_level(logging.INFO, logger="shardmerge_tpu.ops.profiling"):
        with phase_profiler("quiet-phase", display=False):
            pass
    assert not any("quiet-phase" in r.message for r in caplog.records)


def test_merge_stats_summary():
    stats = MergeStats()
    stats.tensors_merged = 3
    stats.tensors_passthrough = 1
    stats.record_pair("slerp")
    stats.record_pair("slerp")
    stats.record_pair("add")
    stats.bytes_written = 3 * 2**20
    s = stats.summary()
    assert "3 tensors" in s and "slerp=2" in s and "add=1" in s


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_get_device():
    assert get_device() in ("cpu", "tpu", "gpu")
