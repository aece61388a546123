"""Multi-host (DCN) support for the merge pipeline.

Design decision (round 2, resolving SURVEY.md §2.3 "optional multi-host"):
the merge math needs NO multi-host-specific kernels. The distributed-FFT
pair merge (parallel/merge.py) shards a tensor's rows over ONE flat mesh
axis; GSPMD routes the all-to-all edges of that axis over ICI within a host
and over DCN between hosts automatically. What multi-host needs is:

1. runtime initialization — ``jax.distributed.initialize`` on every host so
   ``jax.devices()`` is the global device set (``initialize_distributed``);
2. a flat merge mesh over all global devices, ordered so consecutive mesh
   positions are intra-host (``merge_mesh``) — the row<->column all-to-all
   is all-pairs, but the inverse transform's paired forward reuses the same
   layout, so keeping each host's devices contiguous maximizes the fraction
   of shard boundaries that stay on ICI;
3. host-local IO — every process reads the input shards; merged tensors
   that span hosts are gathered with
   ``jax.experimental.multihost_utils.process_allgather`` at write-back
   (merge/base.py ``_to_host``) and ONLY process 0 writes output files
   (non-primary processes get a read_only ModelWriter). For resume to stay
   consistent, ``output_dir`` must be on storage every process can READ
   (all processes derive the skip-list from the existing output shards);
   only process 0 ever writes to it.

When to engage: a 70B fp32 delta stack (2 models x 3.9 GB/tensor peak with
complex64 intermediates) fits a single v5p host comfortably — multi-host is
only needed when the per-tensor working set exceeds one host's aggregate
HBM or to ride more aggregate HBM bandwidth. The <10 min 70B target
(BASELINE.md) is reachable single-host; this module exists so the same
engine scales past it unchanged.

This container has one TPU chip and no DCN; tests/test_multihost.py stands
in with a REAL two-process jax.distributed cluster over localhost (2 virtual
CPU devices per process, gloo collectives): the production merge CLI runs in
both processes, the distributed FFT's all-to-all crosses the process
boundary, and only process 0 writes output.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

__all__ = ["initialize_distributed", "merge_mesh"]


_CLUSTER_ENV_VARS = (
    # explicit jax.distributed coordination
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "JAX_NUM_PROCESSES",
    # TPU pod runtimes
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "TPU_PROCESS_ADDRESSES",
    "CLOUD_TPU_TASK_ID",
    # generic schedulers jax's ClusterEnv understands
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    force: bool = False,
) -> bool:
    """Initialize the JAX distributed runtime for a multi-host merge.

    Attempts ``jax.distributed.initialize`` when (a) explicit coordination
    arguments are given, (b) a known cluster environment variable is set, or
    (c) ``force=True`` (the YAML config's ``distributed: true``). GCE TPU
    pods auto-detect the cluster through the metadata server, which only
    ``jax.distributed.initialize`` itself can probe — that path needs
    ``force``/``distributed: true`` because probing it from a non-pod host
    can block; the env-var detection covers GKE/Slurm/MPI launches without
    any flag. Returns True when the distributed runtime came up with more
    than one process; a failed or single-process probe degrades to a
    single-process run.
    """
    import os

    # Manual launches (no scheduler): JAX itself reads JAX_COORDINATOR_ADDRESS
    # from the environment but NOT the process count/id, so a plain
    # two-terminal / mpirun-less launch would fail cluster autodetection.
    # Honor the full triple here.
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    try:
        if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        if process_id is None and "JAX_PROCESS_ID" in os.environ:
            process_id = int(os.environ["JAX_PROCESS_ID"])
    except ValueError as e:
        # malformed env must degrade like every other failed probe, not crash
        logger.warning(
            "ignoring malformed JAX_NUM_PROCESSES/JAX_PROCESS_ID (%s)", e
        )

    explicit = coordinator_address is not None or num_processes not in (None, 1)
    if not (
        force or explicit or any(k in os.environ for k in _CLUSTER_ENV_VARS)
    ):
        logger.debug("single-process run; distributed runtime not started")
        return False
    extra = {}
    # One oversubscribed host (or a cold remote compiler) can stall a worker
    # past the 100 s default without it being dead; let deployments widen it.
    hb = os.environ.get("SHARDMERGE_HEARTBEAT_TIMEOUT_S")
    if hb:
        try:
            extra["heartbeat_timeout_seconds"] = int(hb)
        except ValueError:
            logger.warning("ignoring malformed SHARDMERGE_HEARTBEAT_TIMEOUT_S")
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **extra,
        )
    except Exception as e:
        logger.info(
            "distributed runtime not started (%s); running single-process", e
        )
        return False
    logger.info(
        "distributed runtime up: process %d/%d, %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
    )
    return jax.process_count() > 1


def merge_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """Flat 1-D merge mesh over all global devices, host-contiguous order.

    Devices are sorted by (process_index, device id) so each host's devices
    occupy consecutive mesh positions: the row shards a host holds are
    contiguous, every local row-FFT touches only local HBM, and the
    all-to-all's intra-host edges (the majority for P_local >> n_hosts) ride
    ICI. Works identically for a single host (== make_mesh(("x",))).
    """
    devices = list(devices if devices is not None else jax.devices())
    devices.sort(key=lambda d: (getattr(d, "process_index", 0), d.id))
    return Mesh(np.asarray(devices), axis_names=("x",))
