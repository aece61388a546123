"""Training-state checkpointing: save/restore a sharded TrainState.

The merge pipeline's persistence philosophy is artifact-is-the-checkpoint
(io/writer.py — finished shards ARE the resume state; reference
shard/writer.py:64-118). Training needs the complementary piece: a
point-in-time snapshot of ``{"params", "opt_state"}`` that restores onto
ANY mesh.

Design (TPU-first, zero new formats):

- One safetensors file holds every leaf of the flattened state pytree,
  keyed by flatten index, plus a ``step`` in the metadata. safetensors is
  the repo's existing on-disk idiom (io/safetensors_io.py), bf16-capable,
  and mmap-readable.
- The pytree STRUCTURE is not serialized — the caller supplies a template
  state (``init_state(params)`` output). That template also carries the
  target shardings, so a checkpoint written on a (dp=2, tp=4) mesh
  restores straight onto (dp=4, tp=2), a different device count, or a
  ZeRO-1 layout: each leaf is device_put onto the template leaf's
  sharding. Mesh migration is a restore-time re-placement, not a
  conversion tool.
- Writes are atomic (.tmp + rename), matching the writer's crash
  contract: a checkpoint either exists completely or not at all.

On multi-pod deployments where a full gather is unaffordable, per-host
async sharded checkpointing (orbax) layers on top; this module is the
single-file contract the rest of the framework (and its tests) rely on.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..io.safetensors_io import SafeTensorsReader, save_file

__all__ = ["save_train_state", "restore_train_state"]

logger = logging.getLogger(__name__)

_FILE = "train_state.safetensors"


def save_train_state(
    path, state: Dict[str, Any], step: Optional[int] = None
) -> Path:
    """Snapshot a (possibly sharded) train state into
    ``path``/train_state.safetensors.

    Gathers every leaf to host (np.asarray reassembles sharded arrays),
    writes atomically, and records ``step`` plus the leaf count in the
    metadata. Returns the file path.
    """
    out_dir = Path(path)
    out_dir.mkdir(parents=True, exist_ok=True)
    leaves = jax.tree.leaves(state)
    tensors = {str(i): np.asarray(leaf) for i, leaf in enumerate(leaves)}
    meta = {"leaves": str(len(leaves))}
    if step is not None:
        meta["step"] = str(int(step))
    final = out_dir / _FILE
    tmp = out_dir / (_FILE + ".tmp")
    save_file(tensors, tmp, metadata=meta)
    tmp.replace(final)
    logger.info(
        "Saved train state: %d leaves%s -> %s",
        len(leaves),
        f" at step {step}" if step is not None else "",
        final,
    )
    return final


def restore_train_state(
    path, template_state: Dict[str, Any]
) -> Tuple[Dict[str, Any], Optional[int]]:
    """Restore a snapshot onto ``template_state``'s structure AND placement.

    Each stored leaf is device_put onto the corresponding template leaf's
    sharding — the template (a fresh ``init_state(params)``) defines the
    target mesh, so restoring onto a different device layout than the one
    that saved is the same code path as restoring in place. Shapes are
    validated leaf-by-leaf (a config/topology mismatch fails loudly with
    the leaf index, not with a silent reshape). Returns
    ``(state, step-or-None)``.
    """
    file = Path(path)
    if file.is_dir():
        file = file / _FILE
    leaves, treedef = jax.tree.flatten(template_state)
    with SafeTensorsReader(file) as reader:
        meta = reader.metadata or {}
        n = int(meta.get("leaves", "-1"))
        if n != len(leaves):
            raise ValueError(
                f"checkpoint has {n} leaves; template expects "
                f"{len(leaves)} — saved with a different model/optimizer "
                "configuration"
            )
        restored = []
        for i, ref in enumerate(leaves):
            arr = reader.get_tensor(str(i))  # mmap view
            if tuple(arr.shape) != tuple(ref.shape):
                raise ValueError(
                    f"checkpoint leaf {i} has shape {tuple(arr.shape)}; "
                    f"template expects {tuple(ref.shape)}"
                )
            if arr.dtype != ref.dtype:
                # a dtype change (fp32 run restored onto a bf16 template)
                # would silently retrace and retrain at the stored dtype
                raise ValueError(
                    f"checkpoint leaf {i} has dtype {arr.dtype}; template "
                    f"expects {ref.dtype} — trained/saved under a "
                    "different precision configuration"
                )
            sharding = getattr(ref, "sharding", None)
            if isinstance(sharding, jax.sharding.NamedSharding):
                restored.append(jax.device_put(arr, sharding))
            else:
                # scalars/leaves the template holds uncommitted on one
                # device (jit outputs untouched by any mesh axis):
                # device_put would COMMIT them there and then conflict
                # with the mesh-placed leaves at the next jit call; an
                # uncommitted host array lets jit place it
                restored.append(jax.numpy.asarray(arr))
        # the views die with the reader; make sure every device copy
        # landed before the mmap closes
        jax.block_until_ready(restored)
    step = int(meta["step"]) if "step" in meta else None
    return jax.tree.unflatten(treedef, restored), step
