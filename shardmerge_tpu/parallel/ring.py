"""Context parallelism (CP): ring attention over a 'cp' mesh axis.

Completes the parallelism axes enumerated in SURVEY.md §2.3 (dp/tp in
parallel/train.py, pp in parallel/pipeline.py, ep in parallel/moe.py, the
merge's own tensor sharding in parallel/merge.py): the SEQUENCE dimension is
sharded over the mesh, so attention over contexts longer than one chip's
HBM runs without ever materializing the full (T, T) score matrix or the
full K/V on any device.

Algorithm (Ring Attention, Liu et al. 2023): every device holds one block
of Q/K/V (T/P tokens). For P steps, each device attends its local queries
against the K/V block it currently holds — combining results with the
streaming (flash) softmax: running max m, running denominator l, running
numerator acc — then passes the K/V block to the next device over ICI via
``lax.ppermute``. After P hops every query block has seen every key block;
out = acc / l. Causality is enforced per hop from the blocks' global token
positions, so the schedule is identical for every device (no data-dependent
control flow; XLA pipelines the ppermute against the local matmuls).

Both named CP schemes are provided: :func:`ring_attention` (above) and
:func:`ulysses_attention` (DeepSpeed-Ulysses — two all-to-alls re-shard the
SEQUENCE axis into the HEAD axis so each device runs full-sequence
attention for its head slice). Ulysses costs 2 all-to-alls instead of P
ppermute hops but materializes the full (T, T) score matrix per local head
and the full-sequence K/V per device — ring is the memory-bounding choice,
Ulysses the latency choice when T fits.

Numerics: fp32 score/softmax accumulators (same as models/llama._attention);
output proven equal to single-device full attention in
tests/test_parallel.py (forward and gradients).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_attention", "ulysses_attention"]

_AXIS = "cp"

_RING_CACHE: dict = {}


def _mesh_fp(mesh: Mesh) -> tuple:
    """Cache-key fingerprint: id() alone can be reused after GC, so pin the
    device set too (parallel/pipeline.py learned this the hard way)."""
    return (id(mesh), tuple(d.id for d in mesh.devices.flat), mesh.axis_names)


def _ring_body(
    ql,
    kl,
    vl,
    *,
    n_dev,
    scale,
    window=None,
    chunk=None,
    softcap=None,
    sinks=None,
):
    """shard_map body. ql: (B, H, Tl, D) local query block; kl/vl:
    (B, KVH, Tl, D) local key/value blocks. Returns (B, H, Tl, D) fp32.

    Attention-variant hooks (matching models/llama.block_train's
    single-device semantics exactly):

    - ``window``: sliding-window attention — a query at global position p
      attends keys at positions (p − window, p]. The hop count DROPS to
      ceil(window/Tl)+1: K/V blocks entirely behind the window are never
      shipped or scored, so a 4k window over a 128k cp-sharded sequence
      costs window-local FLOPs and ICI traffic, not O(T) hops.
    - ``chunk``: llama4 chunk-aligned local attention (keys share the
      query's chunk-aligned block: k ≥ floor(p/C)·C); same bounded-hop
      schedule with lookback C.
    - ``softcap``: gemma2 logit softcapping, applied after scaling and
      before masking (elementwise, so it commutes with the flash
      recombination).
    - ``sinks``: gpt-oss attention sinks, an (H,) per-head logit joining
      the softmax normalization with its mass dropped — folded into the
      FINAL renormalization: the sink is position-independent, so it
      joins once after all hops with the running (m, l) statistics.
    """
    B, H, Tl, D = ql.shape
    KVH = kl.shape[1]
    group = H // KVH
    rank = jax.lax.axis_index(_AXIS)

    qg = ql.astype(jnp.float32).reshape(B, KVH, group, Tl, D)
    q_pos = rank * Tl + jnp.arange(Tl)  # global token positions

    neg = jnp.float32(-1e9)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    # bounded lookback: window/chunk attention never reaches more than
    # `lookback` positions behind a query, so only the last
    # ceil(lookback/Tl)+1 blocks can contribute — skip the other hops
    lookback = None
    if window is not None:
        lookback = int(window)
    if chunk is not None:
        lookback = int(chunk)
    hops = n_dev if lookback is None else min(n_dev, -(-lookback // Tl) + 1)

    def hop(carry, _):
        acc, m, l, k_blk, v_blk, blk_rank = carry
        k_pos = blk_rank * Tl + jnp.arange(Tl)
        # causal: query at global position p attends keys at positions <= p
        allowed = q_pos[:, None] >= k_pos[None, :]
        if window is not None:
            allowed = allowed & (k_pos[None, :] > q_pos[:, None] - window)
        if chunk is not None:
            allowed = allowed & (
                k_pos[None, :] >= (q_pos[:, None] // chunk) * chunk
            )
        mask = jnp.where(allowed, 0.0, neg)

        scores = (
            jnp.einsum("bkgtd,bksd->bkgts", qg, k_blk.astype(jnp.float32))
            * scale
        )
        if softcap is not None:
            cap = jnp.float32(softcap)
            scores = cap * jnp.tanh(scores / cap)
        scores = scores + mask[None, None, None]
        m_blk = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        # rescale previous accumulators to the new max
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bkgts,bksd->bkgtd", p, v_blk.astype(jnp.float32)
        )

        k_blk = jax.lax.ppermute(k_blk, _AXIS, perm)
        v_blk = jax.lax.ppermute(v_blk, _AXIS, perm)
        blk_rank = (blk_rank - 1) % n_dev  # the block we now hold came from
        return (acc_new, m_new, l_new, k_blk, v_blk, blk_rank), None

    acc0 = jnp.zeros((B, KVH, group, Tl, D), jnp.float32)
    m0 = jnp.full((B, KVH, group, Tl, 1), neg)
    l0 = jnp.zeros((B, KVH, group, Tl, 1), jnp.float32)
    # the fresh accumulators are replicated but become device-varying after
    # the first hop; declare so scan's carry type is stable (kl/vl/rank are
    # already varying). When the ring runs INSIDE a larger shard_map (the
    # dp x cp x tp train step), the carry must match kl's full varying set
    # — not just 'cp' — or scan rejects the carry type.
    vary = tuple(
        sorted(set(jax.typeof(kl).vma) - set(jax.typeof(acc0).vma))
    ) or (_AXIS,)
    acc0, m0, l0 = jax.lax.pcast((acc0, m0, l0), vary, to="varying")
    (acc, m, l, _, _, _), _ = jax.lax.scan(
        hop, (acc0, m0, l0, kl, vl, rank), None, length=hops
    )
    if sinks is not None:
        # fold the sink logit into the final renormalization: it joins
        # the softmax denominator exactly once (position-independent), so
        # the running (m, l) statistics combine with it here — matching
        # block_train's mx = max(scores_max, sinks) form
        s = sinks.astype(jnp.float32).reshape(KVH, group)
        s = s[None, :, :, None, None]  # (1, KVH, group, 1, 1)
        mx = jnp.maximum(m, s)
        out = (
            acc
            * jnp.exp(m - mx)
            / (l * jnp.exp(m - mx) + jnp.exp(s - mx))
        )
    else:
        out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(B, H, Tl, D)


def ring_attention(
    mesh: Mesh,
    q: jnp.ndarray,  # (B, H, T, D)
    k: jnp.ndarray,  # (B, KVH, T, D)
    v: jnp.ndarray,  # (B, KVH, T, D)
    scale: float,
) -> jnp.ndarray:
    """Causal attention with the sequence sharded over mesh axis 'cp'.

    The axis size must evenly divide T; KVH must evenly divide H (GQA
    groups stay local). Returns (B, H, T, D) fp32, sharded like q.
    Differentiable (the flash recombination and ppermute both have
    transpose rules).
    """
    n_dev = mesh.shape[_AXIS]
    B, H, T, D = q.shape
    if T % n_dev != 0:
        raise ValueError(f"sequence {T} does not divide cp={n_dev}")
    if H % k.shape[1] != 0:
        raise ValueError(f"{H} heads do not group over {k.shape[1]} kv heads")

    key = (_mesh_fp(mesh), B, H, k.shape[1], T, D, float(scale))
    fn = _RING_CACHE.get(key)
    if fn is None:
        spec = P(None, None, _AXIS, None)
        fn = jax.jit(
            jax.shard_map(
                partial(_ring_body, n_dev=n_dev, scale=jnp.float32(scale)),
                mesh=mesh,
                in_specs=(spec, spec, spec),
                out_specs=spec,
            )
        )
        _RING_CACHE[key] = fn
    seq_sharding = NamedSharding(mesh, P(None, None, _AXIS, None))
    q, k, v = (jax.device_put(x, seq_sharding) for x in (q, k, v))
    return fn(q, k, v)


def _ulysses_body(ql, kl, vl, *, scale):
    """shard_map body: re-shard sequence -> heads, full local attention,
    re-shard back. ql: (B, H, Tl, D); kl/vl: (B, KVH, Tl, D)."""
    # (B, H, Tl, D) -> (B, H/P, T, D): give sequence, take heads
    q = jax.lax.all_to_all(ql, _AXIS, split_axis=1, concat_axis=2, tiled=True)
    k = jax.lax.all_to_all(kl, _AXIS, split_axis=1, concat_axis=2, tiled=True)
    v = jax.lax.all_to_all(vl, _AXIS, split_axis=1, concat_axis=2, tiled=True)

    B, Hl, T, D = q.shape
    KVHl = k.shape[1]
    group = Hl // KVHl
    qg = q.astype(jnp.float32).reshape(B, KVHl, group, T, D)
    scores = (
        jnp.einsum("bkgtd,bksd->bkgts", qg, k.astype(jnp.float32)) * scale
    )
    causal = jnp.arange(T)[:, None] >= jnp.arange(T)[None, :]
    scores = jnp.where(causal[None, None, None], scores, jnp.float32(-1e9))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksd->bkgtd", probs, v.astype(jnp.float32))
    out = out.reshape(B, Hl, T, D)
    # back: give heads, take sequence
    return jax.lax.all_to_all(out, _AXIS, split_axis=2, concat_axis=1, tiled=True)


def ulysses_attention(
    mesh: Mesh,
    q: jnp.ndarray,  # (B, H, T, D)
    k: jnp.ndarray,  # (B, KVH, T, D)
    v: jnp.ndarray,  # (B, KVH, T, D)
    scale: float,
) -> jnp.ndarray:
    """Causal attention, sequence-sharded over 'cp', Ulysses style: two
    all-to-alls swap the sharded axis to heads so every device computes
    full-sequence attention for its head slice. Requires the axis size to
    evenly divide H, KVH, and T (contiguous head blocks keep GQA groups
    aligned because (H/P) is a multiple of H/KVH when P divides KVH).
    Same numerics as :func:`ring_attention`; different comm/memory trade.
    """
    n_dev = mesh.shape[_AXIS]
    B, H, T, D = q.shape
    KVH = k.shape[1]
    if T % n_dev or H % n_dev or KVH % n_dev:
        raise ValueError(
            f"cp={n_dev} must evenly divide T={T}, H={H}, KVH={KVH}"
        )

    key = ("ulysses", _mesh_fp(mesh), B, H, KVH, T, D, float(scale))
    fn = _RING_CACHE.get(key)
    if fn is None:
        spec = P(None, None, _AXIS, None)
        fn = jax.jit(
            jax.shard_map(
                partial(_ulysses_body, scale=jnp.float32(scale)),
                mesh=mesh,
                in_specs=(spec, spec, spec),
                out_specs=spec,
            )
        )
        _RING_CACHE[key] = fn
    seq_sharding = NamedSharding(mesh, P(None, None, _AXIS, None))
    q, k, v = (jax.device_put(x, seq_sharding) for x in (q, k, v))
    return fn(q, k, v)
