"""Continuous batching: requests join and leave a running decode pool.

Parity surface: none — the reference serves one request at a time
(shard/inference.py:121-200). This is the TPU-native scale-out of the
serving path: a FIXED pool of B cache rows driven by the engine's fused
decode step (one dispatch advances every row by one token, or by S with
``decode_chunk``), where new requests join at chunk boundaries and
finished rows free their slot immediately. Unlike
:class:`serve.DynamicBatcher` (which windows compatible requests into
lockstep batches), a long completion never blocks the short ones batched
with it, and a new arrival never waits for the pool to drain.

Design (all shapes static — nothing ever recompiles after warmup):

- One global frontier ``t``: every dispatch writes all B rows at cache
  slots [t, t+S). Rows are independent streams; per-row attention masks
  carve each row's live history out of the shared slot axis.
- A request joining at frontier ``t`` prefills its prompt OFF-POOL in a
  batch-1 cache (reusing the engine's chunked prefill and, when enabled,
  its exact-prefix cache), then IMPLANTS the slab at slots [0, Lp) of a
  free row. The dead span [Lp, t) is masked out by ``token_valid``; RoPE
  positions stay contiguous because decode positions are slot − pad with
  pad = t − Lp. Sliding-window layers stay exact across the gap via the
  per-slot ``key_positions`` map (see models/llama.forward) — a DEVICE
  array the fused step advances in-jit, so steady-state host→device
  traffic per dispatch is O(B) scalars, independent of cache length.
- Admission is CHUNKED against active decode: while any row is decoding,
  at most ONE ``prefill_chunk``-token slice of the joining prompt runs
  between pool dispatches (the off-pool batch-1 cache carries the partial
  state across slices), so a long arriving prompt stalls the running
  streams by a bounded single-chunk step instead of its whole prefill —
  and concurrent arrivals serialize their CHUNKS, never their prefills,
  against the pool. When the pool is idle the admission drains at full
  speed. Off-pool prefill is exact by causality, so chunking changes
  WHEN compute happens, not what is computed.
- When a prompt is longer than the current frontier, the frontier jumps
  forward to Lp; other rows absorb the jump as one more masked gap (their
  pads grow by the jump, so their positions remain contiguous).
- When the frontier nears the cache end, the pool COMPACTS: one gather
  per cache leaf drops every dead slot, rebasing the frontier to the
  longest live row. A row's live length is bounded by its prompt + budget
  (enforced at submit), so compaction always makes progress.

- With a draft model loaded (``engine.draft_cfg``), the pool decodes
  SPECULATIVELY: each dispatch is one pooled round (k−1 draft proposals
  per row + one target verify over all k positions, all rows fused — see
  :func:`_make_pool_spec_round`), so up to k tokens per row ride a single
  device call. Rows accept different prefix lengths; both caches burn a
  fixed k slots per round at shared frontiers and each row's rejected
  slots are masked invalid — the same machinery as join gaps. Greedy
  output is token-identical to the solo stream paths (speculative and
  plain greedy), up to the documented (B,k)-vs-(1,1) rounding near-ties.

Sampling is per-request for temperature / top_p / repetition_penalty
(they ride as (B, 1) arrays straight into the fused step's sample body);
``top_k`` and ``greedy`` are compiled static, so they are pool-level
settings. Greedy decoding is exactly the solo stream path's output
token-for-token; sampled decoding draws from the pool's shared PRNG
stream, so a sampled completion depends on scheduling (as in any shared
sampler) — pin ``greedy=True`` to make outputs co-tenant-independent.

Threading: ``submit`` is safe from any thread and never waits on device
work — the pool lock guards only the queue. Pool state (caches, masks,
slots) is owned by whichever single thread drives it: the daemon started
by :meth:`start` (serving) or the caller of :meth:`run_until_idle`
(scripts/tests) — never both at once. An optional ``device_lock`` (the
server's) serializes the pool's dispatches against other decode paths
sharing the device.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .inference import (
    _CACHE_BUCKET,
    _KV_SEQ_AXIS,
    InferenceEngine,
)
from .models.llama import forward, init_kv_cache, rope_tables

logger = logging.getLogger(__name__)

__all__ = ["ContinuousEngine", "Completion"]


@dataclass
class Completion:
    """Handle for a submitted request; resolves when the request finishes."""

    prompt: str
    max_new_tokens: int
    temperature: float
    top_p: float
    repetition_penalty: float
    stop: Optional[List[str]] = None  # OpenAI stop sequences
    _stop_cut: Optional[int] = None  # char index a stop seq began at
    _done: threading.Event = field(default_factory=threading.Event)
    token_ids: List[int] = field(default_factory=list)
    text: Optional[str] = None
    finish_reason: Optional[str] = None
    error: Optional[Exception] = None
    # serving metrics (time.monotonic): set at submit / join / first
    # emitted token / finish
    submitted_at: Optional[float] = None
    joined_at: Optional[float] = None
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None

    def result(self, timeout: Optional[float] = None) -> str:
        if not self._done.wait(timeout):
            raise TimeoutError("completion still decoding")
        if self.error is not None:
            raise self.error
        return self.text

    def done(self) -> bool:
        return self._done.is_set()


@dataclass
class _Admission:
    """An in-flight chunked admission: the off-pool batch-1 prefill state
    of the request currently joining the pool."""

    handle: Completion
    ids: List[int]
    Lp: int  # true prompt length
    budget: int
    pids: object  # (1, L) padded prompt ids
    ppos: object  # (1, L) positions
    kv1: object  # batch-1 prefill cache (padded-prompt length)
    next_c0: int  # first unprefilled slot (prefix-cache hits skip ahead)
    row_logits: object = None  # (1, V) logits at Lp-1 once prefilled
    complete: bool = False
    d_kv1: object = None  # spec mode: draft batch-1 prefill cache
    d_next_c0: int = 0  # spec mode: draft prefill progress


def _seq_index(idx, leaf_key, ndim):
    """Broadcast a (B, S) gather index to a cache leaf's rank."""
    shape = [1] * ndim
    shape[1] = idx.shape[0]
    shape[_KV_SEQ_AXIS[leaf_key]] = idx.shape[1]
    return idx.reshape(shape)


@partial(jax.jit, donate_argnums=(0, 1))
def _compact_pool(kv, key_pos, idx):
    """Gather every row's live slots to the front of the slot axis.

    idx: (B, S) int32 — per-row source slot for each destination slot, in
    temporal order. Entries past a row's live length may point anywhere
    (their destinations are masked invalid by the caller). ``key_pos``
    rides the same gather so slot→position bookkeeping survives the move.
    """
    out = {
        k: jnp.take_along_axis(
            v, _seq_index(idx, k, v.ndim), axis=_KV_SEQ_AXIS[k]
        )
        for k, v in kv.items()
    }
    return out, jnp.take_along_axis(key_pos, idx, axis=1)


@partial(jax.jit, donate_argnums=(0, 2, 4, 5))
def _implant_row(kv, slab, last, row_logits, gen_mask, key_pos, b):
    """Install a prefilled request into pool row ``b``.

    Writes the batch-1 prefill cache at slots [0, slab_len) of row b,
    seeds the row's next-token logits, clears its repetition-penalty
    history, and stamps the prompt's positions (0..slab_len) into the
    slot→position map. One compile per slab length (bucket-rounded)."""
    out = {}
    slab_len = None
    for k, v in kv.items():
        start = [0] * v.ndim
        start[1] = b
        out[k] = jax.lax.dynamic_update_slice(v, slab[k], tuple(start))
        slab_len = slab[k].shape[_KV_SEQ_AXIS[k]]
    last = jax.lax.dynamic_update_slice(last, row_logits, (b, 0))
    zeros = jnp.zeros((1, gen_mask.shape[1]), gen_mask.dtype)
    gen_mask = jax.lax.dynamic_update_slice(gen_mask, zeros, (b, 0))
    key_pos = jax.lax.dynamic_update_slice(
        key_pos, jnp.arange(slab_len, dtype=jnp.int32)[None, :], (b, 0)
    )
    return out, last, gen_mask, key_pos


@partial(jax.jit, donate_argnums=(0, 2))
def _implant_draft_row(kv, slab, key_pos, b):
    """Install a prefilled draft cache into draft-pool row ``b``."""
    out = {}
    slab_len = None
    for k, v in kv.items():
        start = [0] * v.ndim
        start[1] = b
        out[k] = jax.lax.dynamic_update_slice(v, slab[k], tuple(start))
        slab_len = slab[k].shape[_KV_SEQ_AXIS[k]]
    key_pos = jax.lax.dynamic_update_slice(
        key_pos, jnp.arange(slab_len, dtype=jnp.int32)[None, :], (b, 0)
    )
    return out, key_pos


def _make_pool_spec_round(cfg, draft_cfg, B: int, k: int):
    """One POOLED speculative round as a single dispatch.

    The pooled generalization of inference._make_spec_round: every live
    row proposes k−1 draft continuations of its pending token and the
    target verifies all k speculative positions — for all B rows — in one
    fused program. Rows accept different prefix lengths, so both caches
    burn a fixed k slots per round at SHARED frontiers (t target, t_d
    draft) and the host masks each row's rejected slots invalid
    afterwards (``token_valid``) — the same gap machinery that makes
    joins and frontier jumps exact. Per-slot true positions ride the
    ``key_positions`` maps, stamped in-jit for the round's slot ranges.

    The draft catch-up (a row whose whole proposal block was accepted
    lags one true token) runs unconditionally for every row at draft slot
    t_d with the row's ``catch_tok``; rows that do not lag have that slot
    pre-masked invalid by the caller, so the write is inert. Last round's
    emitted tokens fold into the repetition-penalty history
    (``gen_mask``) at round start from (prev_fed, prev_m) — the pending
    token itself rides each round's cumulative fed masks, exactly as the
    solo path's mask_pre | {x1}.

    Returns ``(B, 2k−1)`` packed [proposals | verify argmaxes] so the
    host pays one dispatch + one fetch per round.
    """
    V = cfg.vocab_size

    def spec_round(
        t_params,
        d_params,
        kv,  # pooled target cache
        d_kv,  # pooled draft cache
        rope,
        d_rope,
        gen_mask,  # (B, V) bool penalty history (donated)
        prev_fed,  # (B, k) int32 last round's fed tokens
        prev_m,  # (B, 1) int32 accepted count last round (−1: none)
        x1,  # (B,) int32 pending tokens
        catch_tok,  # (B,) int32 draft catch-up tokens
        pos_x1,  # (B, 1) int32 pending token positions
        rp,  # (B, 1) f32 repetition penalties
        t,  # int32 target frontier
        t_d,  # int32 draft frontier
        valid,  # (B, S) bool target slot validity
        valid_d,  # (B, S) bool draft slot validity
        kp,  # (B, S) int32 target slot→position map (donated)
        kp_d,  # (B, S) int32 draft slot→position map (donated)
    ):
        # 0. fold last round's emissions into the penalty history
        fold = jnp.arange(k, dtype=jnp.int32)[None, :] <= prev_m  # (B, k)
        emitted = jnp.any(
            jax.nn.one_hot(prev_fed, V, dtype=bool) & fold[:, :, None],
            axis=1,
        )
        gen_mask = gen_mask | emitted

        # stamp this round's slot→position maps up front; invalid slots'
        # entries are never read
        steps = jnp.arange(k, dtype=jnp.int32)[None, :]
        kp = jax.lax.dynamic_update_slice(kp, pos_x1 + steps, (0, t))
        kp_d = jax.lax.dynamic_update_slice(
            kp_d,
            jnp.concatenate([pos_x1 - 1, pos_x1 + steps[:, : k - 1]], axis=1),
            (0, t_d),
        )

        # 1. draft catch-up: one forward for EVERY row (static shape);
        # valid_d[b, t_d] is False for rows that do not lag, making the
        # junk write inert
        _, d_kv = forward(
            d_params,
            draft_cfg,
            input_ids=catch_tok[:, None],
            positions=pos_x1 - 1,
            kv_cache=d_kv,
            cache_pos=t_d,
            rope=d_rope,
            attn_len=t_d + k,
            mask_positions=jnp.full((B, 1), 0, jnp.int32) + t_d,
            token_valid=valid_d,
            key_positions=kp_d,
        )

        # 2. k−1 chained draft proposals continuing each row's x1
        rows = jnp.arange(B)
        base_mask = gen_mask.at[rows, x1].set(True)

        def prop(carry, i):
            dk, prev, mask = carry
            logits, dk = forward(
                d_params,
                draft_cfg,
                input_ids=prev[:, None],
                positions=pos_x1 + i,
                kv_cache=dk,
                cache_pos=t_d + 1 + i,
                rope=d_rope,
                attn_len=t_d + k,
                mask_positions=jnp.full((B, 1), 0, jnp.int32) + t_d + 1 + i,
                token_valid=valid_d,
                key_positions=kp_d,
            )
            lg = logits[:, -1]
            pen = jnp.where(lg > 0, lg / rp, lg * rp)
            tok = jnp.argmax(jnp.where(mask, pen, lg), axis=-1).astype(
                jnp.int32
            )
            mask = mask.at[rows, tok].set(True)
            return (dk, tok, mask), tok

        (d_kv, _, _), props = jax.lax.scan(
            prop, (d_kv, x1, base_mask), jnp.arange(k - 1, dtype=jnp.int32)
        )
        props = props.T  # (B, k−1)

        # 3. target verify over all k speculative positions, all rows
        fed = jnp.concatenate([x1[:, None], props], axis=1)  # (B, k)
        v_logits, kv = forward(
            t_params,
            cfg,
            input_ids=fed,
            positions=pos_x1 + steps,
            kv_cache=kv,
            cache_pos=t,
            rope=rope,
            attn_len=t + k,
            mask_positions=jnp.broadcast_to(steps + t, (B, k)),
            token_valid=valid,
            key_positions=kp,
        )
        # 4. per-position greedy re-derivation: position i's penalty mask
        # assumes fed[0..i] were emitted — the only case its result is
        # consumed (see inference._greedy_verify)
        fed_mask = (
            jnp.cumsum(jax.nn.one_hot(fed, V, dtype=jnp.int32), axis=1) > 0
        )
        vmask = gen_mask[:, None, :] | fed_mask
        rp3 = rp[:, :, None]
        pen = jnp.where(v_logits > 0, v_logits / rp3, v_logits * rp3)
        y = jnp.argmax(jnp.where(vmask, pen, v_logits), axis=-1).astype(
            jnp.int32
        )  # (B, k)

        packed = jnp.concatenate([props, y], axis=1)  # (B, 2k−1)
        return packed, gen_mask, kv, d_kv, kp, kp_d

    return jax.jit(spec_round, donate_argnums=(2, 3, 6, 17, 18))


class ContinuousEngine:
    """A continuously-batched decode pool over an :class:`InferenceEngine`.

    Synchronous use (tests, scripts)::

        pool = ContinuousEngine(engine, slots=4, cache_len=1024)
        h1 = pool.submit("prompt A", max_new_tokens=32)
        h2 = pool.submit("prompt B", max_new_tokens=8)
        pool.run_until_idle()
        print(h1.result(), h2.result())

    Serving use: :meth:`start` spins the decode loop on a daemon thread;
    ``submit`` is then safe from any thread and handles resolve as rows
    finish. If the loop dies (device failure), every in-flight and queued
    handle resolves with the error and later submits raise.
    ``serve.ModelServer(..., continuous_slots=N)`` wires this under the
    HTTP endpoint.
    """

    def __init__(
        self,
        engine: InferenceEngine,
        slots: int = 4,
        cache_len: int = 2048,
        top_k: int = 40,
        greedy: bool = False,
        decode_chunk: int = 1,
        use_template: bool = True,
        system_prompt: Optional[str] = None,
        seed: int = 0,
        device_lock: Optional[threading.Lock] = None,
        prefill_chunk: Optional[int] = None,
    ):
        if slots < 1:
            raise ValueError("continuous batching needs at least one slot")
        self.spec = engine.draft_cfg is not None
        if self.spec and not greedy:
            raise ValueError(
                "the speculative pool verifies against target-greedy "
                "tokens; construct the pool with greedy=True (sampled "
                "requests bypass the pool anyway)"
            )
        if self.spec and decode_chunk != 1:
            raise ValueError(
                "speculative rounds amortize dispatches their own way "
                "(k tokens per round); decode_chunk must be 1"
            )
        self.engine = engine
        # admission prefill slice size (tokens): the bound on how long an
        # arriving prompt may stall active decode between two pool steps.
        # Capped at the engine's prompt_chunk so admission reuses the
        # stream path's compiled prefill shapes; floored at one prompt
        # bucket (the prefill shape granularity).
        from .inference import _PROMPT_BUCKET

        pc = engine.prompt_chunk if prefill_chunk is None else int(prefill_chunk)
        pc = min(max(pc, _PROMPT_BUCKET), engine.prompt_chunk)
        self.prefill_chunk = -(-pc // _PROMPT_BUCKET) * _PROMPT_BUCKET
        self.cfg = engine.cfg
        self.B = int(slots)
        self.S = max(1, int(decode_chunk))
        self.cache_len = -(-int(cache_len) // _CACHE_BUCKET) * _CACHE_BUCKET
        self.top_k = int(top_k)
        self.greedy = bool(greedy)
        self.use_template = use_template
        self.system_prompt = system_prompt
        self._device_lock = device_lock

        self._rope = rope_tables(self.cfg, self.cache_len)
        self._kv = engine._init_kv(self.B, self.cache_len)
        V = self.cfg.vocab_size
        self._last = jnp.zeros((self.B, V), jnp.float32)
        self._gen_mask = jnp.zeros((self.B, V), bool)
        self._kp = jnp.zeros((self.B, self.cache_len), jnp.int32)
        self._prng = jax.random.PRNGKey(seed)
        self._eos = engine._eos_ids()

        # host-side pool state; `_valid` uploads only when it changed
        # (admit / jump / compact / finish), not per dispatch
        self._t = 0  # global frontier: next slot every row writes
        self._valid = np.zeros((self.B, self.cache_len), bool)
        self._valid_dev = jnp.asarray(self._valid)
        self._valid_dirty = False
        self._pad = np.zeros(self.B, np.int32)
        self._temp = np.full(self.B, 1.0, np.float32)
        self._top_p = np.ones(self.B, np.float32)
        self._rep = np.ones(self.B, np.float32)
        self._rows: List[Optional[Completion]] = [None] * self.B
        self._pos_next = np.zeros(self.B, np.int64)  # next seq position
        self._budget_left = np.zeros(self.B, np.int64)

        # speculative pool state: a pooled draft cache mirrors the target
        # pool's slot discipline with its own frontier / validity / slot→
        # position map, plus per-row pending-token bookkeeping
        if self.spec:
            self.k = engine.speculation_k
            d_embed = engine.draft_params["embed_tokens"]
            d_dtype = (
                jnp.bfloat16 if isinstance(d_embed, dict) else d_embed.dtype
            )
            self._d_kv = init_kv_cache(
                engine.draft_cfg, self.B, self.cache_len, d_dtype
            )
            self._d_rope = rope_tables(engine.draft_cfg, self.cache_len)
            self._kp_d = jnp.zeros((self.B, self.cache_len), jnp.int32)
            self._valid_d = np.zeros((self.B, self.cache_len), bool)
            self._valid_d_dev = jnp.asarray(self._valid_d)
            self._valid_d_dirty = False
            self._t_d = 0  # draft frontier
            self._x1 = np.zeros(self.B, np.int64)  # pending tokens
            self._pos_x1 = np.ones(self.B, np.int64)  # their positions
            self._catch_tok = np.zeros(self.B, np.int64)
            self._lag = np.zeros(self.B, bool)
            self._prev_fed = np.zeros((self.B, self.k), np.int32)
            self._prev_m = np.full(self.B, -1, np.int32)
            self._spec_round_fn = engine._weight_trace(
                _make_pool_spec_round(
                    self.cfg, engine.draft_cfg, self.B, self.k
                )
            )

        # the lock guards ONLY the queue and lifecycle flags; pool/device
        # state belongs to the single driving thread
        self._queue: deque = deque()
        self._lock = threading.Condition()
        self._thread: Optional[threading.Thread] = None
        self._stopping = False
        self._dead: Optional[Exception] = None
        # the one in-flight chunked admission (driver-thread-owned)
        self._admitting: Optional[_Admission] = None
        # observability: dispatch/compaction counters for benches and tests
        self.stats = {
            "decode_dispatches": 0,
            "compactions": 0,
            "frontier_jumps": 0,
            "joins": 0,
            "tokens_out": 0,
            "admission_chunks": 0,  # prefill slices run between pool steps
            "admission_chunk_ms_max": 0.0,  # worst single-slice stall
        }
        if self.spec:
            self.stats["spec_rounds"] = 0
            self.stats["spec_accepted"] = 0  # draft tokens target-approved
        # latency accumulators for production observability (bounded so a
        # long-lived pool never grows them): per-request TTFT (submit →
        # first token), TPOT (mean inter-token time after the first),
        # queue wait (submit → join), and per-admission-slice stalls
        self._ttft_ms: deque = deque(maxlen=1024)
        self._tpot_ms: deque = deque(maxlen=1024)
        self._wait_ms: deque = deque(maxlen=1024)
        self._admission_ms: deque = deque(maxlen=1024)

    def _dev(self):
        return self._device_lock or contextlib.nullcontext()

    # -- submission ---------------------------------------------------------

    def _encode(
        self,
        prompt: str,
        use_template: Optional[bool],
        system_prompt=None,
        previous_messages=None,
    ) -> List[int]:
        return self.engine._encode(
            prompt,
            self.use_template if use_template is None else use_template,
            system_prompt if system_prompt is not None else self.system_prompt,
            previous_messages,
        )

    def _budget(self, max_new_tokens: int) -> int:
        return -(-max_new_tokens // self.S) * self.S

    def _capacity_need(self, n_ids: int, max_new_tokens: int) -> int:
        """Cache slots a request may consume before compaction reclaims
        it to its live length: prompt + decode budget (decode pool) or
        prompt + budget + k verify headroom (speculative pool, whose
        rounds always write k slots past the live frontier)."""
        if self.spec:
            return n_ids + max_new_tokens + self.k
        return n_ids + self._budget(max_new_tokens)

    def fits(
        self,
        prompt: str,
        max_new_tokens: int,
        use_template: Optional[bool] = None,
        system_prompt=None,
        previous_messages=None,
    ) -> bool:
        """Host-side capacity precheck: would :meth:`submit` accept this?

        Callers batching several prompts should check ALL of them before
        submitting ANY — a mid-batch rejection would otherwise strand the
        already-submitted ones decoding results nobody reads."""
        ids = self._encode(
            prompt, use_template, system_prompt, previous_messages
        )
        return 0 < self._capacity_need(len(ids), max_new_tokens) <= self.cache_len

    def submit(
        self,
        prompt: str,
        max_new_tokens: int = 128,
        temperature: float = 0.7,
        top_p: float = 0.95,
        repetition_penalty: float = 1.1,
        use_template: Optional[bool] = None,
        system_prompt=None,
        previous_messages=None,
        stop: Optional[List[str]] = None,
    ) -> Completion:
        ids = self._encode(
            prompt, use_template, system_prompt, previous_messages
        )
        if not ids:
            raise ValueError("empty prompt after encoding")
        if self._capacity_need(len(ids), max_new_tokens) > self.cache_len:
            raise ValueError(
                f"prompt ({len(ids)} tokens) + budget exceeds the pool "
                f"cache ({self.cache_len}); raise cache_len or shorten"
            )
        handle = Completion(
            prompt=prompt,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            stop=list(stop) if stop else None,
        )
        handle._input_ids = ids  # type: ignore[attr-defined]
        handle.submitted_at = time.monotonic()
        with self._lock:
            if self._dead is not None:
                raise RuntimeError(
                    "continuous pool is dead"
                ) from self._dead
            if self._stopping:
                raise RuntimeError("continuous pool is stopped")
            self._queue.append(handle)
            self._lock.notify()
        return handle

    # -- scheduling ---------------------------------------------------------

    def _free_slot(self) -> Optional[int]:
        for b, row in enumerate(self._rows):
            if row is None:
                return b
        return None

    def _live_index(self, valid: np.ndarray, t: int):
        """Per-row gather indices packing live slots to the front."""
        idx = np.zeros((self.B, self.cache_len), np.int32)
        live_len = np.zeros(self.B, np.int64)
        new_t = 0
        for b in range(self.B):
            if self._rows[b] is None:
                continue
            live = np.nonzero(valid[b, :t])[0]
            idx[b, : len(live)] = live
            live_len[b] = len(live)
            new_t = max(new_t, len(live))
        return idx, live_len, new_t

    def _compact(self):
        """Drop dead slots from every row; rebase the frontier."""
        idx, live_len, new_t = self._live_index(self._valid, self._t)
        self._kv, self._kp = _compact_pool(
            self._kv, self._kp, jnp.asarray(idx)
        )
        self._t = new_t
        self._valid[:] = False
        for b in range(self.B):
            if self._rows[b] is None:
                continue
            n = int(live_len[b])
            self._valid[b, :n] = True
            self._valid[b, new_t :] = True  # future decode slots
            # the row's next token continues its sequence at the new frontier
            self._pad[b] = new_t - self._pos_next[b]
        self._valid_dirty = True
        self.stats["compactions"] += 1

    def _compact_draft(self):
        """Spec mode: compact the pooled draft cache (same discipline)."""
        idx, live_len, new_t = self._live_index(self._valid_d, self._t_d)
        self._d_kv, self._kp_d = _compact_pool(
            self._d_kv, self._kp_d, jnp.asarray(idx)
        )
        self._t_d = new_t
        self._valid_d[:] = False
        for b in range(self.B):
            if self._rows[b] is None:
                continue
            self._valid_d[b, : int(live_len[b])] = True
            self._valid_d[b, new_t:] = True
        self._valid_d_dirty = True
        self.stats["compactions"] += 1

    def _jump_frontier(self, to: int):
        """Advance the global frontier; other rows mask the skipped span."""
        jump = to - self._t
        assert jump > 0
        for b in range(self.B):
            if self._rows[b] is not None:
                self._valid[b, self._t : to] = False
                self._pad[b] += jump
        self._t = to
        self._valid_dirty = True
        self.stats["frontier_jumps"] += 1

    def _jump_frontier_d(self, to: int):
        """Spec mode: advance the draft frontier past a joining prompt."""
        assert to > self._t_d
        for b in range(self.B):
            if self._rows[b] is not None:
                self._valid_d[b, self._t_d : to] = False
        self._t_d = to
        self._valid_d_dirty = True
        self.stats["frontier_jumps"] += 1

    def _begin_admission(self, handle: Completion) -> None:
        """Open the off-pool batch-1 prefill for the next queued request."""
        engine = self.engine
        ids = handle._input_ids  # type: ignore[attr-defined]
        Lp = len(ids)
        pcache = min(
            -(-Lp // _CACHE_BUCKET) * _CACHE_BUCKET, self.cache_len
        )
        pids, ppos = engine._pad_prompt(ids, pcache)
        d_kv1 = None
        d_hit = 0
        with self._dev():
            kv1 = engine._init_kv(1, pcache)
            hit = 0
            if engine.prefix_cache_slots > 0:
                hit, kv1 = engine._prefix_lookup(ids, Lp, kv1)
            if self.spec:
                d_embed = engine.draft_params["embed_tokens"]
                d_dtype = (
                    jnp.bfloat16
                    if isinstance(d_embed, dict)
                    else d_embed.dtype
                )
                d_kv1 = init_kv_cache(engine.draft_cfg, 1, pcache, d_dtype)
                if engine.prefix_cache_slots > 0:
                    d_hit, d_kv1 = engine._prefix_lookup(
                        ids, Lp, d_kv1, "d"
                    )
        self._admitting = _Admission(
            handle=handle,
            ids=ids,
            Lp=Lp,
            budget=self._budget(handle.max_new_tokens),
            pids=pids,
            ppos=ppos,
            kv1=kv1,
            next_c0=hit,
            d_kv1=d_kv1,
            d_next_c0=d_hit,
        )

    def _advance_admission(self) -> None:
        """Run ONE prefill slice of the in-flight admission.

        Mirrors engine._chunked_prefill's loop body (same shapes when
        prefill_chunk == engine.prompt_chunk, so the compiled programs are
        shared with the stream path) but returns to the caller after a
        single slice — the pool interleaves slices with decode steps.
        Forces completion of the slice's device work before returning so
        the recorded stall is the real one, and so a decode step
        dispatched next never queues behind a multi-slice prefill."""
        adm = self._admitting
        engine = self.engine
        L = adm.pids.shape[1]
        target_done = adm.next_c0 >= L
        t0 = time.monotonic()
        if not target_done:
            c0 = adm.next_c0
            c1 = min(c0 + self.prefill_chunk, L)
            keep = adm.Lp - 1
            with self._dev():
                logits, adm.kv1 = engine._decode_step(
                    engine.params,
                    input_ids=adm.pids[:, c0:c1],
                    positions=adm.ppos[:, c0:c1],
                    kv_cache=adm.kv1,
                    cache_pos=c0,
                    rope=self._rope,
                    attn_len=min(c1, adm.Lp),
                )
                if c0 <= keep < c1:
                    adm.row_logits = logits[:, keep - c0, :]
                    jax.block_until_ready(adm.row_logits)
                else:
                    jax.block_until_ready(logits)
            adm.next_c0 = c1
            target_done = c1 >= L
            if target_done and engine.prefix_cache_slots > 0:
                with self._dev():
                    engine._prefix_store(adm.ids, adm.Lp, adm.kv1)
        else:
            # spec mode: the draft's prefill runs in its own slices after
            # the target's (one model's slice per call keeps the bound)
            c0 = adm.d_next_c0
            c1 = min(c0 + self.prefill_chunk, L)
            with self._dev():
                logits, adm.d_kv1 = engine._draft_decode(
                    engine.draft_params,
                    input_ids=adm.pids[:, c0:c1],
                    positions=adm.ppos[:, c0:c1],
                    kv_cache=adm.d_kv1,
                    cache_pos=c0,
                    rope=self._d_rope,
                    attn_len=min(c1, adm.Lp),
                )
                jax.block_until_ready(logits)
            adm.d_next_c0 = c1
            if c1 >= L and engine.prefix_cache_slots > 0:
                with self._dev():
                    engine._prefix_store(adm.ids, adm.Lp, adm.d_kv1, "d")
        ms = (time.monotonic() - t0) * 1e3
        self.stats["admission_chunks"] += 1
        self._admission_ms.append(ms)
        if ms > self.stats["admission_chunk_ms_max"]:
            self.stats["admission_chunk_ms_max"] = round(ms, 3)
        if target_done and (not self.spec or adm.d_next_c0 >= L):
            adm.complete = True

    def _try_implant(self) -> bool:
        """Install the completed admission into a free row; False when the
        pool has no slot or no cache capacity yet (retried after steps)."""
        adm = self._admitting
        b = self._free_slot()
        if b is None:
            return False
        Lp, budget = adm.Lp, adm.budget
        # headroom this join must find NOW: the decode budget (decode
        # pool) or one verify block (spec pool, which compacts as rounds
        # exhaust the cache)
        head = self.k if self.spec else budget
        t_join = max(self._t, Lp)
        if t_join + head > self.cache_len:
            with self._dev():
                self._compact()
            t_join = max(self._t, Lp)
            if t_join + head > self.cache_len:
                return False  # genuinely full: wait for a row to finish
        if self.spec:
            td_join = max(self._t_d, Lp)
            if td_join + self.k > self.cache_len:
                with self._dev():
                    self._compact_draft()
                td_join = max(self._t_d, Lp)
                if td_join + self.k > self.cache_len:
                    return False
        if t_join > self._t:
            self._jump_frontier(t_join)
        if self.spec and td_join > self._t_d:
            self._jump_frontier_d(td_join)

        handle = adm.handle
        with self._dev():
            self._kv, self._last, self._gen_mask, self._kp = _implant_row(
                self._kv,
                adm.kv1,
                self._last,
                adm.row_logits,
                self._gen_mask,
                self._kp,
                jnp.int32(b),
            )
            if self.spec:
                self._d_kv, self._kp_d = _implant_draft_row(
                    self._d_kv, adm.d_kv1, self._kp_d, jnp.int32(b)
                )
        self._rows[b] = handle
        self._valid[b, :] = True
        self._valid[b, Lp : self._t] = False  # the join gap
        self._valid_dirty = True
        self._pad[b] = self._t - Lp
        self._pos_next[b] = Lp
        self._budget_left[b] = budget
        self._temp[b] = handle.temperature
        self._top_p[b] = handle.top_p
        self._rep[b] = handle.repetition_penalty
        handle.token_ids = []
        handle.joined_at = time.monotonic()
        self.stats["joins"] += 1
        self._admitting = None
        if self.spec:
            self._valid_d[b, :] = True
            self._valid_d[b, Lp : self._t_d] = False
            self._valid_d_dirty = True
            self._prev_m[b] = -1
            self._lag[b] = False
            self._catch_tok[b] = 0
            self._pos_x1[b] = Lp
            # the first pending token: target-greedy over the prompt
            # logits (empty penalty history — a plain argmax, matching
            # the solo spec path's x1 seed)
            x1 = int(jnp.argmax(adm.row_logits))
            self._x1[b] = x1
            handle.first_token_at = time.monotonic()
            if x1 in self._eos:
                self._finish(b, "stop")
            else:
                handle.token_ids.append(x1)
                if handle.stop and self._check_stop(b, handle):
                    pass
                elif len(handle.token_ids) >= handle.max_new_tokens:
                    self._finish(b, "length")
        return True

    def _finish(self, b: int, reason: str):
        handle = self._rows[b]
        self._rows[b] = None
        self._valid[b, :] = False
        self._valid_dirty = True
        if self.spec:
            self._valid_d[b, :] = False
            self._valid_d_dirty = True
            self._prev_m[b] = -1
            self._x1[b] = 0
            self._catch_tok[b] = 0
            self._lag[b] = False
            self._pos_x1[b] = 1  # keep catch-up positions non-negative
        handle.finish_reason = reason
        handle.text = self.engine.tokenizer.decode(
            handle.token_ids, skip_special_tokens=True
        )
        if handle._stop_cut is not None:
            handle.text = handle.text[: handle._stop_cut]
        self.stats["tokens_out"] += len(handle.token_ids)
        handle.finished_at = time.monotonic()
        # latency accounting (bounded deques; see metrics())
        if handle.submitted_at is not None:
            if handle.joined_at is not None:
                self._wait_ms.append(
                    (handle.joined_at - handle.submitted_at) * 1e3
                )
            ft = handle.first_token_at or handle.finished_at
            self._ttft_ms.append((ft - handle.submitted_at) * 1e3)
            n = len(handle.token_ids)
            if n > 1 and handle.first_token_at is not None:
                self._tpot_ms.append(
                    (handle.finished_at - handle.first_token_at)
                    / (n - 1)
                    * 1e3
                )
        handle._done.set()

    # -- decode -------------------------------------------------------------

    def _step(self):
        """One fused dispatch: every row advances S slots (decode pool)
        or one speculative round of up to k tokens (spec pool)."""
        if self.spec:
            return self._step_spec()
        t, S = self._t, self.S
        if t + S > self.cache_len:
            with self._dev():
                self._compact()
            t = self._t
            if t + S > self.cache_len:  # cannot happen within budgets
                raise RuntimeError("pool cache exhausted beyond compaction")
        if self._valid_dirty:
            self._valid_dev = jnp.asarray(self._valid)
            self._valid_dirty = False

        with self._dev():
            (
                toks,
                self._last,
                self._gen_mask,
                self._prng,
                self._kv,
                self._kp,
            ) = self.engine._chunk_step(S)(
                self.engine.params,
                self._last,
                self._gen_mask,
                self._prng,
                self._kv,
                self._rope,
                t,
                jnp.asarray(self._pad[:, None]),
                jnp.asarray(self._temp[:, None]),
                jnp.asarray(self._top_p[:, None]),
                jnp.asarray(self._rep[:, None]),
                self._valid_dev,
                self._kp,
                top_k=self.top_k,
                greedy=self.greedy,
            )
            toks = np.asarray(toks)  # (S, B) — the per-dispatch fetch
        self._t = t + S
        self.stats["decode_dispatches"] += 1
        now = time.monotonic()
        active = [b for b in range(self.B) if self._rows[b] is not None]
        self._pos_next[active] += S
        self._budget_left[active] -= S
        for b in active:
            handle = self._rows[b]
            if handle.first_token_at is None:
                handle.first_token_at = now
            for s in range(S):
                if len(handle.token_ids) >= handle.max_new_tokens:
                    break
                tid = int(toks[s, b])
                if tid in self._eos:
                    self._finish(b, "stop")
                    break
                handle.token_ids.append(tid)
                if handle.stop and self._check_stop(b, handle):
                    break
            if self._rows[b] is not None and (
                len(handle.token_ids) >= handle.max_new_tokens
                or self._budget_left[b] <= 0
            ):
                self._finish(b, "length")

    def _check_stop(self, b: int, handle: Completion) -> bool:
        """OpenAI stop sequences: finish the row at the earliest
        occurrence in its decoded text (the stop text is trimmed by
        _finish). Only called for rows that configured stops."""
        from .inference import _find_stop

        text = self.engine.tokenizer.decode(
            handle.token_ids, skip_special_tokens=True
        )
        cut = _find_stop(text, handle.stop)
        if cut is None:
            return False
        handle._stop_cut = cut
        self._finish(b, "stop")
        return True

    def _step_spec(self):
        """One pooled speculative round: every live row advances by its
        own accepted prefix (1..k tokens); both caches burn k slots at
        the shared frontiers and rejected slots go invalid."""
        k = self.k
        if self._t + k > self.cache_len:
            with self._dev():
                self._compact()
        if self._t_d + k > self.cache_len:
            with self._dev():
                self._compact_draft()
        if self._t + k > self.cache_len or self._t_d + k > self.cache_len:
            raise RuntimeError("pool cache exhausted beyond compaction")
        t, t_d = self._t, self._t_d
        # the catch-up slot is live only for rows whose whole proposal
        # block was accepted last round
        for b in range(self.B):
            if self._rows[b] is not None:
                self._valid_d[b, t_d] = bool(self._lag[b])
        self._valid_d_dirty = True
        if self._valid_dirty:
            self._valid_dev = jnp.asarray(self._valid)
            self._valid_dirty = False
        if self._valid_d_dirty:
            self._valid_d_dev = jnp.asarray(self._valid_d)
            self._valid_d_dirty = False

        engine = self.engine
        with self._dev():
            (
                packed,
                self._gen_mask,
                self._kv,
                self._d_kv,
                self._kp,
                self._kp_d,
            ) = self._spec_round_fn(
                engine.params,
                engine.draft_params,
                self._kv,
                self._d_kv,
                self._rope,
                self._d_rope,
                self._gen_mask,
                jnp.asarray(self._prev_fed),
                jnp.asarray(self._prev_m[:, None]),
                jnp.asarray(self._x1.astype(np.int32)),
                jnp.asarray(self._catch_tok.astype(np.int32)),
                jnp.asarray(self._pos_x1[:, None].astype(np.int32)),
                jnp.asarray(self._rep[:, None]),
                jnp.int32(t),
                jnp.int32(t_d),
                self._valid_dev,
                self._valid_d_dev,
                self._kp,
                self._kp_d,
            )
            arr = np.asarray(packed)  # (B, 2k−1) — the per-round fetch
        self._t = t + k
        self._t_d = t_d + k
        self.stats["decode_dispatches"] += 1
        self.stats["spec_rounds"] += 1

        for b in range(self.B):
            row = self._rows[b]
            if row is None:
                self._prev_m[b] = -1
                continue
            props = arr[b, : k - 1]
            y = arr[b, k - 1 :]
            fed = [int(self._x1[b])] + [int(v) for v in props]
            m = 0
            while m < k - 1 and int(y[m]) == fed[m + 1]:
                m += 1
            self.stats["spec_accepted"] += m
            # target slots [t, t+m] hold x1 + accepted drafts; the rest
            # of the block was rejected speculation
            self._valid[b, t + m + 1 : t + k] = False
            # draft: slots t_d+1+i consumed [x1, d1..d_{k-2}][i] — live
            # up through the accepted prefix; the catch-up slot keeps the
            # validity set before the round
            self._valid_d[b, t_d + 2 + min(m, k - 2) : t_d + k] = False
            # emit: accepted drafts, then the new pending (target argmax
            # at the first mismatch) — the solo path's emission order
            finished = False
            for tok in fed[1 : m + 1] + [int(y[m])]:
                if tok in self._eos:
                    self._finish(b, "stop")
                    finished = True
                    break
                row.token_ids.append(tok)
                if row.stop and self._check_stop(b, row):
                    finished = True
                    break
                if len(row.token_ids) >= row.max_new_tokens:
                    self._finish(b, "length")
                    finished = True
                    break
            if finished:
                continue
            self._x1[b] = int(y[m])
            self._pos_x1[b] += m + 1
            self._pos_next[b] = self._pos_x1[b]
            full = m == k - 1
            self._lag[b] = full
            self._catch_tok[b] = int(props[k - 2]) if full else 0
            self._prev_fed[b] = np.asarray(fed, np.int32)
            self._prev_m[b] = m
        self._valid_dirty = True
        self._valid_d_dirty = True

    def metrics(self) -> dict:
        """Latency summaries (ms) over the recent-request window: TTFT,
        TPOT, queue wait, and per-admission-slice stall percentiles."""

        def summary(d):
            if not d:
                return None
            v = sorted(d)
            n = len(v)
            return {
                "n": n,
                "p50": round(v[n // 2], 2),
                "p95": round(v[min(n - 1, int(n * 0.95))], 2),
                "max": round(v[-1], 2),
            }

        out = {}
        for name, d in (
            ("ttft_ms", self._ttft_ms),
            ("tpot_ms", self._tpot_ms),
            ("queue_wait_ms", self._wait_ms),
            ("admission_chunk_ms", self._admission_ms),
        ):
            s = summary(d)
            if s is not None:
                out[name] = s
        return out

    # -- driving ------------------------------------------------------------

    def _active(self) -> bool:
        return any(r is not None for r in self._rows)

    def _admit_pending(self):
        """Advance admission work between pool steps.

        While any row is actively decoding, at most ONE prefill slice runs
        per call — the bounded-stall contract: an arriving prompt costs the
        running streams one chunk-step between two pool dispatches, never
        its whole prefill. With the pool idle, admissions drain at full
        speed. Queue pops are the only locked operations; prefill/implant
        device work runs unlocked (pool state is driver-thread-owned)."""
        sliced = False  # one prefill slice per call while rows decode
        while True:
            if self._admitting is None:
                with self._lock:
                    if not self._queue:
                        return
                    handle = self._queue.popleft()  # driver thread only
                try:
                    self._begin_admission(handle)
                except Exception as exc:  # surface encode/cache errors
                    handle.error = exc
                    handle._done.set()
                    continue
            adm = self._admitting
            try:
                while not adm.complete:
                    if sliced and self._active():
                        return  # bounded stall: resume after the next step
                    self._advance_admission()
                    sliced = True
                if not self._try_implant():
                    return  # no slot/capacity yet; retry after steps
            except Exception as exc:  # surface prefill errors to the caller
                self._admitting = None
                adm.handle.error = exc
                adm.handle._done.set()

    def run_until_idle(self):
        """Drive the pool synchronously until queue and rows are empty.

        For single-threaded use; do not mix with :meth:`start`."""
        while True:
            self._admit_pending()
            if not self._active():
                with self._lock:
                    if not self._queue and self._admitting is None:
                        return
                # a request that cannot finish admission with every slot
                # free would mean submit()'s capacity check is broken
                raise RuntimeError("queued request cannot be admitted")
            self._step()

    def _fail_all(self, exc: Exception):
        with self._lock:
            pending = list(self._queue)
            self._queue.clear()
        adm, self._admitting = self._admitting, None
        if adm is not None:
            adm.handle.error = exc
            adm.handle._done.set()
        for b in range(self.B):
            if self._rows[b] is not None:
                handle = self._rows[b]
                self._rows[b] = None
                self._valid[b, :] = False
                handle.error = exc
                handle._done.set()
        self._valid_dirty = True
        for handle in pending:
            handle.error = exc
            handle._done.set()

    def _serve_loop(self):
        try:
            while True:
                with self._lock:
                    if self._stopping:
                        break
                    if (
                        not self._queue
                        and not self._active()
                        and self._admitting is None
                    ):
                        self._lock.wait(timeout=0.1)
                        continue
                self._admit_pending()
                if self._active():
                    self._step()
        except Exception as exc:
            # a dying decode loop must not strand waiters on their timeout:
            # resolve every handle with the error and poison future submits
            logger.exception("continuous pool decode loop died")
            with self._lock:
                self._dead = exc
            self._fail_all(exc)

    def start(self):
        if self._thread is not None:
            return
        self._stopping = False
        self._thread = threading.Thread(target=self._serve_loop, daemon=True)
        self._thread.start()

    def stop(self):
        if self._thread is None:
            return
        with self._lock:
            self._stopping = True
            self._lock.notify()
        self._thread.join(timeout=120)
        self._thread = None
        # whatever the loop did not finish resolves as an error, matching
        # DynamicBatcher's drain semantics — never leave a waiter hanging
        self._fail_all(RuntimeError("continuous pool stopped"))
