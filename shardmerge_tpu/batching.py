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
from .models.llama import rope_tables

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
    _done: threading.Event = field(default_factory=threading.Event)
    token_ids: List[int] = field(default_factory=list)
    text: Optional[str] = None
    finish_reason: Optional[str] = None
    error: Optional[Exception] = None
    # serving metrics (time.monotonic): set at submit / join / finish
    submitted_at: Optional[float] = None
    joined_at: Optional[float] = None
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
        if engine.draft_cfg is not None:
            raise ValueError(
                "speculative decoding drives its own dispatch cadence; "
                "use it on the stream path, not the continuous pool"
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
        return 0 < len(ids) + self._budget(max_new_tokens) <= self.cache_len

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
    ) -> Completion:
        ids = self._encode(
            prompt, use_template, system_prompt, previous_messages
        )
        if not ids:
            raise ValueError("empty prompt after encoding")
        if len(ids) + self._budget(max_new_tokens) > self.cache_len:
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

    def _compact(self):
        """Drop dead slots from every row; rebase the frontier."""
        idx = np.zeros((self.B, self.cache_len), np.int32)
        live_len = np.zeros(self.B, np.int64)
        new_t = 0
        for b in range(self.B):
            if self._rows[b] is None:
                continue
            live = np.nonzero(self._valid[b, : self._t])[0]
            idx[b, : len(live)] = live
            live_len[b] = len(live)
            new_t = max(new_t, len(live))
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

    def _begin_admission(self, handle: Completion) -> None:
        """Open the off-pool batch-1 prefill for the next queued request."""
        engine = self.engine
        ids = handle._input_ids  # type: ignore[attr-defined]
        Lp = len(ids)
        pcache = min(
            -(-Lp // _CACHE_BUCKET) * _CACHE_BUCKET, self.cache_len
        )
        pids, ppos = engine._pad_prompt(ids, pcache)
        with self._dev():
            kv1 = engine._init_kv(1, pcache)
            hit = 0
            if engine.prefix_cache_slots > 0:
                hit, kv1 = engine._prefix_lookup(ids, Lp, kv1)
        self._admitting = _Admission(
            handle=handle,
            ids=ids,
            Lp=Lp,
            budget=self._budget(handle.max_new_tokens),
            pids=pids,
            ppos=ppos,
            kv1=kv1,
            next_c0=hit,
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
        c0 = adm.next_c0
        c1 = min(c0 + self.prefill_chunk, L)
        keep = adm.Lp - 1
        t0 = time.monotonic()
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
        ms = (time.monotonic() - t0) * 1e3
        self.stats["admission_chunks"] += 1
        if ms > self.stats["admission_chunk_ms_max"]:
            self.stats["admission_chunk_ms_max"] = round(ms, 3)
        adm.next_c0 = c1
        if c1 >= L:
            adm.complete = True
            if engine.prefix_cache_slots > 0:
                with self._dev():
                    engine._prefix_store(adm.ids, adm.Lp, adm.kv1)

    def _try_implant(self) -> bool:
        """Install the completed admission into a free row; False when the
        pool has no slot or no cache capacity yet (retried after steps)."""
        adm = self._admitting
        b = self._free_slot()
        if b is None:
            return False
        Lp, budget = adm.Lp, adm.budget
        t_join = max(self._t, Lp)
        if t_join + budget > self.cache_len:
            with self._dev():
                self._compact()
            t_join = max(self._t, Lp)
            if t_join + budget > self.cache_len:
                return False  # genuinely full: wait for a row to finish
        if t_join > self._t:
            self._jump_frontier(t_join)

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
        return True

    def _finish(self, b: int, reason: str):
        handle = self._rows[b]
        self._rows[b] = None
        self._valid[b, :] = False
        self._valid_dirty = True
        handle.finish_reason = reason
        handle.text = self.engine.tokenizer.decode(
            handle.token_ids, skip_special_tokens=True
        )
        self.stats["tokens_out"] += len(handle.token_ids)
        handle.finished_at = time.monotonic()
        handle._done.set()

    # -- decode -------------------------------------------------------------

    def _step(self):
        """One fused dispatch: every row advances S slots."""
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
        active = [b for b in range(self.B) if self._rows[b] is not None]
        self._pos_next[active] += S
        self._budget_left[active] -= S
        for b in active:
            handle = self._rows[b]
            for s in range(S):
                if len(handle.token_ids) >= handle.max_new_tokens:
                    break
                tid = int(toks[s, b])
                if tid in self._eos:
                    self._finish(b, "stop")
                    break
                handle.token_ids.append(tid)
            if self._rows[b] is not None and (
                len(handle.token_ids) >= handle.max_new_tokens
                or self._budget_left[b] <= 0
            ):
                self._finish(b, "length")

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
