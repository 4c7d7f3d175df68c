"""Continuous-batching decode scheduler (slot-based).

New capability vs the reference, whose only batching is a static batch of
identical prompts through HF generate (mem_spd_test.py:66-78; SURVEY.md §2.6).
Design:

  * a fixed pool of B slots; the KV cache is preallocated for B sequences;
  * per-request prefill runs on a batch-1 jitted program and the resulting
    layer caches are inserted into the slot (impl.insert_slot) — no
    recompilation per request thanks to prompt bucketing;
  * one jitted decode step advances every active slot (inactive slots are
    masked); finished sequences free their slot for the next request;
  * per-slot positions: attention masks, cache writes, the
    prune-on-window-exit rule, and (compressed mode) per-slot chunk counts
    plus vectorized chunk compaction all handle slots at different lengths;
  * with ``chunked_prefill`` the admission itself is INTERLEAVED: each engine
    tick advances the admitting prompt by ONE chunk-sized segment (a batch-1
    program over the admission sub-cache) and then runs the regular decode
    step, so active slots keep emitting tokens underneath a 32k admission
    instead of stalling for its whole prefill.  Token streams are exactly
    those of the blocking path (the segment programs are the same; decode
    slots are independent of the admission sub-cache until insert_slot);
  * decode token choice is pluggable ``SamplingParams`` (temperature /
    top-k / top-p, runtime/generate.py) — greedy by default, matching the
    reference.

Supports dense, masked (token policies), and compressed cache modes, on a
single device or over a dp x tp ``jax.sharding.Mesh`` (slots shard over
"data", heads over "model"; per-request batch-1 prefills run mesh-less and
insert into the sharded slot cache — tests/test_scheduler_sharded.py).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.cache import make_cache
from mustafar_tpu.config import CacheMode, EngineConfig
from mustafar_tpu.models import llama
from mustafar_tpu.runtime.generate import GREEDY, SamplingParams, _sample


@dataclasses.dataclass
class Request:
    uid: int
    tokens: np.ndarray           # prompt token ids [T]
    max_new_tokens: int
    out: list = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass
class _Admission:
    """A request whose chunked prefill is streaming into a reserved slot."""
    req: Request
    slot: int
    toks: np.ndarray             # [1, Tpad] padded prompt
    true_len: int
    n_seg: int
    s: int = 0                   # next segment index
    sub: object = None           # batch-1 cache being filled
    logits: object = None        # last segment's logits [1, 1, V]


class ContinuousBatchingEngine:
    """FCFS slot scheduler over a jitted batched decode step."""

    def __init__(self, engine: EngineConfig, params, dtype=jnp.bfloat16,
                 eos_id: Optional[int] = None, use_native: bool = True,
                 mesh=None, sampling: SamplingParams = GREEDY,
                 interleave: bool = True):
        self.engine = engine
        self.cfg = engine.model
        self.params = params
        self.dtype = dtype
        self.eos_id = eos_id
        self.sampling = sampling
        # interleaved admission needs segment-streamed prefill state
        self.interleave = bool(interleave and engine.chunked_prefill)
        self.B = engine.batch_size
        self.impl = make_cache(engine)
        # per-request prefill runs batch-1 (not dp-shardable); it uses a
        # mesh-less impl (pure GSPMD, no shard_map) and inserts into the
        # sharded slot cache, while the batched decode/compact steps run the
        # mesh impl (head-local shard_map kernels in compressed mode)
        self.mesh = mesh
        self.prefill_impl = self.impl
        if mesh is not None:
            from mustafar_tpu.parallel import sharding as sh
            dp = mesh.shape.get("data", 1)
            assert self.B % dp == 0, (self.B, dict(mesh.shape))
            self.impl.mesh = mesh
            self.prefill_impl = make_cache(engine)
            pspecs = sh.filter_specs_for(params, sh.param_specs(self.cfg))
            self.params = sh.shard_pytree(params, pspecs, mesh)
            cache = self.impl.init(self.B, dtype)
            self.cache = sh.shard_pytree(cache, sh.cache_specs(engine, cache),
                                         mesh)
        else:
            self.cache = self.impl.init(self.B, dtype)
        # host-side slot state (bookkeeping mirrored in the native C++ core
        # when available — mustafar_tpu/native/scheduler.cpp)
        self.native = None
        if use_native:
            try:
                from mustafar_tpu.native import NativeSlotScheduler
                self.native = NativeSlotScheduler(self.B, engine.max_seq_len)
            except Exception:
                self.native = None
        self.slot_req: list[Optional[Request]] = [None] * self.B
        self.slot_pos = np.zeros(self.B, np.int32)      # next write index
        self.slot_budget = np.zeros(self.B, np.int32)
        self.slot_last = np.zeros(self.B, np.int32)
        self.queue: deque[Request] = deque()
        self.requests: dict[int, Request] = {}
        self.finished: dict[int, Request] = {}
        self._admissions: deque[_Admission] = deque()
        self._prefill_fns = {}
        self._decode_fn = None
        self._compact_fn = None
        self._seg_fn = None
        self._sub_init_fn = None
        self._insert_fn = None
        self._uid = 0
        self._pick_step = 0      # PRNG fold index for sampled token choices

    # -- public API -------------------------------------------------------
    def submit(self, tokens, max_new_tokens: int) -> int:
        self._uid += 1
        req = Request(self._uid, np.asarray(tokens, np.int32), max_new_tokens)
        self.requests[self._uid] = req
        if self.native is not None:
            if not self.native.submit(self._uid, len(req.tokens), max_new_tokens):
                raise ValueError(
                    f"request {self._uid} exceeds max_seq_len "
                    f"{self.engine.max_seq_len}")
        self.queue.append(req)
        return self._uid

    def run(self, max_steps: int = 100000) -> dict[int, np.ndarray]:
        """Drain the queue; returns {uid: generated token ids}."""
        steps = 0
        while (self.queue or self._admissions
               or any(r is not None for r in self.slot_req)) \
                and steps < max_steps:
            self._fill_slots()
            self._decode_step()
            steps += 1
        return {uid: np.asarray(r.out) for uid, r in self.finished.items()}

    def _pick_traced(self, logits2d, step):
        """Token choice per SamplingParams — called INSIDE jitted programs.
        logits2d [B, V] (+ traced fold step) -> [B] int32."""
        if self.sampling.greedy:
            return jnp.argmax(logits2d, axis=-1).astype(jnp.int32)
        return _sample(logits2d, jax.random.PRNGKey(self.sampling.seed),
                       step, self.sampling)

    def _next_pick_step(self) -> int:
        self._pick_step += 1
        return self._pick_step

    @property
    def active_mask(self) -> np.ndarray:
        return np.array([r is not None for r in self.slot_req])

    # -- internals --------------------------------------------------------
    def _bucket(self, n: int) -> int:
        b = self.engine.prefill_bucket
        return max(b, (n + b - 1) // b * b)

    def _prefill_into_slot(self, req: Request, slot: int):
        T = len(req.tokens)
        Tpad = self._bucket(T)
        assert T + req.max_new_tokens <= self.engine.max_seq_len, req.uid
        key = Tpad
        if key not in self._prefill_fns:
            impl = self.prefill_impl

            def prefill_one(params, toks, true_len, cache, slot_idx, pstep):
                sub = impl.init(1, self.dtype)
                if self.engine.chunked_prefill:
                    # segment-streamed prefill: O(chunk) activation memory,
                    # so long prompts don't spike HBM while other slots hold
                    # live KV state (the 32k-context serving path)
                    logits, sub = llama.prefill_chunked(
                        self.cfg, params, toks, sub, impl, true_len)
                else:
                    logits, sub = llama.prefill(self.cfg, params, toks, sub,
                                                impl, true_len, last_only=True)
                nxt = self._pick_traced(logits[:, 0], pstep)           # [1]
                cache = impl.insert_slot(cache, sub, slot_idx)
                return nxt[0], cache

            # donate the cache: the caller immediately replaces it, and
            # donation lets XLA alias the update in place
            self._prefill_fns[key] = jax.jit(prefill_one, donate_argnums=(3,))
        toks = jnp.asarray(np.pad(req.tokens, (0, Tpad - T))[None], jnp.int32)
        nxt, self.cache = self._prefill_fns[key](
            self.params, toks, jnp.int32(T), self.cache, jnp.int32(slot),
            jnp.int32(self._next_pick_step()))
        nxt = int(nxt)
        self.slot_req[slot] = req
        self.slot_pos[slot] = T + 1
        self.slot_budget[slot] = req.max_new_tokens - 1
        self.slot_last[slot] = nxt
        req.out.append(nxt)
        if self._commit(slot, nxt):
            self._retire(slot)

    def _fill_slots(self):
        admit = (self._start_admission if self.interleave
                 else self._prefill_into_slot)
        if self.native is not None:
            # the native core marks the slot busy at fill(), so a multi-tick
            # admission holds its reservation until insert/commit
            for slot, uid, _, _ in self.native.fill():
                req = self.requests[uid]
                self.queue.remove(req)
                admit(req, slot)
        else:
            reserved = {a.slot for a in self._admissions}
            for slot in range(self.B):
                if (self.slot_req[slot] is None and slot not in reserved
                        and self.queue):
                    admit(self.queue.popleft(), slot)
                    reserved.add(slot)
        if self._admissions:
            self._admission_tick()

    # -- interleaved (segment-per-tick) admission ---------------------------
    def _start_admission(self, req: Request, slot: int):
        T = len(req.tokens)
        Tpad = self._bucket(T)
        assert T + req.max_new_tokens <= self.engine.max_seq_len, req.uid
        C = self.impl.C
        assert Tpad % C == 0, (Tpad, C)   # prefill_bucket % chunk_size == 0
        if self._sub_init_fn is None:
            self._sub_init_fn = jax.jit(
                lambda: self.prefill_impl.init(1, self.dtype))
        toks = np.pad(np.asarray(req.tokens, np.int32), (0, Tpad - T))[None]
        self._admissions.append(_Admission(
            req=req, slot=slot, toks=toks, true_len=T, n_seg=Tpad // C,
            sub=self._sub_init_fn()))

    def _admission_tick(self):
        """Advance the HEAD admission by one C-token segment (one batch-1
        program), then hand the slot to decode once the prompt is absorbed.
        Called once per engine tick — the following _decode_step keeps every
        active slot emitting underneath the admission."""
        adm = self._admissions[0]
        impl = self.prefill_impl
        C = impl.C
        if self._seg_fn is None:
            def seg(params, sub, seg_tokens, seg_start, true_len):
                positions = seg_start + jnp.arange(C)
                return llama.forward(
                    self.cfg, params, seg_tokens, sub, impl, positions,
                    "prefill_segment", (seg_start, true_len), last_only=True)
            self._seg_fn = jax.jit(seg, donate_argnums=(1,))
        s = adm.s
        adm.logits, adm.sub = self._seg_fn(
            self.params, adm.sub,
            jnp.asarray(adm.toks[:, s * C:(s + 1) * C]),
            jnp.int32(s * C), jnp.int32(adm.true_len))
        adm.s += 1
        if adm.s < adm.n_seg:
            return
        # prompt fully absorbed: pick the first token, insert into the slot
        self._admissions.popleft()
        if self._insert_fn is None:
            def insert(cache, sub, slot_idx, logits, pstep):
                nxt = self._pick_traced(logits[:, 0], pstep)
                return nxt[0], self.impl.insert_slot(cache, sub, slot_idx)
            self._insert_fn = jax.jit(insert, donate_argnums=(0,))
        nxt, self.cache = self._insert_fn(
            self.cache, adm.sub, jnp.int32(adm.slot), adm.logits,
            jnp.int32(self._next_pick_step()))
        nxt, req, slot = int(nxt), adm.req, adm.slot
        self.slot_req[slot] = req
        self.slot_pos[slot] = adm.true_len + 1
        self.slot_budget[slot] = req.max_new_tokens - 1
        self.slot_last[slot] = nxt
        req.out.append(nxt)
        if self._commit(slot, nxt):
            self._retire(slot)

    def _decode_step(self):
        active = self.active_mask
        if not active.any():
            return
        if self._decode_fn is None:
            impl = self.impl

            def step(params, cache, last, pos, active, pstep):
                tok = last[:, None]
                logits, cache = llama.decode_step(self.cfg, params, tok, cache,
                                                  impl, pos - 1)
                nxt = self._pick_traced(logits[:, 0], pstep)
                nxt = jnp.where(active, nxt, last)
                return nxt, cache

            self._decode_fn = jax.jit(step, donate_argnums=(1,))
        nxt, self.cache = self._decode_fn(
            self.params, self.cache, jnp.asarray(self.slot_last),
            jnp.asarray(self.slot_pos), jnp.asarray(active),
            jnp.int32(self._next_pick_step()))
        nxt = np.asarray(nxt)
        # positions advance below; compaction check uses the post-step totals

        for slot in range(self.B):
            if self.slot_req[slot] is None:
                continue
            tok = int(nxt[slot])
            req = self.slot_req[slot]
            req.out.append(tok)
            self.slot_last[slot] = tok
            self.slot_pos[slot] += 1
            self.slot_budget[slot] -= 1
            if self._commit(slot, tok):
                self._retire(slot)
        self._maybe_compact()

    def _commit(self, slot: int, tok: int) -> bool:
        """Single retirement decision point for prefill and decode commits.

        The native core is the source of truth when available; the Python
        fallback implements the identical rule (scheduler.cpp msched_commit:
        retire on EOS, exhausted budget, or full sequence capacity)."""
        is_eos = self.eos_id is not None and tok == self.eos_id
        if self.native is not None:
            return self.native.commit(slot, is_eos) == 1
        return bool(is_eos or self.slot_budget[slot] <= 0
                    or self.slot_pos[slot] >= self.engine.max_seq_len)

    def _maybe_compact(self):
        """Compressed-cache compaction for slots whose window just filled
        (host-triggered; in-step lax.cond would run the packing every step)."""
        impl = self.impl
        if not hasattr(impl, "compact_slots"):
            return
        # cache totals are slot_pos - 1 here (slot_pos already advanced past
        # the token appended by the step just committed)
        flags = np.array([
            self.slot_req[b] is not None
            and impl.needs_compact(int(self.slot_pos[b]) - 1)
            for b in range(self.B)])
        if not flags.any():
            return
        if self._compact_fn is None:
            self._compact_fn = jax.jit(impl.compact_slots, donate_argnums=(0,))
        self.cache = self._compact_fn(self.cache, jnp.asarray(flags))

    def _retire(self, slot: int):
        req = self.slot_req[slot]
        if self.eos_id is not None and req.out and req.out[-1] == self.eos_id:
            req.out.pop()
        req.done = True
        self.finished[req.uid] = req
        self.slot_req[slot] = None
        self.slot_pos[slot] = 0
