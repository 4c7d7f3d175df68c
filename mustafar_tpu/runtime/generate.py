"""Generation loop: jitted prefill + on-device while_loop decode.

Replaces the reference's HF ``model.generate()`` control path
(pred_long_bench.py:75-82: greedy, num_beams=1, do_sample=False) with a fully
on-device loop — one jit per (padded prompt bucket, max_new_tokens) instead of
per-token python dispatch.  EOS handling matches HF greedy: a sequence that
has emitted EOS keeps emitting EOS, and the loop exits early once every
sequence is done.

Beyond the reference (which only ever greedy-decodes), the loop supports
on-device ancestral sampling — temperature, top-k, and top-p (nucleus)
filtering with a per-call seed — selected via ``SamplingParams``.  All
filtering runs inside the decode while_loop (no host round-trips); the PRNG
key is folded with the step index so every position draws fresh randomness.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.cache import make_cache
from mustafar_tpu.config import EngineConfig
from mustafar_tpu.models import llama


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """temperature == 0 -> greedy argmax (top_k/top_p ignored).
    top_k == 0 -> no top-k cutoff; top_p == 1.0 -> no nucleus cutoff."""
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0


GREEDY = SamplingParams()


def _sample(logits2d, key, step, sp: SamplingParams):
    """Filtered categorical draw; [B, V] logits -> [B] int32 token ids."""
    l = logits2d.astype(jnp.float32) / sp.temperature
    if sp.top_k and sp.top_k < l.shape[-1]:
        kth = jax.lax.top_k(l, sp.top_k)[0][:, -1:]
        l = jnp.where(l < kth, -jnp.inf, l)
    if sp.top_p < 1.0:
        srt = jnp.sort(l, axis=-1)[:, ::-1]                    # descending
        probs = jax.nn.softmax(srt, axis=-1)
        # keep tokens whose cumulative probability BEFORE them is < p
        # (the first token always survives); cutoff = smallest kept logit
        keep = (jnp.cumsum(probs, axis=-1) - probs) < sp.top_p
        cutoff = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True)
        l = jnp.where(l < cutoff, -jnp.inf, l)
    return jax.random.categorical(jax.random.fold_in(key, step),
                                  l, axis=-1).astype(jnp.int32)


def _generate_impl(cfg, cache_impl, max_new: int, eos_ids: tuple, min_new: int,
                   dtype, chunked: bool, sampling: SamplingParams,
                   params, tokens, true_len):
    B = tokens.shape[0]
    cache = cache_impl.init(B, dtype)
    if chunked:
        logits, cache = llama.prefill_chunked(cfg, params, tokens, cache,
                                              cache_impl, true_len)
    else:
        logits, cache = llama.prefill(cfg, params, tokens, cache, cache_impl,
                                      true_len, last_only=True)
    return _decode_impl(cfg, cache_impl, max_new, eos_ids, min_new, sampling,
                        params, cache, logits, true_len)[0]


def _decode_impl(cfg, cache_impl, max_new: int, eos_ids: tuple, min_new: int,
                 sampling: SamplingParams, params, cache, logits, true_len):
    B = logits.shape[0]
    key = jax.random.PRNGKey(sampling.seed)

    def pick(logits2d, step):
        """Token choice per SamplingParams (greedy argmax by default); EOS
        logits suppressed below min_new generated tokens (the reference's
        samsum run sets min_length=ctx+1, pred_long_bench.py:66-74 — HF
        masks EOS until min_length)."""
        if eos_ids and min_new > 0:
            # the first `min_new` generated tokens cannot be EOS (HF
            # MinLengthLogitsProcessor semantics: suppressed while
            # cur_len < min_length)
            suppress = step <= min_new
            for e in eos_ids:
                logits2d = logits2d.at[:, e].set(
                    jnp.where(suppress, -jnp.inf, logits2d[:, e]))
        if not sampling.greedy:
            return _sample(logits2d, key, step, sampling)
        return jnp.argmax(logits2d, axis=-1).astype(jnp.int32)

    def is_eos(tok):
        hit = jnp.zeros(tok.shape, bool)
        for e in eos_ids:
            hit |= tok == e
        return hit

    next_tok = pick(logits[:, 0], 1)                                 # [B]
    out = jnp.zeros((B, max_new), jnp.int32)
    out = out.at[:, 0].set(next_tok)
    done = is_eos(next_tok)

    # compressed caches compact between decode *segments* (XLA:TPU executes
    # both branches of lax.cond, so per-step compaction would pay the full
    # packing cost every token — measured 16.7 ms/layer/step of dead work).
    has_compact = hasattr(cache_impl, "compact")
    if has_compact:
        C = cache_impl.C
        r = cache_impl.r

        def window_full(i, cache):
            # the dense window holds total - nc*C tokens; it is full (r + C)
            # exactly when compaction is due — and nc increments after the
            # compact, so this predicate self-clears (totals alone would not).
            total = true_len + i - 1
            nc0 = cache["n_chunks"][0][0]
            return (total - nc0 * C) >= (r + C)

    def live(state):
        i, _, _, done, _ = state
        return jnp.logical_and(i < max_new, ~jnp.all(done))

    def body(state):
        i, tok, cache, done, out = state
        pos = true_len + i - 1
        logits, cache = llama.decode_step(cfg, params, tok[:, None],
                                          cache, cache_impl, pos)
        nxt = pick(logits[:, 0], i + 1)
        if eos_ids:
            nxt = jnp.where(done, jnp.int32(eos_ids[0]), nxt)
            done = jnp.logical_or(done, is_eos(nxt))
        out = jax.lax.dynamic_update_slice_in_dim(out, nxt[:, None], i, axis=1)
        return (i + 1, nxt, cache, done, out)

    state = (jnp.int32(1), next_tok, cache, done, out)
    if not has_compact:
        _, _, cache, done, out = jax.lax.while_loop(live, body, state)
        # the (discarded) cache is returned so a donated input cache has an
        # output to alias with — without it XLA copies the multi-GiB pool
        # into the loop instead of mutating the donated buffer in place
        return out, cache

    def inner_cond(state):
        i, _, cache, _, _ = state
        return jnp.logical_and(live(state), ~window_full(i, cache))

    def outer_body(state):
        state = jax.lax.while_loop(inner_cond, body, state)
        i, tok, cache, done, out = state
        # predicated, not lax.cond: XLA:TPU executes both cond branches,
        # which materializes a dead full-pool copy (OOM at 32k ctx)
        cache = cache_impl.compact(cache, window_full(i, cache))
        return (i, tok, cache, done, out)

    state = jax.lax.while_loop(live, outer_body, state)
    return state[4], state[2]                     # (tokens, cache) — see above


class Generator:
    """Compiled greedy-decode engine for a fixed EngineConfig."""

    def __init__(self, engine: EngineConfig, params, dtype=jnp.bfloat16):
        self.engine = engine
        self.cfg = engine.model
        self.params = params
        self.dtype = dtype
        self.cache_impl = make_cache(engine)
        self._gen_fn = {}
        self._init_fn = {}
        self._seg_fn = None
        self._dec_fn = {}

    def _bucket(self, n: int) -> int:
        b = self.engine.prefill_bucket
        return max(b, (n + b - 1) // b * b)

    def generate(self, input_ids, max_new_tokens: int, eos_id=None,
                 min_new_tokens: int = 0,
                 sampling: SamplingParams = GREEDY):
        """input_ids: [B, T] int array (uniform length, left-aligned, no padding).

        eos_id: int, or a sequence of ints (any of them stops a sequence —
        the reference's samsum run stops on EOS or newline,
        pred_long_bench.py:66-74).  min_new_tokens suppresses EOS for the
        first N generated tokens (reference min_length=ctx+1).
        sampling: SamplingParams; the default is greedy (matching the
        reference).  Each distinct SamplingParams compiles its own loop.

        Returns a list of B 1-D numpy arrays of generated ids (EOS excluded).
        """
        input_ids = jnp.asarray(input_ids, jnp.int32)
        B, T = input_ids.shape
        Tpad = self._bucket(T)
        assert Tpad + max_new_tokens <= self.engine.max_seq_len, (
            f"prompt {T} (padded {Tpad}) + {max_new_tokens} exceeds "
            f"max_seq_len {self.engine.max_seq_len}")
        if eos_id is None:
            eos_ids = ()
        elif isinstance(eos_id, (int, np.integer)):
            eos_ids = (int(eos_id),)
        else:
            eos_ids = tuple(int(e) for e in eos_id)
        if self.engine.chunked_prefill:
            out = self._generate_chunked(input_ids, B, T, Tpad,
                                         max_new_tokens, eos_ids,
                                         min_new_tokens, sampling)
        else:
            key = (B, Tpad, max_new_tokens, eos_ids, min_new_tokens, sampling)
            if key not in self._gen_fn:
                self._gen_fn[key] = jax.jit(functools.partial(
                    _generate_impl, self.cfg, self.cache_impl,
                    max_new_tokens, eos_ids, min_new_tokens, self.dtype,
                    False, sampling))
            toks = jnp.pad(input_ids, ((0, 0), (0, Tpad - T)))
            out = np.asarray(self._gen_fn[key](self.params, toks,
                                               jnp.int32(T)))
        result = []
        for row in out:
            if eos_ids:
                stop = np.where(np.isin(row, eos_ids))[0]
                row = row[: stop[0]] if len(stop) else row
            result.append(row)
        return result

    def _generate_chunked(self, input_ids, B, T, Tpad, max_new_tokens,
                          eos_ids, min_new_tokens, sampling=GREEDY):
        """Host-driven chunked prefill + jitted decode, cache donated.

        A single jit holding init + a 100+-segment prefill scan + the decode
        loop zero-inits the multi-GiB kv_pool as an HLO temp and fragments
        HBM to ~2x the pool size (measured: 49% fragmentation -> OOM at 32k
        ctx).  Driving segments from the host with ``donate_argnums`` keeps
        exactly one pool alive end to end; dispatches are async so the device
        stays busy.
        """
        C = self.cache_impl.C if hasattr(self.cache_impl, "C") \
            else self.engine.prefill_bucket
        assert Tpad % C == 0, (Tpad, C)
        if B not in self._init_fn:
            self._init_fn[B] = jax.jit(
                lambda: self.cache_impl.init(B, self.dtype))
        if self._seg_fn is None:
            def _seg(params, cache, seg_tokens, seg_start, true_len):
                positions = seg_start + jnp.arange(C)
                return llama.forward(
                    self.cfg, params, seg_tokens, cache, self.cache_impl,
                    positions, "prefill_segment", (seg_start, true_len),
                    last_only=True)
            self._seg_fn = jax.jit(_seg, donate_argnums=(1,))
        dkey = (B, max_new_tokens, eos_ids, min_new_tokens, sampling)
        if dkey not in self._dec_fn:
            self._dec_fn[dkey] = jax.jit(
                functools.partial(_decode_impl, self.cfg, self.cache_impl,
                                  max_new_tokens, eos_ids, min_new_tokens,
                                  sampling),
                donate_argnums=(1,))

        toks = np.zeros((B, Tpad), np.int32)
        toks[:, :T] = np.asarray(input_ids)
        cache = self._init_fn[B]()
        tl = jnp.int32(T)
        logits = None
        for s in range(Tpad // C):
            logits, cache = self._seg_fn(self.params, cache,
                                         toks[:, s * C:(s + 1) * C],
                                         jnp.int32(s * C), tl)
        toks_out, _ = self._dec_fn[dkey](self.params, cache, logits, tl)
        return np.asarray(toks_out)
