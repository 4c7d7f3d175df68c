"""Sequence-parallel (context-parallel) prefill: ring attention over a mesh axis.

New capability relative to the reference, which is single-GPU and handles long
context only by truncation + flash-attn (SURVEY.md §5 "Long-context": no ring
attention / context parallel anywhere in the tree).  Motivation on TPU: a 32k
admission's prefill FLOPs and activation memory land on ONE chip in the dp x tp
layout (batch=1 occupies a single "data" shard and attention is head-local).
Ring attention spreads the same prompt's tokens across the "data" axis instead:

  * activations [B, T, H] are sharded along T — every chip works on T/n tokens
    through norms/projections/MLP (token-parallel, GSPMD handles them);
  * attention runs as a shard_map ring: each chip holds its Q block and passes
    its K/V block around the ring (ppermute over ICI), accumulating
    flash-style partials (ops.attention.attention_partials merged with the
    standard online-softmax rule) — K/V never materialize whole anywhere;
  * the KV cache written by prefill is sequence-sharded; one
    with_sharding_constraint reshards it to the decode layout (batch over
    "data", kv-heads over "model") at handoff.

The ring is jax-idiomatic blockwise attention (Liu et al., Ring Attention;
public recipe per the scaling-book): K/V rotation is issued before each
block's compute so XLA's async collective-permute overlaps transfer with the
matmuls.  Causality masks whole blocks from the future — their partials
contribute (l=0, m=-inf) and merge away exactly.

Composes with tensor parallelism: heads stay sharded over "model" inside the
same shard_map (GQA folding is per-shard; tp must divide num_kv_heads, the
same constraint as the decode path).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mustafar_tpu.ops.attention import (NEG_INF, attention_partials,
                                        causal_mask)

_Q_TILE = 512  # per-step query tile bounding the [B, tile, Hq, Ts] partials


def _merge_into(acc, m, l, a2, m2, l2):
    """Online-softmax merge of running (acc, m, l) with new partials."""
    M = jnp.maximum(m, m2)
    s1 = jnp.exp(m - M)
    s2 = jnp.exp(m2 - M)
    return acc * s1 + a2 * s2, M, l * s1 + l2 * s2


def _block_partials(q, k, v, q_pos, k_pos, true_len, window):
    """Partials of local q against one K/V block, query-tiled to bound the
    fp32 logits temp to [B, _Q_TILE, Hq, Ts]."""
    B, Tq, Hq, D = q.shape
    if Tq <= _Q_TILE or Tq % _Q_TILE:
        mask = causal_mask(q_pos, k_pos, true_len, window)
        return attention_partials(q, k, v, mask)
    nt = Tq // _Q_TILE

    def one(i):
        qt = jax.lax.dynamic_slice_in_dim(q, i * _Q_TILE, _Q_TILE, axis=1)
        qp = jax.lax.dynamic_slice_in_dim(q_pos, i * _Q_TILE, _Q_TILE, axis=0)
        mask = causal_mask(qp, k_pos, true_len, window)
        return attention_partials(qt, k, v, mask)

    acc, m, l = jax.lax.map(one, jnp.arange(nt))   # [nt, B, tile, Hq, ...]
    join = lambda x: jnp.swapaxes(x, 0, 1).reshape(B, Tq, *x.shape[3:])
    return join(acc), join(m), join(l)


def _ring_attend(q, k, v, true_len, *, axis_name: str, n_shards: int,
                 window: Optional[int]):
    """Per-shard ring body (inside shard_map).

    q/k/v [B, Ts, H_local, D] hold this shard's token block (global tokens
    [idx*Ts, (idx+1)*Ts)).  n_shards rotation steps; step i computes partials
    against the block originally owned by shard (idx - i) mod n, then the
    K/V blocks rotate one hop (issued before compute so the transfer hides
    under the matmuls).  Returns out [B, Ts, Hq_local, D] in q.dtype.
    """
    B, Ts, Hq, D = q.shape
    idx = jax.lax.axis_index(axis_name)
    q_pos = idx * Ts + jnp.arange(Ts)
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]

    acc = jnp.zeros((B, Ts, Hq, D), jnp.float32)
    m = jnp.full((B, Ts, Hq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((B, Ts, Hq, 1), jnp.float32)
    for i in range(n_shards):
        if i + 1 < n_shards:
            k_nxt = jax.lax.ppermute(k, axis_name, perm)
            v_nxt = jax.lax.ppermute(v, axis_name, perm)
        src = (idx - i) % n_shards
        k_pos = src * Ts + jnp.arange(Ts)
        a2, m2, l2 = _block_partials(q, k, v, q_pos, k_pos, true_len, window)
        acc, m, l = _merge_into(acc, m, l, a2, m2, l2)
        if i + 1 < n_shards:
            k, v = k_nxt, v_nxt
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def ring_prefill_attention(q, k, v, true_len, mesh, seq_axis: str = "data",
                           head_axis: Optional[str] = "model",
                           window: Optional[int] = None):
    """Causal prefill attention with the sequence sharded over ``seq_axis``.

    q [B, T, Hq, D], k/v [B, T, Hkv, D] (global shapes; T must be divisible
    by the axis size — llama.prefill's bucketing guarantees multiples of 128,
    pad upstream otherwise).  Heads shard over ``head_axis`` (pass None on a
    1-axis mesh).  Exactly matches ops.attention.prefill_attention, including
    the Mistral sliding-window band (the band mask is position-based, so ring
    blocks fully outside a query block's band merge away as zeros).
    """
    n = mesh.shape[seq_axis]
    assert q.shape[1] % n == 0, (q.shape, n)
    h = head_axis
    spec = P(None, seq_axis, h, None)
    fn = partial(_ring_attend, axis_name=seq_axis, n_shards=n,
                 window=None if window is None else int(window))
    return jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec, P()),
                         out_specs=spec)(q, k, v, jnp.asarray(true_len))


class _SPPrefillImpl:
    """Cache-impl proxy whose prefill attention runs the ring.

    Pruning (prefill_prune) and the cache write are reused from the wrapped
    impl under GSPMD: every Mag/ThinK policy is token-local along the sharded
    axis (top-k over D, channel groups of 32), so they stay communication-free;
    Opa prefill scoring reads the last group_size queries against all K and
    compiles to the collectives GSPMD inserts.
    """

    def __init__(self, impl, mesh, seq_axis: str, head_axis: Optional[str]):
        self._impl = impl
        self._mesh = mesh
        self._seq_axis = seq_axis
        self._head_axis = head_axis

    def __getattr__(self, name):
        return getattr(self._impl, name)

    def prefill_attend(self, lc, q, k, v, true_len):
        # pin the SP layout on both sides of the prune: GSPMD's propagation
        # otherwise leaves the pruned K/V on an ambiguous placement and pays
        # an in-loop all-to-all at the where-merge (measured, scheduled HLO)
        pin = lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(self._mesh,
                             P(None, self._seq_axis, self._head_axis, None)))
        q, k, v = pin(q), pin(k), pin(v)
        out = ring_prefill_attention(q, k, v, true_len, self._mesh,
                                     self._seq_axis, self._head_axis,
                                     self._impl.window)
        k_store, v_store = self._impl.prefill_prune(q, k, v, out, true_len)
        lc = dict(lc)
        lc["k"] = jax.lax.dynamic_update_slice_in_dim(
            lc["k"], pin(k_store).astype(lc["k"].dtype), 0, axis=1)
        lc["v"] = jax.lax.dynamic_update_slice_in_dim(
            lc["v"], pin(v_store).astype(lc["v"].dtype), 0, axis=1)
        return out, lc


def sp_cache_specs(cache: dict, seq_axis: str = "data",
                   head_axis: Optional[str] = "model") -> dict:
    """PartitionSpecs for the dense/masked cache DURING an SP prefill: the
    token axis S shards over ``seq_axis`` so the per-layer K/V writes stay
    local (with the decode layout — batch over data — GSPMD would pay an
    all-to-all per layer per buffer; measured via
    benchmarks/analyze_sp_collectives.py).  Reshard to
    parallel.sharding.cache_specs once, at the decode handoff."""
    return {k: P(None, None, seq_axis, head_axis, None) for k in cache}


def sp_prefill(cfg, params, tokens, cache, cache_impl, true_len, mesh,
               seq_axis: str = "data", head_axis: Optional[str] = "model",
               last_only: bool = False):
    """Sequence-parallel monolithic prefill over the dense/masked caches.

    Drop-in for models.llama.prefill when one long prompt should use the
    whole mesh: activations are sharded along T (GSPMD runs every token-local
    op on T/n tokens per chip) and attention rides the ring.  ``cache`` is
    the caller's decode-layout cache; the returned cache is the same layout
    with the prompt's rows filled — no separate reshard step.

    Collective structure (verified on scheduled HLO,
    benchmarks/analyze_sp_collectives.py): prefill runs on an S=T-sized
    sequence-sharded VIEW of the cache, so every per-layer K/V write is a
    full-extent local overwrite (a DUS into the S_max cache would straddle
    misaligned shard boundaries and all-gather per layer — measured); the
    single handoff at the end is one all-to-all per K/V buffer plus one
    local splice.  Works under jit; tokens [B, T] with T % axis_size == 0.
    """
    from mustafar_tpu.models import llama

    T = tokens.shape[1]
    sp = NamedSharding(mesh, P(None, seq_axis))
    tokens = jax.lax.with_sharding_constraint(tokens, sp)
    # S=T prefill view, sequence-sharded (cache leaves are [L, B, S, Hkv, D])
    pre = {k: v[:, :, :T] for k, v in cache.items()}
    pre = reshard_cache(pre, sp_cache_specs(pre, seq_axis, head_axis), mesh)
    impl = _SPPrefillImpl(cache_impl, mesh, seq_axis, head_axis)
    # the token-segmented MLP exists to bound the [B, T, I] temp on ONE chip
    # (llama._MLP_SEG); under SP that temp is already split T/n ways, and the
    # reshape through (n_seg, seg) blocks GSPMD's T-sharding propagation
    # (measured: one [B, T, H] all-gather per layer) — disable segmentation
    # for THIS trace via the ContextVar (scoped: a concurrently traced non-SP
    # prefill in another thread keeps its segmentation; ADVICE r4).
    tok = llama._MLP_SEG_OVERRIDE.set(1 << 30)
    try:
        logits, pre = llama.prefill(cfg, params, tokens, pre, impl, true_len,
                                    last_only=last_only)
    finally:
        llama._MLP_SEG_OVERRIDE.reset(tok)
    # handoff: reshard the filled T rows to the caller's decode layout —
    # batch over the SP sequence axis, kv-heads over the head axis (the
    # decode meaning of the same mesh axes; ADVICE r4: was hardcoded
    # data/model, ignoring the seq_axis/head_axis arguments)
    dspecs = {k: P(None, seq_axis, None, head_axis, None) for k in cache}
    pre = reshard_cache(pre, dspecs, mesh)
    cache = {k: jax.lax.dynamic_update_slice_in_dim(
        cache[k], pre[k].astype(cache[k].dtype), 0, axis=2) for k in cache}
    return logits, cache


def reshard_cache(cache, specs, mesh):
    """Reshard a (sequence-sharded) prefill cache to the decode layout given
    by parallel.sharding.cache_specs — one all-to-all per leaf, inside jit."""
    return jax.tree.map(
        lambda x, s: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, s)), cache, specs,
        is_leaf=lambda x: isinstance(x, P))
