"""Dense and masked (prune-in-place) KV caches.

The masked cache is the TPU equivalent of the reference's accuracy path
(models/llama_mustafar_Kt_Mag_Vt_Mag.py and siblings): the cache stays a full
dense array, pruning *zeroes* entries in place.  Where the reference grows a
python tuple of tensors by torch.cat per token (`:864-867`, O(T) traffic per
step), we preallocate a static [B, S, Hkv, D] buffer and write with
dynamic_update_slice — jit-friendly and single-buffer.

Semantics replicated exactly (verified against the reference decode path
llama_mustafar_Kt_Mag_Vt_Mag.py:860-1030):
  * prefill: attention over dense K/V; afterwards all but the most recent
    ``residual_length`` tokens are pruned in the stored cache (:1039-1045 keys,
    :1081-1087 values).
  * decode: attention over the *un-pruned* cache including the appended token;
    afterwards the single token sliding out of the residual window (index
    ``pos - residual_length``) is pruned (:910-928 keys, :1008-1026 values) —
    pruning affects future steps only.
  * channel (Vc) variants prune a full ``group_size`` group when the group
    boundary exits the window (llama_mustafar_Kt_Mag_Vc_Mag.py:1035-1052).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mustafar_tpu.config import EngineConfig, PruneMethod
from mustafar_tpu.ops import pruning
from mustafar_tpu.ops.attention import (attention_partials, causal_mask,
                                        merge_partials, mha, prefill_attention)


class DenseKVCache:
    """Baseline dense KV cache; also the base class for the masked cache."""

    def __init__(self, engine: EngineConfig, use_pallas: bool | None = None,
                 stacked_decode: bool = True):
        self.engine = engine
        self.model = engine.model
        self.window = self.model.sliding_window
        # measured: XLA's fused decode attention beats the Pallas flash-decode
        # kernel at dense shapes on v5e (710 vs 923 us at B=32/S=1024), so the
        # kernel is opt-in (docs/PERFORMANCE.md).
        self.use_pallas = False if use_pallas is None else use_pallas
        # STACKED decode protocol (models/llama.forward): the [L,B,S,Hkv,D]
        # buffers ride the layer scan whole; the append/prune writes are
        # one-row scatters into the stacked buffer and the attention read is
        # a dynamic-slice XLA fuses into the QK/AV dots.  (The previous
        # per-layer carry protocol paid ~0.48 ms/layer/step of full-slice
        # write-backs at the bench shape — measured, docs/PERFORMANCE.md.)
        # stacked_decode=False keeps that legacy protocol: one softmax over
        # the post-append cache — the bit-exact semantic reference the
        # lossless compressed-cache tests compare against.
        if stacked_decode:
            self.decode_stacked_rw = ("k", "v")
            self.decode_carry_keys = ()
        else:
            self.decode_stacked_rw = ()
            self.decode_carry_keys = ("k", "v")

    # -- state ------------------------------------------------------------
    def init(self, batch: int, dtype=jnp.bfloat16) -> dict:
        m, S = self.model, self.engine.max_seq_len
        shape = (m.num_layers, batch, S, m.num_kv_heads, m.head_dim)
        state = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        extra = self.extra_state(batch, dtype)
        if extra:
            state.update(extra)
        return state

    def extra_state(self, batch: int, dtype) -> dict:
        return {}

    def insert_slot(self, cache: dict, sub: dict, slot) -> dict:
        """Insert a batch-1 cache (from a single-request prefill) into
        batch slot ``slot`` of the full cache (continuous batching)."""
        out = dict(cache)
        for key, val in sub.items():
            out[key] = jax.lax.dynamic_update_slice_in_dim(
                cache[key], val.astype(cache[key].dtype), slot, axis=1)
        return out

    # -- prefill ----------------------------------------------------------
    def prefill_attend(self, lc: dict, q, k, v, true_len):
        """q [B,T,Hq,D], k/v [B,T,Hkv,D] (roped); true_len: scalar int32 (uniform).

        Returns (out [B,T,Hq,D], updated layer cache).
        """
        out = prefill_attention(q, k, v, true_len, self.window)
        k_store, v_store = self.prefill_prune(q, k, v, out, true_len)
        lc = dict(lc)
        lc["k"] = jax.lax.dynamic_update_slice_in_dim(lc["k"], k_store, 0, axis=1)
        lc["v"] = jax.lax.dynamic_update_slice_in_dim(lc["v"], v_store, 0, axis=1)
        return out, lc

    def prefill_prune(self, q, k, v, out, true_len):
        return k, v

    # -- decode -----------------------------------------------------------
    def decode_attend(self, lc: dict, q, k, v, pos, full=None, li=None):
        """q [B,1,Hq,D], k/v [B,1,Hkv,D]; pos: int32 index of the new token —
        scalar (uniform batch) or [B] (per-slot, continuous batching).

        Stacked form (production decode; ``full``/``li`` given): k/v live in
        full["k"]/full["v"] [L,B,S,Hkv,D]; returns (out, lc, updated stacked
        buffers).  Per-layer form (full=None; unit tests): k/v live in
        lc["k"]/lc["v"] [B,S,Hkv,D]; returns (out, lc)."""
        if full is not None:
            return self._decode_attend_stacked(lc, q, k, v, pos, full, li)
        lc = dict(lc)
        B = q.shape[0]
        S = lc["k"].shape[1]
        pos = jnp.asarray(pos)
        if pos.ndim == 0:
            lc["k"] = jax.lax.dynamic_update_slice_in_dim(
                lc["k"], k.astype(lc["k"].dtype), pos, axis=1)
            lc["v"] = jax.lax.dynamic_update_slice_in_dim(
                lc["v"], v.astype(lc["v"].dtype), pos, axis=1)
            kpos = jnp.arange(S)
            mask = causal_mask(pos[None], kpos, pos + 1, self.window)
        else:
            bidx = jnp.arange(B)
            lc["k"] = lc["k"].at[bidx, pos].set(k[:, 0].astype(lc["k"].dtype))
            lc["v"] = lc["v"].at[bidx, pos].set(v[:, 0].astype(lc["v"].dtype))
            kpos = jnp.arange(S)
            mask = kpos[None, None, :] <= pos[:, None, None]      # [B,1,S]
            if self.window is not None:
                mask &= kpos[None, None, :] > (pos[:, None, None] - self.window)
        if self.use_pallas and self.model.head_dim % 128 == 0:
            from mustafar_tpu.ops.kernels.dense_decode import flash_decode_attention
            if self._needs_weights():
                # Opa scoring needs post-softmax weights, but only at the r
                # residual-window columns: reconstruct them from the
                # kernel's final online-softmax stats (p = exp(s - m) / l)
                # instead of falling back to full XLA attention.
                out, m, l = flash_decode_attention(
                    q, lc["k"], lc["v"], pos, self.window, return_norm=True)
                w_win = self._window_probs(q, lc["k"], pos, m, l)
                lc = self.decode_prune(lc, q, ("win", w_win), pos)
            else:
                out = flash_decode_attention(q, lc["k"], lc["v"], pos,
                                             self.window)
                lc = self.decode_prune(lc, q, None, pos)
            return out, lc
        out, w = mha(q, lc["k"], lc["v"], mask, return_weights=True)
        lc = self.decode_prune(lc, q, w, pos)
        return out, lc

    def _decode_attend_stacked(self, lc, q, k, v, pos, full, li):
        """Stacked decode: one-row writes into [L,B,S,Hkv,D], fused-slice reads.

        The cached K/V are read from the PRE-append buffers and the new token
        is merged as an explicit self-attention flash partial: a dynamic
        slice of the freshly-scattered buffer does not fuse into the dots
        (XLA materializes the 107 MB layer slice — measured 0.26 ms/layer at
        the bench shape), while a slice of the unmodified loop carry does."""
        kf, vf = full["k"], full["v"]
        B = q.shape[0]
        S = kf.shape[2]
        pos = jnp.asarray(pos)
        kpos = jnp.arange(S)
        k_l = jax.lax.dynamic_index_in_dim(kf, li, 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(vf, li, 0, keepdims=False)
        if pos.ndim == 0:
            zero = jnp.int32(0)
            kf = jax.lax.dynamic_update_slice(
                kf, k[None].astype(kf.dtype), (li, zero, pos, zero, zero))
            vf = jax.lax.dynamic_update_slice(
                vf, v[None].astype(vf.dtype), (li, zero, pos, zero, zero))
            # cached tokens only: kpos <= pos - 1 (+ sliding window)
            mask = causal_mask(pos[None], kpos, pos, self.window)
        else:
            bidx = jnp.arange(B)
            lib = jnp.broadcast_to(li, (B,))
            kf = kf.at[lib, bidx, pos].set(k[:, 0].astype(kf.dtype))
            vf = vf.at[lib, bidx, pos].set(v[:, 0].astype(vf.dtype))
            mask = kpos[None, None, :] < pos[:, None, None]       # [B,1,S]
            if self.window is not None:
                mask &= kpos[None, None, :] > (pos[:, None, None] - self.window)
        bufs = dict(full, k=kf, v=vf)
        if self.use_pallas and not self._needs_weights() \
                and self.model.head_dim % 128 == 0:
            from mustafar_tpu.ops.kernels.dense_decode import flash_decode_attention
            # the kernel DMAs what it needs; give it the post-append slice
            out = flash_decode_attention(
                q, jax.lax.dynamic_index_in_dim(kf, li, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(vf, li, 0, keepdims=False),
                pos, self.window)
            bufs = self._decode_prune_stacked(bufs, q, None, pos, li)
            return out, lc, {kk: bufs[kk] for kk in self.decode_stacked_rw}
        p_cached = attention_partials(q, k_l, v_l, mask)
        ones = jnp.ones((1, 1), bool)
        p_self = attention_partials(q, k.astype(k_l.dtype),
                                    v.astype(v_l.dtype), ones)
        out = merge_partials([p_cached, p_self]).astype(q.dtype)
        bufs = self._decode_prune_stacked(bufs, q, None, pos, li)
        return out, lc, {kk: bufs[kk] for kk in self.decode_stacked_rw}

    def _needs_weights(self) -> bool:
        """Opa value policies score with post-softmax weights (XLA path)."""
        return False

    def decode_prune(self, lc, q, attn_w, pos):
        return lc

    def _decode_prune_stacked(self, bufs, q, attn_w, pos, li):
        return bufs


def _prune_row_at(buf: jnp.ndarray, idx: jnp.ndarray, prune_fn) -> jnp.ndarray:
    """Apply prune_fn to the token row exiting the residual window.

    buf: [B, S, H, D]; idx scalar (uniform) or [B] (per-slot).  idx < 0 is a
    no-op (achieved by writing the row back unchanged at a clamped index).
    """
    idx = jnp.asarray(idx)
    if idx.ndim == 0:
        cidx = jnp.maximum(idx, 0)
        row = jax.lax.dynamic_slice_in_dim(buf, cidx, 1, axis=1)   # [B,1,H,D]
        pruned = prune_fn(row)
        new_row = jnp.where(idx >= 0, pruned, row)
        return jax.lax.dynamic_update_slice_in_dim(
            buf, new_row.astype(buf.dtype), cidx, axis=1)
    B = buf.shape[0]
    bidx = jnp.arange(B)
    cidx = jnp.maximum(idx, 0)
    row = buf[bidx, cidx][:, None]                                 # [B,1,H,D]
    pruned = prune_fn(row)
    new_row = jnp.where(idx[:, None, None, None] >= 0, pruned, row)
    return buf.at[bidx, cidx].set(new_row[:, 0].astype(buf.dtype))


def _prune_block_at(buf: jnp.ndarray, start: jnp.ndarray, size: int, do: jnp.ndarray,
                    prune_fn) -> jnp.ndarray:
    """Apply prune_fn to buf[:, start:start+size] when ``do``.

    start/do scalar (uniform batch) or [B] (per-slot continuous batching —
    each sequence prunes the group crossing ITS OWN boundary)."""
    start = jnp.asarray(start)
    if start.ndim == 0:
        cstart = jnp.clip(start, 0, buf.shape[1] - size)
        blk = jax.lax.dynamic_slice_in_dim(buf, cstart, size, axis=1)
        pruned = prune_fn(blk)
        new_blk = jnp.where(jnp.logical_and(do, start >= 0),
                            pruned.astype(buf.dtype), blk)
        return jax.lax.dynamic_update_slice_in_dim(buf, new_blk, cstart, axis=1)
    B = buf.shape[0]
    cstart = jnp.clip(start, 0, buf.shape[1] - size)               # [B]
    idx = cstart[:, None] + jnp.arange(size)[None, :]              # [B, size]
    blk = jnp.take_along_axis(buf, idx[:, :, None, None], axis=1)  # [B,size,H,D]
    pruned = prune_fn(blk)
    sel = jnp.logical_and(do, start >= 0)[:, None, None, None]
    new_blk = jnp.where(sel, pruned.astype(buf.dtype), blk)
    bidx = jnp.arange(B)[:, None]
    return buf.at[bidx, idx].set(new_blk)


def _prune_row_at5(buf: jnp.ndarray, li, idx: jnp.ndarray, prune_fn) -> jnp.ndarray:
    """Row RMW at (li, :, idx) of a stacked [L,B,S,H,D] buffer.

    Reads/writes exactly one token row per sequence (gather/scatter or a
    [1,B,1,H,D] dynamic slice) — the full per-layer slice is never
    materialized.  idx < 0 is a no-op (clamped write-back of the old row)."""
    idx = jnp.asarray(idx)
    B = buf.shape[1]
    if idx.ndim == 0:
        zero = jnp.int32(0)
        cidx = jnp.maximum(idx, 0)
        row = jax.lax.dynamic_slice(
            buf, (li, zero, cidx, zero, zero),
            (1, B, 1, buf.shape[3], buf.shape[4]))                 # [1,B,1,H,D]
        pruned = prune_fn(row[0])
        new_row = jnp.where(idx >= 0, pruned, row[0])
        return jax.lax.dynamic_update_slice(
            buf, new_row[None].astype(buf.dtype), (li, zero, cidx, zero, zero))
    bidx = jnp.arange(B)
    lib = jnp.broadcast_to(li, (B,))
    cidx = jnp.maximum(idx, 0)
    row = buf[lib, bidx, cidx][:, None]                            # [B,1,H,D]
    pruned = prune_fn(row)
    new_row = jnp.where(idx[:, None, None, None] >= 0, pruned, row)
    return buf.at[lib, bidx, cidx].set(new_row[:, 0].astype(buf.dtype))


def _prune_block_at5(buf: jnp.ndarray, li, start: jnp.ndarray, size: int,
                     do: jnp.ndarray, prune_fn) -> jnp.ndarray:
    """Block RMW of ``size`` token rows at (li, :, start:start+size) of a
    stacked [L,B,S,H,D] buffer when ``do`` (cf. _prune_block_at)."""
    start = jnp.asarray(start)
    B, S = buf.shape[1], buf.shape[2]
    if start.ndim == 0:
        zero = jnp.int32(0)
        cstart = jnp.clip(start, 0, S - size)
        blk = jax.lax.dynamic_slice(
            buf, (li, zero, cstart, zero, zero),
            (1, B, size, buf.shape[3], buf.shape[4]))              # [1,B,s,H,D]
        pruned = prune_fn(blk[0])
        new_blk = jnp.where(jnp.logical_and(do, start >= 0),
                            pruned.astype(buf.dtype), blk[0])
        return jax.lax.dynamic_update_slice(
            buf, new_blk[None].astype(buf.dtype), (li, zero, cstart, zero, zero))
    bidx = jnp.arange(B)[:, None]
    cstart = jnp.clip(start, 0, S - size)                          # [B]
    idx = cstart[:, None] + jnp.arange(size)[None, :]              # [B, size]
    lib = jnp.broadcast_to(li, idx.shape)
    blk = buf[lib, bidx, idx]                                      # [B,size,H,D]
    pruned = prune_fn(blk)
    sel = jnp.logical_and(do, start >= 0)[:, None, None, None]
    new_blk = jnp.where(sel, pruned.astype(buf.dtype), blk)
    return buf.at[lib, bidx, idx].set(new_blk)


def prefill_k_opa_score(q, k, true_len) -> jnp.ndarray:
    """Output-aware prefill K score: |mean_valid(|q|) * k| with query heads
    folded to kv groups (reference llama_mustafar_Kt_Opa_Vt_Mag.py:66-119).
    q [B,T,Hq,D], k [B,T,Hkv,D] -> score [B,T,Hkv,D] fp32.  Shared by the
    masked and compressed caches."""
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    valid = (jnp.arange(T) < true_len)[None, :, None, None]
    qa = jnp.where(valid, jnp.abs(q.astype(jnp.float32)), 0.0)
    denom = jnp.maximum(true_len, 1).astype(jnp.float32)
    q_mean = qa.reshape(B, T, Hkv, Hq // Hkv, D).sum(axis=(1, 3)) / denom
    return jnp.abs(q_mean[:, None, :, :] * k.astype(jnp.float32))  # [B,T,Hkv,D]


def prefill_v_opa_score(q, k, v, true_len, group_size: int,
                        window: int | None) -> jnp.ndarray:
    """Output-aware prefill V score: |attn_weight * v| where the weights are
    the softmaxed attention of the last ``group_size`` queries (reference
    llama_mustafar_Kt_Mag_Vt_Opa.py:168-206).  Returns [B,T,Hkv,D] fp32."""
    from mustafar_tpu.ops.attention import mha as _mha  # local to avoid cycle
    B, T, Hq, D = q.shape
    Hkv = v.shape[2]
    gs = group_size
    pos = jnp.arange(T)
    start = jnp.maximum(true_len - gs, 0)
    q_last = jax.lax.dynamic_slice_in_dim(q, start, gs, axis=1)
    qpos = start + jnp.arange(gs)
    mask = causal_mask(qpos, pos, true_len, window)
    _, w = _mha(q_last, k, v, mask, return_weights=True)   # [B,gs,Hq,T] fp32
    w_kv = w.reshape(B, gs, Hkv, Hq // Hkv, T).sum(axis=(1, 3))  # [B,Hkv,T]
    score = jnp.abs(w_kv[..., None] * jnp.swapaxes(v, 1, 2).astype(jnp.float32))
    return jnp.swapaxes(score, 1, 2)   # [B,T,Hkv,D]


class MaskedKVCache(DenseKVCache):
    """Dense-storage cache with reference pruning semantics applied in place."""

    def __init__(self, engine: EngineConfig, use_pallas: bool | None = None,
                 stacked_decode: bool = True):
        super().__init__(engine, use_pallas, stacked_decode)
        p = engine.prune
        self.p = p
        self.method = p.method
        if "opa" in self.method.k_policy or "opa" in self.method.v_policy:
            # Opa ring machinery (score accumulators + windowed gathers)
            # stays on the per-layer carry protocol.  Attention still runs
            # the flash kernel: the post-softmax weights Opa scores with are
            # reconstructed at the r window columns from the kernel's final
            # (m, l) stats (_window_probs) — full XLA attention is only the
            # head_dim%128 fallback.
            self.decode_stacked_rw = ()
            score_keys = ()
            if self.method.k_policy == "token_opa":
                score_keys += ("k_score",)
            if self.method.v_policy in ("token_opa", "channel_opa"):
                score_keys += ("v_score",)
            self.decode_carry_keys = ("k", "v") + score_keys

    def _needs_weights(self) -> bool:
        return self.method.v_policy in ("token_opa", "channel_opa")

    # -- pruning policies (token axis is axis=1 of [B,T,H,D]; the prune ops
    #    act on [..., T, D] so we swap to [B,H,T,D] views where needed) ------
    def _prune_k_rows(self, rows):  # rows [B,t,H,D] — per-token policies
        if self.method.k_policy == "token_mag":
            return pruning.prune_token_mag(rows, self.p.k_sparsity)
        return rows

    def _prune_v_rows(self, rows):
        if self.method.v_policy == "token_mag":
            return pruning.prune_token_mag(rows, self.p.v_sparsity)
        return rows

    # -- prefill ----------------------------------------------------------
    def prefill_prune(self, q, k, v, out, true_len):
        """Prune all tokens except the most recent ``residual_length``.

        Reference: prefill prunes key_states[:, :, :-residual_length, :] in one
        shot (llama_mustafar_Kt_Mag_Vt_Mag.py:1039-1045; values :1081-1087).
        With a dynamic true_len we prune everything and select per-row.
        """
        r = self.p.residual_length
        T = k.shape[1]
        row = jnp.arange(T)[None, :, None, None]
        in_prefix = row < (true_len - r)

        method = self.method
        if method == PruneMethod.THINK:
            k_pruned = jnp.swapaxes(
                pruning.think_prune_key(jnp.swapaxes(k, 1, 2), jnp.swapaxes(q, 1, 2),
                                        self.p.k_sparsity), 1, 2)
            # ThinK prunes ALL tokens at prefill (no residual window), V dense
            # (reference llama_think.py:1029,1064).
            return k_pruned.astype(k.dtype), v
        if method == PruneMethod.THINV:
            k_pruned = jnp.swapaxes(
                pruning.think_prune_key(jnp.swapaxes(k, 1, 2), jnp.swapaxes(q, 1, 2),
                                        self.p.k_sparsity), 1, 2)
            v_pruned = jnp.swapaxes(
                pruning.thinv_prune_value(jnp.swapaxes(v, 1, 2), self.p.v_sparsity), 1, 2)
            return k_pruned.astype(k.dtype), v_pruned.astype(v.dtype)

        # ---- K ----
        if method.k_policy == "token_mag":
            k_pruned = pruning.prune_token_mag(k, self.p.k_sparsity)
        elif method.k_policy == "token_opa":
            # score = |mean_q(|q|) * k| with query heads folded to kv groups
            # (reference llama_mustafar_Kt_Opa_Vt_Mag.py:66-119).
            k_pruned = self._prefill_prune_k_opa(q, k, true_len)
        else:
            k_pruned = k
        k_store = jnp.where(in_prefix, k_pruned, k).astype(k.dtype)

        # ---- V ----
        if method.v_policy == "token_mag":
            v_pruned = pruning.prune_token_mag(v, self.p.v_sparsity)
            v_store = jnp.where(in_prefix, v_pruned, v).astype(v.dtype)
        elif method.v_policy == "channel_mag":
            v_store = self._prefill_prune_v_channel(v, true_len, score=None)
        elif method.v_policy == "token_opa":
            v_pruned = self._prefill_v_opa_pruned(q, k, v, true_len)
            v_store = jnp.where(in_prefix, v_pruned, v).astype(v.dtype)
        elif method.v_policy == "channel_opa":
            score = self._prefill_v_opa_score(q, k, v, true_len)
            v_store = self._prefill_prune_v_channel(v, true_len, score=score)
        else:
            v_store = v
        return k_store, v_store

    def _prefill_prune_k_opa(self, q, k, true_len):
        score = prefill_k_opa_score(q, k, true_len)
        return pruning.prune_by_score_lastdim(k, score, self.p.k_sparsity)

    def _prefill_v_opa_score(self, q, k, v, true_len):
        return prefill_v_opa_score(q, k, v, true_len, self.p.group_size,
                                   self.window)

    def _prefill_v_opa_pruned(self, q, k, v, true_len):
        score = self._prefill_v_opa_score(q, k, v, true_len)
        return pruning.prune_by_score_lastdim(v, score, self.p.v_sparsity)

    def _prefill_prune_v_channel(self, v, true_len, score=None):
        """Channel (Vc) prefill prune: groups of group_size tokens, pruned along
        the token axis per channel; only complete groups fully inside the
        prefix are pruned (reference llama_mustafar_Kt_Mag_Vc_Mag.py:108-173)."""
        gs = self.p.group_size
        r = self.p.residual_length
        B, T, H, D = v.shape
        Tpad = (T + gs - 1) // gs * gs
        vp = jnp.pad(v, ((0, 0), (0, Tpad - T), (0, 0), (0, 0)))
        vt = jnp.swapaxes(vp, 1, 2)  # [B,H,T,D]
        if score is None:
            pruned = pruning.prune_channel_mag(vt, self.p.v_sparsity, gs)
        else:
            sp = jnp.pad(score, ((0, 0), (0, Tpad - T), (0, 0), (0, 0)))
            pruned = pruning.prune_channel_by_score(vt, jnp.swapaxes(sp, 1, 2),
                                                    self.p.v_sparsity, gs)
        pruned = jnp.swapaxes(pruned, 1, 2)[:, :T]
        # group g is pruned iff its last token index < true_len - r
        grp_end = (jnp.arange(T) // gs) * gs + (gs - 1)
        in_prefix = (grp_end < (true_len - r))[None, :, None, None]
        return jnp.where(in_prefix, pruned, v).astype(v.dtype)

    # -- decode -----------------------------------------------------------
    def decode_prune(self, lc, q, attn_w, pos):
        """Prune the token exiting the residual window (index pos - r)."""
        r = self.p.residual_length
        exit_idx = pos - r
        m = self.method

        if m in (PruneMethod.THINK, PruneMethod.THINV):
            return lc  # prefill-only baselines (decode prunes commented out in reference)

        # ---- K ----
        if m.k_policy == "token_mag":
            lc["k"] = _prune_row_at(lc["k"], exit_idx,
                                    lambda x: pruning.prune_token_mag(x, self.p.k_sparsity))
        elif m.k_policy == "token_opa":
            lc = self._decode_prune_k_opa(lc, q, exit_idx)

        # ---- V ----
        if m.v_policy == "token_mag":
            lc["v"] = _prune_row_at(lc["v"], exit_idx,
                                    lambda x: pruning.prune_token_mag(x, self.p.v_sparsity))
        elif m.v_policy == "channel_mag":
            gs = self.p.group_size
            # when a full group has exited the window, prune it along tokens
            # (reference llama_mustafar_Kt_Mag_Vc_Mag.py:1035-1052).
            boundary = jnp.logical_and(exit_idx >= gs - 1, (exit_idx - (gs - 1)) % gs == 0)
            start = exit_idx - (gs - 1)
            lc["v"] = _prune_block_at(
                lc["v"], start, gs, boundary,
                lambda blk: jnp.swapaxes(
                    pruning.prune_channel_mag(jnp.swapaxes(blk, 1, 2), self.p.v_sparsity, gs),
                    1, 2))
        elif m.v_policy == "token_opa":
            lc = self._decode_prune_v_opa(lc, attn_w, exit_idx)
        elif m.v_policy == "channel_opa":
            lc = self._decode_prune_v_channel_opa(lc, attn_w, exit_idx)
        return lc

    def _decode_prune_stacked(self, bufs, q, attn_w, pos, li):
        """decode_prune on the stacked [L,B,S,H,D] buffers (non-Opa methods;
        Opa instances opt out of the stacked protocol in __init__)."""
        r = self.p.residual_length
        exit_idx = pos - r
        m = self.method
        if m in (PruneMethod.THINK, PruneMethod.THINV):
            return bufs   # prefill-only baselines

        if m.k_policy == "token_mag":
            bufs["k"] = _prune_row_at5(
                bufs["k"], li, exit_idx,
                lambda x: pruning.prune_token_mag(x, self.p.k_sparsity))

        if m.v_policy == "token_mag":
            bufs["v"] = _prune_row_at5(
                bufs["v"], li, exit_idx,
                lambda x: pruning.prune_token_mag(x, self.p.v_sparsity))
        elif m.v_policy == "channel_mag":
            gs = self.p.group_size
            boundary = jnp.logical_and(exit_idx >= gs - 1,
                                       (exit_idx - (gs - 1)) % gs == 0)
            start = exit_idx - (gs - 1)
            bufs["v"] = _prune_block_at5(
                bufs["v"], li, start, gs, boundary,
                lambda blk: jnp.swapaxes(
                    pruning.prune_channel_mag(jnp.swapaxes(blk, 1, 2),
                                              self.p.v_sparsity, gs), 1, 2))
        return bufs

    # ---- Opa decode state machines --------------------------------------
    # The reference accumulates per-step scores for the tokens inside the
    # residual window and prunes each token with its accumulated score at the
    # moment it exits (key_score_accumulator [B,G,gs,D]
    # llama_mustafar_Kt_Opa_Vt_Mag.py:121-178,709-710; value accumulator
    # llama_mustafar_Kt_Mag_Vt_Opa.py:115-260).  We carry ring-buffer
    # accumulators of exactly window size (slot = absolute index mod r):
    # per step, the exiting token is pruned with its accumulated score, its
    # slot is zeroed for the incoming token, and the current step's scores
    # are added for the r tokens now in the window — O(r) work and memory
    # (the reference equivalently shifts a [*, gs, D] buffer).

    def extra_state(self, batch: int, dtype) -> dict:
        m = self.model
        r = self.p.residual_length
        st = {}
        if self.method.k_policy == "token_opa":
            st["k_score"] = jnp.zeros(
                (m.num_layers, batch, r, m.num_kv_heads, m.head_dim), jnp.float32)
        if self.method.v_policy in ("token_opa", "channel_opa"):
            st["v_score"] = jnp.zeros(
                (m.num_layers, batch, r, m.num_kv_heads, m.head_dim), jnp.float32)
        return st

    def _fold_q_abs(self, q):
        B, T, Hq, D = q.shape
        Hkv = self.model.num_kv_heads
        return jnp.abs(q.astype(jnp.float32)).reshape(B, T, Hkv, Hq // Hkv, D).mean(axis=3)

    def _window_geometry(self, pos, B):
        """Ring indexing for the r window tokens [pos-r+1 .. pos] (post-append).

        Returns (abs_idx [B, r], slots [B, r], valid [B, r])."""
        r = self.p.residual_length
        pos_v = jnp.broadcast_to(jnp.asarray(pos).reshape(-1), (B,))
        abs_idx = pos_v[:, None] - (r - 1) + jnp.arange(r)[None, :]   # [B, r]
        valid = abs_idx >= 0
        slots = jnp.mod(abs_idx, r)
        return abs_idx, slots, valid, pos_v

    def _ring_prune_row(self, buf, score_ring, exit_idx, sparsity):
        """Prune cache row exit_idx by its ring score; zero its slot after."""
        r = self.p.residual_length
        B = buf.shape[0]
        bidx = jnp.arange(B)
        exit_v = jnp.broadcast_to(jnp.asarray(exit_idx).reshape(-1), (B,))
        cidx = jnp.maximum(exit_v, 0)
        slot = jnp.mod(cidx, r)
        row = buf[bidx, cidx][:, None]                         # [B,1,H,D]
        srow = score_ring[bidx, slot][:, None]                 # [B,1,H,D]
        pruned = pruning.prune_by_score_lastdim(row, srow, sparsity)
        new_row = jnp.where(exit_v[:, None, None, None] >= 0, pruned, row)
        buf = buf.at[bidx, cidx].set(new_row[:, 0].astype(buf.dtype))
        score_ring = score_ring.at[bidx, slot].set(0.0)
        return buf, score_ring

    def _ring_accumulate(self, score_ring, step_scores, slots, valid):
        """Scatter-add step_scores [B, r, H, D] into ring slots (masked)."""
        B = score_ring.shape[0]
        bidx = jnp.arange(B)[:, None]
        contrib = jnp.where(valid[:, :, None, None], step_scores, 0.0)
        return score_ring.at[bidx, slots].add(contrib)

    def _window_rows(self, buf, abs_idx):
        """Gather cache rows at abs_idx [B, r] -> [B, r, H, D]."""
        take = jnp.maximum(abs_idx, 0)[:, :, None, None]
        return jnp.take_along_axis(buf, take, axis=1)

    def _decode_prune_k_opa(self, lc, q, exit_idx):
        B = lc["k"].shape[0]
        pos = jnp.asarray(exit_idx) + self.p.residual_length
        lc["k"], lc["k_score"] = self._ring_prune_row(
            lc["k"], lc["k_score"], exit_idx, self.p.k_sparsity)
        abs_idx, slots, valid, _ = self._window_geometry(pos, B)
        qa = self._fold_q_abs(q)[:, 0]                          # [B,Hkv,D]
        rows = self._window_rows(lc["k"], abs_idx).astype(jnp.float32)
        step = jnp.abs(qa[:, None] * rows)                      # [B,r,Hkv,D]
        lc["k_score"] = self._ring_accumulate(lc["k_score"], step, slots, valid)
        return lc

    def _fold_w_kv(self, attn_w):
        B, _, Hq, S = attn_w.shape
        Hkv = self.model.num_kv_heads
        return attn_w.reshape(B, Hkv, Hq // Hkv, S).sum(axis=2)  # [B,Hkv,S]

    def _window_probs(self, q, kbuf, pos, m, l):
        """Post-softmax weights at the r window columns from the flash
        kernel's final stats: p = exp(q.k*scale - m) / l, folded over the
        query group.  Returns [B, Hkv, r] (invalid columns zero)."""
        B, _, Hq, D = q.shape
        Hkv = kbuf.shape[2]
        G = Hq // Hkv
        abs_idx, slots, valid, pos_v = self._window_geometry(pos, B)
        rows = self._window_rows(kbuf, abs_idx)               # [B, r, Hkv, D]
        qg = q[:, 0].reshape(B, Hkv, G, D).astype(jnp.bfloat16)
        s = jnp.einsum("bhgd,brhd->bhgr", qg, rows.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        s = s * (1.0 / jnp.sqrt(jnp.float32(D)))
        ok = valid
        if self.window is not None:
            ok = ok & (abs_idx > (pos_v[:, None] - self.window))
        p = jnp.exp(s - m) / jnp.maximum(l, 1e-30)            # [B,Hkv,G,r]
        p = jnp.where(ok[:, None, None, :], p, 0.0)
        return p.sum(axis=2)                                  # [B,Hkv,r]

    def _win_w(self, attn_w, abs_idx):
        """Window-column weights from either source: precomputed kernel
        stats (("win", [B,Hkv,r]) tuple) or a full XLA weight matrix."""
        if isinstance(attn_w, tuple) and attn_w[0] == "win":
            return attn_w[1]
        w_kv = self._fold_w_kv(attn_w)                        # [B,Hkv,S]
        return jnp.take_along_axis(
            w_kv, jnp.maximum(abs_idx, 0)[:, None, :], axis=2)

    def _decode_prune_v_opa(self, lc, attn_w, exit_idx):
        B = lc["v"].shape[0]
        pos = jnp.asarray(exit_idx) + self.p.residual_length
        lc["v"], lc["v_score"] = self._ring_prune_row(
            lc["v"], lc["v_score"], exit_idx, self.p.v_sparsity)
        abs_idx, slots, valid, _ = self._window_geometry(pos, B)
        w_win = self._win_w(attn_w, abs_idx)                    # [B,Hkv,r]
        rows = self._window_rows(lc["v"], abs_idx).astype(jnp.float32)
        step = jnp.abs(jnp.swapaxes(w_win, 1, 2)[..., None] * rows)
        lc["v_score"] = self._ring_accumulate(lc["v_score"], step, slots, valid)
        return lc

    def _decode_prune_v_channel_opa(self, lc, attn_w, exit_idx):
        """Channel-Opa: accumulate like v_opa; prune the exiting group (token
        axis per channel) with ring scores when the boundary crosses.

        exit_idx scalar (uniform) or [B] (per-slot continuous batching)."""
        B, S = lc["v"].shape[0], lc["v"].shape[1]
        r = self.p.residual_length
        gs = self.p.group_size
        exit_v = jnp.broadcast_to(jnp.asarray(exit_idx).reshape(-1), (B,))
        pos = exit_v + r
        # prune exiting group when boundary crosses (scores first, then zero)
        boundary = jnp.logical_and(exit_v >= gs - 1,
                                   (exit_v - (gs - 1)) % gs == 0)  # [B]
        start = jnp.clip(exit_v - (gs - 1), 0, S - gs)             # [B]
        bidx = jnp.arange(B)[:, None]
        g_idx = start[:, None] + jnp.arange(gs)[None, :]           # [B, gs]
        g_slots = jnp.mod(g_idx, r)
        blk = jnp.take_along_axis(lc["v"], g_idx[:, :, None, None], axis=1)
        sblk = lc["v_score"][bidx, g_slots]                        # [B,gs,H,D]
        pruned = jnp.swapaxes(
            pruning.prune_channel_by_score(jnp.swapaxes(blk, 1, 2),
                                           jnp.swapaxes(sblk, 1, 2),
                                           self.p.v_sparsity, gs), 1, 2)
        sel = boundary[:, None, None, None]
        new_blk = jnp.where(sel, pruned, blk).astype(blk.dtype)
        lc["v"] = lc["v"].at[bidx, g_idx].set(new_blk)
        zeroed = jnp.where(sel, 0.0, sblk)
        lc["v_score"] = lc["v_score"].at[bidx, g_slots].set(zeroed)
        # accumulate current step for the window tokens
        abs_idx, slots, valid, _ = self._window_geometry(pos, B)
        w_win = self._win_w(attn_w, abs_idx)
        rows = self._window_rows(lc["v"], abs_idx).astype(jnp.float32)
        step = jnp.abs(jnp.swapaxes(w_win, 1, 2)[..., None] * rows)
        lc["v_score"] = self._ring_accumulate(lc["v_score"], step, slots, valid)
        return lc
