"""Reference (XLA-fused) attention math: causal prefill and single-token decode.

This is the non-Pallas compute path used by the dense and masked cache modes
(the accuracy path — reference models/llama_mustafar_Kt_Mag_Vt_Mag.py does
eager decode attention at :873-974 because pruning needs the weights).
Softmax is accumulated in float32 like the reference (:963).

Layouts: q [B, T, Hq, D]; k/v caches [B, S, Hkv, D]; GQA handled by reshaping
query heads into kv groups (no materialized repeat_kv — the reference's
``repeat_kv`` expand at :873,974 is unnecessary under einsum).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _fold_gqa(q: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    B, T, Hq, D = q.shape
    return q.reshape(B, T, num_kv_heads, Hq // num_kv_heads, D)


def causal_mask(q_pos: jnp.ndarray, k_pos: jnp.ndarray, valid_len: jnp.ndarray,
                window: Optional[int] = None) -> jnp.ndarray:
    """[Tq, Tk] boolean mask: k attends iff k_pos <= q_pos, k_pos < valid_len,
    and (if sliding window) k_pos > q_pos - window."""
    m = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] < valid_len)
    if window is not None:
        m &= k_pos[None, :] > (q_pos[:, None] - window)
    return m


def prefill_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      true_len, window=None) -> jnp.ndarray:
    """Causal prefill attention, flash kernel on TPU (reference uses
    flash-attn for prefill, llama_mustafar_Kt_Mag_Vt_Mag.py:1034-1037).

    q [B,T,Hq,D], k/v [B,T,Hkv,D] -> out [B,T,Hq,D].  Rows >= true_len
    produce garbage that callers never read (their cache rows are overwritten
    by decode).  Sliding-window prompts longer than the window go through the
    linear-memory banded path (the reference uses flash-attn's sliding-window
    mask, mistral_mustafar_Kt_Mag_Vt_Mag.py:983-989); a window that covers the
    whole prompt is vacuous (k > q - W holds for every causal pair) and runs
    as plain causal.  Falls back to masked XLA attention off-TPU.
    """
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    if window is not None:
        if T > window:
            return banded_window_prefill(q, k, v, true_len, int(window))
        window = None
    use_flash = (jax.default_backend() == "tpu"
                 and T >= 128 and D % 128 == 0)
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention
        G = Hq // Hkv
        kh = jnp.swapaxes(k, 1, 2)
        vh = jnp.swapaxes(v, 1, 2)
        # GQA: one flash call per query-head group against the shared K/V —
        # materializing repeat_kv'd K/V costs ~2.9 GiB at B=32/T=3.5k
        # (measured); per-group calls need no expansion at all.
        qs = jnp.transpose(q.reshape(B, T, Hkv, G, D), (3, 0, 2, 1, 4))
        # lax.map keeps one group's temporaries live at a time
        out_g = jax.lax.map(
            lambda qh: flash_attention(qh, kh, vh, causal=True,
                                       sm_scale=float(1.0 / np.sqrt(D))),
            qs)                                                # [G, B, Hkv, T, D]
        out = jnp.transpose(out_g, (1, 3, 2, 0, 4)).reshape(B, T, Hq, D)
        return out.astype(q.dtype)
    pos = jnp.arange(T)
    mask = causal_mask(pos, pos, true_len, window)
    return mha(q, k, v, mask)


def banded_window_prefill(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          true_len, window: int,
                          block: Optional[int] = None) -> jnp.ndarray:
    """Sliding-window prefill at O(T) memory and O(T*(W+Bq)) compute.

    The quadratic masked fallback materializes [B,T,Hq,T] fp32 logits — at
    the reference's Mistral cap (31.5k prompt, config/model2maxlen.json) that
    is ~127 GiB and cannot run.  A query block of Bq rows only attends inside
    its (W + Bq)-key band, so each block runs exact masked attention against
    a dynamic band slice: the band covers every unmasked key of its queries,
    hence per-band softmax IS the true softmax (no partial merging needed).
    Blocks are sequenced with lax.map, bounding the peak temp to one band's
    [B,Bq,Hq,W+Bq] fp32 logits.  All-matmul inner math keeps the MXU fed.
    """
    B, T, Hq, D = q.shape
    W = int(window)
    if block is None:
        # largest query block whose fp32 band logits stay under ~256 MiB
        block = 128
        for cand in (512, 256):
            if B * cand * Hq * (W + cand) * 4 <= 256 * 2**20:
                block = cand
                break
    Bq = block
    n = -(-T // Bq)
    Tp = n * Bq
    qp = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (W, Tp - T), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (W, Tp - T), (0, 0), (0, 0)))
    band = W + Bq

    def one(i):
        s = i * Bq
        qb = jax.lax.dynamic_slice_in_dim(qp, s, Bq, axis=1)
        kb = jax.lax.dynamic_slice_in_dim(kp, s, band, axis=1)   # keys s-W..s+Bq-1
        vb = jax.lax.dynamic_slice_in_dim(vp, s, band, axis=1)
        qpos = s + jnp.arange(Bq)
        kpos = s - W + jnp.arange(band)
        m = causal_mask(qpos, kpos, true_len, W) & (kpos >= 0)[None, :]
        return mha(qb, kb, vb, m)

    out = jax.lax.map(one, jnp.arange(n))                        # [n,B,Bq,Hq,D]
    out = jnp.swapaxes(out, 0, 1).reshape(B, Tp, Hq, D)
    return out[:, :T]


def attention_partials(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       mask: jnp.ndarray, head_major: bool = False):
    """Unnormalized flash partials of masked GQA attention.

    q [B,Tq,Hq,D]; k/v [B,S,Hkv,D] (or [B,Hkv,S,D] when head_major — the
    compressed-cache window layout, read without a transpose); mask [Tq,S]
    or [B,Tq,S] bool.
    Returns (acc [B,Tq,Hq,D] f32 = exp(s - m) @ v, m [B,Tq,Hq,1],
    l [B,Tq,Hq,1]); all-masked rows yield m = -1e30, l = 0, acc = 0 so they
    merge away against any live part (ops.attention.merge_partials).
    """
    B, Tq, Hq, D = q.shape
    Hkv = k.shape[1] if head_major else k.shape[2]
    qg = _fold_gqa(q, Hkv)
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    k_sub = "bhsd" if head_major else "bshd"
    s = jnp.einsum(f"bthgd,{k_sub}->bthgs", qg, k,
                   preferred_element_type=jnp.float32) * scale
    m_ = mask[None, :, None, None, :] if mask.ndim == 2 else mask[:, :, None, None, :]
    s = jnp.where(m_, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.maximum(m, NEG_INF)                               # all-masked rows
    p = jnp.exp(s - m)
    p = jnp.where(m_, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(f"bthgs,{k_sub}->bthgd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    G = Hq // Hkv
    return (acc.reshape(B, Tq, Hq, D),
            m.reshape(B, Tq, Hq, 1), l.reshape(B, Tq, Hq, 1))


def merge_partials(parts):
    """Merge flash partials [(acc, m, l), ...] -> normalized out (f32).

    Standard flash-decoding merge: out = sum_i acc_i e^{m_i - M} / sum_i
    l_i e^{m_i - M}."""
    ms = [p[1] for p in parts]
    M = ms[0]
    for m in ms[1:]:
        M = jnp.maximum(M, m)
    num = 0.0
    den = 0.0
    for acc, m, l in parts:
        a = jnp.exp(m - M)
        num = num + acc * a
        den = den + l * a
    return num / jnp.maximum(den, 1e-30)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mask: jnp.ndarray,
        return_weights: bool = False):
    """Masked multi-head attention with GQA folding.

    q: [B, Tq, Hq, D]; k/v: [B, S, Hkv, D]; mask: [Tq, S] or [B, Tq, S] bool.
    Returns out [B, Tq, Hq, D] (and optionally fp32 weights [B, Tq, Hq, S]).
    """
    B, Tq, Hq, D = q.shape
    Hkv = k.shape[2]
    qg = _fold_gqa(q, Hkv)                                   # [B,Tq,Hkv,G,D]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    logits = jnp.einsum("bthgd,bshd->bthgs", qg, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask.ndim == 2:
        m = mask[None, :, None, None, :]
    else:
        m = mask[:, :, None, None, :]
    logits = jnp.where(m, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)                      # fp32
    out = jnp.einsum("bthgs,bshd->bthgd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, Tq, Hq, D).astype(q.dtype)
    if return_weights:
        return out, w.reshape(B, Tq, Hq, w.shape[-1])
    return out
