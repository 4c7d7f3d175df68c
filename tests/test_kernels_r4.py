"""Round-4 kernel capabilities (interpret mode on CPU; same code compiles on
TPU, validated by benchmarks):

  * any-Hkv per-slot decode (v6ps / q_ps) — the reference kernel handles
    arbitrary head counts via group_id (SpMM_Kernel.cuh:174-185); the old
    wrapper was guarded to Hkv in {8, 16} and silently fell back to the
    full-pool XLA decompress in continuous batching (VERDICT r3 #1);
  * in-kernel per-slot dynamic window (v6ps / q_ps) — window bytes stream
    through the kernel with per-head trip counts instead of a full-Wcap XLA
    merge (VERDICT r3 #4);
  * in-kernel window probabilities (``return_win_probs``) for Opa scoring on
    all four decode kernels — no XLA q.k_win re-read (VERDICT r3 #7);
  * bitmap-q8 through v6ps and the segment kernel (VERDICT r3 #2).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops import quant_format as qf
from mustafar_tpu.ops.kernels import sparse_attention as ska
from mustafar_tpu.ops.kernels import quant_attention as qa

FMT128 = sf.ChunkFormat(chunk=128, dim=128, keep=14)


def _mk_bitmap_pool(rs, BH, mc, fmt, qbits=16):
    """Random pruned chunks -> (pool [mc, BH, 2SR, 128], scales or None,
    dense fp32 [BH, mc, C, D] — the kernel's exact target)."""
    C, D = fmt.chunk, fmt.dim
    dense = rs.randn(BH, mc, C, D).astype(np.float32) * 0.3
    mask = np.asarray(sf.topk_mask(jnp.asarray(dense, jnp.bfloat16), fmt.keep))
    pruned = jnp.asarray(dense * mask, jnp.bfloat16)
    flat = pruned.reshape(BH * mc, C, D)
    if qbits == 8:
        k_rows, k_sc = sf.encode_stream_q8(flat, fmt)
        target = np.asarray(sf.decode_stream_q8(k_rows, k_sc, fmt),
                            np.float32).reshape(BH, mc, C, D)
        rows = np.asarray(k_rows).reshape(BH, mc, fmt.stream_rows, 128)
        sc = np.asarray(k_sc, np.float32).reshape(BH, mc, D).transpose(1, 0, 2)
        return rows, jnp.asarray(sc, jnp.bfloat16), target
    rows = np.asarray(sf.encode_stream(flat, fmt)).reshape(
        BH, mc, fmt.stream_rows, 128)
    target = np.asarray(pruned, np.float32)
    return rows, None, target


def _fuse_pools(k_rows, v_rows):
    """[BH, mc, SR, 128] x2 -> chunk-major [mc, BH, 2SR, 128] int16."""
    return jnp.asarray(
        np.transpose(np.concatenate([k_rows, v_rows], axis=2), (1, 0, 2, 3)))


def _ref_softmax(qx, kd, vd, k_win, v_win, ncs, wls, C, window=None):
    """Per-slot masked dense attention + total-softmax window probs.

    qx [B,1,Hq,D]; kd/vd [BH, mc, C, D] fp32 (dequant target); windows
    head-major [B, Hkv, W, D].  Returns (out [B,1,Hq,D], p_win [B,Hkv,W])."""
    B, _, Hq, D = qx.shape
    Hkv = k_win.shape[1]
    G = Hq // Hkv
    W = k_win.shape[2]
    outs, probs = [], []
    kwf = np.asarray(k_win, np.float32)
    vwf = np.asarray(v_win, np.float32)
    qf_ = np.asarray(jnp.asarray(qx, jnp.bfloat16), np.float32)
    for b in range(B):
        nact, wl = int(ncs[b]), int(wls[b])
        sl = slice(b * Hkv, (b + 1) * Hkv)
        kk = np.concatenate([kd[sl, :nact].reshape(Hkv, nact * C, D),
                             kwf[b]], axis=1)
        vv = np.concatenate([vd[sl, :nact].reshape(Hkv, nact * C, D),
                             vwf[b]], axis=1)
        S = nact * C
        qg = qf_[b, 0].reshape(Hkv, G, D)
        s = np.einsum("hgd,htd->hgt", qg, kk) / np.sqrt(D)
        live = np.ones(S + W, bool)
        live[S + wl:] = False
        if window is not None:
            pos = np.arange(S + W)
            newest = S + wl - 1
            live &= pos > (newest - window)
        s = np.where(live[None, None, :], s, -1e30)
        s -= s.max(axis=-1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(axis=-1, keepdims=True)
        p = np.where(live[None, None, :], p, 0.0)
        outs.append(np.einsum("hgt,htd->hgd", p, vv).reshape(1, 1, Hq, D))
        probs.append(p[:, :, S:].sum(axis=1)[None])        # [1, Hkv, W]
    return np.concatenate(outs), np.concatenate(probs)


@pytest.mark.parametrize("B,Hkv,G", [(1, 32, 1), (3, 2, 4), (2, 4, 2)])
def test_v6ps_any_hkv_per_slot(B, Hkv, G):
    """Per-slot bitmap decode at Llama-2 geometry (Hkv=32, G=1) and small
    odd blockings; in-kernel window; matches per-slot masked dense."""
    rs = np.random.RandomState(7)
    fmt = FMT128
    mc, C, D, W = 3, 128, 128, 160
    Hq = Hkv * G
    BH = B * Hkv
    ncs = np.resize(np.array([1, 3, 2], np.int32), B)
    wls = np.resize(np.array([40, 100, 8], np.int32), B)

    k_rows, _, kdq = _mk_bitmap_pool(rs, BH, mc, fmt)
    v_rows, _, vdq = _mk_bitmap_pool(rs, BH, mc, fmt)
    pool = _fuse_pools(k_rows, v_rows)
    k_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.3
    v_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.3
    for b in range(B):
        k_win[b, :, wls[b]:] = 0
        v_win[b, :, wls[b]:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32) * 0.3

    out, p_win = ska.fused_sparse_decode_attention_v6ps(
        jnp.asarray(q, jnp.bfloat16), pool,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.asarray(ncs), jnp.asarray(wls), fmt, fmt, mc,
        return_win_probs=True)
    bw = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    want, want_p = _ref_softmax(q, bw(kdq).reshape(BH, mc, C, D),
                                bw(vdq).reshape(BH, mc, C, D),
                                bw(k_win), bw(v_win), ncs, wls, C)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(p_win), want_p, atol=2e-2)


def test_v6ps_bitmap_q8_per_slot():
    """bitmap-q8 through the per-slot kernel: int8 payloads + per-channel
    scales, in-kernel window, vs the dequantized dense reference."""
    rs = np.random.RandomState(11)
    fmt = sf.ChunkFormat(chunk=128, dim=128, keep=14, qbits=8)
    B, Hkv, G = 2, 2, 4
    mc, C, D, W = 3, 128, 128, 160
    Hq = Hkv * G
    BH = B * Hkv
    ncs = np.array([1, 3], np.int32)
    wls = np.array([40, 120], np.int32)

    k_rows, k_sc, kdq = _mk_bitmap_pool(rs, BH, mc, fmt, qbits=8)
    v_rows, v_sc, vdq = _mk_bitmap_pool(rs, BH, mc, fmt, qbits=8)
    pool = _fuse_pools(k_rows, v_rows)
    k_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.3
    v_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.3
    for b in range(B):
        k_win[b, :, wls[b]:] = 0
        v_win[b, :, wls[b]:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32) * 0.3

    out, p_win = ska.fused_sparse_decode_attention_v6ps(
        jnp.asarray(q, jnp.bfloat16), pool,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.asarray(ncs), jnp.asarray(wls), fmt, fmt, mc,
        kscales=k_sc, vscales=v_sc, return_win_probs=True)
    bw = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    want, want_p = _ref_softmax(q, kdq, vdq, bw(k_win), bw(v_win),
                                ncs, wls, C)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               atol=4e-2 * np.abs(want).max())
    np.testing.assert_allclose(np.asarray(p_win), want_p, atol=2e-2)


def test_v6ps_sliding_window_per_slot_inkernel():
    """Per-slot sliding-window masking with the in-kernel window path."""
    rs = np.random.RandomState(13)
    fmt = FMT128
    B, Hkv, G = 2, 2, 4
    mc, C, D, W = 3, 128, 128, 160
    Hq = Hkv * G
    BH = B * Hkv
    ncs = np.array([2, 3], np.int32)
    wls = np.array([40, 150], np.int32)
    win = 300     # slot 1 (newest 3*128+150-1=533) masks chunk 0 entirely

    k_rows, _, kdq = _mk_bitmap_pool(rs, BH, mc, fmt)
    v_rows, _, vdq = _mk_bitmap_pool(rs, BH, mc, fmt)
    pool = _fuse_pools(k_rows, v_rows)
    k_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.3
    v_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.3
    for b in range(B):
        k_win[b, :, wls[b]:] = 0
        v_win[b, :, wls[b]:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32) * 0.3

    out = ska.fused_sparse_decode_attention_v6ps(
        jnp.asarray(q, jnp.bfloat16), pool,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.asarray(ncs), jnp.asarray(wls), fmt, fmt, mc, window=win)
    bw = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    want, _ = _ref_softmax(q, bw(kdq), bw(vdq), bw(k_win), bw(v_win),
                           ncs, wls, C, window=win)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               rtol=3e-2, atol=3e-2)


def test_v7_win_probs_match_reference():
    """Uniform v7 return_win_probs == total-softmax window probabilities."""
    rs = np.random.RandomState(17)
    fmt = FMT128
    B, Hkv, G = 2, 2, 4
    mc, nact, C, D, W, wl = 3, 2, 128, 128, 160, 100
    Hq = Hkv * G
    BH = B * Hkv

    k_rows, _, kdq = _mk_bitmap_pool(rs, BH, mc, fmt)
    v_rows, _, vdq = _mk_bitmap_pool(rs, BH, mc, fmt)
    pool = _fuse_pools(k_rows, v_rows)
    k_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.3
    v_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.3
    k_win[:, :, wl:] = 0
    v_win[:, :, wl:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32) * 0.3

    out, p_win = ska.fused_sparse_decode_attention_v7(
        jnp.asarray(q, jnp.bfloat16), pool,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.int32(nact), jnp.int32(wl), fmt, fmt, mc, return_win_probs=True)
    bw = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    want, want_p = _ref_softmax(q, bw(kdq), bw(vdq), bw(k_win), bw(v_win),
                                np.full(B, nact), np.full(B, wl), C)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(p_win), want_p, atol=2e-2)


def test_q_kernels_win_probs_and_any_hkv():
    """Quant-codec kernels: uniform + per-slot window probs; Hkv=32/G=1
    per-slot (Llama-2 geometry, q8q4)."""
    codec = qf.QuantCodec(256, 128, 8, 4)
    rs = np.random.RandomState(19)
    from tests.test_quant_codec import _mk_pool
    C, D, W = 256, 128, 288

    # uniform probs
    B, Hkv, G = 2, 2, 2
    pool, ks, vs, kdeq, vdeq = _mk_pool(rs, B, Hkv, 3, 2, codec)
    k_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.1
    v_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.1
    k_win[:, :, 120:] = 0
    v_win[:, :, 120:] = 0
    qx = rs.randn(B, 1, Hkv * G, D).astype(np.float32) * 0.1
    out, p_win = qa.fused_q_decode_attention(
        jnp.asarray(qx, jnp.bfloat16), pool, ks, vs,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.int32(2), jnp.int32(120), codec, 3, return_win_probs=True)
    bw = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    want, want_p = _ref_softmax(qx, kdeq, vdeq, bw(k_win), bw(v_win),
                                np.full(B, 2), np.full(B, 120), C)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               atol=4e-2 * np.abs(want).max())
    np.testing.assert_allclose(np.asarray(p_win), want_p, atol=2e-2)

    # per-slot, Hkv=32 / G=1 (+ probs)
    B, Hkv, G = 1, 32, 1
    mc = 2
    pool, ks, vs, kdeq, vdeq = _mk_pool(rs, B, Hkv, mc, mc, codec)
    k_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.1
    v_win = rs.randn(B, Hkv, W, D).astype(np.float32) * 0.1
    ncs = np.array([1], np.int32)
    wls = np.array([100], np.int32)
    k_win[:, :, 100:] = 0
    v_win[:, :, 100:] = 0
    qx = rs.randn(B, 1, Hkv * G, D).astype(np.float32) * 0.1
    out, p_win = qa.fused_q_decode_attention_ps(
        jnp.asarray(qx, jnp.bfloat16), pool, ks, vs,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.asarray(ncs), jnp.asarray(wls), codec, mc, return_win_probs=True)
    want, want_p = _ref_softmax(qx, kdeq, vdeq, bw(k_win), bw(v_win),
                                ncs, wls, C)
    np.testing.assert_allclose(np.asarray(out, np.float32), want,
                               atol=4e-2 * np.abs(want).max())
    np.testing.assert_allclose(np.asarray(p_win), want_p, atol=2e-2)


def test_segment_kernel_bitmap_q8():
    """Chunked-prefill segment partials over bitmap-q8 pools match masked
    dense attention over the dequantized pools."""
    rs = np.random.RandomState(23)
    fmt = sf.ChunkFormat(chunk=128, dim=128, keep=14, qbits=8)
    B, Hkv, G = 2, 2, 2
    mc, nact, C, D, Tseg = 4, 3, 128, 128, 128
    Hq = Hkv * G
    BH = B * Hkv

    k_rows, k_sc, kdq = _mk_bitmap_pool(rs, BH, mc, fmt, qbits=8)
    v_rows, v_sc, vdq = _mk_bitmap_pool(rs, BH, mc, fmt, qbits=8)
    pool = _fuse_pools(k_rows, v_rows)
    qseg = rs.randn(B, Tseg, Hq, D).astype(np.float32) * 0.3

    acc, m, l = ska.fused_sparse_segment_attention(
        jnp.asarray(qseg, jnp.bfloat16), pool, jnp.int32(nact),
        jnp.int32(nact * C), fmt, fmt, mc, kscales=k_sc, vscales=v_sc)
    out = np.asarray(acc, np.float32) / np.asarray(l, np.float32)

    S = nact * C
    kk = kdq[:, :nact].reshape(BH, S, D)
    vv = vdq[:, :nact].reshape(BH, S, D)
    qg = np.asarray(jnp.asarray(qseg, jnp.bfloat16), np.float32).reshape(
        B, Tseg, Hkv, G, D)
    qg = np.transpose(qg, (0, 2, 1, 3, 4)).reshape(BH, Tseg * G, D)
    s = np.einsum("hrd,htd->hrt", qg, kk) / np.sqrt(D)
    s -= s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    want = np.einsum("hrt,htd->hrd", p, vv).reshape(B, Hkv, Tseg, G, D)
    want = np.transpose(want, (0, 2, 1, 3, 4)).reshape(B, Tseg, Hq, D)
    np.testing.assert_allclose(out, want, atol=4e-2 * np.abs(want).max())


# ---------------------------------------------------------------------------
# Cache-level wiring: per-slot decode_attend kernel path vs XLA fallback
# (any Hkv, all codecs) — the r3 guard silently dropped Hkv not in {8, 16}
# to the full-pool XLA decompress (cache/compressed.py).
# ---------------------------------------------------------------------------

import dataclasses

from mustafar_tpu.config import (CacheMode, EngineConfig, PruneConfig,
                                 PruneMethod, TINY_LLAMA)
from mustafar_tpu.cache.compressed import CompressedKVCache


def _cat_lc(impl, lcs):
    """Concatenate per-layer batch-1 cache states along the batch axis."""
    out = {}
    for key in lcs[0]:
        axis = {"kv_pool": 1, "kv_scales": 1, "n_chunks": 0}.get(key, 0)
        out[key] = jnp.concatenate([lc[key] for lc in lcs], axis=axis)
    return out


@pytest.mark.parametrize("codec,Hkv,Hq", [
    ("bitmap", 2, 4), ("bitmap-q8", 2, 4), ("q8q4", 2, 4), ("bitmap", 32, 32)])
def test_per_slot_decode_cache_kernel_vs_xla(codec, Hkv, Hq):
    """Per-slot (continuous-batching) decode through CompressedKVCache: the
    fused kernel path (interpret) must match the XLA fallback for mixed slot
    lengths at any Hkv — including Llama-2 geometry (Hkv=32, G=1) and the
    bitmap-q8 capacity codec."""
    model = dataclasses.replace(TINY_LLAMA, name=f"t128-{codec}-{Hkv}",
                                num_heads=Hq, num_kv_heads=Hkv, head_dim=128,
                                hidden_size=128)
    eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.7, v_sparsity=0.7),
                       max_seq_len=1024, prefill_bucket=256, chunk_size=256,
                       codec=codec)
    impl_x = CompressedKVCache(eng, use_pallas=False)
    impl_p = CompressedKVCache(eng, use_pallas=True)   # interpret on CPU
    D = 128
    rs = np.random.RandomState(31)
    lens = [500, 300]
    lcs = []
    for i, T in enumerate(lens):
        q = jnp.asarray(rs.randn(1, 512, Hq, D) * 0.3, jnp.float32)
        k = jnp.asarray(rs.randn(1, 512, Hkv, D) * 0.3, jnp.float32)
        v = jnp.asarray(rs.randn(1, 512, Hkv, D) * 0.3, jnp.float32)
        cache = impl_x.init(1, jnp.float32)
        lc = {key: val[0] for key, val in cache.items()}
        _, lc = impl_x.prefill_attend(lc, q, k, v, jnp.int32(T))
        lcs.append(lc)
    lc = _cat_lc(impl_x, lcs)
    pos = jnp.asarray(lens, jnp.int32)                 # [B] -> per-slot path

    qd = jnp.asarray(rs.randn(2, 1, Hq, D) * 0.3, jnp.float32)
    kd = jnp.asarray(rs.randn(2, 1, Hkv, D) * 0.3, jnp.float32)
    vd = jnp.asarray(rs.randn(2, 1, Hkv, D) * 0.3, jnp.float32)
    out_x, _ = impl_x.decode_attend(dict(lc), qd, kd, vd, pos)
    out_p, _ = impl_p.decode_attend(dict(lc), qd, kd, vd, pos)
    ref = np.asarray(out_x, np.float32)
    np.testing.assert_allclose(np.asarray(out_p, np.float32), ref,
                               atol=4e-2 * np.abs(ref).max())
