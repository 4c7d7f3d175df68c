"""Production sparse-attention kernels (v6ps / v7) vs the archived
generations they superseded (SURVEY.md §4 layer (c)).

The Pallas kernels run in interpreter mode on CPU; the same code path
compiles on TPU (validated separately by benchmarks).  Ground truth is the
archived v4/v6 kernels, themselves chain-validated against masked dense
attention in tests/test_kernels_archive.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops.kernels import sparse_attention as ska


FMT = sf.ChunkFormat(chunk=256, dim=128, keep=40)


def make_case(rs, B, Hkv, G, mc_active, max_chunks, W, win_len, fmt=FMT):
    BH = B * Hkv
    C, D = fmt.chunk, fmt.dim
    dense = rs.randn(BH, max_chunks, C, D).astype(np.float32)
    mask = np.asarray(sf.topk_mask(jnp.asarray(dense), fmt.keep))
    pruned = (dense * mask).astype(np.float32)
    segs, bmp = sf.encode_chunk(jnp.asarray(pruned).astype(jnp.bfloat16), fmt)
    segs = [jnp.asarray(np.asarray(s).reshape(BH, max_chunks * fmt.seg_rows(k), 128))
            for s, k in zip(segs, fmt.segs)]
    bmp = jnp.asarray(np.asarray(bmp).reshape(BH, max_chunks * fmt.planes, D))
    return pruned, segs, bmp
from mustafar_tpu.ops.kernels import sparse_attention_archive as skar


def test_fused_v6ps_per_slot_counts():
    """Per-slot v6: each sequence attends only its own chunk count; result
    matches per-sequence v4 calls."""
    rs = np.random.RandomState(12)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc = 3
    C, D = FMT.chunk, FMT.dim
    W = 288
    BH = B * Hkv
    ncs = np.array([1, 3], np.int32)
    wls = np.array([40, 90], np.int32)

    k_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0)
    v_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0)
    k_win = rs.randn(B, W, Hkv, D).astype(np.float32)
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32)
    for b in range(B):
        k_win[b, wls[b]:] = 0
        v_win[b, wls[b]:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    kp = jnp.asarray(k_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    vp = jnp.asarray(v_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    pool = jnp.swapaxes(jnp.concatenate(
        [sf.encode_stream(kp, FMT), sf.encode_stream(vp, FMT)], axis=-2), 0, 1)

    got = np.asarray(ska.fused_sparse_decode_attention_v6ps(
        jnp.asarray(q, jnp.bfloat16), pool,
        jnp.asarray(k_win.transpose(0, 2, 1, 3), jnp.bfloat16),
        jnp.asarray(v_win.transpose(0, 2, 1, 3), jnp.bfloat16),
        jnp.asarray(ncs), jnp.asarray(wls), FMT, FMT, mc), np.float32)

    # reference: per-sequence v4 on sliced inputs
    for b in range(B):
        ref = np.asarray(skar.fused_sparse_decode_attention_v4(
            jnp.asarray(q[b:b+1], jnp.bfloat16),
            pool[:, b*Hkv:(b+1)*Hkv],
            jnp.asarray(k_win[b:b+1], jnp.bfloat16),
            jnp.asarray(v_win[b:b+1], jnp.bfloat16),
            jnp.int32(int(ncs[b])), jnp.int32(int(wls[b])), FMT, FMT, mc),
            np.float32)
        np.testing.assert_allclose(got[b:b+1], ref, rtol=2e-2, atol=2e-2)


def test_fused_v6ps_sliding_window():
    """Per-slot v6 with sliding window: each sequence masks pool chunks to its
    own last-``window`` positions; matches per-sequence v6(window=...)."""
    rs = np.random.RandomState(21)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc = 3
    C, D = FMT.chunk, FMT.dim
    W = 288
    BH = B * Hkv
    ncs = np.array([2, 3], np.int32)
    wls = np.array([40, 200], np.int32)
    win = 512   # seq 1 (3*256+200-1 = 967 newest) masks most of chunk 0

    k_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0)
    v_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0)
    k_win = rs.randn(B, W, Hkv, D).astype(np.float32)
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32)
    for b in range(B):
        k_win[b, wls[b]:] = 0
        v_win[b, wls[b]:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    kp = jnp.asarray(k_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    vp = jnp.asarray(v_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    pool = jnp.swapaxes(jnp.concatenate(
        [sf.encode_stream(kp, FMT), sf.encode_stream(vp, FMT)], axis=-2), 0, 1)

    got = np.asarray(ska.fused_sparse_decode_attention_v6ps(
        jnp.asarray(q, jnp.bfloat16), pool,
        jnp.asarray(k_win.transpose(0, 2, 1, 3), jnp.bfloat16),
        jnp.asarray(v_win.transpose(0, 2, 1, 3), jnp.bfloat16),
        jnp.asarray(ncs), jnp.asarray(wls), FMT, FMT, mc, window=win),
        np.float32)

    for b in range(B):
        ref = np.asarray(skar.fused_sparse_decode_attention_v6(
            jnp.asarray(q[b:b+1], jnp.bfloat16),
            pool[:, b*Hkv:(b+1)*Hkv],
            jnp.asarray(k_win[b:b+1], jnp.bfloat16),
            jnp.asarray(v_win[b:b+1], jnp.bfloat16),
            jnp.int32(int(ncs[b])), jnp.int32(int(wls[b])), FMT, FMT, mc,
            window=win), np.float32)
        np.testing.assert_allclose(got[b:b+1], ref, rtol=2e-2, atol=2e-2,
                                   err_msg=f"slot {b}")


def test_fused_v7_matches_v6():
    """v7 (in-kernel dynamic window) == v6 across chunk counts and window
    lengths, with and without sliding window."""
    rs = np.random.RandomState(13)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc = 3
    C, D = FMT.chunk, FMT.dim
    W = 288
    BH = B * Hkv
    k_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0)
    v_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0)
    kp = jnp.asarray(k_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    vp = jnp.asarray(v_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    pool = jnp.swapaxes(jnp.concatenate(
        [sf.encode_stream(kp, FMT), sf.encode_stream(vp, FMT)], axis=-2), 0, 1)
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    for nact, wl, win in [(0, 30, None), (1, 90, None), (3, 288, None),
                          (2, 120, 512), (2, 0, None)]:
        k_win = rs.randn(B, W, Hkv, D).astype(np.float32); k_win[:, wl:] = 0
        v_win = rs.randn(B, W, Hkv, D).astype(np.float32); v_win[:, wl:] = 0
        args = (jnp.asarray(q, jnp.bfloat16), pool,
                jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
                jnp.int32(nact), jnp.int32(wl), FMT, FMT, mc)
        args_hm = (args[0], args[1],
                   jnp.asarray(k_win.transpose(0, 2, 1, 3), jnp.bfloat16),
                   jnp.asarray(v_win.transpose(0, 2, 1, 3), jnp.bfloat16),
                   *args[4:])
        ref = np.asarray(skar.fused_sparse_decode_attention_v6(*args, window=win),
                         np.float32)
        got = np.asarray(ska.fused_sparse_decode_attention_v7(*args_hm, window=win),
                         np.float32)
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2,
                                   err_msg=f"nact={nact} wl={wl} win={win}")



def test_window_tile_and_nonstandard_wcap():
    """Window capacities that aren't 96-divisible (e.g. r=32 + C=128 -> 160)
    must pick an 8-aligned tile (the old halving rule reached wt=1, which
    fails Mosaic's sublane alignment on real TPU) and still compute
    correctly."""
    from mustafar_tpu.ops.kernels.sparse_attention import _window_tile
    assert _window_tile(160, 96) == 80
    assert _window_tile(288, 96) == 96
    assert _window_tile(192, 96) == 96
    assert _window_tile(104, 96) == 8

    fmt = sf.ChunkFormat(chunk=128, dim=128, keep=14)
    rs = np.random.RandomState(17)
    B, Hkv, G = 1, 2, 4
    Hq = Hkv * G
    mc, nact = 2, 1
    C, D, W, wl = 128, 128, 160, 100
    BH = B * Hkv
    k_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0, fmt=fmt)
    v_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0, fmt=fmt)
    kp = jnp.asarray(k_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    vp = jnp.asarray(v_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    pool = jnp.swapaxes(jnp.concatenate(
        [sf.encode_stream(kp, fmt), sf.encode_stream(vp, fmt)], axis=-2), 0, 1)
    k_win = rs.randn(B, Hkv, W, D).astype(np.float32); k_win[:, :, wl:] = 0
    v_win = rs.randn(B, Hkv, W, D).astype(np.float32); v_win[:, :, wl:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)
    out = np.asarray(ska.fused_sparse_decode_attention_v7(
        jnp.asarray(q, jnp.bfloat16), pool,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.int32(nact), jnp.int32(wl), fmt, fmt, mc), np.float32)

    # masked dense reference
    kk = np.concatenate([k_pruned.reshape(B, Hkv, mc, C, D)[:, :, :nact]
                         .reshape(B, Hkv, nact * C, D),
                         k_win[:, :, :wl]], axis=2)
    vv = np.concatenate([v_pruned.reshape(B, Hkv, mc, C, D)[:, :, :nact]
                         .reshape(B, Hkv, nact * C, D),
                         v_win[:, :, :wl]], axis=2)
    bf = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    qg = bf(q)[:, 0].reshape(B, Hkv, G, D)
    lg = np.einsum("bhgd,bhsd->bhgs", qg, bf(kk)) / np.sqrt(D)
    wts = np.asarray(jax.nn.softmax(jnp.asarray(lg), -1))
    want = np.einsum("bhgs,bhsd->bhgd", wts, bf(vv)).reshape(B, 1, Hq, D)
    np.testing.assert_allclose(out, want, rtol=3e-2, atol=3e-2)


def test_v7_bitmap_q8_matches_dequant_reference():
    """bitmap-q8 capacity codec through v7: int8-code streams + per-channel
    scales folded into q / pv must reproduce masked dense attention over the
    DEQUANTIZED cache (the codec's exact target)."""
    fmt = sf.ChunkFormat(chunk=256, dim=128, keep=40, qbits=8)
    rs = np.random.RandomState(23)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc, nact = 3, 2
    C, D, W, wl = 256, 128, 288, 120
    BH = B * Hkv

    k_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0)
    v_pruned, *_ = make_case(rs, B, Hkv, G, mc, mc, W, 0)
    kp = jnp.asarray(k_pruned.reshape(BH * mc, C, D), jnp.bfloat16)
    vp = jnp.asarray(v_pruned.reshape(BH * mc, C, D), jnp.bfloat16)
    k_rows, k_sc = sf.encode_stream_q8(kp, fmt)
    v_rows, v_sc = sf.encode_stream_q8(vp, fmt)
    # dequantized dense (what the kernel must reproduce)
    k_deq = np.asarray(sf.decode_stream_q8(k_rows, k_sc, fmt), np.float32)
    v_deq = np.asarray(sf.decode_stream_q8(v_rows, v_sc, fmt), np.float32)
    pool = jnp.swapaxes(jnp.concatenate(
        [jnp.asarray(np.asarray(k_rows).reshape(BH, mc, fmt.stream_rows, 128)),
         jnp.asarray(np.asarray(v_rows).reshape(BH, mc, fmt.stream_rows, 128))],
        axis=-2), 0, 1)                                   # [mc, BH, 2SR, 128]
    ksc = jnp.asarray(np.asarray(k_sc).reshape(BH, mc, D).transpose(1, 0, 2),
                      jnp.bfloat16)
    vsc = jnp.asarray(np.asarray(v_sc).reshape(BH, mc, D).transpose(1, 0, 2),
                      jnp.bfloat16)
    k_win = rs.randn(B, Hkv, W, D).astype(np.float32); k_win[:, :, wl:] = 0
    v_win = rs.randn(B, Hkv, W, D).astype(np.float32); v_win[:, :, wl:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    out = np.asarray(ska.fused_sparse_decode_attention_v7(
        jnp.asarray(q, jnp.bfloat16), pool,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.int32(nact), jnp.int32(wl), fmt, fmt, mc,
        kscales=ksc, vscales=vsc), np.float32)

    # masked dense reference over dequantized pools ++ window (bf16 scales:
    # the kernel folds them in bf16; tolerance covers it)
    bf = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    kk = np.concatenate([k_deq.reshape(BH, mc, C, D)[:, :nact]
                         .reshape(B, Hkv, nact * C, D), bf(k_win)[:, :, :wl]],
                        axis=2)
    vv = np.concatenate([v_deq.reshape(BH, mc, C, D)[:, :nact]
                         .reshape(B, Hkv, nact * C, D), bf(v_win)[:, :, :wl]],
                        axis=2)
    qg = bf(q)[:, 0].reshape(B, Hkv, G, D)
    lg = np.einsum("bhgd,bhsd->bhgs", qg, kk) / np.sqrt(D)
    wts = np.asarray(jax.nn.softmax(jnp.asarray(lg), -1))
    want = np.einsum("bhgs,bhsd->bhgd", wts, vv).reshape(B, 1, Hq, D)
    np.testing.assert_allclose(out, want, atol=4e-2 * np.abs(want).max())
