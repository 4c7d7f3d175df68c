"""Equivalence chain for the ARCHIVED kernel generations (v1-v6).

Each generation was validated against its predecessor before being
superseded (sparse_attention_archive.py); this chain both documents the
design lineage and anchors the production kernels' ground truth
(tests/test_kernels.py references v4/v6 from here).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops.kernels import sparse_attention_archive as ska


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


@pytest.mark.parametrize("G", [1, 4, 8])
def test_key_scores_match_dense(G):
    rs = np.random.RandomState(0)
    B, Hkv, mc, nact = 1, 2, 2, 1
    BH = B * Hkv
    C, D = FMT.chunk, FMT.dim
    pruned, segs, bmp = make_case(rs, B, Hkv, G, nact, mc, 0, 0)
    G8 = max(8, G)
    q = rs.randn(BH, G8, D).astype(np.float32)
    scores = ska.sparse_key_scores(jnp.asarray(q, jnp.bfloat16), segs, bmp,
                                   jnp.int32(nact), FMT, mc)
    got = np.asarray(scores)                       # [BH, G8, mc*C]
    qb = np.asarray(jnp.asarray(q, jnp.bfloat16).astype(jnp.float32))
    pb = np.asarray(jnp.asarray(pruned, jnp.bfloat16).astype(jnp.float32))
    want = np.einsum("hgd,hmcd->hgmc", qb, pb).reshape(BH, G8, mc * C)
    np.testing.assert_allclose(got[:, :, :nact * C], want[:, :, :nact * C],
                               rtol=2e-2, atol=2e-2)
    assert (got[:, :, nact * C:] == 0).all()       # inactive chunks zeroed


def test_value_combine_matches_dense():
    rs = np.random.RandomState(1)
    B, Hkv, mc, nact = 1, 2, 3, 2
    BH = B * Hkv
    C, D = FMT.chunk, FMT.dim
    pruned, segs, bmp = make_case(rs, B, Hkv, 8, nact, mc, 0, 0)
    G8 = 8
    w = rs.rand(BH, G8, mc * C).astype(np.float32) * 0.01
    w[:, :, nact * C:] = 0
    out = ska.sparse_value_combine(jnp.asarray(w, jnp.bfloat16), segs, bmp,
                                   jnp.int32(nact), FMT, mc)
    wb = np.asarray(jnp.asarray(w, jnp.bfloat16).astype(jnp.float32))
    pb = np.asarray(jnp.asarray(pruned, jnp.bfloat16).astype(jnp.float32))
    want = np.einsum("hgs,hsd->hgd", wb.reshape(BH, G8, mc, C)[:, :, :nact].reshape(BH, G8, -1),
                     pb[:, :nact].reshape(BH, nact * C, D))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)


def test_full_decode_attention_matches_masked_dense():
    """sparse_decode_attention == fp32 softmax attention over the dense
    equivalent cache (pruned prefix ++ window), incl. GQA."""
    rs = np.random.RandomState(2)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc, nact = 2, 1
    C, D = FMT.chunk, FMT.dim
    W = 32 + C
    win_len = 37
    BH = B * Hkv

    pruned, segs, bmp = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    k_pruned, k_segs, k_bmp = pruned, segs, bmp
    v_pruned, v_segs, v_bmp = make_case(rs, B, Hkv, G, nact, mc, W, win_len)

    k_win = rs.randn(B, W, Hkv, D).astype(np.float32)
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32)
    k_win[:, win_len:] = 0
    v_win[:, win_len:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    out = ska.sparse_decode_attention(
        jnp.asarray(q, jnp.bfloat16), k_segs, k_bmp, v_segs, v_bmp,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.int32(nact), jnp.int32(win_len), FMT, FMT, mc)

    # dense reference
    def cat_cache(pruned_pool, win):
        pool = pruned_pool[:, :, :nact].reshape(B, Hkv, nact * C, D)
        winh = win[:, :win_len].transpose(0, 2, 1, 3)
        return np.concatenate([pool, winh], axis=2)      # [B,Hkv,S,D]

    kk = cat_cache(k_pruned.reshape(B, Hkv, mc, C, D), k_win)
    vv = cat_cache(v_pruned.reshape(B, Hkv, mc, C, D), v_win)
    qg = q[:, 0].reshape(B, Hkv, G, D)
    bf = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    logits = np.einsum("bhgd,bhsd->bhgs", bf(qg), bf(kk)) / np.sqrt(D)
    wts = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    want = np.einsum("bhgs,bhsd->bhgd", bf(wts), bf(vv)).reshape(B, 1, Hq, D)

    np.testing.assert_allclose(np.asarray(out, np.float32), want, rtol=3e-2, atol=3e-2)


def test_fused_decode_attention_matches_two_kernel():
    """The fused flash-decoding kernel must match the two-kernel reference
    path bit-closely (same expansion, same math, different softmax order)."""
    rs = np.random.RandomState(5)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc, nact = 3, 2
    C, D = FMT.chunk, FMT.dim
    W = 32 + C
    win_len = 90

    _, k_segs, k_bmp = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    _, v_segs, v_bmp = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    k_win = rs.randn(B, W, Hkv, D).astype(np.float32); k_win[:, win_len:] = 0
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32); v_win[:, win_len:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    args = (jnp.asarray(q, jnp.bfloat16), k_segs, k_bmp, v_segs, v_bmp,
            jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
            jnp.int32(nact), jnp.int32(win_len), FMT, FMT, mc)
    ref = np.asarray(ska.sparse_decode_attention(*args), np.float32)
    got = np.asarray(ska.fused_sparse_decode_attention(*args), np.float32)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_fused_decode_attention_zero_chunks():
    """nc=0: attention must reduce to pure window attention."""
    rs = np.random.RandomState(6)
    B, Hkv, G = 1, 2, 2
    Hq = Hkv * G
    mc = 2
    C, D = FMT.chunk, FMT.dim
    W, win_len = 288, 17
    _, k_segs, k_bmp = make_case(rs, B, Hkv, G, 0, mc, W, win_len)
    _, v_segs, v_bmp = make_case(rs, B, Hkv, G, 0, mc, W, win_len)
    k_win = rs.randn(B, W, Hkv, D).astype(np.float32); k_win[:, win_len:] = 0
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32); v_win[:, win_len:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)
    got = np.asarray(ska.fused_sparse_decode_attention(
        jnp.asarray(q, jnp.bfloat16), k_segs, k_bmp, v_segs, v_bmp,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.int32(0), jnp.int32(win_len), FMT, FMT, mc), np.float32)
    bf = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    qg = bf(q)[:, 0].reshape(B, Hkv, G, D)
    kk = bf(k_win)[:, :win_len].transpose(0, 2, 1, 3)
    vv = bf(v_win)[:, :win_len].transpose(0, 2, 1, 3)
    lg = np.einsum("bhgd,bhsd->bhgs", qg, kk) / np.sqrt(D)
    wts = np.asarray(jax.nn.softmax(jnp.asarray(lg), -1))
    want = np.einsum("bhgs,bhsd->bhgd", wts, vv).reshape(B, 1, Hq, D)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def _to_chunk_major(segs, bmp, fmt, mc):
    """[BH, mc*R, 128] -> [mc, BH, R, 128]; bmp likewise."""
    BH = bmp.shape[0]
    segs_cm = [jnp.swapaxes(s.reshape(BH, mc, fmt.seg_rows(k), 128), 0, 1)
               for s, k in zip(segs, fmt.segs)]
    bmp_cm = jnp.swapaxes(bmp.reshape(BH, mc, fmt.planes, fmt.dim), 0, 1)
    return segs_cm, bmp_cm


def test_fused_v3_matches_v2():
    rs = np.random.RandomState(7)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc, nact = 3, 2
    C, D = FMT.chunk, FMT.dim
    W, win_len = 288, 90

    _, k_segs, k_bmp = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    _, v_segs, v_bmp = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    k_win = rs.randn(B, W, Hkv, D).astype(np.float32); k_win[:, win_len:] = 0
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32); v_win[:, win_len:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    common = (jnp.asarray(q, jnp.bfloat16),)
    tail = (jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
            jnp.int32(nact), jnp.int32(win_len), FMT, FMT, mc)
    ref = np.asarray(ska.fused_sparse_decode_attention(
        *common, k_segs, k_bmp, v_segs, v_bmp, *tail), np.float32)

    ks_cm, kb_cm = _to_chunk_major(k_segs, k_bmp, FMT, mc)
    vs_cm, vb_cm = _to_chunk_major(v_segs, v_bmp, FMT, mc)
    got = np.asarray(ska.fused_sparse_decode_attention_v3(
        *common, ks_cm, kb_cm, vs_cm, vb_cm, *tail), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_fused_v3_zero_chunks():
    rs = np.random.RandomState(8)
    B, Hkv, G = 1, 2, 2
    Hq = Hkv * G
    mc = 2
    C, D = FMT.chunk, FMT.dim
    W, win_len = 288, 21
    _, k_segs, k_bmp = make_case(rs, B, Hkv, G, 0, mc, W, win_len)
    _, v_segs, v_bmp = make_case(rs, B, Hkv, G, 0, mc, W, win_len)
    ks_cm, kb_cm = _to_chunk_major(k_segs, k_bmp, FMT, mc)
    vs_cm, vb_cm = _to_chunk_major(v_segs, v_bmp, FMT, mc)
    k_win = rs.randn(B, W, Hkv, D).astype(np.float32); k_win[:, win_len:] = 0
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32); v_win[:, win_len:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)
    got = np.asarray(ska.fused_sparse_decode_attention_v3(
        jnp.asarray(q, jnp.bfloat16), ks_cm, kb_cm, vs_cm, vb_cm,
        jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
        jnp.int32(0), jnp.int32(win_len), FMT, FMT, mc), np.float32)
    bf = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    qg = bf(q)[:, 0].reshape(B, Hkv, G, D)
    kk = bf(k_win)[:, :win_len].transpose(0, 2, 1, 3)
    vv = bf(v_win)[:, :win_len].transpose(0, 2, 1, 3)
    lg = np.einsum("bhgd,bhsd->bhgs", qg, kk) / np.sqrt(D)
    wts = np.asarray(jax.nn.softmax(jnp.asarray(lg), -1))
    want = np.einsum("bhgs,bhsd->bhgd", wts, vv).reshape(B, 1, Hq, D)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_fused_v4_matches_v2():
    """v4 (fused-stream single-DMA pool) == v2 on the same logical data."""
    rs = np.random.RandomState(9)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc, nact = 3, 2
    C, D = FMT.chunk, FMT.dim
    W, win_len = 288, 90
    BH = B * Hkv

    k_pruned, k_segs, k_bmp = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    v_pruned, v_segs, v_bmp = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    k_win = rs.randn(B, W, Hkv, D).astype(np.float32); k_win[:, win_len:] = 0
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32); v_win[:, win_len:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    common = (jnp.asarray(q, jnp.bfloat16),)
    tail = (jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
            jnp.int32(nact), jnp.int32(win_len), FMT, FMT, mc)
    ref = np.asarray(ska.fused_sparse_decode_attention(
        *common, k_segs, k_bmp, v_segs, v_bmp, *tail), np.float32)

    # build the fused pool from the pruned dense chunks
    kp = jnp.asarray(k_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    vp = jnp.asarray(v_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    k_rows = sf.encode_stream(kp, FMT)                 # [BH, mc, SR, 128]
    v_rows = sf.encode_stream(vp, FMT)
    pool = jnp.concatenate([k_rows, v_rows], axis=-2)  # [BH, mc, 2SR, 128]
    pool = jnp.swapaxes(pool, 0, 1)                    # [mc, BH, 2SR, 128]

    got = np.asarray(ska.fused_sparse_decode_attention_v4(
        *common, pool, *tail), np.float32)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_fused_v5_matches_v4():
    """v5 (head-batched compute) == v4 on the same fused pool."""
    rs = np.random.RandomState(10)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc, nact = 3, 2
    C, D = FMT.chunk, FMT.dim
    W, win_len = 288, 90
    BH = B * Hkv

    k_pruned, *_ = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    v_pruned, *_ = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    k_win = rs.randn(B, W, Hkv, D).astype(np.float32); k_win[:, win_len:] = 0
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32); v_win[:, win_len:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    kp = jnp.asarray(k_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    vp = jnp.asarray(v_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    pool = jnp.swapaxes(jnp.concatenate(
        [sf.encode_stream(kp, FMT), sf.encode_stream(vp, FMT)], axis=-2), 0, 1)

    args = (jnp.asarray(q, jnp.bfloat16), pool,
            jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16),
            jnp.int32(nact), jnp.int32(win_len), FMT, FMT, mc)
    ref = np.asarray(ska.fused_sparse_decode_attention_v4(*args), np.float32)
    got = np.asarray(ska.fused_sparse_decode_attention_v5(*args), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_fused_v6_matches_v4():
    """v6 (pools-only kernel + XLA window merge) == v4."""
    rs = np.random.RandomState(11)
    B, Hkv, G = 2, 2, 4
    Hq = Hkv * G
    mc, nact = 3, 2
    C, D = FMT.chunk, FMT.dim
    W, win_len = 288, 90
    BH = B * Hkv

    k_pruned, *_ = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    v_pruned, *_ = make_case(rs, B, Hkv, G, nact, mc, W, win_len)
    k_win = rs.randn(B, W, Hkv, D).astype(np.float32); k_win[:, win_len:] = 0
    v_win = rs.randn(B, W, Hkv, D).astype(np.float32); v_win[:, win_len:] = 0
    q = rs.randn(B, 1, Hq, D).astype(np.float32)

    kp = jnp.asarray(k_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    vp = jnp.asarray(v_pruned.reshape(BH, mc, C, D), jnp.bfloat16)
    pool = jnp.swapaxes(jnp.concatenate(
        [sf.encode_stream(kp, FMT), sf.encode_stream(vp, FMT)], axis=-2), 0, 1)

    args = (jnp.asarray(q, jnp.bfloat16), pool,
            jnp.asarray(k_win, jnp.bfloat16), jnp.asarray(v_win, jnp.bfloat16))
    for nc in [0, nact]:
        tail = (jnp.int32(nc), jnp.int32(win_len), FMT, FMT, mc)
        ref = np.asarray(ska.fused_sparse_decode_attention_v4(*args, *tail), np.float32)
        got = np.asarray(ska.fused_sparse_decode_attention_v6(*args, *tail), np.float32)
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
