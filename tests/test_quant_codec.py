"""Quantized-dense codec tests: pack/unpack round-trips, kernel-vs-XLA
equivalence (interpret mode), cache state machine, and end-to-end generation
with the q8/q8q4 codecs (ops/quant_format.py, ops/kernels/quant_attention.py).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mustafar_tpu.config import (CacheMode, EngineConfig, PruneConfig,
                                 PruneMethod, TINY_LLAMA)
from mustafar_tpu.cache.compressed import CompressedKVCache
from mustafar_tpu.models.llama import init_params
from mustafar_tpu.ops import quant_format as qf
from mustafar_tpu.ops.kernels import quant_attention as qa
from mustafar_tpu.runtime.generate import Generator

MODEL128 = dataclasses.replace(TINY_LLAMA, name="tiny128", num_heads=2,
                               num_kv_heads=1, head_dim=128, hidden_size=128)


def _engine(sparsity, codec, max_seq=1024, **kw):
    return EngineConfig(
        model=MODEL128, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=sparsity, v_sparsity=sparsity),
        max_seq_len=max_seq, prefill_bucket=256, chunk_size=256,
        codec=codec, **kw)


# ---------------------------------------------------------------------------
# format round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [8, 4])
def test_pack_unpack_codes_exact(bits):
    rs = np.random.RandomState(0)
    qmax = 2 ** (bits - 1) - 1
    codes = jnp.asarray(rs.randint(-qmax, qmax + 1, (3, 256, 128)), jnp.int32)
    rows = qf.pack_codes(codes, bits)
    assert rows.shape == (3, 256 // (16 // bits), 128)
    back = qf.unpack_rows(rows, bits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))


@pytest.mark.parametrize("vbits", [8, 4])
def test_encode_decode_chunk(vbits):
    codec = qf.QuantCodec(256, 128, 8, vbits)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(4, 256, 128) * 0.3, jnp.bfloat16)
    rows, scales = qf.encode_chunk(x, codec, "v")
    y = qf.decode_chunk(rows, scales, codec, "v")
    xf = np.asarray(x, np.float32)
    err = np.abs(np.asarray(y, np.float32) - xf).max()
    # worst case: half a quantization step per channel, plus bf16 scale
    # rounding (scales are stored bf16, ~2^-9 relative)
    step = np.abs(xf).max(axis=1) / (2 ** (vbits - 1) - 1)
    assert err <= step.max() * 0.5 + np.abs(xf).max() * 2 ** -8
    # exact zeros (pruned positions) survive exactly
    x0 = x.at[:, :, :5].set(0)
    rows0, sc0 = qf.encode_chunk(x0, codec, "v")
    y0 = qf.decode_chunk(rows0, sc0, codec, "v")
    assert (np.asarray(y0, np.float32)[:, :, :5] == 0).all()


# ---------------------------------------------------------------------------
# kernels vs numpy reference (interpret mode on CPU)
# ---------------------------------------------------------------------------

def _mk_pool(rs, B, Hkv, mc, nact, codec):
    BH = B * Hkv
    C, D = codec.chunk, codec.dim
    kd = rs.randn(BH, mc, C, D).astype(np.float32) * 0.3
    vd = rs.randn(BH, mc, C, D).astype(np.float32) * 0.3
    krows, ks = [], []
    vrows, vs = [], []
    kq = jnp.asarray(kd.reshape(BH * mc, C, D), jnp.bfloat16)
    vq = jnp.asarray(vd.reshape(BH * mc, C, D), jnp.bfloat16)
    kr, ksc = qf.encode_chunk(kq, codec, "k")
    vr, vsc = qf.encode_chunk(vq, codec, "v")
    kr = np.asarray(kr).reshape(BH, mc, codec.k_rows, 128)
    vr = np.asarray(vr).reshape(BH, mc, codec.v_rows, 128)
    pool = np.transpose(np.concatenate([kr, vr], axis=2), (1, 0, 2, 3))
    ks = np.asarray(ksc, np.float32).reshape(BH, mc, D).transpose(1, 0, 2)
    vs = np.asarray(vsc, np.float32).reshape(BH, mc, D).transpose(1, 0, 2)
    # dequantized dense (the kernel's exact target)
    kdeq = np.asarray(qf.decode_chunk(jnp.asarray(kr.reshape(BH * mc, -1, 128)),
                                      ksc, codec, "k"),
                      np.float32).reshape(BH, mc, C, D)
    vdeq = np.asarray(qf.decode_chunk(jnp.asarray(vr.reshape(BH * mc, -1, 128)),
                                      vsc, codec, "v"),
                      np.float32).reshape(BH, mc, C, D)
    return (jnp.asarray(pool), jnp.asarray(ks, jnp.bfloat16),
            jnp.asarray(vs, jnp.bfloat16), kdeq, vdeq)


def _ref_decode(qx, kdeq, vdeq, k_win, v_win, nact, wl, window=None,
                pos_base=0):
    # k_win/v_win are head-major [B, Hkv, W, D] (the cache window layout)
    B, _, Hq, D = qx.shape
    Hkv = k_win.shape[1]
    G = Hq // Hkv
    BH = B * Hkv
    C = kdeq.shape[2]
    kall = np.concatenate(
        [kdeq[:, :nact].reshape(BH, -1, D),
         np.asarray(k_win, np.float32)[:, :, :wl].reshape(BH, wl, D)], axis=1)
    vall = np.concatenate(
        [vdeq[:, :nact].reshape(BH, -1, D),
         np.asarray(v_win, np.float32)[:, :, :wl].reshape(BH, wl, D)], axis=1)
    T = kall.shape[1]
    qg = np.asarray(qx, np.float32)[:, 0].reshape(BH, G, D)
    # scales folded in bf16 in-kernel; reference uses f32 — tolerance covers it
    s = np.einsum("hgd,htd->hgt", qg, kall) / np.sqrt(D)
    if window is not None:
        pos = np.arange(T)
        newest = nact * C + wl - 1
        live = pos > (newest - window)
        s = np.where(live[None, None, :], s, -1e30)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    out = np.einsum("hgt,htd->hgd", p, vall)
    return out.reshape(B, 1, Hq, D)


@pytest.mark.parametrize("kbits,vbits,window,wl",
                         [(8, 8, None, 120), (8, 4, None, 120),
                          (8, 4, 700, 120), (8, 4, None, 0),
                          (4, 4, None, 120)])
def test_q_decode_kernel_matches_reference(kbits, vbits, window, wl):
    codec = qf.QuantCodec(256, 128, kbits, vbits)
    B, Hkv, G, D, W = 2, 2, 2, 128, 288
    mc, nact = 4, 3
    rs = np.random.RandomState(2)
    pool, ks, vs, kdeq, vdeq = _mk_pool(rs, B, Hkv, mc, nact, codec)
    k_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    v_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    qx = jnp.asarray(rs.randn(B, 1, Hkv * G, D) * 0.1, jnp.bfloat16)
    out = np.asarray(qa.fused_q_decode_attention(
        qx, pool, ks, vs, k_win, v_win, jnp.int32(nact), jnp.int32(wl),
        codec, mc, window=window), np.float32)
    ref = _ref_decode(qx, kdeq, vdeq, k_win, v_win, nact, wl, window=window)
    np.testing.assert_allclose(out, ref, atol=3e-2 * np.abs(ref).max())


def test_q_decode_kernel_clamps_nslots():
    # nslots > max_chunks // fdepth used to index pool_hbm out of bounds at
    # trace time in the static prefetch loop; the wrapper must clamp it.
    codec = qf.QuantCodec(256, 128, 8, 4)
    B, Hkv, G, D, W = 2, 2, 2, 128, 288
    mc, nact, wl = 4, 3, 120
    rs = np.random.RandomState(2)
    pool, ks, vs, kdeq, vdeq = _mk_pool(rs, B, Hkv, mc, nact, codec)
    k_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    v_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    qx = jnp.asarray(rs.randn(B, 1, Hkv * G, D) * 0.1, jnp.bfloat16)
    out = np.asarray(qa.fused_q_decode_attention(
        qx, pool, ks, vs, k_win, v_win, jnp.int32(nact), jnp.int32(wl),
        codec, mc, fdepth=4, nslots=4), np.float32)
    ref = _ref_decode(qx, kdeq, vdeq, k_win, v_win, nact, wl)
    np.testing.assert_allclose(out, ref, atol=3e-2 * np.abs(ref).max())


def test_q_decode_ps_kernel_matches_reference():
    codec = qf.QuantCodec(256, 128, 8, 4)
    B, Hkv, G, D, W = 2, 2, 2, 128, 288
    mc = 4
    rs = np.random.RandomState(3)
    pool, ks, vs, kdeq, vdeq = _mk_pool(rs, B, Hkv, mc, mc, codec)
    k_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    v_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    qx = jnp.asarray(rs.randn(B, 1, Hkv * G, D) * 0.1, jnp.bfloat16)
    nc = jnp.asarray([3, 1], jnp.int32)
    wl = jnp.asarray([120, 40], jnp.int32)
    out = np.asarray(qa.fused_q_decode_attention_ps(
        qx, pool, ks, vs, k_win, v_win, nc, wl, codec, mc), np.float32)
    for b in range(B):
        ref = _ref_decode(qx[b:b + 1], kdeq[b * Hkv:(b + 1) * Hkv],
                          vdeq[b * Hkv:(b + 1) * Hkv], k_win[b:b + 1],
                          v_win[b:b + 1], int(nc[b]), int(wl[b]))
        np.testing.assert_allclose(out[b:b + 1], ref,
                                   atol=3e-2 * np.abs(ref).max())


def test_q_segment_kernel_matches_reference():
    codec = qf.QuantCodec(256, 128, 8, 4)
    B, Hkv, G, D = 2, 2, 2, 128
    mc, nact, Tseg = 4, 3, 256
    rs = np.random.RandomState(4)
    pool, ks, vs, kdeq, vdeq = _mk_pool(rs, B, Hkv, mc, nact, codec)
    qseg = jnp.asarray(rs.randn(B, Tseg, Hkv * G, D) * 0.1, jnp.bfloat16)
    acc, m, l = qa.fused_q_segment_attention(
        qseg, pool, ks, vs, jnp.int32(nact), jnp.int32(nact * 256), codec, mc)
    out = np.asarray(acc, np.float32) / np.asarray(l, np.float32)
    BH = B * Hkv
    S = nact * 256
    kall = kdeq[:, :nact].reshape(BH, S, D)
    vall = vdeq[:, :nact].reshape(BH, S, D)
    qg = np.asarray(qseg, np.float32).reshape(B, Tseg, Hkv, G, D)
    qg = np.transpose(qg, (0, 2, 1, 3, 4)).reshape(BH, Tseg * G, D)
    s = np.einsum("hqd,htd->hqt", qg, kall) / np.sqrt(D)
    sm = s.max(axis=-1, keepdims=True)
    p = np.exp(s - sm)
    ref = np.einsum("hqt,htd->hqd", p / p.sum(-1, keepdims=True), vall)
    ref = ref.reshape(B, Hkv, Tseg, G, D).transpose(0, 2, 1, 3, 4).reshape(
        B, Tseg, Hkv * G, D)
    np.testing.assert_allclose(out, ref, atol=3e-2 * np.abs(ref).max())


# ---------------------------------------------------------------------------
# cache integration
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("codec", ["q8", "q8q4", "q4q4"])
def test_q_cache_xla_and_interpret_agree(codec):
    """Pallas (interpret) and XLA-fallback decode agree on the same state."""
    eng = _engine(0.7, codec)
    impl_x = CompressedKVCache(eng, use_pallas=False)
    impl_p = CompressedKVCache(eng, use_pallas=True)
    B, Hkv, D = 1, MODEL128.num_kv_heads, MODEL128.head_dim
    Hq = MODEL128.num_heads
    rs = np.random.RandomState(5)
    q = jnp.asarray(rs.randn(B, 512, Hq, D) * 0.3, jnp.float32)
    k = jnp.asarray(rs.randn(B, 512, Hkv, D) * 0.3, jnp.float32)
    v = jnp.asarray(rs.randn(B, 512, Hkv, D) * 0.3, jnp.float32)
    cache = impl_x.init(B, jnp.bfloat16)
    lc = {key: val[0] for key, val in cache.items()}
    _, lc = impl_x.prefill_attend(lc, q, k, v, jnp.int32(500))
    assert int(lc["n_chunks"][0]) == 1
    assert (np.asarray(lc["kv_scales"])[0] != 0).any()
    qd = jnp.asarray(rs.randn(B, 1, Hq, D) * 0.3, jnp.float32)
    kd = jnp.asarray(rs.randn(B, 1, Hkv, D) * 0.3, jnp.float32)
    vd = jnp.asarray(rs.randn(B, 1, Hkv, D) * 0.3, jnp.float32)
    out_x, _ = impl_x.decode_attend(dict(lc), qd, kd, vd, jnp.int32(500))
    out_p, _ = impl_p.decode_attend(dict(lc), qd, kd, vd, jnp.int32(500))
    np.testing.assert_allclose(np.asarray(out_x, np.float32),
                               np.asarray(out_p, np.float32),
                               atol=2e-2 * np.abs(np.asarray(out_x)).max())


def test_q_decode_step_tracks_bitmap():
    """Same pruned state, different codecs: one decode step's output must be
    within quantization noise of the bitmap codec (token trajectories diverge
    chaotically on random weights, so compare a step, not generations)."""
    B, Hkv, D = 1, MODEL128.num_kv_heads, MODEL128.head_dim
    Hq = MODEL128.num_heads
    rs = np.random.RandomState(7)
    q = jnp.asarray(rs.randn(B, 512, Hq, D) * 0.3, jnp.float32)
    k = jnp.asarray(rs.randn(B, 512, Hkv, D) * 0.3, jnp.float32)
    v = jnp.asarray(rs.randn(B, 512, Hkv, D) * 0.3, jnp.float32)
    qd = jnp.asarray(rs.randn(B, 1, Hq, D) * 0.3, jnp.float32)
    zero = jnp.zeros((B, 1, Hkv, D), jnp.float32)
    outs = {}
    for codec in ["bitmap", "q8", "q8q4", "q4q4"]:
        impl = CompressedKVCache(_engine(0.5, codec), use_pallas=False)
        lc = {key: val[0] for key, val in impl.init(B, jnp.bfloat16).items()}
        _, lc = impl.prefill_attend(lc, q, k, v, jnp.int32(500))
        out, _ = impl.decode_attend(dict(lc), qd, zero, zero, jnp.int32(500))
        outs[codec] = np.asarray(out, np.float32)
    ref = np.abs(outs["bitmap"]).max()
    assert np.abs(outs["q8"] - outs["bitmap"]).max() < 0.02 * ref
    assert np.abs(outs["q8q4"] - outs["bitmap"]).max() < 0.15 * ref
    # int4 K perturbs the softmax logits, not just the pv combine — wider
    # noise band, still tracking the exact-bf16 codec
    assert np.abs(outs["q4q4"] - outs["bitmap"]).max() < 0.3 * ref


def test_q_generation_runs():
    """q8q4 generation end-to-end (prefill, decode, compaction past r+C)."""
    params = init_params(MODEL128, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(0).randint(0, 512, size=(2, 300))
    toks = Generator(_engine(0.5, "q8q4"), params,
                     dtype=jnp.bfloat16).generate(prompt, 40)
    assert np.asarray(toks).shape == (2, 40)


def test_q_chunked_prefill_runs():
    eng = _engine(0.7, "q8q4", chunked_prefill=True, max_seq=1024)
    params = init_params(MODEL128, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(1).randint(0, 512, size=(1, 700))
    toks = Generator(eng, params, dtype=jnp.bfloat16).generate(prompt, 20)
    assert np.asarray(toks).shape == (1, 20)


@pytest.mark.parametrize("bits,keep,use_score", [(8, 40, False), (4, 40, False),
                                                 (8, 14, False), (8, 40, True),
                                                 (8, 128, False)])
def test_prune_quant_pack_kernel_matches_xla(bits, keep, use_score):
    """The fused Pallas prune+quantize+pack == the XLA formulation: identical
    scales and keep masks; codes equal except +-1 at exact half-step
    boundaries (x/scale == n.5 computes 1 ulp apart depending on whether XLA
    fuses the divide — sub-quantization-step, numerically immaterial)."""
    from mustafar_tpu.ops.kernels.pack_kernel import prune_quant_pack
    from mustafar_tpu.ops import sparse_format as sf

    rs = np.random.RandomState(42)
    BH, C, D = 4, 256, 128
    x = jnp.asarray(rs.randn(BH, C, D) * 0.3, jnp.bfloat16)
    # inject exact ties (equal magnitudes) to exercise the tie-break rank
    x = x.at[:, :, 10].set(x[:, :, 90])
    x = x.at[:, 5, :].set(0)
    score = jnp.asarray(rs.rand(BH, C, D), jnp.float32) if use_score else None

    codec = qf.QuantCodec(C, D, bits, bits)
    sel = x if score is None else score
    pruned = jnp.where(sf.topk_mask(sel, keep), x, 0).astype(jnp.bfloat16)
    want_rows, want_scales = qf.encode_chunk(pruned, codec, "k")

    got_rows, got_scales = prune_quant_pack(x, keep, bits, score=score)
    np.testing.assert_array_equal(
        np.asarray(got_scales, np.float32), np.asarray(want_scales, np.float32))
    want_c = np.asarray(qf.unpack_rows(want_rows, bits))
    got_c = np.asarray(qf.unpack_rows(got_rows, bits))
    # identical keep masks (zero codes <=> pruned/zero)
    np.testing.assert_array_equal(got_c == 0, want_c == 0)
    diff = np.abs(got_c - want_c)
    assert diff.max() <= 1, diff.max()
    where = np.argwhere(diff == 1)
    # every +-1 sits on an exact half-step boundary of the f32 ratio
    # (recompute the PRE-bf16 f32 scale the encoders divide by)
    xf = np.asarray(pruned, np.float32)
    qmax = 2.0 ** (bits - 1) - 1
    sc = np.maximum(np.abs(xf).max(axis=1) / qmax, 1e-8).astype(np.float32)
    for bh, t, d in where:
        ratio = np.float32(xf[bh, t, d]) / sc[bh, d]
        assert abs(abs(ratio) % 1.0 - 0.5) < 1e-4, (bh, t, d, ratio)


def test_bitmap_q8_cache_tracks_bitmap():
    """bitmap-q8 (int8 NZ payload + per-channel scales): one decode step on
    the same pruned state must track the exact-bf16 bitmap codec within int8
    quantization noise, through the cache (prefill pack -> decode attend)."""
    B, Hkv, D = 1, MODEL128.num_kv_heads, MODEL128.head_dim
    Hq = MODEL128.num_heads
    rs = np.random.RandomState(11)
    q = jnp.asarray(rs.randn(B, 512, Hq, D) * 0.3, jnp.float32)
    k = jnp.asarray(rs.randn(B, 512, Hkv, D) * 0.3, jnp.float32)
    v = jnp.asarray(rs.randn(B, 512, Hkv, D) * 0.3, jnp.float32)
    qd = jnp.asarray(rs.randn(B, 1, Hq, D) * 0.3, jnp.float32)
    zero = jnp.zeros((B, 1, Hkv, D), jnp.float32)
    outs = {}
    for codec in ["bitmap", "bitmap-q8"]:
        impl = CompressedKVCache(_engine(0.7, codec), use_pallas=False)
        lc = {key: val[0] for key, val in impl.init(B, jnp.bfloat16).items()}
        _, lc = impl.prefill_attend(lc, q, k, v, jnp.int32(500))
        assert int(lc["n_chunks"][0]) == 1
        if codec == "bitmap-q8":
            assert (np.asarray(lc["kv_scales"]) != 0).any()
        out, _ = impl.decode_attend(dict(lc), qd, zero, zero, jnp.int32(500))
        outs[codec] = np.asarray(out, np.float32)
    ref = np.abs(outs["bitmap"]).max()
    assert np.abs(outs["bitmap-q8"] - outs["bitmap"]).max() < 0.05 * ref


def test_bitmap_q8_generation_and_kernel_path():
    """bitmap-q8 end-to-end generation (prefill, decode, compaction past
    r+C), and interpret-kernel vs XLA-fallback agreement."""
    params = init_params(MODEL128, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(0).randint(0, 512, size=(2, 300))
    eng = _engine(0.7, "bitmap-q8")
    toks = Generator(eng, params, dtype=jnp.bfloat16).generate(prompt, 40)
    assert np.asarray(toks).shape == (2, 40)

    impl_x = CompressedKVCache(eng, use_pallas=False)
    impl_p = CompressedKVCache(eng, use_pallas=True)
    B, Hkv, D = 1, MODEL128.num_kv_heads, MODEL128.head_dim
    Hq = MODEL128.num_heads
    rs = np.random.RandomState(5)
    q = jnp.asarray(rs.randn(B, 512, Hq, D) * 0.3, jnp.float32)
    k = jnp.asarray(rs.randn(B, 512, Hkv, D) * 0.3, jnp.float32)
    v = jnp.asarray(rs.randn(B, 512, Hkv, D) * 0.3, jnp.float32)
    lc = {key: val[0] for key, val in impl_x.init(B, jnp.bfloat16).items()}
    _, lc = impl_x.prefill_attend(lc, q, k, v, jnp.int32(500))
    qd = jnp.asarray(rs.randn(B, 1, Hq, D) * 0.3, jnp.float32)
    kd = jnp.asarray(rs.randn(B, 1, Hkv, D) * 0.3, jnp.float32)
    vd = jnp.asarray(rs.randn(B, 1, Hkv, D) * 0.3, jnp.float32)
    out_x, _ = impl_x.decode_attend(dict(lc), qd, kd, vd, jnp.int32(500))
    out_p, _ = impl_p.decode_attend(dict(lc), qd, kd, vd, jnp.int32(500))
    np.testing.assert_allclose(np.asarray(out_x, np.float32),
                               np.asarray(out_p, np.float32),
                               atol=2e-2 * np.abs(np.asarray(out_x)).max())


def test_bitmap_q8_chunked_prefill_runs():
    """bitmap-q8 + chunked prefill (segment kernel scale path; VERDICT r3 #2
    closed — the capacity codec now runs exactly where capacity matters)."""
    eng = _engine(0.7, "bitmap-q8", chunked_prefill=True, max_seq=1024)
    params = init_params(MODEL128, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(1).randint(0, 512, size=(1, 700))
    toks = Generator(eng, params, dtype=jnp.bfloat16).generate(prompt, 20)
    assert np.asarray(toks).shape == (1, 20)
    assert len(set(np.asarray(toks)[0].tolist())) > 3


def test_bitmap_q8_continuous_batching_matches_generator():
    """bitmap-q8 through the slot scheduler (per-slot decode + vectorized
    compaction on int8-payload pools + scales) reproduces the single-request
    Generator token-for-token."""
    from mustafar_tpu.runtime.scheduler import ContinuousBatchingEngine
    eng = _engine(0.5, "bitmap-q8", max_seq=1024, batch_size=2)
    params = init_params(MODEL128, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rs = np.random.RandomState(4)
    p1 = rs.randint(0, 512, size=280)    # crosses compaction during decode
    p2 = rs.randint(0, 512, size=400)    # one chunk packed at prefill
    gen = Generator(eng, params, dtype=jnp.bfloat16)
    want1 = gen.generate(p1[None], max_new_tokens=20)[0]
    want2 = gen.generate(p2[None], max_new_tokens=20)[0]

    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16)
    u1, u2 = cb.submit(p1, 20), cb.submit(p2, 20)
    outs = cb.run()
    np.testing.assert_array_equal(outs[u1], want1)
    np.testing.assert_array_equal(outs[u2], want2)
