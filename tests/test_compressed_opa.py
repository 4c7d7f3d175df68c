"""Output-aware (Opa) pruning in COMPRESSED mode.

The reference's compressed-kernel engine is Mag-only
(llama_mustafar_kernel.py:77-153); Opa-in-compressed goes beyond it by
combining the reference's Opa scoring rules (llama_mustafar_Kt_Opa_Vt_Mag.py,
llama_mustafar_Kt_Mag_Vt_Opa.py) with the static-pool storage: scores
accumulate per window column, compaction packs by top-k-of-score, and the
post-softmax weights come from the decode kernels' (m, l) stats.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mustafar_tpu.config import (CacheMode, EngineConfig, PruneConfig,
                                 PruneMethod, TINY_LLAMA)
from mustafar_tpu.cache.compressed import CompressedKVCache
from mustafar_tpu.models.llama import init_params
from mustafar_tpu.runtime.generate import Generator

MODEL128 = dataclasses.replace(TINY_LLAMA, name="tiny128", num_heads=2,
                               num_kv_heads=1, head_dim=128, hidden_size=128)


def _engine(method, sparsity=0.7, codec="bitmap", max_seq=1024):
    return EngineConfig(
        model=MODEL128, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=method, k_sparsity=sparsity,
                          v_sparsity=sparsity),
        max_seq_len=max_seq, prefill_bucket=256, chunk_size=256, codec=codec)


def _prefill(impl, rs, B=1, T=512, true_len=500):
    Hq, Hkv, D = MODEL128.num_heads, MODEL128.num_kv_heads, MODEL128.head_dim
    q = jnp.asarray(rs.randn(B, T, Hq, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, T, Hkv, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, T, Hkv, D), jnp.float32)
    cache = impl.init(B, jnp.float32)
    lc = {key: val[0] for key, val in cache.items()}
    _, lc = impl.prefill_attend(lc, q, k, v, jnp.int32(true_len))
    return lc


def test_opa_state_and_accumulation():
    """v_score accumulates only at live window columns and grows per step."""
    impl = CompressedKVCache(_engine(PruneMethod.KT_MAG_VT_OPA),
                             use_pallas=False)
    rs = np.random.RandomState(0)
    lc = _prefill(impl, rs)                     # 500 = 1 chunk + win_len 244
    assert "v_score" in lc and "k_score" not in lc
    assert (np.asarray(lc["v_score"]) == 0).all()   # prefill leaves them 0

    Hq, Hkv, D = MODEL128.num_heads, MODEL128.num_kv_heads, MODEL128.head_dim
    pos = 500
    prev = np.zeros_like(np.asarray(lc["v_score"]))
    for _ in range(3):
        qd = jnp.asarray(rs.randn(1, 1, Hq, D), jnp.float32)
        kd = jnp.asarray(rs.randn(1, 1, Hkv, D), jnp.float32)
        vd = jnp.asarray(rs.randn(1, 1, Hkv, D), jnp.float32)
        _, lc = impl.decode_attend(lc, qd, kd, vd, jnp.int32(pos))
        pos += 1
        win_len = pos - int(lc["n_chunks"][0]) * impl.C
        vs = np.asarray(lc["v_score"])           # [B,Hkv,wcap,D]
        assert (vs[:, :, win_len:] == 0).all()
        assert (vs[:, :, :win_len] >= prev[:, :, :win_len]).all()
        assert vs[:, :, :win_len].sum() > prev[:, :, :win_len].sum()
        prev = vs


def test_opa_xla_vs_kernel_paths_agree():
    """XLA fallback (full softmax weights) and the pallas path ((m, l)
    reconstruction) must produce matching outputs AND score accumulators,
    for both chunk codecs."""
    Hq, Hkv, D = MODEL128.num_heads, MODEL128.num_kv_heads, MODEL128.head_dim
    for codec in ("bitmap", "q8q4"):
        eng = _engine(PruneMethod.KT_MAG_VT_OPA, codec=codec)
        impl_x = CompressedKVCache(eng, use_pallas=False)
        impl_p = CompressedKVCache(eng, use_pallas=True)  # interpret on CPU
        rs = np.random.RandomState(3)
        lc = _prefill(impl_x, rs)
        qd = jnp.asarray(rs.randn(1, 1, Hq, D), jnp.float32)
        kd = jnp.asarray(rs.randn(1, 1, Hkv, D), jnp.float32)
        vd = jnp.asarray(rs.randn(1, 1, Hkv, D), jnp.float32)
        out_x, lc_x = impl_x.decode_attend(dict(lc), qd, kd, vd, jnp.int32(500))
        out_p, lc_p = impl_p.decode_attend(dict(lc), qd, kd, vd, jnp.int32(500))
        np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(lc_x["v_score"]),
                                   np.asarray(lc_p["v_score"]),
                                   rtol=5e-2, atol=5e-4)


def test_opa_per_slot_paths_agree():
    """Per-slot decode (pos [B], continuous batching): kernel window probs
    (computed in XLA alongside the flash merge) match the fallback's."""
    model = dataclasses.replace(TINY_LLAMA, name="tiny-ps", num_heads=16,
                                num_kv_heads=8, head_dim=128, hidden_size=2048)
    eng = EngineConfig(
        model=model, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_OPA,
                          k_sparsity=0.7, v_sparsity=0.7),
        max_seq_len=1024, prefill_bucket=256, chunk_size=256, codec="q8q4")
    impl_x = CompressedKVCache(eng, use_pallas=False)
    impl_p = CompressedKVCache(eng, use_pallas=True)
    B, Hq, Hkv, D = 2, 16, 8, 128
    rs = np.random.RandomState(5)
    q = jnp.asarray(rs.randn(B, 512, Hq, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, 512, Hkv, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, 512, Hkv, D), jnp.float32)
    cache = impl_x.init(B, jnp.float32)
    lc = {key: val[0] for key, val in cache.items()}
    _, lc = impl_x.prefill_attend(lc, q, k, v, jnp.int32(500))

    pos = jnp.asarray([500, 500], jnp.int32)     # uniform values, vector form
    qd = jnp.asarray(rs.randn(B, 1, Hq, D), jnp.float32)
    kd = jnp.asarray(rs.randn(B, 1, Hkv, D), jnp.float32)
    vd = jnp.asarray(rs.randn(B, 1, Hkv, D), jnp.float32)
    out_x, lc_x = impl_x.decode_attend(dict(lc), qd, kd, vd, pos)
    out_p, lc_p = impl_p.decode_attend(dict(lc), qd, kd, vd, pos)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(lc_x["v_score"]),
                               np.asarray(lc_p["v_score"]),
                               rtol=5e-2, atol=5e-4)


def test_pack_uses_scores_not_magnitude():
    """With an adversarial score (ranking opposite to |x|), the packed chunk
    must keep the top-SCORE elements — proof the Opa ranking reaches the
    codec."""
    eng = _engine(PruneMethod.KT_MAG_VT_OPA, sparsity=0.5, codec="bitmap")
    impl = CompressedKVCache(eng, use_pallas=False)
    B, Hkv, C, D = 1, 1, impl.C, MODEL128.head_dim
    rs = np.random.RandomState(7)
    k_chunk = jnp.asarray(rs.randn(B, Hkv, C, D), jnp.float32)
    v_chunk = jnp.asarray(rs.randn(B, Hkv, C, D), jnp.float32)
    # score = 1/(|v|+eps): smallest-|v| elements must win
    v_score = 1.0 / (jnp.abs(v_chunk) + 1e-3)
    rows6, _ = impl._pack_rows_scales(k_chunk, v_chunk, None, v_score)

    import mustafar_tpu.ops.sparse_format as sf
    rows = rows6.reshape(B * Hkv, -1, 128)
    KR = impl.kfmt.stream_rows
    v_dec = sf.decode_stream(rows[:, KR:][None], impl.vfmt)[0]   # [BH, C, D]
    kept = np.asarray(v_dec[0] != 0)
    mag = np.abs(np.asarray(v_chunk[0, 0]))
    keep = impl.v_keep
    for t in range(0, C, 37):
        idx = np.argsort(-np.asarray(v_score[0, 0, t]))[:keep]
        expect = np.zeros(D, bool)
        expect[idx] = True
        assert (kept[t] == expect).all(), t
        # and it is NOT the magnitude ranking
        mag_idx = np.argsort(-mag[t])[:keep]
        assert set(idx.tolist()) != set(mag_idx.tolist())


def test_compaction_shifts_scores():
    """Compaction consumes the oldest C columns' scores and shifts the rest,
    exactly like the window buffers."""
    impl = CompressedKVCache(_engine(PruneMethod.KT_OPA_VT_MAG),
                             use_pallas=False)
    rs = np.random.RandomState(11)
    lc = _prefill(impl, rs, T=512, true_len=288)    # 1 chunk, win_len 32
    Hq, Hkv, D = MODEL128.num_heads, MODEL128.num_kv_heads, MODEL128.head_dim
    pos = 288
    for _ in range(256):                             # fill window to r + C
        qd = jnp.asarray(rs.randn(1, 1, Hq, D), jnp.float32)
        kd = jnp.asarray(rs.randn(1, 1, Hkv, D), jnp.float32)
        vd = jnp.asarray(rs.randn(1, 1, Hkv, D), jnp.float32)
        _, lc = impl.decode_attend(lc, qd, kd, vd, jnp.int32(pos))
        pos += 1
        if impl.needs_compact(pos):
            before = np.asarray(lc["k_score"])
            lc = impl.compact_layer(lc)
            after = np.asarray(lc["k_score"])
            C = impl.C
            np.testing.assert_allclose(after[:, :, :impl.wcap - C],
                                       before[:, :, C:], rtol=0, atol=0)
            assert (after[:, :, impl.wcap - C:] == 0).all()
    assert int(lc["n_chunks"][0]) == 2


def test_opa_compressed_generation():
    """End-to-end generation through the Generator for both Opa methods and
    both codecs (XLA fallback on CPU; kernels covered by the parity tests)."""
    params = init_params(MODEL128, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(0).randint(0, 512, size=(2, 300))
    for method in (PruneMethod.KT_OPA_VT_MAG, PruneMethod.KT_MAG_VT_OPA):
        for codec in ("bitmap", "q8q4"):
            eng = _engine(method, codec=codec)
            out = Generator(eng, params, dtype=jnp.bfloat16).generate(prompt, 16)
            assert len(out) == 2 and all(len(o) == 16 for o in out)
            assert len(set(out[0].tolist())) > 3, (method, codec)


def test_opa_chunked_prefill_streaming():
    """Opa x chunked prefill (streaming scores, lookahead-C truncation of the
    reference's full-prompt rule — cache/compressed.py segment_attend): runs
    end to end, leaves intra-segment scores on the final window, packs with
    score ranking, and decode keeps accumulating on the same buffers."""
    from mustafar_tpu.models import llama
    params = init_params(MODEL128, jax.random.PRNGKey(9), dtype=jnp.bfloat16)
    B, T, true_len = 1, 768, 700
    tokens = jnp.asarray(np.random.RandomState(17).randint(0, 512, (B, T)))
    Hq, Hkv, D = MODEL128.num_heads, MODEL128.num_kv_heads, MODEL128.head_dim
    for method, key in ((PruneMethod.KT_OPA_VT_MAG, "k_score"),
                        (PruneMethod.KT_MAG_VT_OPA, "v_score")):
        for use_pallas in (False, True):   # XLA fallback + interpret kernels
            eng = _engine(method, sparsity=0.5, codec="q8q4", max_seq=2048)
            impl = CompressedKVCache(eng, use_pallas=use_pallas)
            logits, cache = jax.jit(
                lambda p, t, c: llama.prefill_chunked(
                    MODEL128, p, t, c, impl, jnp.int32(true_len))
            )(params, tokens, impl.init(B, jnp.bfloat16))
            assert bool(jnp.isfinite(logits).all()), (method, use_pallas)
            assert int(cache["n_chunks"][0, 0]) == 2          # 700 -> 2 chunks
            sc = np.asarray(cache[key])                       # [L,B,Hkv,wcap,D]
            win_len = 700 - 2 * impl.C
            assert sc[:, :, :, :win_len].sum() > 0            # streaming scores
            assert (sc[:, :, :, win_len:] == 0).all()         # only live cols
            # decode continues accumulating on the same state
            rs = np.random.RandomState(18)
            qd = jnp.asarray(rs.randn(B, 1, Hq, D), jnp.bfloat16)
            kd = jnp.asarray(rs.randn(B, 1, Hkv, D), jnp.bfloat16)
            vd = jnp.asarray(rs.randn(B, 1, Hkv, D), jnp.bfloat16)
            lc = {k2: v2[0] for k2, v2 in cache.items()}
            _, lc2 = impl.decode_attend(lc, qd, kd, vd, jnp.int32(700))
            assert (np.asarray(lc2[key])[:, :, :win_len + 1]
                    >= sc[0][:, :, :win_len + 1] - 1e-6).all()


def test_opa_chunked_pack_ranking_differs_from_mag():
    """At 0.5 sparsity the streaming Opa ranking must actually reach the
    chunk codec: K-Opa's |mean|q| * k| reweights CHANNELS within a token row,
    so the packed pools differ from the Mag ranking's on the same inputs.
    (V-Opa's per-token scalar prob cannot reorder within a row under the
    per-row keep budget — |p*v| is proportional to |v| there — so the V pool
    is the discriminating-free case; K is the one that must move.)"""
    from mustafar_tpu.models import llama
    params = init_params(MODEL128, jax.random.PRNGKey(10), dtype=jnp.bfloat16)
    B, T, true_len = 1, 768, 700
    tokens = jnp.asarray(np.random.RandomState(19).randint(0, 512, (B, T)))
    pools = {}
    for method in (PruneMethod.KT_MAG_VT_MAG, PruneMethod.KT_OPA_VT_MAG):
        eng = _engine(method, sparsity=0.5, codec="q8q4", max_seq=2048)
        impl = CompressedKVCache(eng, use_pallas=False)
        _, cache = jax.jit(
            lambda p, t, c: llama.prefill_chunked(
                MODEL128, p, t, c, impl, jnp.int32(true_len))
        )(params, tokens, impl.init(B, jnp.bfloat16))
        pools[method] = np.asarray(cache["kv_pool"])
    assert (pools[PruneMethod.KT_MAG_VT_MAG]
            != pools[PruneMethod.KT_OPA_VT_MAG]).any()


def test_opa_chunked_lossless_at_zero_sparsity():
    """Sparsity 0 keeps everything, so chunked Opa generation must equal
    chunked Mag generation token-for-token (through the Generator)."""
    params = init_params(MODEL128, jax.random.PRNGKey(12), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(21).randint(0, 512, size=(1, 700))
    outs = []
    for method in (PruneMethod.KT_MAG_VT_MAG, PruneMethod.KT_MAG_VT_OPA,
                   PruneMethod.KT_OPA_VT_MAG):
        eng = dataclasses.replace(_engine(method, sparsity=0.0, max_seq=2048),
                                  chunked_prefill=True)
        outs.append(Generator(eng, params, dtype=jnp.bfloat16)
                    .generate(prompt, 20)[0].tolist())
    assert outs[0] == outs[1] == outs[2]


def test_opa_lossless_at_zero_sparsity():
    """Sparsity 0 keeps every element regardless of ranking, so Opa compressed
    generation must equal Mag compressed generation token-for-token."""
    params = init_params(MODEL128, jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(4).randint(0, 512, size=(1, 300))
    outs = []
    for method in (PruneMethod.KT_MAG_VT_MAG, PruneMethod.KT_MAG_VT_OPA,
                   PruneMethod.KT_OPA_VT_MAG):
        eng = _engine(method, sparsity=0.0)
        outs.append(Generator(eng, params, dtype=jnp.bfloat16)
                    .generate(prompt, 24)[0].tolist())
    assert outs[0] == outs[1] == outs[2]
