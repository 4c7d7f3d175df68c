"""Engine state-machine tests (SURVEY.md §4 layer (d)): 256-chunk append,
residual window, prefill/decode parity, lossless-compression equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from mustafar_tpu.config import (CacheMode, EngineConfig, PruneConfig, PruneMethod,
                                 TINY_LLAMA)
from mustafar_tpu.cache import make_cache
from mustafar_tpu.cache.compressed import CompressedKVCache
from mustafar_tpu.cache.dense import DenseKVCache
from mustafar_tpu.models.llama import init_params
from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.runtime.generate import Generator

import dataclasses

# tiny model with head_dim 128 so chunk formats are realistic
MODEL128 = dataclasses.replace(TINY_LLAMA, name="tiny128", num_heads=2,
                               num_kv_heads=1, head_dim=128, hidden_size=128)


def _engine(sparsity, max_seq=1024):
    return EngineConfig(
        model=MODEL128,
        cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=sparsity, v_sparsity=sparsity),
        max_seq_len=max_seq, prefill_bucket=256, chunk_size=256)


def test_compressed_lossless_matches_dense():
    """At sparsity 0 (keep=128) compression is exact, so COMPRESSED generation
    must reproduce DENSE generation token-for-token across prefill chunking,
    window management, and softmax splitting."""
    # bf16 end-to-end: the fused-stream pool stores bf16 (int16-carried), so
    # exactness holds when the dense baseline also runs a bf16 cache.
    params = init_params(MODEL128, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(0).randint(0, 512, size=(2, 300))

    dense_eng = EngineConfig(model=MODEL128, cache_mode=CacheMode.DENSE,
                             max_seq_len=1024, prefill_bucket=256)
    # legacy (per-layer, single-softmax) decode protocol: the bit-exact
    # semantic reference; the compressed XLA fallback computes the identical
    # softmax over [pool ++ window] incl. self.  The production stacked
    # protocol splits the softmax (flash partials) and is compared with
    # tolerances in test_model_parity / test_dense_decode instead.
    dense_gen = Generator(dense_eng, params, dtype=jnp.bfloat16)
    dense_gen.cache_impl = DenseKVCache(dense_eng, stacked_decode=False)
    dense = dense_gen.generate(prompt, 40)

    comp = Generator(_engine(0.0), params, dtype=jnp.bfloat16).generate(prompt, 40)
    for a, b in zip(dense, comp):
        np.testing.assert_array_equal(a, b)


def test_prefill_chunking_and_window():
    """Prefill with true_len=600, r=32: comp_len = ((600-32)//256)*256 = 512,
    so 2 chunks pack the pruned prefix and the window holds tokens 512..600."""
    eng = _engine(0.7)
    impl = CompressedKVCache(eng, use_pallas=False)
    B, Hkv, D = 1, MODEL128.num_kv_heads, MODEL128.head_dim
    rs = np.random.RandomState(1)
    T, true_len = 768, 600
    q = jnp.asarray(rs.randn(B, T, MODEL128.num_heads, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, T, Hkv, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, T, Hkv, D), jnp.float32)
    cache = impl.init(B, jnp.float32)
    lc = {key: val[0] for key, val in cache.items()}
    _, lc = impl.prefill_attend(lc, q, k, v, jnp.int32(true_len))

    assert int(lc["n_chunks"][0]) == 2
    # pools hold the exact-top-k pruned prefix
    KR = impl.kfmt.stream_rows
    k_dense = np.asarray(impl._decode_pool(lc["kv_pool"][..., :KR, :], impl.kfmt, B),
                         np.float32)
    kk = np.asarray(k)[0].transpose(1, 0, 2)           # [Hkv, T, D]
    kk_bf = jnp.asarray(kk[:, :512], jnp.bfloat16)     # packing casts to bf16
    mask = np.asarray(sf.topk_mask(kk_bf, impl.kfmt.keep))
    want = np.asarray(kk_bf, np.float32) * mask
    np.testing.assert_allclose(k_dense[0, :, :512], want, atol=1e-6)
    assert (k_dense[0, :, 512:] == 0).all()
    # window holds tokens 512..600 dense, zero beyond
    kw = np.asarray(lc["k_win"])[0]                    # [Hkv, Wcap, D]
    np.testing.assert_allclose(kw[:, :88],
                               np.asarray(k)[0, 512:600].transpose(1, 0, 2),
                               atol=1e-6)
    assert (kw[:, 88:] == 0).all()


def test_decode_compaction_appends_chunk():
    """Decoding past window capacity (r + C) packs the oldest C window tokens
    into the pools and shifts the window (reference llama_mustafar_kernel.py:324-398)."""
    eng = _engine(0.7)
    impl = CompressedKVCache(eng, use_pallas=False)
    B, Hkv, D = 1, MODEL128.num_kv_heads, MODEL128.head_dim
    Hq = MODEL128.num_heads
    rs = np.random.RandomState(2)
    T = 256
    # prefill exactly r+... : true_len=288 -> comp_len = 256, window len 32
    q = jnp.asarray(rs.randn(B, 512, Hq, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, 512, Hkv, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, 512, Hkv, D), jnp.float32)
    cache = impl.init(B, jnp.float32)
    lc = {key: val[0] for key, val in cache.items()}
    _, lc = impl.prefill_attend(lc, q, k, v, jnp.int32(288))
    assert int(lc["n_chunks"][0]) == 1

    # decode steps until the window refills to r + C = 288 (need 256 steps)
    kept_k = []
    pos = 288
    for step in range(256):
        qd = jnp.asarray(rs.randn(B, 1, Hq, D), jnp.float32)
        kd = jnp.asarray(rs.randn(B, 1, Hkv, D), jnp.float32)
        vd = jnp.asarray(rs.randn(B, 1, Hkv, D), jnp.float32)
        kept_k.append(np.asarray(kd)[0, 0])
        out, lc = impl.decode_attend(lc, qd, kd, vd, jnp.int32(pos))
        assert out.shape == (B, 1, Hq, D)
        pos += 1
        if impl.needs_compact(pos):
            lc = impl.compact_layer(lc)
        expect_chunks = 2 if pos >= 288 + 256 else 1
        assert int(lc["n_chunks"][0]) == expect_chunks, (step, pos)
    # after compaction the window restarts with the residual (32 tokens)
    win_len = pos - int(lc["n_chunks"][0]) * 256
    assert win_len == 32
    kw = np.asarray(lc["k_win"])[0]                    # [Hkv, Wcap, D]
    # window rows = the last 32 appended tokens
    np.testing.assert_allclose(kw[:, :32],
                               np.stack(kept_k[-32:]).transpose(1, 0, 2),
                               atol=1e-6)
    assert (kw[:, 32:] == 0).all()


def test_xla_and_interpret_kernel_paths_agree():
    """The pallas (interpret) path and the XLA fallback must produce the same
    decode output from the same cache state."""
    eng = _engine(0.7)
    impl_x = CompressedKVCache(eng, use_pallas=False)
    impl_p = CompressedKVCache(eng, use_pallas=True)   # interpret on CPU
    B, Hkv, D = 1, MODEL128.num_kv_heads, MODEL128.head_dim
    Hq = MODEL128.num_heads
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(B, 512, Hq, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, 512, Hkv, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, 512, Hkv, D), jnp.float32)
    cache = impl_x.init(B, jnp.float32)
    lc = {key: val[0] for key, val in cache.items()}
    _, lc = impl_x.prefill_attend(lc, q, k, v, jnp.int32(500))

    qd = jnp.asarray(rs.randn(B, 1, Hq, D), jnp.float32)
    kd = jnp.asarray(rs.randn(B, 1, Hkv, D), jnp.float32)
    vd = jnp.asarray(rs.randn(B, 1, Hkv, D), jnp.float32)
    out_x, _ = impl_x.decode_attend(dict(lc), qd, kd, vd, jnp.int32(500))
    out_p, _ = impl_p.decode_attend(dict(lc), qd, kd, vd, jnp.int32(500))
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               rtol=2e-2, atol=2e-2)


def test_compressed_gqa_generation():
    """GQA (Hkv=2, G=2) compressed-mode generation runs and matches masked-mode
    generation closely at moderate sparsity (same pruning rule, different
    pruning *schedule*: chunked vs per-token — identical prefix handling)."""
    model = dataclasses.replace(TINY_LLAMA, name="tiny-gqa128", num_heads=4,
                                num_kv_heads=2, head_dim=128, hidden_size=256)
    params = init_params(model, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(1).randint(0, 512, size=(2, 300))
    eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.7, v_sparsity=0.7),
                       max_seq_len=1024, prefill_bucket=256, chunk_size=256)
    out = Generator(eng, params, dtype=jnp.bfloat16).generate(prompt, 24)
    assert len(out) == 2 and all(len(o) == 24 for o in out)
    # degenerate outputs (all same token) would indicate a broken kernel path
    assert len(set(out[0].tolist())) > 3


def test_exact_keep_fast_mode():
    """exact_keep=32 selects the single-segment format and still generates."""
    eng = EngineConfig(
        model=MODEL128, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=0.7, v_sparsity=0.7, exact_keep=32),
        max_seq_len=1024, prefill_bucket=256, chunk_size=256)
    impl = CompressedKVCache(eng, use_pallas=False)
    assert impl.kfmt.segs == (32,)
    assert impl.kfmt.compression_ratio > 3.0
    params = init_params(MODEL128, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(0).randint(0, 512, size=(1, 300))
    out = Generator(eng, params, dtype=jnp.bfloat16).generate(prompt, 12)
    assert len(out[0]) == 12


def test_compressed_sliding_window_lossless_matches_dense():
    """Sliding-window model, sparsity 0: compressed generation must equal the
    dense engine's token-for-token (validates window masking of chunks)."""
    model = dataclasses.replace(MODEL128, name="tiny128swa", sliding_window=320)
    params = init_params(model, jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(6).randint(0, 512, size=(1, 420))

    dense_eng = EngineConfig(model=model, cache_mode=CacheMode.DENSE,
                             max_seq_len=1024, prefill_bucket=256)
    dense_gen = Generator(dense_eng, params, dtype=jnp.bfloat16)
    dense_gen.cache_impl = DenseKVCache(dense_eng, stacked_decode=False)
    dense = dense_gen.generate(prompt, 30)

    comp_eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                            prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                              k_sparsity=0.0, v_sparsity=0.0),
                            max_seq_len=1024, prefill_bucket=256, chunk_size=256)
    comp = Generator(comp_eng, params, dtype=jnp.bfloat16).generate(prompt, 30)
    np.testing.assert_array_equal(dense[0], comp[0])


def test_compressed_sliding_window_sparse_runs():
    model = dataclasses.replace(MODEL128, name="tiny128swa2", sliding_window=512)
    params = init_params(model, jax.random.PRNGKey(4), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(7).randint(0, 512, size=(1, 600))
    eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.7, v_sparsity=0.7),
                       max_seq_len=1024, prefill_bucket=256, chunk_size=256)
    out = Generator(eng, params, dtype=jnp.bfloat16).generate(prompt, 16)
    assert len(out[0]) == 16


def test_compressed_mha_generation():
    """MHA-style (G=1, Hkv=Hq) compressed generation (llama-2 head geometry)."""
    model = dataclasses.replace(TINY_LLAMA, name="tiny-mha128", num_heads=2,
                                num_kv_heads=2, head_dim=128, hidden_size=256)
    params = init_params(model, jax.random.PRNGKey(5), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(8).randint(0, 512, size=(2, 300))
    eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.7, v_sparsity=0.7),
                       max_seq_len=1024, prefill_bucket=256, chunk_size=256)
    out = Generator(eng, params, dtype=jnp.bfloat16).generate(prompt, 16)
    assert all(len(o) == 16 for o in out)


def test_chunked_prefill_lossless_matches_monolithic():
    """Chunked (segment-streamed) prefill at sparsity 0: the pruned past seen
    by each segment equals the dense past (bf16), so chunked prefill must
    reproduce monolithic-prefill logits and cache state, including the final
    partial segment's window split."""
    from mustafar_tpu.models import llama
    params = init_params(MODEL128, jax.random.PRNGKey(6), dtype=jnp.bfloat16)
    eng = _engine(0.0, max_seq=2048)
    B, T, true_len = 2, 768, 700
    tokens = jnp.asarray(np.random.RandomState(11).randint(0, 512, (B, T)))

    impl = CompressedKVCache(eng, use_pallas=True)   # interpret kernels on CPU
    ref_logits, ref_cache = jax.jit(
        lambda p, t, c: llama.prefill(MODEL128, p, t, c, impl,
                                      jnp.int32(true_len), last_only=True)
    )(params, tokens, impl.init(B, jnp.bfloat16))

    got_logits, got_cache = jax.jit(
        lambda p, t, c: llama.prefill_chunked(MODEL128, p, t, c, impl,
                                              jnp.int32(true_len))
    )(params, tokens, impl.init(B, jnp.bfloat16))

    # state invariants: same chunk count, same window occupancy
    np.testing.assert_array_equal(np.asarray(got_cache["n_chunks"]),
                                  np.asarray(ref_cache["n_chunks"]))
    # lossless pools hold identical bf16 values
    np.testing.assert_allclose(
        np.asarray(sf.decode_stream(
            got_cache["kv_pool"][0].reshape(impl.max_chunks, -1,
                                            2 * impl.kfmt.stream_rows, 128)[
                :, :, :impl.kfmt.stream_rows], impl.kfmt), np.float32),
        np.asarray(sf.decode_stream(
            ref_cache["kv_pool"][0].reshape(impl.max_chunks, -1,
                                            2 * impl.kfmt.stream_rows, 128)[
                :, :, :impl.kfmt.stream_rows], impl.kfmt), np.float32),
        atol=0.1, rtol=0.1)   # bf16 accum-order noise in deep-layer k/v
    np.testing.assert_allclose(np.asarray(got_cache["k_win"], np.float32),
                               np.asarray(ref_cache["k_win"], np.float32),
                               atol=0.1, rtol=0.1)
    # final-token logits agree (bf16 accumulation-order tolerance)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=0.15, rtol=0.05)


def test_chunked_prefill_sparse_decodes():
    """Pruned chunked prefill runs end to end and the resulting cache decodes
    greedily to the same tokens as monolithic prefill at moderate sparsity."""
    from mustafar_tpu.models import llama
    params = init_params(MODEL128, jax.random.PRNGKey(7), dtype=jnp.bfloat16)
    eng = _engine(0.5, max_seq=2048)
    B, T, true_len = 1, 512, 512
    tokens = jnp.asarray(np.random.RandomState(12).randint(0, 512, (B, T)))
    impl = CompressedKVCache(eng, use_pallas=True)

    logits, cache = jax.jit(
        lambda p, t, c: llama.prefill_chunked(MODEL128, p, t, c, impl,
                                              jnp.int32(true_len))
    )(params, tokens, impl.init(B, jnp.bfloat16))
    assert bool(jnp.isfinite(logits).all())
    tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
    step = jax.jit(lambda p, t, c, pos: llama.decode_step(
        MODEL128, p, t, c, impl, pos))
    outs = []
    pos = true_len
    for _ in range(8):
        logits2, cache = step(params, tok, cache, jnp.int32(pos))
        tok = jnp.argmax(logits2[:, 0], axis=-1).astype(jnp.int32)[:, None]
        outs.append(int(tok[0, 0]))
        pos += 1
    assert len(outs) == 8


def test_generator_chunked_prefill():
    """Generator with chunked_prefill=True reproduces monolithic compressed
    generation (fixed seed; lossless so prefill paths agree numerically)."""
    params = init_params(MODEL128, jax.random.PRNGKey(8), dtype=jnp.bfloat16)
    prompt = np.random.RandomState(13).randint(0, 512, size=(2, 700))
    eng = _engine(0.0, max_seq=2048)
    mono = Generator(eng, params, dtype=jnp.bfloat16).generate(prompt, 20)
    engc = dataclasses.replace(eng, chunked_prefill=True)
    chunk = Generator(engc, params, dtype=jnp.bfloat16).generate(prompt, 20)
    # bf16 accumulation-order noise can flip a near-tie argmax late in the
    # rollout; require the first 5 tokens of every sequence to match.
    for a, b in zip(mono, chunk):
        np.testing.assert_array_equal(a[:5], b[:5])
