"""Weight-only int8 quantization (models/quant.py).

The reference serves fp16 weights only (pred_long_bench.py:110); W8 is a
beyond-reference serving capability (halves weight streaming + residency).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mustafar_tpu.config import (CacheMode, EngineConfig, PruneConfig,
                                 PruneMethod, TINY_LLAMA)
from mustafar_tpu.models import quant
from mustafar_tpu.models.llama import init_params, lm_forward
from mustafar_tpu.runtime.generate import Generator

MODEL = dataclasses.replace(TINY_LLAMA, head_dim=128, num_heads=2,
                            num_kv_heads=1, hidden_size=128)


def test_quant_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96), jnp.float32)
    q, s = quant._quant_last(w)
    deq = q.astype(jnp.float32) * s
    # symmetric per-channel int8: |err| <= scale/2 = max|w_col| / 254
    bound = jnp.max(jnp.abs(w), axis=0) / 254.0 + 1e-7
    assert jnp.all(jnp.abs(deq - w) <= bound[None, :])


def test_quantize_params_shapes_and_idempotence():
    params = init_params(MODEL, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    qp = quant.quantize_params(params)
    L = MODEL.num_layers
    assert qp["layers"]["w_gate"].dtype == jnp.int8
    assert qp["layers"]["w_gate_scale"].shape == (L, MODEL.intermediate_size)
    assert qp["embed"].dtype == jnp.int8
    assert qp["embed_scale"].shape == (MODEL.vocab_size,)
    assert quant.weight_bytes(qp) < 0.6 * quant.weight_bytes(params)
    qp2 = quant.quantize_params(qp)   # idempotent
    assert qp2["layers"]["w_gate"] is qp["layers"]["w_gate"]


def test_w8_logits_close_to_bf16():
    params = init_params(MODEL, jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    qp = quant.quantize_params(params)
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 64)))
    lf = lm_forward(MODEL, params, toks)
    lq = lm_forward(MODEL, qp, toks)
    # per-channel W8 keeps logits close; compare softmax mass (KL)
    pf = jax.nn.log_softmax(lf, -1)
    pq = jax.nn.log_softmax(lq, -1)
    kl = jnp.sum(jnp.exp(pf) * (pf - pq), -1).mean()
    assert float(kl) < 0.05, float(kl)


def test_w4_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(4), (256, 96), jnp.float32)
    q, s = quant._quant_block4(w, 128)
    deq = (q.astype(jnp.float32).reshape(2, 128, 96)
           * s[:, None, :]).reshape(256, 96)
    # symmetric blocked int4: |err| <= scale/2 = max|w_block_col| / 14
    bound = (jnp.max(jnp.abs(w.reshape(2, 128, 96)), axis=1) / 14.0 + 1e-7)
    err = jnp.abs(deq - w).reshape(2, 128, 96)
    assert jnp.all(err <= bound[:, None, :] * 1.001)


def test_w4_pack_roundtrip_exact():
    codes = jax.random.randint(jax.random.PRNGKey(10), (2, 384, 160),
                               -7, 8, jnp.int8)
    carriers = quant.pack_w4(codes)
    assert carriers.dtype == jnp.int16
    assert carriers.shape == (2, 96, 160)
    np.testing.assert_array_equal(np.asarray(quant.unpack_w4(carriers)),
                                  np.asarray(codes.astype(jnp.int32)))


def test_w4_params_shapes_and_idempotence():
    params = init_params(MODEL, jax.random.PRNGKey(5), dtype=jnp.bfloat16)
    qp = quant.quantize_params_w4(params)
    L = MODEL.num_layers
    assert qp["layers"]["w_gate"].dtype == jnp.int16    # nibble carriers
    # hidden 128 -> 32 carrier rows, one 128-block along the in axis
    assert qp["layers"]["w_gate"].shape == (L, 32, MODEL.intermediate_size)
    assert qp["layers"]["w_gate_scale"].shape == (L, 1,
                                                  MODEL.intermediate_size)
    assert qp["embed"].dtype == jnp.int8     # embed stays W8 (gathered)
    assert quant.weight_bytes(qp) < 0.35 * quant.weight_bytes(params)
    qp2 = quant.quantize_params_w4(qp)
    assert qp2["layers"]["w_gate"] is qp["layers"]["w_gate"]


def test_w4_kernel_matches_dequant_path():
    # the decode-path Pallas kernel (interpret mode here) must compute the
    # same linear map as the transient-dequant XLA path used at prefill.
    from mustafar_tpu.ops.kernels.w4_matmul import w4_matmul
    key = jax.random.PRNGKey(6)
    w = jax.random.normal(key, (256, 384), jnp.float32) / 16.0
    q, s = quant._quant_block4(w, 128)
    carriers, sb = quant.pack_w4(q), s.astype(jnp.bfloat16)
    h = jax.random.normal(jax.random.PRNGKey(7), (4, 256), jnp.bfloat16)
    got = w4_matmul(h, carriers, sb, interpret=True)
    ref = quant.proj(jnp.tile(h, (32, 1)),           # tokens=128 -> dequant
                     {"w": carriers, "w_scale": sb}, "w")[:4]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=0, atol=0.02)


def test_w4_logits_close_to_bf16():
    params = init_params(MODEL, jax.random.PRNGKey(8), dtype=jnp.bfloat16)
    qp = quant.quantize_params_w4(params)
    toks = jnp.asarray(np.random.RandomState(2).randint(0, 512, (2, 64)))
    pf = jax.nn.log_softmax(lm_forward(MODEL, params, toks), -1)
    pq = jax.nn.log_softmax(lm_forward(MODEL, qp, toks), -1)
    kl = jnp.sum(jnp.exp(pf) * (pf - pq), -1).mean()
    # 4-bit blocked: looser than W8 but must stay a faithful model
    assert float(kl) < 0.2, float(kl)


def test_w4_generation_all_cache_modes():
    params = init_params(MODEL, jax.random.PRNGKey(9), dtype=jnp.bfloat16)
    qp = quant.quantize_params_w4(params)
    prompt = np.random.RandomState(3).randint(0, 512, size=(2, 300))
    for mode, codec in [(CacheMode.DENSE, "bitmap"),
                        (CacheMode.MASKED, "bitmap"),
                        (CacheMode.COMPRESSED, "q8q4")]:
        eng = EngineConfig(model=MODEL, cache_mode=mode,
                           prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                             k_sparsity=0.5, v_sparsity=0.5),
                           max_seq_len=1024, prefill_bucket=256,
                           chunk_size=256, codec=codec)
        out = Generator(eng, qp, dtype=jnp.bfloat16).generate(
            prompt, max_new_tokens=40)
        assert all(len(o) == 40 for o in out), mode


def test_w8_generation_all_cache_modes():
    params = init_params(MODEL, jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    qp = quant.quantize_params(params)
    prompt = np.random.RandomState(1).randint(0, 512, size=(2, 300))
    for mode, codec in [(CacheMode.DENSE, "bitmap"),
                        (CacheMode.MASKED, "bitmap"),
                        (CacheMode.COMPRESSED, "q8q4")]:
        eng = EngineConfig(model=MODEL, cache_mode=mode,
                           prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                             k_sparsity=0.5, v_sparsity=0.5),
                           max_seq_len=1024, prefill_bucket=256,
                           chunk_size=256, codec=codec)
        out = Generator(eng, qp, dtype=jnp.bfloat16).generate(
            prompt, max_new_tokens=40)
        assert all(len(o) == 40 for o in out), mode
    # token-level agreement with bf16 weights is checked on TRAINED weights
    # (real logit margins) in the accuracy grid (harness/tinylm.py); random
    # init has near-flat margins, so greedy chains decorrelate by design.


def test_w8a8_dot_matches_w8():
    w = jax.random.normal(jax.random.PRNGKey(5), (256, 96), jnp.float32)
    q, s = quant._quant_last(w)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 256), jnp.bfloat16)
    y8 = (x @ q.astype(x.dtype)) * s.astype(x.dtype)
    ya = quant.w8a8_dot(x, q, s)
    rel = float(jnp.linalg.norm((ya - y8).astype(jnp.float32))
                / jnp.linalg.norm(y8.astype(jnp.float32)))
    assert rel < 0.02, rel


def test_w8a8_logits_close_to_bf16():
    params = init_params(MODEL, jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    qp = quant.enable_act_quant(quant.quantize_params(params))
    assert "a8" in qp["layers"] and "act_quant" in qp
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 64)))
    lf = lm_forward(MODEL, params, toks)
    lq = lm_forward(MODEL, qp, toks)
    pf = jax.nn.log_softmax(lf, -1)
    pq = jax.nn.log_softmax(lq, -1)
    kl = jnp.sum(jnp.exp(pf) * (pf - pq), -1).mean()
    assert float(kl) < 0.08, float(kl)


def test_w8a8_generation_all_cache_modes():
    params = init_params(MODEL, jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    qp = quant.enable_act_quant(quant.quantize_params(params))
    prompt = np.random.RandomState(1).randint(0, 512, size=(2, 300))
    for mode, codec in [(CacheMode.DENSE, "bitmap"),
                        (CacheMode.MASKED, "bitmap"),
                        (CacheMode.COMPRESSED, "q8q4")]:
        eng = EngineConfig(model=MODEL, cache_mode=mode,
                           prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                             k_sparsity=0.5, v_sparsity=0.5),
                           max_seq_len=1024, prefill_bucket=256,
                           chunk_size=256, codec=codec)
        out = Generator(eng, qp, dtype=jnp.bfloat16).generate(
            prompt, max_new_tokens=40)
        assert all(len(o) == 40 for o in out), mode


def test_fused_projections_logits_exact():
    """fuse_projections (wqkv / w_gateup) is a pure layout change: logits
    must match the unfused params bit-for-bit in every weight format."""
    params = init_params(MODEL, jax.random.PRNGKey(7), dtype=jnp.bfloat16)
    toks = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 64)))
    for mk in [lambda p: p,
               quant.quantize_params,
               lambda p: quant.enable_act_quant(quant.quantize_params(p))]:
        p = mk(params)
        lf = lm_forward(MODEL, p, toks)
        fused = quant.fuse_projections(p)
        assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
        lg = lm_forward(MODEL, fused, toks)
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lf),
                                   rtol=2e-5, atol=2e-5)


def test_fused_projections_w4_generation():
    params = init_params(MODEL, jax.random.PRNGKey(8), dtype=jnp.bfloat16)
    qp = quant.fuse_projections(quant.quantize_params_w4(params))
    assert qp["layers"]["wqkv"].dtype == jnp.int16
    prompt = np.random.RandomState(3).randint(0, 512, size=(2, 300))
    eng = EngineConfig(model=MODEL, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=1024, prefill_bucket=256,
                       chunk_size=256, codec="q8q4")
    out = Generator(eng, qp, dtype=jnp.bfloat16).generate(
        prompt, max_new_tokens=40)
    assert all(len(o) == 40 for o in out)


# (The round-4 Pallas W8 matmul kernel was removed in round 5: device-time
# profiling showed the XLA weight-only W8 dot already runs at the HBM
# roofline (80 us / 734 GB/s at the w_down decode shape) and the kernel was
# 6-15% SLOWER — the "~370 GB/s cap" that motivated it was a wall-clock
# chain artifact.  See docs/PERFORMANCE.md "Round 5: W8 adjudication".)
