"""End-to-end decode latency/memory benchmark (driver entry point).

TPU-native equivalent of the reference's mem_spd_test.py (Llama-3-8B,
batch 32, prompt 300, generate 600, K=V=0.7, fp16, sm_89): measures sparse
(compressed cache + Pallas kernels) decode throughput against the dense-cache
baseline on the same model/config and prints ONE JSON line.

A full Llama-3-8B in bf16 (~16 GiB) does not fit a single v5e-lite chip next
to its KV cache, so the bench uses the Llama-3-8B layer geometry at reduced
depth (same per-layer work; layer count chosen to fit HBM).  vs_baseline is
the sparse/dense tokens-per-second ratio at identical shapes — the quantity
the reference's kernel is built to improve.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(engine, params, dtype, prompt, gen_tokens):
    from mustafar_tpu.runtime.generate import Generator

    gen = Generator(engine, params, dtype=dtype)
    # warmup (compile)
    out = gen.generate(prompt, max_new_tokens=gen_tokens, eos_id=None)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = gen.generate(prompt, max_new_tokens=gen_tokens, eos_id=None)
    dt = (time.perf_counter() - t0) / reps
    total_tokens = sum(len(o) for o in out)
    hbm = _hbm_gib(gen.cache_impl, len(prompt), dtype)
    return total_tokens / dt, dt, hbm


def _hbm_gib(cache_impl, batch, dtype):
    """HBM metric next to tok/s (reference reports
    torch.cuda.max_memory_allocated(), mem_spd_test.py:95-96).  Prefers the
    device's monotone peak counter; the tunneled axon backend returns None
    from memory_stats(), so fall back to live device buffers (weights — the
    decode loop's donated cache is freed by the time we can look) plus the
    engine's cache footprint computed from its static shapes (exact)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats["peak_bytes_in_use"] / 2**30, 3), "peak"
    except Exception:
        pass
    try:
        dev = jax.local_devices()[0]
        n = sum(x.nbytes for x in jax.live_arrays()
                if dev in getattr(x, "devices", lambda: set())())
        cache = jax.eval_shape(lambda: cache_impl.init(batch, dtype))
        n += sum(int(np.prod(s.shape)) * s.dtype.itemsize
                 for s in jax.tree.leaves(cache))
        return round(n / 2**30, 3), "live_weights+cache"
    except Exception:
        return None, "unavailable"


def main(batch=None, prompt_len=None, gen_tokens=None):
    from mustafar_tpu.config import (CacheMode, EngineConfig, LLAMA3_8B,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.models.llama import init_params

    on_tpu = jax.default_backend() == "tpu"
    # Llama-3-8B geometry; depth fitted to single-chip HBM (16 GiB v5e-lite).
    layers = 16 if on_tpu else 2
    cfg = dataclasses.replace(LLAMA3_8B, num_layers=layers,
                              vocab_size=32000 if on_tpu else 512)
    B, dflt_prompt, dflt_gen = (32, 300, 600) if on_tpu else (2, 64, 16)
    B = batch or B
    prompt_len = prompt_len or dflt_prompt
    gen_tokens = gen_tokens or dflt_gen
    # Tokens-rounded-to-chunk + one residual window of slack; the default
    # shape (300+600) lands on 1312, the capacity both engines were measured
    # at in round 1 (a looser +2-chunk formula here was quietly slowing the
    # DENSE baseline 939 -> 799 tok/s by padding its cache to 1624).
    max_seq = max(1312, ((prompt_len + gen_tokens + 255) // 256) * 256 + 288) \
        if on_tpu else 640

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.block_until_ready(params)
    prompt = np.random.RandomState(0).randint(1, cfg.vocab_size, (B, prompt_len))

    # q8q4 codec: pruned chunks stored dense-zeroed int8-K/int4-V — same
    # 2.67x compression as the bitmap codec, but expansion is pure widen
    # arithmetic so decode beats dense per call (docs/PERFORMANCE.md round-2
    # section; bitmap codec measured separately at 987.6 tok/s = 1.05x)
    sparse_eng = EngineConfig(
        model=cfg, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=0.7, v_sparsity=0.7),
        max_seq_len=max_seq, prefill_bucket=256, chunk_size=256, codec="q8q4")
    dense_eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE,
                             max_seq_len=max_seq, prefill_bucket=256)

    sparse_tps, sparse_dt, (hbm_sparse, hbm_kind) = build(
        sparse_eng, params, jnp.bfloat16, prompt, gen_tokens)
    dense_tps, dense_dt, (hbm_dense, _) = build(
        dense_eng, params, jnp.bfloat16, prompt, gen_tokens)

    # weight-only int8/int4 serving (models/quant.py): same engines,
    # quantized weights — halves (W8) then re-halves (W4 residency) the
    # weight streaming that dominates the decode step.  Kept out of the
    # headline (the reference is fp16-weight; vs_baseline stays the
    # sparse/dense ratio at reference precision) but reported.
    from mustafar_tpu.models.quant import quantize_params, quantize_params_w4
    q4params = jax.block_until_ready(quantize_params_w4(params))
    qparams = jax.block_until_ready(quantize_params(params, donate=True))
    del params
    sparse_w8_tps, _, (hbm_sparse_w8, _) = build(
        sparse_eng, qparams, jnp.bfloat16, prompt, gen_tokens)
    dense_w8_tps, _, _ = build(
        dense_eng, qparams, jnp.bfloat16, prompt, gen_tokens)
    del qparams
    sparse_w4_tps, _, (hbm_sparse_w4, _) = build(
        sparse_eng, q4params, jnp.bfloat16, prompt, gen_tokens)
    dense_w4_tps, _, _ = build(
        dense_eng, q4params, jnp.bfloat16, prompt, gen_tokens)

    print(json.dumps({
        "metric": "sparse_decode_throughput",
        "value": round(sparse_tps, 1),
        "unit": "tok/s",
        "vs_baseline": round(sparse_tps / dense_tps, 3),
        "detail": {
            "model": f"llama3-8b-geometry x{layers}L",
            "batch": B, "prompt": prompt_len, "gen": gen_tokens,
            "k_sparsity": 0.7, "v_sparsity": 0.7, "codec": "q8q4",
            "dense_tok_s": round(dense_tps, 1),
            "sparse_s_per_gen": round(sparse_dt, 3),
            "dense_s_per_gen": round(dense_dt, 3),
            # HBM (GiB) measured while each engine's cache was live;
            # hbm_kind "peak" = device counter, "live" = resident buffers
            "hbm_sparse_gib": hbm_sparse,
            "hbm_dense_gib": hbm_dense,
            "hbm_kind": hbm_kind,
            "sparse_w8_tok_s": round(sparse_w8_tps, 1),
            "dense_w8_tok_s": round(dense_w8_tps, 1),
            "hbm_sparse_w8_gib": hbm_sparse_w8,
            "sparse_w4_tok_s": round(sparse_w4_tps, 1),
            "dense_w4_tok_s": round(dense_w4_tps, 1),
            "hbm_sparse_w4_gib": hbm_sparse_w4,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
