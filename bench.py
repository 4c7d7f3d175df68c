"""End-to-end decode latency/memory benchmark (driver entry point).

TPU-native equivalent of the reference's mem_spd_test.py (Llama-3-8B,
batch 32, prompt 300, generate 600, K=V=0.7, fp16, sm_89): measures sparse
(compressed cache + Pallas kernels) decode throughput against the dense-cache
baseline on the same model/config and prints ONE JSON line.

Headline (round 3): the FULL 32-layer Llama-3-8B — the model the reference
actually benchmarks — served with weight-only int8 (models/quant.py; 8.1 GiB
resident vs 16 GiB bf16, which does not fit one v5e-lite chip beside its
cache).  vs_baseline is the sparse/dense tokens-per-second ratio at identical
weights and shapes — the quantity the reference's kernel is built to improve.
W4 (int4 blocked weights) legs and the round-1/2 16-layer bf16 legs are
reported in detail for round-over-round continuity.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(engine, params, dtype, prompt, gen_tokens, reps=3):
    from mustafar_tpu.runtime.generate import Generator

    gen = Generator(engine, params, dtype=dtype)
    # warmup (compile)
    out = gen.generate(prompt, max_new_tokens=gen_tokens, eos_id=None)
    t0 = time.perf_counter()
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


def _engines(cfg, max_seq):
    from mustafar_tpu.config import CacheMode, EngineConfig, PruneConfig, PruneMethod

    # q8q4 codec: pruned chunks stored dense-zeroed int8-K/int4-V — same
    # 2.67x compression as the bitmap codec, but expansion is pure widen
    # arithmetic so decode beats dense per call (docs/PERFORMANCE.md)
    sparse = EngineConfig(
        model=cfg, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=0.7, v_sparsity=0.7),
        max_seq_len=max_seq, prefill_bucket=256, chunk_size=256, codec="q8q4")
    dense = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE,
                         max_seq_len=max_seq, prefill_bucket=256)
    return sparse, dense


def main(batch=None, prompt_len=None, gen_tokens=None):
    from mustafar_tpu.config import LLAMA3_8B
    from mustafar_tpu.models.llama import init_params

    on_tpu = jax.default_backend() == "tpu"
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
    detail = {"batch": B, "prompt": prompt_len, "gen": gen_tokens,
              "k_sparsity": 0.7, "v_sparsity": 0.7, "codec": "q8q4",
              "backend": jax.default_backend()}

    # ---- flagship: FULL 32-layer Llama-3-8B (the reference's bench model,
    # mem_spd_test.py:7-17), weight-only int8 then int4 ----------------------
    cfg_full = LLAMA3_8B if on_tpu else dataclasses.replace(
        LLAMA3_8B, num_layers=2, vocab_size=512, intermediate_size=256,
        hidden_size=256, num_heads=2, num_kv_heads=2)
    sparse_eng, dense_eng = _engines(cfg_full, max_seq)
    prompt = np.random.RandomState(0).randint(
        1, cfg_full.vocab_size, (B, prompt_len))

    from mustafar_tpu.models.quant import (init_params_w4, init_params_w8,
                                           weight_bytes)
    w8 = jax.block_until_ready(init_params_w8(cfg_full, jax.random.PRNGKey(0)))
    detail["full8b_w8_weights_gib"] = round(weight_bytes(w8) / 2**30, 2)
    sparse_tps, sparse_dt, (hbm_sparse, hbm_kind) = build(
        sparse_eng, w8, jnp.bfloat16, prompt, gen_tokens)
    dense_tps, dense_dt, (hbm_dense, _) = build(
        dense_eng, w8, jnp.bfloat16, prompt, gen_tokens)
    del w8
    detail.update({
        "model": f"llama-3-8b x{cfg_full.num_layers}L (full) + W8",
        "dense_tok_s": round(dense_tps, 1),
        "sparse_s_per_gen": round(sparse_dt, 3),
        "dense_s_per_gen": round(dense_dt, 3),
        # HBM (GiB) measured while each engine's cache was live;
        # hbm_kind "peak" = device counter, "live" = resident buffers
        "hbm_sparse_gib": hbm_sparse,
        "hbm_dense_gib": hbm_dense,
        "hbm_kind": hbm_kind,
    })

    # Detail legs below are fault-isolated: a late-leg failure (e.g. HBM
    # fragmentation after the big flagship legs) must not cost the driver
    # the headline JSON line.
    def leg(name, fn):
        import gc
        # free prior legs' compiled executables (their pinned device
        # buffers fragment HBM enough to OOM later legs — r4 check runs)
        jax.clear_caches()
        gc.collect()
        try:
            fn()
        except Exception as e:  # noqa: BLE001 - record and continue
            detail[f"leg_error_{name}"] = f"{type(e).__name__}: {e}"[:200]
            print(f"[bench] leg {name} failed: {e}", file=sys.stderr)

    def w4_leg():
        w4 = jax.block_until_ready(
            init_params_w4(cfg_full, jax.random.PRNGKey(0)))
        detail["full8b_w4_weights_gib"] = round(weight_bytes(w4) / 2**30, 2)
        s4_tps, _, (hbm_s4, _) = build(sparse_eng, w4, jnp.bfloat16, prompt,
                                       gen_tokens)
        d4_tps, _, _ = build(dense_eng, w4, jnp.bfloat16, prompt, gen_tokens)
        detail.update({"sparse_w4_tok_s": round(s4_tps, 1),
                       "dense_w4_tok_s": round(d4_tps, 1),
                       "hbm_sparse_w4_gib": hbm_s4})

    leg("w4", w4_leg)

    # ---- deep-context leg (VERDICT r3 weak #4): the reference's 300+600
    # shape is weight-bound and hides where sparsity pays; at B=8 x 4k the
    # attention stream dominates and the sparse advantage is visible in the
    # end-to-end rate.  Plus the capacity point: the dense bf16 cache at
    # B=8 x 32k (~17 GiB) cannot even be allocated on one chip, while the
    # q8q4 compressed pool serves it (benchmarks/bench_longcontext.py) ------
    def deep_leg():
        deep_prompt, deep_gen, deep_B = 3584, 512, 8
        deep_seq = ((deep_prompt + deep_gen + 255) // 256) * 256 + 288
        sparse_d, dense_d = _engines(cfg_full, deep_seq)
        pd = np.random.RandomState(1).randint(
            1, cfg_full.vocab_size, (deep_B, deep_prompt))
        w8d = jax.block_until_ready(
            init_params_w8(cfg_full, jax.random.PRNGKey(0)))
        sd_tps, _, _ = build(sparse_d, w8d, jnp.bfloat16, pd, deep_gen, reps=2)
        dd_tps, _, _ = build(dense_d, w8d, jnp.bfloat16, pd, deep_gen, reps=2)
        detail.update({
            "deep_shape": f"B{deep_B} x {deep_prompt}+{deep_gen}",
            "deep_sparse_tok_s": round(sd_tps, 1),
            "deep_dense_tok_s": round(dd_tps, 1),
            "deep_vs_dense": round(sd_tps / dd_tps, 3)})
        # capacity probe: can the 32k-context cache even be allocated?
        del w8d
        jax.clear_caches()
        import gc
        gc.collect()
        from mustafar_tpu.cache import make_cache
        for name, eng32 in zip(("dense", "sparse"),
                               _engines(cfg_full, 32768)[::-1]):
            try:
                c = jax.block_until_ready(
                    jax.jit(lambda: make_cache(eng32).init(8, jnp.bfloat16))())
                gib = sum(x.nbytes for x in jax.tree.leaves(c)) / 2**30
                detail[f"cap32k_{name}"] = f"fits ({gib:.1f} GiB)"
                del c
            except Exception:
                detail[f"cap32k_{name}"] = "OOM"

    if on_tpu:
        leg("deep", deep_leg)

    # ---- continuity leg: reference geometry at reduced depth, bf16 weights
    # (the round-1/2 headline — full bf16 does not fit one 16 GiB chip) -----
    def continuity_leg():
        layers = 16 if on_tpu else 2
        cfg16 = dataclasses.replace(LLAMA3_8B, num_layers=layers,
                                    vocab_size=32000 if on_tpu else 512)
        sparse16, dense16 = _engines(cfg16, max_seq)
        p16 = np.random.RandomState(0).randint(1, cfg16.vocab_size,
                                               (B, prompt_len))
        params16 = jax.block_until_ready(
            init_params(cfg16, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
        s16_tps, _, _ = build(sparse16, params16, jnp.bfloat16, p16,
                              gen_tokens)
        d16_tps, _, _ = build(dense16, params16, jnp.bfloat16, p16,
                              gen_tokens)
        detail.update({"bf16_16l_sparse_tok_s": round(s16_tps, 1),
                       "bf16_16l_dense_tok_s": round(d16_tps, 1)})

    leg("bf16_16l", continuity_leg)

    print(json.dumps({
        "metric": "full8b_w8_sparse_decode_throughput",
        "value": round(sparse_tps, 1),
        "unit": "tok/s",
        "vs_baseline": round(sparse_tps / dense_tps, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
