"""Device-time profile of the end-to-end decode loop at the bench shape.

Builds the same engine as bench.py (Llama-3-8B geometry, reduced depth),
prefills once OUTSIDE the trace, then traces the jitted decode while_loop
alone and prints the per-step op breakdown (benchmarks/parse_trace.py).
Used to locate non-attention overheads in the decode loop: pool carry
copies, compaction, LM head, sampling.

    python benchmarks/profile_e2e.py [sparse|dense] [layers] [gen] [bf16|w8|w4] [batch] [prompt]

The optional [batch] [prompt] override the reference bench shape (32, 300)
— e.g. ``sparse 32 64 w8 8 3584`` profiles the deep-context leg's shape.
"""

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(engine_kind="sparse", layers=16, gen=64, weights="bf16", B=32,
         prompt_len=300):
    from mustafar_tpu.cache import make_cache
    from mustafar_tpu.config import (CacheMode, EngineConfig, LLAMA3_8B,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.models import llama
    from mustafar_tpu.models.llama import init_params
    from mustafar_tpu.runtime import generate as G

    # full geometry (32L) keeps the 128k vocab (the real lm_head cost);
    # reduced-depth runs shrink it so bf16 weights fit
    cfg = dataclasses.replace(LLAMA3_8B, num_layers=layers,
                              vocab_size=128256 if layers >= 32 else 32000)
    max_seq = max(1312, ((prompt_len + gen + 255) // 256) * 256 + 288)
    if weights != "bf16" and layers >= 32:
        # 16 GiB of bf16 never fits next to the cache: init quantized directly
        from mustafar_tpu.models import quant
        init_q = (quant.init_params_w8 if weights == "w8"
                  else quant.init_params_w4)
        params = init_q(cfg, jax.random.PRNGKey(0))
    else:
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        if weights != "bf16":
            from mustafar_tpu.models import quant
            params = (quant.quantize_params(params, donate=True)
                      if weights == "w8"
                      else quant.quantize_params_w4(params, donate=True))
    params = jax.block_until_ready(params)
    prompt = np.random.RandomState(0).randint(1, cfg.vocab_size,
                                              (B, prompt_len))
    if engine_kind == "sparse":
        eng = EngineConfig(
            model=cfg, cache_mode=CacheMode.COMPRESSED,
            prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                              k_sparsity=0.7, v_sparsity=0.7),
            max_seq_len=max_seq, prefill_bucket=256, chunk_size=256,
            codec="q8q4")
    else:
        eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE,
                           max_seq_len=max_seq, prefill_bucket=256)
    cache_impl = make_cache(eng)
    Tpad = max(512, ((prompt_len + 255) // 256) * 256)
    toks = jnp.pad(jnp.asarray(prompt, jnp.int32),
                   ((0, 0), (0, Tpad - prompt_len)))
    tl = jnp.int32(prompt_len)

    @jax.jit
    def prefill_fn(params, toks, tl):
        cache = cache_impl.init(B, jnp.bfloat16)
        return llama.prefill(cfg, params, toks, cache, cache_impl, tl,
                             last_only=True)

    # the decode while_loop with the cache donated (at full-8B a non-donated
    # carry keeps 2-3 cache copies alive next to the weights -> OOM); the
    # trace is re-prefilled per run so each dec_fn gets a fresh donatable
    def dec_fn_raw(params, cache, logits, tl):
        out, cache = G._decode_impl(cfg, cache_impl, gen, (), 0, G.GREEDY,
                                    params, cache, logits, tl)
        return out, cache
    dec_fn = jax.jit(dec_fn_raw, donate_argnums=(1,))

    logits, cache = jax.block_until_ready(prefill_fn(params, toks, tl))
    out, _ = jax.block_until_ready(dec_fn(params, cache, logits, tl))  # compile
    logits, cache = jax.block_until_ready(prefill_fn(params, toks, tl))
    np.asarray(logits)       # drain the tunnel's dispatch queue before t0
    t0 = time.perf_counter()
    out, _ = dec_fn(params, cache, logits, tl)
    # block_until_ready returns at ENQUEUE on the tunneled axon backend
    # (measured: 64 full-8B steps "in 0.000 s"); a host transfer is the
    # only sync that really waits for the device
    np.asarray(out)
    dt = time.perf_counter() - t0
    logits, cache = jax.block_until_ready(prefill_fn(params, toks, tl))
    print(f"decode warm wall: {dt:.3f} s for {gen} steps "
          f"({B * gen / dt:.1f} tok/s, {dt / gen * 1e3:.2f} ms/step)")
    with jax.profiler.trace("/tmp/e2e_trace"):
        out = dec_fn(params, cache, logits, tl)
        jax.block_until_ready(out)

    sys.path.insert(0, "benchmarks")
    import parse_trace
    parse_trace.summarize("/tmp/e2e_trace", gen, top=30)


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "sparse"
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    gen = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    weights = sys.argv[4] if len(sys.argv) > 4 else "bf16"
    B = int(sys.argv[5]) if len(sys.argv) > 5 else 32
    prompt_len = int(sys.argv[6]) if len(sys.argv) > 6 else 300
    main(kind, layers, gen, weights, B, prompt_len)
