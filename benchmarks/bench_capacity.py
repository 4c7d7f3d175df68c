"""Capacity benchmark: the workload class the compressed cache unlocks.

At B=32 and ~3.6k context with Llama-3-8B geometry (16 layers fitted to one
v5e-lite), the dense bf16 KV cache needs ~7.6 GiB next to ~8 GiB of weights —
over HBM — while the compressed cache needs ~3.0 GiB and runs.  This bench
runs BOTH engines at the same workload and reports throughput or OOM,
demonstrating the memory headline (2.67x KV reduction) as end-to-end
capacity/batch headroom.

Run: python benchmarks/bench_capacity.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def try_engine(name, eng, params, prompt, gen_tokens):
    from mustafar_tpu.runtime.generate import Generator

    try:
        gen = Generator(eng, params, dtype=jnp.bfloat16)
        out = gen.generate(prompt, max_new_tokens=gen_tokens, eos_id=None)
        t0 = time.perf_counter()
        out = gen.generate(prompt, max_new_tokens=gen_tokens, eos_id=None)
        dt = time.perf_counter() - t0
        toks = sum(len(o) for o in out)
        print(f"{name}: {toks/dt:.1f} tok/s ({dt:.2f}s per generate)", flush=True)
        return toks / dt
    except Exception as e:
        import re
        m = re.search(r"Ran out of memory[^\n]*", str(e))
        if m:
            print(f"{name}: OOM ({m.group(0)})", flush=True)
        else:
            print(f"{name}: FAILED ({str(e)[:200]})", flush=True)
        return None


def main():
    from mustafar_tpu.config import (CacheMode, EngineConfig, LLAMA3_8B,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.models.llama import init_params

    layers = 15
    cfg = dataclasses.replace(LLAMA3_8B, num_layers=layers, vocab_size=32000)
    B, prompt_len, gen_tokens = 32, 3584, 256
    max_seq = 3848  # 3584 + 256 + slack; chunks: (3848-32)//256 = 14

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = jax.block_until_ready(params)
    prompt = np.random.RandomState(0).randint(1, cfg.vocab_size, (B, prompt_len))

    sparse_eng = EngineConfig(
        model=cfg, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=0.7, v_sparsity=0.7),
        max_seq_len=max_seq, prefill_bucket=512, chunk_size=256)
    dense_eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE,
                             max_seq_len=max_seq, prefill_bucket=512)

    sparse_tps = try_engine("sparse@4k/B32", sparse_eng, params, prompt, gen_tokens)
    dense_tps = try_engine("dense @4k/B32", dense_eng, params, prompt, gen_tokens)
    print(json.dumps({
        "metric": "capacity_4k_b32",
        "sparse_tok_s": sparse_tps, "dense_tok_s": dense_tps,
        "dense_ran": dense_tps is not None,
    }))


if __name__ == "__main__":
    main()
