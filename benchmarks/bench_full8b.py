"""FULL Llama-3-8B serving on one chip: W8 weights + q8q4 compressed KV.

The round-1 critique of bench.py was that 16 GiB of bf16 weights force a
16-layer stand-in for Llama-3-8B on a single v5e-lite.  Weight-only int8
(models/quant.py) removes that constraint: the complete 32-layer, 128k-vocab
model is ~8.1 GiB resident, leaving room for a multi-thousand-token q8q4
compressed KV cache — the real model geometry the reference benchmarks
(mem_spd_test.py: Llama-3-8B-Instruct), servable end to end on one chip.

Run: python benchmarks/bench_full8b.py [--batch 8 --prompt 4096 --gen 256]
"""

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=4096)
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--w4", action="store_true",
                    help="int4 blocked weights instead of int8")
    args = ap.parse_args()

    from mustafar_tpu.config import (CacheMode, EngineConfig, LLAMA3_8B,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.models.quant import (init_params_w4,
                                           init_params_w8, weight_bytes)
    from mustafar_tpu.runtime.generate import Generator

    cfg = LLAMA3_8B                      # FULL geometry: 32L, vocab 128256
    B, T, G = args.batch, args.prompt, args.gen
    max_seq = ((T + G + 255) // 256) * 256 + 288

    t0 = time.perf_counter()
    init = init_params_w4 if args.w4 else init_params_w8
    wtag = "w4" if args.w4 else "w8"
    params = jax.block_until_ready(init(cfg, jax.random.PRNGKey(0)))
    wgib = weight_bytes(params) / 2**30
    print(f"{wtag} params ready: {wgib:.2f} GiB "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    eng = EngineConfig(
        model=cfg, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=0.7, v_sparsity=0.7),
        max_seq_len=max_seq, prefill_bucket=256, chunk_size=256,
        codec="q8q4", chunked_prefill=True)

    prompt = np.random.RandomState(0).randint(1, cfg.vocab_size, (B, T))
    gen = Generator(eng, params, dtype=jnp.bfloat16)
    gen.generate(prompt, max_new_tokens=8, eos_id=None)       # compile
    gen.generate(prompt, max_new_tokens=G, eos_id=None)       # compile
    t0 = time.perf_counter()
    gen.generate(prompt, max_new_tokens=8, eos_id=None)       # ~pure prefill
    t_pre = time.perf_counter() - t0
    resident = sum(a.nbytes for a in jax.live_arrays()) / 2**30
    t0 = time.perf_counter()
    gen.generate(prompt, max_new_tokens=G, eos_id=None)
    t_all = time.perf_counter() - t0
    dec_t = max(t_all - t_pre, 1e-6)
    result = {
        "metric": f"full_llama3_8b_{wtag}",
        "batch": B, "prompt": T, "gen": G,
        "weights_gib": round(wgib, 2),
        "prefill_tok_s": round(B * T / t_pre, 1),
        "decode_tok_s": round(B * (G - 8) / dec_t, 1),
        "resident_gib": round(resident, 2),
    }
    print(f"full-8B {wtag} q8q4 @ B{B}/T{T}: prefill "
          f"{result['prefill_tok_s']} tok/s, decode "
          f"{result['decode_tok_s']} tok/s, resident {resident:.2f} GiB",
          flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
