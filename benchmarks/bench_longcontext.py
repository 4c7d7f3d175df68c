"""32k-context serving benchmark (north-star workload, BASELINE.md).

B=8 sequences at ~31k-token prompts on ONE v5e-lite chip, Llama-3-8B
geometry (15 layers fitted to 16 GiB alongside weights):

  * dense bf16 KV would need ~17 GiB of cache alone -> OOM (measured);
  * q8q4 compressed KV needs ~6 GiB and serves;
  * prompts are streamed through CHUNKED prefill (256-token segments over
    the compressed past, O(chunk) activation memory — monolithic prefill's
    [B,31k,*] MLP temps alone would OOM long before the cache does).

Reports prefill throughput and decode throughput separately (a 31k prefill
amortizes over only a few hundred generated tokens, so the combined number
hides the decode rate).  --cb additionally drives the same workload through
the continuous-batching scheduler (per-request chunked prefill into slots).

Run: python benchmarks/bench_longcontext.py [--cb]
"""

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(layers=15, max_seq=32768):
    from mustafar_tpu.config import (CacheMode, EngineConfig, LLAMA3_8B,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.models.llama import init_params

    cfg = dataclasses.replace(LLAMA3_8B, num_layers=layers, vocab_size=32000,
                              max_position_embeddings=max_seq)
    sparse = EngineConfig(
        model=cfg, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=0.7, v_sparsity=0.7),
        max_seq_len=max_seq, prefill_bucket=256, chunk_size=256,
        codec="q8q4", chunked_prefill=True)
    dense = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE,
                         max_seq_len=max_seq, prefill_bucket=256)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    return cfg, sparse, dense, jax.block_until_ready(params)


def oom_name(e):
    import re
    m = re.search(r"Ran out of memory[^\n]*", str(e))
    return m.group(0) if m else str(e)[:200]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cb", action="store_true",
                    help="also drive the continuous-batching scheduler")
    ap.add_argument("--cb-only", action="store_true",
                    help="skip the Generator/dense sections")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=31744)   # 124 x 256
    ap.add_argument("--gen", type=int, default=256)
    args = ap.parse_args()

    from mustafar_tpu.runtime.generate import Generator

    cfg, sparse, dense, params = build()
    B, T, G = args.batch, args.prompt, args.gen
    prompt = np.random.RandomState(0).randint(1, cfg.vocab_size, (B, T))
    result = {"metric": "longcontext_32k", "batch": B, "prompt": T, "gen": G}

    if not args.cb_only:
        # sparse q8q4 + chunked prefill: expected to serve
        gen = Generator(sparse, params, dtype=jnp.bfloat16)
        gen.generate(prompt, max_new_tokens=8, eos_id=None)     # compile
        gen.generate(prompt, max_new_tokens=G, eos_id=None)     # compile
        t0 = time.perf_counter()
        gen.generate(prompt, max_new_tokens=8, eos_id=None)     # ~pure prefill
        t_pre = time.perf_counter() - t0
        resident = sum(a.nbytes for a in jax.live_arrays()) / 2**30
        t0 = time.perf_counter()
        gen.generate(prompt, max_new_tokens=G, eos_id=None)
        t_all = time.perf_counter() - t0
        dec_t = max(t_all - t_pre, 1e-6)
        result["sparse_prefill_tok_s"] = round(B * T / t_pre, 1)
        result["sparse_decode_tok_s"] = round(B * (G - 8) / dec_t, 1)
        mem = jax.devices()[0].memory_stats() or {}
        peak = mem.get("peak_bytes_in_use", 0) / 2**30
        result["sparse_peak_hbm_gib"] = round(peak, 2)
        result["sparse_resident_gib"] = round(resident, 2)
        print(f"sparse@32k/B{B}: prefill {result['sparse_prefill_tok_s']} "
              f"tok/s ({t_pre:.1f}s warm), decode "
              f"{result['sparse_decode_tok_s']} tok/s "
              f"({t_all - t_pre:.1f}s for {G - 8}), peak {peak:.2f} GiB, "
              f"resident {resident:.2f} GiB", flush=True)

        # dense at the same workload: expected OOM on cache alone (~17 GiB)
        try:
            gend = Generator(dense, params, dtype=jnp.bfloat16)
            gend.generate(prompt, max_new_tokens=8, eos_id=None)
            result["dense_ran"] = True
            print("dense@32k: ran (unexpected)", flush=True)
        except Exception as e:
            result["dense_ran"] = False
            result["dense_error"] = oom_name(e)
            print(f"dense@32k: {oom_name(e)}", flush=True)
        del gen, gend

    if args.cb or args.cb_only:
        from mustafar_tpu.runtime.scheduler import ContinuousBatchingEngine
        eng = dataclasses.replace(sparse, batch_size=B)
        cb = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16)
        rs = np.random.RandomState(1)
        for _ in range(B):
            cb.submit(rs.randint(1, cfg.vocab_size, T - 128), G)
        t0 = time.perf_counter()
        outs = cb.run()
        dt = time.perf_counter() - t0
        toks = sum(len(o) for o in outs.values())
        result["cb_tok_s"] = round(toks / dt, 1)
        print(f"cb sparse@32k: {toks} tokens in {dt:.1f}s "
              f"= {result['cb_tok_s']} tok/s (prefill+decode)", flush=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
