"""Production serving bench: continuous batching on the FULL Llama-3-8B.

The reference's only batching is a static batch of identical prompts through
HF generate (mem_spd_test.py:66-78); this drives the slot scheduler
(runtime/scheduler.py + native C++ core) with a mixed-length request wave
on the complete 32-layer model — W4 weights (4.33 GiB resident), q8q4
compressed KV, chunked prefill — and reports sustained serving throughput
on one chip.

Wave: requests with prompts spread over a few buckets (so the per-bucket
prefill programs compile once in the warmup wave) and varying generation
budgets, FCFS into the slot pool.

Run: python benchmarks/bench_serving.py [--slots 16 --requests 48]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_wave(rng, n, vocab, buckets=(512, 1024, 2048), gens=(64, 128, 192)):
    reqs = []
    for i in range(n):
        tp = int(buckets[i % len(buckets)])
        t = int(rng.integers(tp // 2 + 1, tp))       # lands in bucket tp
        g = int(gens[(i // len(buckets)) % len(gens)])
        reqs.append((rng.integers(1, vocab, size=t, dtype=np.int64), g))
    return reqs


def interleave_demo(cfg, params, wgib):
    """Decode liveness under a 32k admission: 3 active streams keep decoding
    while one 32k prompt streams in segment-per-tick (interleaved scheduler)
    vs stalling for the whole prefill (blocking).  Token streams must be
    identical; the serving-visible difference is the max inter-token stall
    of the active streams."""
    import dataclasses

    from mustafar_tpu.config import CacheMode, EngineConfig, PruneConfig, PruneMethod
    from mustafar_tpu.runtime.scheduler import ContinuousBatchingEngine

    # 2 slots: one active stream + the 32k admission (4 slots x 33k cache +
    # the blocking path's scan-double-buffered batch-1 sub-cache OOM a
    # 16 GiB chip next to the weights)
    eng = EngineConfig(
        model=cfg, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=0.7, v_sparsity=0.7),
        max_seq_len=33536, prefill_bucket=512, chunk_size=256,
        codec="q8q4", chunked_prefill=True, batch_size=2)
    rng = np.random.default_rng(1)
    shorts = [rng.integers(1, cfg.vocab_size, size=500)]
    long_p = rng.integers(1, cfg.vocab_size, size=32500)   # 128 segments

    results = {}
    for name, interleave in (("interleaved", True), ("blocking", False)):
        cb = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16,
                                      interleave=interleave)
        su = [cb.submit(t, 260) for t in shorts]
        # admit + warm the short streams (compiles decode/prefill programs)
        for _ in range(8):
            cb._fill_slots()
            cb._decode_step()
        lu = cb.submit(long_p, 8)
        stamps = []                       # (time, tokens emitted by shorts)
        t0 = time.perf_counter()
        while cb.queue or cb._admissions or any(
                r is not None for r in cb.slot_req):
            cb._fill_slots()
            cb._decode_step()
            stamps.append((time.perf_counter(),
                           sum(len(cb.requests[u].out) for u in su)))
        wall = time.perf_counter() - t0
        outs = {u: list(cb.finished[u].out) for u in su + [lu]}
        # max stall: largest wall gap between consecutive short-stream tokens
        gaps, last_t = [], t0
        prev = stamps[0][1] if stamps else 0
        for t, n in stamps:
            if n > prev:
                gaps.append(t - last_t)
                last_t, prev = t, n
        results[name] = {"wall_s": round(wall, 2),
                         "max_stall_s": round(max(gaps), 3) if gaps else None,
                         "outs": outs}
        print(f"[{name}] 32k admission: wall {wall:.2f}s, max inter-token "
              f"stall of active streams {results[name]['max_stall_s']}s",
              flush=True)
    same = all(results["interleaved"]["outs"][u] == results["blocking"]["outs"][u]
               for u in results["interleaved"]["outs"])
    print(json.dumps({
        "metric": "serving_interleaved_admission_32k",
        "weights_gib": round(wgib, 2),
        "token_exact_vs_blocking": bool(same),
        "interleaved_max_stall_s": results["interleaved"]["max_stall_s"],
        "blocking_max_stall_s": results["blocking"]["max_stall_s"],
        "interleaved_wall_s": results["interleaved"]["wall_s"],
        "blocking_wall_s": results["blocking"]["wall_s"],
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--w8", action="store_true", help="int8 weights instead")
    ap.add_argument("--interleave_demo", action="store_true",
                    help="decode-liveness-under-32k-admission demo instead "
                         "of the throughput wave")
    args = ap.parse_args()

    from mustafar_tpu.config import (CacheMode, EngineConfig, LLAMA3_8B,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.models.quant import (init_params_w4, init_params_w8,
                                           weight_bytes)
    from mustafar_tpu.runtime.scheduler import ContinuousBatchingEngine

    cfg = LLAMA3_8B                                  # full 32L / 128k vocab
    eng = EngineConfig(
        model=cfg, cache_mode=CacheMode.COMPRESSED,
        prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                          k_sparsity=0.7, v_sparsity=0.7),
        max_seq_len=2560, prefill_bucket=512, chunk_size=256,
        codec="q8q4", chunked_prefill=True, batch_size=args.slots)

    t0 = time.perf_counter()
    init = init_params_w8 if args.w8 else init_params_w4
    params = jax.block_until_ready(init(cfg, jax.random.PRNGKey(0)))
    wgib = weight_bytes(params) / 2**30
    print(f"params ready: {wgib:.2f} GiB ({time.perf_counter()-t0:.0f}s)",
          flush=True)

    if args.interleave_demo:
        return interleave_demo(cfg, params, wgib)

    rng = np.random.default_rng(0)
    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16)

    # warmup wave: one request per prompt bucket (compiles every program:
    # 3 prefill buckets + decode + compact), tiny budgets
    for tp in (512, 1024, 2048):
        cb.submit(rng.integers(1, cfg.vocab_size, size=tp - 8), 8)
    t0 = time.perf_counter()
    cb.run()
    print(f"warmup wave done ({time.perf_counter()-t0:.0f}s incl. compiles)",
          flush=True)

    wave = make_wave(rng, args.requests, cfg.vocab_size)
    prompt_toks = sum(len(t) for t, _ in wave)
    gen_toks = sum(g for _, g in wave)
    uids = [cb.submit(t, g) for t, g in wave]
    t0 = time.perf_counter()
    outs = cb.run()
    dt = time.perf_counter() - t0
    assert all(len(outs[u]) == g for u, (_, g) in zip(uids, wave))
    stats = cb.native.stats() if cb.native else {}
    result = {
        "metric": "serving_full8b_" + ("w8" if args.w8 else "w4"),
        "slots": args.slots, "requests": args.requests,
        "prompt_tokens": prompt_toks, "generated_tokens": gen_toks,
        "wall_s": round(dt, 2),
        "generated_tok_s": round(gen_toks / dt, 1),
        "total_tok_s": round((prompt_toks + gen_toks) / dt, 1),
        "weights_gib": round(wgib, 2),
        "scheduler": stats,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
