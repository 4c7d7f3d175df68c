"""Sliding-window (Mistral) prefill on chip: banded vs quadratic.

VERDICT r3 item 3 "done" criterion: 8k+ windowed prompt prefills at O(T)
memory on chip.  The reference handles windowed prefill with flash-attn's
sliding-window mask (mistral_mustafar_Kt_Mag_Vt_Mag.py:983-989); the old
fallback here materialized [B,T,Hq,T] fp32 logits and could not run the
reference's 31.5k Mistral cap (config/model2maxlen.json).

Legs (Mistral-7B attention geometry Hq=32, Hkv=8, D=128, bf16):
  1. correctness @ T=4096/W=1024: banded == quadratic masked on chip
  2. banded perf @ T in {8192, 16384, 32768}, W=4096: wall time + peak HBM
  3. quadratic @ T=16384: expected OOM (34 GiB fp32 logits) — the cliff
  4. engine leg: 4-layer Mistral-SWA model, monolithic 16k prefill through
     Generator (the real call site, models/llama.py prefill -> attention.py)

Run: python benchmarks/bench_window_prefill.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

Hq, Hkv, D = 32, 8, 128
W = 4096


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.bfloat16)


def _time(fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))     # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return out, min(ts)


def main():
    from mustafar_tpu.ops.attention import (banded_window_prefill, causal_mask,
                                            mha, prefill_attention)
    dev = jax.devices()[0]
    result = {"metric": "window_prefill", "window": W,
              "geometry": f"B1xHq{Hq}xHkv{Hkv}xD{D}"}

    # -- leg 1: correctness at a quadratic-feasible shape ------------------
    T, Wc = 4096, 1024
    q, k, v = _rand((1, T, Hq, D), 0), _rand((1, T, Hkv, D), 1), _rand((1, T, Hkv, D), 2)

    @jax.jit
    def quad(q, k, v):
        pos = jnp.arange(T)
        return mha(q, k, v, causal_mask(pos, pos, T, Wc))

    @jax.jit
    def banded(q, k, v):
        return banded_window_prefill(q, k, v, T, Wc)

    ref, t_quad = _time(quad, q, k, v)
    out, t_band = _time(banded, q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    result["correctness_T4096_W1024"] = {
        "max_abs_err": err, "quad_ms": round(t_quad * 1e3, 2),
        "banded_ms": round(t_band * 1e3, 2)}
    print(f"T={T} W={Wc}: max|err|={err:.4g}  quad {t_quad*1e3:.1f} ms  "
          f"banded {t_band*1e3:.1f} ms", flush=True)
    assert err < 0.05, err
    del q, k, v, ref, out

    # -- leg 2: banded perf at long T --------------------------------------
    for T in (8192, 16384, 32768):
        q, k, v = _rand((1, T, Hq, D), 3), _rand((1, T, Hkv, D), 4), _rand((1, T, Hkv, D), 5)

        @jax.jit
        def f(q, k, v):
            return prefill_attention(q, k, v, T, window=W)

        _, t = _time(f, q, k, v)
        mem = dev.memory_stats() or {}
        peak = mem.get("peak_bytes_in_use", 0) / 2**30
        result[f"banded_T{T}"] = {"ms": round(t * 1e3, 2),
                                  "tok_s": round(T / t, 1),
                                  "peak_hbm_gib": round(peak, 2)}
        print(f"banded T={T} W={W}: {t*1e3:.1f} ms = {T/t:.0f} tok/s "
              f"(attn only), peak {peak:.2f} GiB", flush=True)
        del q, k, v

    # -- leg 3: quadratic cliff --------------------------------------------
    T = 16384
    q, k, v = _rand((1, T, Hq, D), 6), _rand((1, T, Hkv, D), 7), _rand((1, T, Hkv, D), 8)

    @jax.jit
    def quad16k(q, k, v):
        pos = jnp.arange(T)
        return mha(q, k, v, causal_mask(pos, pos, T, W))

    try:
        jax.block_until_ready(quad16k(q, k, v))
        result["quadratic_T16384"] = {"ran": True}
        print("quadratic T=16384: ran (unexpected)", flush=True)
    except Exception as e:
        import re
        m = re.search(r"Ran out of memory[^\n]*", str(e))
        result["quadratic_T16384"] = {"ran": False,
                                      "error": m.group(0) if m else str(e)[:160]}
        print(f"quadratic T=16384: {result['quadratic_T16384']['error']}",
              flush=True)
    del q, k, v

    # -- leg 4: engine-level windowed prefill ------------------------------
    from mustafar_tpu.config import (CacheMode, EngineConfig, MISTRAL_7B_SWA)
    from mustafar_tpu.models.llama import init_params
    from mustafar_tpu.runtime.generate import Generator

    T = 16384
    cfg = dataclasses.replace(MISTRAL_7B_SWA, num_layers=4, vocab_size=32000,
                              max_position_embeddings=32768)
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE,
                       max_seq_len=T + 512, prefill_bucket=256)
    params = jax.block_until_ready(init_params(cfg, jax.random.PRNGKey(0),
                                               dtype=jnp.bfloat16))
    gen = Generator(eng, params, dtype=jnp.bfloat16)
    prompt = np.random.RandomState(0).randint(1, cfg.vocab_size, (1, T))
    gen.generate(prompt, max_new_tokens=4, eos_id=None)          # compile
    t0 = time.perf_counter()
    gen.generate(prompt, max_new_tokens=4, eos_id=None)
    dt = time.perf_counter() - t0
    mem = dev.memory_stats() or {}
    result["engine_prefill_T16384_L4"] = {
        "s": round(dt, 2), "tok_s": round(T / dt, 1),
        "peak_hbm_gib": round(mem.get("peak_bytes_in_use", 0) / 2**30, 2)}
    print(f"engine (4L Mistral-SWA) 16k windowed prefill: {dt:.2f}s = "
          f"{T/dt:.0f} tok/s", flush=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
