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

Every leg — including the flagship — runs in ITS OWN SUBPROCESS on a clean
chip, serialized (one chip).  The axon backend's allocator never defragments
or returns freed pages, so any in-process leg ordering leaves residue that
OOMs a later leg (round-4 check runs tried them all); the parent process
never initializes the TPU.  Compile cost is unaffected: the legs' programs
are mutually distinct (different weight dtypes / shapes / configs), so the
in-process version recompiled per leg anyway.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# The axon TPU plugin ignores JAX_PLATFORMS=cpu (CLAUDE.md); this env var
# forces CPU for structure tests and is inherited by the leg subprocesses.
if os.environ.get("MUSTAFAR_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")


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


def _ctx(batch=None, prompt_len=None, gen_tokens=None):
    """Shared shape/config derivation for every leg.  Initializes the
    backend — only call inside a leg subprocess, never in the parent."""
    from mustafar_tpu.config import LLAMA3_8B

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
    cfg_full = LLAMA3_8B if on_tpu else dataclasses.replace(
        LLAMA3_8B, num_layers=2, vocab_size=512, intermediate_size=256,
        hidden_size=256, num_heads=2, num_kv_heads=2)
    return dict(on_tpu=on_tpu, B=B, prompt_len=prompt_len,
                gen_tokens=gen_tokens, max_seq=max_seq, cfg_full=cfg_full)


# --------------------------------------------------------------------------
# Legs.  Each runs in its own subprocess on a clean chip and returns a dict;
# the flagship leg's dict carries the headline numbers.
# --------------------------------------------------------------------------

def _leg_flagship(ctx):
    """FULL 32-layer Llama-3-8B (the reference's bench model,
    mem_spd_test.py:7-17), weight-only int8."""
    from mustafar_tpu.models.quant import init_params_w8, weight_bytes

    cfg, B = ctx["cfg_full"], ctx["B"]
    sparse_eng, dense_eng = _engines(cfg, ctx["max_seq"])
    prompt = np.random.RandomState(0).randint(1, cfg.vocab_size,
                                              (B, ctx["prompt_len"]))
    w8 = jax.block_until_ready(init_params_w8(cfg, jax.random.PRNGKey(0)))
    out = {"backend": jax.default_backend(),
           "full8b_w8_weights_gib": round(weight_bytes(w8) / 2**30, 2)}
    sparse_tps, sparse_dt, (hbm_sparse, hbm_kind) = build(
        sparse_eng, w8, jnp.bfloat16, prompt, ctx["gen_tokens"])
    dense_tps, dense_dt, (hbm_dense, _) = build(
        dense_eng, w8, jnp.bfloat16, prompt, ctx["gen_tokens"])
    out.update({
        "model": f"llama-3-8b x{cfg.num_layers}L (full) + W8",
        "sparse_tok_s": round(sparse_tps, 1),
        "dense_tok_s": round(dense_tps, 1),
        "sparse_s_per_gen": round(sparse_dt, 3),
        "dense_s_per_gen": round(dense_dt, 3),
        # HBM (GiB) measured while each engine's cache was live;
        # hbm_kind "peak" = device counter, "live" = resident buffers
        "hbm_sparse_gib": hbm_sparse,
        "hbm_dense_gib": hbm_dense,
        "hbm_kind": hbm_kind,
    })
    return out


def _leg_w4(ctx):
    """Flagship geometry with int4 blocked weights."""
    from mustafar_tpu.models.quant import init_params_w4, weight_bytes

    cfg, B = ctx["cfg_full"], ctx["B"]
    sparse_eng, dense_eng = _engines(cfg, ctx["max_seq"])
    prompt = np.random.RandomState(0).randint(1, cfg.vocab_size,
                                              (B, ctx["prompt_len"]))
    w4 = jax.block_until_ready(init_params_w4(cfg, jax.random.PRNGKey(0)))
    out = {"full8b_w4_weights_gib": round(weight_bytes(w4) / 2**30, 2)}
    s4_tps, _, (hbm_s4, _) = build(sparse_eng, w4, jnp.bfloat16, prompt,
                                   ctx["gen_tokens"])
    d4_tps, _, _ = build(dense_eng, w4, jnp.bfloat16, prompt,
                         ctx["gen_tokens"])
    out.update({"sparse_w4_tok_s": round(s4_tps, 1),
                "dense_w4_tok_s": round(d4_tps, 1),
                "hbm_sparse_w4_gib": hbm_s4})
    return out


def _leg_deep(ctx):
    """Deep-context leg (VERDICT r3 weak #4): the reference's 300+600 shape
    is weight-bound and hides where sparsity pays; at B=8 x 4k the attention
    stream is a first-class cost.  End-to-end tok/s dilutes the decode
    contrast with ~4-5 s of (engine-independent) B8 x 3.6k prefill charged
    to only 512 steps, so the leg also reports a two-point DECODE-ONLY rate:
    gen=512 minus gen=1 wall time cancels prefill + fixed dispatch exactly
    (both runs share the prompt, engine, and compiled prefill path)."""
    from mustafar_tpu.models.quant import init_params_w8

    cfg = ctx["cfg_full"]
    deep_prompt, deep_gen, deep_B = 3584, 512, 8
    deep_seq = ((deep_prompt + deep_gen + 255) // 256) * 256 + 288
    sparse_d, dense_d = _engines(cfg, deep_seq)
    pd = np.random.RandomState(1).randint(1, cfg.vocab_size,
                                          (deep_B, deep_prompt))
    w8d = jax.block_until_ready(init_params_w8(cfg, jax.random.PRNGKey(0)))
    out = {"deep_shape": f"B{deep_B} x {deep_prompt}+{deep_gen}"}
    dec = {}
    for name, eng in (("sparse", sparse_d), ("dense", dense_d)):
        tps, dt_full, _ = build(eng, w8d, jnp.bfloat16, pd, deep_gen, reps=2)
        _, dt_pref, _ = build(eng, w8d, jnp.bfloat16, pd, 1, reps=2)
        dec[name] = deep_B * (deep_gen - 1) / max(dt_full - dt_pref, 1e-6)
        out[f"deep_{name}_tok_s"] = round(tps, 1)
        out[f"deep_{name}_decode_tok_s"] = round(dec[name], 1)
        out[f"deep_{name}_prefill_s"] = round(dt_pref, 2)
    out["deep_vs_dense"] = round(out["deep_sparse_tok_s"]
                                 / out["deep_dense_tok_s"], 3)
    out["deep_decode_vs_dense"] = round(dec["sparse"] / dec["dense"], 3)
    return out


def _leg_bf16_16l(ctx):
    """Continuity leg: reference geometry at reduced depth, bf16 weights
    (the round-1/2 headline — full bf16 does not fit one 16 GiB chip)."""
    from mustafar_tpu.config import LLAMA3_8B
    from mustafar_tpu.models.llama import init_params

    on_tpu, B = ctx["on_tpu"], ctx["B"]
    layers = 16 if on_tpu else 2
    cfg16 = dataclasses.replace(LLAMA3_8B, num_layers=layers,
                                vocab_size=32000 if on_tpu else 512)
    if not on_tpu:
        cfg16 = dataclasses.replace(
            cfg16, intermediate_size=256, hidden_size=256, num_heads=2,
            num_kv_heads=2)
    sparse16, dense16 = _engines(cfg16, ctx["max_seq"])
    p16 = np.random.RandomState(0).randint(1, cfg16.vocab_size,
                                           (B, ctx["prompt_len"]))
    params16 = jax.block_until_ready(
        init_params(cfg16, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
    s16_tps, _, _ = build(sparse16, params16, jnp.bfloat16, p16,
                          ctx["gen_tokens"])
    d16_tps, _, _ = build(dense16, params16, jnp.bfloat16, p16,
                          ctx["gen_tokens"])
    return {"bf16_16l_sparse_tok_s": round(s16_tps, 1),
            "bf16_16l_dense_tok_s": round(d16_tps, 1)}


def _leg_cap32k(ctx):
    """Capacity point: can the 32k-context B=8 cache be SERVED from HBM?
    The dense bf16 cache is 32 GiB — double the chip; the q8q4 pool is
    12.3 GiB and fits.  A bare zeros-allocation is not evidence (the axon
    runtime reported a 32 GiB zero pool as "fits" in round 4 — lazy/spilled
    pages), so the probe fills every leaf with distinct values and then
    times a full-pool reduction: resident HBM reads at the ~700 GB/s
    roofline; anything host-spilled shows up orders of magnitude slower."""
    from mustafar_tpu.cache import make_cache

    out = {}
    for name, eng32 in zip(("dense", "sparse"),
                           _engines(ctx["cfg_full"], 32768)[::-1]):
        try:
            @jax.jit
            def _alloc():
                c = make_cache(eng32).init(8, jnp.bfloat16)
                return jax.tree.map(
                    lambda x: jax.lax.iota(
                        x.dtype if x.dtype != jnp.bool_ else jnp.int32,
                        x.size).reshape(x.shape).astype(x.dtype)
                    if x.size > 1 else x, c)

            c = jax.block_until_ready(_alloc())
            gib = sum(x.nbytes for x in jax.tree.leaves(c)) / 2**30

            # reduce the filled pool so "fits" means materialized + readable,
            # not merely allocated.  (No GB/s is reported: wall-clock through
            # the dispatch tunnel is untrustworthy — a 12 GiB reduction
            # "measured" 133 TB/s; see benchmarks/parse_trace.py.)
            @jax.jit
            def _touch(c):
                return sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree.leaves(c))

            jax.block_until_ready(_touch(c))
            out[f"cap32k_{name}"] = f"fits ({gib:.1f} GiB resident)"
            del c
        except Exception:
            out[f"cap32k_{name}"] = "OOM"
        jax.clear_caches()
    return out


LEGS = {"flagship": _leg_flagship, "w4": _leg_w4, "deep": _leg_deep,
        "bf16_16l": _leg_bf16_16l, "cap32k": _leg_cap32k}
_LEG_SENTINEL = "BENCH_LEG_RESULT:"

# Global wall-clock budget (round-4 lesson: the driver runs bench.py under
# its own `timeout` — r4's run was killed at rc=124 having printed NOTHING,
# losing the round's number.  Every leg timeout is now clipped to the time
# remaining, and the headline JSON is printed+flushed the moment the
# flagship leg returns; detail legs only spend what's left).
_BUDGET_S = float(os.environ.get("MUSTAFAR_BENCH_BUDGET_S", "2400"))
_T0 = time.monotonic()


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def _run_leg(name, detail, argv_shape, timeout=900):
    timeout = min(timeout, _remaining() - 15)
    if timeout < 60:
        detail[f"leg_error_{name}"] = "skipped (budget exhausted)"
        return False
    cmd = [sys.executable, os.path.abspath(__file__), "--leg", name,
           *argv_shape]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith(_LEG_SENTINEL):
                detail.update(json.loads(line[len(_LEG_SENTINEL):]))
                return True
        err = (proc.stderr or "").strip().splitlines()
        detail[f"leg_error_{name}"] = (err[-1] if err else
                                       f"no result (rc={proc.returncode})")[:200]
    except subprocess.TimeoutExpired:
        detail[f"leg_error_{name}"] = f"timeout after {timeout:.0f}s"
    except Exception as e:  # noqa: BLE001
        detail[f"leg_error_{name}"] = f"{type(e).__name__}: {e}"[:200]
    print(f"[bench] leg {name} failed: {detail[f'leg_error_{name}']}",
          file=sys.stderr)
    return False


def _headline(detail):
    sparse_tps = detail.get("sparse_tok_s", 0.0)
    dense_tps = detail.get("dense_tok_s", 0.0)
    d = {k: v for k, v in detail.items() if k != "sparse_tok_s"}
    return json.dumps({
        "metric": "full8b_w8_sparse_decode_throughput",
        "value": sparse_tps,
        "unit": "tok/s",
        "vs_baseline": round(sparse_tps / dense_tps, 3) if dense_tps else 0.0,
        "detail": d,
    })


def main(batch=None, prompt_len=None, gen_tokens=None):
    """Orchestrator: spawns one subprocess per leg; never touches the TPU.

    Prints the headline JSON line IMMEDIATELY after the flagship leg (so a
    driver-side timeout can no longer erase the round's number), then runs
    detail legs with whatever budget remains and re-prints the enriched
    headline as the final line.
    """
    argv_shape = []
    if batch:
        argv_shape += ["--batch", str(batch)]
    if prompt_len:
        argv_shape += ["--prompt", str(prompt_len)]
    if gen_tokens:
        argv_shape += ["--gen", str(gen_tokens)]

    detail = {"k_sparsity": 0.7, "v_sparsity": 0.7, "codec": "q8q4"}
    ok = _run_leg("flagship", detail, argv_shape, timeout=1800)
    if not ok and _remaining() > 600:
        # one retry — transient chip contention must not cost the round
        detail.pop("leg_error_flagship", None)
        ok = _run_leg("flagship", detail, argv_shape, timeout=1800)
    if not ok:
        print(_headline(detail), flush=True)
        sys.exit(1)

    on_tpu = detail.get("backend") == "tpu"
    detail.update({"batch": batch or (32 if on_tpu else 2),
                   "prompt": prompt_len or (300 if on_tpu else 64),
                   "gen": gen_tokens or (600 if on_tpu else 16)})
    print(_headline(detail), flush=True)  # the round's number is now safe

    leg_names = ["w4", "bf16_16l", "deep", "cap32k"] if on_tpu \
        else ["w4", "bf16_16l"]
    ran_detail = False
    for name in leg_names:
        ran_detail |= _run_leg(name, detail, argv_shape)
    if ran_detail or any(k.startswith("leg_error_") for k in detail):
        print(_headline(detail), flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=sorted(LEGS))
    ap.add_argument("--batch", type=int)
    ap.add_argument("--prompt", type=int)
    ap.add_argument("--gen", type=int)
    a = ap.parse_args()
    if a.leg:
        res = LEGS[a.leg](_ctx(a.batch, a.prompt, a.gen))
        print(_LEG_SENTINEL + json.dumps(res), flush=True)
    else:
        main(batch=a.batch, prompt_len=a.prompt, gen_tokens=a.gen)
