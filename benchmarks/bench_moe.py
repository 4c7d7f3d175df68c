"""MoE/EP decode performance leg (VERDICT r4 next #7).

Expert parallelism was correctness-complete (models/moe.py, tests) but had
zero perf evidence.  Two measurements on a tiny-Mixtral that fits one chip
(W8 experts, the production expert format):

  1. end-to-end decode tok/s through the Generator on the production q8q4
     compressed engine (reference bench shape B=32, prompt 300), MoE model
     vs a DENSE-MLP model of identical active FLOPs per token (I scaled by
     top_k) — the "MoE serving tax" end to end;
  2. device-time A/B of the MoE block at the decode shape: full moe_mlp
     (router + capacity dispatch + expert einsums + combine) vs the expert
     einsums alone on a precomputed dispatch — the DISPATCH OVERHEAD
     ms/layer-step that capacity-based dense dispatch costs on TPU.

Run on the real chip: python benchmarks/bench_moe.py
"""

import dataclasses
import glob
import gzip
import json
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.config import (CacheMode, EngineConfig, ModelConfig,
                                 PruneConfig, PruneMethod)

# tiny-Mixtral: 8 experts, top-2, Mixtral-like ratios at 1/4 scale.
# Experts: 8 L x 8 E x 3 x (1024 x 3584) = 705M params -> 0.71 GiB W8.
MOE_TINY = ModelConfig(
    name="tiny-mixtral", vocab_size=32000, hidden_size=1024,
    intermediate_size=3584, num_layers=8, num_heads=8, num_kv_heads=8,
    head_dim=128, max_position_embeddings=4096, num_experts=8,
    num_experts_per_tok=2, expert_capacity_factor=1.25)

# dense twin with the same ACTIVE MLP FLOPs per token (I * top_k)
DENSE_TWIN = dataclasses.replace(
    MOE_TINY, name="tiny-mixtral-densetwin", num_experts=0,
    intermediate_size=MOE_TINY.intermediate_size
    * MOE_TINY.num_experts_per_tok)


def device_time(fn, args, iters, tag):
    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/moe_trace/{tag}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as fh:
        events = json.load(fh)["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    total = sum(e["dur"] for e in events
                if e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e.get("pid"), "")
                and e.get("name", "").startswith("jit"))
    return total / iters / 1e6


def _w8(cfg):
    from mustafar_tpu.models.llama import init_params
    from mustafar_tpu.models.quant import quantize_params
    p = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    return jax.block_until_ready(quantize_params(p, donate=True))


def leg_endtoend(gen_tokens=200, B=32, prompt_len=300):
    from mustafar_tpu.runtime.generate import Generator

    res = {}
    for name, cfg in (("moe", MOE_TINY), ("dense_twin", DENSE_TWIN)):
        params = _w8(cfg)
        eng = EngineConfig(
            model=cfg, cache_mode=CacheMode.COMPRESSED,
            prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                              k_sparsity=0.7, v_sparsity=0.7),
            max_seq_len=1312, prefill_bucket=256, chunk_size=256,
            codec="q8q4")
        prompt = np.random.RandomState(0).randint(1, cfg.vocab_size,
                                                  (B, prompt_len))
        gen = Generator(eng, params, dtype=jnp.bfloat16)
        out = gen.generate(prompt, max_new_tokens=gen_tokens, eos_id=None)
        t0 = time.perf_counter()
        for _ in range(2):
            out = gen.generate(prompt, max_new_tokens=gen_tokens, eos_id=None)
        dt = (time.perf_counter() - t0) / 2
        res[f"{name}_tok_s"] = round(sum(len(o) for o in out) / dt, 1)
        res[f"{name}_weights_gib"] = round(sum(
            x.nbytes for x in jax.tree.leaves(params)) / 2**30, 2)
        del params, gen
        jax.clear_caches()
    res["moe_vs_dense_twin"] = round(res["moe_tok_s"]
                                     / res["dense_twin_tok_s"], 3)
    return res


def leg_dispatch_overhead(iters=100):
    """moe_mlp at the decode shape vs expert einsums on fixed dispatch."""
    from mustafar_tpu.models import moe

    cfg = MOE_TINY
    lp = jax.tree.map(
        lambda a: a[0],
        moe.init_moe_params(cfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16))
    B, H = 32, cfg.hidden_size
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 1, H), jnp.bfloat16)

    full = jax.jit(lambda x: moe.moe_mlp(cfg, lp, x))
    t_full = device_time(full, (x,), iters, "moe_full")

    # experts-only floor: the three batched einsums on a fixed dispatch
    E = cfg.num_experts
    C = moe.expert_capacity(B, E, cfg.num_experts_per_tok,
                            cfg.expert_capacity_factor)
    xe = jax.random.normal(jax.random.PRNGKey(3), (E, C, H), jnp.bfloat16)

    @jax.jit
    def experts_only(xe):
        hg = jax.nn.silu(jnp.einsum("ech,ehi->eci", xe,
                                    lp["we_gate"].astype(xe.dtype)))
        hu = jnp.einsum("ech,ehi->eci", xe, lp["we_up"].astype(xe.dtype))
        return jnp.einsum("eci,eih->ech", hg * hu,
                          lp["we_down"].astype(xe.dtype))

    t_experts = device_time(experts_only, (xe,), iters, "moe_experts")
    return {"decode_shape": f"B{B} x 1 x H{H}, E{E} top{cfg.num_experts_per_tok} C{C}",
            "moe_block_us": round(t_full * 1e6, 1),
            "experts_only_us": round(t_experts * 1e6, 1),
            "dispatch_overhead_us": round((t_full - t_experts) * 1e6, 1),
            "dispatch_share": round(1 - t_experts / t_full, 3)
            if t_full else None}          # no TPU trace events off-chip


def main():
    res = {"model": MOE_TINY.name,
           "geometry": f"L{MOE_TINY.num_layers} H{MOE_TINY.hidden_size} "
                       f"I{MOE_TINY.intermediate_size} E{MOE_TINY.num_experts} "
                       f"top{MOE_TINY.num_experts_per_tok} W8"}
    res.update(leg_dispatch_overhead())
    res.update(leg_endtoend())
    print(json.dumps(res))


if __name__ == "__main__":
    main()
