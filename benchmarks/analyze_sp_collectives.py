"""Scheduled-HLO evidence for the ring-attention SP prefill (parallel/ring.py).

Companion to analyze_collectives.py (which covers the sharded decode step):
AOT-compiles the sequence-parallel prefill of the FULL Llama-3-8B — ring
attention over the "data" axis, TP over "model", followed by the
reshard_cache handoff — for a real v5e:2x2 topology via
jax.experimental.topologies, and inventories the final scheduled HLO:

  * the ring's collective-permutes (one K + one V hop per ring step per
    layer) — kind, payload, replica groups, and whether the latency-hiding
    scheduler could overlap them (v5e keeps collectives as single scheduled
    instructions whose backend_config names the streaming emitter);
  * the TP all-reduces of the surrounding projections (unchanged by SP);
  * the cache-handoff all-to-all / collective-permutes from reshard_cache;
  * payload-vs-compute projection: ring bytes per chip vs the prefill's
    matmul FLOPs at the same shape.

Run: python benchmarks/analyze_sp_collectives.py [--topology v5e:2x2]
     (falls back to the 8-virtual-CPU mesh if topology compile unavailable)
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from analyze_collectives import (collective_impl_evidence, parse_collectives)


def build_sp_prefill(mesh, T=4096, B=2):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mustafar_tpu.cache import make_cache
    from mustafar_tpu.config import (CacheMode, EngineConfig, LLAMA3_8B,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.models.llama import init_params
    from mustafar_tpu.parallel import ring, sharding as sh

    cfg = LLAMA3_8B
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.7, v_sparsity=0.7),
                       max_seq_len=T + 64)
    impl = make_cache(eng)

    def abstract(tree, specs):
        flat = sh.filter_specs_for(tree, specs)
        return jax.tree.map(
            lambda s, p: jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=NamedSharding(mesh, p)),
            tree, flat)

    params_s = jax.eval_shape(
        lambda: init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
    params_a = abstract(params_s, sh.param_specs(cfg))
    cache_s = jax.eval_shape(lambda: impl.init(B, jnp.bfloat16))
    cspecs = sh.cache_specs(eng, cache_s)
    cache_a = abstract(cache_s, cspecs)
    tok_a = jax.ShapeDtypeStruct((B, T), jnp.int32,
                                 sharding=NamedSharding(mesh, P(None, "data")))

    def step(params, tokens, cache):
        logits, cache = ring.sp_prefill(cfg, params, tokens, cache, impl,
                                        jnp.int32(T), mesh, last_only=True)
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    return step, (params_a, tok_a, cache_a), cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x2")
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--out", default="/tmp/sp_prefill_scheduled.hlo")
    args = ap.parse_args()

    from jax.sharding import Mesh
    mesh = None
    if args.topology:
        try:
            from jax.experimental import topologies
            topo = topologies.get_topology_desc(platform="tpu",
                                                topology_name=args.topology)
            devs = np.array(topo.devices).reshape(args.dp, args.tp)
            mesh = Mesh(devs, ("data", "model"))
            print(f"AOT topology {args.topology}: {len(topo.devices)} devices")
        except Exception as e:
            print(f"topology unavailable ({type(e).__name__}: {e}); "
                  f"falling back to virtual CPU mesh")
    if mesh is None:
        jax.config.update("jax_platforms", "cpu")
        from mustafar_tpu.parallel import sharding as sh
        mesh = sh.make_mesh(args.dp, args.tp)

    step, abstract_args, cfg = build_sp_prefill(mesh, T=args.seq)
    comp = jax.jit(step).lower(*abstract_args).compile()
    txt = comp.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"scheduled HLO: {len(txt.splitlines())} lines -> {args.out}")

    colls = parse_collectives(txt)
    by_kind = defaultdict(lambda: {"n": 0, "bytes": 0})
    for c in colls:
        if c["kind"].endswith("-done"):
            continue
        mult = cfg.num_layers if c["in_loop"] else 1
        key = c["kind"].replace("-start", "")
        by_kind[key]["n"] += mult
        by_kind[key]["bytes"] += c["bytes"] * mult
    print(f"\nper-SP-prefill collectives (layer-scan body x{cfg.num_layers}):")
    total = 0
    for k, v in sorted(by_kind.items()):
        print(f"  {k:24s} n={v['n']:4d}  payload {v['bytes']/2**20:9.3f} MiB")
        total += v["bytes"]
    ring_perm = [c for c in colls if "collective-permute" in c["kind"]
                 and not c["kind"].endswith("-done")]
    print(f"  ring collective-permutes: {len(ring_perm)} sites "
          f"({sum(c['bytes'] for c in ring_perm)/2**20:.3f} MiB/site-chip)")

    ev = collective_impl_evidence(txt)
    kinds = defaultdict(set)
    for e in ev:
        kinds[e["kind"]].add((e["emitter"], e["barrier"]))
    for k, v in kinds.items():
        print(f"  emitter evidence {k}: {sorted(v)}")

    # payload-vs-compute projection at this shape.  Separate the SP-specific
    # traffic (ring permutes + one cache handoff) from the TP all-reduces a
    # non-SP tensor-parallel prefill pays identically.
    n = mesh.shape["data"]
    T, B, H, I, L = args.seq, 2, cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    sp_bytes = (by_kind["collective-permute"]["bytes"]
                + by_kind["all-to-all"]["bytes"])
    tp_bytes = by_kind["all-reduce"]["bytes"]
    flops = 2 * B * T * L * (H * (cfg.q_dim + 2 * cfg.kv_dim + cfg.q_dim)
                             + 3 * H * I) / n       # per chip, proj+MLP only
    mxu = 197e12 * 0.5                               # v5e bf16, 50% util
    t_compute = flops / mxu
    ici = 45e9
    t_sp = sp_bytes / ici
    print(f"\nprojection at T={T}, dp={n}: per-chip matmul time ~"
          f"{t_compute*1e3:.1f} ms; SP-specific traffic (ring + handoff) "
          f"{sp_bytes/2**20:.1f} MiB ~ {t_sp*1e3:.2f} ms on ICI -> "
          f"{100*t_compute/(t_compute+t_sp):.1f}% SP efficiency with ZERO "
          f"overlap credited (the ring permutes are issued before each "
          f"block's matmuls precisely so they overlap); TP all-reduces "
          f"({tp_bytes/2**20:.1f} MiB) are the same with or without SP")


if __name__ == "__main__":
    main()
