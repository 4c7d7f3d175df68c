"""Structural collective/overlap evidence for the multi-chip decode step.

One real chip is available here, so multi-chip *execution* cannot be timed —
but the XLA pipeline that schedules multi-chip programs can be run exactly:
``jax.experimental.topologies`` AOT-compiles the production sharded q8q4
decode step for a real v5e topology (2x2 by default), producing the final
SCHEDULED TPU HLO (``is_scheduled=true``, tiled layouts, LHS-placed
collectives).  From it this script extracts:

  * every collective in the step: kind, shape, replica groups, payload bytes;
  * async start/done pairs and how many scheduled instructions the latency-
    hiding scheduler hoisted between them (the overlap evidence VERDICT r2
    asked for);
  * per-decode-step collective bytes per chip -> a 2-host scaling projection
    against the >=85% efficiency target (BASELINE.md north star) with an
    explicit ICI/DCN bandwidth model.

Falls back to the 8-virtual-CPU-device mesh (same SPMD partitioner, sync
collectives only) if topology compilation is unavailable.

Run: python benchmarks/analyze_collectives.py [--topology v5e:2x2]
"""

from __future__ import annotations

import argparse
import json
import re
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

BYTES = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
         "s8": 1, "u8": 1, "pred": 1, "f16": 2}

COLL_RE = re.compile(
    r"%(?P<name>[\w.-]+) = (?P<shapes>.*?)\s"
    r"(?P<kind>all-reduce(?:-start|-done)?|all-gather(?:-start|-done)?|"
    r"reduce-scatter|collective-permute(?:-start|-done)?|all-to-all)"
    r"\((?P<args>[^)]*)\)(?P<rest>.*)")

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shapes: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(shapes):
        if dt not in BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * BYTES[dt]
    return total


def parse_collectives(txt: str):
    """Per-line collective inventory + start/done hoisting distances."""
    colls = []
    start_pos = {}
    lines = txt.splitlines()
    for i, ln in enumerate(lines):
        m = COLL_RE.search(ln)
        if not m:
            continue
        kind = m.group("kind")
        entry = {
            "name": m.group("name"), "kind": kind, "line": i,
            "bytes": shape_bytes(m.group("shapes")),
            "groups": (re.search(r"replica_groups=(\S+?),", ln) or [None, ""])[1],
            # inside the layer scan -> executes num_layers times per step
            "in_loop": "while/body" in ln,
        }
        if kind.endswith("-start"):
            start_pos[m.group("name")] = (i, entry)
        if kind.endswith("-done"):
            # the done's operand names its start
            arg = m.group("args").strip().lstrip("%")
            if arg in start_pos:
                j, s_entry = start_pos[arg]
                # scheduled instructions hoisted between the pair
                gap = sum(1 for k in range(j + 1, i)
                          if re.search(r"%[\w.-]+ = ", lines[k]))
                entry["hoisted_insts"] = gap
                s_entry["hoisted_insts"] = gap
        colls.append(entry)
    return colls


def build_step(mesh):
    """The production sharded q8q4 decode step on the FULL Llama-3-8B with W8
    weights, all inputs abstract (ShapeDtypeStructs with shardings)."""
    from mustafar_tpu.cache.compressed import CompressedKVCache
    from mustafar_tpu.config import (CacheMode, EngineConfig, LLAMA3_8B,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.models import llama
    from mustafar_tpu.models.llama import init_params
    from mustafar_tpu.models.quant import quantize_params
    from mustafar_tpu.parallel import sharding as sh
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = LLAMA3_8B
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.7, v_sparsity=0.7),
                       max_seq_len=4384, prefill_bucket=256, chunk_size=256,
                       codec="q8q4")
    impl = CompressedKVCache(eng, use_pallas=True)
    impl.mesh = mesh
    B = 32

    def abstract(tree, specs):
        flat = sh.filter_specs_for(tree, specs)
        return jax.tree.map(
            lambda s, p: jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=NamedSharding(mesh, p)),
            tree, flat)

    params_s = jax.eval_shape(
        lambda: quantize_params(init_params(cfg, jax.random.PRNGKey(0),
                                            dtype=jnp.bfloat16)))
    params_a = abstract(params_s, sh.param_specs(cfg))
    cache_s = jax.eval_shape(lambda: impl.init(B, jnp.bfloat16))
    cache_a = abstract(cache_s, sh.cache_specs(eng, cache_s))
    tok_a = jax.ShapeDtypeStruct((B, 1), jnp.int32,
                                 sharding=NamedSharding(mesh, P("data", None)))

    def step(params, tok, cache):
        logits, cache = llama.decode_step(cfg, params, tok, cache, impl,
                                          jnp.int32(2000))
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    return step, (params_a, tok_a, cache_a), cfg, B


def collective_impl_evidence(txt: str):
    """How the TPU backend implements each collective (overlap evidence).

    Unlike XLA:GPU, the v5e final scheduled HLO does NOT split collectives
    into async start/done pairs — the `backend_config` of the scheduled
    instruction names the streaming emitter (e.g. RotatedPincerEmitter, a
    pipelined rotated-pincer ring that moves chunks through scoped VMEM
    concurrently with the surrounding schedule) and a CUSTOM barrier, i.e.
    overlap is an emitter/DMA property, not an HLO-schedule split.  This
    function extracts that per-collective evidence verbatim."""
    out = []
    for ln in txt.splitlines():
        if re.search(r"= \S+ (all-reduce|all-gather|reduce-scatter|"
                     r"collective-permute|all-to-all)\(", ln):
            emitter = re.search(r'"emitter":"(\w+)"', ln)
            barrier = re.search(r'"barrier_type":"(\w+)"', ln)
            scoped = re.search(r'"memory_space":"\d+","offset":"\d+",'
                               r'"size":"(\d+)"', ln)
            out.append({
                "kind": COLL_RE.search(ln).group("kind"),
                "emitter": emitter.group(1) if emitter else None,
                "barrier": barrier.group(1) if barrier else None,
                "scoped_vmem_bytes": int(scoped.group(1)) if scoped else None,
            })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x2")
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--out", default="/tmp/decode_step_scheduled.hlo")
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

    step, abstract_args, cfg, B = build_step(mesh)
    lowered = jax.jit(step).lower(*abstract_args)
    comp = lowered.compile()
    txt = comp.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"scheduled HLO: {len(txt.splitlines())} lines -> {args.out}")

    colls = parse_collectives(txt)
    by_kind = defaultdict(lambda: {"n": 0, "bytes": 0})
    for c in colls:
        if c["kind"].endswith("-done"):
            continue                       # count each collective once
        mult = cfg.num_layers if c["in_loop"] else 1
        key = c["kind"].replace("-start", "")
        by_kind[key]["n"] += mult
        by_kind[key]["bytes"] += c["bytes"] * mult
    pairs = [c for c in colls if c["kind"].endswith("-start")]
    hoisted = [c.get("hoisted_insts") for c in pairs
               if c.get("hoisted_insts") is not None]

    total_bytes = sum(v["bytes"] for v in by_kind.values())
    print("\nper-decode-step collectives (per-chip payload, layer-scan body "
          f"counted x{cfg.num_layers}):")
    for k, v in sorted(by_kind.items()):
        print(f"  {k:24s} n={v['n']:3d}  payload {v['bytes']/2**20:8.3f} MiB")
    for c in colls:
        if not c["kind"].endswith("-done"):
            print(f"    line {c['line']}: {c['kind']} {c['bytes']/2**10:.1f} "
                  f"KiB groups={c['groups']}"
                  + (" [in layer scan]" if c["in_loop"] else ""))
    print(f"  async start/done pairs: {len(pairs)}; "
          f"instructions hoisted between pairs: "
          f"{hoisted if hoisted else 'none (sync schedule)'}")

    # ---- 2-host projection ------------------------------------------------
    # Mesh layout: tp=2 INSIDE each host (ICI, v5e ~45 GB/s/link effective
    # one-way per the public spec sheet), dp=2 ACROSS hosts (DCN).  The
    # decode step's collectives are all TP-group all-reduces (replica_groups
    # pair devices within a host) -> inter-host bytes per decode step are
    # ZERO; DCN carries only host-side batch dispatch (tokens in/out,
    # ~B*4 bytes).  Per-chip step time from the round-2 measured W8 decode
    # (11-15 ms at the bench shape) vs collective time on ICI:
    ici_gbps = 45.0
    t_coll_ms = total_bytes / (ici_gbps * 1e9) * 1e3
    t_step_ms = 12.0
    eff = t_step_ms / (t_step_ms + t_coll_ms)
    print(f"\n2-host projection (tp over ICI, dp over DCN):")
    print(f"  TP collective payload/step/chip: {total_bytes/2**20:.3f} MiB "
          f"-> {t_coll_ms:.3f} ms on ICI at {ici_gbps:.0f} GB/s")
    print(f"  inter-host (DCN) payload/step: ~{B*4} B (token ids only)")
    print(f"  projected scaling efficiency if collectives fully serialize: "
          f"{eff*100:.1f}% (overlap raises it; target >= 85%)")
    impl_ev = collective_impl_evidence(txt)
    print("\ncollective implementation (scheduled-HLO backend_config):")
    for e in impl_ev:
        print(f"  {e['kind']:20s} emitter={e['emitter']} "
              f"barrier={e['barrier']} scoped_vmem={e['scoped_vmem_bytes']}")
    print(json.dumps({
        "metric": "decode_step_collectives",
        "mesh": dict(dp=args.dp, tp=args.tp),
        "collectives": {k: v for k, v in by_kind.items()},
        "async_pairs": len(pairs),
        "hoisted_insts": hoisted,
        "emitters": sorted({e["emitter"] for e in impl_ev if e["emitter"]}),
        "total_payload_bytes": total_bytes,
        "projected_min_efficiency": round(eff, 4),
    }))


if __name__ == "__main__":
    main()
