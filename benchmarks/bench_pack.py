"""Prune+quantize+pack microbench: fused Pallas kernel vs the XLA pass chain.

Round-2 profiling put prune+pack at ~25% of prefill device time (the 15-round
threshold bisection is one HBM pass per magnitude bit in XLA).  Measures both
implementations at the bench shape (one chunk across all heads of a
B=32/Hkv=8 batch) by profiler device time.

Run: python benchmarks/bench_pack.py [--iters 30]
"""

import argparse
import glob
import gzip
import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.ops import quant_format as qf
from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops.kernels.pack_kernel import prune_quant_pack


def device_ms(trace_dir, iters):
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as fh:
        events = json.load(fh)["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    total = sum(e["dur"] for e in events
                if e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e.get("pid"), "")
                and e.get("name", "").startswith("jit"))
    return total / iters / 1000.0


def profiled(fn, args, tag, iters):
    out = jax.block_until_ready(fn(*args))
    trace = f"/tmp/pack_trace/{tag}"
    shutil.rmtree(trace, ignore_errors=True)
    with jax.profiler.trace(trace):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return device_ms(trace, iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bh", type=int, default=256)   # B=32 x Hkv=8
    args = ap.parse_args()
    C, D, keep = 256, 128, 40
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(args.bh, C, D) * 0.3, jnp.bfloat16)

    rows = []
    for bits in (8, 4):
        codec = qf.QuantCodec(C, D, bits, bits)

        def xla_pack(x):
            pruned = jnp.where(sf.topk_mask(x, keep), x, 0).astype(jnp.bfloat16)
            return qf.encode_chunk(pruned, codec, "k")

        t_xla = profiled(jax.jit(xla_pack), (x,), f"xla{bits}", args.iters)
        t_krn = profiled(
            jax.jit(lambda x: prune_quant_pack(x, keep, bits)), (x,),
            f"krn{bits}", args.iters)
        in_bytes = args.bh * C * D * 2
        print(f"bits={bits}: XLA {t_xla:8.3f} ms | kernel {t_krn:8.3f} ms "
              f"({in_bytes / t_krn / 1e6:6.1f} GB/s in) | "
              f"speedup {t_xla / t_krn:5.2f}x", flush=True)
        rows.append({"bits": bits, "xla_ms": round(t_xla, 3),
                     "kernel_ms": round(t_krn, 3),
                     "speedup": round(t_xla / t_krn, 2)})
    print(json.dumps({"metric": "prune_quant_pack_device_ms", "rows": rows}))


if __name__ == "__main__":
    main()
