"""Sparsity sweep for the bitmap-codec decode kernel (real TPU, device time).

VERDICT r2 missing-#1: the production q8q4 codec stores pruned chunks dense-
zeroed (fixed 0.75 B/elt), so sparsity above ~0.7 buys no HBM bytes; the
bitmap codec's bytes scale with nnz but its kernel lost to dense 3.5x at 0.7
(expansion-dominated).  This bench asks the round-3 question: at 0.9 sparsity
(keep 14 -> one stored segment of 16) does the v7 kernel beat dense XLA
attention at 10k ctx, and what do its bytes do?

Methodology: device-time via jax.profiler traces (wall-clock through the axon
tunnel is untrustworthy — CLAUDE.md platform-calibration note); one trace per
engine, parsed with benchmarks/parse_trace.summarize.

Run: python benchmarks/bench_sparsity_sweep.py [--iters 30]
"""

import argparse
import collections
import glob
import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops.kernels import sparse_attention as ska

B, Hkv, G, D, C, W = 32, 8, 4, 128, 256, 288
BH = B * Hkv


def device_ms(trace_dir: str, iters: int) -> float:
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    total = sum(e["dur"] for e in events
                if e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e.get("pid"), "")
                and e.get("name", "").startswith("jit"))
    return total / iters / 1000.0


def profiled(fn, args, tag: str, iters: int) -> float:
    out = fn(*args)                      # compile outside the trace
    jax.block_until_ready(out)
    trace = f"/tmp/sweep_trace_{tag}"
    os.system(f"rm -rf {trace}")
    with jax.profiler.trace(trace):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return device_ms(trace, iters)


def run(keep: int, mc: int, nact: int, win_len: int, iters: int,
        hpb: int = 16):
    fmt = sf.ChunkFormat(C, D, keep)
    rs = np.random.RandomState(0)
    pool = jax.lax.bitcast_convert_type(
        jnp.asarray(rs.randn(mc, BH, 2 * fmt.stream_rows, 128) * 0.1,
                    jnp.bfloat16), jnp.int16)
    k_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    v_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    q = jnp.asarray(rs.randn(B, 1, Hkv * G, D) * 0.1, jnp.bfloat16)
    nc, wl = jnp.int32(nact), jnp.int32(win_len)

    # big buffers are ARGUMENTS, not jit closures (HTTP 413 on remote compile)
    sparse_fn = jax.jit(lambda q, pool, nc, wl:
                        ska.fused_sparse_decode_attention_v7(
                            q, pool, k_win, v_win, nc, wl, fmt, fmt, mc,
                            hpb=hpb))
    t_sparse = profiled(sparse_fn, (q, pool, nc, wl), f"k{keep}", iters)

    sparse_bytes = (BH * nact * 2 * fmt.stream_rows * 128 * 2
                    + 2 * B * win_len * Hkv * D * 2)
    return t_sparse, sparse_bytes, fmt


def run_dense(S: int, iters: int):
    rs = np.random.RandomState(1)
    kd = jnp.asarray(rs.randn(B, Hkv, S, D) * 0.1, jnp.bfloat16)
    vd = jnp.array(kd)
    q = jnp.asarray(rs.randn(B, 1, Hkv * G, D) * 0.1, jnp.bfloat16)

    @jax.jit
    def dense_fn(q, kd, vd):
        qg = q[:, 0].reshape(B, Hkv, G, D)
        s = jnp.einsum("bhgd,bhsd->bhgs", qg, kd,
                       preferred_element_type=jnp.float32) / np.sqrt(D)
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhgs,bhsd->bhgd", w.astype(jnp.bfloat16), vd,
                          preferred_element_type=jnp.float32)

    t = profiled(dense_fn, (q, kd, vd), f"dense{S}", iters)
    return t, 2 * B * Hkv * S * D * 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--mc", type=int, default=40)
    ap.add_argument("--nact", type=int, default=39)
    ap.add_argument("--win", type=int, default=120)
    ap.add_argument("--keeps", nargs="*", type=int, default=[68, 40, 14])
    args = ap.parse_args()

    S = args.nact * C + args.win
    t_dense, dense_bytes = run_dense(S, args.iters)
    print(f"[dense ctx={S}] {t_dense:8.3f} ms  "
          f"({dense_bytes / t_dense / 1e6:6.1f} GB/s)")
    for keep in args.keeps:
        t, bts, fmt = run(keep, args.mc, args.nact, args.win, args.iters)
        print(f"[keep={keep:3d} segs={fmt.segs} rows={fmt.stream_rows}] "
              f"{t:8.3f} ms  ({bts / t / 1e6:6.1f} GB/s eff) | "
              f"vs dense {t_dense / t:5.2f}x speed, "
              f"{dense_bytes / bts:5.2f}x bytes")


if __name__ == "__main__":
    main()
