"""A/B device-time measurement of the bitmap-expansion rank variants.

VERDICT r4 weak #4: the bitmap codec's in-kernel expansion is ~6.6x off the
no-expansion floor at 10k ctx, and the round-2 bisection blamed the
f32->i32 cast + VPU<->MXU relayouts around the MXU triangular-matmul rank.
This times the production v7 kernel (bitmap bf16 and bitmap-q8) with
rank_mode="mxu" (round-2 design) vs rank_mode="vpu" (round-5 lane-roll
prefix sum that never leaves the VPU or i32) at three context depths.

Run on the real chip: python benchmarks/bench_rank_mode.py [--iters 30]
"""

import argparse
import glob
import gzip
import json
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops.kernels import sparse_attention as ska

B, Hkv, G, D, C, W = 32, 8, 4, 128, 256, 288
WIN_LEN = 120


def device_time(fn, args, iters, tag):
    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/rankmode_trace/{tag}"
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


def run_depth(mc, nact, iters):
    BH = B * Hkv
    rs = np.random.RandomState(0)
    nc, wl = jnp.int32(nact), jnp.int32(WIN_LEN)
    S = nact * C + WIN_LEN
    q = jnp.asarray(rs.randn(B, 1, Hkv * G, D) * 0.1, jnp.bfloat16)
    k_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    v_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)

    fmt = sf.ChunkFormat(C, D, 40)
    bm_pool = jax.lax.bitcast_convert_type(
        jnp.asarray(rs.randn(mc, BH, 2 * fmt.stream_rows, 128) * 0.1,
                    jnp.bfloat16), jnp.int16)
    fmt8 = sf.ChunkFormat(C, D, 40, qbits=8)
    bq8_pool = jnp.asarray(
        rs.randint(-2000, 2000, (mc, BH, 2 * fmt8.stream_rows, 128)),
        jnp.int16)
    ksc = jnp.asarray(rs.rand(mc, BH, D) * 0.02 + 0.01, jnp.bfloat16)
    vsc = jnp.asarray(rs.rand(mc, BH, D) * 0.02 + 0.01, jnp.bfloat16)

    row = {"ctx": S, "chunks": nact}
    for mode in ("mxu", "vpu"):
        bm_fn = jax.jit(lambda q, pool, nc, wl, m=mode:
                        ska.fused_sparse_decode_attention_v7(
                            q, pool, k_win, v_win, nc, wl, fmt, fmt, mc,
                            hpb=16, rank_mode=m))
        b8_fn = jax.jit(lambda q, pool, nc, wl, m=mode:
                        ska.fused_sparse_decode_attention_v7(
                            q, pool, k_win, v_win, nc, wl, fmt8, fmt8, mc,
                            hpb=16, kscales=ksc, vscales=vsc, rank_mode=m))
        row[f"bitmap_{mode}_us"] = round(device_time(
            bm_fn, (q, bm_pool, nc, wl), iters, f"bm_{mode}_{mc}") * 1e6, 1)
        row[f"bq8_{mode}_us"] = round(device_time(
            b8_fn, (q, bq8_pool, nc, wl), iters, f"b8_{mode}_{mc}") * 1e6, 1)
    row["bitmap_speedup"] = round(row["bitmap_mxu_us"]
                                  / row["bitmap_vpu_us"], 2)
    row["bq8_speedup"] = round(row["bq8_mxu_us"] / row["bq8_vpu_us"], 2)
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    rows = [run_depth(mc, nact, args.iters)
            for mc, nact in ((3, 3), (12, 12), (40, 39))]
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
