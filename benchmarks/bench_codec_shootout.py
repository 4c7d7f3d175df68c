"""Decode-attention codec shootout at several context depths (real TPU).

Times the three production decode-attention paths against dense XLA at the
same live-token counts, by PROFILER DEVICE TIME (wall-clock through the axon
dispatch tunnel overstates ~2x and chained harnesses corrupt — CLAUDE.md):

  * bitmap v7   — packed sparse stream, in-kernel bitmap expansion
  * q8q4        — quantized-dense chunks (int8 K / int4 V), shift-expansion
  * dense XLA   — bf16 full cache, XLA fused attention (platform baseline)

Shapes: reference bench geometry (B=32, Hq=32/Hkv=8, D=128, C=256 chunks,
120-token live window).  Context sweep covers the table in
docs/PERFORMANCE.md "Long-context measurement": ~900 / ~3.2k / ~10k tokens.

Run: python benchmarks/bench_codec_shootout.py [--iters 30]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.ops import quant_format as qf
from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops.kernels import quant_attention as qa
from mustafar_tpu.ops.kernels import sparse_attention as ska

B, Hkv, G, D, C, W = 32, 8, 4, 128, 256, 288
WIN_LEN = 120


def device_time(fn, args, iters, tag):
    """Median-free total-device-time per call from a jax.profiler trace."""
    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/shootout_trace/{tag}"
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
    return total / iters / 1e6                                   # seconds


def run_depth(mc, nact, iters):
    BH = B * Hkv
    rs = np.random.RandomState(0)
    fmt = sf.ChunkFormat(C, D, 40)
    codec = qf.QuantCodec(C, D, 8, 4)
    nc, wl = jnp.int32(nact), jnp.int32(WIN_LEN)
    S = nact * C + WIN_LEN

    q = jnp.asarray(rs.randn(B, 1, Hkv * G, D) * 0.1, jnp.bfloat16)
    k_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    v_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)

    # big buffers are ARGUMENTS, not jit closures — captured multi-hundred-MB
    # arrays are baked into the program and fail remote compile (HTTP 413)
    bm_pool = jax.lax.bitcast_convert_type(
        jnp.asarray(rs.randn(mc, BH, 2 * fmt.stream_rows, 128) * 0.1,
                    jnp.bfloat16), jnp.int16)
    bm_fn = jax.jit(lambda q, pool, nc, wl:
                    ska.fused_sparse_decode_attention_v7(
                        q, pool, k_win, v_win, nc, wl, fmt, fmt, mc, hpb=16))

    q_pool = jnp.asarray(
        rs.randint(-2000, 2000, (mc, BH, codec.stream_rows, 128)), jnp.int16)
    ksc = jnp.asarray(rs.rand(mc, BH, D) * 0.02 + 0.01, jnp.bfloat16)
    vsc = jnp.asarray(rs.rand(mc, BH, D) * 0.02 + 0.01, jnp.bfloat16)
    qq_fn = jax.jit(lambda q, pool, nc, wl: qa.fused_q_decode_attention(
        q, pool, ksc, vsc, k_win, v_win, nc, wl, codec, mc))

    codec44 = qf.QuantCodec(C, D, 4, 4)
    q44_pool = jnp.asarray(
        rs.randint(-2000, 2000, (mc, BH, codec44.stream_rows, 128)), jnp.int16)
    q44_fn = jax.jit(lambda q, pool, nc, wl: qa.fused_q_decode_attention(
        q, pool, ksc, vsc, k_win, v_win, nc, wl, codec44, mc))

    # bitmap-q8 capacity codec: int8 NZ payload + per-channel scales
    fmt8 = sf.ChunkFormat(C, D, 40, qbits=8)
    bq8_pool = jnp.asarray(
        rs.randint(-2000, 2000, (mc, BH, 2 * fmt8.stream_rows, 128)), jnp.int16)
    bq8_ksc = jnp.asarray(rs.rand(mc, BH, D) * 0.02 + 0.01, jnp.bfloat16)
    bq8_vsc = jnp.asarray(rs.rand(mc, BH, D) * 0.02 + 0.01, jnp.bfloat16)
    bq8_fn = jax.jit(lambda q, pool, nc, wl:
                     ska.fused_sparse_decode_attention_v7(
                         q, pool, k_win, v_win, nc, wl, fmt8, fmt8, mc,
                         hpb=16, kscales=bq8_ksc, vscales=bq8_vsc))

    kd = jnp.asarray(rs.randn(B, Hkv, S, D) * 0.1, jnp.bfloat16)
    vd = jnp.array(kd)

    @jax.jit
    def dense_fn(q, kd, vd):
        qg = q[:, 0].reshape(B, Hkv, G, D)
        s = jnp.einsum("bhgd,bhsd->bhgs", qg, kd,
                       preferred_element_type=jnp.float32) / np.sqrt(D)
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhgs,bhsd->bhgd", w.astype(jnp.bfloat16), vd,
                          preferred_element_type=jnp.float32)

    t_bm = device_time(bm_fn, (q, bm_pool, nc, wl), iters, f"bm{mc}")
    t_qq = device_time(qq_fn, (q, q_pool, nc, wl), iters, f"qq{mc}")
    t_44 = device_time(q44_fn, (q, q44_pool, nc, wl), iters, f"q44_{mc}")
    t_b8 = device_time(bq8_fn, (q, bq8_pool, nc, wl), iters, f"bq8_{mc}")
    t_d = device_time(dense_fn, (q, kd, vd), iters, f"d{mc}")

    bm_bytes = (BH * nact * 2 * fmt.stream_rows * 128 * 2
                + 2 * B * WIN_LEN * Hkv * D * 2)
    qq_bytes = (BH * nact * codec.stream_rows * 128 * 2
                + 2 * B * WIN_LEN * Hkv * D * 2)
    q44_bytes = (BH * nact * codec44.stream_rows * 128 * 2
                 + 2 * B * WIN_LEN * Hkv * D * 2)
    d_bytes = 2 * B * Hkv * S * D * 2
    bq8_bytes = (BH * nact * 2 * fmt8.stream_rows * 128 * 2
                 + 2 * B * WIN_LEN * Hkv * D * 2)
    row = {
        "ctx": S, "chunks": nact,
        "bitmap_us": round(t_bm * 1e6, 1),
        "bitmap_q8_us": round(t_b8 * 1e6, 1),
        "bitmap_q8_bytes_ratio": round(
            (2 * B * Hkv * S * D * 2) / bq8_bytes, 2),
        "q8q4_us": round(t_qq * 1e6, 1),
        "q4q4_us": round(t_44 * 1e6, 1),
        "dense_us": round(t_d * 1e6, 1),
        "bitmap_vs_dense": round(t_d / t_bm, 2),
        "q8q4_vs_dense": round(t_d / t_qq, 2),
        "q4q4_vs_dense": round(t_d / t_44, 2),
        "q8q4_gbps": round(qq_bytes / t_qq / 1e9, 1),
        "q4q4_gbps": round(q44_bytes / t_44 / 1e9, 1),
        "dense_gbps": round(d_bytes / t_d / 1e9, 1),
    }
    print(f"ctx {S:6d}: bitmap {row['bitmap_us']:8.1f} us | "
          f"q8q4 {row['q8q4_us']:8.1f} us ({row['q8q4_gbps']:5.1f} GB/s) | "
          f"q4q4 {row['q4q4_us']:8.1f} us ({row['q4q4_gbps']:5.1f} GB/s) | "
          f"dense {row['dense_us']:8.1f} us ({row['dense_gbps']:5.1f} GB/s) | "
          f"q8q4 {row['q8q4_vs_dense']:.2f}x, q4q4 {row['q4q4_vs_dense']:.2f}x, "
          f"bitmap {row['bitmap_vs_dense']:.2f}x vs dense", flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    rows = [run_depth(4, 3, args.iters),
            run_depth(12, 12, args.iters),
            run_depth(40, 39, args.iters)]
    print(json.dumps({"metric": "codec_shootout_device_us", "rows": rows}))


if __name__ == "__main__":
    main()
