"""Weight-streaming microbench: W8 dequant-dot forms at the decode shape.

The round-3 microbench (docs/PERFORMANCE.md) measured the weight-only-int8
form ``(x @ w.astype(bf16)) * s`` at 158-167 us for [32,14336]x[14336,4096]
— only ~370 GB/s of weight stream against the 712-745 GB/s the chip
delivers on dense attention.  Since a full-8B decode step is ~97% weight
traffic, that efficiency IS the headline throughput.  Candidates:

  bf16      x_bf16 @ w_bf16                      (2x bytes, the r1 baseline)
  w8        (x @ w_i8.astype(bf16)) * s          (production weight-only)
  w8a8      dot_general(x_i8, w_i8, s32) * sx*sw (native MXU int8 path -
            no VPU widen of the weight stream at all; activations quantized
            per-row on the fly; models/quant.py w8a8_dot)
  w8a8_pre  same but activation quantization outside the timed region
            (isolates the dot cost)

Timing is DEVICE time from jax.profiler traces (parse_trace.py discipline):
wall-clock chains through the dispatch tunnel are untrustworthy in both
directions, and fori_loop chains with affine feedback get algebraically
gutted by XLA ((x0 + c) @ W factors; a 160 us dot "measured" 0.3 us).

    python benchmarks/bench_w8_matmul.py [din] [dout] [batch] [iters]
"""

import glob
import gzip
import json
import shutil
import sys

import jax
import jax.numpy as jnp
import numpy as np


def device_time(fn, args, iters, tag):
    """Total device seconds per call from a jax.profiler trace."""
    out = fn(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/w8mm_trace/{tag}"
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


def main(din=14336, dout=4096, B=32, iters=50):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, din), jnp.bfloat16)
    wf = rng.randn(din, dout).astype(np.float32) / np.sqrt(din)
    w_bf16 = jnp.asarray(wf, jnp.bfloat16)
    s = np.abs(wf).max(axis=0) / 127.0
    w_i8 = jnp.asarray(np.clip(np.round(wf / s), -127, 127), jnp.int8)
    s_bf16 = jnp.asarray(s, jnp.bfloat16)

    @jax.jit
    def f_bf16(x, w):
        return x @ w

    @jax.jit
    def f_w8(x, w, s):
        return (x @ w.astype(x.dtype)) * s

    def _act_quant(x):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        sx = ax / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127,
                      127).astype(jnp.int8)
        return xq, sx

    @jax.jit
    def f_w8a8(x, w, s):
        xq, sx = _act_quant(x)
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * s.astype(jnp.float32)
                ).astype(x.dtype)

    xq0, sx0 = _act_quant(x)
    xq0, sx0 = jax.block_until_ready((xq0, sx0))

    @jax.jit
    def f_w8a8_pre(xq, w, s, sx):
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * s.astype(jnp.float32)
                ).astype(jnp.bfloat16)

    wb = {"bf16": w_bf16.nbytes, "w8": w_i8.nbytes, "w8a8": w_i8.nbytes,
          "w8a8_pre": w_i8.nbytes}
    results = {}
    for name, fn, args in [
        ("bf16", f_bf16, (x, w_bf16)),
        ("w8", f_w8, (x, w_i8, s_bf16)),
        ("w8a8", f_w8a8, (x, w_i8, s_bf16)),
        ("w8a8_pre", f_w8a8_pre, (xq0, w_i8, s_bf16, sx0)),
    ]:
        try:
            sec = device_time(fn, args, iters, name)
            results[name] = sec * 1e6
            print(f"{name:10s} {sec * 1e6:8.1f} us/dot   "
                  f"{wb[name] / sec / 1e9:6.0f} GB/s weight stream",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}", flush=True)

    # numeric sanity: w8a8 vs w8 reference on the same weights
    y8 = f_w8(x, w_i8, s_bf16)
    ya = f_w8a8(x, w_i8, s_bf16)
    rel = float(jnp.linalg.norm((ya - y8).astype(jnp.float32))
                / jnp.linalg.norm(y8.astype(jnp.float32)))
    print(f"w8a8 vs w8 rel error: {rel:.4f}")
    return results


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
