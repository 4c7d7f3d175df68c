"""Weight-streaming microbench: W8 dot forms at the decode shape, DEVICE time.

Times x @ W at the Llama-3-8B w_down shape ([32, 14336] x [14336, 4096]):

  bf16   x_bf16 @ w_bf16                          (2x bytes, r1 baseline)
  w8     (x @ w_i8.astype(bf16)) * s              (production weight-only)
  w8a8   dot_general(x_i8, w_i8, s32) * sx * sw   (native MXU int8 dot with
         per-token dynamic activation quantization; models/quant.py w8a8_dot)

Methodology (round-5 CORRECTION): each variant runs in a 300-iteration
device-side fori_loop chain, measured by jax.profiler.trace + per-op device
sums (parse_trace).  The previous wall-clock-over-the-chain method carried
~300-400 us/call of harness overhead (wall 451 us vs device 80 us for the
SAME w8 program) and produced the false "W8 caps at ~370 GB/s" conclusion
that motivated a Pallas W8 kernel; on device time the XLA weight-only form
is already at the HBM roofline (80 us = 734 GB/s) and the kernel measured
6-15% slower, so it was removed.  See docs/PERFORMANCE.md "Round 5".

Run on the real chip: python benchmarks/bench_w8_matmul.py
"""

import collections
import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp

from mustafar_tpu.models import quant


def _device_us_per_call(trace_dir: str, iters: int) -> float:
    """Sum per-op device time inside the while chain (parse_trace logic),
    excluding the enclosing jit/while envelope events."""
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs = collections.defaultdict(float)
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e.get("pid"), "")):
            name = e.get("name", "")
            if not name.startswith("jit") and name != "while":
                durs[name] += e["dur"]
    return sum(durs.values()) / iters


def main(din=14336, dout=4096, B=32, iters=300):
    @jax.jit
    def make(kk):
        w = jax.random.normal(kk, (din, dout), jnp.float32) / 64.0
        wb = w.astype(jnp.bfloat16)
        q8, s8 = quant._quant_last(w)
        return wb, q8, s8

    wb, q8, s8 = jax.block_until_ready(make(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, din), jnp.bfloat16)

    def device_us(fn, tag):
        @jax.jit
        def run(x):
            def body(i, acc):
                y = fn(acc)
                return acc + y.sum(dtype=jnp.float32).astype(acc.dtype) * 1e-30
            return jax.lax.fori_loop(0, iters, body, x)
        run(x).block_until_ready()          # compile
        with jax.profiler.trace(f"/tmp/w8mb_{tag}"):
            run(x).block_until_ready()
        return _device_us_per_call(f"/tmp/w8mb_{tag}", iters)

    res = {
        "bf16_us": round(device_us(lambda h: h @ wb, "bf16"), 1),
        "w8_us": round(device_us(
            lambda h: (h @ q8.astype(h.dtype)) * s8.astype(h.dtype), "w8"), 1),
        "w8a8_us": round(device_us(
            lambda h: quant.w8a8_dot(h, q8, s8), "w8a8"), 1),
    }
    res["w8a8_vs_w8"] = round(res["w8_us"] / res["w8a8_us"], 2)
    gib = din * dout / 2**30
    res["w8_gbps"] = round(gib / (res["w8_us"] / 1e6), 1)
    res["w8a8_gbps"] = round(gib / (res["w8a8_us"] / 1e6), 1)

    # numeric sanity on the same weights
    y8 = (x @ q8.astype(x.dtype)) * s8.astype(x.dtype)
    ya = quant.w8a8_dot(x, q8, s8)
    rel = float(jnp.linalg.norm((ya - y8).astype(jnp.float32))
                / jnp.linalg.norm(y8.astype(jnp.float32)))
    res["w8a8_vs_w8_rel_err"] = round(rel, 4)
    print(json.dumps(res))


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
