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
            per-row on the fly)
  w8a8_pre  same but activation quantization outside the timed region
            (isolates the dot cost)

Chained through jnp.max-consumers per the round-2 timing discipline
(CLAUDE.md): n=300 dependent iterations, device-time via wall-clock over
the chained jit (tunnel-safe for >=100-iteration chains).

    python benchmarks/bench_w8_matmul.py [din] [dout] [batch] [iters]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _chain(fn, n):
    """y_{i+1} = fn(perturb(y_i)) so XLA cannot elide or overlap steps."""
    @jax.jit
    def run(x0, *args):
        def body(i, x):
            y = fn(x, *args)
            # fold the output back into a fresh [B, din]-shaped input
            return (x0 + jnp.max(y) * 1e-9).astype(x0.dtype)
        return jax.lax.fori_loop(0, n, body, x0)
    return run


def main(din=14336, dout=4096, B=32, iters=300):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, din), jnp.bfloat16)
    wf = rng.randn(din, dout).astype(np.float32) / np.sqrt(din)
    w_bf16 = jnp.asarray(wf, jnp.bfloat16)
    s = np.abs(wf).max(axis=0) / 127.0
    w_i8 = jnp.asarray(np.clip(np.round(wf / s), -127, 127), jnp.int8)
    s_bf16 = jnp.asarray(s, jnp.bfloat16)

    gib = {"bf16": w_bf16.nbytes, "w8": w_i8.nbytes, "w8a8": w_i8.nbytes,
           "w8a8_pre": w_i8.nbytes}

    def f_bf16(x, w):
        return x @ w

    def f_w8(x, w, s):
        return (x @ w.astype(x.dtype)) * s

    def _act_quant(x):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        sx = ax / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127,
                      127).astype(jnp.int8)
        return xq, sx

    def f_w8a8(x, w, s):
        xq, sx = _act_quant(x)
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * s.astype(jnp.float32)
                ).astype(x.dtype)

    xq0, sx0 = _act_quant(x)

    def f_w8a8_pre(xq, w, s, sx):
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * s.astype(jnp.float32)
                ).astype(jnp.bfloat16)

    results = {}
    for name, fn, args in [
        ("bf16", f_bf16, (w_bf16,)),
        ("w8", f_w8, (w_i8, s_bf16)),
        ("w8a8", f_w8a8, (w_i8, s_bf16)),
    ]:
        run = _chain(fn, iters)
        try:
            jax.block_until_ready(run(x, *args))  # compile + warm
            t0 = time.perf_counter()
            jax.block_until_ready(run(x, *args))
            us = (time.perf_counter() - t0) / iters * 1e6
            results[name] = us
            print(f"{name:10s} {us:8.1f} us/dot   "
                  f"{gib[name] / us * 1e6 / 2**30:6.0f} GiB/s weight stream",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}", flush=True)

    # pre-quantized-activation variant: chain over int8 carriers
    @jax.jit
    def run_pre(xq, w, s, sx):
        def body(i, xq):
            y = f_w8a8_pre(xq, w, s, sx)
            return (xq + (jnp.max(y) * 0).astype(jnp.int8)).astype(jnp.int8)
        return jax.lax.fori_loop(0, iters, body, xq)

    try:
        jax.block_until_ready(run_pre(xq0, w_i8, s_bf16, sx0))
        t0 = time.perf_counter()
        jax.block_until_ready(run_pre(xq0, w_i8, s_bf16, sx0))
        us = (time.perf_counter() - t0) / iters * 1e6
        results["w8a8_pre"] = us
        print(f"{'w8a8_pre':10s} {us:8.1f} us/dot   "
              f"{gib['w8a8_pre'] / us * 1e6 / 2**30:6.0f} GiB/s weight stream",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"w8a8_pre   FAILED: {type(e).__name__}: {e}", flush=True)

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
