"""Weight-streaming microbench: W8 dequant-dot forms at the decode shape.

Times x @ W at the Llama-3-8B w_down shape ([32, 14336] x [14336, 4096]):

  bf16   x_bf16 @ w_bf16                          (2x bytes, r1 baseline)
  w8     (x @ w_i8.astype(bf16)) * s              (production weight-only)
  w8a8   dot_general(x_i8, w_i8, s32) * sx * sw   (native MXU int8 path —
         no VPU widen of the weight stream; per-token dynamic activation
         quantization inside the timed region; models/quant.py w8a8_dot)

Methodology: the round-2/3 device-side fori_loop dependency chain from
bench_w4_matmul.py, VERBATIM — the chain feeds sum(y)*1e-30 back into the
next input, n=300, wall-clock over the whole chain.  It reproduced
consistent byte-ordered numbers across rounds (bf16 238-278 us, W8
158-167) where both alternatives failed on this backend: jax.profiler
"jit" event sums report physically impossible times for single dots
(36.6 us bf16 = 3.2 TB/s weight stream, 10x HBM), and a max-consumer
chain variant got algebraically factored to 0.3 us/dot.

Run on the real chip: python benchmarks/bench_w8_matmul.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from mustafar_tpu.models import quant


def main(din=14336, dout=4096, B=32, iters=300):
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make(kk):
        w = jax.random.normal(kk, (din, dout), jnp.float32) / 64.0
        wb = w.astype(jnp.bfloat16)
        q8, s8 = quant._quant_last(w)
        return wb, q8, s8

    wb, q8, s8 = jax.block_until_ready(make(key))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, din), jnp.bfloat16)

    def chain(fn, n=iters):
        @jax.jit
        def run(x):
            def body(i, acc):
                y = fn(acc)
                return acc + y.sum(dtype=jnp.float32).astype(acc.dtype) * 1e-30
            return jax.lax.fori_loop(0, n, body, x)
        run(x).block_until_ready()          # compile
        t0 = time.perf_counter()
        run(x).block_until_ready()
        return (time.perf_counter() - t0) / n * 1e6   # us/call

    from mustafar_tpu.ops.kernels.w8_matmul import w8_matmul

    def w8a8_kernel(h):
        xq, sx = quant.act_quant(h)
        return (w8_matmul(xq, q8, s8) * sx).astype(h.dtype)

    res = {
        "bf16_us": round(chain(lambda h: h @ wb), 1),
        "w8_us": round(chain(
            lambda h: (h @ q8.astype(h.dtype)) * s8.astype(h.dtype)), 1),
        "w8a8_us": round(chain(lambda h: quant.w8a8_dot(h, q8, s8)), 1),
        "w8_kernel_us": round(chain(
            lambda h: w8_matmul(h, q8, s8).astype(h.dtype)), 1),
        "w8a8_kernel_us": round(chain(w8a8_kernel), 1),
    }
    res["kernel_vs_w8"] = round(res["w8_us"] / res["w8a8_kernel_us"], 2)
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
