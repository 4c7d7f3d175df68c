"""Device-time microbench: is int4 weight streaming real on this TPU?

Times x @ W for W in {bf16, int8+scale, int4 blocked-scale} at the Llama-3-8B
w_down shape (14336 x 4096) over a device-side dependency chain, reporting
per-call device time.  If XLA packs s4 two-per-byte in HBM, the int4 dot
should stream ~2x faster than int8 at decode batch sizes (weight-bound).

Run on the real chip: python benchmarks/bench_w4_matmul.py
"""

import json
import time

import jax
import jax.numpy as jnp

from mustafar_tpu.models import quant


def main():
    B, DIN, DOUT = 32, 14336, 4096
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (DIN, DOUT), jnp.float32) / 64.0
    wb = w.astype(jnp.bfloat16)
    q8, s8 = quant._quant_last(w)
    q4, s4 = quant._quant_block4(w, 128)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, DIN), jnp.bfloat16)

    def chain(fn, n=30):
        @jax.jit
        def run(x):
            def body(i, acc):
                y = fn(acc)
                # feed a scalar of the output back so iterations depend
                return acc * 0 + acc + y[0, 0] * 1e-30
            return jax.lax.fori_loop(0, n, body, x)
        run(x).block_until_ready()          # compile
        t0 = time.perf_counter()
        run(x).block_until_ready()
        return (time.perf_counter() - t0) / n * 1e6   # us/call

    res = {
        "bf16_us": round(chain(lambda h: h @ wb), 1),
        "w8_us": round(chain(
            lambda h: (h @ q8.astype(h.dtype)) * s8.astype(h.dtype)), 1),
        "w4_us": round(chain(
            lambda h: quant._blocked_dot(h, q4, s4)), 1),
    }
    res["w4_vs_w8"] = round(res["w8_us"] / res["w4_us"], 2)
    res["w8_vs_bf16"] = round(res["bf16_us"] / res["w8_us"], 2)
    gib = DIN * DOUT / 2**30
    res["w4_gbps"] = round(gib / 2 / (res["w4_us"] / 1e6), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
