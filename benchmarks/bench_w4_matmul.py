"""Device-time microbench for the W4 Pallas matmul (decode projections).

Times x @ W at the Llama-3-8B w_down shape ([32, 14336] x [14336, 4096])
for bf16, int8 per-channel (XLA fused convert — the W8 serving path), the
XLA-level W4 carrier unpack (the negative result that motivated the
kernel), and the Pallas W4 kernel, over a device-side fori_loop dependency
chain that consumes the full output (XLA DCEs a partially-consumed dot).

Round-2 measurements on v5e-lite (n=300):
    bf16 277.9 us | W8 166.9 | W4-unpack-in-XLA 335.8 (!) | W4 kernel: run me

Run on the real chip: python benchmarks/bench_w4_matmul.py
"""

import json
import time

import jax
import jax.numpy as jnp

from mustafar_tpu.models import quant
from mustafar_tpu.ops.kernels.w4_matmul import w4_matmul


def main():
    B, DIN, DOUT = 32, 14336, 4096
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make(kk):
        w = jax.random.normal(kk, (DIN, DOUT), jnp.float32) / 64.0
        wb = w.astype(jnp.bfloat16)
        q8, s8 = quant._quant_last(w)
        c4, s4 = quant._quant_pack_w4(w)
        return wb, q8, s8, c4, s4

    wb, q8, s8, c4, s4 = jax.block_until_ready(make(key))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, DIN), jnp.bfloat16)

    def chain(fn, n=300):
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

    def w4_xla(h):
        wf = (quant.unpack_w4(c4).astype(h.dtype).reshape(DIN // 128, 128, DOUT)
              * s4.astype(h.dtype)[:, None, :]).reshape(DIN, DOUT)
        return h @ wf

    res = {
        "bf16_us": round(chain(lambda h: h @ wb), 1),
        "w8_us": round(chain(
            lambda h: (h @ q8.astype(h.dtype)) * s8.astype(h.dtype)), 1),
        "w4_xla_us": round(chain(w4_xla), 1),
        "w4_kernel_us": round(chain(lambda h: w4_matmul(h, c4, s4)), 1),
    }
    res["w4_vs_w8"] = round(res["w8_us"] / res["w4_kernel_us"], 2)
    gib = DIN * DOUT / 2 / 2**30
    res["w4_kernel_gbps"] = round(gib / (res["w4_kernel_us"] / 1e6), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
