"""Single-chip sparse decode-attention microbenchmark (real TPU).

Times the production fused kernel (v7) against dense XLA decode attention
at the reference bench shape (mem_spd_test.py: Llama-3-8B geometry, batch 32,
K=V=0.7) for a short (~900 tokens) and a long (~3k tokens) context, and
reports effective HBM bandwidth vs speed-of-light (v5e ~819 GB/s).

Run: python benchmarks/bench_sparse_attention.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops.kernels import sparse_attention as ska


def timeit(fn, *args, iters=50, rounds=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def run_config(name, mc, nact, win_len, check=False):
    B, Hkv, G = 32, 8, 4
    D, C = 128, 256
    W = 288
    fmt = sf.ChunkFormat(C, D, 40)
    BH = B * Hkv
    rs = np.random.RandomState(0)

    if check:
        dense = jnp.asarray(rs.randn(BH, mc, C, D), jnp.float32)

        @jax.jit
        def prep(x):
            xb = x.astype(jnp.bfloat16)
            mask = sf.topk_mask(xb, fmt.keep)
            pruned = jnp.where(mask, xb, 0).astype(jnp.bfloat16)
            rows = sf.encode_stream(pruned, fmt)
            return rows, sf.decode_stream(rows, fmt)

        rows, dec = prep(dense)
        pool = jnp.swapaxes(jnp.concatenate([rows, rows], axis=-2), 0, 1)
        pruned_np = np.asarray(dec, np.float32)
    else:
        pool = jax.lax.bitcast_convert_type(
            jnp.asarray(rs.randn(mc, BH, 2 * fmt.stream_rows, 128) * 0.1,
                        jnp.bfloat16), jnp.int16)
        pruned_np = None
    k_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    v_win = jnp.asarray(rs.randn(B, Hkv, W, D) * 0.1, jnp.bfloat16)
    q = jnp.asarray(rs.randn(B, 1, Hkv * G, D) * 0.1, jnp.bfloat16)
    nc, wl = jnp.int32(nact), jnp.int32(win_len)

    sparse_fn = jax.jit(lambda q, nc, wl: ska.fused_sparse_decode_attention_v7(
        q, pool, k_win, v_win, nc, wl, fmt, fmt, mc, hpb=16))

    S = nact * C + win_len
    kd = jnp.asarray(rs.randn(B, Hkv, S, D) * 0.1, jnp.bfloat16)
    vd = jnp.array(kd)

    @jax.jit
    def dense_fn(q):
        qg = q[:, 0].reshape(B, Hkv, G, D)
        s = jnp.einsum("bhgd,bhsd->bhgs", qg, kd,
                       preferred_element_type=jnp.float32) / np.sqrt(D)
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhgs,bhsd->bhgd", w.astype(jnp.bfloat16), vd,
                          preferred_element_type=jnp.float32)

    if check and pruned_np is not None:
        out = np.asarray(sparse_fn(q, nc, wl), np.float32)
        pool_d = pruned_np.reshape(B, Hkv, mc, C, D)[:, :, :nact].reshape(B, Hkv, nact * C, D)
        kwf = np.asarray(k_win, np.float32)[:, :, :win_len]
        vwf = np.asarray(v_win, np.float32)[:, :, :win_len]
        kk = np.concatenate([pool_d, kwf], axis=2)
        vv = np.concatenate([pool_d, vwf], axis=2)
        qf = np.asarray(q, np.float32)[:, 0].reshape(B, Hkv, G, D)
        lg = np.einsum("bhgd,bhsd->bhgs", qf, kk) / np.sqrt(D)
        wts = np.asarray(jax.nn.softmax(jnp.asarray(lg), -1))
        want = np.einsum("bhgs,bhsd->bhgd", wts, vv).reshape(B, 1, Hkv * G, D)
        err = np.abs(out - want).max() / (np.abs(want).max() + 1e-9)
        print(f"[{name}] correctness vs dense-equivalent: rel err {err:.4f}")  # noqa

    t_sparse = timeit(sparse_fn, q, nc, wl)
    t_dense = timeit(dense_fn, q)
    sparse_bytes = (BH * nact * 2 * fmt.stream_rows * 128 * 2
                    + 2 * B * win_len * Hkv * D * 2)
    dense_bytes = 2 * B * Hkv * S * D * 2
    print(f"[{name}] sparse(v7): {t_sparse*1e6:8.1f} us ({sparse_bytes/t_sparse/1e9:6.1f} GB/s eff) | "
          f"dense-XLA: {t_dense*1e6:8.1f} us ({dense_bytes/t_dense/1e9:6.1f} GB/s) | "
          f"ratio {t_dense/t_sparse:.2f}x, bytes ratio {dense_bytes/sparse_bytes:.2f}x")


def main():
    run_config("short ctx ~900", mc=4, nact=3, win_len=120, check=True)
    run_config("long ctx ~3.2k", mc=12, nact=12, win_len=120)


if __name__ == "__main__":
    main()
