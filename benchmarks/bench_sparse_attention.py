"""Single-chip sparse decode-attention microbenchmark (real TPU).

Compares the Pallas sparse kernels (two-kernel and fused flash-decoding) with
dense decode attention at the reference bench shape (mem_spd_test.py:
Llama-3-8B, batch 32, ~900-token context, K=V=0.7) and reports achieved HBM
bandwidth vs speed-of-light (v5e ~819 GB/s).

Run: python benchmarks/bench_sparse_attention.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops.kernels import sparse_attention as ska


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B, Hkv, G = 32, 8, 4          # llama-3-8b GQA
    D, C = 128, 256
    mc, nact = 4, 3               # ~900-token compressed context
    W, win_len = 288, 120
    fmt = sf.ChunkFormat(C, D, 40)  # 70% sparsity
    BH = B * Hkv
    rs = np.random.RandomState(0)

    dense = jnp.asarray(rs.randn(BH, mc, C, D), jnp.float32)

    @jax.jit
    def prep(x):
        segs, bmp = sf.prune_and_encode_chunk(x.astype(jnp.bfloat16), fmt)
        dec = sf.decode_chunk(segs, bmp, fmt)
        segs = [s.reshape(BH, mc * fmt.seg_rows(k), 128)
                for s, k in zip(segs, fmt.segs)]
        return segs, bmp.reshape(BH, mc * fmt.planes, D), dec

    k_segs, k_bmp, dec = prep(dense)
    pruned = np.asarray(dec, np.float32)
    v_segs = [jnp.array(s) for s in k_segs]
    v_bmp = jnp.array(k_bmp)
    k_win = jnp.asarray(rs.randn(B, W, Hkv, D), jnp.bfloat16)
    v_win = jnp.asarray(rs.randn(B, W, Hkv, D), jnp.bfloat16)
    q = jnp.asarray(rs.randn(B, 1, Hkv * G, D), jnp.bfloat16)
    nc = jnp.int32(nact)
    wl = jnp.int32(win_len)

    twokernel = jax.jit(lambda q, nc, wl: ska.sparse_decode_attention(
        q, k_segs, k_bmp, v_segs, v_bmp, k_win, v_win, nc, wl, fmt, fmt, mc))
    fused = jax.jit(lambda q, nc, wl: ska.fused_sparse_decode_attention(
        q, k_segs, k_bmp, v_segs, v_bmp, k_win, v_win, nc, wl, fmt, fmt, mc))

    # dense baseline: same token count, dense bf16 cache
    S = nact * C + win_len
    kd = jnp.asarray(rs.randn(B, Hkv, S, D), jnp.bfloat16)
    vd = jnp.asarray(rs.randn(B, Hkv, S, D), jnp.bfloat16)

    @jax.jit
    def dense_fn(q):
        qg = q[:, 0].reshape(B, Hkv, G, D)
        s = jnp.einsum("bhgd,bhsd->bhgs", qg, kd,
                       preferred_element_type=jnp.float32) / np.sqrt(D)
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhgs,bhsd->bhgd", w.astype(jnp.bfloat16), vd,
                          preferred_element_type=jnp.float32)

    # correctness: fused vs dense-equivalent reference
    out = np.asarray(fused(q, nc, wl), np.float32)
    pool = pruned.reshape(B, Hkv, mc, C, D)[:, :, :nact].reshape(B, Hkv, nact * C, D)
    kwf = np.asarray(k_win, np.float32).transpose(0, 2, 1, 3)[:, :, :win_len]
    vwf = np.asarray(v_win, np.float32).transpose(0, 2, 1, 3)[:, :, :win_len]
    kk = np.concatenate([pool, kwf], axis=2)
    vv = np.concatenate([pool, vwf], axis=2)
    qf = np.asarray(q, np.float32)[:, 0].reshape(B, Hkv, G, D)
    lg = np.einsum("bhgd,bhsd->bhgs", qf, kk) / np.sqrt(D)
    wts = np.asarray(jax.nn.softmax(jnp.asarray(lg), -1))
    want = np.einsum("bhgs,bhsd->bhgd", wts, vv).reshape(B, 1, Hkv * G, D)
    err = np.abs(out - want).max() / (np.abs(want).max() + 1e-9)
    print(f"fused rel err vs dense-equivalent: {err:.4f}")

    t_two = timeit(twokernel, q, nc, wl)
    t_fused = timeit(fused, q, nc, wl)
    t_dense = timeit(dense_fn, q)

    k_bytes = (sum(int(np.prod(s.shape[1:])) for s in k_segs) * 2
               + int(np.prod(k_bmp.shape[1:])) * 4) * BH * nact // mc
    sparse_bytes = 2 * k_bytes + 2 * B * win_len * Hkv * D * 2
    dense_bytes = 2 * B * Hkv * S * D * 2
    for name, t in [("two-kernel", t_two), ("fused", t_fused)]:
        print(f"{name:10s}: {t*1e6:8.1f} us  ({sparse_bytes/t/1e9:7.1f} GB/s eff, "
              f"{t_dense/t:.2f}x vs dense)")
    print(f"dense     : {t_dense*1e6:8.1f} us  ({dense_bytes/t_dense/1e9:7.1f} GB/s)")
    print(f"bytes ratio: {dense_bytes/sparse_bytes:.2f}x")


if __name__ == "__main__":
    main()
