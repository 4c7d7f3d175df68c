"""Archived Pallas sparse decode-attention kernel generations (v1-v6).

Development history of the production kernels in sparse_attention.py
(v6ps / v7 / segment): each generation here ran on hardware and motivated
the next (measurements in docs/PERFORMANCE.md).  They are kept for the
microbenches and equivalence tests that document the design space — the
production decode path never imports this module.

  v1  two-kernel pair (scores, combine) mirroring the reference CUDA SpMV
      formulations (kernel/csrc/SpMM_Kernel.cuh:156-419,421-676)
  v2  fused single kernel: expansion + online softmax + combine per chunk
  v3  manual double-buffered DMA over split pools (make_async_copy)
  v4  fused-stream layout: one DMA per (chunk, head) over int16 rows
  v5  head-batched compute: one expansion / matmul set per hpb heads
  v6  pools-only kernel returning flash partials; window merged in XLA
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mustafar_tpu.ops.sparse_format import ChunkFormat
from mustafar_tpu.ops.kernels.sparse_attention import (
    _expand_stream_rows, _expand_stream_rows_batched, _interpret)

def _expand_chunk(seg_refs, bmp, fmt: ChunkFormat, out_dtype=jnp.bfloat16):
    """Expand one compressed chunk to dense [C, D] inside a kernel.

    seg_refs: loaded segment blocks, list of [R_i, 128] arrays.
    bmp: [P, D] uint32 word planes.

    Stage-count-minimized (each materialized [C,D] op costs ~VMEM-bandwidth):
    bit test via AND with a compile-time mask array (no variable shifts),
    inclusive rank from one MXU triangular matmul, per-segment gather with
    *no* clips — TPU dynamic-gather wraps indices mod 128 (measured), and any
    wrapped garbage is zeroed by the final bits multiply.
    """
    C, D, P = fmt.chunk, fmt.dim, fmt.planes
    words = jnp.concatenate([bmp] * (C // P), axis=0)              # [C, D]
    bitsel = (jnp.uint32(1) << (jax.lax.broadcasted_iota(jnp.uint32, (C, D), 0)
                                // jnp.uint32(P)))                 # const
    bits = ((words & bitsel) > 0).astype(jnp.bfloat16)             # [C, D]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (D, D), 0) <=
           jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)).astype(jnp.bfloat16)
    # inclusive prefix-sum along lanes on the MXU (cumsum is not lowerable);
    # exact in bf16 -> f32 for counts <= 256.  rank is 1-based at set bits.
    rank = jax.lax.dot_general(bits, tri, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    rank_i = rank.astype(jnp.int32)
    gs, bounds = [], []
    base = 1                                                       # 1-based
    for seg, k in zip(seg_refs, fmt.segs):
        R = fmt.seg_rows(k)
        rpt = C // R
        tbl = jnp.concatenate([seg.astype(jnp.float32)] * rpt, axis=0)  # [C,128]
        toff = jax.lax.broadcasted_iota(jnp.int32, (C, D), 0) // R
        idx = rank_i + (toff * k - base)                           # const folds
        gs.append(jnp.take_along_axis(tbl, idx, axis=-1))
        bounds.append(base + k)
        base += k
    if len(gs) == 1:
        dense = gs[0]
    else:
        dense = jnp.where(rank_i < bounds[0], gs[0], gs[1])
    return (dense.astype(out_dtype) * bits.astype(out_dtype))



# ---------------------------------------------------------------------------
# Kernel 1: sparse key scores — scores[g, t] = q[g, :] . K_dense[t, :]
# (reference Key_Kernel: C[seq_c x 8] = K_sparse[seq_c x d] x q_pad[d x 8])
# ---------------------------------------------------------------------------

def _key_scores_kernel(nc_ref, *refs, fmt: ChunkFormat, nseg: int):
    (*seg_refs, bmp_ref, q_ref, out_ref) = refs
    i = pl.program_id(1)

    @pl.when(i < nc_ref[0])
    def _():
        dense = _expand_chunk([r[0] for r in seg_refs], bmp_ref[0], fmt)
        q = q_ref[0]                                              # [G8, D] bf16
        out_ref[0] = jax.lax.dot_general(
            q, dense, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [G8, C]

    @pl.when(i >= nc_ref[0])
    def _():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)


def sparse_key_scores(q: jnp.ndarray, k_segs: list[jnp.ndarray], k_bmp: jnp.ndarray,
                      n_chunks: jnp.ndarray, fmt: ChunkFormat, max_chunks: int):
    """q [BH, G8, D] bf16; k_segs[i] [BH, max_chunks*R_i, 128]; k_bmp
    [BH, max_chunks*P, D] uint32 -> scores [BH, G8, max_chunks*C] fp32.

    Chunks >= n_chunks yield zeros (caller masks before softmax).
    """
    BH, G8, D = q.shape
    C = fmt.chunk
    nseg = len(fmt.segs)
    grid = (BH, max_chunks)

    in_specs = []
    for k in fmt.segs:
        R = fmt.seg_rows(k)
        in_specs.append(pl.BlockSpec((1, R, 128), lambda h, i, *_, R=R: (h, i, 0),
                                     memory_space=pltpu.VMEM))
    P = fmt.planes
    in_specs.append(pl.BlockSpec((1, P, D), lambda h, i, *_: (h, i, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, G8, D), lambda h, i, *_: (h, 0, 0),
                                 memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G8, C), lambda h, i, *_: (h, 0, i),
                               memory_space=pltpu.VMEM),
    )
    segs3 = [s.reshape(BH, max_chunks * fmt.seg_rows(k), 128)
             for s, k in zip(k_segs, fmt.segs)]
    return pl.pallas_call(
        functools.partial(_key_scores_kernel, fmt=fmt, nseg=nseg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, G8, max_chunks * C), jnp.float32),
        interpret=_interpret(),
    )(n_chunks.reshape(1), *segs3, k_bmp.reshape(BH, max_chunks * P, D), q)


# ---------------------------------------------------------------------------
# Kernel 2: sparse value combine — out[g, :] += w[g, chunk] . V_dense[chunk, :]
# (reference Value_Kernel: out[d x 8] = V^T_sparse[d x seq_c] x p_pad[seq_c x 8])
# ---------------------------------------------------------------------------

def _value_combine_kernel(nc_ref, *refs, fmt: ChunkFormat):
    (*seg_refs, bmp_ref, w_ref, out_ref) = refs
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    @pl.when(i < nc_ref[0])
    def _():
        dense = _expand_chunk([r[0] for r in seg_refs], bmp_ref[0], fmt)
        w = w_ref[0]                                              # [G8, C] bf16
        out_ref[0] += jnp.dot(w, dense, preferred_element_type=jnp.float32)


def sparse_value_combine(w: jnp.ndarray, v_segs: list[jnp.ndarray], v_bmp: jnp.ndarray,
                         n_chunks: jnp.ndarray, fmt: ChunkFormat, max_chunks: int):
    """w [BH, G8, max_chunks*C] bf16 softmax weights (zeros beyond n_chunks)
    -> out [BH, G8, D] fp32."""
    BH, G8, _ = w.shape
    C, D, P = fmt.chunk, fmt.dim, fmt.planes
    grid = (BH, max_chunks)

    in_specs = []
    for k in fmt.segs:
        R = fmt.seg_rows(k)
        in_specs.append(pl.BlockSpec((1, R, 128), lambda h, i, *_, R=R: (h, i, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, P, D), lambda h, i, *_: (h, i, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, G8, C), lambda h, i, *_: (h, 0, i),
                                 memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G8, D), lambda h, i, *_: (h, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    segs3 = [s.reshape(BH, max_chunks * fmt.seg_rows(k), 128)
             for s, k in zip(v_segs, fmt.segs)]
    return pl.pallas_call(
        functools.partial(_value_combine_kernel, fmt=fmt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, G8, D), jnp.float32),
        interpret=_interpret(),
    )(n_chunks.reshape(1), *segs3, v_bmp.reshape(BH, max_chunks * P, D), w)


# ---------------------------------------------------------------------------
# Full decode attention: sparse pools + dense window + fp32 softmax.
# ---------------------------------------------------------------------------

def sparse_decode_attention(q, k_segs, k_bmp, v_segs, v_bmp, k_win, v_win,
                            n_chunks, win_len, kfmt: ChunkFormat,
                            vfmt: ChunkFormat, max_chunks: int):
    """Decode-step attention over (compressed pools ++ dense window).

    q: [B, 1, Hq, D]; k_segs/v_segs: lists of [BH, mc*R_i, 128];
    k_bmp/v_bmp: [BH, mc*P*D] (flat) or [BH, mc*P, D]; k_win/v_win:
    [B, W, Hkv, D]; n_chunks, win_len: int32 scalars.
    Returns [B, 1, Hq, D] in q.dtype.

    Equivalent to the reference decode path llama_mustafar_kernel.py:256-321
    (key SpMV ++ window matmul -> fp32 softmax -> value SpMV + window matmul).
    """
    B, _, Hq, D = q.shape
    W = k_win.shape[1]
    Hkv = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    BH = B * Hkv
    C = kfmt.chunk
    S = max_chunks * C

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg.reshape(BH, G, D), ((0, 0), (0, G8 - G), (0, 0)))
    qb = qpad.astype(jnp.bfloat16)

    k_bmp = k_bmp.reshape(BH, max_chunks * kfmt.planes, D)
    v_bmp = v_bmp.reshape(BH, max_chunks * vfmt.planes, D)

    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    s_comp = sparse_key_scores(qb, k_segs, k_bmp, n_chunks, kfmt, max_chunks)
    s_comp = s_comp * scale                                        # [BH, G8, S]
    s_comp = jnp.where((jnp.arange(S) < n_chunks * C)[None, None, :], s_comp, -jnp.inf)

    kw = jnp.transpose(k_win, (0, 2, 1, 3)).reshape(BH, W, D)
    s_win = jax.lax.dot_general(qpad.astype(jnp.float32), kw.astype(jnp.float32),
                                (((2,), (2,)), ((0,), (0,)))) * scale
    s_win = jnp.where((jnp.arange(W) < win_len)[None, None, :], s_win, -jnp.inf)

    logits = jnp.concatenate([s_comp, s_win], axis=-1)             # [BH, G8, S+W]
    w = jax.nn.softmax(logits, axis=-1)
    w_comp = jnp.where(jnp.isfinite(w[..., :S]), w[..., :S], 0.0)
    w_win = w[..., S:]

    o_comp = sparse_value_combine(w_comp.astype(jnp.bfloat16), v_segs, v_bmp,
                                  n_chunks, vfmt, max_chunks)      # [BH, G8, D]
    vw = jnp.transpose(v_win, (0, 2, 1, 3)).reshape(BH, W, D)
    o_win = jax.lax.dot_general(w_win.astype(vw.dtype), vw,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
    out = (o_comp + o_win)[:, :G, :]                               # [BH, G, D]
    return out.reshape(B, 1, Hq, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Fused decode kernel: sparse scores + online softmax + sparse combine +
# dense window, one pass (flash-decoding over compressed chunks).
# This is the production path; the two-kernel pair above mirrors the
# reference's structure and anchors correctness tests.
# ---------------------------------------------------------------------------

def _fused_decode_kernel(scalars_ref, *refs, kfmt: ChunkFormat, vfmt: ChunkFormat,
                         hpb: int, max_chunks: int, scale: float):
    nk = len(kfmt.segs)
    nv = len(vfmt.segs)
    (ks_refs, rest) = (refs[:nk], refs[nk:])
    (kb_ref, rest) = (rest[0], rest[1:])
    (vs_refs, rest) = (rest[:nv], rest[nv:])
    (vb_ref, qw_ref, kw_ref, vw_ref, out_ref, m_ref, l_ref, acc_ref) = rest

    i = pl.program_id(1)
    nc = scalars_ref[0]
    win_len = scalars_ref[1]
    HPB = hpb
    G8 = qw_ref.shape[1]
    D = kfmt.dim
    C = kfmt.chunk

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    def online_update(h, s, vmat):
        """s [G8, T] f32 scores; vmat [T, D] bf16 values for head h."""
        m_old = m_ref[h]                                    # [G8, 128] replicated
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new[:, :1])                       # [G8, T]
        corr = jnp.exp(m_old - m_new)                       # [G8, 128]
        l_ref[h] = l_ref[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[h] = acc_ref[h] * corr[:, :D] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[h] = m_new

    @pl.when(i < nc)
    def _():
        for h in range(HPB):
            kd = _expand_chunk([r[h] for r in ks_refs], kb_ref[h], kfmt)
            vd = _expand_chunk([r[h] for r in vs_refs], vb_ref[h], vfmt)
            s = jax.lax.dot_general(qw_ref[h], kd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            online_update(h, s, vd)

    @pl.when(i == max_chunks)
    def _():
        W = kw_ref.shape[1]
        wmask = (jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) < win_len)
        for h in range(HPB):
            s = jax.lax.dot_general(qw_ref[h], kw_ref[h], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(wmask, s, -1e30)
            online_update(h, s, vw_ref[h])
        out_ref[:] = acc_ref[:] / l_ref[:, :, :1]


def fused_sparse_decode_attention(q, k_segs, k_bmp, v_segs, v_bmp, k_win, v_win,
                                  n_chunks, win_len, kfmt: ChunkFormat,
                                  vfmt: ChunkFormat, max_chunks: int,
                                  hpb: int = 8):
    """Fully fused decode attention over (compressed pools ++ dense window).

    Same contract as sparse_decode_attention, one kernel: expansion + scores +
    online softmax + value combine never round-trip HBM (the reference's
    materialized [B,H,1,T] fp32 softmax, llama_mustafar_kernel.py:304, and
    its two CUDA launches per layer collapse into one pass).
    """
    B, _, Hq, D = q.shape
    W = k_win.shape[1]
    Hkv = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    BH = B * Hkv
    C = kfmt.chunk
    hpb = min(hpb, BH)
    while BH % hpb:
        hpb //= 2
    NB = BH // hpb

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg.reshape(BH, G, D), ((0, 0), (0, G8 - G), (0, 0)))
    qb = qpad.astype(jnp.bfloat16)
    kw = jnp.transpose(k_win, (0, 2, 1, 3)).reshape(BH, W, D).astype(jnp.bfloat16)
    vw = jnp.transpose(v_win, (0, 2, 1, 3)).reshape(BH, W, D).astype(jnp.bfloat16)
    k_bmp = k_bmp.reshape(BH, max_chunks * kfmt.planes, D)
    v_bmp = v_bmp.reshape(BH, max_chunks * vfmt.planes, D)

    grid = (NB, max_chunks + 1)
    scalars = jnp.stack([n_chunks.astype(jnp.int32), win_len.astype(jnp.int32)])

    def chunk_spec(R):
        # inactive steps clamp to the last active chunk: same block index as
        # the previous step -> the pipeline skips the refetch.
        def index_map(b, i, sref):
            ic = jnp.where(i < sref[0], i, jnp.maximum(sref[0] - 1, 0))
            return (b, ic, 0)
        return pl.BlockSpec((hpb, R, 128), index_map, memory_space=pltpu.VMEM)

    def bmp_spec(P):
        def index_map(b, i, sref):
            ic = jnp.where(i < sref[0], i, jnp.maximum(sref[0] - 1, 0))
            return (b, ic, 0)
        return pl.BlockSpec((hpb, P, D), index_map, memory_space=pltpu.VMEM)

    fixed = lambda shape: pl.BlockSpec(shape, lambda b, i, sref: (b, 0, 0),
                                       memory_space=pltpu.VMEM)

    in_specs = ([chunk_spec(kfmt.seg_rows(k)) for k in kfmt.segs]
                + [bmp_spec(kfmt.planes)]
                + [chunk_spec(vfmt.seg_rows(k)) for k in vfmt.segs]
                + [bmp_spec(vfmt.planes)]
                + [fixed((hpb, G8, D)), fixed((hpb, W, D)), fixed((hpb, W, D))])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hpb, G8, D), lambda b, i, sref: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hpb, G8, 128), jnp.float32),   # m (replicated lanes)
            pltpu.VMEM((hpb, G8, 128), jnp.float32),   # l
            pltpu.VMEM((hpb, G8, D), jnp.float32),     # acc
        ],
    )
    ks3 = [s.reshape(BH, max_chunks * kfmt.seg_rows(k), 128)
           for s, k in zip(k_segs, kfmt.segs)]
    vs3 = [s.reshape(BH, max_chunks * vfmt.seg_rows(k), 128)
           for s, k in zip(v_segs, vfmt.segs)]

    out = pl.pallas_call(
        functools.partial(_fused_decode_kernel, kfmt=kfmt, vfmt=vfmt, hpb=hpb,
                          max_chunks=max_chunks, scale=float(1.0 / np.sqrt(D))),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, G8, D), jnp.float32),
        interpret=_interpret(),
    )(scalars, *ks3, k_bmp, *vs3, v_bmp, qb, kw, vw)
    return out[:, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Fused decode kernel v3: manual double-buffered chunk pipeline.
#
# The grid-per-chunk variant above pays a fixed pipeline cost per grid step
# (~us with 9 block specs), which dominates at decode shapes (measured: a
# no-op expansion still costs ~1.3 ms at B=32).  v3 collapses the grid to one
# step per head-group and streams chunks with explicit async copies — the
# direct analogue of the reference CUDA kernel's double-buffered cp.async
# main loop (SpMM_Kernel.cuh:318-379), with a *dynamic* trip count (n_chunks
# is data, not grid).
#
# Pool layout for v3 is chunk-major: [max_chunks, BH, R, 128] so one DMA
# fetches a chunk for all HPB heads of the step.
# ---------------------------------------------------------------------------

def _fused_v3_kernel(scalars_ref, *refs, kfmt: ChunkFormat, vfmt: ChunkFormat,
                     hpb: int, scale: float):
    nk, nv = len(kfmt.segs), len(vfmt.segs)
    nbuf = nk + nv + 2
    hbm = refs[:nbuf]                       # kseg*, kbmp, vseg*, vbmp (HBM)
    (q_ref, kw_ref, vw_ref, out_ref) = refs[nbuf:nbuf + 4]
    scratch = refs[nbuf + 4:]
    bufs = scratch[:nbuf]                   # VMEM (2, hpb, ., .)
    (sems, m_ref, l_ref, acc_ref) = scratch[nbuf:]

    nc = scalars_ref[0]
    win_len = scalars_ref[1]
    b = pl.program_id(0)
    h0 = b * hpb
    G8, D, C = q_ref.shape[1], kfmt.dim, kfmt.chunk

    def start_fetch(slot, ci):
        for j in range(nbuf):
            pltpu.make_async_copy(
                hbm[j].at[ci, pl.ds(h0, hpb)], bufs[j].at[slot],
                sems.at[slot, j]).start()

    def wait_fetch(slot, ci):
        for j in range(nbuf):
            pltpu.make_async_copy(
                hbm[j].at[ci, pl.ds(h0, hpb)], bufs[j].at[slot],
                sems.at[slot, j]).wait()

    m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
    l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(nc > 0)
    def _():
        start_fetch(0, 0)

    def online_update(h, s, vmat):
        m_old = m_ref[h]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new[:, :1])
        corr = jnp.exp(m_old - m_new)
        l_ref[h] = l_ref[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[h] = acc_ref[h] * corr[:, :D] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[h] = m_new

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < nc)
        def _():
            start_fetch((ci + 1) % 2, ci + 1)

        wait_fetch(slot, ci)
        for h in range(hpb):
            kd = _expand_chunk([bufs[j][slot, h] for j in range(nk)],
                               bufs[nk][slot, h], kfmt)
            vd = _expand_chunk([bufs[nk + 1 + j][slot, h] for j in range(nv)],
                               bufs[nk + 1 + nv][slot, h], vfmt)
            s = jax.lax.dot_general(q_ref[h], kd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            online_update(h, s, vd)
        return 0

    jax.lax.fori_loop(0, nc, chunk_body, 0)

    # dense residual window
    W = kw_ref.shape[1]
    wmask = (jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) < win_len)
    for h in range(hpb):
        s = jax.lax.dot_general(q_ref[h], kw_ref[h], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(wmask, s, -1e30)
        online_update(h, s, vw_ref[h])
    out_ref[:] = acc_ref[:] / l_ref[:, :, :1]


def fused_sparse_decode_attention_v3(q, k_segs, k_bmp, v_segs, v_bmp, k_win,
                                     v_win, n_chunks, win_len,
                                     kfmt: ChunkFormat, vfmt: ChunkFormat,
                                     max_chunks: int, hpb: int = 8):
    """v3 fused decode attention over chunk-major pools.

    q [B,1,Hq,D]; k_segs[i] [mc, BH, R_i, 128]; k_bmp [mc, BH, P, D];
    k_win/v_win [B, W, Hkv, D]; n_chunks/win_len int32 scalars.
    """
    B, _, Hq, D = q.shape
    W = k_win.shape[1]
    Hkv = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    BH = B * Hkv
    hpb = min(hpb, BH)
    while BH % hpb:
        hpb //= 2
    NB = BH // hpb

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg.reshape(BH, G, D), ((0, 0), (0, G8 - G), (0, 0)))
    qb = qpad.astype(jnp.bfloat16)
    kw = jnp.transpose(k_win, (0, 2, 1, 3)).reshape(BH, W, D).astype(jnp.bfloat16)
    vw = jnp.transpose(v_win, (0, 2, 1, 3)).reshape(BH, W, D).astype(jnp.bfloat16)

    scalars = jnp.stack([n_chunks.astype(jnp.int32), win_len.astype(jnp.int32)])
    fixed = lambda shape: pl.BlockSpec(shape, lambda b, sref: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    in_specs = ([hbm_spec] * (len(kfmt.segs) + 1 + len(vfmt.segs) + 1)
                + [fixed((hpb, G8, D)), fixed((hpb, W, D)), fixed((hpb, W, D))])

    vdtype = k_segs[0].dtype
    scratch_shapes = []
    for k in kfmt.segs:
        scratch_shapes.append(pltpu.VMEM((2, hpb, kfmt.seg_rows(k), 128), vdtype))
    scratch_shapes.append(pltpu.VMEM((2, hpb, kfmt.planes, D), jnp.uint32))
    for k in vfmt.segs:
        scratch_shapes.append(pltpu.VMEM((2, hpb, vfmt.seg_rows(k), 128), vdtype))
    scratch_shapes.append(pltpu.VMEM((2, hpb, vfmt.planes, D), jnp.uint32))
    nbuf = len(scratch_shapes)
    scratch_shapes += [
        pltpu.SemaphoreType.DMA((2, nbuf)),
        pltpu.VMEM((hpb, G8, 128), jnp.float32),
        pltpu.VMEM((hpb, G8, 128), jnp.float32),
        pltpu.VMEM((hpb, G8, D), jnp.float32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hpb, G8, D), lambda b, sref: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        functools.partial(_fused_v3_kernel, kfmt=kfmt, vfmt=vfmt, hpb=hpb,
                          scale=float(1.0 / np.sqrt(D))),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, G8, D), jnp.float32),
        interpret=_interpret(),
    )(scalars, *k_segs, k_bmp, *v_segs, v_bmp, qb, kw, vw)
    return out[:, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Fused decode kernel v4: single fused-stream pool, ONE DMA per chunk.
#
# v3 measurement: per-async-copy issue/wait latency dominates (6 buffers x
# chunks x head-groups ~ 700 DMAs ~ 700us at B=32).  v4 packs each chunk's
# values+bitmap for both streams into one contiguous int16 row-block
# (sparse_format.encode_stream), so the pipeline is one copy per chunk.
# ---------------------------------------------------------------------------

def _fused_v4_kernel(scalars_ref, pool_hbm, q_ref, kw_ref, vw_ref, out_ref,
                     buf, sems, m_ref, l_ref, acc_ref,
                     *, kfmt: ChunkFormat, vfmt: ChunkFormat, hpb: int,
                     scale: float):
    nc = scalars_ref[0]
    win_len = scalars_ref[1]
    b = pl.program_id(0)
    h0 = b * hpb
    D, C = kfmt.dim, kfmt.chunk
    KR = kfmt.stream_rows

    def copy(slot, ci):
        return pltpu.make_async_copy(
            pool_hbm.at[ci, pl.ds(h0, hpb)], buf.at[slot], sems.at[slot])

    m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
    l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(nc > 0)
    def _():
        copy(0, 0).start()

    def online_update(h, s, vmat):
        m_old = m_ref[h]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new[:, :1])
        corr = jnp.exp(m_old - m_new)
        l_ref[h] = l_ref[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[h] = acc_ref[h] * corr[:, :D] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[h] = m_new

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < nc)
        def _():
            copy((ci + 1) % 2, ci + 1).start()

        copy(slot, ci).wait()
        for h in range(hpb):
            kd = _expand_stream_rows(buf[slot, h, :KR], kfmt)
            vd = _expand_stream_rows(buf[slot, h, KR:], vfmt)
            s = jax.lax.dot_general(q_ref[h], kd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            online_update(h, s, vd)
        return 0

    jax.lax.fori_loop(0, nc, chunk_body, 0)

    W = kw_ref.shape[1]
    wmask = (jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) < win_len)
    for h in range(hpb):
        s = jax.lax.dot_general(q_ref[h], kw_ref[h], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(wmask, s, -1e30)
        online_update(h, s, vw_ref[h])
    out_ref[:] = acc_ref[:] / l_ref[:, :, :1]


def fused_sparse_decode_attention_v4(q, kv_pool, k_win, v_win, n_chunks,
                                     win_len, kfmt: ChunkFormat,
                                     vfmt: ChunkFormat, max_chunks: int,
                                     hpb: int = 8):
    """v4 fused decode attention.

    q [B,1,Hq,D]; kv_pool [mc, BH, kfmt.stream_rows + vfmt.stream_rows, 128]
    int16 (encode_stream rows, K block then V block); k_win/v_win
    [B, W, Hkv, D]; n_chunks/win_len int32 scalars.
    """
    B, _, Hq, D = q.shape
    W = k_win.shape[1]
    Hkv = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    BH = B * Hkv
    hpb = min(hpb, BH)
    while BH % hpb:
        hpb //= 2
    NB = BH // hpb
    ROWS = kfmt.stream_rows + vfmt.stream_rows
    assert kv_pool.shape == (max_chunks, BH, ROWS, 128), kv_pool.shape

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg.reshape(BH, G, D), ((0, 0), (0, G8 - G), (0, 0)))
    qb = qpad.astype(jnp.bfloat16)
    kw = jnp.transpose(k_win, (0, 2, 1, 3)).reshape(BH, W, D).astype(jnp.bfloat16)
    vw = jnp.transpose(v_win, (0, 2, 1, 3)).reshape(BH, W, D).astype(jnp.bfloat16)

    scalars = jnp.stack([n_chunks.astype(jnp.int32), win_len.astype(jnp.int32)])
    fixed = lambda shape: pl.BlockSpec(shape, lambda b, sref: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  fixed((hpb, G8, D)), fixed((hpb, W, D)), fixed((hpb, W, D))],
        out_specs=pl.BlockSpec((hpb, G8, D), lambda b, sref: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, hpb, ROWS, 128), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((hpb, G8, 128), jnp.float32),
            pltpu.VMEM((hpb, G8, 128), jnp.float32),
            pltpu.VMEM((hpb, G8, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fused_v4_kernel, kfmt=kfmt, vfmt=vfmt, hpb=hpb,
                          scale=float(1.0 / np.sqrt(D))),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, G8, D), jnp.float32),
        interpret=_interpret(),
    )(scalars, kv_pool, qb, kw, vw)
    return out[:, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Fused decode kernel v5: head-batched compute.
#
# Shootout measurement: with DMA count and grid steps already minimized
# (v3/v4), decode cost is bound by ~2k *small* MXU matmuls per step (~0.4 us
# fixed latency each).  v5 batches all HPB heads of a step into single large
# operations:
#   * expansion runs on stacked [HPB*C, D] tiles (one rank matmul, one
#     gather chain for all heads);
#   * scores use one cross-product matmul q_all [HPB*G8, D] x KD_all^T
#     [D, HPB*C] and select the block diagonal;
#   * the value combine builds a block-diagonal probability matrix and does
#     one [HPB*G8, HPB*C] x [HPB*C, D] matmul.
# FLOP inflation (HPB x on the cross terms) is free: the MXU is latency- not
# throughput-bound at these sizes.
# ---------------------------------------------------------------------------

def _fused_v5_kernel(scalars_ref, pool_hbm, q_ref, kw_ref, vw_ref, out_ref,
                     buf, sems, m_ref, l_ref, acc_ref,
                     *, kfmt: ChunkFormat, vfmt: ChunkFormat, hpb: int,
                     scale: float):
    nc = scalars_ref[0]
    win_len = scalars_ref[1]
    b = pl.program_id(0)
    h0 = b * hpb
    D, C = kfmt.dim, kfmt.chunk
    KR = kfmt.stream_rows
    G8 = q_ref.shape[1]
    HG = hpb * G8
    HC = hpb * C

    def copy(slot, ci):
        return pltpu.make_async_copy(
            pool_hbm.at[ci, pl.ds(h0, hpb)], buf.at[slot], sems.at[slot])

    m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
    l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(nc > 0)
    def _():
        copy(0, 0).start()

    q_all = q_ref[:].reshape(HG, D)                                   # [HG, D]
    # block-diag selector: row g of head h pairs with key rows of head h
    hrow_q = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 0) // G8
    hrow_k = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 1) // C
    blk = hrow_q == hrow_k                                            # [HG, HC]

    def online_update_all(s_blk, vmat_all):
        """s_blk [HG, HC] fp32 (off-diag -inf); vmat_all [HC, D] stacked per head."""
        m_old = m_ref[:].reshape(HG, 128)
        m_new = jnp.maximum(m_old, jnp.max(s_blk, axis=-1, keepdims=True))
        p = jnp.exp(s_blk - m_new[:, :1])                             # [HG, HC]
        corr = jnp.exp(m_old - m_new)
        l_ref[:] = (l_ref[:].reshape(HG, 128) * corr
                    + jnp.sum(p, axis=-1, keepdims=True)).reshape(l_ref.shape)
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), vmat_all,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [HG, D]
        acc_ref[:] = (acc_ref[:].reshape(HG, D) * corr[:, :D] + pv).reshape(acc_ref.shape)
        m_ref[:] = m_new.reshape(m_ref.shape)

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < nc)
        def _():
            copy((ci + 1) % 2, ci + 1).start()

        copy(slot, ci).wait()
        kd = _expand_stream_rows_batched(buf[slot], kfmt, hpb, 0)     # [HC, D]
        vd = _expand_stream_rows_batched(buf[slot], vfmt, hpb, KR)
        s = jax.lax.dot_general(q_all, kd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(blk, s, -1e30)
        online_update_all(s, vd)
        return 0

    jax.lax.fori_loop(0, nc, chunk_body, 0)

    # dense residual window (also head-batched)
    W = kw_ref.shape[1]
    HW = hpb * W
    kw_all = kw_ref[:].reshape(HW, D)
    vw_all = vw_ref[:].reshape(HW, D)
    hq = jax.lax.broadcasted_iota(jnp.int32, (HG, HW), 0) // G8
    hk = jax.lax.broadcasted_iota(jnp.int32, (HG, HW), 1) // W
    wpos = jax.lax.broadcasted_iota(jnp.int32, (HG, HW), 1) % W
    wblk = (hq == hk) & (wpos < win_len)
    s = jax.lax.dot_general(q_all, kw_all, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(wblk, s, -1e30)
    online_update_all(s, vw_all)
    out_ref[:] = (acc_ref[:].reshape(HG, D)
                  / l_ref[:].reshape(HG, 128)[:, :1]).reshape(out_ref.shape)


def fused_sparse_decode_attention_v5(q, kv_pool, k_win, v_win, n_chunks,
                                     win_len, kfmt: ChunkFormat,
                                     vfmt: ChunkFormat, max_chunks: int,
                                     hpb: int = 8):
    """v5 fused decode attention (head-batched compute).  Same contract as v4."""
    B, _, Hq, D = q.shape
    W = k_win.shape[1]
    Hkv = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    BH = B * Hkv
    hpb = min(hpb, BH)
    while BH % hpb:
        hpb //= 2
    NB = BH // hpb
    ROWS = kfmt.stream_rows + vfmt.stream_rows
    assert kv_pool.shape == (max_chunks, BH, ROWS, 128), kv_pool.shape

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg.reshape(BH, G, D), ((0, 0), (0, G8 - G), (0, 0)))
    qb = qpad.astype(jnp.bfloat16)
    kw = jnp.transpose(k_win, (0, 2, 1, 3)).reshape(BH, W, D).astype(jnp.bfloat16)
    vw = jnp.transpose(v_win, (0, 2, 1, 3)).reshape(BH, W, D).astype(jnp.bfloat16)

    scalars = jnp.stack([n_chunks.astype(jnp.int32), win_len.astype(jnp.int32)])
    fixed = lambda shape: pl.BlockSpec(shape, lambda b, sref: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  fixed((hpb, G8, D)), fixed((hpb, W, D)), fixed((hpb, W, D))],
        out_specs=pl.BlockSpec((hpb, G8, D), lambda b, sref: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, hpb, ROWS, 128), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((hpb, G8, 128), jnp.float32),
            pltpu.VMEM((hpb, G8, 128), jnp.float32),
            pltpu.VMEM((hpb, G8, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fused_v5_kernel, kfmt=kfmt, vfmt=vfmt, hpb=hpb,
                          scale=float(1.0 / np.sqrt(D))),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, G8, D), jnp.float32),
        interpret=_interpret(),
    )(scalars, kv_pool, qb, kw, vw)
    return out[:, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# v6: pools-only kernel + XLA window merge.
#
# The kernel streams only the compressed pools and returns the flash partials
# (acc, m, l); the dense residual-window attention runs as plain XLA (a
# well-batched einsum that overlaps with the rest of the decode step) and the
# two are combined with the standard flash-decoding merge.  Removes the two
# large window BlockSpecs and the in-kernel window phase.
# ---------------------------------------------------------------------------

def _fused_v6_kernel(scalars_ref, pool_hbm, q_ref, out_ref, m_out, l_out,
                     buf, sems, m_ref, l_ref, acc_ref,
                     *, kfmt: ChunkFormat, vfmt: ChunkFormat, hpb: int,
                     scale: float, window: int | None = None):
    nc = scalars_ref[0]
    b = pl.program_id(0)
    h0 = b * hpb
    D, C = kfmt.dim, kfmt.chunk
    KR = kfmt.stream_rows
    G8 = q_ref.shape[1]
    HG = hpb * G8
    HC = hpb * C

    def copy(slot, ci):
        return pltpu.make_async_copy(
            pool_hbm.at[ci, pl.ds(h0, hpb)], buf.at[slot], sems.at[slot])

    m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
    l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(nc > 0)
    def _():
        copy(0, 0).start()

    q_all = q_ref[:].reshape(HG, D)
    hrow_q = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 0) // G8
    hrow_k = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 1) // C
    blk = hrow_q == hrow_k
    tcol = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 1) % C
    win_len = scalars_ref[1]

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < nc)
        def _():
            copy((ci + 1) % 2, ci + 1).start()

        copy(slot, ci).wait()
        kd = _expand_stream_rows_batched(buf[slot], kfmt, hpb, 0)
        vd = _expand_stream_rows_batched(buf[slot], vfmt, hpb, KR)
        s = jax.lax.dot_general(q_all, kd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = blk
        if window is not None:
            # newest position pos = nc*C + win_len - 1; keep cols > pos - window
            low = nc * C + win_len - 1 - window
            mask = mask & ((ci * C + tcol) > low)
        s = jnp.where(mask, s, -1e30)
        m_old = m_ref[:].reshape(HG, 128)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new[:, :1])
        corr = jnp.exp(m_old - m_new)
        l_ref[:] = (l_ref[:].reshape(HG, 128) * corr
                    + jnp.sum(p, axis=-1, keepdims=True)).reshape(l_ref.shape)
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), vd,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:] = (acc_ref[:].reshape(HG, D) * corr[:, :D] + pv).reshape(acc_ref.shape)
        m_ref[:] = m_new.reshape(m_ref.shape)
        return 0

    jax.lax.fori_loop(0, nc, chunk_body, 0)
    out_ref[:] = acc_ref[:]
    m_out[:] = m_ref[:, :, :1]
    l_out[:] = l_ref[:, :, :1]


def fused_sparse_decode_attention_v6(q, kv_pool, k_win, v_win, n_chunks,
                                     win_len, kfmt: ChunkFormat,
                                     vfmt: ChunkFormat, max_chunks: int,
                                     hpb: int = 8, window: int | None = None):
    """v6: pools-only Pallas kernel + XLA window attention + flash merge.
    Same contract as v4/v5; ``window`` enables sliding-window masking of the
    compressed chunks (residual-window tokens are always inside any
    window >= wcap — asserted by the cache)."""
    B, _, Hq, D = q.shape
    W = k_win.shape[1]
    Hkv = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    BH = B * Hkv
    hpb = min(hpb, BH)
    while BH % hpb:
        hpb //= 2
    NB = BH // hpb
    ROWS = kfmt.stream_rows + vfmt.stream_rows
    assert kv_pool.shape == (max_chunks, BH, ROWS, 128), kv_pool.shape

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg.reshape(BH, G, D), ((0, 0), (0, G8 - G), (0, 0)))
    qb = qpad.astype(jnp.bfloat16)

    scalars = jnp.stack([n_chunks.astype(jnp.int32), win_len.astype(jnp.int32)])
    fixed = lambda shape: pl.BlockSpec(shape, lambda b, sref: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), fixed((hpb, G8, D))],
        out_specs=(pl.BlockSpec((hpb, G8, D), lambda b, sref: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((hpb, G8, 1), lambda b, sref: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((hpb, G8, 1), lambda b, sref: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, hpb, ROWS, 128), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((hpb, G8, 128), jnp.float32),
            pltpu.VMEM((hpb, G8, 128), jnp.float32),
            pltpu.VMEM((hpb, G8, D), jnp.float32),
        ],
    )
    acc, m_c, l_c = pl.pallas_call(
        functools.partial(_fused_v6_kernel, kfmt=kfmt, vfmt=vfmt, hpb=hpb,
                          scale=float(1.0 / np.sqrt(D)), window=window),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((BH, G8, D), jnp.float32),
                   jax.ShapeDtypeStruct((BH, G8, 1), jnp.float32),
                   jax.ShapeDtypeStruct((BH, G8, 1), jnp.float32)),
        interpret=_interpret(),
    )(scalars, kv_pool, qb)

    # XLA window attention partials — transpose-free einsums on the native
    # [B, W, Hkv, D] window layout (pre-transposing to [BH, W, D] cost ~2
    # relayouts of 19 MB each per call)
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    qw = qpad.reshape(B, Hkv, G8, D)
    s_w = jnp.einsum("bhgd,bwhd->bhgw", qw, k_win.astype(qw.dtype),
                     preferred_element_type=jnp.float32) * scale
    s_w = jnp.where((jnp.arange(W) < win_len)[None, None, None, :], s_w, -jnp.inf)
    m_w = jnp.max(s_w, axis=-1, keepdims=True)                  # [B, Hkv, G8, 1]
    m_w_safe = jnp.maximum(m_w, -1e30)
    p_w = jnp.exp(s_w - m_w_safe)
    l_w = jnp.sum(p_w, axis=-1, keepdims=True)
    o_w = jnp.einsum("bhgw,bwhd->bhgd", p_w.astype(jnp.bfloat16),
                     v_win.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    o_w = o_w.reshape(BH, G8, D)
    m_w_safe = m_w_safe.reshape(BH, G8, 1)
    l_w = l_w.reshape(BH, G8, 1)

    # flash merge of (acc, m_c, l_c) and (o_w, m_w, l_w)
    m_tot = jnp.maximum(m_c, m_w_safe)
    a_c = jnp.exp(m_c - m_tot)
    a_w = jnp.exp(m_w_safe - m_tot)
    out = (acc * a_c + o_w * a_w) / (l_c * a_c + l_w * a_w)
    return out[:, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)


