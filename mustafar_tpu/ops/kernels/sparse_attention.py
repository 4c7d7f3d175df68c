"""Pallas TPU sparse decode-attention kernels.

TPU-native replacement for the reference CUDA batched SpMV pair
(kernel/csrc/SpMM_Kernel.cuh: ``Key_Kernel`` :156-419 / ``Value_Kernel``
:421-676, driven via mustafar_key_formulation / mustafar_value_formulation,
kernel/kernel_wrapper/mustafar_wrapper.cu:19-263).  Same "Load-as-Sparse,
Compute-as-Dense" strategy, redesigned for the MXU/VPU instead of
m16n8k16 tensor-core fragments:

  * compressed chunks stream HBM -> VMEM through explicit double-buffered
    ``make_async_copy`` pipelines (the CUDA cp.async loop,
    SpMM_Kernel.cuh:318-379);
  * the bitmap expands with tile-repeat + shift + MXU triangular-matmul rank
    (replacing per-bit ``__clzll`` scatter, SpMM_Kernel.cuh:109-151);
  * packed values expand via lane dynamic-gather from tiled split-pool
    tables (see ops/sparse_format.py for the layout derivation);
  * the expanded dense tile feeds a single MXU matmul against the padded
    query/probability block — the reference pads the single decode row to
    N=8 (llama_mustafar_kernel.py:273,313); we pad to 8 sublanes likewise.

GQA head sharing falls out of layout: pools are indexed by kv-head and the
query block carries all G = Hq/Hkv query rows of the group (the CUDA kernels
recompute a group_id per block instead, SpMM_Kernel.cuh:174-185); any Hkv is
supported — the per-block head count adapts to B*Hkv (_pick_hpb), matching
the reference's arbitrary num_key_value_groups.

All kernels take the STACKED [L, ...] cache state plus a scalar-prefetched
layer index ``li`` (per-layer convenience form with li=None for tests): a
per-layer dynamic-slice feeding a pallas_call cannot fuse — XLA materializes
the slice in HBM (measured 0.157 ms/layer pool + ~0.24 ms/layer windows at
the bench shape).  The decode kernels fold the dense residual window
in-kernel with a dynamic tile trip count (uniform win_len or per-slot
vectors), and can return the post-softmax window-column probabilities for
output-aware (Opa) scoring — computed from the streamed window tiles, never
by re-reading k_win in XLA.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mustafar_tpu.ops.sparse_format import ChunkFormat


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_hpb(BH: int, want: int, align8: bool = False) -> int:
    """Heads per grid block: the largest divisor of BH that is <= ``want``.

    ``align8``: kernels with a per-head scales BlockSpec place the head axis
    on VMEM sublanes, so block offsets b*hpb must be 8-aligned on real TPU —
    restrict to multiples of 8, falling back to hpb = BH (a single block
    covers the whole axis; offset 0 is always legal)."""
    cands = [d for d in range(1, min(want, BH) + 1) if BH % d == 0
             and (not align8 or d % 8 == 0)]
    return max(cands) if cands else BH


def _bcast_heads(srow, hpb: int, g8: int):
    """[hpb, D] per-head scale rows -> [hpb*g8, D] (head row repeated g8x)."""
    D = srow.shape[-1]
    return jnp.broadcast_to(srow.reshape(hpb, 1, D).astype(jnp.float32),
                            (hpb, g8, D)).reshape(hpb * g8, D)


# ---------------------------------------------------------------------------
# Shared in-kernel expansion helpers (fused-stream layout)
# ---------------------------------------------------------------------------

def _expand_stream_rows(rows, fmt: ChunkFormat):
    """rows [stream_rows, 128] int16 -> dense [C, D] (in-kernel).

    qbits=16: bf16 values (bit-carried).  qbits=8 (bitmap-q8): int8 CODES as
    bf16 — the caller folds the per-channel scales into the attention
    matmuls; dequantized tiles never materialize."""
    C, D = fmt.chunk, fmt.dim
    off = 0
    segs = []
    for k in fmt.segs:
        R = fmt.seg_rows(k)
        seg = rows[off:off + R]
        if fmt.qbits == 8:
            # physical row r carries logical rows r (low byte) and r + R
            # (high byte): sign-extending shifts + sublane concat BEFORE
            # tile-repeat, so the gather geometry is unchanged
            w = seg.astype(jnp.int32)
            segs.append(jnp.concatenate([(w << 24) >> 24, (w << 16) >> 24],
                                        axis=0))             # [2R, 128] i32
        else:
            segs.append(pltpu.bitcast(seg, jnp.bfloat16))
        off += R
    words = rows[off:off + fmt.bmp16_rows]                         # i16 planes
    tiled = jnp.concatenate([words] * 16, axis=0).astype(jnp.int32)  # [C, D]
    bitsel = (jnp.int32(1) << (jax.lax.broadcasted_iota(jnp.int32, (C, D), 0)
                               // fmt.bmp16_rows))
    bits = ((tiled & bitsel) != 0).astype(jnp.bfloat16)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (D, D), 0) <=
           jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)).astype(jnp.bfloat16)
    rank = jax.lax.dot_general(bits, tri, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    rank_i = rank.astype(jnp.int32)
    gs, bounds = [], []
    base = 1
    for seg, k in zip(segs, fmt.segs):
        R = fmt.seg_logical_rows(k)
        rpt = C // R
        tbl = jnp.concatenate([seg.astype(jnp.float32)] * rpt, axis=0)
        toff = jax.lax.broadcasted_iota(jnp.int32, (C, D), 0) // R
        idx = rank_i + (toff * k - base)
        gs.append(jnp.take_along_axis(tbl, idx, axis=-1))
        bounds.append(base + k)
        base += k
    dense = gs[0] if len(gs) == 1 else jnp.where(rank_i < bounds[0], gs[0], gs[1])
    return dense.astype(jnp.bfloat16) * bits


def _expand_stream_rows_batched(buf_slot, fmt: ChunkFormat, hpb: int, row_off: int):
    """buf_slot [hpb, ROWS, 128] int16 -> dense bf16 [hpb*C, D] (stacked)."""
    C, D = fmt.chunk, fmt.dim
    SR = fmt.stream_rows
    # stacked bitmap tiles: rows h*C + t need word rows of head h
    word_tiles = []
    val_parts = {k: [] for k in fmt.segs}
    for h in range(hpb):
        words = buf_slot[h, row_off + fmt.total_rows: row_off + SR]   # [C/16,128]
        word_tiles.extend([words] * 16)
        off = row_off
        for k in fmt.segs:
            R = fmt.seg_rows(k)                                 # physical rows
            seg = buf_slot[h, off:off + R]
            if fmt.qbits == 8:
                # physical row r carries logical rows r (low byte) and
                # r + R (high byte): sign-extending shifts + sublane concat
                # BEFORE tile-repeat, so the gather geometry is unchanged
                w = seg.astype(jnp.int32)
                seg = jnp.concatenate([(w << 24) >> 24, (w << 16) >> 24],
                                      axis=0)                   # [2R, 128] i32
            val_parts[k].extend([seg] * (C // fmt.seg_logical_rows(k)))
            off += R
    tiled = jnp.concatenate(word_tiles, axis=0).astype(jnp.int32)     # [hpb*C, D]
    HC = hpb * C
    trow = jax.lax.broadcasted_iota(jnp.int32, (HC, D), 0) % C        # token idx
    bitsel = jnp.int32(1) << (trow // fmt.bmp16_rows)
    # rank via MXU triangular matmul.  A VPU-only lane-roll prefix sum
    # (round-5 A/B, benchmarks/bench_rank_mode.py) measured 2.2-2.4x SLOWER
    # at every depth: per-step lane rotations through the crossbar cost more
    # than the matmul + relayouts they replace.  See docs/PERFORMANCE.md
    # "Round 5: bitmap expansion".
    bits = ((tiled & bitsel) != 0).astype(jnp.bfloat16)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (D, D), 0) <=
           jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)).astype(jnp.bfloat16)
    rank = jax.lax.dot_general(bits, tri, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    rank_i = rank.astype(jnp.int32)
    gs, bounds = [], []
    base = 1
    for k in fmt.segs:
        R = fmt.seg_logical_rows(k)
        tblb = jnp.concatenate(val_parts[k], axis=0)
        if fmt.qbits == 8:
            tbl = tblb.astype(jnp.float32)                      # int8 codes
        else:
            tbl = pltpu.bitcast(tblb, jnp.bfloat16).astype(jnp.float32)
        toff = trow // R
        idx = rank_i + (toff * k - base)
        gs.append(jnp.take_along_axis(tbl, idx, axis=-1))
        bounds.append(base + k)
        base += k
    dense = gs[0] if len(gs) == 1 else jnp.where(rank_i < bounds[0], gs[0], gs[1])
    return dense.astype(jnp.bfloat16) * bits

# Earlier kernel generations (v1-v6, the measured path to this design) live
# in sparse_attention_archive.py; the production surface is v6ps (per-slot
# decode), fused_sparse_segment_attention (chunked prefill), and v7 (uniform
# decode) below, plus the shared expansion helpers above.


def _window_tile(W: int, wt: int) -> int:
    """Largest divisor of the window capacity W that is <= wt and a multiple
    of 8 (VMEM sublane tiling).  Halving wt until it divides W (the old rule)
    walks 96 -> ... -> 1 for W = 160 (residual_length 32 + chunk 128) and a
    1-row window slice fails Mosaic's 8-sublane alignment on real TPU."""
    cands = [d for d in range(8, min(wt, W) + 1, 8) if W % d == 0]
    return max(cands) if cands else W


def _probs_epilogue(probs_ref, ws_ref, m1, l1, NW: int, hpb: int, G8: int,
                    G: int, wt: int):
    """Emit post-softmax window probabilities from the stored window-score
    tiles and the FINAL online-softmax stats.

    ws_ref [NW, HG, HW] fp32 raw scores (dead tiles/positions = -1e30, so
    they exp to 0); m1/l1 [HG, 1]; probs_ref block [1, NW, hpb, wt].  The
    per-head group fold and the block-diagonal extraction both run as 0/1
    MXU matmuls (sublane-splitting reshapes are unsupported in Mosaic):
    probs[j, p] = sum_{g<G} exp(ws[j*G8+g, j*wt+p] - m)/l — off-diagonal
    (head j' != j) entries are already -1e30-masked, so folding over ALL
    rows/columns with the selection matrices is exact."""
    HG = hpb * G8
    HW = hpb * wt
    rsel = ((jax.lax.broadcasted_iota(jnp.int32, (hpb, HG), 1) // G8
             == jax.lax.broadcasted_iota(jnp.int32, (hpb, HG), 0))
            & (jax.lax.broadcasted_iota(jnp.int32, (hpb, HG), 1) % G8 < G)
            ).astype(jnp.float32)
    csel = (jax.lax.broadcasted_iota(jnp.int32, (HW, wt), 0) % wt
            == jax.lax.broadcasted_iota(jnp.int32, (HW, wt), 1)
            ).astype(jnp.float32)
    for wi in range(NW):
        p = jnp.exp(ws_ref[wi] - m1) / l1                        # [HG, HW]
        t = jax.lax.dot_general(rsel, p, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        probs_ref[0, wi] = jax.lax.dot_general(
            t, csel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _fold_probs(pr, B: int, Hkv: int, W: int):
    """Kernel probs output (NB, NW, hpb, wt) -> [B, Hkv, W] (col = wi*wt+p)."""
    NB, NW, hpb, wt = pr.shape
    return jnp.transpose(pr, (0, 2, 1, 3)).reshape(B, Hkv, W)


# ---------------------------------------------------------------------------
# v6ps: per-slot chunk counts (continuous batching over the compressed cache).
#
# nc and win_len are per-sequence vectors; a head-group may span several
# sequences, so the kernel reads the group's counts from the scalar-prefetch
# array, trips to the group max, and masks each head's columns by its own
# count.  The dense residual window streams in-kernel with a per-group
# dynamic tile trip count and per-head column masks (v7's mechanism, made
# per-slot) — window bytes for short slots are never fetched.
# ---------------------------------------------------------------------------

def _fused_v6ps_kernel(scalars_ref, pool_hbm, kw_hbm, vw_hbm, q_ref, *refs,
                       kfmt: ChunkFormat, vfmt: ChunkFormat, hpb: int,
                       hkv: int, nslots: int, NW: int, wt: int, gsize: int,
                       scale: float, window: int | None = None,
                       want_probs: bool = False):
    quant = kfmt.qbits == 8
    refs = list(refs)
    if quant:
        ks_ref = refs.pop(0)
        vs_ref = refs.pop(0)
    out_ref, m_out, l_out = refs.pop(0), refs.pop(0), refs.pop(0)
    probs_ref = refs.pop(0) if want_probs else None
    buf, wbuf, sems, wsems, m_ref, l_ref, acc_ref = refs[:7]
    ws_ref = refs[7] if want_probs else None

    b = pl.program_id(0)
    h0 = b * hpb
    D, C = kfmt.dim, kfmt.chunk
    KR = kfmt.stream_rows
    G8 = q_ref.shape[1]
    HG = hpb * G8
    HC = hpb * C
    HW = hpb * wt

    # per-head chunk counts / window lengths for this group (scalars holds
    # the per-sequence n_chunks vector, the win_len vector, then li)
    li = scalars_ref[2 * nslots]
    ncs = [scalars_ref[(h0 + j) // hkv] for j in range(hpb)]
    wls = [scalars_ref[nslots + (h0 + j) // hkv] for j in range(hpb)]
    nc_max = ncs[0]
    wl_max = wls[0]
    for v in ncs[1:]:
        nc_max = jnp.maximum(nc_max, v)
    for v in wls[1:]:
        wl_max = jnp.maximum(wl_max, v)
    n_wtiles = (wl_max + wt - 1) // wt

    def copy(slot, ci):
        return pltpu.make_async_copy(
            pool_hbm.at[li, ci, pl.ds(h0, hpb)], buf.at[slot], sems.at[slot])

    def wcopy(slot, wi, which):
        src = (kw_hbm, vw_hbm)[which]
        return pltpu.make_async_copy(
            src.at[li, pl.ds(h0, hpb), pl.ds(wi * wt, wt)],
            wbuf.at[slot, which], wsems.at[slot, which])

    m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
    l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
    if want_probs:
        # dead window tiles keep -1e30 so the epilogue exps them to 0
        ws_ref[:] = jnp.full(ws_ref.shape, -1e30, jnp.float32)

    @pl.when(nc_max > 0)
    def _():
        copy(0, 0).start()

    # every started wcopy MUST be waited (an un-awaited DMA at kernel exit
    # aborts the device), hence the n_wtiles guards mirrored below
    @pl.when((nc_max == 0) & (n_wtiles > 0))
    def _():
        wcopy(0, 0, 0).start()
        wcopy(0, 0, 1).start()

    q_all = q_ref[:].reshape(HG, D)
    hrow_q = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 0) // G8
    hrow_k = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 1) // C
    blk = hrow_q == hrow_k
    # per-column chunk count: nc_col[col] = nc of head col // C
    hcol = jax.lax.broadcasted_iota(jnp.int32, (1, HC), 1) // C
    nc_col = jnp.zeros((1, HC), jnp.int32)
    for j in range(hpb):
        nc_col = nc_col + jnp.where(hcol == j, ncs[j], 0)
    if window is not None:
        # sliding window: newest pos of head j is ncs[j]*C + wls[j] - 1; a
        # pool column at global token ci*C + tcol is live iff it lies within
        # the last ``window`` positions of its own sequence.
        tcol = jax.lax.broadcasted_iota(jnp.int32, (1, HC), 1) % C
        low_col = jnp.zeros((1, HC), jnp.int32)
        for j in range(hpb):
            low_col = low_col + jnp.where(
                hcol == j, ncs[j] * C + wls[j] - 1 - window, 0)

    def online(s, vmat, vs_hg=None):
        m_old = m_ref[:].reshape(HG, 128)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new[:, :1])
        corr = jnp.exp(m_old - m_new)
        l_ref[:] = (l_ref[:].reshape(HG, 128) * corr
                    + jnp.sum(p, axis=-1, keepdims=True)).reshape(l_ref.shape)
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), vmat,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if vs_hg is not None:
            pv = pv * vs_hg
        acc_ref[:] = (acc_ref[:].reshape(HG, D) * corr[:, :D]
                      + pv).reshape(acc_ref.shape)
        m_ref[:] = m_new.reshape(m_ref.shape)

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < nc_max)
        def _():
            copy((ci + 1) % 2, ci + 1).start()

        @pl.when((ci + 1 == nc_max) & (n_wtiles > 0))
        def _():
            wcopy(0, 0, 0).start()
            wcopy(0, 0, 1).start()

        copy(slot, ci).wait()
        kd = _expand_stream_rows_batched(buf[slot], kfmt, hpb, 0)
        vd = _expand_stream_rows_batched(buf[slot], vfmt, hpb, KR)
        if quant:
            qk = (q_all.astype(jnp.float32)
                  * _bcast_heads(ks_ref[0, ci], hpb, G8)).astype(jnp.bfloat16)
        else:
            qk = q_all
        s = jax.lax.dot_general(qk, kd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = blk & (ci < nc_col)
        if window is not None:
            mask = mask & ((ci * C + tcol) > low_col)
        s = jnp.where(mask, s, -1e30)
        online(s, vd, _bcast_heads(vs_ref[0, ci], hpb, G8) if quant else None)
        return 0

    jax.lax.fori_loop(0, nc_max, chunk_body, 0)

    # dynamic-length window tiles, per-head lengths.  STATIC unroll (NW is
    # small) so window-score tiles can be stored at static scratch indices
    # for the probs epilogue; pl.when skips dead tiles' DMAs and compute.
    whq = jax.lax.broadcasted_iota(jnp.int32, (HG, HW), 0) // G8
    whk = jax.lax.broadcasted_iota(jnp.int32, (HG, HW), 1) // wt
    wpos_c = jax.lax.broadcasted_iota(jnp.int32, (HG, HW), 1) % wt
    wblk = whq == whk
    hcol_w = jax.lax.broadcasted_iota(jnp.int32, (1, HW), 1) // wt
    wl_col = jnp.zeros((1, HW), jnp.int32)
    for j in range(hpb):
        wl_col = wl_col + jnp.where(hcol_w == j, wls[j], 0)

    for wi in range(NW):
        @pl.when(wi < n_wtiles)
        def _(wi=wi):
            if wi + 1 < NW:   # static guard: the copy is CONSTRUCTED at
                # trace time even under pl.when; wi+1 == NW is out of bounds
                @pl.when(wi + 1 < n_wtiles)
                def _():
                    wcopy((wi + 1) % 2, wi + 1, 0).start()
                    wcopy((wi + 1) % 2, wi + 1, 1).start()

            wcopy(wi % 2, wi, 0).wait()
            wcopy(wi % 2, wi, 1).wait()
            kw_all = wbuf[wi % 2, 0].reshape(HW, D)
            vw_all = wbuf[wi % 2, 1].reshape(HW, D)
            s = jax.lax.dot_general(q_all, kw_all, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(wblk & ((wi * wt + wpos_c) < wl_col), s, -1e30)
            if want_probs:
                ws_ref[wi] = s
            online(s, vw_all)

    # nc == 0 and win_len == 0 leaves l == 0; clamp to avoid 0/0
    l1 = jnp.maximum(l_ref[:].reshape(HG, 128)[:, :1], 1e-30)
    out_ref[:] = (acc_ref[:].reshape(HG, D) / l1).reshape(out_ref.shape)
    m_out[:] = m_ref[:, :, :1]
    l_out[:] = l_ref[:, :, :1]
    if want_probs:
        _probs_epilogue(probs_ref, ws_ref, m_ref[:].reshape(HG, 128)[:, :1],
                        l1, NW, hpb, G8, gsize, wt)


def fused_sparse_decode_attention_v6ps(q, kv_pool, k_win, v_win, n_chunks,
                                       win_len, kfmt: ChunkFormat,
                                       vfmt: ChunkFormat, max_chunks: int,
                                       li=None, hpb: int = 16, wt: int = 96,
                                       window: int | None = None,
                                       return_win_probs: bool = False,
                                       kscales=None, vscales=None):
    """Per-slot fused decode: n_chunks [B], win_len [B] vectors (continuous
    batching), pools AND the dense residual window both consumed in-kernel
    (per-head window trip counts — short slots' dead window bytes are never
    fetched).  Any Hkv is supported (the reference kernel handles arbitrary
    head counts via group_id, SpMM_Kernel.cuh:174-185; here the grid block
    size adapts, _pick_hpb).

    Stacked form (production): kv_pool [L, mc, BH, ROWS, 128] int16,
    k_win/v_win [L, BH, Wcap, D], li int32 layer index — the kernel DMAs
    from the full stacked state, nothing layer-sized materializes.
    Per-layer form (li=None, tests): kv_pool [mc, BH, ...], k_win/v_win
    [B, Hkv, Wcap, D].

    ``window``: mask pool chunks to the per-sequence sliding window (Mistral
    semantics, reference mistral_mustafar_Kt_Mag_Vt_Mag.py:983-989).
    ``return_win_probs``: also return the post-softmax window-column weights
    folded over the query group, [B, Hkv, Wcap] fp32 (Opa scoring) — emitted
    from the in-kernel window scores, no XLA re-read of k_win.
    bitmap-q8 (kfmt.qbits == 8): pass kscales/vscales [(L,) mc, BH, D]."""
    B, _, Hq, D = q.shape
    quant = kfmt.qbits == 8
    assert quant == (kscales is not None) == (vscales is not None)
    if li is None:
        Hkv = k_win.shape[1]
        BH = B * Hkv
        kv_pool = kv_pool[None]
        k_win = k_win.reshape(BH, *k_win.shape[2:])[None]
        v_win = v_win.reshape(BH, *v_win.shape[2:])[None]
        if quant:
            kscales, vscales = kscales[None], vscales[None]
        li = jnp.int32(0)
    else:
        BH = k_win.shape[1]
        Hkv = BH // B
    k_win = k_win.astype(jnp.bfloat16)
    v_win = v_win.astype(jnp.bfloat16)
    W = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    hpb = _pick_hpb(BH, hpb, align8=quant)
    NB = BH // hpb
    ROWS = kfmt.stream_rows + vfmt.stream_rows
    L = kv_pool.shape[0]
    assert kv_pool.shape == (L, max_chunks, BH, ROWS, 128), kv_pool.shape
    assert n_chunks.shape == (B,) and win_len.shape == (B,)
    wt = _window_tile(W, wt)
    NW = W // wt
    HG = hpb * G8

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg.reshape(BH, G, D), ((0, 0), (0, G8 - G), (0, 0)))
    qb = qpad.astype(jnp.bfloat16)

    scalars = jnp.concatenate([n_chunks.astype(jnp.int32),
                               win_len.astype(jnp.int32),
                               jnp.asarray(li, jnp.int32)[None]])
    fixed = lambda shape: pl.BlockSpec(shape, lambda b, sref: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                fixed((hpb, G8, D))]
    args = [kv_pool, k_win, v_win, qb]
    if quant:
        sspec = pl.BlockSpec((1, max_chunks, hpb, D),
                             lambda b, sref, _B=B: (sref[2 * _B], 0, b, 0),
                             memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        args += [kscales.astype(jnp.bfloat16), vscales.astype(jnp.bfloat16)]
    out_specs = [pl.BlockSpec((hpb, G8, D), lambda b, sref: (b, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((hpb, G8, 1), lambda b, sref: (b, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((hpb, G8, 1), lambda b, sref: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((BH, G8, D), jnp.float32),
                 jax.ShapeDtypeStruct((BH, G8, 1), jnp.float32),
                 jax.ShapeDtypeStruct((BH, G8, 1), jnp.float32)]
    scratch = [
        pltpu.VMEM((2, hpb, ROWS, 128), jnp.int16),
        pltpu.VMEM((2, 2, hpb, wt, D), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.VMEM((hpb, G8, 128), jnp.float32),
        pltpu.VMEM((hpb, G8, 128), jnp.float32),
        pltpu.VMEM((hpb, G8, D), jnp.float32),
    ]
    if return_win_probs:
        out_specs.append(pl.BlockSpec((1, NW, hpb, wt),
                                      lambda b, sref: (b, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((NB, NW, hpb, wt), jnp.float32))
        scratch.append(pltpu.VMEM((NW, HG, hpb * wt), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        functools.partial(_fused_v6ps_kernel, kfmt=kfmt, vfmt=vfmt, hpb=hpb,
                          hkv=Hkv, nslots=B, NW=NW, wt=wt, gsize=G,
                          scale=float(1.0 / np.sqrt(D)), window=window,
                          want_probs=return_win_probs),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(scalars, *args)
    out = res[0][:, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)
    if not return_win_probs:
        return out
    return out, _fold_probs(res[3], B, Hkv, W)


# ---------------------------------------------------------------------------
# Segment kernel: multi-query-row attention over the compressed pools
# (chunked prefill).  A whole prompt segment (Tseg tokens x G group rows)
# attends to every packed chunk; returns flash partials (acc, m, l) that the
# caller merges with the dense-window part and the causal self-segment part.
# Pool tokens all precede the segment, so no causal masking here.
#
# Unlike decode (1 query row, latency-bound), the q block is [Tseg*G, D]
# (>= 256 rows) — the MXU is well fed per head, so the grid is one step per
# kv-head with an F-chunk-deep DMA pipeline (F chunks per async copy to
# amortize issue cost over ~49 KB x F transfers).
# ---------------------------------------------------------------------------

def _fused_seg_kernel(scalars_ref, pool_hbm, q_ref, *refs,
                      kfmt: ChunkFormat, vfmt: ChunkFormat,
                      fdepth: int, gsize: int, scale: float, shpb: int,
                      window: int | None = None):
    quant = kfmt.qbits == 8
    refs = list(refs)
    if quant:
        ks_ref = refs.pop(0)
        vs_ref = refs.pop(0)
    out_ref, m_out, l_out, buf, sems = refs
    nc = scalars_ref[0]
    seg_start = scalars_ref[1]
    li = scalars_ref[2]
    bh = pl.program_id(0)
    D, C = kfmt.dim, kfmt.chunk
    KR = kfmt.stream_rows
    QR = q_ref.shape[1]                       # blocks are [1, QR, .]
    if quant:
        # scale blocks hold shpb heads' rows; pick ours in-register (dynamic
        # sublane indexing is illegal on real TPU)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (shpb, D), 0)
                  == bh % shpb)

        def _sel(ref, ci):
            return jnp.sum(
                jnp.where(onehot, ref[0, ci].astype(jnp.float32), 0.0),
                axis=0)

    n_fetch = (nc + fdepth - 1) // fdepth

    def copy(slot, fi):
        return pltpu.make_async_copy(
            pool_hbm.at[li, pl.ds(fi * fdepth, fdepth), bh], buf.at[slot],
            sems.at[slot])

    @pl.when(nc > 0)
    def _():
        copy(0, 0).start()

    q_all = q_ref[0]                                            # [QR, D]
    m = jnp.full((QR, 128), -1e30, jnp.float32)
    l = jnp.zeros((QR, 128), jnp.float32)
    acc = jnp.zeros((QR, D), jnp.float32)
    tcol = jax.lax.broadcasted_iota(jnp.int32, (QR, C), 1)

    def fetch_body(fi, carry):
        m, l, acc = carry
        slot = fi % 2

        @pl.when(fi + 1 < n_fetch)
        def _():
            copy((fi + 1) % 2, fi + 1).start()

        copy(slot, fi).wait()
        for j in range(fdepth):
            ci = fi * fdepth + j
            kd = _expand_stream_rows(buf[slot, j, :KR], kfmt)    # [C, D]
            vd = _expand_stream_rows(buf[slot, j, KR:], vfmt)
            if quant:
                qk = (q_all.astype(jnp.float32)
                      * _sel(ks_ref, ci)).astype(jnp.bfloat16)
            else:
                qk = q_all
            s = jax.lax.dot_general(qk, kd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            mask = jnp.full((QR, C), ci < nc)
            if window is not None:
                # query row r = t*gsize + g sits at position seg_start + t;
                # a pool column at token ci*C + tcol is live iff within the
                # last ``window`` positions of that query.
                qpos = (seg_start
                        + jax.lax.broadcasted_iota(jnp.int32, (QR, C), 0)
                        // gsize)
                mask = mask & ((ci * C + tcol) > (qpos - window))
            s = jnp.where(mask, s, -1e30)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new[:, :1])
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(jnp.bfloat16), vd,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if quant:
                pv = pv * _sel(vs_ref, ci)
            acc = acc * corr[:, :D] + pv
            m = m_new
        return m, l, acc

    m, l, acc = jax.lax.fori_loop(0, n_fetch, fetch_body, (m, l, acc))
    out_ref[0] = acc
    m_out[0] = m[:, :1]
    l_out[0] = l[:, :1]


def fused_sparse_segment_attention(q_seg, kv_pool, n_chunks, seg_start,
                                   kfmt: ChunkFormat, vfmt: ChunkFormat,
                                   max_chunks: int, li=None, fdepth: int = 4,
                                   window: int | None = None,
                                   kscales=None, vscales=None):
    """Segment (chunked-prefill) attention partials over the pools.

    q_seg [B, Tseg, Hq, D]; kv_pool [(L,) mc, BH, ROWS, 128] int16
    (encode_stream rows) with li an int32 layer index for the stacked form;
    n_chunks, seg_start int32 scalars.  Returns flash partials
    (acc [B, Tseg, Hq, D] f32, m [B, Tseg, Hq, 1] f32, l [B, Tseg, Hq, 1] f32)
    over the packed chunks only — the caller merges window + causal-self
    parts (ops.attention.merge_partials).  TPU analogue of the reference's
    flash prefill boundary (llama_mustafar_Kt_Mag_Vt_Mag.py:1034-1037), but
    against the compressed past instead of a dense one.

    bitmap-q8 (kfmt.qbits == 8): pass kscales/vscales [(L,) mc, BH, D]; the
    per-channel scales fold into q and the pv partial per chunk.
    """
    B, Tseg, Hq, D = q_seg.shape
    quant = kfmt.qbits == 8
    assert quant == (kscales is not None) == (vscales is not None)
    if li is None:
        kv_pool = kv_pool[None]
        if quant:
            kscales, vscales = kscales[None], vscales[None]
        li = jnp.int32(0)
    L = kv_pool.shape[0]
    BH = kv_pool.shape[2]
    Hkv = BH // B
    G = Hq // Hkv
    QR = Tseg * G
    ROWS = kfmt.stream_rows + vfmt.stream_rows
    assert kv_pool.shape == (L, max_chunks, BH, ROWS, 128), kv_pool.shape
    while max_chunks % fdepth:
        fdepth //= 2

    # [B, Tseg, Hkv, G, D] -> [BH, Tseg*G, D] rows t*G + g per kv head
    qg = q_seg.reshape(B, Tseg, Hkv, G, D)
    qb = jnp.transpose(qg, (0, 2, 1, 3, 4)).reshape(BH, QR, D).astype(jnp.bfloat16)

    scalars = jnp.stack([n_chunks.astype(jnp.int32),
                         jnp.asarray(seg_start, jnp.int32),
                         jnp.asarray(li, jnp.int32)])
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, QR, D), lambda b, sref: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [kv_pool, qb]
    shpb = _pick_hpb(BH, 8, align8=True)
    if quant:
        # scale blocks of shpb heads (8-aligned sublane offsets; see
        # quant_attention._q_seg_kernel for the derivation)
        sspec = pl.BlockSpec((1, max_chunks, shpb, D),
                             lambda b, sref, _h=shpb: (sref[2], 0, b // _h, 0),
                             memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        args += [kscales.astype(jnp.bfloat16), vscales.astype(jnp.bfloat16)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, QR, D), lambda b, sref: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, QR, 1), lambda b, sref: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, QR, 1), lambda b, sref: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, fdepth, ROWS, 128), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    acc, m, l = pl.pallas_call(
        functools.partial(_fused_seg_kernel, kfmt=kfmt, vfmt=vfmt,
                          fdepth=fdepth, gsize=G, shpb=shpb,
                          scale=float(1.0 / np.sqrt(D)), window=window),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((BH, QR, D), jnp.float32),
                   jax.ShapeDtypeStruct((BH, QR, 1), jnp.float32),
                   jax.ShapeDtypeStruct((BH, QR, 1), jnp.float32)),
        interpret=_interpret(),
    )(scalars, *args)

    def unfold(x):
        last = x.shape[-1]
        y = x.reshape(B, Hkv, Tseg, G, last)
        return jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(B, Tseg, Hq, last)

    return unfold(acc), unfold(m), unfold(l)


# ---------------------------------------------------------------------------
# v7: uniform-batch fused decode with in-kernel dynamic-length window.
#
# The old XLA window merge always read the full Wcap (= r + C = 288) rows per
# head although win_len averages ~(r + C/2); streaming the window through the
# kernel with a dynamic tile trip count skips the dead tiles (~45% of window
# bytes, which are ~half the decode attention traffic).
# ---------------------------------------------------------------------------

def _fused_v7_kernel(scalars_ref, pool_hbm, kw_hbm, vw_hbm, q_ref, *refs,
                     kfmt: ChunkFormat, vfmt: ChunkFormat,
                     hpb: int, NW: int, wt: int, gsize: int, scale: float,
                     window: int | None = None, want_probs: bool = False):
    # bitmap-q8 capacity codec: per-(chunk, head, channel) scales fold into
    # q before the score matmul and into the pv partial after it (the
    # expanded tiles stay int8 CODES; dequant never materializes)
    quant = kfmt.qbits == 8
    refs = list(refs)
    if quant:
        ks_ref = refs.pop(0)
        vs_ref = refs.pop(0)
    out_ref, m_out, l_out = refs.pop(0), refs.pop(0), refs.pop(0)
    probs_ref = refs.pop(0) if want_probs else None
    buf, wbuf, sems, wsems, m_ref, l_ref, acc_ref = refs[:7]
    ws_ref = refs[7] if want_probs else None
    nc = scalars_ref[0]
    win_len = scalars_ref[1]
    li = scalars_ref[2]
    b = pl.program_id(0)
    h0 = b * hpb
    D, C = kfmt.dim, kfmt.chunk
    KR = kfmt.stream_rows
    G8 = q_ref.shape[1]
    HG = hpb * G8
    HC = hpb * C
    HW = hpb * wt

    def copy(slot, ci):
        return pltpu.make_async_copy(
            pool_hbm.at[li, ci, pl.ds(h0, hpb)], buf.at[slot], sems.at[slot])

    def wcopy(slot, wi, which):
        src = (kw_hbm, vw_hbm)[which]
        return pltpu.make_async_copy(
            src.at[li, pl.ds(h0, hpb), pl.ds(wi * wt, wt)],
            wbuf.at[slot, which], wsems.at[slot, which])

    m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
    l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
    if want_probs:
        ws_ref[:] = jnp.full(ws_ref.shape, -1e30, jnp.float32)

    n_wtiles = (win_len + wt - 1) // wt

    @pl.when(nc > 0)
    def _():
        copy(0, 0).start()

    # every started wcopy MUST be waited — an un-awaited DMA at kernel exit
    # aborts the device; hence the n_wtiles > 0 guards
    @pl.when((nc == 0) & (n_wtiles > 0))
    def _():
        wcopy(0, 0, 0).start()
        wcopy(0, 0, 1).start()

    q_all = q_ref[:].reshape(HG, D)
    hrow_q = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 0) // G8
    hrow_k = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 1) // C
    blk = hrow_q == hrow_k
    tcol = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 1) % C

    def online(s, vmat, vs_hg=None):
        m_old = m_ref[:].reshape(HG, 128)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new[:, :1])
        corr = jnp.exp(m_old - m_new)
        l_ref[:] = (l_ref[:].reshape(HG, 128) * corr
                    + jnp.sum(p, axis=-1, keepdims=True)).reshape(l_ref.shape)
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), vmat,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if vs_hg is not None:
            pv = pv * vs_hg
        acc_ref[:] = (acc_ref[:].reshape(HG, D) * corr[:, :D] + pv).reshape(acc_ref.shape)
        m_ref[:] = m_new.reshape(m_ref.shape)

    def chunk_body(ci, _):
        slot = ci % 2

        @pl.when(ci + 1 < nc)
        def _():
            copy((ci + 1) % 2, ci + 1).start()

        @pl.when((ci + 1 == nc) & (n_wtiles > 0))
        def _():
            wcopy(0, 0, 0).start()
            wcopy(0, 0, 1).start()

        copy(slot, ci).wait()
        kd = _expand_stream_rows_batched(buf[slot], kfmt, hpb, 0)
        vd = _expand_stream_rows_batched(buf[slot], vfmt, hpb, KR)
        if quant:
            qk = (q_all.astype(jnp.float32)
                  * _bcast_heads(ks_ref[0, ci], hpb, G8)).astype(jnp.bfloat16)
        else:
            qk = q_all
        s = jax.lax.dot_general(qk, kd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = blk
        if window is not None:
            low = nc * C + win_len - 1 - window
            mask = mask & ((ci * C + tcol) > low)
        s = jnp.where(mask, s, -1e30)
        online(s, vd, _bcast_heads(vs_ref[0, ci], hpb, G8) if quant else None)
        return 0

    jax.lax.fori_loop(0, nc, chunk_body, 0)

    # dynamic-length window tiles (static unroll; see v6ps)
    whq = jax.lax.broadcasted_iota(jnp.int32, (HG, HW), 0) // G8
    whk = jax.lax.broadcasted_iota(jnp.int32, (HG, HW), 1) // wt
    wpos_l = jax.lax.broadcasted_iota(jnp.int32, (HG, HW), 1) % wt
    wblk = whq == whk

    for wi in range(NW):
        @pl.when(wi < n_wtiles)
        def _(wi=wi):
            if wi + 1 < NW:   # static guard: the copy is CONSTRUCTED at
                # trace time even under pl.when; wi+1 == NW is out of bounds
                @pl.when(wi + 1 < n_wtiles)
                def _():
                    wcopy((wi + 1) % 2, wi + 1, 0).start()
                    wcopy((wi + 1) % 2, wi + 1, 1).start()

            wcopy(wi % 2, wi, 0).wait()
            wcopy(wi % 2, wi, 1).wait()
            kw_all = wbuf[wi % 2, 0].reshape(HW, D)
            vw_all = wbuf[wi % 2, 1].reshape(HW, D)
            s = jax.lax.dot_general(q_all, kw_all, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(wblk & ((wi * wt + wpos_l) < win_len), s, -1e30)
            if want_probs:
                ws_ref[wi] = s
            online(s, vw_all)

    # nc == 0 and win_len == 0 leaves l == 0; clamp to avoid 0/0
    l1 = jnp.maximum(l_ref[:].reshape(HG, 128)[:, :1], 1e-30)
    out_ref[:] = (acc_ref[:].reshape(HG, D) / l1).reshape(out_ref.shape)
    # final online-softmax stats for Opa window scoring (cache/compressed.py)
    m_out[:] = m_ref[:, :, :1]
    l_out[:] = l_ref[:, :, :1]
    if want_probs:
        _probs_epilogue(probs_ref, ws_ref, m_ref[:].reshape(HG, 128)[:, :1],
                        l1, NW, hpb, G8, gsize, wt)


def fused_sparse_decode_attention_v7(q, kv_pool, k_win, v_win, n_chunks,
                                     win_len, kfmt: ChunkFormat,
                                     vfmt: ChunkFormat, max_chunks: int,
                                     li=None, hpb: int = 16,
                                     window: int | None = None,
                                     wt: int = 96, return_norm: bool = False,
                                     return_win_probs: bool = False,
                                     kscales=None, vscales=None):
    """v7: fully in-kernel uniform-batch decode attention with dynamic window
    length.

    Stacked form (production): kv_pool [L, mc, BH, ROWS, 128] int16,
    k_win/v_win [L, BH, Wcap, D], li int32 layer index.  Per-layer form
    (li=None, tests/benches): kv_pool [mc, BH, ...], k_win/v_win
    [B, Hkv, Wcap, D].

    ``return_norm``: also return the final online-softmax stats (m, l), each
    [B, Hkv, G, 1] fp32 (post-softmax weight at score s is exp(s - m) / l).
    ``return_win_probs``: also return the post-softmax window-column weights
    folded over the query group, [B, Hkv, Wcap] fp32 — computed in-kernel
    from the streamed window tiles (no XLA q.k_win re-read; Opa scoring).

    bitmap-q8 capacity codec (kfmt.qbits == 8): pass per-(chunk, head,
    channel) quantization scales kscales/vscales [(L,) mc, BH, D] bf16;
    the kernel folds them into q and the pv partial."""
    B, _, Hq, D = q.shape
    quant = kfmt.qbits == 8
    assert quant == (kscales is not None) == (vscales is not None)
    if li is None:
        Hkv = k_win.shape[1]
        BH = B * Hkv
        kv_pool = kv_pool[None]
        k_win = k_win.reshape(BH, *k_win.shape[2:])[None]
        v_win = v_win.reshape(BH, *v_win.shape[2:])[None]
        if quant:
            kscales, vscales = kscales[None], vscales[None]
        li = jnp.int32(0)
    else:
        BH = k_win.shape[1]
        Hkv = BH // B
    k_win = k_win.astype(jnp.bfloat16)
    v_win = v_win.astype(jnp.bfloat16)
    W = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    hpb = _pick_hpb(BH, hpb, align8=quant)
    NB = BH // hpb
    ROWS = kfmt.stream_rows + vfmt.stream_rows
    L = kv_pool.shape[0]
    assert kv_pool.shape == (L, max_chunks, BH, ROWS, 128), kv_pool.shape
    wt = _window_tile(W, wt)
    NW = W // wt
    HG = hpb * G8

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg.reshape(BH, G, D), ((0, 0), (0, G8 - G), (0, 0)))
    qb = qpad.astype(jnp.bfloat16)

    scalars = jnp.stack([jnp.asarray(n_chunks, jnp.int32),
                         jnp.asarray(win_len, jnp.int32),
                         jnp.asarray(li, jnp.int32)])
    fixed = lambda shape: pl.BlockSpec(shape, lambda b, sref: (b, 0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                fixed((hpb, G8, D))]
    args = [kv_pool, k_win, v_win, qb]
    if quant:
        sspec = pl.BlockSpec((1, max_chunks, hpb, D),
                             lambda b, sref: (sref[2], 0, b, 0),
                             memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        args += [kscales.astype(jnp.bfloat16), vscales.astype(jnp.bfloat16)]
    out_specs = [pl.BlockSpec((hpb, G8, D), lambda b, sref: (b, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((hpb, G8, 1), lambda b, sref: (b, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((hpb, G8, 1), lambda b, sref: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((BH, G8, D), jnp.float32),
                 jax.ShapeDtypeStruct((BH, G8, 1), jnp.float32),
                 jax.ShapeDtypeStruct((BH, G8, 1), jnp.float32)]
    scratch = [
        pltpu.VMEM((2, hpb, ROWS, 128), jnp.int16),
        pltpu.VMEM((2, 2, hpb, wt, D), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.VMEM((hpb, G8, 128), jnp.float32),
        pltpu.VMEM((hpb, G8, 128), jnp.float32),
        pltpu.VMEM((hpb, G8, D), jnp.float32),
    ]
    if return_win_probs:
        out_specs.append(pl.BlockSpec((1, NW, hpb, wt),
                                      lambda b, sref: (b, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((NB, NW, hpb, wt), jnp.float32))
        scratch.append(pltpu.VMEM((NW, HG, hpb * wt), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        functools.partial(_fused_v7_kernel, kfmt=kfmt, vfmt=vfmt, hpb=hpb,
                          NW=NW, wt=wt, gsize=G,
                          scale=float(1.0 / np.sqrt(D)),
                          window=window, want_probs=return_win_probs),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(scalars, *args)
    out, m_c, l_c = res[0], res[1], res[2]
    out = out[:, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)
    extras = []
    if return_norm:
        extras += [m_c[:, :G].reshape(B, Hkv, G, 1),
                   l_c[:, :G].reshape(B, Hkv, G, 1)]
    if return_win_probs:
        extras.append(_fold_probs(res[3], B, Hkv, W))
    if not extras:
        return out
    return (out, *extras)
