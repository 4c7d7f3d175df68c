"""Pallas TPU decode/prefill kernels for the quantized-dense ("q8") codec.

Same fused flash-decoding structure as the bitmap-codec kernels
(ops/kernels/sparse_attention.py v6ps/v7/segment — themselves the TPU
redesign of the reference CUDA SpMV pair, kernel/csrc/SpMM_Kernel.cuh), but
chunk expansion is pure widen arithmetic on the VPU:

    int16 rows -> sign-extending shifts -> concat -> bf16

with NO rank matmul and NO lane gathers (measured to be the entire
sparse-vs-dense gap; see ops/quant_format.py).  Quantization scales are per
(chunk, head, channel): the K scale folds into the query block before the
score matmul, the V scale into the pv partial after it — dequantized chunks
are never materialized.

Entry points mirror the bitmap-codec kernels:

  fused_q_decode_attention      — uniform-batch decode, in-kernel window
  fused_q_decode_attention_ps   — per-slot counts (continuous batching);
                                  pools AND window in-kernel, per-head
                                  window trip counts
  fused_q_segment_attention     — multi-query-row segment over the pools
                                  (chunked prefill), returns flash partials

Both decode kernels can return the post-softmax window-column probabilities
(``return_win_probs``) for output-aware (Opa) scoring, computed in-kernel
from the streamed window tiles.  Any Hkv is supported (block head count
adapts; sparse_attention._pick_hpb).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mustafar_tpu.ops.quant_format import QuantCodec
from mustafar_tpu.ops.kernels.sparse_attention import (
    _pick_hpb, _window_tile, _probs_epilogue, _fold_probs)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _unpack(rows, bits: int):
    """int16 [..., R, 128] -> bf16 [..., R*(16/bits), 128], row == token.

    Sign-extending shift pairs per packed field; token blocks stack along
    the sublane axis (matching quant_format.pack_codes).
    """
    n = 16 // bits
    w = rows.astype(jnp.int32)
    blocks = [(((w << (32 - bits * (j + 1))) >> (32 - bits))
               ).astype(jnp.bfloat16) for j in range(n)]
    return jnp.concatenate(blocks, axis=-2)


def _bcast_heads(s, hpb: int, g8: int):
    """[hpb, D] scale rows -> [hpb*g8, D] (each head row repeated g8x)."""
    D = s.shape[-1]
    return jnp.broadcast_to(s.reshape(hpb, 1, D), (hpb, g8, D)).reshape(
        hpb * g8, D)


# ---------------------------------------------------------------------------
# Uniform-batch fused decode (counterpart of sparse_attention v7)
# ---------------------------------------------------------------------------

def _q_decode_kernel(scalars_ref, pool_hbm, kw_hbm, vw_hbm, ks_ref, vs_ref,
                     q_ref, *refs, codec: QuantCodec, hpb, NW, wt, gsize,
                     fdepth, scale, nslots, window, want_probs):
    refs = list(refs)
    out_ref, m_out, l_out = refs.pop(0), refs.pop(0), refs.pop(0)
    probs_ref = refs.pop(0) if want_probs else None
    buf, wbuf, sems, wsems, m_ref, l_ref, acc_ref = refs[:7]
    ws_ref = refs[7] if want_probs else None
    nc = scalars_ref[0]
    win_len = scalars_ref[1]
    li = scalars_ref[2]        # layer index into the stacked [L, ...] inputs
    b = pl.program_id(0)
    h0 = b * hpb
    D, C = codec.dim, codec.chunk
    KR = codec.k_rows
    VR = codec.v_rows
    G8 = q_ref.shape[1]
    HG = hpb * G8
    HC = hpb * C
    HW = hpb * wt
    F = fdepth
    n_fetch = (nc + F - 1) // F

    def copy(slot, fi):
        return pltpu.make_async_copy(
            pool_hbm.at[li, pl.ds(fi * F, F), pl.ds(h0, hpb)], buf.at[slot],
            sems.at[slot])

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

    for s in range(nslots - 1):
        @pl.when(s < n_fetch)
        def _(s=s):
            copy(s, s).start()

    # every started wcopy MUST be waited by win_body — an un-awaited DMA at
    # kernel exit aborts the device; hence the n_wtiles > 0 guards
    @pl.when((nc == 0) & (n_wtiles > 0))
    def _():
        wcopy(0, 0, 0).start()
        wcopy(0, 0, 1).start()

    q_all = q_ref[:].reshape(HG, D)
    hrow_q = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 0) // G8
    hrow_k = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 1) // C
    blk = hrow_q == hrow_k
    if window is not None:
        tcol = jax.lax.broadcasted_iota(jnp.int32, (1, HC), 1) % C
        low = nc * C + win_len - 1 - window      # oldest live absolute token

    def online(s, vmat, vs_hg):
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

    def fetch_body(fi, _):
        slot = fi % nslots

        @pl.when(fi + (nslots - 1) < n_fetch)
        def _():
            copy((fi + nslots - 1) % nslots, fi + nslots - 1).start()

        @pl.when((fi + 1 == n_fetch) & (n_wtiles > 0))
        def _():
            wcopy(0, 0, 0).start()
            wcopy(0, 0, 1).start()

        copy(slot, fi).wait()
        for j in range(F):
            ci = fi * F + j
            kd = _unpack(buf[slot, j, :, :KR, :], codec.kbits).reshape(HC, D)
            vd = _unpack(buf[slot, j, :, KR:KR + VR, :],
                         codec.vbits).reshape(HC, D)
            qk = (q_all * _bcast_heads(ks_ref[0, ci], hpb, G8)
                  ).astype(jnp.bfloat16)
            s = jax.lax.dot_general(qk, kd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            mask = blk & (ci < nc)
            if window is not None:
                mask = mask & ((ci * C + tcol) > low)
            s = jnp.where(mask, s, -1e30)
            online(s, vd, _bcast_heads(vs_ref[0, ci], hpb, G8))
        return 0

    jax.lax.fori_loop(0, n_fetch, fetch_body, 0)

    # dynamic-length window tiles (static unroll so score tiles can be
    # stored at static scratch indices for the probs epilogue)
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
            online(s, vw_all, None)

    # nc == 0 and win_len == 0 leaves l == 0; clamp to avoid 0/0
    l1 = jnp.maximum(l_ref[:].reshape(HG, 128)[:, :1], 1e-30)
    out_ref[:] = (acc_ref[:].reshape(HG, D) / l1).reshape(out_ref.shape)
    # final online-softmax stats: Opa policies can reconstruct post-softmax
    # weights at any column from (m, l) (cache/compressed.py)
    m_out[:] = m_ref[:, :, :1]
    l_out[:] = l_ref[:, :, :1]
    if want_probs:
        _probs_epilogue(probs_ref, ws_ref, m_ref[:].reshape(HG, 128)[:, :1],
                        l1, NW, hpb, G8, gsize, wt)


def fused_q_decode_attention(q, kv_pool, kscales, vscales, k_win, v_win,
                             n_chunks, win_len, codec: QuantCodec,
                             max_chunks: int, li=None, hpb: int = 8,
                             wt: int = 96, fdepth: int | None = None,
                             nslots: int | None = None,
                             window: int | None = None,
                             return_norm: bool = False,
                             return_win_probs: bool = False):
    """Fused decode over quantized pools, uniform batch.

    ``return_norm``: also return the final online-softmax stats (m, l), each
    [B, Hkv, G, 1] fp32 — post-softmax weights at any column with score s are
    exp(s - m) / l.  ``return_win_probs``: also return the post-softmax
    window-column weights folded over the query group, [B, Hkv, Wcap] fp32,
    computed in-kernel (Opa scoring; no XLA q.k_win re-read).

    Stacked form (the production decode path — no per-layer cache slices are
    ever materialized; the kernel DMAs from the full stacked state at layer
    ``li``): kv_pool [L, mc, BH, stream_rows, 128] int16; kscales/vscales
    [L, mc, BH, D] bf16; k_win/v_win [L, BH, Wcap, D] bf16; li int32 scalar.

    Per-layer form (li=None; kernel unit tests / benches): kv_pool
    [mc, BH, ...]; scales [mc, BH, D]; k_win/v_win [B, Hkv, Wcap, D].

    q [B,1,Hq,D]; n_chunks/win_len int32 scalars.
    """
    B, _, Hq, D = q.shape
    RQ = codec.stream_rows
    if li is None:
        Hkv = k_win.shape[1]
        BH = B * Hkv
        kv_pool = kv_pool[None]
        kscales, vscales = kscales[None], vscales[None]
        k_win = k_win.reshape(BH, *k_win.shape[2:])[None].astype(jnp.bfloat16)
        v_win = v_win.reshape(BH, *v_win.shape[2:])[None].astype(jnp.bfloat16)
        li = jnp.int32(0)
    else:
        BH = k_win.shape[1]
        Hkv = BH // B
        # production caches are bf16 (cast is a no-op); fp32 CPU-parity
        # caches pay one stacked-window cast here
        k_win = k_win.astype(jnp.bfloat16)
        v_win = v_win.astype(jnp.bfloat16)
    W = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    hpb = _pick_hpb(BH, hpb, align8=True)
    NB = BH // hpb
    L = kv_pool.shape[0]
    assert kv_pool.shape == (L, max_chunks, BH, RQ, 128), kv_pool.shape
    if fdepth is None:
        # Measured on v5e (device-time sweep, docs/PERFORMANCE.md): shallow
        # pools want single-chunk fetches with 3 slots (issue/compute overlap
        # on every chunk: -29% at mc=4, -8% at mc=12); deep pools want
        # grouped fetches (fewer issue+wait rounds: fd4 best at mc>=24, fd1
        # +6% at mc=40).  Crossover sits between 12 and 24 chunks.
        fdepth, nslots = (1, 3) if max_chunks <= 16 else (4, 2)
    if nslots is None:
        nslots = 2
    while max_chunks % fdepth:
        fdepth //= 2
    # more slots than fetch groups would index pool_hbm out of bounds at
    # trace time in the static prefetch loop (pl.ds(s*fdepth, fdepth))
    nslots = max(1, min(nslots, max_chunks // fdepth))
    wt = _window_tile(W, wt)
    NW = W // wt
    HG = hpb * G8

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg.reshape(BH, G, D), ((0, 0), (0, G8 - G), (0, 0)))
    qb = qpad.astype(jnp.bfloat16)

    scalars = jnp.stack([jnp.asarray(n_chunks, jnp.int32),
                         jnp.asarray(win_len, jnp.int32),
                         jnp.asarray(li, jnp.int32)])
    sspec = pl.BlockSpec((1, max_chunks, hpb, D),
                         lambda b, sref: (sref[2], 0, b, 0),
                         memory_space=pltpu.VMEM)
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
        pltpu.VMEM((nslots, fdepth, hpb, RQ, 128), jnp.int16),
        pltpu.VMEM((2, 2, hpb, wt, D), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((nslots,)),
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  sspec, sspec,
                  pl.BlockSpec((hpb, G8, D), lambda b, sref: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        functools.partial(_q_decode_kernel, codec=codec, hpb=hpb, NW=NW,
                          wt=wt, gsize=G, fdepth=fdepth,
                          scale=float(1.0 / np.sqrt(D)),
                          nslots=nslots, window=window,
                          want_probs=return_win_probs),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(scalars, kv_pool, k_win, v_win, kscales, vscales, qb)
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


# ---------------------------------------------------------------------------
# Per-slot fused decode (counterpart of sparse_attention v6ps)
# ---------------------------------------------------------------------------

def _q_ps_kernel(scalars_ref, pool_hbm, kw_hbm, vw_hbm, ks_ref, vs_ref,
                 q_ref, *refs, codec: QuantCodec, hpb, hkv, nslots, NW, wt,
                 gsize, scale, window, want_probs):
    refs = list(refs)
    out_ref, m_out, l_out = refs.pop(0), refs.pop(0), refs.pop(0)
    probs_ref = refs.pop(0) if want_probs else None
    buf, wbuf, sems, wsems, m_ref, l_ref, acc_ref = refs[:7]
    ws_ref = refs[7] if want_probs else None
    b = pl.program_id(0)
    h0 = b * hpb
    D, C = codec.dim, codec.chunk
    KR = codec.k_rows
    VR = codec.v_rows
    G8 = q_ref.shape[1]
    HG = hpb * G8
    HC = hpb * C
    HW = hpb * wt

    ncs = [scalars_ref[(h0 + j) // hkv] for j in range(hpb)]
    wls = [scalars_ref[nslots + (h0 + j) // hkv] for j in range(hpb)]
    li = scalars_ref[2 * nslots]   # layer index into the stacked state
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
        ws_ref[:] = jnp.full(ws_ref.shape, -1e30, jnp.float32)

    @pl.when(nc_max > 0)
    def _():
        copy(0, 0).start()

    @pl.when((nc_max == 0) & (n_wtiles > 0))
    def _():
        wcopy(0, 0, 0).start()
        wcopy(0, 0, 1).start()

    q_all = q_ref[:].reshape(HG, D)
    hrow_q = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 0) // G8
    hrow_k = jax.lax.broadcasted_iota(jnp.int32, (HG, HC), 1) // C
    blk = hrow_q == hrow_k
    hcol = jax.lax.broadcasted_iota(jnp.int32, (1, HC), 1) // C
    nc_col = jnp.zeros((1, HC), jnp.int32)
    for j in range(hpb):
        nc_col = nc_col + jnp.where(hcol == j, ncs[j], 0)
    if window is not None:
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
        kd = _unpack(buf[slot][:, :KR, :], codec.kbits).reshape(HC, D)
        vd = _unpack(buf[slot][:, KR:KR + VR, :], codec.vbits).reshape(HC, D)
        qk = (q_all * _bcast_heads(ks_ref[0, ci], hpb, G8)).astype(jnp.bfloat16)
        s = jax.lax.dot_general(qk, kd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = blk & (ci < nc_col)
        if window is not None:
            mask = mask & ((ci * C + tcol) > low_col)
        s = jnp.where(mask, s, -1e30)
        online(s, vd, _bcast_heads(vs_ref[0, ci], hpb, G8))
        return 0

    jax.lax.fori_loop(0, nc_max, chunk_body, 0)

    # per-head dynamic-length window tiles (static unroll; see v6ps)
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

    l1 = jnp.maximum(l_ref[:].reshape(HG, 128)[:, :1], 1e-30)
    out_ref[:] = (acc_ref[:].reshape(HG, D) / l1).reshape(out_ref.shape)
    m_out[:] = m_ref[:, :, :1]
    l_out[:] = l_ref[:, :, :1]
    if want_probs:
        _probs_epilogue(probs_ref, ws_ref, m_ref[:].reshape(HG, 128)[:, :1],
                        l1, NW, hpb, G8, gsize, wt)


def fused_q_decode_attention_ps(q, kv_pool, kscales, vscales, k_win, v_win,
                                n_chunks, win_len, codec: QuantCodec,
                                max_chunks: int, li=None, hpb: int = 16,
                                wt: int = 96, window: int | None = None,
                                return_win_probs: bool = False):
    """Per-slot decode over quantized pools: n_chunks/win_len are [B] vectors
    (continuous batching).  Pools AND the dense residual window stream
    in-kernel with per-head window trip counts (same structure as
    sparse_attention.fused_sparse_decode_attention_v6ps); any Hkv.

    ``return_win_probs``: also return the post-softmax weights of the window
    columns, folded over the query group — [B, Hkv, Wcap] fp32 (Opa scoring),
    computed in-kernel from the streamed window tiles.

    Stacked form (production): kv_pool/kscales/vscales [L, mc, BH, ...],
    k_win/v_win [L, BH, Wcap, D], li an int32 layer index — no per-layer
    slice is materialized.  Per-layer form (li=None): pool [mc, BH, ...],
    k_win/v_win [B, Hkv, Wcap, D]."""
    B, _, Hq, D = q.shape
    RQ = codec.stream_rows
    if li is None:
        Hkv = k_win.shape[1]
        BH = B * Hkv
        kv_pool = kv_pool[None]
        kscales, vscales = kscales[None], vscales[None]
        k_win = k_win.reshape(BH, *k_win.shape[2:])[None]
        v_win = v_win.reshape(BH, *v_win.shape[2:])[None]
        li = jnp.int32(0)
    else:
        BH = k_win.shape[1]
        Hkv = BH // B
    k_win = k_win.astype(jnp.bfloat16)
    v_win = v_win.astype(jnp.bfloat16)
    W = k_win.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    hpb = _pick_hpb(BH, hpb, align8=True)
    NB = BH // hpb
    L = kv_pool.shape[0]
    assert kv_pool.shape == (L, max_chunks, BH, RQ, 128), kv_pool.shape
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
    sspec = pl.BlockSpec((1, max_chunks, hpb, D),
                         lambda b, sref, _B=B: (sref[2 * _B], 0, b, 0),
                         memory_space=pltpu.VMEM)
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
        pltpu.VMEM((2, hpb, RQ, 128), jnp.int16),
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  sspec, sspec,
                  pl.BlockSpec((hpb, G8, D), lambda b, sref: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    res = pl.pallas_call(
        functools.partial(_q_ps_kernel, codec=codec, hpb=hpb, hkv=Hkv,
                          nslots=B, NW=NW, wt=wt, gsize=G,
                          scale=float(1.0 / np.sqrt(D)),
                          window=window, want_probs=return_win_probs),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(scalars, kv_pool, k_win, v_win, kscales, vscales, qb)
    out = res[0][:, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)
    if not return_win_probs:
        return out
    return out, _fold_probs(res[3], B, Hkv, W)


# ---------------------------------------------------------------------------
# Segment kernel (chunked prefill) over quantized pools
# ---------------------------------------------------------------------------

def _q_seg_kernel(scalars_ref, pool_hbm, ks_ref, vs_ref, q_ref, out_ref,
                  m_out, l_out, buf, sems, *, codec: QuantCodec, fdepth,
                  gsize, scale, window, hpb):
    nc = scalars_ref[0]
    seg_start = scalars_ref[1]
    li = scalars_ref[2]        # layer index into the stacked pool/scales
    bh = pl.program_id(0)
    # ks_ref/vs_ref blocks hold hpb heads' scale rows; pick ours in-register
    # (dynamic sublane indexing is illegal on real TPU).
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (hpb, codec.dim), 0)
              == bh % hpb)

    def _sel(ref, ci):
        return jnp.sum(jnp.where(onehot, ref[0, ci].astype(jnp.float32), 0.0),
                       axis=0)
    D, C = codec.dim, codec.chunk
    KR = codec.k_rows
    VR = codec.v_rows
    QR = q_ref.shape[1]

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
            kd = _unpack(buf[slot, j, :KR], codec.kbits)         # [C, D]
            vd = _unpack(buf[slot, j, KR:KR + VR], codec.vbits)
            qk = (q_all * _sel(ks_ref, ci)).astype(jnp.bfloat16)
            s = jax.lax.dot_general(qk, kd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            mask = jnp.full((QR, C), ci < nc)
            if window is not None:
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
            pv = pv * _sel(vs_ref, ci)
            acc = acc * corr[:, :D] + pv
            m = m_new
        return m, l, acc

    m, l, acc = jax.lax.fori_loop(0, n_fetch, fetch_body, (m, l, acc))
    out_ref[0] = acc
    m_out[0] = m[:, :1]
    l_out[0] = l[:, :1]


def fused_q_segment_attention(q_seg, kv_pool, kscales, vscales, n_chunks,
                              seg_start, codec: QuantCodec, max_chunks: int,
                              li=None, fdepth: int = 4,
                              window: int | None = None):
    """Segment (chunked-prefill) partials over quantized pools.

    Same contract as sparse_attention.fused_sparse_segment_attention:
    returns flash partials (acc, m, l) over the packed chunks only.
    kv_pool/kscales/vscales: stacked [L, mc, BH, ...] with li an int32 layer
    index, or per-layer [mc, BH, ...] with li=None.
    """
    B, Tseg, Hq, D = q_seg.shape
    if li is None:
        kv_pool = kv_pool[None]
        kscales, vscales = kscales[None], vscales[None]
        li = jnp.int32(0)
    L = kv_pool.shape[0]
    Hkv = kv_pool.shape[2] // B
    G = Hq // Hkv
    BH = B * Hkv
    QR = Tseg * G
    RQ = codec.stream_rows
    assert kv_pool.shape == (L, max_chunks, BH, RQ, 128), kv_pool.shape
    while max_chunks % fdepth:
        fdepth //= 2

    qg = q_seg.reshape(B, Tseg, Hkv, G, D)
    qb = jnp.transpose(qg, (0, 2, 1, 3, 4)).reshape(BH, QR, D).astype(jnp.bfloat16)

    scalars = jnp.stack([n_chunks.astype(jnp.int32),
                         jnp.asarray(seg_start, jnp.int32),
                         jnp.asarray(li, jnp.int32)])
    # Scales arrive [mc, BH, D].  A per-bh (mc, 1, D) block lands the bh
    # offset on the sublane axis — not 8-aligned on real TPU (interpret mode
    # doesn't check; see CLAUDE.md).  Block hpb=8 heads per block like the
    # decode kernels (8-aligned offsets), keep the dynamic chunk index on the
    # untiled leading dim, and one-hot-select this grid step's head row
    # in-register inside the kernel.
    hpb = _pick_hpb(BH, 8, align8=True)
    sspec = pl.BlockSpec((1, max_chunks, hpb, D),
                         lambda b, sref, _h=hpb: (sref[2], 0, b // _h, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), sspec, sspec,
                  pl.BlockSpec((1, QR, D), lambda b, sref: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, QR, D), lambda b, sref: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, QR, 1), lambda b, sref: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, QR, 1), lambda b, sref: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, fdepth, RQ, 128), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    acc, m, l = pl.pallas_call(
        functools.partial(_q_seg_kernel, codec=codec, fdepth=fdepth, gsize=G,
                          scale=float(1.0 / np.sqrt(D)), window=window,
                          hpb=hpb),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((BH, QR, D), jnp.float32),
                   jax.ShapeDtypeStruct((BH, QR, 1), jnp.float32),
                   jax.ShapeDtypeStruct((BH, QR, 1), jnp.float32)),
        interpret=_interpret(),
    )(scalars, kv_pool, kscales, vscales, qb)

    def unfold(x):
        last = x.shape[-1]
        y = x.reshape(B, Hkv, Tseg, G, last)
        return jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(B, Tseg, Hq, last)

    return unfold(acc), unfold(m), unfold(l)
