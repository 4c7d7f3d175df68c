"""Fused prune+quantize+pack Pallas kernel (quant codecs).

The XLA pack path (`sparse_format.topk_mask` -> `quant_format.encode_chunk`)
is ~17 sequential elementwise passes over the chunk in HBM: a 15-round
threshold bisection (one compare+row-reduce pass per magnitude bit), the
exact-keep tie-break, per-channel amax/scale, rounding, and the bitfield
pack.  Round-2 profiling put prune+pack at ~25 % of prefill device time
(docs/PERFORMANCE.md "what remains on the table": ~5.6 ms/layer bisection +
pack fusions at the bench shape).

This kernel does the whole transform VMEM-resident: ONE HBM read of the
bf16 chunk (plus the optional fp32 Opa score), all 15 bisection rounds, the
tie-break rank via the MXU triangular matmul (no cumsum on TPU), masked
per-channel amax -> scales, round-half-even quantization, and the
bitfield pack — then ONE HBM write of the packed int16 rows + scales.

Bit-exact with the XLA path (same exact-keep tie-to-lower-channel rule,
same f32 scale math, same jnp.round), so either can serve either cache.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _prune_quant_pack_kernel(x_ref, *refs, keep: int, bits: int, hpb: int,
                             C: int, D: int, has_score: bool):
    if has_score:
        score_ref, rows_ref, scales_ref = refs
    else:
        (rows_ref, scales_ref) = refs
        score_ref = None
    HC = hpb * C
    x = x_ref[:].reshape(HC, D)                                  # bf16

    # --- magnitude (or Opa score) sort key: monotone non-negative int ---
    if score_ref is None:
        k16 = pltpu.bitcast(x, jnp.int16)
        key = (k16.astype(jnp.int32)) & 0x7FFF                   # |bf16| bits
        kbits = 15
    else:
        s = jnp.abs(score_ref[:].reshape(HC, D))                 # fp32
        key = pltpu.bitcast(s, jnp.int32)
        kbits = 31

    if keep >= D:
        mask = jnp.ones((HC, D), jnp.bool_)
    else:
        # --- per-row exact kth-largest threshold: bitwise binary search ---
        thr = jnp.zeros((HC, 1), jnp.int32)
        for b in reversed(range(kbits)):
            cand = thr | (1 << b)
            cnt = jnp.sum((key >= cand).astype(jnp.int32), axis=-1,
                          keepdims=True)
            thr = jnp.where(cnt >= keep, cand, thr)
        # --- exact-keep mask, ties to lower channel (rank via MXU tri) ---
        above = key > thr
        n_above = jnp.sum(above.astype(jnp.int32), axis=-1, keepdims=True)
        tie = key == thr
        tri = (jax.lax.broadcasted_iota(jnp.int32, (D, D), 0) <=
               jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
               ).astype(jnp.bfloat16)
        tie_rank = jax.lax.dot_general(
            tie.astype(jnp.bfloat16), tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)  # 1-based
        mask = above | (tie & (tie_rank <= (keep - n_above)))

    xf = jnp.where(mask, x.astype(jnp.float32), 0.0)             # pruned f32

    # --- symmetric per-channel quantization over the chunk's tokens ---
    qmax = float(2 ** (bits - 1) - 1)
    amax = jnp.max(jnp.abs(xf).reshape(hpb, C, D), axis=1)       # [hpb, D]
    scales = jnp.maximum(amax / qmax, 1e-8)                      # f32
    # divide (not multiply-by-reciprocal): bit-exact with quant_format
    codes = jnp.clip(jnp.round(xf.reshape(hpb, C, D) / scales[:, None, :]),
                     -qmax, qmax).astype(jnp.int32)

    # --- bitfield pack: token blocks stack along rows (quant_format) ---
    n = 16 // bits
    R = C // n
    fmask = (1 << bits) - 1
    v = jnp.zeros((hpb, R, D), jnp.int32)
    for j in range(n):
        v = v | ((codes[:, j * R:(j + 1) * R, :] & fmask) << (bits * j))
    v16 = ((v << 16) >> 16).astype(jnp.int16)
    rows_ref[:] = v16
    scales_ref[:] = scales.astype(jnp.bfloat16)


def prune_quant_pack(x: jnp.ndarray, keep: int, bits: int,
                     score: jnp.ndarray | None = None, hpb: int = 8):
    """x [BH, C, D] bf16 (unpruned) -> (rows [BH, C/(16/bits), 128] int16,
    scales [BH, D] bf16).  ``score`` [BH, C, D] fp32 non-negative substitutes
    the Opa keep ranking.  Bit-exact with
    ``quant_format.encode_chunk(where(topk_mask(sel, keep), x, 0))``.
    """
    BH, C, D = x.shape
    assert D == 128, D
    hpb = min(hpb, BH)
    while BH % hpb:
        hpb //= 2
    NB = BH // hpb
    R = C // (16 // bits)
    blk = lambda shape: pl.BlockSpec(shape, lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)
    in_specs = [blk((hpb, C, D))]
    args = [x.astype(jnp.bfloat16)]
    if score is not None:
        in_specs.append(blk((hpb, C, D)))
        args.append(score.astype(jnp.float32))
    rows, scales = pl.pallas_call(
        functools.partial(_prune_quant_pack_kernel, keep=keep, bits=bits,
                          hpb=hpb, C=C, D=D, has_score=score is not None),
        grid=(NB,),
        in_specs=in_specs,
        out_specs=(blk((hpb, R, D)),
                   pl.BlockSpec((hpb, D), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((BH, R, D), jnp.int16),
                   jax.ShapeDtypeStruct((BH, D), jnp.bfloat16)),
        interpret=_interpret(),
    )(*args)
    return rows, scales
