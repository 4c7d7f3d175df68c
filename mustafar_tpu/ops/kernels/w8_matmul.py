"""Pallas TPU matmul over int8 weights (W8 decode projections).

The XLA weight-only form ``(x @ w_i8.astype(bf16)) * s`` measures 163 us at
[32,14336]x[14336,4096] against a 79 us HBM ideal, and the XLA W8A8 int8
dot is no better (175 us) — the int8 operand is widened on the VPU in both
lowerings (benchmarks/bench_w8_matmul.py).  This kernel streams the int8
weight tile into VMEM and feeds the MXU directly:

  * ``w8a8`` path (default when given int8 activations): s8 x s8 -> s32
    ``dot_general`` — no widen of the weight stream at all; the per-token
    activation scale and per-out-channel weight scale apply to the [B, OT]
    accumulator, f32.
  * ``w8`` path (bf16 activations): in-VMEM widen + bf16 dot, the W4
    kernel's structure without the nibble unpack (w4_matmul.py).

Layer-stacked weights use the same scalar-prefetch indexing as the W4
kernel so no per-layer carrier copy materializes.  Few-token (decode)
shapes only; prefill stays on the XLA dot (MXU-utilization-bound, where
the transient widen amortizes).

Reference analogue: the dense-tile cp.async -> MMA pipeline
(kernel/csrc/MatMulUtilities.cuh:39-130) — double-buffered HBM->VMEM tile
streaming feeding the systolic array, with the dequant kept on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tile(dout: int) -> int:
    for t in (1024, 512, 384, 256, 128):
        if dout % t == 0:
            return t
    raise ValueError(f"DOUT={dout} must be a multiple of 128")


def _w8_kernel(li_ref, x_ref, w_ref, s_ref, out_ref, *, nblocks: int,
               block: int, int8_acts: bool):
    """One DOUT tile: acc[B, OT] = sum_b x[:, b*blk:+blk] @ w_b, scaled.

    int8_acts: both operands int8 -> s32 MXU accumulate (no VPU widen);
    otherwise the weight block widens to bf16 in VMEM (never HBM).
    """
    def body(b, acc):
        wb = w_ref[0, pl.dslice(b * block, block), :]
        xb = x_ref[:, pl.dslice(b * block, block)]
        if int8_acts:
            part = jax.lax.dot_general(
                xb, wb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            part = jax.lax.dot_general(
                xb, wb.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc + part

    acc0 = jnp.zeros(out_ref.shape, jnp.int32 if int8_acts else jnp.float32)
    acc = jax.lax.fori_loop(0, nblocks, body, acc0)
    out_ref[...] = (acc.astype(jnp.float32)
                    * s_ref[0, 0, :].astype(jnp.float32)[None, :])


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def w8_matmul(x: jnp.ndarray, w: jnp.ndarray, s: jnp.ndarray, li=None,
              interpret: bool | None = None, block: int = 512) -> jnp.ndarray:
    """x [B, DIN] @ W8 [DIN, DOUT] -> f32 [B, DOUT] (times per-channel s).

    x int8 (W8A8: caller quantized activations, applies its per-token
    scale to the f32 result) or bf16 (weight-only W8).  w int8 [DIN, DOUT]
    or layer-stacked [L, DIN, DOUT] with ``li``; s f32 [DOUT] / [L, DOUT].
    """
    B, DIN = x.shape
    DOUT = w.shape[-1]
    stacked = w.ndim == 3
    assert w.shape[-2] == DIN, (w.shape, DIN)
    int8_acts = x.dtype == jnp.int8
    ot = _pick_tile(DOUT)
    bp = max(8, (B + 7) // 8 * 8)
    dinp = (DIN + block - 1) // block * block
    xp = x if int8_acts else x.astype(jnp.bfloat16)
    if bp != B or dinp != DIN:
        lead = ((0, 0),) if stacked else ()
        xp = jnp.pad(xp, ((0, bp - B), (0, dinp - DIN)))
        w = jnp.pad(w, lead + ((0, dinp - DIN), (0, 0)))
    if not stacked:
        w, s = w[None], s[None]
        li = jnp.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(DOUT // ot,),
        in_specs=[
            pl.BlockSpec((bp, dinp), lambda o, sref: (0, 0)),
            pl.BlockSpec((1, dinp, ot), lambda o, sref: (sref[0], 0, o)),
            pl.BlockSpec((1, 1, ot), lambda o, sref: (sref[0], 0, o)),
        ],
        out_specs=pl.BlockSpec((bp, ot), lambda o, sref: (0, o)),
    )
    out = pl.pallas_call(
        functools.partial(_w8_kernel, nblocks=dinp // block, block=block,
                          int8_acts=int8_acts),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, DOUT), jnp.float32),
        interpret=_interpret() if interpret is None else interpret,
    )(jnp.asarray(li, jnp.int32)[None], xp, w,
      s.reshape(s.shape[0], 1, DOUT).astype(jnp.float32))
    return out[:B]
