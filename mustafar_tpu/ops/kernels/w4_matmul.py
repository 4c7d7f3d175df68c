"""Pallas TPU matmul over int4-packed weights (W4 decode projections).

Decode is weight-streaming-bound (docs/PERFORMANCE.md): after W8 the next
halving is int4, but two facts force a kernel instead of an XLA dot:

  * the axon PJRT plugin cannot transfer native ``s4`` arrays across jit
    boundaries (layout relayout recurses — measured round 2), and
  * an XLA-level nibble unpack materializes the dequantized bf16 copy,
    which is SLOWER than the plain bf16 dot (measured 335.8 us vs 277.9 vs
    W8's 166.9 at [32,14336]x[14336,4096] device-chained).

So W4 weights are stored as int16 nibble carriers (the proven q8q4 KV-codec
trick, ops/quant_format.py) and this kernel unpacks them in VMEM where the
expansion is pure widen arithmetic that never touches HBM:

  carriers int16 [DIN/4, DOUT]: within each 128-row scale block b, carrier
  row (b*32 + r) holds in-rows (b*128 + j*32 + r) in nibble j — block-LOCAL
  packing so a tensor-parallel shard of the contraction axis (cut at 128-row
  granularity) unpacks entirely from its own shard.

  scales bf16 [DIN/128, DOUT]: per (contraction block, out channel), applied
  to the unpacked tile in VMEM (a dequantized weight never reaches HBM).

The block loop runs in groups of 8 scale rows: Mosaic requires VMEM row
slices to be 8-sublane aligned, so a dynamic single-row scale load cannot
compile — each group loads an aligned [8, OT] slab and a static inner loop
selects its rows.

Reference analogue: the register-level decompress feeding dense MMA tiles
(kernel/csrc/SpMM_Kernel.cuh:109-151) — here for weights instead of KV.
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


def _w4_matmul_kernel(li_ref, x_ref, c_ref, s_ref, out_ref, *, ngroups: int):
    """One DOUT tile: acc[B, OT] = sum_b (x[:, b*128:+128] @ codes_b) * s_b.

    The blocked scale is constant along the block's contraction rows, so it
    commutes past the dot: the MXU consumes RAW int4 codes widened to bf16
    (exact — |code| <= 7) and the scale multiplies the [B, OT] partial in
    f32, which is both cheaper (B*OT vs 128*OT VPU muls per block) and more
    precise than scaling the tile.  li_ref is the scalar-prefetched layer
    index (consumed by the BlockSpec index maps; unused in the body).
    """
    del li_ref

    def group(g, acc):
        s8 = s_ref[0, pl.dslice(g * 8, 8), :].astype(jnp.float32)
        for i in range(8):
            cb = c_ref[0, pl.dslice(g * 256 + i * 32, 32), :]  # [32, OT] i16
            w32 = cb.astype(jnp.int32)
            tile = jnp.concatenate(
                [((w32 << (32 - 4 * (j + 1))) >> 28).astype(jnp.bfloat16)
                 for j in range(4)], axis=0)              # [128, OT] codes
            xb = x_ref[:, pl.dslice(g * 1024 + i * 128, 128)]
            partial = jax.lax.dot_general(
                xb, tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + partial * s8[i:i + 1, :]
        return acc

    acc = jax.lax.fori_loop(
        0, ngroups, group, jnp.zeros(out_ref.shape, jnp.float32))
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def w4_matmul(x: jnp.ndarray, carriers: jnp.ndarray, scales: jnp.ndarray,
              li=None, interpret: bool | None = None) -> jnp.ndarray:
    """x [B, DIN] @ W4 [DIN, DOUT] -> [B, DOUT] (x.dtype).

    carriers int16 [DIN/4, DOUT] block-local nibble layout, scales bf16
    [DIN/128, DOUT] (models/quant.py pack_w4) — or layer-stacked
    [L, DIN/4, DOUT] / [L, DIN/128, DOUT] with ``li`` an int32 layer index:
    the kernel selects the layer via scalar prefetch in the BlockSpec index
    map, so no per-layer carrier copy ever materializes (a dynamic slice
    feeding a pallas_call cannot fuse — measured 40 us/projection/layer).
    B is padded to the 8-sublane floor and DIN to the 1024-lane group size
    internally (zero blocks contribute zero); use for few-token (decode)
    shapes — prefill goes through the transient-dequant XLA path
    (models/quant.py proj).
    """
    B, DIN = x.shape
    DOUT = carriers.shape[-1]
    nb = DIN // 128
    stacked = carriers.ndim == 3
    assert carriers.shape[-2:] == (DIN // 4, DOUT), carriers.shape
    assert scales.shape[-2:] == (nb, DOUT), scales.shape
    ot = _pick_tile(DOUT)
    bp = max(8, (B + 7) // 8 * 8)
    ngroups = (nb + 7) // 8
    dinp = ngroups * 1024
    xp = x.astype(jnp.bfloat16)
    if bp != B or dinp != DIN:
        lead = ((0, 0),) if stacked else ()
        xp = jnp.pad(xp, ((0, bp - B), (0, dinp - DIN)))
        carriers = jnp.pad(carriers, lead + ((0, (dinp - DIN) // 4), (0, 0)))
        scales = jnp.pad(scales, lead + ((0, ngroups * 8 - nb), (0, 0)))
    if not stacked:
        carriers, scales = carriers[None], scales[None]
        li = jnp.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(DOUT // ot,),
        in_specs=[
            pl.BlockSpec((bp, dinp), lambda o, sref: (0, 0)),
            pl.BlockSpec((1, dinp // 4, ot), lambda o, sref: (sref[0], 0, o)),
            pl.BlockSpec((1, ngroups * 8, ot),
                         lambda o, sref: (sref[0], 0, o)),
        ],
        out_specs=pl.BlockSpec((bp, ot), lambda o, sref: (0, o)),
    )
    out = pl.pallas_call(
        functools.partial(_w4_matmul_kernel, ngroups=ngroups),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, DOUT), x.dtype),
        interpret=_interpret() if interpret is None else interpret,
    )(jnp.asarray(li, jnp.int32)[None], xp, carriers,
      scales.astype(jnp.bfloat16))
    return out[:B]
