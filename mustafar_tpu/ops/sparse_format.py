"""Static-shape compressed sparse KV format (TPU redesign of the reference's
bitmap format, kernel/compression.py).

The reference stores, per 64-element tile, an int64 bitmap + a variable-length
packed fp16 run (8-half aligned) + cumulative offsets — shapes depend on data,
with host syncs to size buffers (compression.py:294-335).  Under XLA every
shape must be static, so we redesign around three facts of TPU hardware:

1. pruning keeps an **exact** top-``keep`` per token row (ties broken by lower
   channel index), so a chunk of C tokens always packs to exactly ``C * keep``
   values — compile-time constant: no offsets, no ``.item()`` syncs, no
   overflow policy (the reference's threshold rule keeps ``D - int(s*D) + 1``
   modulo ties; we match that count exactly);
2. the VPU can only dynamic-gather along lanes within one 128-wide vreg, and
   ``pltpu.repeat`` has *tile* semantics (row i of the result = row i % R of
   the source), so every lookup table must be reachable by tiling;
3. HBM arrays are tiled (minor dim padded to 128), so any compact layout must
   keep a 128-wide minor dimension.

**Value layout** — ``keep`` is decomposed into at most two powers of two
(40 = 32 + 8, 65 = 64 + 1); each segment of width k is stored *interleaved* as
``[R, 128]`` with ``R = C·k/128``: token t lives in row ``t % R`` at lanes
``(t // R)·k .. +k``.  Tiling ``[R,128] -> [C,128]`` then puts token t's
values in row t, and a lane-gather with index ``(t//R)·k + rank`` expands.

**Bitmap layout** — ``[P, D] uint32`` word planes with ``P = C/32``,
interleaved the same way: bit for (token t, channel d) is bit ``t // P`` of
word ``[t % P, d]``.  Tiling by 32 and shifting by ``t // P`` unpacks without
any transpose or relayout (unlike the reference's 64-element tiles along
alternating axes, compression.py:32-44,87-97, which are shaped for CUDA
``__clzll`` register decompression, SpMM_Kernel.cuh:109-151).

Per 256x128 bf16 chunk at 70 % sparsity (keep=40): 20 KiB values + 4 KiB
bitmap vs 64 KiB dense = **2.67x** reduction (reference format: ~2.3x,
BASELINE.md).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def decompose_keep(keep: int, sum_multiple: int = 1) -> tuple[int, ...]:
    """Smallest sum of at most two powers of two that is >= keep (and a
    multiple of ``sum_multiple``).

    The value layout needs segment widths k with 128 % k == 0; two segments
    cover the reference sparsities with little slack (0.7 -> 40 = 32+8
    exactly; 0.5 -> 65 stored as 68 = 64+4 under the TPU row-alignment
    constraint below).  ``sum_multiple`` lets ChunkFormat force the total
    stored count to land on an 8-row VMEM boundary: Mosaic requires row
    slices (e.g. the V-stream offset inside the fused K++V chunk buffer) to
    be 8-aligned, which interpret-mode runs never check.
    """
    assert 1 <= keep <= 128, keep
    pows = [1, 2, 4, 8, 16, 32, 64, 128]
    candidates = [(a,) for a in pows if a >= keep] + \
        [(a, b) for a in pows for b in pows if b <= a and keep <= a + b <= 128]
    candidates = [c for c in candidates if sum(c) % sum_multiple == 0]
    # fewest stored slots; a single segment (one gather) breaks ties
    return min(candidates, key=lambda c: (sum(c), len(c)))


@dataclasses.dataclass(frozen=True)
class ChunkFormat:
    """Token-sparse chunk format parameters.

    ``qbits``: bits per stored value.  16 = bf16 bit-carried in int16 (exact,
    the default).  8 = int8 codes with per-channel scales (the "bitmap-q8"
    capacity codec): each physical int16 row packs TWO logical value rows —
    row r holds logical rows r (low byte) and r + R/2 (high byte), so the
    in-kernel unpack is two sign-extending shifts + a sublane concat (the
    same ops the expansion already uses; no row interleave).  Value bytes
    halve; the bitmap is unchanged.  Scales ride separately
    (encode_stream_q8)."""

    chunk: int          # C — tokens per chunk (reference compacts per 256)
    dim: int            # D — head_dim (lane dimension; 128 for all ref models)
    keep: int           # requested survivors per token row
    qbits: int = 16

    def __post_init__(self):
        assert self.chunk % 32 == 0
        assert self.qbits in (16, 8)
        for k in self.segs:
            assert (self.chunk * k) % 128 == 0, (self.chunk, k)
            if self.qbits == 8:
                # byte pairing splits each logical seg [R,128] into halves
                assert (self.chunk * k // 128) % 2 == 0, \
                    f"qbits=8 needs even seg rows (chunk {self.chunk}, k {k})"

    @property
    def segs(self) -> tuple[int, ...]:
        # stream_rows = value rows + chunk/16 must be 8-aligned (TPU VMEM
        # sublane tiling); chunk%128==0 makes the bitmap part 8-aligned
        # already, so constrain sum(segs) so the value rows land on 8.
        import math
        rpt = self.chunk // 128
        if self.qbits == 8:
            # physical value rows = sum(segs) * rpt / 2 -> need %8
            mult = 16 // math.gcd(rpt, 16)
        else:
            mult = 8 // math.gcd(rpt, 8)
        return decompose_keep(self.keep, mult)

    @property
    def keep_stored(self) -> int:
        return sum(self.segs)

    @property
    def planes(self) -> int:
        return self.chunk // 32

    def seg_rows(self, k: int) -> int:
        """Physical int16 rows for a width-k segment."""
        r = self.chunk * k // 128
        return r // 2 if self.qbits == 8 else r

    def seg_logical_rows(self, k: int) -> int:
        return self.chunk * k // 128

    @property
    def total_rows(self) -> int:
        """Value rows per chunk across segments (each row is 128 wide)."""
        return sum(self.seg_rows(k) for k in self.segs)

    @property
    def bmp16_rows(self) -> int:
        return self.chunk // 16

    @property
    def stream_rows(self) -> int:
        """int16 rows per chunk in the fused-stream layout (values + bitmap)."""
        return self.total_rows + self.bmp16_rows

    @property
    def bytes_per_chunk(self) -> int:
        return self.total_rows * 128 * 2 + self.planes * self.dim * 4

    @property
    def dense_bytes(self) -> int:
        return self.chunk * self.dim * 2

    @property
    def compression_ratio(self) -> float:
        return self.dense_bytes / self.bytes_per_chunk


def _mag_key(x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """|x| as a monotone non-negative int32 sort key (and its bit width).

    Finite non-negative IEEE floats compare identically to their raw bit
    patterns, so magnitude order questions become integer-bit questions.
    bf16 inputs use the exact 15-bit key (bf16 == top 16 f32 bits); other
    float dtypes go through f32 (31 bits).
    """
    if x.dtype == jnp.bfloat16:
        k = jax.lax.bitcast_convert_type(jnp.abs(x), jnp.int16)
        return k.astype(jnp.int32), 15
    mag = jnp.abs(x.astype(jnp.float32))
    return jax.lax.bitcast_convert_type(mag, jnp.int32), 31


def _kth_largest_key(key: jnp.ndarray, keep: int, bits: int) -> jnp.ndarray:
    """Per-row value of the ``keep``-th largest key (exact, via bitwise
    binary search: largest t with count(key >= t) >= keep).  No sort — each
    round is one compare+row-sum pass, TPU-friendly (XLA lax.top_k lowers to
    a full O(n log^2 n) sort, measured 3-4 ms per compact layer at the bench
    shape; this is ~50x cheaper)."""
    thr = jnp.zeros(key.shape[:-1], jnp.int32)
    for b in reversed(range(bits)):
        cand = thr | (1 << b)
        cnt = jnp.sum((key >= cand[..., None]).astype(jnp.int32), axis=-1)
        thr = jnp.where(cnt >= keep, cand, thr)
    return thr


def _mask_from_key(key: jnp.ndarray, keep: int, bits: int) -> jnp.ndarray:
    """Exact-``keep`` mask of the largest keys, ties to lower index (the
    stable-top_k semantics the layouts rely on)."""
    thr = _kth_largest_key(key, keep, bits)[..., None]
    above = key > thr
    n_above = jnp.sum(above.astype(jnp.int32), axis=-1, keepdims=True)
    tie = key == thr
    tie_rank = jnp.cumsum(tie.astype(jnp.int32), axis=-1)       # 1-based
    return above | (tie & (tie_rank <= keep - n_above))


def topk_mask(x: jnp.ndarray, keep: int) -> jnp.ndarray:
    """Keep-mask of the ``keep`` largest |x| along the last axis (stable ties).

    Sort-free and scatter-free: XLA's top_k (sort) + put_along_axis (serial
    scatter, measured 12.8 ms per compact layer at the bench shape) made
    cache compaction ~35 ms/layer; this formulation is pure compare/reduce."""
    if keep >= x.shape[-1]:
        return jnp.ones(x.shape, bool)
    key, bits = _mag_key(x)
    return _mask_from_key(key, keep, bits)


def _stored_slots(dense: jnp.ndarray, keep: int) -> jnp.ndarray:
    """Mask of exactly ``keep`` stored slots per row: all nonzeros first
    (ties to lower channel), then lowest-index zero slots as padding.
    dense is already pruned to <= keep nonzeros per row."""
    key, bits = _mag_key(dense)
    # any nonzero has key >= 1 and zeros key 0, so zeros lose every
    # comparison and then fill remaining slots in index order via the
    # tie-break — exactly the old top_k(where(x != 0, mag, -1)) semantics
    key = jnp.where(dense != 0, key, 0)
    return _mask_from_key(key, keep, bits)


def _compact_rows(dense: jnp.ndarray, mask: jnp.ndarray, keep: int):
    """Gather the ``keep`` masked elements of each row into channel order.

    Returns (vals [..., keep] in dense.dtype, bits [..., D] int32).  The
    rank -> slot map is materialized with a select+reduce (no scatter)."""
    bits = mask.astype(jnp.int32)
    rank = jnp.cumsum(bits, axis=-1) - 1                         # [..., D]
    sel = mask[..., None] & (rank[..., None]
                             == jnp.arange(keep, dtype=jnp.int32))
    vals = jnp.sum(jnp.where(sel, dense[..., None].astype(jnp.float32), 0.0),
                   axis=-2)                                      # [..., keep]
    return vals.astype(dense.dtype), bits


def _interleave_vals(vals_ck: jnp.ndarray, C: int, k: int) -> jnp.ndarray:
    """[..., C, k] -> [..., R, 128]: token t -> row t % R, lanes (t//R)*k.."""
    R = C * k // 128
    rpt = C // R
    *lead, _, _ = vals_ck.shape
    arr = vals_ck.reshape(*lead, rpt, R, k)          # t = m*R + r -> [m, r]
    arr = jnp.swapaxes(arr, -3, -2)                  # [..., R, rpt, k]
    return arr.reshape(*lead, R, 128)


def _deinterleave_vals(seg: jnp.ndarray, C: int, k: int) -> jnp.ndarray:
    R = C * k // 128
    rpt = C // R
    *lead, _, _ = seg.shape
    arr = seg.reshape(*lead, R, rpt, k)
    arr = jnp.swapaxes(arr, -3, -2)
    return arr.reshape(*lead, C, k)


def encode_chunk(dense: jnp.ndarray, fmt: ChunkFormat):
    """Pack an already-pruned dense chunk (<= fmt.keep nonzeros per row).

    dense: [..., C, D].  Returns (segs: list of [..., R_i, 128] arrays in
    dense.dtype, bitmap: [..., P, D] uint32).

    Pure-XLA implementation (prefill compression, tests, CPU fallback);
    bit-identical to what the Pallas expansion kernels expect.
    """
    C, D = fmt.chunk, fmt.dim
    keep = fmt.keep_stored
    assert dense.shape[-2:] == (C, D), (dense.shape, fmt)
    *lead, _, _ = dense.shape
    # top-`keep` stored slots: nonzeros first (ties to lower channel), zeros
    # pad; the bitmap marks the stored slots (zero-valued pads included, so
    # popcount is always exactly `keep` and the rank mapping is total).
    mask = _stored_slots(dense, keep)
    vals, bits = _compact_rows(dense, mask, keep)    # [..., C, keep]
    P = fmt.planes
    planes = bits.reshape(*lead, 32, P, D).astype(jnp.uint32)   # t = b*P + r
    shifts = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[:, None, None]
    bitmap = (planes * shifts).sum(axis=-3, dtype=jnp.uint32)    # [..., P, D]
    segs, off = [], 0
    for k in fmt.segs:
        segs.append(_interleave_vals(vals[..., off:off + k], C, k).astype(dense.dtype))
        off += k
    return segs, bitmap


def unpack_bitmap(bitmap: jnp.ndarray, fmt: ChunkFormat) -> jnp.ndarray:
    """bitmap [..., P, D] uint32 -> int32 bits [..., C, D] (1 = stored slot)."""
    C, D, P = fmt.chunk, fmt.dim, fmt.planes
    reps = C // P
    *lead, _, _ = bitmap.shape
    words = jnp.concatenate([bitmap] * reps, axis=-2)            # row t = bmp[t % P]
    shift = (jnp.arange(C, dtype=jnp.uint32) // P)[:, None]
    return ((words >> shift) & jnp.uint32(1)).astype(jnp.int32)


def decode_chunk(segs: list[jnp.ndarray], bitmap: jnp.ndarray,
                 fmt: ChunkFormat) -> jnp.ndarray:
    """Inverse of encode_chunk -> dense [..., C, D]."""
    C, D = fmt.chunk, fmt.dim
    bits = unpack_bitmap(bitmap, fmt)
    rank = jnp.cumsum(bits, axis=-1) - 1                         # [..., C, D]
    vals_parts = [_deinterleave_vals(s, C, k) for s, k in zip(segs, fmt.segs)]
    vals = jnp.concatenate(vals_parts, axis=-1)                  # [..., C, keep]
    take = jnp.clip(rank, 0, fmt.keep_stored - 1)
    dense = jnp.take_along_axis(vals, take, axis=-1)
    return jnp.where(bits > 0, dense, 0).astype(vals.dtype)


def prune_and_encode_chunk(dense: jnp.ndarray, fmt: ChunkFormat):
    """Exact top-``keep`` magnitude prune + pack in one step."""
    mask = topk_mask(dense, fmt.keep)
    return encode_chunk(jnp.where(mask, dense, 0).astype(dense.dtype), fmt)


# ---------------------------------------------------------------------------
# Fused-stream layout (kernel v4): one int16 row-block per (chunk, head,
# stream) so the decode kernel fetches a whole chunk with a single DMA
# (measured: per-DMA issue/wait latency dominates decode at small buffer
# counts — SURVEY of /tmp/v3_variants: dma-only 696us of 1398us).
#
#   rows [0 .. R_0)              segment 0 values  (bf16 bit-carried in int16)
#   rows [R_0 .. R_0+R_1)        segment 1 values  (if present)
#   rows [.. +C/16)              bitmap as uint16 word planes:
#                                word [t % (C/16), d], bit t // (C/16)
#
# int16 is the carrier because TPU DMA/bitcast treat it as raw bits (a bf16
# carrier canonicalizes NaN payloads — measured corruption), while 16-bit
# compute limits are avoided by widening the bitmap to int32 in-kernel.
# ---------------------------------------------------------------------------

def bitmap16(bits: jnp.ndarray, C: int) -> jnp.ndarray:
    """bits [..., C, D] int -> uint16 word planes [..., C//16, D]."""
    rows16 = C // 16
    *lead, _, D = bits.shape
    planes = bits.reshape(*lead, 16, rows16, D).astype(jnp.uint16)  # t = b*rows16 + r
    shifts = (jnp.uint16(1) << jnp.arange(16, dtype=jnp.uint16))[:, None, None]
    return (planes * shifts).sum(axis=-3, dtype=jnp.uint16)


def unpack_bitmap16(words: jnp.ndarray, C: int) -> jnp.ndarray:
    """uint16 planes [..., C//16, D] -> int32 bits [..., C, D]."""
    rows16 = C // 16
    *lead, _, D = words.shape
    tiled = jnp.concatenate([words.astype(jnp.int32)] * 16, axis=-2)
    shift = (jnp.arange(C, dtype=jnp.int32) // rows16)[:, None]
    return (tiled >> shift) & 1


def encode_stream(dense: jnp.ndarray, fmt: ChunkFormat) -> jnp.ndarray:
    """Pack a pruned dense chunk [..., C, D] into fused int16 rows
    [..., fmt.stream_rows, 128]."""
    C, D = fmt.chunk, fmt.dim
    keep = fmt.keep_stored
    *lead, _, _ = dense.shape
    mask = _stored_slots(dense, keep)
    vals, bits = _compact_rows(dense, mask, keep)
    vals = vals.astype(jnp.bfloat16)
    rows = []
    off = 0
    for k in fmt.segs:
        seg = _interleave_vals(vals[..., off:off + k], C, k)
        rows.append(jax.lax.bitcast_convert_type(seg, jnp.int16))
        off += k
    bmp = bitmap16(bits, C)
    rows.append(jax.lax.bitcast_convert_type(bmp, jnp.int16))
    return jnp.concatenate(rows, axis=-2)


def decode_stream(rows: jnp.ndarray, fmt: ChunkFormat) -> jnp.ndarray:
    """Inverse of encode_stream -> dense bf16 [..., C, D]."""
    C, D = fmt.chunk, fmt.dim
    segs, off = [], 0
    for k in fmt.segs:
        R = fmt.seg_rows(k)
        seg = jax.lax.bitcast_convert_type(rows[..., off:off + R, :], jnp.bfloat16)
        segs.append(_deinterleave_vals(seg, C, k))
        off += R
    vals = jnp.concatenate(segs, axis=-1)                        # [..., C, keep]
    bmp = jax.lax.bitcast_convert_type(rows[..., off:off + C // 16, :], jnp.uint16)
    bits = unpack_bitmap16(bmp, C)
    rank = jnp.cumsum(bits, axis=-1) - 1
    take = jnp.clip(rank, 0, fmt.keep_stored - 1)
    dense = jnp.take_along_axis(vals, take, axis=-1)
    return jnp.where(bits > 0, dense, 0).astype(jnp.bfloat16)


def prune_and_encode_stream(dense: jnp.ndarray, fmt: ChunkFormat,
                            score: jnp.ndarray | None = None) -> jnp.ndarray:
    """Prune each token row to fmt.keep survivors and pack.  The keep rule is
    top-|x| by default; ``score`` (same shape, non-negative fp32) substitutes
    an output-aware ranking (Opa policies, cache/compressed.py)."""
    mask = topk_mask(dense if score is None else score, fmt.keep)
    return encode_stream(jnp.where(mask, dense, 0).astype(dense.dtype), fmt)


# ---------------------------------------------------------------------------
# bitmap-q8: int8-quantized NZ payload (the capacity codec).
#
# Same bitmap + interleaved-segment geometry as the bf16 stream, but values
# are symmetric per-channel int8 codes (quantized BEFORE packing, so the
# code of (t, d) is round(x[t,d] / scale[d]) exactly like the quant-dense
# codec) packed two logical rows per physical int16 row: physical row r of a
# width-k segment holds logical rows r (low byte) and r + R/2 (high byte).
# Value bytes halve vs bf16 (e.g. keep=40 at C=256: 56 rows/chunk vs 96 ->
# 4.44x vs dense before scales); dequantization folds into the attention
# matmuls (q * kscale, pv * vscale), never into the expanded tile.
# ---------------------------------------------------------------------------

def _pack_bytes_rows(codes_rows: jnp.ndarray) -> jnp.ndarray:
    """Logical int32 code rows [..., R, 128] -> physical int16 [..., R/2, 128]
    (low byte = row r, high byte = row r + R/2)."""
    *lead, R, L = codes_rows.shape
    low = codes_rows[..., : R // 2, :] & 0xFF
    high = codes_rows[..., R // 2:, :] & 0xFF
    v = low | (high << 8)
    return ((v << 16) >> 16).astype(jnp.int16)


def _unpack_bytes_rows(phys: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _pack_bytes_rows -> int32 [..., R, 128] (sign-extended)."""
    w = phys.astype(jnp.int32)
    low = (w << 24) >> 24
    high = (w << 16) >> 24
    return jnp.concatenate([low, high], axis=-2)


def encode_stream_q8(dense: jnp.ndarray, fmt: ChunkFormat):
    """Pack a pruned dense chunk [..., C, D] into int8-payload fused rows.

    Returns (rows [..., fmt.stream_rows, 128] int16, scales [..., D] f32 ->
    caller stores bf16).  Requires fmt.qbits == 8."""
    assert fmt.qbits == 8, fmt
    C, D = fmt.chunk, fmt.dim
    keep = fmt.keep_stored
    xf = dense.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-2)                         # [..., D]
    scales = jnp.maximum(amax / 127.0, 1e-8)
    codes = jnp.clip(jnp.round(xf / scales[..., None, :]), -127, 127
                     ).astype(jnp.int32)
    mask = _stored_slots(dense, keep)
    vals, bits = _compact_rows(codes.astype(jnp.float32)
                               * mask.astype(jnp.float32), mask, keep)
    vals = vals.astype(jnp.int32)                                # [..., C, keep]
    rows = []
    off = 0
    for k in fmt.segs:
        seg = _interleave_vals(vals[..., off:off + k], C, k)
        rows.append(_pack_bytes_rows(seg))
        off += k
    rows.append(jax.lax.bitcast_convert_type(bitmap16(bits, C), jnp.int16))
    return jnp.concatenate(rows, axis=-2), scales


def decode_stream_q8(rows: jnp.ndarray, scales: jnp.ndarray,
                     fmt: ChunkFormat) -> jnp.ndarray:
    """Inverse of encode_stream_q8 -> dense bf16 [..., C, D]."""
    assert fmt.qbits == 8, fmt
    C, D = fmt.chunk, fmt.dim
    segs, off = [], 0
    for k in fmt.segs:
        R = fmt.seg_rows(k)
        seg = _unpack_bytes_rows(rows[..., off:off + R, :])
        segs.append(_deinterleave_vals(seg.astype(jnp.float32), C, k))
        off += R
    vals = jnp.concatenate(segs, axis=-1)                        # [..., C, keep]
    bmp = jax.lax.bitcast_convert_type(rows[..., off:off + C // 16, :],
                                       jnp.uint16)
    bits = unpack_bitmap16(bmp, C)
    rank = jnp.cumsum(bits, axis=-1) - 1
    take = jnp.clip(rank, 0, fmt.keep_stored - 1)
    dense = jnp.take_along_axis(vals, take, axis=-1)
    dense = jnp.where(bits > 0, dense, 0.0)
    return (dense * scales.astype(jnp.float32)[..., None, :]
            ).astype(jnp.bfloat16)


def prune_and_encode_stream_q8(dense: jnp.ndarray, fmt: ChunkFormat,
                               score: jnp.ndarray | None = None):
    mask = topk_mask(dense if score is None else score, fmt.keep)
    return encode_stream_q8(jnp.where(mask, dense, 0).astype(dense.dtype), fmt)
