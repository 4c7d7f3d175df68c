"""Static-shape compressed sparse KV format (TPU redesign of the reference's
bitmap format, kernel/compression.py).

The reference stores, per 64-element tile, an int64 bitmap + a variable-length
packed fp16 run (8-half aligned) + cumulative offsets — shapes depend on data,
with host syncs to size buffers (compression.py:294-335).  Under XLA every
shape must be static, so we redesign:

* Pruning keeps an **exact** top-``keep`` per token row (ties broken by lower
  channel index), so a chunk of C tokens always packs to exactly ``C * keep``
  values — compile-time constant, no offsets, no overflow policy.
  (The reference's threshold rule keeps ``D - int(s*D) + 1`` values modulo
  ties — ``PruneConfig.kept_per_row``; we match that count exactly.)
* Values are packed per token row in ascending channel order, flattened to
  ``[C * keep]`` so the HBM footprint has no TPU tile padding (a ``[C, keep]``
  bf16 array would be lane-padded to 128).
* The bitmap is stored as token-packed word planes ``[C/32, D] uint32``:
  bit ``t % 32`` of word ``[t // 32, d]`` marks (token t, channel d) nonzero.
  This layout expands inside a Pallas kernel with only sublane-repeat + shift
  + mask — no transpose, no relayout (unlike the reference's 64-element tiles
  along alternating axes, compression.py:32-44,87-97, which are shaped for
  CUDA ``__clzll`` register decompression, SpMM_Kernel.cuh:109-151).

Per 256x128 bf16 chunk at 70 % sparsity (keep=40): 20 KiB values + 4 KiB
bitmap vs 64 KiB dense = **2.67x** reduction (reference format: ~2.3x,
BASELINE.md).

Channel-sparse (Vc) chunks reuse the same machinery on the transposed chunk
with per-``group_size`` grouping along tokens.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ChunkFormat:
    """Token-sparse chunk format parameters."""

    chunk: int          # C — tokens per chunk (reference compacts per 256)
    dim: int            # D — head_dim (lane dimension, 128 for all ref models)
    keep: int           # exact survivors per token row

    @property
    def vals_len(self) -> int:
        return self.chunk * self.keep

    @property
    def bitmap_words(self) -> int:
        return (self.chunk // 32) * self.dim

    @property
    def bytes_per_chunk(self) -> int:
        return self.vals_len * 2 + self.bitmap_words * 4

    @property
    def dense_bytes(self) -> int:
        return self.chunk * self.dim * 2

    @property
    def compression_ratio(self) -> float:
        return self.dense_bytes / self.bytes_per_chunk


def topk_mask(x: jnp.ndarray, keep: int) -> jnp.ndarray:
    """Keep-mask of the ``keep`` largest |x| along the last axis.

    Ties broken by lower index (jax.lax.top_k is stable in index order).
    """
    mag = jnp.abs(x.astype(jnp.float32))
    kth = jax.lax.top_k(mag, keep)[0][..., -1:]
    # Elements strictly above the k-th survive; elements equal to it survive
    # left-to-right until the count is filled.
    above = mag > kth
    eq = mag == kth
    need = keep - above.sum(-1, keepdims=True)
    eq_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1)
    return above | (eq & (eq_rank <= need))


def encode_chunk(dense: jnp.ndarray, fmt: ChunkFormat):
    """Pack an already-pruned dense chunk.

    dense: [..., C, D] with exactly ``fmt.keep`` nonzeros per row (rows with
    fewer nonzeros pack fine; extra zeros are stored explicitly).
    Returns (vals [..., C*keep], bitmap [..., C//32, D] uint32).

    Pure-XLA reference implementation (tests + CPU fallback); the fused
    prune+pack Pallas kernel lives in ops/kernels/compress.py.
    """
    C, D, keep = fmt.chunk, fmt.dim, fmt.keep
    assert dense.shape[-2:] == (C, D), (dense.shape, fmt)
    nz = dense != 0
    # keep-mask: first `keep` nonzeros per row in channel order (rows are
    # guaranteed <= keep nonzeros by the pruner; clamp defensively).
    rank = jnp.cumsum(nz.astype(jnp.int32), axis=-1) - 1          # [..., C, D]
    take = nz & (rank < keep)
    # bitmap planes: word [t//32, d], bit t%32
    bits = take.astype(jnp.uint32)
    *lead, _, _ = dense.shape
    planes = bits.reshape(*lead, C // 32, 32, D)
    shifts = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :, None]
    bitmap = (planes * shifts).sum(axis=-2, dtype=jnp.uint32)      # [..., C//32, D]
    # packed values: scatter row value into slot `rank` (one-hot matmul — XLA
    # lowers the small-range scatter fine on CPU/TPU outside kernels).
    slot = jnp.where(take, rank, keep)                             # overflow -> dropped
    onehot = jax.nn.one_hot(slot, keep + 1, dtype=dense.dtype)[..., :keep]
    vals = jnp.einsum("...cd,...cdk->...ck", dense, onehot)
    return vals.reshape(*lead, C * keep).astype(dense.dtype), bitmap


def unpack_bitmap(bitmap: jnp.ndarray, fmt: ChunkFormat) -> jnp.ndarray:
    """bitmap [..., C//32, D] uint32 -> bool [..., C, D]."""
    C, D = fmt.chunk, fmt.dim
    *lead, _, _ = bitmap.shape
    words = jnp.repeat(bitmap, 32, axis=-2)                        # [..., C, D]
    t = jnp.arange(C) % 32
    bits = (words >> t[:, None].astype(jnp.uint32)) & jnp.uint32(1)
    return bits.astype(bool)


def decode_chunk(vals: jnp.ndarray, bitmap: jnp.ndarray, fmt: ChunkFormat) -> jnp.ndarray:
    """Inverse of encode_chunk: -> dense [..., C, D]."""
    C, D, keep = fmt.chunk, fmt.dim, fmt.keep
    *lead, _ = vals.shape
    bit = unpack_bitmap(bitmap, fmt)
    rank = jnp.clip(jnp.cumsum(bit.astype(jnp.int32), axis=-1) - 1, 0, keep - 1)
    v = vals.reshape(*lead, C, keep)
    dense = jnp.take_along_axis(v, rank, axis=-1)
    return jnp.where(bit, dense, 0).astype(vals.dtype)


def prune_and_encode_chunk(dense: jnp.ndarray, fmt: ChunkFormat):
    """Exact top-``keep`` magnitude prune + pack in one step."""
    mask = topk_mask(dense, fmt.keep)
    return encode_chunk(jnp.where(mask, dense, 0).astype(dense.dtype), fmt)
