"""Quantized-dense chunk codec ("q8" family) for the compressed KV cache.

Motivation (measured, round 2): the bitmap-packed sparse codec
(ops/sparse_format.py — the TPU redesign of the reference's 64-tile format,
kernel/compression.py) minimizes HBM bytes, but reconstructing dense tiles
in VMEM costs a rank prefix-matmul plus per-element lane gathers.  Device-time
bisection of the fused decode kernel at 10k context (B=32, Hkv=8, keep=40):

    full expansion        6.22 ms   (81 GB/s effective)
    rank matmul alone     +1.93 ms
    gathers+select alone  +1.33 ms  (+~2 ms more when composed: i32 relayouts)
    no expansion floor    0.94 ms   (540 GB/s effective — DMA + MXU + softmax)
    dense XLA attention   1.78 ms   (745 GB/s, platform speed-of-light)

i.e. on TPU the VPU bit-unpack — the analogue of the reference's register
__clzll decompress (kernel/csrc/SpMM_Kernel.cuh:109-151) — can never beat
dense per call; the bitmap codec's win is CAPACITY (2.67x KV in HBM).

This codec trades a little of that capacity for expansion that is pure
widen-arithmetic (no rank, no gathers): pruned chunks are stored DENSE-zeroed
and quantized, so "Load-as-Sparse, Compute-as-Dense" becomes
"Load-as-Quantized, Compute-as-Dense":

  * K: int8, two tokens per int16 row — token t < C/2 in the low byte of row
    t, token t + C/2 in the high byte.  C/2 rows of 128 lanes per chunk.
  * V: int8 (same layout) or int4 — four tokens per int16 row, token
    t + j*C/4 in nibble j.  C/4 rows when int4.
  * scales: per (chunk, head, CHANNEL), bf16, stored in a separate small
    array that rides a fixed BlockSpec into the kernel (no extra DMA).
    Per-channel is the right axis for K (outlier channels); the kernel folds
    the K scale into q before the score matmul and the V scale into the
    pv partial after it, so dequantization never materializes.

Pruning still happens first (ops/pruning.py, reference dh_prune_* semantics:
llama_mustafar_kernel.py:77-153); the zeros are stored as code 0.  At
kbits=8/vbits=4 the stream is 192 int16 rows per 256-token chunk — the same
bytes as the bitmap codec at keep=40 (2.67x vs dense bf16) — and the fused
kernel runs at the no-expansion floor instead of 3.5-6 ms.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QuantCodec:
    chunk: int = 256          # tokens per packed chunk (C)
    dim: int = 128            # head_dim == lane width
    kbits: int = 8
    vbits: int = 8

    def __post_init__(self):
        assert self.dim == 128, "lane-width layouts require head_dim 128"
        assert self.kbits in (8, 4) and self.vbits in (8, 4)
        assert self.chunk % 4 == 0

    @staticmethod
    def rows_for(chunk: int, bits: int) -> int:
        return chunk // (16 // bits)

    @property
    def k_rows(self) -> int:
        return self.rows_for(self.chunk, self.kbits)

    @property
    def v_rows(self) -> int:
        return self.rows_for(self.chunk, self.vbits)

    @property
    def stream_rows(self) -> int:
        """int16 rows per chunk per head (K stream then V stream)."""
        return self.k_rows + self.v_rows

    def bytes_per_token(self) -> float:
        return self.stream_rows * 128 * 2 / self.chunk


def _to_i16(v: jnp.ndarray) -> jnp.ndarray:
    """int32 holding arbitrary 16-bit patterns -> int16 (exact)."""
    return ((v << 16) >> 16).astype(jnp.int16)


def quantize_chunk(x: jnp.ndarray, bits: int):
    """x [BH, C, D] -> (codes int32 [BH, C, D], scales f32 [BH, D]).

    Symmetric per-channel quantization over the chunk's tokens.  Zeros
    (pruned positions) map to code 0 exactly.
    """
    qmax = float(2 ** (bits - 1) - 1)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1)          # [BH, D]
    scales = jnp.maximum(amax / qmax, 1e-8)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scales[:, None, :]),
                     -qmax, qmax).astype(jnp.int32)
    return codes, scales


def pack_codes(codes: jnp.ndarray, bits: int) -> jnp.ndarray:
    """codes int32 [BH, C, D] -> int16 rows [BH, C/(16/bits), 128].

    Token blocks stack along the row axis so in-kernel unpack is
    shift/mask + concat with row index == token index (no interleave).
    """
    BH, C, D = codes.shape
    n = 16 // bits
    R = C // n
    mask = (1 << bits) - 1
    v = jnp.zeros((BH, R, D), jnp.int32)
    for j in range(n):
        v = v | ((codes[:, j * R:(j + 1) * R, :] & mask) << (bits * j))
    return _to_i16(v)


def unpack_rows(rows: jnp.ndarray, bits: int) -> jnp.ndarray:
    """int16 rows [..., R, 128] -> codes int32 [..., R*(16/bits), 128].

    Mirrors the in-kernel expansion (sign-extending shifts + concat); also
    the XLA fallback / test decoder.
    """
    n = 16 // bits
    w = rows.astype(jnp.int32)
    blocks = [((w << (32 - bits * (j + 1))) >> (32 - bits)) for j in range(n)]
    return jnp.concatenate(blocks, axis=-2)


def encode_chunk(x: jnp.ndarray, codec: QuantCodec, kind: str):
    """Prune-side entry: x [BH, C, D] (already pruned) -> (rows, scales)."""
    bits = codec.kbits if kind == "k" else codec.vbits
    codes, scales = quantize_chunk(x, bits)
    return pack_codes(codes, bits), scales.astype(jnp.bfloat16)


def decode_chunk(rows: jnp.ndarray, scales: jnp.ndarray, codec: QuantCodec,
                 kind: str) -> jnp.ndarray:
    """rows [..., R, 128] + scales [..., D] -> dense bf16 [..., C, D]."""
    bits = codec.kbits if kind == "k" else codec.vbits
    codes = unpack_rows(rows, bits)
    return (codes.astype(jnp.float32)
            * scales.astype(jnp.float32)[..., None, :]).astype(jnp.bfloat16)
