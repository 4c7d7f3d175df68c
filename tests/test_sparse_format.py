"""Compression round-trip property tests (SURVEY.md §4 test pyramid layer (b)).

decode(encode(pruned_dense)) == pruned_dense; bitmap population counts;
compression ratio of the format (reference format math: compression.py:42-53,
BASELINE.md ~2.3x at 70%)."""

import numpy as np
import jax.numpy as jnp

from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops import pruning


FMT = sf.ChunkFormat(chunk=256, dim=128, keep=40)


def make_pruned(rs, lead=(), fmt=FMT):
    x = rs.randn(*lead, fmt.chunk, fmt.dim).astype(np.float32)
    return np.asarray(pruning.prune_token_mag(jnp.asarray(x), 1 - (fmt.keep - 1) / fmt.dim))


def test_roundtrip_exact():
    rs = np.random.RandomState(0)
    for fmt in [FMT, sf.ChunkFormat(chunk=64, dim=128, keep=64),
                sf.ChunkFormat(chunk=32, dim=64, keep=13)]:
        s = 1 - (fmt.keep - 1) / fmt.dim
        x = rs.randn(2, fmt.chunk, fmt.dim).astype(np.float32)
        pruned = np.asarray(pruning.prune_token_mag(jnp.asarray(x), s, exact=True))
        assert ((pruned != 0).sum(-1) <= fmt.keep).all()
        vals, bmp = sf.encode_chunk(jnp.asarray(pruned), fmt)
        assert vals.shape == (2, fmt.vals_len)
        assert bmp.shape == (2, fmt.chunk // 32, fmt.dim) and bmp.dtype == jnp.uint32
        dense = np.asarray(sf.decode_chunk(vals, bmp, fmt))
        np.testing.assert_array_equal(dense, pruned)


def test_bitmap_popcount_matches_nnz():
    rs = np.random.RandomState(1)
    pruned = make_pruned(rs)
    _, bmp = sf.encode_chunk(jnp.asarray(pruned), FMT)
    pop = np.unpackbits(np.asarray(bmp).view(np.uint8)).sum()
    assert pop == (pruned != 0).sum()


def test_values_packed_in_channel_order():
    rs = np.random.RandomState(2)
    pruned = make_pruned(rs)
    vals, _ = sf.encode_chunk(jnp.asarray(pruned), FMT)
    v = np.asarray(vals).reshape(256, 40)
    for t in range(0, 256, 37):
        nz = pruned[t][pruned[t] != 0]
        np.testing.assert_array_equal(v[t, :len(nz)], nz)


def test_prune_and_encode_matches_two_step():
    rs = np.random.RandomState(3)
    x = rs.randn(256, 128).astype(np.float32)
    vals1, bmp1 = sf.prune_and_encode_chunk(jnp.asarray(x), FMT)
    mask = pruning.magnitude_mask_lastdim(jnp.asarray(x), 1 - 39 / 128, exact=True)
    # same keep count -> same mask modulo the top-k definition
    pruned = np.where(np.asarray(sf.topk_mask(jnp.asarray(x), 40)), x, 0)
    vals2, bmp2 = sf.encode_chunk(jnp.asarray(pruned), FMT)
    np.testing.assert_array_equal(np.asarray(vals1), np.asarray(vals2))
    np.testing.assert_array_equal(np.asarray(bmp1), np.asarray(bmp2))


def test_compression_ratio():
    assert FMT.compression_ratio > 2.3, FMT.compression_ratio
    # 50% sparsity keep=65
    f2 = sf.ChunkFormat(chunk=256, dim=128, keep=65)
    assert 1.7 < f2.compression_ratio < 2.0


def test_topk_mask_handles_ties():
    x = jnp.asarray(np.array([[1.0] * 8]))
    m = np.asarray(sf.topk_mask(x, 3))
    assert m.sum() == 3 and m[0, :3].all()
