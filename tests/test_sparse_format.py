"""Compression round-trip property tests (SURVEY.md §4 test pyramid layer (b)).

decode(encode(pruned_dense)) == pruned_dense; bitmap population counts;
interleaved layout invariants; compression ratio (reference format math:
compression.py:42-53, BASELINE.md ~2.3x at 70%)."""

import numpy as np
import jax.numpy as jnp

from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops import pruning


FMT = sf.ChunkFormat(chunk=256, dim=128, keep=40)   # 70% sparsity


def test_decompose_keep():
    assert sf.decompose_keep(40) == (32, 8)
    assert sf.decompose_keep(65) == (64, 1)
    assert sf.decompose_keep(64) == (64,)
    assert sf.decompose_keep(128) == (128,)
    assert sf.decompose_keep(1) == (1,)
    for k in range(1, 129):
        segs = sf.decompose_keep(k)
        assert sum(segs) >= k and len(segs) <= 2
        assert all(s in (1, 2, 4, 8, 16, 32, 64, 128) for s in segs)


def make_pruned(rs, lead=(), fmt=FMT):
    x = rs.randn(*lead, fmt.chunk, fmt.dim).astype(np.float32)
    mask = np.asarray(sf.topk_mask(jnp.asarray(x), fmt.keep))
    return x * mask


def test_roundtrip_exact():
    rs = np.random.RandomState(0)
    for fmt in [FMT,
                sf.ChunkFormat(chunk=256, dim=128, keep=65),   # 50% sparsity
                sf.ChunkFormat(chunk=64, dim=128, keep=64),
                sf.ChunkFormat(chunk=128, dim=128, keep=13)]:
        pruned = make_pruned(rs, (2,), fmt)
        segs, bmp = sf.encode_chunk(jnp.asarray(pruned), fmt)
        assert len(segs) == len(fmt.segs)
        for s, k in zip(segs, fmt.segs):
            assert s.shape == (2, fmt.seg_rows(k), 128)
        assert bmp.shape == (2, fmt.planes, fmt.dim) and bmp.dtype == jnp.uint32
        dense = np.asarray(sf.decode_chunk(segs, bmp, fmt))
        np.testing.assert_array_equal(dense, pruned)


def test_bitmap_popcount_is_keep_stored():
    rs = np.random.RandomState(1)
    pruned = make_pruned(rs)
    _, bmp = sf.encode_chunk(jnp.asarray(pruned), FMT)
    pop = np.unpackbits(np.asarray(bmp).view(np.uint8)).sum()
    # stored slots always == keep_stored per row (zero pads included)
    assert pop == FMT.chunk * FMT.keep_stored


def test_interleaved_layout_token_placement():
    """Token t's first-segment values live at row t%R, lanes (t//R)*k."""
    fmt = FMT
    rs = np.random.RandomState(2)
    pruned = make_pruned(rs)
    segs, _ = sf.encode_chunk(jnp.asarray(pruned), fmt)
    s0 = np.asarray(segs[0])
    k = fmt.segs[0]
    R = fmt.seg_rows(k)
    for t in [0, 1, R - 1, R, 255]:
        nz = pruned[t][pruned[t] != 0][:k]
        got = s0[t % R, (t // R) * k:(t // R) * k + len(nz)]
        np.testing.assert_array_equal(got, nz)


def test_unpack_bitmap_matches_mask():
    rs = np.random.RandomState(3)
    pruned = make_pruned(rs)
    segs, bmp = sf.encode_chunk(jnp.asarray(pruned), FMT)
    bits = np.asarray(sf.unpack_bitmap(bmp, FMT))
    # every actual nonzero is marked
    assert (bits[pruned != 0] == 1).all()
    assert bits.sum() == FMT.chunk * FMT.keep_stored


def test_prune_and_encode_matches_two_step():
    rs = np.random.RandomState(4)
    x = rs.randn(256, 128).astype(np.float32)
    segs1, bmp1 = sf.prune_and_encode_chunk(jnp.asarray(x), FMT)
    pruned = np.where(np.asarray(sf.topk_mask(jnp.asarray(x), 40)), x, 0)
    segs2, bmp2 = sf.encode_chunk(jnp.asarray(pruned), FMT)
    for a, b in zip(segs1, segs2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(bmp1), np.asarray(bmp2))


def test_compression_ratio():
    assert FMT.compression_ratio > 2.3, FMT.compression_ratio
    f2 = sf.ChunkFormat(chunk=256, dim=128, keep=65)   # 50%
    # stored count rounds 65 -> 68 (8-row VMEM alignment), ratio 1.68x
    assert f2.segs == (64, 4) and f2.stream_rows % 8 == 0
    assert 1.6 < f2.compression_ratio < 2.0


def test_topk_mask_handles_ties():
    x = jnp.asarray(np.array([[1.0] * 8 + [0.0] * 120]))
    m = np.asarray(sf.topk_mask(x, 3))
    assert m.sum() == 3 and m[0, :3].all()


def test_topk_mask_matches_stable_top_k():
    """The bisection mask must reproduce jax.lax.top_k's stable selection
    exactly (the layouts assume exact-count masks with lower-index ties),
    including duplicated magnitudes and bf16 inputs."""
    import jax
    rng = np.random.RandomState(3)
    dense = rng.randn(64, 128)
    dense[rng.rand(*dense.shape) < 0.4] = 0
    quant = np.round(rng.randn(64, 128) * 2) / 2          # many exact ties
    for arr in (dense, quant):
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(arr, dt)
            for keep in (1, 40, 65, 127, 128):
                _, idx = jax.lax.top_k(jnp.abs(x.astype(jnp.float32)), keep)
                ref = np.zeros(x.shape, bool)
                np.put_along_axis(ref, np.asarray(idx), True, axis=-1)
                got = np.asarray(sf.topk_mask(x, keep))
                np.testing.assert_array_equal(got, ref, err_msg=f"{dt} {keep}")


def test_keep_count_matches_reference_rule():
    """keep == D - int(s*D) + 1, the reference kthvalue threshold survivor
    count (llama_mustafar_Kt_Mag_Vt_Mag.py:85-97)."""
    from mustafar_tpu.config import PruneConfig
    p = PruneConfig()
    assert p.kept_per_row(128, 0.7) == 40
    assert p.kept_per_row(128, 0.5) == 65
    assert p.kept_per_row(128, 0.0) == 128


def test_stream_rows_8_aligned_all_keeps():
    """Mosaic requires VMEM row slices to be 8-aligned; the V-stream offset
    inside the fused K++V chunk buffer is kfmt.stream_rows, so every legal
    keep must produce 8-aligned stream rows (caught on real TPU only —
    interpret mode does not enforce tiling)."""
    for keep in range(1, 129):
        f = sf.ChunkFormat(chunk=256, dim=128, keep=keep)
        assert f.stream_rows % 8 == 0, (keep, f.segs, f.stream_rows)
        assert f.keep_stored >= keep
