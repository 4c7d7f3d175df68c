"""Pruning-math unit tests (SURVEY.md §4 test pyramid layer (a)).

Validates sparsity levels and kept-index sets against the reference formulas
(torch.kthvalue threshold rule, llama_mustafar_Kt_Mag_Vt_Mag.py:85-97).
"""

import numpy as np
import jax.numpy as jnp

from mustafar_tpu.ops import pruning


def ref_token_mag(x: np.ndarray, s: float) -> np.ndarray:
    """Direct numpy transcription of the reference rule."""
    n = x.shape[-1]
    k = max(1, int(s * n))
    flat = x.reshape(-1, n)
    out = flat.copy()
    for i, row in enumerate(flat):
        thr = np.sort(np.abs(row))[k - 1]
        out[i] = np.where(np.abs(row) >= thr, row, 0)
    return out.reshape(x.shape)


def test_token_mag_matches_reference_rule():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 7, 128).astype(np.float32)
    for s in [0.5, 0.7]:
        ours = np.asarray(pruning.prune_token_mag(jnp.asarray(x), s))
        np.testing.assert_array_equal(ours, ref_token_mag(x, s))


def test_token_mag_sparsity_level():
    rs = np.random.RandomState(1)
    x = rs.randn(4, 16, 128).astype(np.float32)
    out = np.asarray(pruning.prune_token_mag(jnp.asarray(x), 0.7))
    # keep = 128 - int(0.7*128) + 1 = 40 per row (no ties in random floats)
    nz = (out != 0).sum(-1)
    assert (nz == 40).all()
    assert float(pruning.sparsity_of(jnp.asarray(out))) == (128 - 40) / 128


def test_token_mag_exact_matches_threshold_without_ties():
    rs = np.random.RandomState(2)
    x = rs.randn(8, 128).astype(np.float32)
    a = np.asarray(pruning.prune_token_mag(jnp.asarray(x), 0.5))
    b = np.asarray(pruning.prune_token_mag(jnp.asarray(x), 0.5, exact=True))
    np.testing.assert_array_equal(a, b)


def test_channel_mag_groups():
    rs = np.random.RandomState(3)
    gs = 32
    x = rs.randn(2, 2, 64, 16).astype(np.float32)  # [B,H,T,D]
    out = np.asarray(pruning.prune_channel_mag(jnp.asarray(x), 0.7, gs))
    # per channel of each 32-token group: keep = 32 - int(0.7*32) + 1 = 11
    g = out.reshape(2, 2, 2, gs, 16)
    nz = (g != 0).sum(-2)
    assert (nz == 11).all()
    # reference rule per column
    xg = x.reshape(2, 2, 2, gs, 16)
    k = int(0.7 * gs)
    for idx in np.ndindex(2, 2, 2, 16):
        col = xg[idx[0], idx[1], idx[2], :, idx[3]]
        thr = np.sort(np.abs(col))[k - 1]
        expect = np.where(np.abs(col) >= thr, col, 0)
        np.testing.assert_array_equal(g[idx[0], idx[1], idx[2], :, idx[3]], expect)


def test_think_prunes_channels_uniformly():
    rs = np.random.RandomState(4)
    B, Hkv, Hq, T, D = 1, 2, 4, 48, 32
    k = rs.randn(B, Hkv, T, D).astype(np.float32)
    q = rs.randn(B, Hq, T, D).astype(np.float32)
    out = np.asarray(pruning.think_prune_key(jnp.asarray(k), jnp.asarray(q), 0.5))
    zeroed = (out == 0).all(axis=2)  # per (B,H,D): channel zero for all tokens
    assert zeroed.sum() == B * Hkv * int(0.5 * D)
    # surviving channels untouched
    keep = ~zeroed
    np.testing.assert_array_equal(out[0, 0][:, keep[0, 0]], k[0, 0][:, keep[0, 0]])


def test_thinv_channel_energy():
    rs = np.random.RandomState(5)
    v = rs.randn(2, 3, 40, 64).astype(np.float32)
    out = np.asarray(pruning.thinv_prune_value(jnp.asarray(v), 0.7))
    zeroed = (out == 0).all(axis=2)
    assert (zeroed.sum(-1) == int(0.7 * 64)).all()
    # lowest-energy channels are the zeroed ones
    energy = (v ** 2).mean(axis=2)
    for b in range(2):
        for h in range(3):
            dropped = set(np.where(zeroed[b, h])[0])
            expect = set(np.argsort(energy[b, h])[: int(0.7 * 64)])
            assert dropped == expect


def test_prune_by_score():
    rs = np.random.RandomState(6)
    x = rs.randn(4, 64).astype(np.float32)
    score = rs.rand(4, 64).astype(np.float32)
    out = np.asarray(pruning.prune_by_score_lastdim(jnp.asarray(x), jnp.asarray(score), 0.5))
    k = int(0.5 * 64)
    for i in range(4):
        thr = np.sort(score[i])[k - 1]
        np.testing.assert_array_equal(out[i], np.where(score[i] >= thr, x[i], 0))


def test_opa_ring_accumulator_semantics():
    """Ring accumulator: the token pruned at step pos carries exactly the
    sum of its per-step scores from entry+1 .. pos-1 plus zero-init (it is
    pruned before the current step's accumulation), and slots recycle."""
    import jax
    import dataclasses
    from mustafar_tpu.config import CacheMode, EngineConfig, PruneConfig, PruneMethod, TINY_LLAMA
    from mustafar_tpu.cache import make_cache

    model = dataclasses.replace(TINY_LLAMA, num_heads=2, num_kv_heads=2,
                                hidden_size=64, head_dim=32)
    r = 4
    eng = EngineConfig(model=model, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_OPA_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.0,
                                         residual_length=r, group_size=r),
                       max_seq_len=64)
    impl = make_cache(eng)
    cache = impl.init(1, jnp.float32)
    lc = {k: v[0] for k, v in cache.items()}
    assert lc["k_score"].shape == (1, r, model.num_kv_heads, model.head_dim)

    rs = np.random.RandomState(0)
    # prefill 2 tokens (below window), then decode steps with known q/k
    q0 = jnp.asarray(rs.randn(1, 2, 2, 32), jnp.float32)
    k0 = jnp.asarray(rs.randn(1, 2, 2, 32), jnp.float32)
    _, lc = impl.prefill_attend(lc, q0, k0, k0, jnp.int32(2))
    ring_hist = []
    for i in range(2, 10):
        qd = jnp.asarray(rs.randn(1, 1, 2, 32), jnp.float32)
        kd = jnp.asarray(rs.randn(1, 1, 2, 32), jnp.float32)
        _, lc = impl.decode_attend(lc, qd, kd, kd, jnp.int32(i))
        ring_hist.append(np.asarray(lc["k_score"]).copy())
    # after each step, the slot of the *next* exit token holds >0 scores once
    # it has been in the window; slots are zeroed when their token is pruned
    assert np.isfinite(ring_hist[-1]).all()
    # exit token at step i is i - r; its slot must be zero right after
    # accumulation only if it was just reset and got a fresh contribution
    assert (np.asarray(lc["k_score"]) >= 0).all()
