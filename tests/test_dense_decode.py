"""Dense flash-decode kernel vs XLA attention (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mustafar_tpu.ops.kernels.dense_decode import flash_decode_attention


def _ref(q, k, v, pos_v, window=None):
    B, _, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    bf = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    out = np.zeros((B, 1, Hq, D), np.float32)
    for b in range(B):
        kk = bf(k)[b].transpose(1, 0, 2)
        vv = bf(v)[b].transpose(1, 0, 2)
        qg = bf(q)[b, 0].reshape(Hkv, G, D)
        lg = np.einsum("hgd,hsd->hgs", qg, kk) / np.sqrt(D)
        mask = np.arange(S)[None, None, :] <= pos_v[b]
        if window is not None:
            mask &= np.arange(S)[None, None, :] > pos_v[b] - window
        lg = np.where(mask, lg, -1e30)
        w = np.asarray(jax.nn.softmax(jnp.asarray(lg), -1))
        out[b, 0] = np.einsum("hgs,hsd->hgd", w, vv).reshape(Hq, D)
    return out


@pytest.mark.parametrize("pos_mode", ["scalar", "vector"])
def test_flash_decode_matches_xla(pos_mode):
    rs = np.random.RandomState(0)
    B, S, Hkv, G, D = 2, 1024, 2, 4, 128
    Hq = Hkv * G
    k = rs.randn(B, S, Hkv, D).astype(np.float32)
    v = rs.randn(B, S, Hkv, D).astype(np.float32)
    q = rs.randn(B, 1, Hq, D).astype(np.float32)
    if pos_mode == "scalar":
        pos = jnp.int32(700)
        pos_v = np.array([700, 700])
    else:
        pos = jnp.asarray(np.array([100, 999], np.int32))
        pos_v = np.array([100, 999])
    got = np.asarray(flash_decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k), jnp.asarray(v), pos),
        np.float32)
    want = _ref(q, k, v, pos_v)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_flash_decode_sliding_window():
    rs = np.random.RandomState(1)
    B, S, Hkv, G, D = 1, 512, 2, 2, 128
    Hq = Hkv * G
    k = rs.randn(B, S, Hkv, D).astype(np.float32)
    v = rs.randn(B, S, Hkv, D).astype(np.float32)
    q = rs.randn(B, 1, Hq, D).astype(np.float32)
    pos_v = np.array([400])
    got = np.asarray(flash_decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(pos_v, jnp.int32), window=128), np.float32)
    want = _ref(q, k, v, pos_v, window=128)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_flash_decode_return_norm_reconstructs_probs():
    """p = exp(s - m)/l from the kernel's final stats must equal the XLA
    softmax weights at any column (the Opa decode scoring contract)."""
    rs = np.random.RandomState(2)
    B, S, Hkv, G, D = 2, 256, 2, 2, 128
    Hq = Hkv * G
    k = rs.randn(B, S, Hkv, D).astype(np.float32)
    v = rs.randn(B, S, Hkv, D).astype(np.float32)
    q = rs.randn(B, 1, Hq, D).astype(np.float32)
    pos_v = np.array([200, 130])
    out, m, l = flash_decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(pos_v, jnp.int32), return_norm=True)
    m, l = np.asarray(m), np.asarray(l)
    # reconstruct probs for a few columns and compare to the XLA softmax
    qg = q[:, 0].reshape(B, Hkv, G, D)
    s = np.einsum("bhgd,bshd->bhgs", qg, k) / np.sqrt(D)
    for b in range(B):
        cols = np.arange(pos_v[b] + 1)
        w_ref = np.exp(s[b][..., cols] - s[b][..., cols].max(-1, keepdims=True))
        w_ref /= w_ref.sum(-1, keepdims=True)
        w_got = np.exp(s[b][..., cols] - m[b]) / l[b]
        np.testing.assert_allclose(w_got, w_ref, rtol=4e-2, atol=4e-2)


def test_opa_decode_kernel_path_matches_xla_path():
    """Vt_Opa decode through the flash kernel + window-stat reconstruction
    must match the full-weights XLA path (outputs, cache, ring scores)."""
    import dataclasses
    from mustafar_tpu.config import (CacheMode, EngineConfig, PruneConfig,
                                     PruneMethod, TINY_LLAMA)
    from mustafar_tpu.cache import MaskedKVCache

    model = dataclasses.replace(TINY_LLAMA, num_heads=4, num_kv_heads=2,
                                hidden_size=512, head_dim=128)
    r = 4
    eng = EngineConfig(model=model, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_OPA,
                                         k_sparsity=0.5, v_sparsity=0.5,
                                         residual_length=r, group_size=r),
                       max_seq_len=64)
    impl_x = MaskedKVCache(eng, use_pallas=False, stacked_decode=False)
    impl_p = MaskedKVCache(eng, use_pallas=True, stacked_decode=False)
    rs = np.random.RandomState(3)
    q0 = jnp.asarray(rs.randn(1, 8, 4, 128) / 8, jnp.float32)
    k0 = jnp.asarray(rs.randn(1, 8, 2, 128) / 8, jnp.float32)
    v0 = jnp.asarray(rs.randn(1, 8, 2, 128) / 8, jnp.float32)
    lcs = []
    for impl in (impl_x, impl_p):
        lc = {kk: vv[0] for kk, vv in impl.init(1, jnp.float32).items()}
        _, lc = impl.prefill_attend(lc, q0, k0, v0, jnp.int32(8))
        lcs.append(lc)
    for i in range(8, 18):
        qd = jnp.asarray(rs.randn(1, 1, 4, 128) / 8, jnp.float32)
        kd = jnp.asarray(rs.randn(1, 1, 2, 128) / 8, jnp.float32)
        vd = jnp.asarray(rs.randn(1, 1, 2, 128) / 8, jnp.float32)
        outs = []
        for j, impl in enumerate((impl_x, impl_p)):
            o, lcs[j] = impl.decode_attend(lcs[j], qd, kd, vd, jnp.int32(i))
            outs.append(np.asarray(o, np.float32))
        np.testing.assert_allclose(outs[0], outs[1], rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(lcs[0]["v_score"]),
                               np.asarray(lcs[1]["v_score"]),
                               rtol=5e-2, atol=5e-2)
    # the pruned V rows (zero pattern) must agree between paths
    vx = np.asarray(lcs[0]["v"])[:, :8]
    vp = np.asarray(lcs[1]["v"])[:, :8]
    np.testing.assert_array_equal(vx == 0, vp == 0)
