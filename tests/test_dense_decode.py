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
