"""Banded sliding-window prefill (ops/attention.banded_window_prefill).

VERDICT r3 item 3: the `window is not None` prefill fallback materialized
[B,T,Hq,T] fp32 logits (quadratic — the reference's 31.5k Mistral prompt,
config/model2maxlen.json, cannot run that way).  The banded path computes
each Bq-query block against only its (W+Bq)-key band; these tests pin
exactness against the quadratic masked reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mustafar_tpu.ops.attention import (banded_window_prefill, causal_mask,
                                        mha, prefill_attention)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


def _quadratic_ref(q, k, v, true_len, window):
    T = q.shape[1]
    pos = jnp.arange(T)
    return mha(q, k, v, causal_mask(pos, pos, true_len, window))


@pytest.mark.parametrize("T,W,block", [
    (300, 64, 128),    # T not a multiple of block
    (256, 100, 128),   # W not a multiple of anything
    (384, 200, 128),   # W > block
    (130, 64, 128),    # ragged tail block
])
def test_banded_matches_quadratic(T, W, block):
    B, Hq, Hkv, D = 2, 4, 2, 16
    q = _rand((B, T, Hq, D), 0)
    k = _rand((B, T, Hkv, D), 1)
    v = _rand((B, T, Hkv, D), 2)
    tl = T - 7
    ref = _quadratic_ref(q, k, v, tl, W)
    out = banded_window_prefill(q, k, v, tl, W, block=block)
    np.testing.assert_allclose(np.asarray(out[:, :tl]), np.asarray(ref[:, :tl]),
                               rtol=1e-5, atol=1e-5)


def test_banded_traced_true_len_under_jit():
    B, T, Hq, Hkv, D, W = 1, 260, 4, 4, 8, 96
    q = _rand((B, T, Hq, D), 3)
    k = _rand((B, T, Hkv, D), 4)
    v = _rand((B, T, Hkv, D), 5)

    f = jax.jit(lambda tl: banded_window_prefill(q, k, v, tl, W, block=128))
    for tl in (40, 200, 260):   # true_len < W, mid, full
        ref = _quadratic_ref(q, k, v, tl, W)
        out = f(jnp.int32(tl))
        np.testing.assert_allclose(np.asarray(out[:, :tl]),
                                   np.asarray(ref[:, :tl]),
                                   rtol=1e-5, atol=1e-5)


def test_prefill_attention_routes_window():
    """prefill_attention must produce windowed-exact output both when the
    window is active (T > W -> banded) and vacuous (T <= W -> causal)."""
    B, Hq, Hkv, D = 2, 4, 2, 16
    for T, W in [(200, 64), (50, 64)]:
        q = _rand((B, T, Hq, D), 6)
        k = _rand((B, T, Hkv, D), 7)
        v = _rand((B, T, Hkv, D), 8)
        ref = _quadratic_ref(q, k, v, T, W)
        out = prefill_attention(q, k, v, T, window=W)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_banded_block_autoselect():
    """Default block selection path (block=None) stays exact."""
    B, T, Hq, Hkv, D, W = 1, 700, 2, 2, 8, 256
    q = _rand((B, T, Hq, D), 9)
    k = _rand((B, T, Hkv, D), 10)
    v = _rand((B, T, Hkv, D), 11)
    ref = _quadratic_ref(q, k, v, T, W)
    out = banded_window_prefill(q, k, v, T, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
