"""KV-cache pruning policies, pure JAX.

Reimplements the reference's pruning-strategy matrix (SURVEY.md §2.2) as pure
tensor->tensor (or tensor+state->tensor+state) functions:

- per-token magnitude   (reference llama_mustafar_Kt_Mag_Vt_Mag.py:66-146 ``dh_prune_key``)
- per-channel magnitude (reference llama_mustafar_Kt_Mag_Vc_Mag.py:108-173)
- per-token output-aware   (reference llama_mustafar_Kt_Mag_Vt_Opa.py:115-260,
  llama_mustafar_Kt_Opa_Vt_Mag.py:66-178)
- per-channel output-aware (reference llama_mustafar_Kt_Mag_Vc_Opa.py:115-250)
- ThinK / ThinV structured channel pruning (reference llama_think.py:74-106,
  llama_thinv.py:107-147)

Sparsity semantics follow the reference exactly: the threshold is the
``k = max(1, int(sparsity * n))``-th *smallest* |x| along the pruned axis and
elements with ``|x| >= threshold`` are kept, i.e. ``n - k + 1`` survivors
modulo ties (torch.kthvalue + ``>=`` mask in the reference).  ``exact=True``
switches to an exact top-``(n - k + 1)`` selection (deterministic count,
required for the static-shape compressed cache; ties broken by lower index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _kth_smallest_threshold(mag: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-th smallest value along the last axis (1-indexed), keepdims."""
    # sort ascending; index k-1
    return jnp.sort(mag, axis=-1)[..., k - 1 : k]


def keep_count(n: int, sparsity: float) -> int:
    """Survivor count per pruned row under the reference threshold rule."""
    if sparsity <= 0:
        return n
    k = max(1, int(sparsity * n))
    return n - k + 1


def magnitude_mask_lastdim(x: jnp.ndarray, sparsity: float, exact: bool = False) -> jnp.ndarray:
    """Boolean keep-mask pruning along the last axis by magnitude.

    Reference rule (llama_mustafar_Kt_Mag_Vt_Mag.py:85-97): keep
    ``|x| >= kthvalue(|x|, int(sparsity*n))``.
    """
    if sparsity <= 0:
        return jnp.ones(x.shape, dtype=bool)
    n = x.shape[-1]
    k = max(1, int(sparsity * n))
    mag = jnp.abs(x)
    if not exact:
        thr = _kth_smallest_threshold(mag, k)
        return mag >= thr
    kc = n - k + 1
    # top-kc by magnitude, deterministic tie-break by index.
    _, idx = jax.lax.top_k(mag, kc)
    mask = jnp.zeros(x.shape, dtype=bool)
    return _scatter_true(mask, idx)


def _scatter_true(mask: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    onehot = jax.nn.one_hot(idx, mask.shape[-1], dtype=jnp.int32).sum(axis=-2)
    return onehot > 0


def prune_token_mag(x: jnp.ndarray, sparsity: float, exact: bool = False) -> jnp.ndarray:
    """Per-token magnitude pruning along head_dim.

    x: [..., T, D] -> same shape with smallest-|x| entries of each token row zeroed.
    Reference: ``dh_prune_key`` / ``dh_prune_value``
    (llama_mustafar_Kt_Mag_Vt_Mag.py:66-146).
    """
    return jnp.where(magnitude_mask_lastdim(x, sparsity, exact), x, 0).astype(x.dtype)


def prune_channel_mag(x: jnp.ndarray, sparsity: float, group_size: int,
                      exact: bool = False) -> jnp.ndarray:
    """Per-channel magnitude pruning along the token axis, in groups.

    x: [..., T, D] with T divisible by group_size.  Within each group of
    ``group_size`` tokens, each channel keeps its largest-|x| entries across the
    token axis (reference llama_mustafar_Kt_Mag_Vc_Mag.py:108-173: kthvalue
    across the token axis per channel of each group).
    """
    if sparsity <= 0:
        return x
    *lead, T, D = x.shape
    assert T % group_size == 0, (T, group_size)
    g = x.reshape(*lead, T // group_size, group_size, D)
    gt = jnp.swapaxes(g, -1, -2)  # [..., G, D, group_size]
    mask = magnitude_mask_lastdim(gt, sparsity, exact)
    mask = jnp.swapaxes(mask, -1, -2).reshape(x.shape)
    return jnp.where(mask, x, 0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Output-aware (Opa) scoring.  The Opa variants keep running score
# accumulators as explicit state (reference keeps them as module attributes:
# ``key_score_accumulator`` llama_mustafar_Kt_Opa_Vt_Mag.py:709-710,
# ``value_score_accumulator`` llama_mustafar_Kt_Mag_Vt_Opa.py).
# ---------------------------------------------------------------------------

def key_opa_score(q_abs_mean: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Output-aware key score: |mean_over_queries(|q|) * k| elementwise.

    q_abs_mean: [..., D] per-kv-head mean |q| (query heads folded into their
    kv-head group, reference llama_mustafar_Kt_Opa_Vt_Mag.py:66-119).
    k: [..., T, D].
    """
    return jnp.abs(q_abs_mean[..., None, :] * k)


def value_opa_score(attn_w: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Output-aware value score: |attn_weight * v| per token/channel.

    attn_w: [..., T] post-softmax weights for the scored tokens (folded to
    kv-heads); v: [..., T, D].  Reference llama_mustafar_Kt_Mag_Vt_Opa.py:115-260.
    """
    return jnp.abs(attn_w[..., None] * v)


def prune_by_score_lastdim(x: jnp.ndarray, score: jnp.ndarray, sparsity: float,
                           exact: bool = False) -> jnp.ndarray:
    """Zero the lowest-score entries of each row (last axis), reference threshold rule."""
    if sparsity <= 0:
        return x
    n = x.shape[-1]
    k = max(1, int(sparsity * n))
    if not exact:
        thr = _kth_smallest_threshold(score, k)
        mask = score >= thr
    else:
        _, idx = jax.lax.top_k(score, n - k + 1)
        mask = _scatter_true(jnp.zeros(x.shape, bool), idx)
    return jnp.where(mask, x, 0).astype(x.dtype)


def prune_channel_by_score(x: jnp.ndarray, score: jnp.ndarray, sparsity: float,
                           group_size: int, exact: bool = False) -> jnp.ndarray:
    """Per-channel pruning along the token axis by an arbitrary score.

    Reference llama_mustafar_Kt_Mag_Vc_Opa.py:115-250 (sort along token axis,
    keep top tokens per channel of each group).
    """
    if sparsity <= 0:
        return x
    *lead, T, D = x.shape
    g = jnp.swapaxes(x.reshape(*lead, T // group_size, group_size, D), -1, -2)
    s = jnp.swapaxes(score.reshape(*lead, T // group_size, group_size, D), -1, -2)
    out = prune_by_score_lastdim(g, s, sparsity, exact)
    return jnp.swapaxes(out, -1, -2).reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# ThinK / ThinV structured channel pruning (prefill-only baselines).
# ---------------------------------------------------------------------------

def think_prune_key(k: jnp.ndarray, q: jnp.ndarray, sparsity: float,
                    last_queries: int = 32) -> jnp.ndarray:
    """ThinK (Xu et al.) query-driven structured channel pruning of K.

    Score per channel = mean(q[-last_queries:]**2) * mean(k**2); zero the
    lowest ``int(sparsity*D)`` channels for *all* tokens.  Applied once at
    prefill (reference llama_think.py:74-106, call at :1029).

    k: [B, Hkv, T, D]; q: [B, Hq, T, D] (query heads folded into kv groups).
    """
    if sparsity <= 0:
        return k
    B, Hkv, T, D = k.shape
    Hq = q.shape[1]
    groups = Hq // Hkv
    qg = q.reshape(B, Hkv, groups, T, D)
    q_score = jnp.mean(qg[..., -last_queries:, :].astype(jnp.float32) ** 2, axis=(2, 3))
    k_score = jnp.mean(k.astype(jnp.float32) ** 2, axis=2)
    score = q_score * k_score                      # [B, Hkv, D]
    n_prune = int(sparsity * D)
    if n_prune == 0:
        return k
    # keep channels NOT among the lowest n_prune.
    _, idx = jax.lax.top_k(-score, n_prune)        # lowest-score channels
    drop = _scatter_true(jnp.zeros(score.shape, bool), idx)
    return jnp.where(drop[:, :, None, :], 0, k).astype(k.dtype)


def thinv_prune_value(v: jnp.ndarray, sparsity: float) -> jnp.ndarray:
    """ThinV structured channel pruning of V: score = mean(v**2) per channel.

    Reference llama_thinv.py:107-147 (``value_pruner_attention_driven``),
    prefill-only.
    """
    if sparsity <= 0:
        return v
    D = v.shape[-1]
    score = jnp.mean(v.astype(jnp.float32) ** 2, axis=-2)  # [..., D]
    n_prune = int(sparsity * D)
    if n_prune == 0:
        return v
    _, idx = jax.lax.top_k(-score, n_prune)
    drop = _scatter_true(jnp.zeros(score.shape, bool), idx)
    return jnp.where(drop[..., None, :], 0, v).astype(v.dtype)


def sparsity_of(x: jnp.ndarray) -> jnp.ndarray:
    """Fraction of zero elements (reference ``calculate_sparsity`` debug helper,
    llama_mustafar_Kt_Mag_Vt_Mag.py:301-321)."""
    return jnp.mean((x == 0).astype(jnp.float32))
