"""Pure-functional Llama-2/3 and Mistral forward pass, TPU-first.

Replaces the reference's fork-and-patch HF modeling files
(models/llama_mustafar_*.py, models/mistral_mustafar_*.py — each ~1.5k LoC of
copied transformers code) with one ~200-line functional implementation:

- params are a pytree with per-layer leaves stacked on axis 0 so the layer
  loop is a single ``lax.scan`` (compile time independent of depth, vs the
  reference's python per-layer loop llama_mustafar_Kt_Mag_Vt_Mag.py:1377-1412);
- GQA is handled by einsum folding (no repeat_kv materialization, reference
  :873,974);
- Mistral differs only by config (sliding_window), not by a copied file
  (reference mistral_mustafar_Kt_Mag_Vt_Mag.py:983-989).

The attention/cache behaviour (dense / masked-pruned / compressed-sparse) is
delegated to a cache impl (mustafar_tpu.cache) so every pruning variant shares
this single model definition.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from mustafar_tpu.config import ModelConfig
from mustafar_tpu.models.rope import apply_rope, rope_cos_sin


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Random-init params (tests/benches; real weights come from models.weights).

    Layer-stacked leaves are generated one layer at a time inside jit so the
    fp32 temps stay bounded to a single layer slice (an eager stacked
    w_gate for 8B geometry is a 3.5 GiB fp32 temp PER LEAF — enough to OOM a
    16 GiB chip that already holds earlier leaves; same discipline as
    models/quant.py init_params_w8)."""
    k = iter(jax.random.split(key, 12))
    H, Dq, Dkv, I, L = (cfg.hidden_size, cfg.q_dim, cfg.kv_dim,
                        cfg.intermediate_size, cfg.num_layers)

    def w(key, *shape, scale=None):
        scale = scale or (1.0 / jnp.sqrt(shape[-2] if len(shape) > 1 else shape[-1]))
        if len(shape) == 3 and shape[0] == L:  # layer-stacked leaf
            gen = jax.jit(lambda kk: (jax.random.normal(
                kk, shape[1:], jnp.float32) * scale).astype(dtype))
            return jnp.stack([gen(kk) for kk in jax.random.split(key, L)])
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    params = {
        "embed": w(next(k), cfg.vocab_size, H, scale=0.02),
        "layers": {
            "attn_norm": jnp.ones((L, H), dtype),
            "wq": w(next(k), L, H, Dq),
            "wk": w(next(k), L, H, Dkv),
            "wv": w(next(k), L, H, Dkv),
            "wo": w(next(k), L, Dq, H),
            "mlp_norm": jnp.ones((L, H), dtype),
            "w_gate": w(next(k), L, H, I),
            "w_up": w(next(k), L, H, I),
            "w_down": w(next(k), L, I, H),
        },
        "final_norm": jnp.ones((H,), dtype),
    }
    if cfg.num_experts:
        from mustafar_tpu.models.moe import init_moe_params
        for name in ("w_gate", "w_up", "w_down"):
            del params["layers"][name]
        params["layers"].update(init_moe_params(cfg, next(k), dtype))
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(next(k), H, cfg.vocab_size, scale=0.02)
    return params


_MLP_SEG = 512  # prefill MLP token-segment size (bounds the [B, T, I] temp)

# Per-trace override of the segment size (ADVICE r4: sp_prefill used to
# monkey-patch the module global, which would corrupt a concurrently traced
# non-SP prefill in the same process).  A ContextVar scopes the override to
# the calling trace/thread; None means "use _MLP_SEG".
from contextvars import ContextVar
_MLP_SEG_OVERRIDE: ContextVar = ContextVar("mustafar_mlp_seg", default=None)


def _mlp(lp: dict, h: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU MLP, token-segmented for long prefill.

    The full-length gate*up intermediate is [B, T, I] (3.06 GiB at
    B=32/T=3.5k/I=14336 — measured the top HLO temp); computing it in
    _MLP_SEG-token segments bounds the temp without touching cache logic.
    """
    from mustafar_tpu.models.quant import proj
    B, T, H = h.shape
    seg = _MLP_SEG_OVERRIDE.get()
    _seg = _MLP_SEG if seg is None else seg

    if "w_gateup" in lp:            # fused layout (quant.fuse_projections)
        def gated(seg):
            gu = proj(seg, lp, "w_gateup")
            g, u = jnp.split(gu, 2, axis=-1)
            return proj(jax.nn.silu(g) * u, lp, "w_down")
    else:
        def gated(seg):
            return proj(jax.nn.silu(proj(seg, lp, "w_gate"))
                        * proj(seg, lp, "w_up"), lp, "w_down")

    if T <= _seg or T % _seg:
        return gated(h)
    n = T // _seg
    hs = jnp.swapaxes(h.reshape(B, n, _seg, H), 0, 1)          # [n, B, seg, H]
    out = jax.lax.map(gated, hs)
    return jnp.swapaxes(out, 0, 1).reshape(B, T, H)


def _layer(cfg: ModelConfig, lp: dict, x: jnp.ndarray, cos, sin, attend_fn, lc):
    """One decoder layer. x: [B,T,H]; attend_fn(lc, q, k, v) -> (out, lc)."""
    from mustafar_tpu.models.quant import proj
    B, T, H = x.shape
    h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
    if "wqkv" in lp:                # fused layout (quant.fuse_projections)
        qkv = proj(h, lp, "wqkv")
        q, kk, vv = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim],
                              axis=-1)
        q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
        kk = kk.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        vv = vv.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    else:
        q = proj(h, lp, "wq").reshape(B, T, cfg.num_heads, cfg.head_dim)
        kk = proj(h, lp, "wk").reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        vv = proj(h, lp, "wv").reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    kk = apply_rope(kk, cos, sin)
    attn_out, lc = attend_fn(lc, q, kk, vv)
    x = x + proj(attn_out.reshape(B, T, cfg.q_dim), lp, "wo")
    h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
    if "w_router" in lp:                       # Mixtral-style sparse MoE MLP
        from mustafar_tpu.models.moe import moe_mlp
        x = x + moe_mlp(cfg, lp, h)
    else:
        x = x + _mlp(lp, h)
    return x, lc


def forward(cfg: ModelConfig, params: dict, tokens: jnp.ndarray, cache: Any,
            cache_impl, positions: jnp.ndarray, mode: str, aux,
            last_only: bool = False) -> tuple[jnp.ndarray, Any]:
    """Shared forward: mode in {"prefill", "decode"}.

    tokens: [B, T] int32; positions: [T] int32 absolute positions; aux is
    ``true_len`` (prefill) or ``pos`` (decode) passed to the cache impl.
    ``last_only`` computes the LM head only at position ``true_len - 1``
    (returns [B, 1, V]) — the full-vocab logits for every prompt position are
    [B, T, V] fp32 (e.g. 14.7 GiB at B=32/T=3.5k/V=32k) and only the last row
    feeds generation.  Returns (logits, new cache).
    """
    from mustafar_tpu.models.quant import embed_lookup
    x = embed_lookup(params, tokens, params["final_norm"].dtype)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)

    # Three cache-threading mechanisms, chosen by the cache impl per mode:
    #
    # * STACKED protocol (<mode>_stacked_ro / <mode>_stacked_rw): the big
    #   buffers are never sliced per layer.  Read-only keys (compressed
    #   pools) are closure-captured whole; read-write keys (KV windows) ride
    #   the scan carry whole, and the impl's attend receives (full, li) and
    #   returns the updated full buffers (a one-token dynamic_update_slice).
    #   Rationale: a per-layer dynamic-slice feeding a pallas_call cannot
    #   fuse — XLA materializes the whole slice in HBM (measured 0.157
    #   ms/layer for the pool + ~0.24 ms/layer for the windows at the bench
    #   shape), and a scan ys restack forces the enclosing while_loop to
    #   copy it back into its carry every token (2 x 0.9 ms/step).
    # * <mode>_carry_keys: per-layer slices threaded through the scan carry
    #   via dynamic_index/dynamic_update (dense/masked caches — their XLA
    #   attention consumes a per-layer slice anyway; this still kills the
    #   while-carry copy).
    # * <mode>_invariant_keys: scanned as xs but excluded from ys (keys the
    #   step never writes).
    if mode == "decode":
        pfx = "decode"
    elif mode == "prefill_segment":
        pfx = "segment"
    else:
        pfx = None
    get = lambda attr: tuple(getattr(cache_impl, f"{pfx}_{attr}", ())) \
        if pfx else ()
    ro_keys, rw_keys = get("stacked_ro"), get("stacked_rw")
    carry_keys = get("carry_keys")
    inv_keys = tuple(k for k in get("invariant_keys")
                     if k not in ro_keys + rw_keys)
    stacked = bool(ro_keys or rw_keys)

    if mode == "prefill":
        def attend(lc, q, k, v):
            return cache_impl.prefill_attend(lc, q, k, v, aux)
    elif mode == "prefill_segment":
        seg_start, true_len = aux
        if stacked:
            def attend_stk(lc, q, k, v, full, li):
                return cache_impl.segment_attend(lc, q, k, v, seg_start,
                                                 true_len, full, li)
        else:
            def attend(lc, q, k, v):
                return cache_impl.segment_attend(lc, q, k, v, seg_start,
                                                 true_len)
    else:
        if stacked:
            def attend_stk(lc, q, k, v, full, li):
                return cache_impl.decode_attend(lc, q, k, v, aux, full, li)
        else:
            def attend(lc, q, k, v):
                return cache_impl.decode_attend(lc, q, k, v, aux)

    ro = {k: cache[k] for k in ro_keys}
    skip_xs = set(ro_keys) | set(rw_keys) | set(carry_keys)
    carried = {k: cache[k] for k in rw_keys + carry_keys}
    xs_cache = {k: v for k, v in cache.items() if k not in skip_xs}
    L = cfg.num_layers

    # W4 nibble carriers follow the STACKED protocol like the compressed
    # pools: a per-layer scan slice feeding a pallas_call cannot fuse (XLA
    # materializes the whole [din/4, dout] carrier copy — measured 40
    # us/projection/layer), so the stacked leaves are closure-captured and
    # the kernel indexes the layer via scalar prefetch (models/quant.py
    # _w4_dot, ops/kernels/w4_matmul.py).
    layers_all = params["layers"]
    w4_names = tuple(k for k, v in layers_all.items()
                     if getattr(v, "dtype", None) == jnp.int16)
    w4_set = set(w4_names) | {k + "_scale" for k in w4_names}
    lp_stacked = {k: layers_all[k] for k in w4_set}
    lp_xs = {k: v for k, v in layers_all.items() if k not in w4_set}

    def body(carry, layer_in):
        x, carried = carry
        li, lp, lc = layer_in
        if lp_stacked:
            lp = dict(lp, _li=li, **lp_stacked)
        if stacked:
            full = dict(ro, **carried)

            def attend_l(lc_, q_, k_, v_):
                out, lc2, upd = attend_stk(lc_, q_, k_, v_, full, li)
                return out, dict(lc2, _stk_upd=upd)

            x, lc = _layer(cfg, lp, x, cos, sin, attend_l, lc)
            lc = dict(lc)
            carried = dict(carried, **lc.pop("_stk_upd"))
        else:
            if carry_keys:
                lc = dict(lc, **{k: jax.lax.dynamic_index_in_dim(
                    carried[k], li, 0, keepdims=False) for k in carry_keys})
            x, lc = _layer(cfg, lp, x, cos, sin, attend, lc)
            if carry_keys:
                lc = dict(lc)
                carried = {k: jax.lax.dynamic_update_index_in_dim(
                    carried[k], lc.pop(k).astype(carried[k].dtype), li, 0)
                    for k in carry_keys}
        if inv_keys:
            lc = {k: v for k, v in lc.items() if k not in inv_keys}
        return (x, carried), lc

    (x, carried), new_cache = jax.lax.scan(
        body, (x, carried),
        (jnp.arange(L, dtype=jnp.int32), lp_xs, xs_cache))
    new_cache = dict(new_cache, **carried, **ro)
    if inv_keys:
        new_cache = dict(new_cache, **{k: cache[k] for k in inv_keys})
    if mode == "prefill_segment" and hasattr(cache_impl, "finalize_segment"):
        new_cache = cache_impl.finalize_segment(cache, new_cache)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if last_only:
        if mode == "prefill_segment":
            seg_start, true_len = aux
            idx = jnp.clip(true_len - 1 - seg_start, 0, tokens.shape[1] - 1)
        else:
            idx = jnp.maximum(aux - 1, 0)
        x = jax.lax.dynamic_slice_in_dim(x, idx, 1, axis=1)
    logits = _lm_head(cfg, params, x)
    return logits, new_cache


def _lm_head(cfg: ModelConfig, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """fp32 logits; int8 heads dequantize per vocab column in the dot.

    (W4 keeps the LM head at int8 — logits are the most quantization-
    sensitive tensor and the 128k vocab tiles poorly; models/quant.py.)"""
    if cfg.tie_word_embeddings:
        head, scale = params["embed"].T, params.get("embed_scale")
    else:
        head, scale = params["lm_head"], params.get("lm_head_scale")
    if head.dtype == jnp.int8 and "act_quant" in params:
        from mustafar_tpu.models.quant import w8a8_dot
        return w8a8_dot(x, head, scale, out_dtype=jnp.float32)
    logits = (x @ head.astype(x.dtype)).astype(jnp.float32)
    if head.dtype == jnp.int8:
        logits = logits * scale
    return logits


def lm_forward(cfg: ModelConfig, params: dict, tokens: jnp.ndarray,
               true_len=None, remat: bool = False) -> jnp.ndarray:
    """Cache-free causal LM forward: tokens [B, T] -> fp32 logits [B, T, V].

    The training / teacher-forced-scoring entry point (the reference has no
    training path; this exists so accuracy evidence can be produced on real
    learned weights — see harness/tinylm.py).  Differentiable end to end.

    ``remat``: rematerialize each layer on the backward pass (jax.checkpoint
    over the layer scan body) — residency drops from every intermediate of
    every layer to one [B, T, H] residual per layer boundary, the standard
    TPU memory/FLOPs trade.  8k-context training of the h768/L12 accuracy
    model needs 29 GiB without it and fits a 16 GiB chip with it.
    """
    from mustafar_tpu.models.quant import embed_lookup
    B, T = tokens.shape
    x = embed_lookup(params, tokens, params["final_norm"].dtype)
    cos, sin = rope_cos_sin(jnp.arange(T), cfg.head_dim, cfg.rope_theta,
                            cfg.rope_scaling)
    tl = T if true_len is None else true_len

    def attend(lc, q, k, v):
        from mustafar_tpu.ops.attention import prefill_attention
        return prefill_attention(q, k, v, tl, cfg.sliding_window), lc

    def body(x, lp):
        x, _ = _layer(cfg, lp, x, cos, sin, attend, None)
        return x, None

    x, _ = jax.lax.scan(jax.checkpoint(body) if remat else body,
                        x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return _lm_head(cfg, params, x)


def prefill(cfg: ModelConfig, params, tokens, cache, cache_impl, true_len,
            last_only: bool = False):
    """tokens [B, Tpad]; true_len scalar (uniform valid length, left-aligned)."""
    positions = jnp.arange(tokens.shape[1])
    return forward(cfg, params, tokens, cache, cache_impl, positions, "prefill",
                   true_len, last_only=last_only)


def prefill_chunked(cfg: ModelConfig, params, tokens, cache, cache_impl,
                    true_len):
    """Chunked (segment-streamed) prefill over the compressed cache.

    tokens [B, T] with T a multiple of the cache chunk size C; the prompt is
    processed C tokens at a time through the whole stack, each segment
    attending to (packed pools ++ window ++ causal self) via
    CompressedKVCache.segment_attend.  Activation memory is O(B*C) instead of
    O(B*T) — the monolithic-prefill [B,T,*] projection/MLP temps are the
    single-chip context limiter (docs/PERFORMANCE.md).  Returns
    (last-token logits [B, 1, V], cache); with the generator's C-aligned
    prompt bucketing the last segment always contains position true_len - 1.
    """
    B, T = tokens.shape
    C = cache_impl.C
    assert T % C == 0, (T, C)
    n_seg = T // C
    segs = jnp.swapaxes(tokens.reshape(B, n_seg, C), 0, 1)     # [n_seg, B, C]

    def body(carry, seg_in):
        cache, last_logits = carry
        s, seg_tokens = seg_in
        seg_start = s * C
        positions = seg_start + jnp.arange(C)
        logits, cache = forward(cfg, params, seg_tokens, cache, cache_impl,
                                positions, "prefill_segment",
                                (seg_start, true_len), last_only=True)
        is_last = (seg_start + C) >= jnp.int32(T)
        last_logits = jnp.where(is_last, logits, last_logits)
        return (cache, last_logits), None

    init_logits = jnp.zeros((B, 1, cfg.vocab_size), jnp.float32)
    (cache, last_logits), _ = jax.lax.scan(
        body, (cache, init_logits), (jnp.arange(n_seg), segs))
    return last_logits, cache


def decode_step(cfg: ModelConfig, params, token, cache, cache_impl, pos):
    """token [B, 1]; pos int32 — scalar (uniform) or [B] (per-slot) index of
    this token."""
    pos = jnp.asarray(pos)
    positions = pos[None] if pos.ndim == 0 else pos[:, None]   # [1] or [B,1]
    return forward(cfg, params, token, cache, cache_impl, positions, "decode", pos)
