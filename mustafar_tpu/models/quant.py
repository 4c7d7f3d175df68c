"""Weight-only int8 quantization (W8 serving).

Decode on TPU is weight-streaming-bound: at the bench shape the three MLP
matmuls alone move 352 MB/layer/step at the HBM roofline (docs/PERFORMANCE.md
round-2 profile).  Per-output-channel symmetric int8 halves that traffic —
XLA fuses the int8->bf16 widen + scale into the dot's operand read, so the
weights stream from HBM at 1 byte/elt with no materialized dequant copy
(measured: see docs/PERFORMANCE.md "Weight-only int8").  It also halves
resident weight memory, which is what lets the full 32-layer Llama-3-8B
geometry serve on a single 16 GiB chip next to its KV cache.

The reference has no quantization (fp16 end-to-end, pred_long_bench.py:110);
this is a beyond-reference serving capability.  Quantization here is
weight-only: activations, KV cache, and accumulation stay bf16/fp32 (the KV
cache has its own codecs — ops/quant_format.py q8/q8q4).

Format: each 2-D weight w [in, out] (stacked: [L, in, out]) becomes
  w_q  int8   same shape   round(w / s)
  s    f32    [out] ([L, out])   max|w| per output channel / 127
consumed as ``(x @ w_q.astype(bf16)) * s`` so every output channel's scale
multiplies once after the MXU dot.  The embedding table is quantized per row
(gather then scale); the LM head per vocab column.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# params keys quantized per output channel (axis -1); stacked leaves keep
# their leading layer axis.
_LAYER_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def _quant_last(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 over all axes except the last; scale per out-channel."""
    wf = w.astype(jnp.float32)
    red = tuple(range(w.ndim - 2, w.ndim - 1))  # the `in` axis
    amax = jnp.max(jnp.abs(wf), axis=red, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s.squeeze(w.ndim - 2)


def _quant_rows(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 per row (embedding table [V, H] -> scale [V])."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s[..., 0]


def quantize_params(params: dict, donate: bool = False) -> dict:
    """Quantize a llama params pytree to weight-only int8.

    Layer projections and the LM head get per-output-channel scales
    (``<name>_scale``); the embedding gets per-row scales.  Norm weights stay
    in their original dtype.  Idempotent on already-quantized params.

    Per-leaf jit keeps the fp32 temps fused (eager quantization materializes
    a whole-leaf fp32 copy — OOM next to a live serving cache); ``donate``
    frees each original leaf as it converts, so peak residency during
    conversion is one leaf, not two full weight sets.
    """
    ql = jax.jit(_quant_last, donate_argnums=(0,) if donate else ())
    qr = jax.jit(_quant_rows, donate_argnums=(0,) if donate else ())
    out = dict(params)
    layers = dict(params["layers"])
    for name in _LAYER_KEYS:
        w = layers.get(name)
        if w is None or w.dtype == jnp.int8:
            continue
        q, s = ql(w)
        layers[name] = q
        layers[name + "_scale"] = s
    out["layers"] = layers
    if params["embed"].dtype != jnp.int8:
        q, s = qr(params["embed"])
        out["embed"] = q
        out["embed_scale"] = s
    if "lm_head" in params and params["lm_head"].dtype != jnp.int8:
        q, s = ql(params["lm_head"])
        out["lm_head"] = q
        out["lm_head_scale"] = s
    return out


def proj(h: jnp.ndarray, lp: dict, name: str) -> jnp.ndarray:
    """h @ lp[name], dequantizing on the fly for int8 weights.

    The astype + scale fuse into the dot (weight-only-quant XLA pattern);
    scales apply per output channel in bf16 (exact: scale * int8 products
    stay well inside bf16 range for unit-scale activations).
    """
    w = lp[name]
    if w.dtype == jnp.int8:
        return (h @ w.astype(h.dtype)) * lp[name + "_scale"].astype(h.dtype)
    return h @ w


def embed_lookup(params: dict, tokens: jnp.ndarray, dtype) -> jnp.ndarray:
    emb = params["embed"]
    if emb.dtype == jnp.int8:
        return (emb[tokens].astype(dtype)
                * params["embed_scale"][tokens][..., None].astype(dtype))
    return emb[tokens]


def weight_bytes(params: dict) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(params))


def init_params_w8(cfg, key: jax.Array) -> dict:
    """Random-init params directly in W8 (benchmarking the full model).

    The full Llama-3-8B bf16 params are ~16 GiB — they never fit on one
    v5e-lite chip to be quantized in place, so stacked leaves are generated
    and quantized one LAYER slice at a time (bounded fp32 temps) and stacked
    as int8.  Mirrors models.llama.init_params' structure exactly.
    """
    H, Dq, Dkv, I, L = (cfg.hidden_size, cfg.q_dim, cfg.kv_dim,
                        cfg.intermediate_size, cfg.num_layers)
    k = iter(jax.random.split(key, 12))

    def stacked(key, in_dim, out_dim, scale=None):
        scale = scale or (1.0 / float(jnp.sqrt(in_dim)))

        @jax.jit
        def gen(kk):
            w = jax.random.normal(kk, (in_dim, out_dim), jnp.float32) * scale
            return _quant_last(w)

        qs = [gen(kk) for kk in jax.random.split(key, L)]
        return (jnp.stack([a for a, _ in qs]), jnp.stack([b for _, b in qs]))

    @jax.jit
    def gen_embed(kk):
        w = jax.random.normal(kk, (cfg.vocab_size, H), jnp.float32) * 0.02
        return _quant_rows(w)

    @jax.jit
    def gen_head(kk):
        w = jax.random.normal(kk, (H, cfg.vocab_size), jnp.float32) * 0.02
        return _quant_last(w)

    emb, emb_s = gen_embed(next(k))
    layers = {"attn_norm": jnp.ones((L, H), jnp.bfloat16),
              "mlp_norm": jnp.ones((L, H), jnp.bfloat16)}
    for name, din, dout in [("wq", H, Dq), ("wk", H, Dkv), ("wv", H, Dkv),
                            ("wo", Dq, H), ("w_gate", H, I), ("w_up", H, I),
                            ("w_down", I, H)]:
        q, s = stacked(next(k), din, dout)
        layers[name] = q
        layers[name + "_scale"] = s
    params = {"embed": emb, "embed_scale": emb_s, "layers": layers,
              "final_norm": jnp.ones((H,), jnp.bfloat16)}
    if not cfg.tie_word_embeddings:
        q, s = gen_head(next(k))
        params["lm_head"] = q
        params["lm_head_scale"] = s
    return params
