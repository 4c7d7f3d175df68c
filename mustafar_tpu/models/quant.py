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


def _quant_block4(w: jnp.ndarray, block: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int4 with per-(contraction-block, out-channel) scales.

    Per-channel scales are enough at 8 bits but too coarse at 4; blocked
    scales along the `in` axis (GPTQ/AWQ-style, block 128) recover most of
    the loss.  w [..., in, out] -> q int4 same shape, s f32 [..., in/block, out].
    """
    wf = w.astype(jnp.float32)
    *lead, din, dout = wf.shape
    nb = din // block
    wb = wf.reshape(*lead, nb, block, dout)
    amax = jnp.max(jnp.abs(wb), axis=-2, keepdims=True)
    s = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wb / s), -7, 7).astype(jnp.int4)
    return q.reshape(*lead, din, dout), s.squeeze(-2)


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
    """h @ lp[name], dequantizing on the fly for int8/int4 weights.

    int8: the astype + per-out-channel scale fuse into the dot (weight-only
    -quant XLA pattern); scale * int8 products stay well inside bf16 range.
    int4: scales are per (contraction block, out channel), so they cannot
    move past the full contraction — the dot runs blocked (batch dim = block
    index) on the raw widened int4 and the scales multiply the [..., nb, out]
    PARTIALS before the block-sum.  The weight read stays a pure convert
    (fusable); nothing dequantized is ever materialized.
    """
    w = lp[name]
    if w.dtype == jnp.int4:
        return _blocked_dot(h, w, lp[name + "_scale"])
    if w.dtype == jnp.int8:
        return (h @ w.astype(h.dtype)) * lp[name + "_scale"].astype(h.dtype)
    return h @ w


def _blocked_dot(h: jnp.ndarray, w: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """h [..., in] @ int4 w [in, out] with scales s [in/block, out].

    Decode (few tokens, weight-streaming-bound): blocked dot — batch dim =
    block index, f32 partials [..., nb, out] (tiny at T=1), scales applied
    to the partials.  The weight read stays a pure int4->bf16 convert.
    Prefill (many tokens, compute-bound): a [..., nb, out] f32 partial
    buffer would dwarf the weight itself, so dequantize the weight into a
    transient bf16 copy instead — one extra weight-sized write+read,
    amortized over every token of the segment.
    """
    din, dout = w.shape
    nb = s.shape[0]
    tokens = 1
    for d in h.shape[:-1]:
        tokens *= d
    if tokens > 64:
        wf = (w.astype(h.dtype).reshape(nb, din // nb, dout)
              * s.astype(h.dtype)[:, None, :]).reshape(din, dout)
        return h @ wf
    wf = w.astype(h.dtype).reshape(nb, din // nb, dout)
    hx = h.reshape(*h.shape[:-1], nb, din // nb)
    # each partial is one 128-term MXU dot (f32 accumulate, one output
    # round); the scale multiply and nb-way block sum run in f32.  (A
    # bf16xbf16=f32 dot would skip the round but the CPU backend used for
    # tests cannot execute it.)
    partial = jnp.einsum("...nk,nko->...no", hx, wf)
    return (partial.astype(jnp.float32) * s).sum(-2).astype(h.dtype)


def quantize_params_w4(params: dict, block: int = 128,
                       donate: bool = False) -> dict:
    """Quantize a llama params pytree to weight-only int4 (blocked scales).

    Layer projections and the LM head become int4 with per-(128-block,
    out-channel) scales; the embedding stays per-row int8 (it is gathered,
    not streamed — a per-step traffic rounding error — and rows tolerate
    8-bit better than 4).  Norm weights keep their dtype.  Idempotent.
    """
    q4 = jax.jit(_quant_block4, static_argnums=(1,),
                 donate_argnums=(0,) if donate else ())
    qr = jax.jit(_quant_rows, donate_argnums=(0,) if donate else ())

    def blk(din):     # largest divisor of the in dim <= block
        b = block
        while din % b:
            b //= 2
        return b

    out = dict(params)
    layers = dict(params["layers"])
    for name in _LAYER_KEYS:
        w = layers.get(name)
        if w is None or w.dtype in (jnp.int4, jnp.int8):
            continue
        q, s = q4(w, blk(w.shape[-2]))
        layers[name] = q
        layers[name + "_scale"] = s
    out["layers"] = layers
    if params["embed"].dtype not in (jnp.int4, jnp.int8):
        q, s = qr(params["embed"])
        out["embed"] = q
        out["embed_scale"] = s
    if "lm_head" in params and params["lm_head"].dtype not in (jnp.int4,
                                                               jnp.int8):
        q, s = q4(params["lm_head"], blk(params["lm_head"].shape[-2]))
        out["lm_head"] = q
        out["lm_head_scale"] = s
    return out


def embed_lookup(params: dict, tokens: jnp.ndarray, dtype) -> jnp.ndarray:
    emb = params["embed"]
    if emb.dtype == jnp.int8:
        return (emb[tokens].astype(dtype)
                * params["embed_scale"][tokens][..., None].astype(dtype))
    return emb[tokens]


def weight_bytes(params: dict) -> int:
    def nb(x):
        if x.dtype == jnp.int4:
            return (x.size + 1) // 2   # XLA packs two s4 per byte in HBM
        return x.nbytes                # (jax .nbytes reports 1 byte/elt)
    return sum(nb(x) for x in jax.tree.leaves(params))


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


def init_params_w4(cfg, key: jax.Array, block: int = 128) -> dict:
    """Random-init params directly in W4 (blocked int4; embed stays int8).

    Same one-layer-at-a-time generation discipline as init_params_w8 so the
    fp32 temps stay bounded on a 16 GiB chip.
    """
    H, Dq, Dkv, I, L = (cfg.hidden_size, cfg.q_dim, cfg.kv_dim,
                        cfg.intermediate_size, cfg.num_layers)
    k = iter(jax.random.split(key, 12))

    def stacked(key, in_dim, out_dim, scale=None):
        scale = scale or (1.0 / float(jnp.sqrt(in_dim)))

        @jax.jit
        def gen(kk):
            w = jax.random.normal(kk, (in_dim, out_dim), jnp.float32) * scale
            return _quant_block4(w, block)

        qs = [gen(kk) for kk in jax.random.split(key, L)]
        return (jnp.stack([a for a, _ in qs]), jnp.stack([b for _, b in qs]))

    @jax.jit
    def gen_embed(kk):
        w = jax.random.normal(kk, (cfg.vocab_size, H), jnp.float32) * 0.02
        return _quant_rows(w)

    @jax.jit
    def gen_head(kk):
        w = jax.random.normal(kk, (H, cfg.vocab_size), jnp.float32) * 0.02
        return _quant_block4(w, block)

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
