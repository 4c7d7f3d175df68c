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

import math

import jax
import jax.numpy as jnp

# params keys quantized per output channel (axis -1); stacked leaves keep
# their leading layer axis.
_LAYER_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
# Mixtral MoE expert leaves ([L, E, in, out] — models/moe.py): quantized per
# (expert, out-channel).  They stay int8 even under W4 serving: the batched
# expert einsum has no stacked-carrier Pallas path, and the XLA-level nibble
# unpack would materialize the dequantized copy (slower than the int8 dot —
# CLAUDE.md weight microbench).  The router stays bf16 (H x E is tiny and
# routing logits are precision-sensitive).
_MOE_KEYS = ("we_gate", "we_up", "we_down")


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


def _quant_block4(w: jnp.ndarray, block: int = 128
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int4 with per-(contraction-block, out-channel) scales.

    Per-channel scales are enough at 8 bits but too coarse at 4; blocked
    scales along the `in` axis (GPTQ/AWQ-style, block 128) recover most of
    the loss.  w [..., in, out] -> codes int8 in [-7, 7] same shape,
    s f32 [..., in/block, out].  Codes are carried in int8 here and packed
    into int16 nibble carriers by pack_w4 (native s4 arrays cannot cross
    jit boundaries on the axon backend — see ops/kernels/w4_matmul.py).
    """
    wf = w.astype(jnp.float32)
    *lead, din, dout = wf.shape
    nb = din // block
    wb = wf.reshape(*lead, nb, block, dout)
    amax = jnp.max(jnp.abs(wb), axis=-2, keepdims=True)
    s = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wb / s), -7, 7).astype(jnp.int8)
    return q.reshape(*lead, din, dout), s.squeeze(-2)


def pack_w4(codes: jnp.ndarray) -> jnp.ndarray:
    """int4 codes (int8 carrier) [..., din, out] -> int16 [..., din/4, out].

    Block-LOCAL nibble layout: within each 128-row scale block b, carrier
    row (b*32 + r) holds in-rows (b*128 + j*32 + r) in nibble j, so a
    tensor-parallel shard of the contraction axis (cut at 128-row
    granularity) packs/unpacks entirely within its own shard.
    """
    *lead, din, dout = codes.shape
    nb = din // 128
    c = codes.astype(jnp.int32).reshape(*lead, nb, 4, 32, dout)
    v = jnp.zeros(tuple(lead) + (nb, 32, dout), jnp.int32)
    for j in range(4):
        v = v | ((c[..., j, :, :] & 15) << (4 * j))
    v = (v << 16) >> 16
    return v.astype(jnp.int16).reshape(*lead, din // 4, dout)


def unpack_w4(carriers: jnp.ndarray) -> jnp.ndarray:
    """int16 [..., din/4, out] -> int4 codes as int32 [..., din, out]."""
    *lead, rq, dout = carriers.shape
    nb = rq // 32
    w32 = carriers.astype(jnp.int32).reshape(*lead, nb, 32, dout)
    blocks = [(w32 << (32 - 4 * (j + 1))) >> 28 for j in range(4)]
    return jnp.concatenate(blocks, axis=-2).reshape(*lead, rq * 4, dout)


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
    for name in _LAYER_KEYS + _MOE_KEYS:
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


def enable_act_quant(params: dict) -> dict:
    """Mark a W8 params pytree for int8-activation serving (W8A8).

    Adds two tiny int8 marker leaves whose *presence* (pytree structure, so
    static under jit) routes every int8 projection through w8a8_dot and the
    int8 LM head through the same native-MXU path (models/llama.py _lm_head):
    ``layers["a8"]`` [L, 1] rides the layer scan; top-level ``act_quant``
    covers the head.  Weight layout is unchanged — W8 checkpoints serve in
    either mode.
    """
    out = dict(params)
    layers = dict(params["layers"])
    L = layers["attn_norm"].shape[0]
    layers["a8"] = jnp.zeros((L, 1), jnp.int8)
    out["layers"] = layers
    out["act_quant"] = jnp.zeros((1,), jnp.int8)
    return out


def fuse_projections(params: dict) -> dict:
    """Concatenate qkv and gate+up along the out-channel axis (single-chip).

    Fusing wq/wk/wv -> wqkv and w_gate/w_up -> w_gateup cuts 7 dots/layer
    to 4.  Round-5 correction: the "~85 us fixed overhead per dot" that
    originally motivated this was a wall-clock chain artifact — on DEVICE
    time each dot carries only ~1-2 us of fixed cost beyond its HBM bytes
    (docs/PERFORMANCE.md "Round 5"), so fusion saves ~5 us/layer-step
    (~1% of the flagship step), not 3 dots' worth.  Kept because it is
    correctness-tested, composes with every weight format, and the small
    win is real.  Works on bf16, W8 (scales concat along out-channel), W4
    (int16 carriers and blocked scales both carry out-channel last), and
    composes with enable_act_quant.

    SINGLE-CHIP layout: under tensor parallelism the fused out-channel axis
    would straddle the head-aligned "model" shards (q|k|v boundaries are
    not multiples of dim/tp), so param_specs deliberately has no entry for
    the fused names — shard the unfused layout instead.
    """
    out = dict(params)
    layers = dict(params["layers"])

    def cat(names, newname):
        if not all(n in layers for n in names):
            return
        ws = [layers.pop(n) for n in names]
        assert len({w.dtype for w in ws}) == 1, (newname, [w.dtype for w in ws])
        layers[newname] = jnp.concatenate(ws, axis=-1)
        scs = [layers.pop(n + "_scale", None) for n in names]
        if scs[0] is not None:
            layers[newname + "_scale"] = jnp.concatenate(scs, axis=-1)

    cat(("wq", "wk", "wv"), "wqkv")
    cat(("w_gate", "w_up"), "w_gateup")
    out["layers"] = layers
    return out


def act_quant(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-row (per-token) symmetric int8 activation quantization."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-30) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127,
                  127).astype(jnp.int8)
    return xq, sx


def w8a8_dot(h: jnp.ndarray, w: jnp.ndarray, s: jnp.ndarray,
             out_dtype=None) -> jnp.ndarray:
    """int8 x int8 MXU dot with dynamic per-token activation scales.

    Round-5 device-time adjudication (benchmarks/bench_w8_matmul.py,
    docs/PERFORMANCE.md "Round 5"): at the w_down decode shape BOTH this
    form and the weight-only form run at 80 us = 734 GB/s — the HBM
    roofline.  (The earlier "weight-only caps at ~370 GB/s" claim was a
    wall-clock chain artifact; XLA's fused widen rides the dot at full
    bandwidth.)  W8A8 is therefore a latency WASH vs weight-only on this
    chip; it remains available (enable_act_quant / --weights int8-a8) as
    the int8-activation serving mode, with measured accuracy cost in
    accuracy_w8a8/.
    """
    xq, sx = act_quant(h)
    acc = jax.lax.dot_general(xq, w, (((h.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * s.astype(jnp.float32)
            ).astype(out_dtype or h.dtype)


def proj(h: jnp.ndarray, lp: dict, name: str) -> jnp.ndarray:
    """h @ lp[name], dequantizing on the fly for int8/int4 weights.

    int8: the astype + per-out-channel scale fuse into the dot (weight-only
    -quant XLA pattern); scale * int8 products stay well inside bf16 range.
    int8 with the "a8" marker leaf present (enable_act_quant): native int8
    MXU dot with dynamic activation quantization (w8a8_dot).
    int4 (int16 nibble carriers): see _w4_dot.
    """
    w = lp[name]
    if w.dtype == jnp.int16:
        return _w4_dot(h, w, lp[name + "_scale"], lp.get("_li"))
    if w.dtype == jnp.int8:
        if "a8" in lp:
            return w8a8_dot(h, w, lp[name + "_scale"])
        return (h @ w.astype(h.dtype)) * lp[name + "_scale"].astype(h.dtype)
    return h @ w


def _w4_dot(h: jnp.ndarray, w: jnp.ndarray, s: jnp.ndarray,
            li=None) -> jnp.ndarray:
    """h [..., in] @ W4 carriers [in/4, out] with scales s [in/128, out].

    Stacked form (production decode): w [L, in/4, out] + li — the Pallas
    kernel indexes the layer via scalar prefetch so no per-layer carrier
    copy ever materializes (the stacked-protocol rationale, models/llama.py).
    Decode (few tokens, weight-streaming-bound): the Pallas kernel
    (ops/kernels/w4_matmul.py) streams the packed carriers from HBM and
    unpacks+dequantizes in VMEM — an XLA-level unpack materializes the
    dequantized copy and is slower than the plain bf16 dot (measured).
    Prefill (many tokens, compute-bound): dequantize into a transient bf16
    copy — one extra weight-sized write+read amortized over the segment —
    since the kernel's few-row MXU tiles would waste the systolic array.
    Off-TPU (tests): always the transient-dequant path (the kernel is
    covered separately in interpret mode).
    """
    din4, dout = w.shape[-2], w.shape[-1]
    nb = s.shape[-2]
    tokens = 1
    for d in h.shape[:-1]:
        tokens *= d
    if tokens <= 128 and jax.default_backend() == "tpu":
        from mustafar_tpu.ops.kernels.w4_matmul import w4_matmul
        out = w4_matmul(h.reshape(tokens, din4 * 4), w, s, li=li)
        return out.reshape(*h.shape[:-1], dout)
    if w.ndim == 3:
        w = jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(s, li, 0, keepdims=False)
    wf = (unpack_w4(w).astype(h.dtype).reshape(nb, 128, dout)
          * s.astype(h.dtype)[:, None, :]).reshape(din4 * 4, dout)
    return h @ wf


def _quant_pack_w4(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    def one(wl):
        q, s = _quant_block4(wl, 128)
        return pack_w4(q), s.astype(jnp.bfloat16)

    if w.ndim == 3:
        # layer-stacked leaf: map per layer so the f32 quantization temps
        # stay bounded to one layer (a [16,4096,14336] f32 temp is 3.7 GiB
        # — does not coexist with live bf16 weights on a 16 GiB chip)
        return jax.lax.map(one, w)
    return one(w)


def quantize_params_w4(params: dict, donate: bool = False) -> dict:
    """Quantize a llama params pytree to weight-only int4 (blocked scales).

    Layer projections become int16 nibble carriers (pack_w4) with
    per-(128-block, out-channel) bf16 scales, consumed by the Pallas
    W4 matmul kernel at decode; the embedding AND the LM head stay
    per-channel int8 (embed is gathered, not streamed; the 128k-vocab head
    is too lane-odd for efficient kernel tiling and the logits are the
    most quantization-sensitive tensor).  Norm weights keep their dtype.
    Idempotent; requires every projection in-dim to be a multiple of 128.
    """
    q4 = jax.jit(_quant_pack_w4, donate_argnums=(0,) if donate else ())
    q8 = jax.jit(_quant_last, donate_argnums=(0,) if donate else ())
    qr = jax.jit(_quant_rows, donate_argnums=(0,) if donate else ())
    out = dict(params)
    layers = dict(params["layers"])
    for name in _LAYER_KEYS:
        w = layers.get(name)
        if w is None or w.dtype in (jnp.int16, jnp.int8):
            continue
        assert w.shape[-2] % 128 == 0, (name, w.shape)
        q, s = q4(w)
        layers[name] = q
        layers[name + "_scale"] = s
    for name in _MOE_KEYS:  # experts stay int8 under W4 (see _MOE_KEYS)
        w = layers.get(name)
        if w is None or w.dtype == jnp.int8:
            continue
        q, s = q8(w)
        layers[name] = q
        layers[name + "_scale"] = s
    out["layers"] = layers
    if params["embed"].dtype != jnp.int8:
        q, s = qr(params["embed"])
        out["embed"] = q
        out["embed_scale"] = s
    if "lm_head" in params and params["lm_head"].dtype not in (jnp.int16,
                                                               jnp.int8):
        q, s = q8(params["lm_head"])
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
    # W4 carriers are int16 holding 4 codes each, so .nbytes is already the
    # true 0.5 byte/element HBM footprint.
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
        scale = scale or (1.0 / math.sqrt(in_dim))

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


def init_params_w4(cfg, key: jax.Array) -> dict:
    """Random-init params directly in W4 (nibble carriers; embed/head int8).

    Same one-layer-at-a-time generation discipline as init_params_w8 so the
    fp32 temps stay bounded on a 16 GiB chip.
    """
    H, Dq, Dkv, I, L = (cfg.hidden_size, cfg.q_dim, cfg.kv_dim,
                        cfg.intermediate_size, cfg.num_layers)
    k = iter(jax.random.split(key, 12))

    def stacked(key, in_dim, out_dim, scale=None):
        scale = scale or (1.0 / math.sqrt(in_dim))

        @jax.jit
        def gen(kk):
            w = jax.random.normal(kk, (in_dim, out_dim), jnp.float32) * scale
            return _quant_pack_w4(w)

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
