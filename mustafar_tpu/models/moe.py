"""Mixtral-style sparse-MoE MLP block, expert-parallel by sharding.

Beyond-reference capability: the reference's model grid is dense-only
(Llama-2/3, Mistral — SURVEY.md §2.2), so there is no MoE/EP counterpart to
cite.  This block exists so expert parallelism is a real, tested sharding
axis of the framework (task north star lists dp/tp/pp/sp/ep).  Semantics
follow Mixtral: per token, a linear router scores E experts, the top-K are
selected, and their SwiGLU outputs are combined with softmax-renormalized
gates (softmax over the K selected logits).

TPU-first design — capacity-based dense dispatch:
  * routing decisions become a static-shape dispatch tensor [N, E, C]
    (token n -> slot c of expert e), built from a cumsum position rank —
    no dynamic shapes, no host syncs, no sorting;
  * expert FFNs run as ONE batched einsum over the expert axis
    ([E, C, H] x [E, H, I]) — the MXU sees E large matmuls, and sharding
    the E axis over the mesh ("model" or a dedicated "expert" axis) makes
    GSPMD place each expert's weights and compute on its owner shard,
    inserting the dispatch/combine collectives (the all-to-all of classic
    EP) automatically;
  * tokens beyond an expert's capacity C = ceil(N*K/E * factor) are
    dropped (their MLP contribution is zero; the residual stream passes
    through) — standard capacity semantics; C is rounded up to a multiple
    of 8 for sublane-friendly layouts.

Param leaves (stacked on the layer axis like every other layer param):
  w_router [L, H, E]; we_gate/we_up [L, E, H, I]; we_down [L, E, I, H].
EP specs live in parallel/sharding.py (we_* shard the E axis over "model").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mustafar_tpu.config import ModelConfig


def expert_capacity(n_tokens: int, num_experts: int, top_k: int,
                    factor: float) -> int:
    c = int(np.ceil(n_tokens * top_k / num_experts * factor))
    return max(8, -(-c // 8) * 8)


# Token-group size for dispatch segmentation: the dispatch tensor is
# [G, E, C] with C = ceil(G*K/E * factor), i.e. O(G^2) memory — unsegmented,
# a realistic Mixtral prefill (B=8 x T=3584 -> N=28672, C=14336) needs a
# ~13 GiB int32 dispatch and OOMs the chip.  Groups bound it to ~10 MB and
# lax.map serializes groups exactly like llama._mlp's _MLP_SEG segmentation.
# Capacity becomes per-group (GShard-style grouped dispatch): experts can
# drop tokens in a hot group they could have absorbed globally — acceptable
# and standard; decode (N <= G) is unchanged.
_MOE_GROUP = 1024


def moe_mlp(cfg: ModelConfig, lp: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, H] -> [B, T, H]; lp holds this layer's MoE leaves."""
    B, T, H = x.shape
    N = B * T
    xf = x.reshape(N, H)
    if N > _MOE_GROUP and N % _MOE_GROUP == 0:
        groups = xf.reshape(N // _MOE_GROUP, _MOE_GROUP, H)
        out = jax.lax.map(lambda g: _moe_group(cfg, lp, g), groups)
        return out.reshape(B, T, H)
    return _moe_group(cfg, lp, xf).reshape(B, T, H)


def _moe_group(cfg: ModelConfig, lp: dict, xf: jnp.ndarray) -> jnp.ndarray:
    """Route + dispatch + expert FFN + combine for one token group [N, H]."""
    N, H = xf.shape
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    logits = (xf @ lp["w_router"].astype(xf.dtype)).astype(jnp.float32)
    g, idx = jax.lax.top_k(logits, K)                     # [N, K]
    g = jax.nn.softmax(g, axis=-1)                        # renorm over top-K
    C = expert_capacity(N, E, K, cfg.expert_capacity_factor)

    oh = jax.nn.one_hot(idx, E, dtype=jnp.int32)          # [N, K, E]
    sel = oh.sum(axis=1)                                  # [N, E] in {0, 1}
    pos = jnp.cumsum(sel, axis=0) - sel                   # rank within expert
    # [N, E, C]: slot one-hot; overflow (pos >= C) one-hots to zero
    disp = (sel[..., None] * jax.nn.one_hot(pos, C, dtype=jnp.int32))
    dispf = disp.astype(xf.dtype)

    def edot(v, name, spec):
        """Batched expert einsum, dequantizing W8 experts on the fly: the
        astype + per-(expert, out-channel) scale fuse into the dot operand
        read exactly like quant.proj's 2-D pattern (models/quant.py).
        Under the "a8" marker (enable_act_quant) the expert dots run the
        native int8 MXU path: slot activations are quantized per (expert,
        slot) row over the contraction axis — v's last axis in every spec
        here — and the two scale factors apply after the s32 einsum."""
        w = lp[name]
        if w.dtype == jnp.int8 and "a8" in lp:
            from mustafar_tpu.models.quant import act_quant
            vq, sv = act_quant(v)
            acc = jnp.einsum(spec, vq, w, preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sv
                    * lp[name + "_scale"].astype(jnp.float32)[:, None, :]
                    ).astype(v.dtype)
        y = jnp.einsum(spec, v, w.astype(v.dtype))
        if w.dtype == jnp.int8:
            y = y * lp[name + "_scale"].astype(v.dtype)[:, None, :]
        return y

    xe = jnp.einsum("nec,nh->ech", dispf, xf)             # gather to slots
    hg = jax.nn.silu(edot(xe, "we_gate", "ech,ehi->eci"))
    hu = edot(xe, "we_up", "ech,ehi->eci")
    ye = edot(hg * hu, "we_down", "eci,eih->ech")

    gne = jnp.einsum("nk,nke->ne", g, oh.astype(jnp.float32))   # gate per (n,e)
    comb = dispf.astype(jnp.float32) * gne[..., None]
    out = jnp.einsum("ech,nec->nh", ye.astype(jnp.float32), comb)
    return out.astype(xf.dtype)


def init_moe_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """The MoE layer leaves (stacked [L, ...]), merged into params["layers"]."""
    L, H, I, E = (cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
                  cfg.num_experts)
    ks = jax.random.split(key, 4)
    w = lambda k, *s, sc: (jax.random.normal(k, s, jnp.float32) * sc).astype(dtype)
    return {
        "w_router": w(ks[0], L, H, E, sc=0.02),
        "we_gate": w(ks[1], L, E, H, I, sc=1.0 / np.sqrt(H)),
        "we_up": w(ks[2], L, E, H, I, sc=1.0 / np.sqrt(H)),
        "we_down": w(ks[3], L, E, I, H, sc=1.0 / np.sqrt(I)),
    }
