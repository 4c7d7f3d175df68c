"""HF checkpoint -> mustafar_tpu param pytree conversion.

Replaces the reference's reliance on HF ``from_pretrained`` with
``device_map="auto"`` (pred_long_bench.py:159-166).  Works from a local HF
directory (safetensors or torch .bin) or an in-memory HF torch model; never
downloads (no egress in the target environment).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mustafar_tpu.config import ModelConfig


def config_from_hf(hf_cfg) -> ModelConfig:
    """Map an HF LlamaConfig/MistralConfig(-like) to ModelConfig."""
    get = lambda k, d=None: getattr(hf_cfg, k, d) if not isinstance(hf_cfg, dict) else hf_cfg.get(k, d)
    head_dim = get("head_dim") or get("hidden_size") // get("num_attention_heads")
    rope_scaling = get("rope_scaling")
    if rope_scaling is not None and not isinstance(rope_scaling, dict):
        rope_scaling = dict(rope_scaling)
    return ModelConfig(
        name=str(get("model_type", "llama")),
        num_experts=get("num_local_experts", 0) or 0,
        num_experts_per_tok=get("num_experts_per_tok", 2) or 2,
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        intermediate_size=get("intermediate_size"),
        num_layers=get("num_hidden_layers"),
        num_heads=get("num_attention_heads"),
        num_kv_heads=get("num_key_value_heads", get("num_attention_heads")),
        head_dim=head_dim,
        rms_norm_eps=get("rms_norm_eps", 1e-5),
        rope_theta=get("rope_theta", 10000.0),
        rope_scaling=rope_scaling,
        max_position_embeddings=get("max_position_embeddings", 4096),
        sliding_window=get("sliding_window"),
        tie_word_embeddings=bool(get("tie_word_embeddings", False)),
    )


def _stack(tensors: list[np.ndarray]) -> np.ndarray:
    return np.stack(tensors, axis=0)


def params_from_state_dict(cfg: ModelConfig, sd: dict, dtype=jnp.bfloat16) -> dict:
    """Convert an HF Llama/Mistral state_dict (numpy or torch tensors) to our pytree.

    HF linear weights are [out, in]; ours are [in, out] (right-multiplied).
    """
    def tonp(t):
        if hasattr(t, "detach"):
            t = t.detach().to(dtype=__import__("torch").float32).cpu().numpy()
        return np.asarray(t, np.float32)

    L = cfg.num_layers
    pre = "model."
    # Mixtral checkpoints replace the dense MLP with block_sparse_moe:
    # gate [E,H] (router), experts.{e}.{w1=gate, w3=up} [I,H], w2 (down)
    # [H,I] — converted to our layer-stacked MoE leaves (models/moe.py).
    moe = f"{pre}layers.0.block_sparse_moe.gate.weight" in sd
    mlp_keys = (["w_router", "we_gate", "we_up", "we_down"] if moe
                else ["w_gate", "w_up", "w_down"])
    layers = {k: [] for k in ["wq", "wk", "wv", "wo", "attn_norm",
                              "mlp_norm"] + mlp_keys}
    for i in range(L):
        p = f"{pre}layers.{i}."
        layers["attn_norm"].append(tonp(sd[p + "input_layernorm.weight"]))
        layers["wq"].append(tonp(sd[p + "self_attn.q_proj.weight"]).T)
        layers["wk"].append(tonp(sd[p + "self_attn.k_proj.weight"]).T)
        layers["wv"].append(tonp(sd[p + "self_attn.v_proj.weight"]).T)
        layers["wo"].append(tonp(sd[p + "self_attn.o_proj.weight"]).T)
        layers["mlp_norm"].append(tonp(sd[p + "post_attention_layernorm.weight"]))
        if moe:
            m = p + "block_sparse_moe."
            layers["w_router"].append(tonp(sd[m + "gate.weight"]).T)
            ex = lambda w: _stack([tonp(sd[f"{m}experts.{e}.{w}.weight"]).T
                                   for e in range(cfg.num_experts)])
            layers["we_gate"].append(ex("w1"))
            layers["we_up"].append(ex("w3"))
            layers["we_down"].append(ex("w2"))
        else:
            layers["w_gate"].append(tonp(sd[p + "mlp.gate_proj.weight"]).T)
            layers["w_up"].append(tonp(sd[p + "mlp.up_proj.weight"]).T)
            layers["w_down"].append(tonp(sd[p + "mlp.down_proj.weight"]).T)

    params = {
        "embed": jnp.asarray(tonp(sd[pre + "embed_tokens.weight"]), dtype),
        "layers": {k: jnp.asarray(_stack(v), dtype) for k, v in layers.items()},
        "final_norm": jnp.asarray(tonp(sd[pre + "norm.weight"]), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(tonp(sd["lm_head.weight"]).T, dtype)
    return params


def load_hf_dir(path: str, dtype=jnp.bfloat16,
                on_host: bool = False) -> tuple[ModelConfig, dict]:
    """Load a local HF checkpoint directory (safetensors preferred).

    ``on_host``: build the param pytree on the host CPU device instead of
    the default accelerator.  This is how a full-size checkpoint reaches a
    chip it doesn't fit in raw form: stage on host, quantize there
    (models/quant.py), then ``jax.device_put`` the quantized pytree — a
    16 GiB bf16 Llama-3-8B never touches the 16 GiB device
    (see cli.cmd_predict --weights int8/int4).
    """
    import contextlib
    import jax

    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf(json.load(f))
    sd = {}
    st_files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            sd.update(load_file(os.path.join(path, f)))
    else:
        import torch
        bins = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
        if not bins:
            raise FileNotFoundError(f"no weights in {path}")
        for f in bins:
            sd.update(torch.load(os.path.join(path, f), map_location="cpu",
                                 weights_only=True))
    ctx = (jax.default_device(jax.devices("cpu")[0]) if on_host
           else contextlib.nullcontext())
    with ctx:
        return cfg, params_from_state_dict(cfg, sd, dtype)


def load_hf_model(hf_model, dtype=jnp.float32) -> tuple[ModelConfig, dict]:
    """Convert an in-memory HF torch model (used by parity tests)."""
    cfg = config_from_hf(hf_model.config)
    return cfg, params_from_state_dict(cfg, dict(hf_model.state_dict()), dtype)
