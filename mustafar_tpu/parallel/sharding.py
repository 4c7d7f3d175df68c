"""Tensor/data-parallel sharding over a jax.sharding.Mesh.

New capability relative to the reference, which is single-GPU with only dead
``pretraining_tp`` weight-slicing branches (SURVEY.md §2.6,
llama_mustafar_Kt_Mag_Vt_Mag.py:353-368).  Design per the north star:

  * mesh axes ("data", "model"): batch over data (DP), heads/ffn over model
    (TP over ICI);
  * KV caches and compressed pools are sharded by kv-head over "model", so
    the sparse-attention path is head-local — no collectives inside
    attention; only the qkv/o and mlp projections reduce over "model"
    (XLA inserts the psum from the shardings);
  * compressed pools are [L, B*Hkv, ...] with b-major flattening, so the
    joint dim shards as ("data", "model").
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mustafar_tpu.config import EngineConfig, ModelConfig


def make_mesh(dp: int, tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def param_specs(cfg: ModelConfig) -> dict:
    """PartitionSpecs for the llama param pytree (layer-stacked leaves).

    Megatron-style: column-parallel qkv/gate/up (output dim over "model"),
    row-parallel o/down (input dim over "model") so each block needs one
    psum, inserted automatically by GSPMD from these annotations.
    """
    return {
        "embed": P(None, None),
        "embed_scale": P(None,),
        "layers": {
            "attn_norm": P(None, None),
            "wq": P(None, None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),
            "mlp_norm": P(None, None),
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
            # W8 per-output-channel scales follow their weight's output axis
            # (models/quant.py): column-parallel outputs shard over "model",
            # row-parallel outputs are replicated like their psum result.
            "wq_scale": P(None, "model"),
            "wk_scale": P(None, "model"),
            "wv_scale": P(None, "model"),
            "wo_scale": P(None, None),
            "w_gate_scale": P(None, "model"),
            "w_up_scale": P(None, "model"),
            "w_down_scale": P(None, None),
            # Mixtral-style MoE leaves (models/moe.py): EXPERT parallelism —
            # the expert axis shards over "model" (each shard owns E/tp
            # experts' weights and their slot compute; GSPMD inserts the
            # dispatch/combine collectives).  Router replicated.
            "w_router": P(None, None, None),
            "we_gate": P(None, "model", None, None),
            "we_up": P(None, "model", None, None),
            "we_down": P(None, "model", None, None),
            # W8 expert scales [L, E, out] follow their weight's expert axis
            "we_gate_scale": P(None, "model", None),
            "we_up_scale": P(None, "model", None),
            "we_down_scale": P(None, "model", None),
            # W8A8 marker leaf (models/quant.py enable_act_quant): replicated
            "a8": P(None, None),
        },
        "final_norm": P(None,),
        "lm_head": P(None, "model"),
        "lm_head_scale": P("model",),
        "act_quant": P(None,),
    }


def cache_specs(engine: EngineConfig, cache_state: dict) -> dict:
    """PartitionSpecs for a cache pytree (keyed on the state dict's keys).

    Dense/masked caches: [L, B, S, Hkv, D] -> batch over data, kv-heads over
    model.  Compressed pools: [L, B*Hkv, ...] -> joint dim over (data, model);
    windows like dense; n_chunks replicated.
    """
    from mustafar_tpu.config import CacheMode
    compressed = engine.cache_mode == CacheMode.COMPRESSED
    specs = {}
    for key, val in cache_state.items():
        if key == "n_chunks":
            specs[key] = P(None,)
        elif key in ("k_score", "v_score") and compressed:
            # compressed-mode Opa accumulators are window-shaped
            # [L, B, Hkv, wcap, D] (head-major like k_win), NOT the masked
            # cache's [L, B, S, Hkv, D]
            specs[key] = P(None, "data", "model", None, None)
        elif key in ("k", "v", "k_score", "v_score"):
            specs[key] = P(None, "data", None, "model", None)
        elif key in ("k_win", "v_win"):
            # compressed windows are head-major [L, B, Hkv, W, D]
            specs[key] = P(None, "data", "model", None, None)
        elif key == "kv_pool":
            # chunk-major fused pool [L, mc, B, Hkv, ROWS, 128] — batch over
            # data, kv-heads over model (independent axes; a joint spec on the
            # b-major flattened dim would split batch twice and never shard
            # heads)
            specs[key] = P(None, None, "data", "model", None, None)
        elif key == "kv_scales":
            # quant-codec scales [L, mc, B, Hkv, 2, D] — same head locality
            specs[key] = P(None, None, "data", "model", None, None)
        else:
            raise ValueError(key)
    return specs


def shard_headlocal_attend(fn, mesh: Mesh, per_slot: bool = False,
                           quant: bool = False, stacked: bool = False,
                           extra_out: str | None = None):
    """shard_map a compressed decode-attention call so each shard runs the
    Pallas kernel on its local (batch x kv-head) rows only.

    ``fn(q, kv_pool, [kv_scales,] k_win, v_win, n_chunks, win_len[, li])``
    with q [B,1,Hq,D].  Pools are head-local by design (SURVEY.md §7:
    per-head compressed streams never communicate), so no collectives appear
    inside attention; GSPMD handles the surrounding projections.

    stacked: the production decode path — the pool (and quant scales) and
    the windows are the WHOLE stacked [L, ...] state plus an int32 layer
    index ``li``; the kernels DMA at li directly (uniform AND per-slot —
    both consume the dense window in-kernel).  Non-stacked: per-layer 6-D
    pool [mc, B, Hkv, ROWS, 128] and per-layer windows.  fn reshapes its
    local block to the kernel's b-major [.., BH', ..] view.  per_slot:
    n_chunks/win_len are [B] vectors sharded over "data" (continuous
    batching).  quant: fn takes the scales state right after the pool
    (the q8/q8q4/q4q4 codecs AND the bitmap-q8 capacity codec).

    extra_out: Opa decode scoring needs per-(batch, kv-head) softmax state
    back from the kernel — "norm" for the (out, m, l) triple (m/l
    [B, Hkv, G, 1], uniform-batch ``return_norm``) or "win_probs" for
    (out, p_win [B, Hkv, W]) (per-slot ``return_win_probs``).  Both extras
    are head-local like the output, so they shard ("data", "model") with no
    collectives; the score accumulation that consumes them is elementwise
    over [B, Hkv, ...] and runs under plain GSPMD outside this shard_map."""
    qspec = P("data", None, "model", None)
    wspec4 = P("data", "model", None, None)          # per-layer [B,Hkv,W,D]
    wspec5 = P(None, "data", "model", None, None)    # stacked [L,B,Hkv,W,D]
    wspec = wspec5 if stacked else wspec4
    if stacked:
        pool = P(None, None, "data", "model", None, None)
        extra = (P(None, None, "data", "model", None, None),) if quant else ()
        tail_li = (P(),)
    else:
        pool = P(None, "data", "model", None, None)
        extra = (P(None, "data", "model", None, None),) if quant else ()
        tail_li = ()
    scal = P("data") if per_slot else P()
    if extra_out == "norm":
        out_specs = (qspec, P("data", "model", None, None),
                     P("data", "model", None, None))
    elif extra_out == "win_probs":
        out_specs = (qspec, P("data", "model", None))
    else:
        assert extra_out is None, extra_out
        out_specs = qspec
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(qspec, pool, *extra, wspec, wspec, scal, scal, *tail_li),
        out_specs=out_specs,
        # pallas_call out_shapes carry no varying-mesh-axes annotation
        check_vma=False)


def shard_pytree(tree, specs, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: isinstance(x, P))


def filter_specs_for(params: dict, specs: dict) -> dict:
    """Drop spec entries absent from params (lm_head when tied; the
    ``*_scale`` leaves for unquantized params) and rank-adapt scale specs:
    W4 blocked scales carry an extra contraction-block axis ahead of the
    out-channel axis ([..., nb, out] vs W8's [..., out]) — insert a
    replicated axis so the out-channel sharding still lines up."""
    out = {}
    for k, v in specs.items():
        if k not in params:
            continue
        if isinstance(v, dict):
            out[k] = filter_specs_for(params[k], v)
            continue
        leaf = params[k]
        ndim = getattr(leaf, "ndim", None)
        if ndim is not None and ndim == len(v) + 1 and k.endswith("_scale"):
            v = type(v)(*v[:-1], None, v[-1])
        out[k] = v
    return out
