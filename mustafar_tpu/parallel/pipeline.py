"""Pipeline parallelism: layer stages over a mesh axis, microbatched schedule.

New capability relative to the reference (single-GPU; its only layer
distribution is HF ``device_map="auto"`` sequential offload with no
micro-batching — SURVEY.md §2.6).  TPU-native design:

  * the model's layer-stacked param leaves ``[L, ...]`` shard on axis 0 over
    a ``"stage"`` mesh axis — no per-layer weight partitioning, no
    re-materialization; the KV cache's ``[L, ...]`` leaves shard the same
    way, so each stage owns exactly its layers' cache;
  * execution is a GPipe-style schedule inside one ``shard_map``: the batch
    splits into M microbatches; at tick t, stage s runs microbatch t-s
    through its local layers and hands the activations to stage s+1 with a
    ``ppermute`` hop (stage 0 sources embeddings, the last stage collects
    LM-head logits).  S + M - 1 ticks per call; per-device utilization
    M/(S+M-1) — the classic pipeline bubble, amortized by more microbatches;
  * both prefill and decode run the same schedule (decode is T=1); the
    dense/masked cache impls plug in through their per-layer attend
    protocol, so every pruning variant works under PP unchanged.

PP x TP composition: ``stage_mesh(pp, tp)`` builds a 2-D ("stage", "model")
mesh and the schedule's shard_map maps MANUALLY over "stage" only
(``axis_names={"stage"}``) — "model" stays a GSPMD-auto axis, so the same
Megatron column/row weight shardings as the flat dp x tp layout
(parallel/sharding.param_specs) apply inside each stage and GSPMD inserts
the per-stage TP all-reduces itself.  No manual collectives, no second
code path: the schedule body is identical for tp=1 and tp>1.

On one host this validates the program structure; the real win (serving
models deeper than one chip's HBM) needs multi-chip hardware, like every
scaling claim in docs/SCALING.md.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mustafar_tpu.config import ModelConfig


def stage_mesh(pp: int, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert pp * tp <= len(devices), (pp, tp, len(devices))
    return Mesh(np.asarray(devices[:pp * tp]).reshape(pp, tp),
                ("stage", "model"))


def pp_param_specs(params: dict) -> dict:
    """Layer-stacked leaves shard on L over "stage"; everything else
    (embed, norms, lm_head) is replicated — stages read only their part."""
    return {
        k: jax.tree.map(lambda _: P("stage"), v) if k == "layers"
        else jax.tree.map(lambda _: P(), v)
        for k, v in params.items()
    }


def pp_cache_specs(cache: dict) -> dict:
    """Every cache leaf is [L, ...]: stage-sharded on the layer axis."""
    return {k: P("stage") for k in cache}


def _drop_data(a):
    """Remove the "data" axis from a PartitionSpec entry (PP x TP meshes
    have no data axis; batch replicates within a stage)."""
    if isinstance(a, tuple):
        t = tuple(x for x in a if x != "data")
        return t[0] if len(t) == 1 else (t or None)
    return None if a == "data" else a


def pp_placement_specs(cfg: ModelConfig, params: dict, cache: dict,
                       engine=None) -> tuple[dict, dict]:
    """Combined PP x TP placement: stage on the layer axis PLUS the flat
    layout's Megatron "model" shardings (parallel/sharding.param_specs) on
    the in-stage axes.  The schedule's shard_map maps manually over "stage"
    only, so these model-axis placements are what GSPMD's auto mode
    partitions the in-stage compute with."""
    from mustafar_tpu.parallel import sharding as sh

    base = sh.filter_specs_for(params, sh.param_specs(cfg))
    stageify = lambda s: P("stage", *s[1:])
    pspecs = {k: (jax.tree.map(stageify, v,
                               is_leaf=lambda x: isinstance(x, P))
                  if k == "layers" else v)
              for k, v in base.items()}
    if engine is not None:
        cspecs = {k: P("stage", *[_drop_data(a) for a in s[1:]])
                  for k, s in sh.cache_specs(engine, cache).items()}
    else:
        cspecs = pp_cache_specs(cache)
    return pspecs, cspecs


def _stage_layers(cfg, lp_local, cache_local, x, cos, sin, attend, mb_lo,
                  mbB, active):
    """Run the local layer block on one microbatch's activations.

    cache_local leaves are [L_local, B, ...]; the microbatch's batch rows
    [mb_lo, mb_lo + mbB) are sliced per layer, updated by the attend
    protocol, and written back only when ``active`` (inactive ticks process
    clamped garbage that must not touch state)."""
    from mustafar_tpu.models.llama import _layer

    def body(x, layer_in):
        lp, lc_full = layer_in
        lc = {k: jax.lax.dynamic_slice_in_dim(v, mb_lo, mbB, axis=0)
              for k, v in lc_full.items()}
        x, lc = _layer(cfg, lp, x, cos, sin, attend, lc)
        new_full = {}
        for k, old in lc_full.items():
            upd = jax.lax.dynamic_update_slice_in_dim(
                old, lc[k].astype(old.dtype), mb_lo, axis=0)
            new_full[k] = jnp.where(active, upd, old)
        return x, new_full

    return jax.lax.scan(body, x, (lp_local, cache_local))


def _pp_apply(params, tokens, cache, aux, *, cfg: ModelConfig, impl,
              n_stages: int, n_micro: int, mode: str):
    """shard_map body: GPipe schedule over the "stage" axis."""
    from mustafar_tpu.models.llama import _lm_head, rms_norm
    from mustafar_tpu.models.quant import embed_lookup
    from mustafar_tpu.models.rope import rope_cos_sin

    idx = jax.lax.axis_index("stage")
    B, T = tokens.shape
    mbB = B // n_micro
    dtype = params["final_norm"].dtype

    if mode == "prefill":
        true_len = aux
        positions = jnp.arange(T)
        attend = lambda lc, q, k, v: impl.prefill_attend(lc, q, k, v, true_len)
    else:
        pos = aux
        positions = jnp.asarray(pos)[None]
        attend = lambda lc, q, k, v: impl.decode_attend(lc, q, k, v, pos)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                            cfg.rope_scaling)

    perm = [(j, j + 1) for j in range(n_stages - 1)]
    is_last = idx == n_stages - 1
    x_recv = jnp.zeros((mbB, T, cfg.hidden_size), dtype)
    out_buf = jnp.zeros((B, 1, cfg.vocab_size), jnp.float32)
    lp_local = params["layers"]

    for t in range(n_micro + n_stages - 1):
        m = t - idx
        active = (m >= 0) & (m < n_micro)
        m_c = jnp.clip(m, 0, n_micro - 1)
        mb_lo = m_c * mbB
        tok_mb = jax.lax.dynamic_slice_in_dim(tokens, mb_lo, mbB, axis=0)
        x_src = embed_lookup(params, tok_mb, dtype)
        x_in = jnp.where(idx == 0, x_src, x_recv)
        x_out, cache = _stage_layers(cfg, lp_local, cache, x_in, cos, sin,
                                     attend, mb_lo, mbB, active)
        if t + 1 < n_micro + n_stages - 1:
            x_recv = jax.lax.ppermute(x_out, "stage", perm)
        # last stage: head on this microbatch's final token
        xl = rms_norm(x_out, params["final_norm"], cfg.rms_norm_eps)
        if mode == "prefill":
            last = jnp.clip(jnp.asarray(true_len) - 1, 0, T - 1)
            xl = jax.lax.dynamic_slice_in_dim(xl, last, 1, axis=1)
        lg = _lm_head(cfg, params, xl)
        cur = jax.lax.dynamic_slice_in_dim(out_buf, mb_lo, mbB, axis=0)
        new = jnp.where(active & is_last, lg, cur)
        out_buf = jax.lax.dynamic_update_slice_in_dim(out_buf, new, mb_lo,
                                                      axis=0)
    # only the last stage wrote logits; sum over stages replicates them
    logits = jax.lax.psum(jnp.where(is_last, out_buf, 0.0), "stage")
    return logits, cache


def _shard(fn, mesh, params, cache):
    """Manual over "stage" only; any other mesh axis ("model") stays
    GSPMD-auto, so TP inside a stage comes from the placement shardings."""
    pspecs = pp_param_specs(params)
    cspecs = pp_cache_specs(cache)
    # jit wrapper: shard_map's EAGER path rejects auto (non-manual) mesh
    # axes ("out_specs refers to 'model'") — under jit the same program
    # compiles and propagates the auto-axis shardings to outputs; inside an
    # outer jit this inner jit just inlines.
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(pspecs, P(), cspecs, P()),
        out_specs=(P(), cspecs),
        axis_names={"stage"},
        check_vma=False))


def pp_prefill(cfg: ModelConfig, params, tokens, cache, cache_impl, true_len,
               mesh: Mesh, n_micro: Optional[int] = None):
    """Pipeline-parallel prefill: returns (last-token logits [B,1,V], cache).

    params/cache may be host-replicated (they are resharded by spec) or
    already stage-sharded via shard_pp.  B % n_micro == 0 and
    num_layers % n_stages == 0."""
    S = mesh.shape["stage"]
    B = tokens.shape[0]
    n_micro = n_micro or min(B, S)
    assert B % n_micro == 0 and cfg.num_layers % S == 0, (B, n_micro,
                                                          cfg.num_layers, S)
    fn = partial(_pp_apply, cfg=cfg, impl=cache_impl, n_stages=S,
                 n_micro=n_micro, mode="prefill")
    return _shard(fn, mesh, params, cache)(params, tokens, cache,
                                           jnp.asarray(true_len))


def pp_decode_step(cfg: ModelConfig, params, token, cache, cache_impl, pos,
                   mesh: Mesh, n_micro: Optional[int] = None):
    """Pipeline-parallel decode step: token [B,1] -> (logits [B,1,V], cache)."""
    S = mesh.shape["stage"]
    B = token.shape[0]
    n_micro = n_micro or min(B, S)
    assert B % n_micro == 0 and cfg.num_layers % S == 0
    fn = partial(_pp_apply, cfg=cfg, impl=cache_impl, n_stages=S,
                 n_micro=n_micro, mode="decode")
    return _shard(fn, mesh, params, cache)(params, token, cache,
                                           jnp.asarray(pos))


def shard_pp(params: dict, cache: dict, mesh: Mesh, cfg: ModelConfig = None,
             engine=None):
    """Place params/cache with the PP shardings (stage-sharded layer leaves).

    With cfg (and optionally engine for the cache), placement also applies
    the in-stage TP "model" shardings (pp_placement_specs) — required when
    the mesh's "model" axis is >1, harmless at tp=1."""
    put = lambda tree, specs: jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: isinstance(x, P))
    if cfg is not None:
        pspecs, cspecs = pp_placement_specs(cfg, params, cache, engine)
        return put(params, pspecs), put(cache, cspecs)
    return (put(params, pp_param_specs(params)),
            put(cache, pp_cache_specs(cache)))
