"""Mixtral-style MoE block + expert parallelism tests (CPU, 8 virtual devices).

Semantics vs a per-token numpy reference (top-K routing, renormalized gates,
capacity drop), EP-sharded parity vs single-device, and MoE under the
pipeline-parallel schedule.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mustafar_tpu.config import (CacheMode, EngineConfig, ModelConfig,
                                 PruneConfig, PruneMethod)
from mustafar_tpu.cache import make_cache
from mustafar_tpu.models import llama, moe
from mustafar_tpu.models.llama import init_params
from mustafar_tpu.parallel import sharding as sh

CFG = ModelConfig(name="moe-test", vocab_size=256, hidden_size=64,
                  intermediate_size=128, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=16, max_position_embeddings=512,
                  num_experts=4, num_experts_per_tok=2,
                  expert_capacity_factor=8.0)  # no drops: exactness tests


def _naive_moe(cfg, lp, x):
    """Per-token reference: top-K -> softmax over selected -> sum of SwiGLU."""
    B, T, H = x.shape
    wr = np.asarray(lp["w_router"], np.float64)
    wg = np.asarray(lp["we_gate"], np.float64)
    wu = np.asarray(lp["we_up"], np.float64)
    wd = np.asarray(lp["we_down"], np.float64)
    xf = np.asarray(x, np.float64)
    out = np.zeros((B, T, H))
    silu = lambda a: a / (1.0 + np.exp(-a))
    for b in range(B):
        for t in range(T):
            s = xf[b, t] @ wr
            top = np.argsort(-s)[: cfg.num_experts_per_tok]
            e_ = np.exp(s[top] - s[top].max())
            g = e_ / e_.sum()
            for gi, e in zip(g, top):
                h = silu(xf[b, t] @ wg[e]) * (xf[b, t] @ wu[e])
                out[b, t] += gi * (h @ wd[e])
    return out


def test_moe_block_matches_naive():
    key = jax.random.PRNGKey(0)
    lp = jax.tree.map(lambda a: a[0],
                      moe.init_moe_params(CFG, key, dtype=jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, CFG.hidden_size),
                          jnp.float32)
    got = jax.jit(lambda x: moe.moe_mlp(CFG, lp, x))(x)
    ref = _naive_moe(CFG, lp, x)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_moe_group_segmentation_matches_unsegmented(monkeypatch):
    """ADVICE r4: dispatch memory is O(G^2); long prefills run group-
    segmented.  With capacity generous enough for zero drops the segmented
    path must match the single-group path exactly."""
    lp = jax.tree.map(lambda a: a[0],
                      moe.init_moe_params(CFG, jax.random.PRNGKey(5),
                                          dtype=jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 64, CFG.hidden_size),
                          jnp.float32)  # N=256
    ref = jax.jit(lambda x: moe.moe_mlp(CFG, lp, x))(x)
    monkeypatch.setattr(moe, "_MOE_GROUP", 64)  # forces 4 groups
    got = jax.jit(lambda x: moe.moe_mlp(CFG, lp, x))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_capacity_drop_is_clean():
    """Overflowing tokens contribute zero (residual passes through): finite,
    and a huge-capacity run upper-bounds the dropped one's token usage."""
    cfg = dataclasses.replace(CFG, expert_capacity_factor=0.26)
    lp = jax.tree.map(lambda a: a[0],
                      moe.init_moe_params(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32, cfg.hidden_size),
                          jnp.float32)
    out = jax.jit(lambda x: moe.moe_mlp(cfg, lp, x))(x)
    assert np.isfinite(np.asarray(out)).all()
    # at factor 0.26 with N=128, K=2, E=4: C=24 < N*K/E=64 -> some rows MUST
    # be exactly zero (dropped tokens), none in the full-capacity run
    zeros = (np.abs(np.asarray(out)).max(axis=-1) == 0.0).sum()
    assert zeros > 0, "expected dropped tokens at tiny capacity"


def _gen_tokens(eng, params, tokens, mesh, n_decode=3):
    cfg = eng.model
    impl = make_cache(eng)
    B = tokens.shape[0]
    cache = impl.init(B, jnp.float32)
    if mesh is not None:
        pspecs = sh.filter_specs_for(params, sh.param_specs(cfg))
        params = sh.shard_pytree(params, pspecs, mesh)
        cache = sh.shard_pytree(cache, sh.cache_specs(eng, cache), mesh)
        tokens = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))

    @jax.jit
    def run(params, tokens, cache):
        logits, cache = llama.prefill(cfg, params, tokens, cache, impl,
                                      jnp.int32(tokens.shape[1]),
                                      last_only=True)
        outs = [logits[:, 0]]
        tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        for i in range(n_decode):
            logits, cache = llama.decode_step(cfg, params, tok, cache, impl,
                                              jnp.int32(tokens.shape[1]) + i)
            outs.append(logits[:, 0])
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        return jnp.stack(outs)

    return np.asarray(run(params, tokens, cache))


def test_moe_model_ep_sharded_matches_single_device():
    """Full MoE model, masked pruned cache: EP (experts over 'model') x dp."""
    eng = EngineConfig(model=CFG, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=96)
    params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    assert "w_router" in params["layers"] and "w_gate" not in params["layers"]
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 256, (4, 64)))
    ref = _gen_tokens(eng, params, tokens, mesh=None)
    got = _gen_tokens(eng, params, tokens, mesh=sh.make_mesh(dp=4, tp=2))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_moe_under_pipeline_parallelism():
    from mustafar_tpu.parallel import pipeline as pp
    eng = EngineConfig(model=CFG, cache_mode=CacheMode.DENSE,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.0, v_sparsity=0.0),
                       max_seq_len=96)
    params = init_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
    impl = make_cache(eng)
    tokens = jnp.asarray(np.random.RandomState(1).randint(0, 256, (4, 64)))
    ref = _gen_tokens(eng, params, tokens, mesh=None)

    mesh = pp.stage_mesh(2)
    cache = impl.init(4, jnp.float32)
    params_s, cache = pp.shard_pp(params, cache, mesh)

    @jax.jit
    def run(params, tokens, cache):
        logits, cache = pp.pp_prefill(CFG, params, tokens, cache, impl,
                                      jnp.int32(64), mesh, n_micro=2)
        outs = [logits[:, 0]]
        tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        for i in range(3):
            logits, cache = pp.pp_decode_step(CFG, params, tok, cache, impl,
                                              jnp.int32(64) + i, mesh,
                                              n_micro=2)
            outs.append(logits[:, 0])
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        return jnp.stack(outs)

    got = np.asarray(run(params_s, tokens, cache))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
