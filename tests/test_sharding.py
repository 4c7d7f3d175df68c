"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4 layer (f)).

Validates that dp x tp sharded execution produces the same logits as
single-device execution, and that the graft entry's multichip dryrun runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mustafar_tpu.config import (CacheMode, EngineConfig, ModelConfig,
                                 PruneConfig, PruneMethod)
from mustafar_tpu.cache import make_cache
from mustafar_tpu.models import llama
from mustafar_tpu.models.llama import init_params
from mustafar_tpu.parallel import sharding as sh

CFG = ModelConfig(name="shard-test", vocab_size=256, hidden_size=128,
                  intermediate_size=256, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=32, max_position_embeddings=512)


def _run(eng, params, cache, tokens, mesh=None):
    impl = make_cache(eng)

    def fn(params, tokens, cache):
        logits, cache = llama.prefill(CFG, params, tokens, cache, impl,
                                      jnp.int32(tokens.shape[1]))
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        logits2, cache = llama.decode_step(CFG, params, tok, cache, impl,
                                           jnp.int32(tokens.shape[1]))
        return logits[:, -1], logits2[:, 0]

    return jax.jit(fn)(params, tokens, cache)


def test_tp_dp_matches_single_device():
    assert len(jax.devices()) >= 8
    eng = EngineConfig(model=CFG, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=128)
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    impl = make_cache(eng)
    B = 4
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 256, (B, 64)))

    ref1, ref2 = _run(eng, params, impl.init(B, jnp.float32), tokens)

    mesh = sh.make_mesh(dp=4, tp=2)
    pspecs = sh.filter_specs_for(params, sh.param_specs(CFG))
    params_s = sh.shard_pytree(params, pspecs, mesh)
    cache = impl.init(B, jnp.float32)
    cache_s = sh.shard_pytree(cache, sh.cache_specs(eng, cache), mesh)
    tokens_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    got1, got2 = _run(eng, params_s, cache_s, tokens_s, mesh)

    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=2e-4, atol=2e-4)


def test_w8_tp_dp_matches_single_device():
    """Int8 weight-only params under dp x tp: the per-output-channel scales
    shard with their weight's output axis (parallel/sharding.param_specs)."""
    from mustafar_tpu.models.quant import quantize_params
    assert len(jax.devices()) >= 8
    eng = EngineConfig(model=CFG, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=128)
    params = quantize_params(init_params(CFG, jax.random.PRNGKey(0),
                                         dtype=jnp.float32))
    impl = make_cache(eng)
    B = 4
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 256, (B, 64)))
    ref1, ref2 = _run(eng, params, impl.init(B, jnp.float32), tokens)

    mesh = sh.make_mesh(dp=4, tp=2)
    pspecs = sh.filter_specs_for(params, sh.param_specs(CFG))
    params_s = sh.shard_pytree(params, pspecs, mesh)
    cache = impl.init(B, jnp.float32)
    cache_s = sh.shard_pytree(cache, sh.cache_specs(eng, cache), mesh)
    tokens_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    got1, got2 = _run(eng, params_s, cache_s, tokens_s, mesh)

    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=2e-4, atol=2e-4)


def test_w4_tp_dp_matches_single_device():
    """Int4 nibble-carrier params under dp x tp: carriers shard like their
    weight; blocked scales rank-adapt (filter_specs_for) so the out-channel
    axis stays tp-sharded.  The stacked-protocol scan (carriers closure-
    captured, scalar-prefetched layer index) must be sharding-transparent."""
    from mustafar_tpu.models.quant import quantize_params_w4
    assert len(jax.devices()) >= 8
    eng = EngineConfig(model=CFG, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=128)
    params = quantize_params_w4(init_params(CFG, jax.random.PRNGKey(0),
                                            dtype=jnp.float32))
    assert params["layers"]["w_gate"].dtype == jnp.int16
    impl = make_cache(eng)
    B = 4
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 256, (B, 64)))
    ref1, ref2 = _run(eng, params, impl.init(B, jnp.float32), tokens)

    mesh = sh.make_mesh(dp=4, tp=2)
    pspecs = sh.filter_specs_for(params, sh.param_specs(CFG))
    params_s = sh.shard_pytree(params, pspecs, mesh)
    cache = impl.init(B, jnp.float32)
    cache_s = sh.shard_pytree(cache, sh.cache_specs(eng, cache), mesh)
    tokens_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    got1, got2 = _run(eng, params_s, cache_s, tokens_s, mesh)

    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=2e-4, atol=2e-4)


def test_compressed_cache_specs_cover_state():
    import dataclasses
    cfg128 = dataclasses.replace(CFG, head_dim=128, num_heads=4, num_kv_heads=2,
                                 hidden_size=512)
    eng = EngineConfig(model=cfg128, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.7, v_sparsity=0.7),
                       max_seq_len=544, chunk_size=256)
    impl = make_cache(eng)
    cache = impl.init(2, jnp.float32)
    specs = sh.cache_specs(eng, cache)
    assert set(specs) == set(cache)
    mesh = sh.make_mesh(dp=2, tp=2)
    shc = sh.shard_pytree(cache, specs, mesh)
    assert shc["kv_pool"].sharding.spec[2] == "data"
    assert shc["kv_pool"].sharding.spec[3] == "model"


import pytest


@pytest.mark.parametrize("codec", ["bitmap", "q8q4"])
def test_compressed_kernel_under_mesh_matches_single_device(codec):
    """The production compressed path (kv_pool + fused Pallas kernel, interpret
    mode on CPU) executed head-local under a dp x tp mesh via shard_map must
    reproduce single-device logits, across prefill chunk packing and decode
    (both chunk codecs; the quant codec also shards its scales state)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, name="shard-comp", head_dim=128,
                              num_heads=4, num_kv_heads=2, hidden_size=512,
                              intermediate_size=1024)
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=1056, prefill_bucket=512, chunk_size=256,
                       codec=codec)
    from mustafar_tpu.cache.compressed import CompressedKVCache
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    B = 4
    tokens = jnp.asarray(np.random.RandomState(1).randint(0, 256, (B, 400)))

    def run(impl, params, cache, tokens):
        def fn(params, tokens, cache):
            logits, cache = llama.prefill(cfg, params, tokens, cache, impl,
                                          jnp.int32(400))
            tok = jnp.argmax(logits[:, 399], axis=-1).astype(jnp.int32)[:, None]
            logits2, cache = llama.decode_step(cfg, params, tok, cache, impl,
                                               jnp.int32(400))
            return logits[:, 399], logits2[:, 0]
        return jax.jit(fn)(params, tokens, cache)

    impl = CompressedKVCache(eng, use_pallas=True)   # interpret mode on CPU
    ref1, ref2 = run(impl, params, impl.init(B, jnp.float32), tokens)

    mesh = sh.make_mesh(dp=2, tp=2)
    impl_s = CompressedKVCache(eng, use_pallas=True)
    impl_s.mesh = mesh
    pspecs = sh.filter_specs_for(params, sh.param_specs(cfg))
    params_s = sh.shard_pytree(params, pspecs, mesh)
    cache = impl_s.init(B, jnp.float32)
    cache_s = sh.shard_pytree(cache, sh.cache_specs(eng, cache), mesh)
    tokens_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    got1, got2 = run(impl_s, params_s, cache_s, tokens_s)

    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("method", [PruneMethod.KT_OPA_VT_MAG,
                                    PruneMethod.KT_MAG_VT_OPA])
def test_compressed_opa_under_mesh_matches_single_device(method):
    """Opa pruning in compressed mode under dp x tp: the kernel's softmax
    stats ride out of the shard_map ((out, m, l), extra_out="norm" in
    parallel/sharding.shard_headlocal_attend) and the score accumulation /
    window-prob reconstruction run as plain GSPMD ops on the sharded
    [L, B, Hkv, wcap, D] score state.  Logits AND accumulated scores must
    match single-device execution."""
    import dataclasses
    cfg = dataclasses.replace(CFG, name="shard-opa", head_dim=128,
                              num_heads=4, num_kv_heads=2, hidden_size=512,
                              intermediate_size=1024)
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=method,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=1056, prefill_bucket=512, chunk_size=256,
                       codec="q8q4")
    from mustafar_tpu.cache.compressed import CompressedKVCache
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    B = 4
    tokens = jnp.asarray(np.random.RandomState(2).randint(0, 256, (B, 400)))
    score_key = "k_score" if method is PruneMethod.KT_OPA_VT_MAG else "v_score"

    def run(impl, params, cache, tokens):
        def fn(params, tokens, cache):
            logits, cache = llama.prefill(cfg, params, tokens, cache, impl,
                                          jnp.int32(400))
            tok = jnp.argmax(logits[:, 399], axis=-1).astype(jnp.int32)[:, None]
            pos = 400
            for _ in range(2):      # accumulate scores across 2 decode steps
                logits2, cache = llama.decode_step(cfg, params, tok, cache,
                                                   impl, jnp.int32(pos))
                tok = jnp.argmax(logits2[:, 0], axis=-1).astype(jnp.int32)[:, None]
                pos += 1
            return logits2[:, 0], cache[score_key]
        return jax.jit(fn)(params, tokens, cache)

    impl = CompressedKVCache(eng, use_pallas=True)   # interpret mode on CPU
    ref, ref_sc = run(impl, params, impl.init(B, jnp.float32), tokens)

    mesh = sh.make_mesh(dp=2, tp=2)
    impl_s = CompressedKVCache(eng, use_pallas=True)
    impl_s.mesh = mesh
    pspecs = sh.filter_specs_for(params, sh.param_specs(cfg))
    params_s = sh.shard_pytree(params, pspecs, mesh)
    cache = impl_s.init(B, jnp.float32)
    specs = sh.cache_specs(eng, cache)
    assert specs[score_key] == P(None, "data", "model", None, None)
    cache_s = sh.shard_pytree(cache, specs, mesh)
    tokens_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    got, got_sc = run(impl_s, params_s, cache_s, tokens_s)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert np.asarray(got_sc).sum() > 0        # scores actually accumulated
    # scores are exp() of dp x tp matmul outputs: reduction-order noise in
    # the projections (logits diff ~1e-4) amplifies; measured max 4e-5 abs
    np.testing.assert_allclose(np.asarray(got_sc), np.asarray(ref_sc),
                               rtol=5e-3, atol=1e-4)


def test_graft_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    fn, args = g.entry()
    out, _ = jax.jit(fn)(*args)
    assert out.shape == (2,)
    g.dryrun_multichip(8)


def test_w8a8_tp_dp_matches_single_device():
    """W8A8 under dp x tp: the act-quant per-token max over a row-parallel
    contraction axis is a global-semantics reduction (GSPMD inserts the
    small collective); marker leaves replicate (param_specs "a8")."""
    from mustafar_tpu.models.quant import enable_act_quant, quantize_params
    assert len(jax.devices()) >= 8
    eng = EngineConfig(model=CFG, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=128)
    params = enable_act_quant(quantize_params(
        init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)))
    impl = make_cache(eng)
    B = 4
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 256, (B, 64)))
    ref1, ref2 = _run(eng, params, impl.init(B, jnp.float32), tokens)

    mesh = sh.make_mesh(dp=4, tp=2)
    pspecs = sh.filter_specs_for(params, sh.param_specs(CFG))
    params_s = sh.shard_pytree(params, pspecs, mesh)
    cache = impl.init(B, jnp.float32)
    cache_s = sh.shard_pytree(cache, sh.cache_specs(eng, cache), mesh)
    tokens_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    got1, got2 = _run(eng, params_s, cache_s, tokens_s, mesh)

    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=2e-4,
                               atol=2e-4)
