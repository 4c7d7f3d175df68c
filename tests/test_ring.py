"""Sequence-parallel ring-attention tests (8-virtual-device CPU mesh).

Validates parallel.ring against the single-device reference path: the ring
primitive vs ops.attention.prefill_attention (causal, true_len, sliding
window), and the full SP prefill -> cache reshard -> standard decode flow
producing the same logits as replicated prefill + decode.
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
from mustafar_tpu.ops.attention import prefill_attention
from mustafar_tpu.parallel import ring, sharding as sh

CFG = ModelConfig(name="ring-test", vocab_size=256, hidden_size=128,
                  intermediate_size=256, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=32, max_position_embeddings=1024)


def _qkv(key, B=2, T=256, Hq=4, Hkv=2, D=32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, Hq, D), jnp.float32)
    k = jax.random.normal(kk, (B, T, Hkv, D), jnp.float32)
    v = jax.random.normal(kv, (B, T, Hkv, D), jnp.float32)
    return q, k, v


def test_ring_matches_reference_causal():
    mesh = sh.make_mesh(dp=4, tp=2)
    q, k, v = _qkv(jax.random.PRNGKey(0))
    for true_len in (256, 193):
        ref = prefill_attention(q, k, v, jnp.int32(true_len))
        got = jax.jit(lambda q, k, v, tl: ring.ring_prefill_attention(
            q, k, v, tl, mesh))(q, k, v, jnp.int32(true_len))
        tl = int(true_len)
        np.testing.assert_allclose(np.asarray(got)[:, :tl],
                                   np.asarray(ref)[:, :tl],
                                   rtol=2e-5, atol=2e-5)


def test_ring_matches_reference_sliding_window():
    mesh = sh.make_mesh(dp=4, tp=2)
    q, k, v = _qkv(jax.random.PRNGKey(1))
    ref = prefill_attention(q, k, v, jnp.int32(256), window=96)
    got = jax.jit(lambda q, k, v: ring.ring_prefill_attention(
        q, k, v, jnp.int32(256), mesh, window=96))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_seq_axis_only_mesh():
    # 8-way pure sequence parallelism (no tensor axis)
    mesh = sh.make_mesh(dp=8, tp=1)
    q, k, v = _qkv(jax.random.PRNGKey(2), T=512)
    ref = prefill_attention(q, k, v, jnp.int32(512))
    got = jax.jit(lambda q, k, v: ring.ring_prefill_attention(
        q, k, v, jnp.int32(512), mesh, head_axis="model"))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _sp_then_decode(eng, mesh, tokens, true_len, n_decode=3):
    """SP prefill -> reshard -> standard sharded decode; returns logits."""
    cfg = eng.model
    impl = make_cache(eng)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    pspecs = sh.filter_specs_for(params, sh.param_specs(cfg))
    params_s = sh.shard_pytree(params, pspecs, mesh)
    B = tokens.shape[0]
    cache = impl.init(B, jnp.float32)
    cspecs = sh.cache_specs(eng, cache)

    @jax.jit
    def run(params, tokens, cache):
        logits, cache = ring.sp_prefill(cfg, params, tokens, cache, impl,
                                        jnp.int32(true_len), mesh,
                                        last_only=True)
        outs = [logits[:, -1]]
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        for i in range(n_decode):
            logits, cache = llama.decode_step(cfg, params, tok, cache, impl,
                                              jnp.int32(true_len) + i)
            outs.append(logits[:, 0])
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        return jnp.stack(outs)

    return run(params_s, tokens, cache), params, impl


def _ref_decode(eng, params, impl, tokens, true_len, n_decode=3):
    cfg = eng.model
    B = tokens.shape[0]
    cache = impl.init(B, jnp.float32)

    @jax.jit
    def run(params, tokens, cache):
        logits, cache = llama.prefill(cfg, params, tokens, cache, impl,
                                      jnp.int32(true_len), last_only=True)
        outs = [logits[:, -1]]
        tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        for i in range(n_decode):
            logits, cache = llama.decode_step(cfg, params, tok, cache, impl,
                                              jnp.int32(true_len) + i)
            outs.append(logits[:, 0])
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        return jnp.stack(outs)

    return run(params, tokens, cache)


def test_sp_prefill_decode_parity_masked():
    """Full flow on the masked (pruned) cache: SP prefill == replicated."""
    eng = EngineConfig(model=CFG, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=320)
    mesh = sh.make_mesh(dp=4, tp=2)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 256, (4, 256)))
    got, params, impl = _sp_then_decode(eng, mesh, tokens, true_len=256)
    ref = _ref_decode(eng, params, impl, tokens, true_len=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_sp_prefill_decode_parity_dense_window():
    """Mistral semantics (sliding window) through the SP path, dense cache."""
    import dataclasses
    cfg_w = dataclasses.replace(CFG, sliding_window=128)
    eng = EngineConfig(model=cfg_w, cache_mode=CacheMode.DENSE,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.0, v_sparsity=0.0),
                       max_seq_len=320)
    mesh = sh.make_mesh(dp=4, tp=2)
    tokens = jnp.asarray(np.random.RandomState(1).randint(0, 256, (4, 256)))
    got, params, impl = _sp_then_decode(eng, mesh, tokens, true_len=256)
    ref = _ref_decode(eng, params, impl, tokens, true_len=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
