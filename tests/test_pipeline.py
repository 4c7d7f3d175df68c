"""Pipeline-parallelism tests (stage-sharded layers, 8-virtual-device CPU).

Validates parallel.pipeline's GPipe schedule against single-device
prefill/decode: same logits, same greedy tokens, dense and masked (pruned)
caches, multiple microbatch counts.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mustafar_tpu.config import (CacheMode, EngineConfig, ModelConfig,
                                 PruneConfig, PruneMethod)
from mustafar_tpu.cache import make_cache
from mustafar_tpu.models import llama
from mustafar_tpu.models.llama import init_params
from mustafar_tpu.parallel import pipeline as pp

CFG = ModelConfig(name="pp-test", vocab_size=256, hidden_size=128,
                  intermediate_size=256, num_layers=4, num_heads=4,
                  num_kv_heads=2, head_dim=32, max_position_embeddings=512)


def _mk(cache_mode, sparsity=0.5):
    eng = EngineConfig(model=CFG, cache_mode=cache_mode,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=sparsity,
                                         v_sparsity=sparsity),
                       max_seq_len=160)
    # per-layer attend protocol (the PP schedule slices the cache per layer)
    impl = make_cache(eng)
    params = init_params(CFG, jax.random.PRNGKey(11), dtype=jnp.float32)
    return eng, impl, params


def _ref(impl, params, tokens, true_len, n_decode):
    cache = impl.init(tokens.shape[0], jnp.float32)

    @jax.jit
    def run(params, tokens, cache):
        logits, cache = llama.prefill(CFG, params, tokens, cache, impl,
                                      jnp.int32(true_len), last_only=True)
        outs = [logits[:, 0]]
        tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        for i in range(n_decode):
            logits, cache = llama.decode_step(CFG, params, tok, cache, impl,
                                              jnp.int32(true_len) + i)
            outs.append(logits[:, 0])
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        return jnp.stack(outs)

    return np.asarray(run(params, tokens, cache))


def _pp(impl, params, tokens, true_len, n_decode, stages, n_micro, tp=1,
        eng=None):
    mesh = pp.stage_mesh(stages, tp=tp)
    cache = impl.init(tokens.shape[0], jnp.float32)
    params_s, cache = (pp.shard_pp(params, cache, mesh, cfg=CFG, engine=eng)
                       if tp > 1 else pp.shard_pp(params, cache, mesh))

    @jax.jit
    def run(params, tokens, cache):
        logits, cache = pp.pp_prefill(CFG, params, tokens, cache, impl,
                                      jnp.int32(true_len), mesh,
                                      n_micro=n_micro)
        outs = [logits[:, 0]]
        tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        for i in range(n_decode):
            logits, cache = pp.pp_decode_step(CFG, params, tok, cache, impl,
                                              jnp.int32(true_len) + i, mesh,
                                              n_micro=n_micro)
            outs.append(logits[:, 0])
            tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
        return jnp.stack(outs)

    return np.asarray(run(params_s, tokens, cache))


def test_pp_dense_matches_single_device():
    _, impl, params = _mk(CacheMode.DENSE, sparsity=0.0)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 256, (4, 96)))
    ref = _ref(impl, params, tokens, 96, n_decode=3)
    for n_micro in (1, 2, 4):
        got = _pp(impl, params, tokens, 96, 3, stages=4, n_micro=n_micro)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_pp_masked_pruned_matches_single_device():
    _, impl, params = _mk(CacheMode.MASKED, sparsity=0.5)
    tokens = jnp.asarray(np.random.RandomState(1).randint(0, 256, (4, 96)))
    ref = _ref(impl, params, tokens, 96, n_decode=4)
    got = _pp(impl, params, tokens, 96, 4, stages=4, n_micro=2)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_pp_x_tp_matches_single_device():
    """PP x TP composition: manual over "stage", GSPMD-auto over "model" —
    in-stage weights carry the Megatron column/row shardings and each
    stage's compute is tensor-parallel (pp_placement_specs)."""
    eng, impl, params = _mk(CacheMode.MASKED, sparsity=0.5)
    tokens = jnp.asarray(np.random.RandomState(3).randint(0, 256, (4, 96)))
    ref = _ref(impl, params, tokens, 96, n_decode=3)
    # tp caps at Hkv=2 (the cache's head axis shards over "model")
    for stages, tp in ((2, 2), (4, 2)):
        got = _pp(impl, params, tokens, 96, 3, stages=stages, n_micro=2,
                  tp=tp, eng=eng)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_pp_two_stages_partial_true_len():
    _, impl, params = _mk(CacheMode.MASKED, sparsity=0.7)
    tokens = jnp.asarray(np.random.RandomState(2).randint(0, 256, (2, 96)))
    ref = _ref(impl, params, tokens, 70, n_decode=2)
    got = _pp(impl, params, tokens, 70, 2, stages=2, n_micro=2)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
