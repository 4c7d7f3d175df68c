"""Continuous-batching scheduler tests: equivalence with the plain Generator,
slot reuse, per-slot positions at mixed lengths."""

import numpy as np
import jax
import jax.numpy as jnp

from mustafar_tpu.config import (CacheMode, EngineConfig, PruneConfig,
                                 PruneMethod, TINY_LLAMA)
from mustafar_tpu.models.llama import init_params
from mustafar_tpu.runtime.generate import Generator
from mustafar_tpu.runtime.scheduler import ContinuousBatchingEngine


def _setup(cache_mode=CacheMode.DENSE, B=2):
    params = init_params(TINY_LLAMA, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = EngineConfig(model=TINY_LLAMA, cache_mode=cache_mode,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=256, prefill_bucket=32, batch_size=B)
    return eng, params


def test_matches_generator_dense():
    """Two different-length prompts through the scheduler must reproduce the
    single-request Generator outputs exactly (dense cache, greedy)."""
    eng, params = _setup()
    rs = np.random.RandomState(0)
    p1 = rs.randint(0, 512, size=17)
    p2 = rs.randint(0, 512, size=41)

    gen = Generator(eng, params, dtype=jnp.float32)
    want1 = gen.generate(p1[None], max_new_tokens=10)[0]
    want2 = gen.generate(p2[None], max_new_tokens=10)[0]

    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.float32)
    u1 = cb.submit(p1, 10)
    u2 = cb.submit(p2, 10)
    outs = cb.run()
    np.testing.assert_array_equal(outs[u1], want1)
    np.testing.assert_array_equal(outs[u2], want2)


def test_slot_reuse_more_requests_than_slots():
    eng, params = _setup(B=2)
    rs = np.random.RandomState(1)
    prompts = [rs.randint(0, 512, size=n) for n in (9, 23, 15, 30, 12)]
    gen = Generator(eng, params, dtype=jnp.float32)
    want = [gen.generate(p[None], max_new_tokens=6)[0] for p in prompts]

    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.float32)
    uids = [cb.submit(p, 6) for p in prompts]
    outs = cb.run()
    assert len(outs) == 5
    for uid, w in zip(uids, want):
        np.testing.assert_array_equal(outs[uid], w)


def test_masked_pruning_per_slot():
    """Masked (kt_mag_vt_mag) cache with per-slot positions: scheduler output
    equals the Generator's for each request independently."""
    eng, params = _setup(cache_mode=CacheMode.MASKED)
    rs = np.random.RandomState(2)
    p1 = rs.randint(0, 512, size=60)   # > residual so pruning kicks in
    p2 = rs.randint(0, 512, size=90)
    gen = Generator(eng, params, dtype=jnp.float32)
    want1 = gen.generate(p1[None], max_new_tokens=8)[0]
    want2 = gen.generate(p2[None], max_new_tokens=8)[0]

    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.float32)
    u1, u2 = cb.submit(p1, 8), cb.submit(p2, 8)
    outs = cb.run()
    np.testing.assert_array_equal(outs[u1], want1)
    np.testing.assert_array_equal(outs[u2], want2)


def test_eos_frees_slot():
    eng, params = _setup()
    rs = np.random.RandomState(3)
    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.float32, eos_id=3)
    uid = cb.submit(rs.randint(0, 512, size=12), 20)
    outs = cb.run()
    assert uid in outs
    assert 3 not in outs[uid].tolist()
    assert all(r is None for r in cb.slot_req)
