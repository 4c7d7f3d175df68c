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


def test_compressed_continuous_batching():
    """Compressed cache in the scheduler: different-length requests crossing
    compaction boundaries reproduce single-request Generator outputs."""
    import dataclasses
    from mustafar_tpu.config import TINY_LLAMA
    model = dataclasses.replace(TINY_LLAMA, name="tiny128cb", num_heads=2,
                                num_kv_heads=1, head_dim=128, hidden_size=128)
    eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=1024, prefill_bucket=256, chunk_size=256,
                       batch_size=2)
    params = init_params(model, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rs = np.random.RandomState(4)
    p1 = rs.randint(0, 512, size=120)    # no compressed chunks
    p2 = rs.randint(0, 512, size=400)    # one compressed chunk at prefill
    gen = Generator(eng, params, dtype=jnp.bfloat16)
    want1 = gen.generate(p1[None], max_new_tokens=8)[0]
    want2 = gen.generate(p2[None], max_new_tokens=8)[0]

    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16)
    u1, u2 = cb.submit(p1, 8), cb.submit(p2, 8)
    outs = cb.run()
    np.testing.assert_array_equal(outs[u1], want1)
    np.testing.assert_array_equal(outs[u2], want2)


def test_compressed_cb_decode_compaction_crossing():
    """Per-slot vectorized compaction during decode must match the scalar-path
    Generator: prompt 280 fills the window to 280; decode crosses the r+C=288
    boundary and compacts mid-generation."""
    import dataclasses
    from mustafar_tpu.config import TINY_LLAMA
    model = dataclasses.replace(TINY_LLAMA, name="tiny128cb2", num_heads=2,
                                num_kv_heads=1, head_dim=128, hidden_size=128)
    eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=1024, prefill_bucket=256, chunk_size=256,
                       batch_size=2)
    params = init_params(model, jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    rs = np.random.RandomState(5)
    p1 = rs.randint(0, 512, size=280)
    p2 = rs.randint(0, 512, size=530)   # also crosses: win 530-256=274 -> 288
    gen = Generator(eng, params, dtype=jnp.bfloat16)
    want1 = gen.generate(p1[None], max_new_tokens=30)[0]
    want2 = gen.generate(p2[None], max_new_tokens=30)[0]

    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16)
    u1, u2 = cb.submit(p1, 30), cb.submit(p2, 30)
    outs = cb.run()
    np.testing.assert_array_equal(outs[u1], want1)
    np.testing.assert_array_equal(outs[u2], want2)


def test_compressed_cb_sliding_window():
    """Mistral-style sliding window through the compressed continuous-batching
    path (per-slot window masking of pool chunks): scheduler must match the
    single-request Generator, including a compaction crossing."""
    import dataclasses
    from mustafar_tpu.config import TINY_LLAMA
    model = dataclasses.replace(TINY_LLAMA, name="tiny128swacb", num_heads=2,
                                num_kv_heads=1, head_dim=128, hidden_size=128,
                                sliding_window=320)
    eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=1024, prefill_bucket=256, chunk_size=256,
                       batch_size=2)
    params = init_params(model, jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    rs = np.random.RandomState(6)
    p1 = rs.randint(0, 512, size=280)   # crosses r+C=288 during decode
    p2 = rs.randint(0, 512, size=400)   # prefill packs a chunk; window active
    gen = Generator(eng, params, dtype=jnp.bfloat16)
    want1 = gen.generate(p1[None], max_new_tokens=20)[0]
    want2 = gen.generate(p2[None], max_new_tokens=20)[0]

    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16)
    u1, u2 = cb.submit(p1, 20), cb.submit(p2, 20)
    outs = cb.run()
    np.testing.assert_array_equal(outs[u1], want1)
    np.testing.assert_array_equal(outs[u2], want2)


def test_opa_continuous_batching_matches_generator():
    """Token-Opa (ring accumulators) under per-slot positions must match the
    single-request Generator."""
    eng, params = _setup(cache_mode=CacheMode.MASKED)
    eng = EngineConfig(**{**eng.__dict__,
                          "prune": PruneConfig(method=PruneMethod.KT_OPA_VT_MAG,
                                               k_sparsity=0.5, v_sparsity=0.5)})
    rs = np.random.RandomState(6)
    p1 = rs.randint(0, 512, size=70)
    p2 = rs.randint(0, 512, size=100)
    gen = Generator(eng, params, dtype=jnp.float32)
    want1 = gen.generate(p1[None], max_new_tokens=8)[0]
    want2 = gen.generate(p2[None], max_new_tokens=8)[0]
    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.float32)
    u1, u2 = cb.submit(p1, 8), cb.submit(p2, 8)
    outs = cb.run()
    np.testing.assert_array_equal(outs[u1], want1)
    np.testing.assert_array_equal(outs[u2], want2)


def test_vc_channel_policies_continuous_batching():
    """Channel (Vc) pruning under per-slot positions: each sequence prunes the
    group crossing its OWN boundary; scheduler must match the single-request
    Generator for both Vc_Mag and Vc_Opa (removes the round-1 guard)."""
    for mode in (PruneMethod.KT_MAG_VC_MAG, PruneMethod.KT_MAG_VC_OPA):
        eng, params = _setup(cache_mode=CacheMode.MASKED)
        eng = __import__("dataclasses").replace(
            eng, prune=PruneConfig(method=mode, k_sparsity=0.5,
                                   v_sparsity=0.5, group_size=32,
                                   residual_length=32))
        rs = np.random.RandomState(21)
        p1 = rs.randint(0, 512, size=40)
        p2 = rs.randint(0, 512, size=90)   # different group phase per slot
        gen = Generator(eng, params, dtype=jnp.float32)
        want1 = gen.generate(p1[None], max_new_tokens=40)[0]
        want2 = gen.generate(p2[None], max_new_tokens=40)[0]

        cb = ContinuousBatchingEngine(eng, params, dtype=jnp.float32)
        u1, u2 = cb.submit(p1, 40), cb.submit(p2, 40)
        outs = cb.run()
        np.testing.assert_array_equal(outs[u1], want1, err_msg=str(mode))
        np.testing.assert_array_equal(outs[u2], want2, err_msg=str(mode))


def test_chunked_prefill_continuous_batching():
    """chunked_prefill=True in the scheduler: each request's prompt is
    segment-streamed into its slot (O(chunk) activation memory — the
    long-prompt serving path).  At sparsity 0 the pruned past equals the
    dense past, so outputs must match the monolithic-prefill scheduler."""
    import dataclasses
    from mustafar_tpu.config import TINY_LLAMA
    model = dataclasses.replace(TINY_LLAMA, name="tiny128cp", num_heads=2,
                                num_kv_heads=1, head_dim=128, hidden_size=128)
    eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.0, v_sparsity=0.0),
                       max_seq_len=2048, prefill_bucket=256, chunk_size=256,
                       batch_size=2)
    params = init_params(model, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rs = np.random.RandomState(5)
    p1 = rs.randint(0, 512, size=700)    # 3 segments, final partial
    p2 = rs.randint(0, 512, size=300)    # 2 segments

    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16)
    u1, u2 = cb.submit(p1, 6), cb.submit(p2, 6)
    want = cb.run()

    engc = dataclasses.replace(eng, chunked_prefill=True)
    cbc = ContinuousBatchingEngine(engc, params, dtype=jnp.bfloat16)
    v1, v2 = cbc.submit(p1, 6), cbc.submit(p2, 6)
    got = cbc.run()
    # bf16 accumulation-order noise can flip a near-tie argmax late in the
    # rollout; require the first 4 tokens of every sequence to match.
    np.testing.assert_array_equal(got[v1][:4], want[u1][:4])
    np.testing.assert_array_equal(got[v2][:4], want[u2][:4])


def test_interleaved_admission_matches_blocking():
    """Segment-per-tick admission must emit exactly the blocking chunked
    scheduler's tokens (same segment programs; decode slots are independent
    of the admission sub-cache), while decode KEEPS RUNNING underneath the
    admission (probed via manual ticks)."""
    import dataclasses
    from mustafar_tpu.config import TINY_LLAMA
    model = dataclasses.replace(TINY_LLAMA, name="tiny128il", num_heads=2,
                                num_kv_heads=1, head_dim=128, hidden_size=128)
    eng = EngineConfig(model=model, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=2048, prefill_bucket=256, chunk_size=256,
                       batch_size=2, chunked_prefill=True)
    params = init_params(model, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rs = np.random.RandomState(7)
    p_short = rs.randint(0, 512, size=100)
    p_long = rs.randint(0, 512, size=1000)   # 4 admission segments

    cb_blk = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16,
                                      interleave=False)
    b1, b2 = cb_blk.submit(p_short, 12), cb_blk.submit(p_long, 6)
    want = cb_blk.run()

    cb_il = ContinuousBatchingEngine(eng, params, dtype=jnp.bfloat16)
    assert cb_il.interleave
    i1, i2 = cb_il.submit(p_short, 12), cb_il.submit(p_long, 6)
    # manual ticks: record the short request's emitted-token count while the
    # long admission is still streaming segments
    progress = []
    for _ in range(10000):
        if not (cb_il.queue or cb_il._admissions
                or any(r is not None for r in cb_il.slot_req)):
            break
        cb_il._fill_slots()
        cb_il._decode_step()
        if cb_il._admissions:
            progress.append(len(cb_il.requests[i1].out))
    got = {uid: np.asarray(r.out) for uid, r in cb_il.finished.items()}
    np.testing.assert_array_equal(got[i1], want[b1])
    np.testing.assert_array_equal(got[i2], want[b2])
    # decode advanced during the admission window (the blocking path would
    # have emitted nothing until the long prefill finished)
    assert progress and progress[-1] > progress[0], progress


def test_cb_sampling_deterministic_per_seed():
    """SamplingParams reach the batched decode step: non-greedy runs are
    reproducible for a seed and differ from greedy."""
    from mustafar_tpu.runtime.generate import SamplingParams
    eng, params = _setup()
    rs = np.random.RandomState(3)
    prompt = rs.randint(0, 512, size=25)
    sp = SamplingParams(temperature=0.8, top_k=50, seed=11)

    outs = []
    for _ in range(2):
        cb = ContinuousBatchingEngine(eng, params, dtype=jnp.float32,
                                      sampling=sp)
        uid = cb.submit(prompt, 16)
        outs.append(cb.run()[uid])
    np.testing.assert_array_equal(outs[0], outs[1])

    greedy = ContinuousBatchingEngine(eng, params, dtype=jnp.float32)
    guid = greedy.submit(prompt, 16)
    gout = greedy.run()[guid]
    assert not np.array_equal(outs[0], gout)
