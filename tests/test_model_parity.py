"""Model correctness vs HF transformers (torch CPU) on tiny random Llama/Mistral.

This replaces the reference's implicit 'accuracy yardstick' (LongBench scores of
the unmodified HF model — SURVEY.md §4): our dense forward must match HF
logits, and our dense greedy generate must match HF greedy generate.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
from transformers import LlamaConfig, LlamaForCausalLM, MistralConfig, MistralForCausalLM

from mustafar_tpu.config import CacheMode, EngineConfig, PruneConfig, PruneMethod
from mustafar_tpu.models import llama as mt_llama
from mustafar_tpu.models.weights import load_hf_model
from mustafar_tpu.cache import make_cache
from mustafar_tpu.runtime.generate import Generator


def tiny_hf_llama(kv_heads=2, rope_scaling=None, vocab=256):
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=kv_heads,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        rope_scaling=rope_scaling, tie_word_embeddings=False, attn_implementation="eager",
    )
    return LlamaForCausalLM(cfg).eval()


def tiny_hf_mistral(sliding_window=None):
    torch.manual_seed(1)
    cfg = MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=sliding_window, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    return MistralForCausalLM(cfg).eval()


def hf_logits(model, ids):
    with torch.no_grad():
        return model(torch.tensor(ids)).logits.float().numpy()


def our_prefill_logits(cfg, params, ids, max_seq=512):
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE, max_seq_len=max_seq)
    impl = make_cache(eng)
    cache = impl.init(len(ids), jnp.float32)
    logits, _ = mt_llama.prefill(cfg, params, jnp.asarray(ids), cache, impl,
                                 jnp.int32(len(ids[0])))
    return np.asarray(logits)


@pytest.mark.parametrize("kv_heads", [4, 2])  # MHA and GQA
def test_llama_prefill_matches_hf(kv_heads):
    hf = tiny_hf_llama(kv_heads=kv_heads)
    cfg, params = load_hf_model(hf, dtype=jnp.float32)
    ids = np.random.RandomState(0).randint(0, 256, size=(2, 33)).tolist()
    ours = our_prefill_logits(cfg, params, ids)
    theirs = hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_llama3_rope_scaling_matches_hf():
    scaling = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
               "high_freq_factor": 4.0, "original_max_position_embeddings": 64}
    hf = tiny_hf_llama(rope_scaling=scaling)
    cfg, params = load_hf_model(hf, dtype=jnp.float32)
    assert cfg.rope_scaling is not None
    ids = np.random.RandomState(1).randint(0, 256, size=(1, 100)).tolist()
    ours = our_prefill_logits(cfg, params, ids)
    theirs = hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_mistral_matches_hf():
    hf = tiny_hf_mistral()
    cfg, params = load_hf_model(hf, dtype=jnp.float32)
    ids = np.random.RandomState(2).randint(0, 256, size=(1, 40)).tolist()
    ours = our_prefill_logits(cfg, params, ids)
    theirs = hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_mistral_sliding_window_matches_hf():
    hf = tiny_hf_mistral(sliding_window=16)
    cfg, params = load_hf_model(hf, dtype=jnp.float32)
    assert cfg.sliding_window == 16
    ids = np.random.RandomState(3).randint(0, 256, size=(1, 48)).tolist()
    ours = our_prefill_logits(cfg, params, ids)
    theirs = hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_dense_generate_matches_hf_greedy():
    hf = tiny_hf_llama()
    cfg, params = load_hf_model(hf, dtype=jnp.float32)
    ids = np.random.RandomState(4).randint(0, 256, size=(1, 21))
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(ids), max_new_tokens=16, do_sample=False,
                             num_beams=1, pad_token_id=0)
    hf_new = hf_out[0, ids.shape[1]:].numpy()
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE, max_seq_len=256,
                       prefill_bucket=32)
    gen = Generator(eng, params, dtype=jnp.float32)
    ours = gen.generate(ids, max_new_tokens=16)[0]
    np.testing.assert_array_equal(ours, hf_new)


def test_decode_matches_prefill_consistency():
    """Dense decode path must produce the same logits as prefill at each position."""
    hf = tiny_hf_llama()
    cfg, params = load_hf_model(hf, dtype=jnp.float32)
    rs = np.random.RandomState(5)
    ids = rs.randint(0, 256, size=(2, 24))
    T = ids.shape[1]

    eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE, max_seq_len=64)
    impl = make_cache(eng)
    cache = impl.init(2, jnp.float32)
    logits_pre, cache = mt_llama.prefill(cfg, params, jnp.asarray(ids[:, :T - 4]),
                                         cache, impl, jnp.int32(T - 4))
    outs = []
    for i in range(T - 4, T):
        logits_dec, cache = mt_llama.decode_step(
            cfg, params, jnp.asarray(ids[:, i:i + 1]), cache, impl, jnp.int32(i))
        outs.append(np.asarray(logits_dec[:, 0]))
    full = our_prefill_logits(cfg, params, ids.tolist(), max_seq=64)
    for j, i in enumerate(range(T - 4, T)):
        np.testing.assert_allclose(outs[j], full[:, i], rtol=2e-4, atol=2e-4)


def test_load_hf_dir_roundtrip(tmp_path):
    """save_pretrained -> load_hf_dir -> logits match the in-memory model."""
    hf = tiny_hf_llama(kv_heads=2)
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from mustafar_tpu.models.weights import load_hf_dir
    cfg, params = load_hf_dir(str(tmp_path), dtype=jnp.float32)
    assert cfg.num_kv_heads == 2
    ids = np.random.RandomState(7).randint(0, 256, size=(1, 20)).tolist()
    ours = our_prefill_logits(cfg, params, ids)
    theirs = hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
