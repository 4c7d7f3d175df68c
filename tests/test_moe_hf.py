"""HF Mixtral checkpoint loading + MoE weight quantization (CPU).

Closes the round-4 PARITY gap: ``weights.params_from_state_dict`` converts HF
Mixtral's block_sparse_moe leaves (gate router, experts.{e}.w1/w3/w2) into
the layer-stacked MoE pytree, and ``quant.quantize_params`` /
``quantize_params_w4`` carry the expert FFNs as W8 with per-(expert,
out-channel) scales consumed on the fly by moe.moe_mlp.

The reference has no MoE model (SURVEY.md §2.2 — dense-only grid); HF logit
parity here plays the same role test_model_parity.py plays for Llama/Mistral.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
from transformers import MixtralConfig, MixtralForCausalLM

from mustafar_tpu.config import CacheMode, EngineConfig
from mustafar_tpu.cache import make_cache
from mustafar_tpu.models import llama as mt_llama
from mustafar_tpu.models.quant import quantize_params, quantize_params_w4
from mustafar_tpu.models.weights import load_hf_model
from mustafar_tpu.runtime.generate import Generator


def tiny_hf_mixtral(num_experts=4, top_k=2, hidden=64, inter=128):
    torch.manual_seed(2)
    cfg = MixtralConfig(
        vocab_size=256, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        num_local_experts=num_experts, num_experts_per_tok=top_k,
        sliding_window=None, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    return MixtralForCausalLM(cfg).eval()


def _load(hf, dtype=jnp.float32):
    cfg, params = load_hf_model(hf, dtype)
    # exactness vs HF's per-token routing needs zero capacity drops;
    # factor E/K makes C >= N even if every token picked the same expert
    cfg = dataclasses.replace(
        cfg, expert_capacity_factor=float(cfg.num_experts
                                          / cfg.num_experts_per_tok))
    return cfg, params


def hf_logits(model, ids):
    with torch.no_grad():
        return model(torch.tensor(ids)).logits.float().numpy()


def our_prefill_logits(cfg, params, ids, max_seq=512):
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE,
                       max_seq_len=max_seq)
    impl = make_cache(eng)
    cache = impl.init(len(ids), jnp.float32)
    logits, _ = mt_llama.prefill(cfg, params, jnp.asarray(ids), cache, impl,
                                 jnp.int32(len(ids[0])))
    return np.asarray(logits)


def test_mixtral_config_mapping():
    hf = tiny_hf_mixtral()
    cfg, params = _load(hf)
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    lp = params["layers"]
    assert "w_router" in lp and "w_gate" not in lp
    assert lp["w_router"].shape == (2, 64, 4)
    assert lp["we_gate"].shape == (2, 4, 64, 128)
    assert lp["we_down"].shape == (2, 4, 128, 64)


def test_mixtral_prefill_matches_hf():
    hf = tiny_hf_mixtral()
    cfg, params = _load(hf)
    ids = np.random.RandomState(0).randint(1, 256, (2, 33)).tolist()
    ours = our_prefill_logits(cfg, params, ids)
    ref = hf_logits(hf, ids)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_mixtral_greedy_generate_matches_hf():
    hf = tiny_hf_mixtral()
    cfg, params = _load(hf)
    ids = np.random.RandomState(1).randint(1, 256, (2, 17))
    with torch.no_grad():
        ref = hf.generate(torch.tensor(ids), max_new_tokens=8,
                          do_sample=False).numpy()[:, ids.shape[1]:]
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE, max_seq_len=64,
                       prefill_bucket=32)
    gen = Generator(eng, params, dtype=jnp.float32)
    got = gen.generate(ids, max_new_tokens=8, eos_id=None)
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.parametrize("quant", ["w8", "w4"])
def test_mixtral_quantized_experts_close(quant):
    """W8 experts (both quant modes keep MoE at int8) stay close to fp32."""
    # W4 packs attention weights into 128-row nibble blocks, so its variant
    # needs 128-divisible projection in-dims (quantize_params_w4 docstring)
    hf = (tiny_hf_mixtral() if quant == "w8"
          else tiny_hf_mixtral(hidden=128, inter=256))
    cfg, params = _load(hf)
    ids = np.random.RandomState(2).randint(1, 256, (2, 33)).tolist()
    ref = our_prefill_logits(cfg, params, ids)
    qp = (quantize_params if quant == "w8" else quantize_params_w4)(params)
    lp = qp["layers"]
    assert lp["we_gate"].dtype == jnp.int8
    H, I = cfg.hidden_size, cfg.intermediate_size
    assert lp["we_gate_scale"].shape == (2, 4, I)
    assert lp["we_down_scale"].shape == (2, 4, H)
    assert lp["w_router"].dtype != jnp.int8  # router stays high-precision
    got = our_prefill_logits(cfg, qp, ids)
    assert np.abs(got - ref).mean() < 0.05
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    # W8 keeps ranking stable even on a random-init model; the w4 leg also
    # quantizes ATTENTION to int4, whose error on near-uniform random logits
    # dominates — its ranking bound is loose (int4 fidelity itself is covered
    # by tests/test_weight_quant.py on realistic setups)
    assert agree > (0.95 if quant == "w8" else 0.5), agree


def test_mixtral_load_hf_dir_roundtrip(tmp_path):
    """On-disk HF Mixtral checkpoint (safetensors) loads through load_hf_dir
    with identical logits to the in-memory conversion."""
    from mustafar_tpu.models.weights import load_hf_dir

    hf = tiny_hf_mixtral()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg_d, params_d = load_hf_dir(str(tmp_path), dtype=jnp.float32)
    assert cfg_d.num_experts == 4 and cfg_d.num_experts_per_tok == 2
    cfg_d = dataclasses.replace(
        cfg_d, expert_capacity_factor=float(cfg_d.num_experts
                                            / cfg_d.num_experts_per_tok))
    ids = np.random.RandomState(4).randint(1, 256, (2, 21)).tolist()
    got = our_prefill_logits(cfg_d, params_d, ids)
    ref = hf_logits(hf, ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_moe_continuous_batching_matches_generator():
    """MoE models serve through the continuous-batching scheduler (the MLP
    routing rides the per-layer protocol), token-exact vs the Generator on
    the compressed q8q4 engine."""
    from mustafar_tpu.config import ModelConfig
    from mustafar_tpu.models.llama import init_params
    from mustafar_tpu.runtime.scheduler import ContinuousBatchingEngine

    cfg = ModelConfig(name="moe-cb", vocab_size=512, hidden_size=128,
                      intermediate_size=256, num_layers=2, num_heads=2,
                      num_kv_heads=1, head_dim=128,
                      max_position_embeddings=1024, num_experts=4,
                      num_experts_per_tok=2, expert_capacity_factor=8.0)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    from mustafar_tpu.config import PruneConfig, PruneMethod
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.COMPRESSED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=1024, prefill_bucket=256, chunk_size=256,
                       codec="q8q4", batch_size=2)
    rs = np.random.RandomState(6)
    prompts = [rs.randint(0, 512, size=n) for n in (40, 90)]
    gen = Generator(eng, params, dtype=jnp.float32)
    want = [gen.generate(p[None], max_new_tokens=8)[0] for p in prompts]
    cb = ContinuousBatchingEngine(eng, params, dtype=jnp.float32)
    uids = [cb.submit(p, 8) for p in prompts]
    outs = cb.run()
    for u, w in zip(uids, want):
        np.testing.assert_array_equal(outs[u], w)


def test_mixtral_w8_ep_sharded_matches_single_device():
    """Quantized experts under the EP sharding (scales ride the E axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mustafar_tpu.parallel import sharding as sh

    hf = tiny_hf_mixtral()
    cfg, params = _load(hf)
    qp = quantize_params(params)
    ids = np.random.RandomState(3).randint(1, 256, (4, 32)).tolist()
    ref = our_prefill_logits(cfg, qp, ids, max_seq=64)

    mesh = sh.make_mesh(dp=4, tp=2)
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.DENSE, max_seq_len=64)
    impl = make_cache(eng)
    cache = impl.init(4, jnp.float32)
    pspecs = sh.filter_specs_for(qp, sh.param_specs(cfg))
    qps = sh.shard_pytree(qp, pspecs, mesh)
    cache = sh.shard_pytree(cache, sh.cache_specs(eng, cache), mesh)
    tokens = jax.device_put(jnp.asarray(ids),
                            NamedSharding(mesh, P("data", None)))

    @jax.jit
    def run(params, tokens, cache):
        logits, _ = mt_llama.prefill(cfg, params, tokens, cache, impl,
                                     jnp.int32(32))
        return logits

    got = np.asarray(run(qps, tokens, cache))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_mixtral_w8a8_experts_close():
    """W8A8 (int8 activations through the expert einsums) stays close."""
    from mustafar_tpu.models.quant import enable_act_quant
    cfg, params = _load(tiny_hf_mixtral())
    ids = np.random.RandomState(2).randint(1, 256, (2, 33)).tolist()
    ref = our_prefill_logits(cfg, params, ids)
    qp = enable_act_quant(quantize_params(params))
    assert "a8" in qp["layers"]
    got = our_prefill_logits(cfg, qp, ids)
    assert np.abs(got - ref).mean() < 0.06
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.9, agree
