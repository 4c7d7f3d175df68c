"""Tests for the tiny-LM accuracy-evidence harness (harness/tinylm.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mustafar_tpu.harness import tinylm


def test_byte_tokenizer_roundtrip():
    tok = tinylm.ByteTokenizer()
    s = "The pass key is 48213."
    ids = tok.encode(s)
    assert tok.decode(ids) == s
    enc = tok(s, return_tensors="np")
    assert enc.input_ids.shape == (1, len(s))
    assert tok.eos_token_id == tinylm.EOS_ID


def test_passkey_row_and_score():
    corpus = tinylm.load_corpus(max_bytes=200_000)
    rng = np.random.RandomState(0)
    row = tinylm.make_passkey_row(corpus, rng, 400)
    key = row["answers"][0]
    assert key in row["context"] and len(key) == 5
    assert abs(len(row["context"]) - 400) < 8
    assert tinylm.passkey_score(f" {key} and more", key) == 1.0
    assert tinylm.passkey_score(" 00000", key) == (key == "00000")
    assert tinylm.passkey_score("no digits here", key) == 0.0


def test_training_batch_alignment():
    corpus = tinylm.load_corpus(max_bytes=200_000)
    rng = np.random.RandomState(1)
    toks, wts = tinylm.make_training_batch(corpus, rng, 4, 512,
                                           passkey_frac=1.0)
    assert toks.shape == wts.shape == (4, 512)
    assert (wts > 1).any(), "answer spans must be upweighted"
    # upweighted span should cover digits or EOS
    for b in range(4):
        hi = np.where(wts[b] > 1)[0]
        vals = toks[b, hi]
        assert ((vals == tinylm.EOS_ID) | ((vals >= 48) & (vals <= 57))
                | (vals == 32)).all()


def test_train_and_score_roundtrip(tmp_path):
    out = str(tmp_path / "ck")
    res = tinylm.train(out, steps=2, batch=1, seq=256, inner=2,
                       log=lambda *a: None)
    assert res["steps"] == 2
    cfg, params = tinylm.load_ckpt(out)
    assert cfg.name == "tiny-acc"
    assert params["layers"]["wq"].shape == (cfg.num_layers, cfg.hidden_size,
                                            cfg.q_dim)
    toks = np.random.RandomState(0).randint(0, 255, (1, 384), np.int32)
    eng = tinylm._engine(cfg, "dense", 0.0, 512)
    nll, lg = tinylm.score_nll(eng, params, toks, prefill_len=256)
    assert lg.shape == (1, 128, cfg.vocab_size)
    assert np.isfinite(nll)
    eng2 = tinylm._engine(cfg, "masked", 0.5, 512)
    nll2, lg2 = tinylm.score_nll(eng2, params, toks, prefill_len=256)
    kl = tinylm.kl_vs(lg, lg2)
    assert np.isfinite(nll2) and kl >= 0
