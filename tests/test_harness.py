"""Harness tests: metric functions vs known values, scorer flow, end-to-end
predict->score on a synthetic task with a tiny model (the reference has no
tests; scores here act as the regression baseline)."""

import json

import numpy as np
import pytest

from mustafar_tpu.harness import metrics as M
from mustafar_tpu.harness import longbench as LB


def test_qa_f1():
    assert M.qa_f1_score("the cat sat", "cat sat") == 1.0
    assert M.qa_f1_score("a dog", "the cat") == 0.0
    # partial overlap: pred tokens {cat}, gt {cat, mat}: p=1, r=0.5 -> 2/3
    assert abs(M.qa_f1_score("cat", "cat mat") - 2 / 3) < 1e-9


def test_normalize_answer():
    assert M.normalize_answer("The  Cat, sat!") == "cat sat"
    assert M.normalize_answer("An apple") == "apple"


def test_count_score():
    assert M.count_score("there are 5 paragraphs", "5") == 1.0
    assert M.count_score("3 or 5", "5") == 0.5
    assert M.count_score("none", "5") == 0.0


def test_retrieval_score():
    assert M.retrieval_score("Paragraph 7", "Paragraph 7") == 1.0
    assert M.retrieval_score("it is 7 or 8", "Paragraph 7") == 0.5
    assert M.retrieval_zh_score("段落3", "段落3") == 1.0


def test_classification_score():
    # unique exact match
    assert M.classification_score("this is Sports news", "Sports",
                                  all_classes=["Sports", "Politics"]) == 1.0
    # two matches -> 1/2
    assert M.classification_score("Sports and Politics", "Sports",
                                  all_classes=["Sports", "Politics"]) == 0.5
    # submatch removal: "Sport" in gt "Sports" and != gt -> removed
    assert M.classification_score("Sport Sports", "Sports",
                                  all_classes=["Sport", "Sports"]) == 1.0
    assert M.classification_score("Weather", "Sports",
                                  all_classes=["Sports", "Politics"]) == 0.0


def test_rouge_l():
    assert M.rouge_score("the cat sat on the mat", "the cat sat on the mat") == pytest.approx(1.0, abs=1e-6)
    assert M.rouge_score("completely different words here", "nothing in common") == 0.0


def test_code_sim():
    assert M.code_sim_score("return x + 1", "return x + 1") == 1.0
    assert M.code_sim_score("# comment\nreturn x", "return x") == 1.0


def test_scorer_best_over_ground_truths():
    s = LB.scorer("narrativeqa", ["the red house"],
                  [["blue car", "red house"]], None)
    assert s == 100.0


def test_scorer_firstline_datasets():
    # trec predictions are cut at the first line
    s = LB.scorer("trec", ["Sports\ngarbage Politics"],
                  [["Sports"]], ["Sports", "Politics"])
    assert s == 100.0


def test_scorer_e_buckets():
    out = LB.scorer_e("narrativeqa", ["cat", "dog", "bird"],
                      [["cat"], ["dog"], ["fish"]], [1000, 5000, 9000], None)
    assert out == {"0-4k": 100.0, "4-8k": 100.0, "8k+": 0.0}


def test_evaluate_dir(tmp_path):
    recs = [{"pred": "Paragraph 3", "answers": ["Paragraph 3"],
             "all_classes": None, "length": 5000}]
    with open(tmp_path / "passage_retrieval_en.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    scores = LB.evaluate_dir(str(tmp_path))
    assert scores == {"passage_retrieval_en": 100.0}
    assert json.load(open(tmp_path / "result.json")) == scores


def test_truncate_middle_uses_both_ends():
    class FakeTok:
        def __call__(self, text, truncation=False, return_tensors=None):
            class R: pass
            r = R(); r.input_ids = np.array([[ord(c) for c in text]])
            return r
        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(i) for i in ids)

    tok = FakeTok()
    long = "A" * 50 + "B" * 50
    out = LB.truncate_middle(tok, long, 20)
    assert out == "A" * 10 + "B" * 10
    assert LB.truncate_middle(tok, "short", 20) == "short"


def test_predict_dataset_end_to_end(tmp_path):
    """Tiny model + fake tokenizer: the full predict->jsonl->score loop."""
    import jax
    import jax.numpy as jnp
    from mustafar_tpu.config import (CacheMode, EngineConfig, PruneConfig,
                                     PruneMethod, TINY_LLAMA)
    from mustafar_tpu.models.llama import init_params
    from mustafar_tpu.runtime.generate import Generator

    class ByteTok:
        eos_token_id = 1
        def __call__(self, text, truncation=False, return_tensors=None):
            class R: pass
            r = R(); r.input_ids = np.array([[2 + (ord(c) % 500) for c in text[:80]]])
            return r
        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in np.atleast_1d(ids))

    params = init_params(TINY_LLAMA, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = EngineConfig(model=TINY_LLAMA,
                       cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.5, v_sparsity=0.5),
                       max_seq_len=512, prefill_bucket=128)
    gen = Generator(eng, params, dtype=jnp.float32)
    rows = [{"context": "some ctx", "input": "a question?",
             "answers": ["42"], "all_classes": None, "length": 100}]
    cfg = LB.PredictConfig(model_name="tiny", max_length=100,
                           out_dir=str(tmp_path))
    # use a small-max-gen dataset to keep the test fast
    preds = LB.predict_dataset(gen, ByteTok(), "passage_count", rows, cfg,
                               progress=False)
    assert len(preds) == 1 and isinstance(preds[0]["pred"], str)
    scores = LB.evaluate_dir(str(tmp_path))
    assert "passage_count" in scores
