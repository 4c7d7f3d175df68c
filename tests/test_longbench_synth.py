"""Schema and metric-dispatch checks for the synthetic LongBench rows."""

import numpy as np
import pytest

from mustafar_tpu.harness import configs
from mustafar_tpu.harness.longbench import scorer
from mustafar_tpu.harness.longbench_synth import make_task_rows
from mustafar_tpu.harness.metrics import DATASET2METRIC

CORPUS = ("def parse(tokens):\n    return [t.strip() for t in tokens]\n" * 200)


@pytest.mark.parametrize("task", sorted(configs.DATASET2PROMPT))
def test_rows_schema_and_template(task):
    rng = np.random.RandomState(0)
    rows = make_task_rows(CORPUS, rng, task, 2, ctx_bytes=600)
    assert len(rows) == 2
    fmt = configs.DATASET2PROMPT[task]
    for row in rows:
        for key in ("context", "input", "answers", "all_classes", "length"):
            assert key in row, (task, key)
        assert row["answers"] and all(isinstance(a, str)
                                      for a in row["answers"])
        prompt = fmt.format(context=row["context"], input=row["input"])
        assert len(prompt) > 20
        # scoring the ground truth itself must dispatch without error and
        # give a positive score (oracle sanity for every metric path)
        s = scorer(task, [row["answers"][0]], [row["answers"]],
                   row["all_classes"])
        assert s > 0, (task, s)


def test_scorer_rejects_empty_ground_truth():
    with pytest.raises(ValueError):
        scorer("narrativeqa", ["x"], [[]], None)


def test_oracle_scores_are_full_marks_where_exactness_applies():
    """EM-style metrics must give 100 to the oracle prediction."""
    rng = np.random.RandomState(1)
    for task in ("trec", "lsht", "passage_retrieval_en",
                 "passage_retrieval_zh", "passkey"):
        rows = make_task_rows(CORPUS, rng, task, 2, ctx_bytes=600)
        s = scorer(task, [r["answers"][0] for r in rows],
                   [r["answers"] for r in rows], rows[0]["all_classes"])
        assert s == 100.0, (task, s)
