"""CLI tests: engine construction from flags and the eval subcommand."""

import argparse
import json

from mustafar_tpu import cli
from mustafar_tpu.config import CacheMode, PruneMethod, TINY_LLAMA


def _args(**kw):
    ns = argparse.Namespace(mode="kt_mag_vt_mag", cache=None, k_sparsity=0.7,
                            v_sparsity=0.7, group_size=32, residual_length=32,
                            max_seq_len=4608, dtype="bfloat16")
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_build_engine_mode_mapping():
    eng = cli._build_engine(_args(), TINY_LLAMA)
    assert eng.cache_mode == CacheMode.COMPRESSED
    assert eng.prune.method == PruneMethod.KT_MAG_VT_MAG
    assert eng.prune.k_sparsity == 0.7

    eng = cli._build_engine(_args(mode="kt_mag_vc_mag"), TINY_LLAMA)
    assert eng.cache_mode == CacheMode.MASKED     # channel policy -> masked

    eng = cli._build_engine(_args(mode="dense"), TINY_LLAMA)
    assert eng.cache_mode == CacheMode.DENSE

    eng = cli._build_engine(_args(cache="masked"), TINY_LLAMA)
    assert eng.cache_mode == CacheMode.MASKED     # explicit override


def test_eval_subcommand(tmp_path, capsys):
    recs = [{"pred": "the answer is 5", "answers": ["5"], "all_classes": None,
             "length": 1000}]
    with open(tmp_path / "passage_count.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    cli.main(["eval", "--pred_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert json.loads(out)["passage_count"] == 100.0
    assert json.load(open(tmp_path / "result.json"))["passage_count"] == 100.0
