"""Real-checkpoint path: synthetic HF dir -> weights.py -> CLI predict -> eval.

Exercises the exact command path a real-checkpoint user runs
(reference pred_long_bench.py:159-166 / eval_long_bench.py) against a
synthetic checkpoint with the real on-disk layout: sharded bf16 safetensors
+ index json, llama3 rope_scaling config, trained fast tokenizer.  The full
Llama-3.1-8B-sized variant of the same generator is proven separately
(docs/PARITY.md, ~15 GiB artifact); the test uses the small geometry.
"""

import glob
import json
import os

import numpy as np
import pytest

from mustafar_tpu import cli


def test_synth_ckpt_predict_eval(tmp_path):
    out = str(tmp_path / "ckpt")
    pred_root = str(tmp_path / "pred")
    cli.main(["synth-ckpt", "--out", out, "--small", "--rows", "3",
              "--ctx", "1200"])
    # real-layout artifacts
    shards = sorted(glob.glob(os.path.join(out, "model-*.safetensors")))
    assert shards, os.listdir(out)
    idx = json.load(open(os.path.join(out, "model.safetensors.index.json")))
    assert set(idx["weight_map"].values()) == {os.path.basename(s)
                                               for s in shards}
    cfg = json.load(open(os.path.join(out, "config.json")))
    assert cfg["rope_scaling"]["rope_type"] == "llama3"
    assert os.path.exists(os.path.join(out, "tokenizer.json"))

    # the exact user flow: predict (q8q4 compressed engine) then eval
    cli.main(["predict", "--model", out, "--datasets", "passkey",
              "--data_dir", os.path.join(out, "rows"),
              "--mode", "kt_mag_vt_mag", "--codec", "q8q4",
              "--k_sparsity", "0.7", "--v_sparsity", "0.7",
              "--max_length", "1024", "--max_seq_len", "1536",
              "--limit", "2", "--out_root", pred_root])
    run = glob.glob(os.path.join(pred_root, "*"))[0]
    preds = [json.loads(l) for l in open(os.path.join(run, "passkey.jsonl"))]
    assert len(preds) == 2 and all("pred" in p for p in preds)
    cli.main(["eval", "--pred_dir", run])
    scores = json.load(open(os.path.join(run, "result.json")))
    assert "passkey" in scores            # random weights: score is chance


def test_synth_ckpt_predict_int8a8_fused(tmp_path):
    """The int8-a8 + fused-projection serving flags drive the same predict
    path (host-staged quantization -> enable_act_quant -> fuse_projections)."""
    out = str(tmp_path / "ckpt")
    pred_root = str(tmp_path / "pred")
    cli.main(["synth-ckpt", "--out", out, "--small", "--rows", "2",
              "--ctx", "600"])
    cli.main(["predict", "--model", out, "--datasets", "passkey",
              "--data_dir", os.path.join(out, "rows"),
              "--mode", "kt_mag_vt_mag", "--codec", "q8q4",
              "--weights", "int8-a8", "--fuse_proj",
              "--k_sparsity", "0.7", "--v_sparsity", "0.7",
              "--max_length", "512", "--max_seq_len", "1024",
              "--limit", "1", "--out_root", pred_root])
    run = glob.glob(os.path.join(pred_root, "*"))[0]
    preds = [json.loads(l) for l in open(os.path.join(run, "passkey.jsonl"))]
    assert len(preds) == 1 and preds[0]["pred"]
