"""Drive ALL LongBench tasks end-to-end through the production engine.

VERDICT r3 item 5: every one of the 21 LongBench prompt templates plus the
local passkey probe, through the real predict -> jsonl -> scorer pipeline
(reference flow pred_long_bench.py:193-232 / eval_long_bench.py:78-109) on
the trained tiny model with the production compressed-q8q4 engine.

Exercises: all 22 templates, middle-out truncation, the samsum newline-EOS
special case, zh byte-level tokenization, every metric dispatch path
(qa-F1/rouge/rouge-zh/classification/count/retrieval/retrieval-zh/code-sim),
and scorer_e length bucketing.  Scores are coverage evidence, not quality
(the byte-LM is tiny); the passkey and retrieval-style tasks are the ones a
trained tiny model can actually do.

Run: python benchmarks/run_longbench_all.py [--out pred/all21_r04] [--rows 2]
"""

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpt/tiny-acc")
    ap.add_argument("--out", default="pred/all21_r04")
    ap.add_argument("--rows", type=int, default=2)
    ap.add_argument("--ctx", type=int, default=1000)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # tiny model; CPU avoids
    # per-prompt-bucket remote TPU compiles (20-300 s each through the tunnel)
    import jax.numpy as jnp
    import numpy as np

    from mustafar_tpu.harness import configs
    from mustafar_tpu.harness.longbench import (PredictConfig, evaluate_dir,
                                                predict_dataset, scorer_e)
    from mustafar_tpu.harness.longbench_synth import make_task_rows
    from mustafar_tpu.harness.tinylm import (ByteTokenizer, EOS_ID, _engine,
                                             load_corpus, load_ckpt)
    from mustafar_tpu.runtime.generate import Generator

    cfg, params = load_ckpt(args.ckpt)
    corpus = load_corpus(seed=77)
    rng = np.random.RandomState(77)
    tok = ByteTokenizer()

    max_seq = 2304
    eng = _engine(cfg, "compressed-q8q4", 0.7, max_seq)
    gen = Generator(eng, params, dtype=jnp.float32)
    pc = PredictConfig(model_name=cfg.name, max_length=1600, out_dir=args.out)

    tasks = sorted(configs.DATASET2PROMPT)
    t_all = time.perf_counter()
    for task in tasks:
        rows = make_task_rows(corpus, rng, task, args.rows, args.ctx)
        t0 = time.perf_counter()
        predict_dataset(gen, tok, task, rows, pc, eos_id=EOS_ID,
                        progress=False)
        print(f"{task}: {args.rows} rows in {time.perf_counter() - t0:.1f}s",
              flush=True)

    scores = evaluate_dir(args.out)
    assert len(scores) == len(tasks) == 22, (len(scores), len(tasks))

    # scorer_e path (LongBench-E length bucketing) on one task's records
    with open(os.path.join(args.out, "passkey.jsonl"), encoding="utf-8") as f:
        recs = [json.loads(l) for l in f]
    e_scores = scorer_e("passkey", [r["pred"] for r in recs],
                        [r["answers"] for r in recs],
                        [r["length"] for r in recs], None)
    with open(os.path.join(args.out, "result_e_sample.json"), "w") as f:
        json.dump({"passkey": e_scores}, f, indent=2)

    print(json.dumps({"metric": "longbench_all_tasks",
                      "tasks": len(scores),
                      "wall_s": round(time.perf_counter() - t_all, 1),
                      "engine": "compressed-q8q4@0.7",
                      "scores": scores}))


if __name__ == "__main__":
    main()
