"""Command-line interface.

Replaces the reference's entry scripts (long_test.sh positional args ->
pred_long_bench.py HfArgumentParser, eval_long_bench.py, mem_spd_test.py
edit-the-source constants) with subcommands:

  python -m mustafar_tpu predict --model <hf_dir> --mode kt_mag_vt_mag \
      --k_sparsity 0.7 --v_sparsity 0.7 --datasets qasper narrativeqa
  python -m mustafar_tpu eval --pred_dir pred/<run>
  python -m mustafar_tpu bench [--batch 32 --prompt 300 --gen 600]

Pruning variant selection is a flag (the reference requires editing an import,
pred_long_bench.py:140-150).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_engine_args(p: argparse.ArgumentParser):
    p.add_argument("--mode", default="kt_mag_vt_mag",
                   help="pruning variant (PruneMethod value) or 'dense'")
    p.add_argument("--cache", default=None,
                   choices=[None, "dense", "masked", "compressed"],
                   help="cache mode (default: compressed for kt_*_vt_* mag, else masked)")
    p.add_argument("--k_sparsity", type=float, default=0.5)
    p.add_argument("--v_sparsity", type=float, default=0.5)
    p.add_argument("--group_size", type=int, default=32)
    p.add_argument("--residual_length", type=int, default=32)
    p.add_argument("--max_seq_len", type=int, default=4608)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--chunked_prefill", action="store_true",
                   help="stream the prompt chunk-by-chunk through the "
                        "compressed cache (O(chunk) activation memory; "
                        "prefill attends to the pruned past)")
    p.add_argument("--codec", default="bitmap",
                   choices=["bitmap", "bitmap-q8", "q8", "q8q4", "q4q4"],
                   help="compressed-chunk codec: bitmap-packed sparse "
                        "(capacity-optimal) or quantized-dense "
                        "(latency-optimal; q8q4 matches bitmap compression, "
                        "q4q4 = 4x bytes for high sparsity)")
    p.add_argument("--weights", default="bf16",
                   choices=["bf16", "int8", "int8-a8", "int4"],
                   help="weight quantization (models/quant.py).  int8/int4 "
                        "load + quantize ON HOST and transfer only the "
                        "quantized pytree — the path that fits a full "
                        "Llama-3-8B checkpoint onto one 16 GiB chip.  "
                        "int8-a8 = int8 weights + dynamic int8 activations "
                        "(native MXU int8 dots; latency-equal to int8 at "
                        "the decode shape, see docs/PERFORMANCE.md r5)")
    p.add_argument("--fuse_proj", action="store_true",
                   help="fuse qkv and gate+up projections (single-chip "
                        "serving layout; quant.fuse_projections)")


def _build_engine(args, model_cfg):
    from mustafar_tpu.config import CacheMode, EngineConfig, PruneConfig, PruneMethod

    method = PruneMethod(args.mode)
    if args.cache is not None:
        cache_mode = CacheMode(args.cache)
    elif method == PruneMethod.DENSE:
        cache_mode = CacheMode.DENSE
    elif method.k_policy == "token_mag" and method.v_policy == "token_mag":
        cache_mode = CacheMode.COMPRESSED
    else:
        cache_mode = CacheMode.MASKED
    prune = PruneConfig(method=method, k_sparsity=args.k_sparsity,
                        v_sparsity=args.v_sparsity, group_size=args.group_size,
                        residual_length=args.residual_length)
    return EngineConfig(model=model_cfg, prune=prune, cache_mode=cache_mode,
                        max_seq_len=args.max_seq_len,
                        chunked_prefill=getattr(args, "chunked_prefill", False),
                        codec=getattr(args, "codec", "bitmap"))


def cmd_predict(args):
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from mustafar_tpu.harness import configs
    from mustafar_tpu.harness.longbench import (PredictConfig, load_longbench_rows,
                                                predict_dataset)
    from mustafar_tpu.models.weights import load_hf_dir
    from mustafar_tpu.runtime.generate import Generator

    weights = getattr(args, "weights", "bf16")
    if weights in ("int8", "int8-a8", "int4"):
        # stage bf16 on HOST, quantize there, ship only the quantized pytree
        # (a full 8B in bf16 does not fit the device next to its cache)
        import jax
        from mustafar_tpu.models.quant import (enable_act_quant,
                                               quantize_params,
                                               quantize_params_w4)
        cfg, params = load_hf_dir(args.model, dtype=jnp.bfloat16, on_host=True)
        with jax.default_device(jax.devices("cpu")[0]):
            params = jax.block_until_ready(
                quantize_params_w4(params, donate=True) if weights == "int4"
                else quantize_params(params, donate=True))
        params = jax.device_put(params, jax.devices()[0])
        if weights == "int8-a8":
            params = enable_act_quant(params)
    else:
        cfg, params = load_hf_dir(args.model, dtype=jnp.bfloat16)
    if getattr(args, "fuse_proj", False):
        from mustafar_tpu.models.quant import fuse_projections
        params = fuse_projections(params)
    tokenizer = AutoTokenizer.from_pretrained(args.model)
    eng = _build_engine(args, cfg)
    gen = Generator(eng, params)

    model_name = os.path.basename(args.model.rstrip("/"))
    max_length = args.max_length or configs.model_max_len(model_name)
    run = f"{model_name}_{max_length}_K_{args.k_sparsity}_V_{args.v_sparsity}"
    out_dir = os.path.join(args.out_root, run)
    pc = PredictConfig(model_name=model_name, max_length=max_length,
                       out_dir=out_dir)
    datasets = args.datasets or configs.DATASETS_EN
    for ds in datasets:
        rows = load_longbench_rows(ds, data_dir=args.data_dir, e_split=args.e)
        if args.limit:
            rows = rows[: args.limit]
        predict_dataset(gen, tokenizer, ds, rows, pc,
                        eos_id=tokenizer.eos_token_id)
    print(f"predictions written to {out_dir}")


def cmd_eval(args):
    from mustafar_tpu.harness.longbench import evaluate_dir

    scores = evaluate_dir(args.pred_dir, e_buckets=args.e)
    print(json.dumps(scores, indent=2, ensure_ascii=False))


def cmd_bench(args):
    import bench  # repo-root bench.py
    bench.main(batch=args.batch, prompt_len=args.prompt, gen_tokens=args.gen)


def cmd_train_tiny(args):
    from mustafar_tpu.harness import tinylm
    tinylm.train(args.out, steps=args.steps, batch=args.batch, seq=args.seq,
                 lr=args.lr, seed=args.seed, hidden=args.hidden,
                 layers=args.layers, window=args.window,
                 rope_theta=args.rope_theta)
    print(f"checkpoint written to {args.out}")


def cmd_synth_ckpt(args):
    from mustafar_tpu.harness.synth_ckpt import write_checkpoint
    write_checkpoint(args.out, small=args.small, seed=args.seed,
                     shard_gib=args.shard_gib, rows=args.rows,
                     ctx_bytes=args.ctx)
    print(f"synthetic checkpoint written to {args.out}")


def cmd_accuracy(args):
    from mustafar_tpu.harness import tinylm
    res = tinylm.run_accuracy(
        args.ckpt, args.out, n_rows=args.rows, ctx_bytes=args.ctx,
        sparsities=tuple(args.sparsities), modes=tuple(args.modes),
        depths=tuple(args.depths) if args.depths else None)
    print(json.dumps(res, indent=2))


def main(argv=None):
    # The axon TPU plugin ignores JAX_PLATFORMS=cpu; MUSTAFAR_CPU=1 forces
    # CPU for accuracy grids / predict runs so they never contend with a
    # benchmark that owns the single chip.
    import os
    if os.environ.get("MUSTAFAR_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    parser = argparse.ArgumentParser(prog="mustafar_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("predict", help="LongBench prediction run")
    p.add_argument("--model", required=True, help="local HF checkpoint dir")
    p.add_argument("--datasets", nargs="*", default=None)
    p.add_argument("--data_dir", default=None, help="dir of <task>.jsonl files")
    p.add_argument("--out_root", default="pred")
    p.add_argument("--max_length", type=int, default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--e", action="store_true", help="LongBench-E split")
    _add_engine_args(p)
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("eval", help="score a prediction directory")
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--e", action="store_true")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("bench", help="decode latency/memory benchmark")
    p.add_argument("--batch", type=int, default=None,
                   help="batch size (default: reference shape, 32 on TPU)")
    p.add_argument("--prompt", type=int, default=None,
                   help="prompt tokens (default 300 on TPU)")
    p.add_argument("--gen", type=int, default=None,
                   help="generated tokens (default 600 on TPU)")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("train-tiny",
                       help="train the tiny accuracy-evidence model")
    p.add_argument("--out", default="ckpt/tiny-acc")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hidden", type=int, default=None)
    p.add_argument("--layers", type=int, default=None)
    p.add_argument("--rope_theta", type=float, default=None)
    p.add_argument("--window", type=int, default=None,
                   help="sliding-window attention (Mistral semantics)")
    p.set_defaults(fn=cmd_train_tiny)

    p = sub.add_parser("synth-ckpt",
                       help="write a synthetic full-layout HF checkpoint "
                            "(sharded bf16 safetensors + tokenizer) to prove "
                            "the real-checkpoint predict path")
    p.add_argument("--out", required=True)
    p.add_argument("--small", action="store_true",
                   help="small geometry (tests); default is the full "
                        "Llama-3.1-8B layout (~15 GiB on disk)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shard_gib", type=float, default=4.0)
    p.add_argument("--rows", type=int, default=0,
                   help="also write N passkey rows to <out>/rows/")
    p.add_argument("--ctx", type=int, default=4000,
                   help="passkey row context bytes")
    p.set_defaults(fn=cmd_synth_ckpt)

    p = sub.add_parser("accuracy",
                       help="dense-vs-pruned accuracy grid on a checkpoint")
    p.add_argument("--ckpt", default="ckpt/tiny-acc")
    p.add_argument("--out", default="accuracy")
    p.add_argument("--rows", type=int, default=40)
    p.add_argument("--ctx", type=int, default=1600)
    p.add_argument("--sparsities", nargs="*", type=float, default=[0.5, 0.7])
    p.add_argument("--modes", nargs="*", default=["masked", "compressed"])
    p.add_argument("--depths", nargs="*", type=float, default=None,
                   help="fixed needle depths (adds per-depth accuracy)")
    p.set_defaults(fn=cmd_accuracy)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
