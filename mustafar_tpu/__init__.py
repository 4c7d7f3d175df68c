"""mustafar_tpu — a TPU-native sparse-KV-cache LLM inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Mustafar reference (dhjoo98/mustafar: unstructured KV-cache pruning for
LLM inference — arXiv 2505.22913), redesigned TPU-first:

- Pruning policy library: per-token / per-channel, magnitude / output-aware
  (reference: models/llama_mustafar_*.py pruning methods).
- Static-shape compressed sparse KV-cache resident in HBM
  (reference: kernel/compression.py bitmap format, redesigned for XLA
  static shapes: exact top-k packing, no dynamic NZ counts).
- Sparse decode attention as Pallas TPU kernels fused with online softmax
  (reference: kernel/csrc/SpMM_Kernel.cuh CUDA SpMV, redesigned
  Load-as-Sparse/Compute-as-Dense for the 128x128 MXU).
- Llama-2/3 (GQA) and Mistral (sliding window) model families, pure
  functional JAX with scan-over-layers.
- Tensor/data-parallel sharding over a `jax.sharding.Mesh` (new capability;
  the reference is single-GPU).
- LongBench accuracy harness and latency/memory benchmarks
  (reference: pred_long_bench.py / eval_long_bench.py / mem_spd_test.py).
"""

__version__ = "0.1.0"

from mustafar_tpu.config import (  # noqa: F401
    CacheMode,
    EngineConfig,
    ModelConfig,
    PruneMethod,
    PruneConfig,
)
