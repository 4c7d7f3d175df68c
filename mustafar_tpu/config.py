"""Configuration for models, pruning policies, and the inference engine.

Replaces the reference's three-layer config system (HF dataclass CLI args in
utils/process_args.py, JSON lookup tables in config/, and fields monkey-patched
onto the HF model config in pred_long_bench.py:154-158) with explicit typed
dataclasses.  Pruning-variant selection is a config enum, not an import edit
(reference selects variants by editing pred_long_bench.py:140-150).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class PruneMethod(enum.Enum):
    """The reference's pruning-strategy matrix (reference models/ directory).

    Naming follows the reference (README.md:83-103): K/V = which cache,
    t/c = prune direction (token-wise along head_dim / channel-wise along the
    token axis), Mag/Opa = magnitude vs output-aware.  THINK/THINV are the
    structured-pruning baselines (llama_think.py / llama_thinv.py).
    """

    DENSE = "dense"                    # no pruning (baseline)
    KT_MAG_VT_MAG = "kt_mag_vt_mag"    # llama_mustafar_Kt_Mag_Vt_Mag.py
    KT_MAG_VC_MAG = "kt_mag_vc_mag"    # llama_mustafar_Kt_Mag_Vc_Mag.py
    KT_MAG_VT_OPA = "kt_mag_vt_opa"    # llama_mustafar_Kt_Mag_Vt_Opa.py
    KT_OPA_VT_MAG = "kt_opa_vt_mag"    # llama_mustafar_Kt_Opa_Vt_Mag.py
    KT_MAG_VC_OPA = "kt_mag_vc_opa"    # llama_mustafar_Kt_Mag_Vc_Opa.py
    THINK = "think"                    # llama_think.py (structured K channel prune)
    THINV = "thinv"                    # llama_thinv.py (structured K+V channel prune)

    @property
    def k_policy(self) -> str:
        return {
            PruneMethod.DENSE: "none",
            PruneMethod.KT_MAG_VT_MAG: "token_mag",
            PruneMethod.KT_MAG_VC_MAG: "token_mag",
            PruneMethod.KT_MAG_VT_OPA: "token_mag",
            PruneMethod.KT_OPA_VT_MAG: "token_opa",
            PruneMethod.KT_MAG_VC_OPA: "token_mag",
            PruneMethod.THINK: "think",
            PruneMethod.THINV: "think",
        }[self]

    @property
    def v_policy(self) -> str:
        return {
            PruneMethod.DENSE: "none",
            PruneMethod.KT_MAG_VT_MAG: "token_mag",
            PruneMethod.KT_MAG_VC_MAG: "channel_mag",
            PruneMethod.KT_MAG_VT_OPA: "token_opa",
            PruneMethod.KT_OPA_VT_MAG: "token_mag",
            PruneMethod.KT_MAG_VC_OPA: "channel_opa",
            PruneMethod.THINK: "none",
            PruneMethod.THINV: "thinv",
        }[self]


class CacheMode(enum.Enum):
    """How the pruned KV cache is physically stored.

    MASKED: full dense cache with pruned entries zeroed — the reference's
      accuracy path (models/llama_mustafar_Kt_Mag_Vt_Mag.py et al.).
    COMPRESSED: packed sparse pool + dense residual window — the reference's
      kernel path (models/llama_mustafar_kernel.py + kernel/compression.py).
    DENSE: no pruning at all.
    """

    DENSE = "dense"
    MASKED = "masked"
    COMPRESSED = "compressed"


@dataclasses.dataclass(frozen=True)
class PruneConfig:
    """Knobs the reference injects onto the HF config (pred_long_bench.py:154-158)."""

    method: PruneMethod = PruneMethod.KT_MAG_VT_MAG
    k_sparsity: float = 0.5   # fraction pruned from K (reference ModelArguments.k_sparsity)
    v_sparsity: float = 0.5   # fraction pruned from V
    group_size: int = 32      # channel-prune / Opa accumulation group (long_test.sh fixes 32)
    residual_length: int = 32 # most-recent tokens kept dense (== group_size in reference)
    exact_keep: Optional[int] = None  # override survivors/row (power-of-two keeps,
                                      # e.g. 32, enable the single-segment fast
                                      # kernel path — docs/PERFORMANCE.md)

    def kept_per_row(self, dim: int, sparsity: float) -> int:
        """Number of elements the reference's threshold rule keeps per pruned row.

        Reference (llama_mustafar_Kt_Mag_Vt_Mag.py:85-97): threshold is the
        ``int(sparsity*dim)``-th smallest |x| (torch.kthvalue) and elements
        ``>= threshold`` are kept, so exactly ``dim - int(sparsity*dim) + 1``
        survive (modulo ties).  We use exact top-k with the same count, which
        gives static shapes on TPU.  ``exact_keep`` overrides the rule.
        """
        if self.exact_keep is not None:
            return self.exact_keep
        k = max(1, int(sparsity * dim))
        return dim - k + 1 if sparsity > 0 else dim


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Llama/Mistral architecture hyperparameters (subset of HF config)."""

    name: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None   # llama-3.1 style {"factor", "low_freq_factor", ...}
    max_position_embeddings: int = 4096
    sliding_window: Optional[int] = None  # Mistral sliding-window attention
    tie_word_embeddings: bool = False
    dtype: str = "bfloat16"
    # Mixtral-style sparse MoE MLP (0 = dense MLP).  Beyond-reference: the
    # reference covers only dense models; this exists so expert parallelism
    # is a first-class sharding axis (models/moe.py, docs/SCALING.md).
    num_experts: int = 0
    num_experts_per_tok: int = 2
    expert_capacity_factor: float = 2.0

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def num_kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads


# ---------------------------------------------------------------------------
# Named architectures matching the reference's model grid (README.md:113-122).
# ---------------------------------------------------------------------------

LLAMA2_7B = ModelConfig(
    name="llama-2-7b", vocab_size=32000, hidden_size=4096, intermediate_size=11008,
    num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
    rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=4096,
)

LLAMA3_8B = ModelConfig(
    name="llama-3-8b", vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
    rms_norm_eps=1e-5, rope_theta=500000.0, max_position_embeddings=8192,
)

MISTRAL_7B = ModelConfig(
    name="mistral-7b", vocab_size=32000, hidden_size=4096, intermediate_size=14336,
    num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
    rms_norm_eps=1e-5, rope_theta=1000000.0, max_position_embeddings=32768,
    sliding_window=None,  # v0.2 removed the sliding window; v0.1 used 4096
)

MISTRAL_7B_SWA = dataclasses.replace(MISTRAL_7B, name="mistral-7b-swa", sliding_window=4096)

# Mixtral-8x7B geometry (beyond-reference MoE family; Mistral attention
# geometry + 8-expert sparse MLP, top-2 routing).
MIXTRAL_8X7B = dataclasses.replace(
    MISTRAL_7B, name="mixtral-8x7b", num_experts=8, num_experts_per_tok=2)

# Small configs for tests and single-chip benches.
TINY_LLAMA = ModelConfig(
    name="tiny-llama", vocab_size=512, hidden_size=128, intermediate_size=256,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
    rope_theta=10000.0, max_position_embeddings=1024,
)

MODEL_REGISTRY = {
    m.name: m for m in [LLAMA2_7B, LLAMA3_8B, MISTRAL_7B, MISTRAL_7B_SWA, TINY_LLAMA]
}


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """End-to-end engine settings (cache sizing, batching, sharding)."""

    model: ModelConfig = TINY_LLAMA
    prune: PruneConfig = PruneConfig()
    cache_mode: CacheMode = CacheMode.MASKED
    max_seq_len: int = 1024          # static KV capacity per sequence
    chunk_size: int = 256            # compaction chunk (reference llama_mustafar_kernel.py:324)
    prefill_bucket: int = 256        # prefill lengths padded to a multiple of this
    batch_size: int = 1
    # Chunked prefill (COMPRESSED mode): stream the prompt through the stack
    # one chunk at a time, attending to the packed past — O(B*chunk)
    # activation memory instead of O(B*T) (the single-chip long-context
    # limiter).  Prefill attention then sees the *pruned* past (the reference
    # flash prefill sees the dense prompt); the accuracy delta is measurable
    # via `cli accuracy`.
    chunked_prefill: bool = False
    # Chunk storage codec (COMPRESSED mode):
    #   "bitmap" — bitmap-packed sparse streams (ops/sparse_format.py), the
    #     TPU redesign of the reference's 64-tile format; maximum capacity
    #     (2.67x at keep=40, 3.2x at exact_keep=32); "bitmap-q8" stores
    #     the NZ payload as int8 codes + per-channel scales (4.5x at keep=40,
    #     7.8x at 0.9 sparsity — the capacity king; uniform decode only).
    #   "q8" / "q8q4" / "q4q4" — pruned chunks stored dense-zeroed and
    #     quantized (int8/int4 K + int8/int4 V, ops/quant_format.py);
    #     expansion is pure widen arithmetic, so decode runs at the
    #     no-expansion floor (measured: bitmap expansion costs 2.5-5 ms/call
    #     at 10k ctx and can never beat dense per call on the VPU —
    #     docs/PERFORMANCE.md).  q4q4 is the high-sparsity codec: 4.0x KV
    #     bytes vs dense bf16 (the int4 levels only need to span the kept
    #     top-|x| values once 0.9 sparsity has zeroed the rest).
    codec: str = "bitmap"
    # Sharding (new capability vs the single-GPU reference — SURVEY.md §2.6).
    dp_axis: str = "data"
    tp_axis: str = "model"

    def __post_init__(self):
        assert self.codec in ("bitmap", "bitmap-q8", "q8", "q8q4", "q4q4"), self.codec
        if self.cache_mode == CacheMode.COMPRESSED:
            if self.codec != "bitmap":
                assert self.chunk_size % 4 == 0, self.chunk_size
            # the fused-stream format packs 32-token bit planes and 128-wide
            # value rows (ops/sparse_format.ChunkFormat), and the pool must
            # hold at least one chunk beyond the dense residual window.
            assert self.chunk_size % 32 == 0, (
                f"chunk_size must be a multiple of 32 (got {self.chunk_size})")
            assert self.max_seq_len >= self.chunk_size + self.prune.residual_length, (
                f"max_seq_len {self.max_seq_len} leaves no room for one "
                f"compressed chunk ({self.chunk_size}) plus the residual "
                f"window ({self.prune.residual_length})")
        assert self.max_seq_len > 0 and self.prefill_bucket > 0
        if self.chunked_prefill:
            assert self.cache_mode == CacheMode.COMPRESSED, (
                "chunked_prefill requires the compressed cache")
            assert self.prefill_bucket % self.chunk_size == 0, (
                f"chunked prefill segments are chunk-sized: prefill_bucket "
                f"{self.prefill_bucket} must be a multiple of chunk_size "
                f"{self.chunk_size}")
