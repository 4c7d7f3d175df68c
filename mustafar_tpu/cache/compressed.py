"""Compressed sparse KV cache: packed split-pools + dense residual window.

TPU redesign of the reference's compressed-cache engine
(models/llama_mustafar_kernel.py — SURVEY.md §2.5).  The reference keeps, per
layer, a python list of per-head packed tensors that are re-concatenated and
re-offset every 256 generated tokens (:324-398, with host syncs).  Here the
state is a fixed set of static-shape arrays threaded through the jitted step
(layouts derived in ops/sparse_format.py):

  kv_pool [max_chunks, B, Hkv, ROWS, 128] int16 — fused-stream rows for K and
  V (values + bitmap planes, sparse_format.encode_stream), chunk-major so the
  decode kernel fetches one whole chunk for a head group with a single DMA
  (ops/kernels/sparse_attention.py v4).  Batch and kv-head are separate axes
  so a dp x tp mesh shards them independently (P(.., "data", "model", ..));
  the kernels see the b-major flattened [max_chunks, B*Hkv, ROWS, 128] view
  (a free reshape, taken per shard inside shard_map when a mesh is set)
  k_win / v_win [B, Hkv, Wcap, D]         bf16     dense window, Wcap = r + C
                                                   (head-major so the kernel
                                                   [BH, W, D] view is a free
                                                   reshape, not a transpose)
  n_chunks      int32                              active chunks (uniform)

Decode and chunked-prefill segments use the STACKED protocol
(models/llama.forward): the big buffers are never sliced per layer — the
Pallas kernels DMA directly from the full [L, ...] state at a
scalar-prefetched layer index, and the per-step window write is a one-token
dynamic_update_slice on the scan-carried stacked buffer.  (A per-layer
dynamic-slice feeding a pallas_call cannot fuse — XLA materializes the
whole slice in HBM: measured 0.157 ms/layer for the pool and ~0.24 ms/layer
for the windows at the bench shape, ~60% of the non-matmul step cost.)

Semantics (matching llama_mustafar_kernel.py):
  * prefill: flash attention over dense K/V; then the first
    ``((T - r) // C) * C`` tokens are pruned+packed chunk-by-chunk (:405-443),
    the remainder becomes the dense window.
  * decode: logits = sparse kernel over pools ++ dense matmul over window
    (:272-279); fp32 softmax (:304); output = sparse combine + window matmul
    (:312-317).  When the window reaches r + C valid tokens the oldest C are
    pruned+packed and appended to the pools, and the window shifts (:324-398).

Only per-token (Kt/Vt) policies are supported in compressed mode — the
reference's kernel engine likewise implements Kt_Mag+Vt_Mag only
(llama_mustafar_kernel.py:77-153).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mustafar_tpu.config import EngineConfig
from mustafar_tpu.ops import sparse_format as sf
from mustafar_tpu.ops.attention import causal_mask, mha, prefill_attention, NEG_INF


class CompressedKVCache:
    def __init__(self, engine: EngineConfig, use_pallas: bool | None = None):
        self.engine = engine
        self.model = engine.model
        p = engine.prune
        self.p = p
        assert p.method.k_policy in ("token_mag", "token_opa"), (
            "compressed cache supports per-token K policies (reference kernel "
            f"engine scope); got {p.method}")
        assert p.method.v_policy in ("token_mag", "token_opa"), p.method
        # Output-aware (Opa) policies in compressed mode — BEYOND the
        # reference's kernel-engine scope (Mag-only,
        # llama_mustafar_kernel.py:77-153).  Scores accumulate per window
        # column (fp32 buffers aligned with k_win/v_win); at compaction the
        # oldest C tokens pack with a top-k-by-score keep mask instead of
        # top-|x|.  Post-softmax weights come from the decode kernels' final
        # online-softmax stats (m, l), never a full weight matrix.
        self.k_opa = p.method.k_policy == "token_opa"
        self.v_opa = p.method.v_policy == "token_opa"
        self.score_keys = (("k_score",) if self.k_opa else ()) + \
            (("v_score",) if self.v_opa else ())
        m = self.model
        assert m.head_dim == 128, (
            "the fused-stream compressed format packs bitmap planes as 128-wide "
            f"rows; head_dim must be 128 (got {m.head_dim}).  All reference "
            "models (Llama-2/3, Mistral) use 128; use MASKED mode otherwise.")
        C = engine.chunk_size
        self.C = C
        self.r = p.residual_length
        self.wcap = self.r + C
        self.max_chunks = max(1, (engine.max_seq_len - self.r) // C)
        self.k_keep = p.kept_per_row(m.head_dim, p.k_sparsity)
        self.v_keep = p.kept_per_row(m.head_dim, p.v_sparsity)
        # chunk storage codec: bitmap-packed sparse streams (capacity-optimal;
        # "bitmap-q8" = int8 NZ payload + per-channel scales, ~1.7x the bf16
        # stream's capacity) or quantized-dense (latency-optimal) — see
        # ops/quant_format.py and ops/sparse_format.py
        self.bitmap_q8 = engine.codec == "bitmap-q8"
        if engine.codec in ("bitmap", "bitmap-q8"):
            self.qcodec = None
            qb = 8 if self.bitmap_q8 else 16
            self.kfmt = sf.ChunkFormat(C, m.head_dim, self.k_keep, qbits=qb)
            self.vfmt = sf.ChunkFormat(C, m.head_dim, self.v_keep, qbits=qb)
        else:
            from mustafar_tpu.ops import quant_format as qf
            kbits, vbits = {"q8": (8, 8), "q8q4": (8, 4),
                            "q4q4": (4, 4)}[engine.codec]
            self.qcodec = qf.QuantCodec(C, m.head_dim, kbits, vbits)
            self.kfmt = self.vfmt = None
        self.window = m.sliding_window
        if self.window is not None:
            assert self.window >= self.wcap, (
                f"sliding window ({self.window}) must cover the dense residual "
                f"window capacity ({self.wcap})")
        # pallas decode kernels on TPU; interpret/XLA path elsewhere
        self.use_pallas = (jax.default_backend() == "tpu") if use_pallas is None else use_pallas
        # set by the runtime/tests to run the kernel head-local on a device
        # mesh (parallel.sharding.shard_headlocal_attend); None = single-device
        self.mesh = None
        # STACKED protocol (models/llama.forward): ro keys are read whole by
        # attend at a layer index (decode never writes the pools — compaction
        # is a separate jitted path; a segment's single-chunk pack is staged
        # and applied post-scan by finalize_segment, keeping a second full
        # pool from materializing — 5.58 GiB at 32k ctx, OOM vs serving);
        # rw keys (the windows) are carried whole and updated in place.
        pools = (("kv_pool",) if self.qcodec is None and not self.bitmap_q8
                 else ("kv_pool", "kv_scales"))
        self.decode_stacked_ro = pools
        self.decode_stacked_rw = ("k_win", "v_win") + self.score_keys
        self.segment_stacked_ro = pools
        self.segment_stacked_rw = ("k_win", "v_win") + self.score_keys
        # compact()/compact_slots() still scan per layer; pools stay out
        self.segment_invariant_keys = pools

    # -- state ------------------------------------------------------------
    def init(self, batch: int, dtype=jnp.bfloat16) -> dict:
        m = self.model
        mc = self.max_chunks
        rows = (self.qcodec.stream_rows if self.qcodec is not None
                else self.kfmt.stream_rows + self.vfmt.stream_rows)
        state = {
            "k_win": jnp.zeros((m.num_layers, batch, m.num_kv_heads, self.wcap, m.head_dim), dtype),
            "v_win": jnp.zeros((m.num_layers, batch, m.num_kv_heads, self.wcap, m.head_dim), dtype),
            "n_chunks": jnp.zeros((m.num_layers, batch), jnp.int32),
            "kv_pool": jnp.zeros((m.num_layers, mc, batch, m.num_kv_heads,
                                  rows, 128), jnp.int16),
        }
        if self.qcodec is not None or self.bitmap_q8:
            # per (chunk, head, channel) quantization scales, K then V
            state["kv_scales"] = jnp.zeros(
                (m.num_layers, mc, batch, m.num_kv_heads, 2, m.head_dim),
                jnp.bfloat16)
        for key in self.score_keys:
            # Opa score accumulators, one fp32 score per window element;
            # column i scores the token at window column i and shifts with
            # the window at compaction.
            state[key] = jnp.zeros(
                (m.num_layers, batch, m.num_kv_heads, self.wcap, m.head_dim),
                jnp.float32)
        return state

    def _pool_bh(self, pool6):
        """Per-layer pool [mc, B, Hkv, ROWS, 128] -> kernel view
        [mc, B*Hkv, ROWS, 128] (b-major, free reshape)."""
        mc, B, H, R, L = pool6.shape
        return pool6.reshape(mc, B * H, R, L)

    def _scales_bh(self, s6):
        """Per-layer scales [mc, B, Hkv, 2, D] -> kernel views
        (kscales, vscales) each [mc, B*Hkv, D]."""
        mc, B, H, _, D = s6.shape
        r = s6.reshape(mc, B * H, 2, D)
        return r[:, :, 0], r[:, :, 1]

    def _pool_bh7(self, pool7):
        """Stacked pool [L, mc, B, Hkv, ROWS, 128] -> kernel view
        [L, mc, B*Hkv, ROWS, 128] (b-major, free reshape)."""
        L, mc, B, H, R, lanes = pool7.shape
        return pool7.reshape(L, mc, B * H, R, lanes)

    def _scales_bh7(self, s7):
        """Stacked scales [L, mc, B, Hkv, 2, D] -> kernel views
        (kscales, vscales) each [L, mc, B*Hkv, D]."""
        L, mc, B, H, _, D = s7.shape
        r = s7.reshape(L, mc, B * H, 2, D)
        return r[:, :, :, 0], r[:, :, :, 1]

    def _win_bh(self, win5):
        """Stacked window [L, B, Hkv, W, D] -> kernel view [L, B*Hkv, W, D]
        (free reshape)."""
        L, B, H, W, D = win5.shape
        return win5.reshape(L, B * H, W, D)

    def insert_slot(self, cache: dict, sub: dict, slot) -> dict:
        """Insert a batch-1 compressed cache into batch slot ``slot``."""
        out = dict(cache)
        out["kv_pool"] = jax.lax.dynamic_update_slice(
            cache["kv_pool"], sub["kv_pool"].astype(cache["kv_pool"].dtype),
            (0, 0, slot, 0, 0, 0))
        if "kv_scales" in cache:
            out["kv_scales"] = jax.lax.dynamic_update_slice(
                cache["kv_scales"],
                sub["kv_scales"].astype(cache["kv_scales"].dtype),
                (0, 0, slot, 0, 0, 0))
        for key in ("k_win", "v_win") + self.score_keys:
            out[key] = jax.lax.dynamic_update_slice_in_dim(
                cache[key], sub[key].astype(cache[key].dtype), slot, axis=1)
        out["n_chunks"] = jax.lax.dynamic_update_slice_in_dim(
            cache["n_chunks"], sub["n_chunks"], slot, axis=1)
        return out

    # -- packing ----------------------------------------------------------
    def _pack_chunk(self, dense_bhtd: jnp.ndarray, fmt: sf.ChunkFormat,
                    score=None):
        """dense [B, Hkv, C, D] -> fused-stream rows [BH, stream_rows, 128].
        ``score`` (same shape, fp32): Opa keep ranking instead of |x|."""
        B, H, C, D = dense_bhtd.shape
        x = dense_bhtd.reshape(B * H, C, D)                     # free reshape
        if score is not None:
            score = score.reshape(B * H, C, D)
        return sf.prune_and_encode_stream(x.astype(jnp.bfloat16), fmt, score)

    def _pack_chunk_b8(self, dense_bhtd: jnp.ndarray, fmt: sf.ChunkFormat,
                       score=None):
        """bitmap-q8: prune + int8-quantize + pack (ops/sparse_format.py).
        Returns (rows [BH, stream_rows, 128] int16, scales [BH, D] bf16)."""
        B, H, C, D = dense_bhtd.shape
        x = dense_bhtd.reshape(B * H, C, D).astype(jnp.bfloat16)
        if score is not None:
            score = score.reshape(B * H, C, D)
        rows, scales = sf.prune_and_encode_stream_q8(x, fmt, score)
        return rows, scales.astype(jnp.bfloat16)

    def _pack_chunk_q(self, dense_bhtd: jnp.ndarray, kind: str, score=None):
        """Quant codec: dense [B, Hkv, C, D] -> (rows [BH, R, 128] int16,
        scales [BH, D] bf16).  Prune first (top-k by |x|, or by ``score``
        for Opa policies), then quantize the survivors.

        A fused single-pass Pallas formulation exists
        (ops/kernels/pack_kernel.py) and measured 0.92-0.95x of this XLA
        chain on the chip (benchmarks/bench_pack.py): the cost is the
        15-round threshold bisection's VPU compute, which XLA already fuses
        — not HBM passes — so the XLA path stays production and the kernel
        stands as the measured negative result."""
        from mustafar_tpu.ops import quant_format as qf
        B, H, C, D = dense_bhtd.shape
        x = dense_bhtd.reshape(B * H, C, D)                     # free reshape
        x = x.astype(jnp.bfloat16)
        keep = self.k_keep if kind == "k" else self.v_keep
        sel = x if score is None else score.reshape(B * H, C, D)
        pruned = jnp.where(sf.topk_mask(sel, keep), x, 0).astype(jnp.bfloat16)
        return qf.encode_chunk(pruned, self.qcodec, kind)

    def _pack_rows_scales(self, k_chunk, v_chunk, k_score=None, v_score=None):
        """Prune+pack K and V chunks ([B, Hkv, C, D], head-major) with the
        active codec.  k_score/v_score (same shape, fp32): Opa accumulated
        scores replacing the magnitude keep rule.  Returns
        (rows6 [B, Hkv, ROWS, 128], scales6 [B, Hkv, 2, D] | None)."""
        B, Hkv = k_chunk.shape[:2]
        if self.bitmap_q8:
            k_rows, k_sc = self._pack_chunk_b8(k_chunk, self.kfmt, k_score)
            v_rows, v_sc = self._pack_chunk_b8(v_chunk, self.vfmt, v_score)
            scales6 = jnp.stack([k_sc, v_sc], axis=1).reshape(
                B, Hkv, 2, k_sc.shape[-1])
        elif self.qcodec is None:
            k_rows = self._pack_chunk(k_chunk, self.kfmt, k_score)
            v_rows = self._pack_chunk(v_chunk, self.vfmt, v_score)
            scales6 = None
        else:
            k_rows, k_sc = self._pack_chunk_q(k_chunk, "k", k_score)
            v_rows, v_sc = self._pack_chunk_q(v_chunk, "v", v_score)
            scales6 = jnp.stack([k_sc, v_sc], axis=1).reshape(
                B, Hkv, 2, k_sc.shape[-1])
        rows = jnp.concatenate([k_rows, v_rows], axis=-2)      # [BH, ROWS, 128]
        return rows.reshape(B, Hkv, *rows.shape[1:]), scales6

    def _append_chunk(self, lc, chunk_idx, k_chunk, v_chunk,
                      k_score=None, v_score=None):
        """Prune+pack one dense chunk ([B, Hkv, C, D]) into pool slot chunk_idx."""
        rows6, scales6 = self._pack_rows_scales(k_chunk, v_chunk,
                                                k_score, v_score)
        lc["kv_pool"] = jax.lax.dynamic_update_slice(
            lc["kv_pool"], rows6[None], (chunk_idx, 0, 0, 0, 0))
        if scales6 is not None:
            lc["kv_scales"] = jax.lax.dynamic_update_slice(
                lc["kv_scales"], scales6[None], (chunk_idx, 0, 0, 0, 0))
        return lc

    def _decode_pool_b8(self, rows, scales_bh, fmt, batch):
        """bitmap-q8 variant of _decode_pool (int8 codes + per-channel
        scales [mc, BH, D])."""
        mc = rows.shape[0]
        BH = rows.shape[1] * rows.shape[2]
        dense = sf.decode_stream_q8(rows.reshape(mc, BH, *rows.shape[3:]),
                                    scales_bh.astype(jnp.float32), fmt)
        H = self.model.num_kv_heads
        dense = jnp.swapaxes(dense, 0, 1).reshape(BH, mc * fmt.chunk, fmt.dim)
        return dense.reshape(batch, H, mc * fmt.chunk, fmt.dim)

    def _decode_pool(self, rows, fmt, batch):
        """Decompress stream rows [mc, B, Hkv, SR, 128] to dense
        [B, Hkv, max_chunks*C, D] (XLA fallback path)."""
        mc = rows.shape[0]
        BH = rows.shape[1] * rows.shape[2]
        dense = sf.decode_stream(rows.reshape(mc, BH, *rows.shape[3:]), fmt)
        H = self.model.num_kv_heads
        dense = jnp.swapaxes(dense, 0, 1).reshape(BH, mc * fmt.chunk, fmt.dim)
        return dense.reshape(batch, H, mc * fmt.chunk, fmt.dim)

    def _dense_pools(self, lc, batch):
        """Decode the whole pool to dense (k, v) [B, Hkv, mc*C, D] with the
        active codec (XLA fallback paths only)."""
        H = self.model.num_kv_heads
        mc, C, D = self.max_chunks, self.C, self.model.head_dim
        if self.qcodec is None:
            KR = self.kfmt.stream_rows
            if self.bitmap_q8:
                ks, vs = self._scales_bh(lc["kv_scales"])      # [mc, BH, D]
                k = self._decode_pool_b8(lc["kv_pool"][..., :KR, :], ks,
                                         self.kfmt, batch)
                v = self._decode_pool_b8(lc["kv_pool"][..., KR:, :], vs,
                                         self.vfmt, batch)
            else:
                k = self._decode_pool(lc["kv_pool"][..., :KR, :], self.kfmt,
                                      batch)
                v = self._decode_pool(lc["kv_pool"][..., KR:, :], self.vfmt,
                                      batch)
            return k, v
        from mustafar_tpu.ops import quant_format as qf
        cdc = self.qcodec
        rows = self._pool_bh(lc["kv_pool"])                    # [mc, BH, R, 128]
        ks, vs = self._scales_bh(lc["kv_scales"])              # [mc, BH, D]
        out = []
        for kind, sl, sc in (("k", slice(0, cdc.k_rows), ks),
                             ("v", slice(cdc.k_rows, cdc.stream_rows), vs)):
            dense = qf.decode_chunk(rows[:, :, sl], sc, cdc, kind)
            dense = jnp.swapaxes(dense, 0, 1).reshape(batch * H, mc * C, D)
            out.append(dense.reshape(batch, H, mc * C, D))
        return tuple(out)

    # -- prefill ----------------------------------------------------------
    def prefill_attend(self, lc, q, k, v, true_len):
        B, T, Hq, D = q.shape
        out = prefill_attention(q, k, v, true_len, self.window)

        C, r = self.C, self.r
        comp_len = jnp.maximum(true_len - r, 0) // C * C       # reference :416
        n_pre = comp_len // C
        max_pre = T // C
        kh = jnp.swapaxes(k, 1, 2)                              # [B, Hkv, T, D]
        vh = jnp.swapaxes(v, 1, 2)
        # Opa prefill scores for the packed prefix (same rules as the masked
        # cache's one-shot prefill prune; cache/dense.py module helpers)
        ksh = vsh = None
        if self.k_opa:
            from mustafar_tpu.cache.dense import prefill_k_opa_score
            ksh = jnp.swapaxes(prefill_k_opa_score(q, k, true_len), 1, 2)
        if self.v_opa:
            from mustafar_tpu.cache.dense import prefill_v_opa_score
            vsh = jnp.swapaxes(prefill_v_opa_score(
                q, k, v, true_len, self.p.group_size, self.window), 1, 2)

        def body(i, lc):
            start = i * C
            k_chunk = jax.lax.dynamic_slice_in_dim(kh, start, C, axis=2)
            v_chunk = jax.lax.dynamic_slice_in_dim(vh, start, C, axis=2)
            ks_chunk = None if ksh is None else \
                jax.lax.dynamic_slice_in_dim(ksh, start, C, axis=2)
            vs_chunk = None if vsh is None else \
                jax.lax.dynamic_slice_in_dim(vsh, start, C, axis=2)
            return jax.lax.cond(i < n_pre,
                                lambda lc: self._append_chunk(
                                    lc, i, k_chunk, v_chunk, ks_chunk, vs_chunk),
                                lambda lc: lc, lc)

        lc = dict(lc)
        if max_pre > 0:  # a prompt shorter than one chunk can never compress
            lc = jax.lax.fori_loop(0, max_pre, body, lc)
        lc["n_chunks"] = jnp.full((B,), n_pre, jnp.int32)

        # window <- tokens [comp_len, true_len); length in [r, r+C)
        idx = comp_len + jnp.arange(self.wcap)
        take = jnp.minimum(idx, T - 1)[None, None, :, None]
        win_rows_k = jnp.take_along_axis(kh, take, axis=2)
        win_rows_v = jnp.take_along_axis(vh, take, axis=2)
        valid = (idx < true_len)[None, None, :, None]
        lc["k_win"] = jnp.where(valid, win_rows_k, 0).astype(lc["k_win"].dtype)
        lc["v_win"] = jnp.where(valid, win_rows_v, 0).astype(lc["v_win"].dtype)
        return out, lc

    # -- chunked prefill --------------------------------------------------
    def segment_attend(self, lc, q, k, v, seg_start, true_len, full, li):
        """Chunked-prefill step: one C-token segment attends to
        (packed pools ++ dense window ++ causal self) and is absorbed into
        the cache state.

        Unlike monolithic prefill (reference flash prefill over the dense
        prompt, llama_mustafar_Kt_Mag_Vt_Mag.py:1034-1037), past context here
        is read through the compressed cache — activation memory per step is
        O(C), which is what unlocks long-context prefill on one chip.  The
        accuracy delta of pruned-past prefill is measurable through the
        harness (cli accuracy).

        STACKED protocol: ``full`` holds the whole [L, ...] pools (read-only)
        and windows (read-write); ``li`` is this layer's index.  The q8q4
        kernel DMAs the pools at li directly — no per-layer pool slice is
        materialized.  Returns (out, lc, window updates).

        Invariants with seg_start = s*C: on entry n_chunks = max(0, s-1) and
        the window holds tokens [n_chunks*C, seg_start) (length 0 or C); on
        exit they take the same form for s+1, with the final partial segment
        leaving window = [comp_len, true_len) exactly as monolithic prefill.

        Opa policies run STREAMING: monolithic Opa prefill ranks with
        full-prompt attention statistics (reference
        llama_mustafar_Kt_Opa_Vt_Mag.py:121-178 — every later query scores
        every key), which is exactly the O(T^2) state chunked prefill exists
        to avoid.  Here each chunk is packed with scores accumulated from
        (a) its own causal intra-segment attention and (b) the one following
        segment's attention (the chunk sits in the window for exactly one
        segment before packing) — a lookahead-C truncation of the reference
        rule, the same trade H2O-style streaming scorers make.  Decode then
        keeps accumulating on the residual window exactly like the
        monolithic path (_accumulate_scores).
        """
        from mustafar_tpu.ops.attention import attention_partials, merge_partials

        B, Tseg, Hq, D = q.shape
        Hkv = self.model.num_kv_heads
        C, r = self.C, self.r
        assert Tseg == C, (Tseg, C)
        nc = lc["n_chunks"][0]
        wl = seg_start - nc * C                                  # 0 or C
        kwin = jax.lax.dynamic_index_in_dim(full["k_win"], li, 0,
                                            keepdims=False)     # [B,Hkv,W,D]
        vwin = jax.lax.dynamic_index_in_dim(full["v_win"], li, 0,
                                            keepdims=False)

        # --- pools partials ---
        if self.use_pallas:
            from jax.sharding import PartitionSpec as P
            qspec = P("data", None, "model", None)
            if self.qcodec is not None:
                from mustafar_tpu.ops.kernels import quant_attention as qa
                call = lambda q_, pool7_, s7_, nc_, ss_, li_: \
                    qa.fused_q_segment_attention(
                        q_, self._pool_bh7(pool7_), *self._scales_bh7(s7_),
                        nc_, ss_, self.qcodec, self.max_chunks, li=li_,
                        window=self.window)
                if self.mesh is not None:
                    pspec7 = P(None, None, "data", "model", None, None)
                    call = jax.shard_map(
                        call, mesh=self.mesh,
                        in_specs=(qspec, pspec7, pspec7, P(), P(), P()),
                        out_specs=(qspec, qspec, qspec), check_vma=False)
                p_pool = call(q, full["kv_pool"], full["kv_scales"], nc,
                              seg_start, li)
            elif self.bitmap_q8:
                from mustafar_tpu.ops.kernels import sparse_attention as ska
                call = lambda q_, pool7_, s7_, nc_, ss_, li_: \
                    ska.fused_sparse_segment_attention(
                        q_, self._pool_bh7(pool7_), nc_, ss_, self.kfmt,
                        self.vfmt, self.max_chunks, li=li_,
                        window=self.window,
                        **dict(zip(("kscales", "vscales"),
                                   self._scales_bh7(s7_))))
                if self.mesh is not None:
                    pspec7 = P(None, None, "data", "model", None, None)
                    call = jax.shard_map(
                        call, mesh=self.mesh,
                        in_specs=(qspec, pspec7, pspec7, P(), P(), P()),
                        out_specs=(qspec, qspec, qspec), check_vma=False)
                p_pool = call(q, full["kv_pool"], full["kv_scales"], nc,
                              seg_start, li)
            else:
                from mustafar_tpu.ops.kernels import sparse_attention as ska
                call = lambda q_, pool7_, nc_, ss_, li_: \
                    ska.fused_sparse_segment_attention(
                        q_, self._pool_bh7(pool7_), nc_, ss_, self.kfmt,
                        self.vfmt, self.max_chunks, li=li_,
                        window=self.window)
                if self.mesh is not None:
                    pspec7 = P(None, None, "data", "model", None, None)
                    call = jax.shard_map(
                        call, mesh=self.mesh,
                        in_specs=(qspec, pspec7, P(), P(), P()),
                        out_specs=(qspec, qspec, qspec), check_vma=False)
                p_pool = call(q, full["kv_pool"], nc, seg_start, li)
        else:
            lc_xla = dict(lc)
            for key in self.segment_stacked_ro:
                lc_xla[key] = jax.lax.dynamic_index_in_dim(full[key], li, 0,
                                                           keepdims=False)
            p_pool = self._segment_pool_partials_xla(lc_xla, q, nc, seg_start)

        # --- window partials (all window tokens precede the segment) ---
        S = self.wcap
        wpos = nc * C + jnp.arange(S)                            # absolute
        qpos = seg_start + jnp.arange(Tseg)
        wmask = (jnp.arange(S) < wl)[None, :] & jnp.ones((Tseg, 1), bool)
        if self.window is not None:
            wmask &= wpos[None, :] > (qpos[:, None] - self.window)
        p_win = attention_partials(q, kwin, vwin, wmask, head_major=True)

        # --- causal self partials ---
        smask = jnp.arange(Tseg)[None, :] <= jnp.arange(Tseg)[:, None]
        if self.window is not None:
            smask &= (jnp.arange(Tseg)[None, :]
                      > jnp.arange(Tseg)[:, None] - self.window)
        p_self = attention_partials(q, k, v, smask)

        out = merge_partials([p_pool, p_win, p_self]).astype(q.dtype)

        # --- absorb segment into the state ---
        seg_valid = jnp.clip(true_len - seg_start, 0, C)
        total = seg_start + seg_valid
        nc_after = jnp.maximum(total - r, 0) // C
        do_pack = nc_after > nc
        seg_rows = (jnp.arange(C) < seg_valid)[None, None, :, None]

        # --- streaming Opa scores (see docstring) ---
        upd = {}
        sc = {}
        if self.k_opa or self.v_opa:
            qvalid = jnp.arange(Tseg) < seg_valid             # [Tseg]
            wmask_q = wmask & qvalid[:, None]                 # [Tseg, wcap]
            smask_q = smask & qvalid[:, None] & qvalid[None, :]
            contrib = {}
            G = Hq // Hkv
            if self.k_opa:
                # reference k rule: |mean_group|q| * k| per element, summed
                # over the queries allowed to see the key (decode analog:
                # _accumulate_scores) — qa >= 0 so the sum factors
                qa = jnp.abs(q.astype(jnp.float32)).reshape(
                    B, Tseg, Hkv, G, D).mean(axis=3)          # [B,Tseg,Hkv,D]
                contrib["k_score"] = (
                    jnp.einsum("bthd,tw->bhwd", qa,
                               wmask_q.astype(jnp.float32)),
                    jnp.einsum("bthd,ts->bhsd", qa,
                               smask_q.astype(jnp.float32)))
                abs_k = (jnp.abs(kwin.astype(jnp.float32)),
                         jnp.abs(jnp.swapaxes(k, 1, 2).astype(jnp.float32)))
            if self.v_opa:
                # reference v rule: |p * v| with post-softmax p; reconstruct
                # p from the merged (M, L) of pools ++ window ++ self — the
                # same stats merge_partials normalizes the output with
                M = jnp.maximum(jnp.maximum(p_pool[1], p_win[1]), p_self[1])
                Lden = (p_pool[2] * jnp.exp(p_pool[1] - M)
                        + p_win[2] * jnp.exp(p_win[1] - M)
                        + p_self[2] * jnp.exp(p_self[1] - M))
                Mg = M.reshape(B, Tseg, Hkv, G, 1)
                Lg = jnp.maximum(Lden.reshape(B, Tseg, Hkv, G, 1), 1e-30)
                qg = q.reshape(B, Tseg, Hkv, G, D)
                scale = 1.0 / jnp.sqrt(jnp.float32(D))

                def probs(keys, mask_ts):                     # keys [B,Hkv,S,D]
                    s = jnp.einsum("bthgd,bhsd->bthgs", qg, keys,
                                   preferred_element_type=jnp.float32) * scale
                    p = jnp.exp(s - Mg) / Lg
                    p = jnp.where(mask_ts[None, :, None, None, :], p, 0.0)
                    return p.sum(axis=3).sum(axis=1)          # [B,Hkv,S]
                contrib["v_score"] = (probs(kwin, wmask_q)[..., None],
                                      probs(jnp.swapaxes(k, 1, 2),
                                            smask_q)[..., None])
                abs_v = (jnp.abs(vwin.astype(jnp.float32)),
                         jnp.abs(jnp.swapaxes(v, 1, 2).astype(jnp.float32)))
            for key in self.score_keys:
                absx = abs_k if key == "k_score" else abs_v
                old = jax.lax.dynamic_index_in_dim(full[key], li, 0,
                                                   keepdims=False)
                win_cols = (jnp.arange(self.wcap) < wl)[None, None, :, None]
                sc[key] = jnp.where(win_cols,
                                    old + contrib[key][0] * absx[0], 0.0)
                sc[key + "/self"] = jnp.where(seg_rows,
                                              contrib[key][1] * absx[1], 0.0)

        lc = dict(lc)
        # stage the pack of the current window's C tokens; finalize_segment
        # applies it to pool slot nc AFTER the layer scan (one fused update
        # across layers, pool stays scan-invariant — see __init__ note)
        new6, scales6 = self._pack_rows_scales(
            kwin[:, :, :C], vwin[:, :, :C],
            sc["k_score"][:, :, :C] if self.k_opa else None,
            sc["v_score"][:, :, :C] if self.v_opa else None)
        lc["_seg_rows"] = new6.astype(full["kv_pool"].dtype)
        if scales6 is not None:
            lc["_seg_scales"] = scales6.astype(full["kv_scales"].dtype)

        # shift score buffers exactly like the windows below
        for key in self.score_keys:
            tmp = jnp.concatenate(
                [sc[key], jnp.zeros((B, Hkv, C, D), jnp.float32)], axis=2)
            tmp = jax.lax.dynamic_update_slice(
                tmp, sc[key + "/self"], (0, 0, wl, 0))
            new_sc = jax.lax.dynamic_slice(
                tmp, (0, 0, do_pack.astype(jnp.int32) * C, 0),
                (B, Hkv, self.wcap, D))
            upd[key] = jax.lax.dynamic_update_index_in_dim(
                full[key], new_sc, li, 0)

        # rebuild the window from [old window ++ segment] shifted by the pack
        for key, win, seg_kv in (("k_win", kwin, k), ("v_win", vwin, v)):
            old = jnp.where(
                (jnp.arange(self.wcap) < wl)[None, None, :, None], win, 0)
            # C + wcap rows so the post-pack slice [C, C + wcap) never clamps
            tmp = jnp.concatenate(
                [old, jnp.zeros((B, Hkv, C, D), old.dtype)], axis=2)
            seg_h = jnp.swapaxes(seg_kv, 1, 2)                  # [B,Hkv,C,D]
            tmp = jax.lax.dynamic_update_slice(
                tmp, jnp.where(seg_rows, seg_h, 0).astype(tmp.dtype),
                (0, 0, wl, 0))
            new_win = jax.lax.dynamic_slice(
                tmp, (0, 0, do_pack.astype(jnp.int32) * C, 0),
                (B, Hkv, self.wcap, D))
            upd[key] = jax.lax.dynamic_update_index_in_dim(
                full[key], new_win.astype(full[key].dtype), li, 0)
        lc["n_chunks"] = jnp.full((B,), nc_after, jnp.int32)
        return out, lc, upd

    def finalize_segment(self, old_cache: dict, new_cache: dict) -> dict:
        """Apply a segment's staged chunk pack to the stacked [L, ...] cache.

        Called by the model forward after the layer scan (chunked prefill
        advances every layer in lockstep, so the pack predicate and target
        slot are layer-uniform).  One dynamic_update_slice over all layers;
        with a donated cache XLA performs it in place.
        """
        new_cache = dict(new_cache)
        rows = new_cache.pop("_seg_rows")            # [L, B, Hkv, ROWS, 128]
        scales = new_cache.pop("_seg_scales", None)  # [L, B, Hkv, 2, D]
        nc_old = old_cache["n_chunks"][0, 0]
        do_pack = new_cache["n_chunks"][0, 0] > nc_old
        slot = jnp.clip(nc_old, 0, self.max_chunks - 1)

        def put(pool, upd):                          # pool [L, mc, ...]
            cur = jax.lax.dynamic_slice(
                pool, (0, slot) + (0,) * (pool.ndim - 2),
                (pool.shape[0], 1, *pool.shape[2:]))
            return jax.lax.dynamic_update_slice(
                pool, jnp.where(do_pack, upd[:, None].astype(pool.dtype), cur),
                (0, slot) + (0,) * (pool.ndim - 2))

        new_cache["kv_pool"] = put(old_cache["kv_pool"], rows)
        if scales is not None:
            new_cache["kv_scales"] = put(old_cache["kv_scales"], scales)
        return new_cache

    def _segment_pool_partials_xla(self, lc, q, nc, seg_start):
        """XLA fallback for segment-over-pools partials (CPU path)."""
        from mustafar_tpu.ops.attention import attention_partials
        B, Tseg, Hq, D = q.shape
        S = self.max_chunks * self.C
        k_dense, v_dense = self._dense_pools(lc, B)
        # [B, Hkv, S, D] -> [B, S, Hkv, D]; match the query dtype (the pools
        # decode to bf16; in f32 runs a bf16xbf16->f32 dot is UNIMPLEMENTED
        # in the CPU thunk runtime this fallback exists for)
        k_dense = jnp.transpose(k_dense, (0, 2, 1, 3)).astype(q.dtype)
        v_dense = jnp.transpose(v_dense, (0, 2, 1, 3)).astype(q.dtype)
        mask = (jnp.arange(S) < nc * self.C)[None, :] & jnp.ones((Tseg, 1), bool)
        if self.window is not None:
            qpos = seg_start + jnp.arange(Tseg)
            mask &= jnp.arange(S)[None, :] > (qpos[:, None] - self.window)
        return attention_partials(q, k_dense, v_dense, mask)

    # -- Opa scoring (compressed mode) -------------------------------------
    def _win_validity(self, n_chunks, win_len, pos, B):
        """[B, wcap] mask of live window columns (length + sliding window)."""
        cols = jnp.arange(self.wcap)
        wl_b = jnp.broadcast_to(jnp.asarray(win_len).reshape(-1), (B,))
        valid = cols[None, :] < wl_b[:, None]
        if self.window is not None:
            nc_b = jnp.broadcast_to(jnp.asarray(n_chunks).reshape(-1), (B,))
            pos_b = jnp.broadcast_to(jnp.asarray(pos).reshape(-1), (B,))
            abs_idx = nc_b[:, None] * self.C + cols[None, :]
            valid &= abs_idx > (pos_b[:, None] - self.window)
        return valid

    def _accumulate_scores(self, upd, full, li, q, valid, p_win):
        """Add this step's Opa scores for the live window columns into the
        stacked score buffers at layer ``li`` (k: |mean|q| * k| per element,
        reference llama_mustafar_Kt_Opa_Vt_Mag.py:121-178; v: |p * v|,
        llama_mustafar_Kt_Mag_Vt_Opa.py:115-260).  Mutates/returns upd."""
        B, _, Hq, D = q.shape
        Hkv = self.model.num_kv_heads
        vmask = valid[:, None, :, None]                     # [B,1,wcap,1]
        if self.k_opa:
            kw_l = jax.lax.dynamic_index_in_dim(upd["k_win"], li, 0,
                                                keepdims=False)
            qa = jnp.abs(q[:, 0].astype(jnp.float32)).reshape(
                B, Hkv, Hq // Hkv, D).mean(axis=2)          # [B,Hkv,D]
            step = jnp.where(
                vmask, jnp.abs(qa[:, :, None, :] * kw_l.astype(jnp.float32)),
                0.0)
            ks_l = jax.lax.dynamic_index_in_dim(full["k_score"], li, 0,
                                                keepdims=False) + step
            upd["k_score"] = jax.lax.dynamic_update_index_in_dim(
                full["k_score"], ks_l, li, 0)
        if self.v_opa:
            vw_l = jax.lax.dynamic_index_in_dim(upd["v_win"], li, 0,
                                                keepdims=False)
            step = jnp.where(
                vmask,
                jnp.abs(p_win[..., None] * vw_l.astype(jnp.float32)), 0.0)
            vs_l = jax.lax.dynamic_index_in_dim(full["v_score"], li, 0,
                                                keepdims=False) + step
            upd["v_score"] = jax.lax.dynamic_update_index_in_dim(
                full["v_score"], vs_l, li, 0)
        return upd

    # -- decode -----------------------------------------------------------
    def decode_attend(self, lc, q, k, v, pos, full=None, li=None):
        """q [B,1,Hq,D]; appends k/v (1 token) and attends pools + window.

        STACKED protocol: ``full`` holds the whole [L, ...] pools (read-only)
        and windows (read-write); ``li`` is this layer's index.  The token
        append is a one-token dynamic_update_slice on the stacked window (the
        scan carry aliases it in place) and the q8q4 kernel DMAs pools and
        windows at li directly — nothing layer-sized is materialized.
        Returns (out, lc, window updates).

        Per-layer convenience (full=None, unit tests): lc holds the layer's
        own pools/windows; returns (out, lc) with the updates folded back in.

        pos: scalar int32 (uniform batch) or [B] (per-slot continuous
        batching; per-slot chunk counts, window lengths, and compaction)."""
        if full is None:
            keys = self.decode_stacked_ro + self.decode_stacked_rw
            full1 = {key: lc[key][None] for key in keys}
            out, lc2, upd = self.decode_attend(
                {key: val for key, val in lc.items() if key not in keys},
                q, k, v, pos, full1, jnp.int32(0))
            lc2 = dict(lc2, **{key: lc[key] for key in self.decode_stacked_ro})
            lc2.update({key: val[0] for key, val in upd.items()})
            return out, lc2
        pos = jnp.asarray(pos)
        if pos.ndim > 0:
            return self._decode_attend_per_slot(dict(lc), q, k, v, pos,
                                                full, li)
        lc = dict(lc)
        B, _, Hq, D = q.shape
        Hkv = self.model.num_kv_heads
        C, r = self.C, self.r
        n_chunks = lc["n_chunks"][0]                            # uniform batch
        comp_len = n_chunks * C
        win_len = pos + 1 - comp_len                            # incl. new token

        upd = {}
        for key, tok in (("k_win", k), ("v_win", v)):
            upd[key] = jax.lax.dynamic_update_slice(
                full[key], jnp.swapaxes(tok, 1, 2)[None].astype(full[key].dtype),
                (li, 0, 0, win_len - 1, 0))

        opa = self.k_opa or self.v_opa
        p_win = None
        if self.use_pallas:
            extra = "win_probs" if self.v_opa else None
            if self.qcodec is not None:
                from mustafar_tpu.ops.kernels import quant_attention as qa
                call = lambda q_, pool7_, s7_, kw5_, vw5_, nc_, wl_, li_: \
                    qa.fused_q_decode_attention(
                        q_, self._pool_bh7(pool7_), *self._scales_bh7(s7_),
                        self._win_bh(kw5_), self._win_bh(vw5_), nc_, wl_,
                        self.qcodec, self.max_chunks, li=li_,
                        window=self.window, return_win_probs=self.v_opa)
                if self.mesh is not None:
                    from mustafar_tpu.parallel import sharding as sh
                    call = sh.shard_headlocal_attend(
                        call, self.mesh, quant=True, stacked=True,
                        extra_out=extra)
                out = call(q, full["kv_pool"], full["kv_scales"],
                           upd["k_win"], upd["v_win"], n_chunks, win_len, li)
            elif self.bitmap_q8:
                from mustafar_tpu.ops.kernels import sparse_attention as ska
                call = lambda q_, pool7_, s7_, kw5_, vw5_, nc_, wl_, li_: \
                    ska.fused_sparse_decode_attention_v7(
                        q_, self._pool_bh7(pool7_),
                        self._win_bh(kw5_), self._win_bh(vw5_), nc_, wl_,
                        self.kfmt, self.vfmt, self.max_chunks, li=li_,
                        window=self.window, return_win_probs=self.v_opa,
                        **dict(zip(("kscales", "vscales"),
                                   self._scales_bh7(s7_))))
                if self.mesh is not None:
                    from mustafar_tpu.parallel import sharding as sh
                    call = sh.shard_headlocal_attend(
                        call, self.mesh, quant=True, stacked=True,
                        extra_out=extra)
                out = call(q, full["kv_pool"], full["kv_scales"],
                           upd["k_win"], upd["v_win"], n_chunks, win_len, li)
            else:
                from mustafar_tpu.ops.kernels import sparse_attention as ska
                call = lambda q_, pool7_, kw5_, vw5_, nc_, wl_, li_: \
                    ska.fused_sparse_decode_attention_v7(
                        q_, self._pool_bh7(pool7_),
                        self._win_bh(kw5_), self._win_bh(vw5_), nc_, wl_,
                        self.kfmt, self.vfmt, self.max_chunks, li=li_,
                        window=self.window, return_win_probs=self.v_opa)
                if self.mesh is not None:
                    from mustafar_tpu.parallel import sharding as sh
                    call = sh.shard_headlocal_attend(
                        call, self.mesh, stacked=True, extra_out=extra)
                out = call(q, full["kv_pool"], upd["k_win"], upd["v_win"],
                           n_chunks, win_len, li)
            if self.v_opa:
                out, p_win = out
        else:
            lc_xla = self._lc_xla(lc, upd, full, li)
            out = self._decode_attend_xla(lc_xla, q, n_chunks, win_len,
                                          B, Hkv, D,
                                          return_win_probs=self.v_opa)
            if self.v_opa:
                out, p_win = out
        if opa:
            upd = self._accumulate_scores(
                upd, full, li, q,
                self._win_validity(n_chunks, win_len, pos, B), p_win)
        # NOTE: compaction is NOT performed here.  XLA:TPU executes BOTH
        # branches of lax.cond and selects (measured 16.7 ms/layer/step of
        # dead packing work), so callers invoke ``compact_layer`` /
        # ``compact_slots`` explicitly at the (host-predictable) boundary:
        # a compact is due after the step where needs_compact(pos+1) holds.
        return out, lc, upd

    def _lc_xla(self, lc, upd, full, li):
        """Per-layer view of the stacked state for the XLA fallback paths."""
        lc_xla = dict(lc)
        for key in self.decode_stacked_ro:
            lc_xla[key] = jax.lax.dynamic_index_in_dim(full[key], li, 0,
                                                       keepdims=False)
        for key in self.decode_stacked_rw:
            # score keys are appended to upd AFTER attention (they need its
            # softmax stats); read them from the unmodified stacked state
            src = upd[key] if key in upd else full[key]
            lc_xla[key] = jax.lax.dynamic_index_in_dim(src, li, 0,
                                                       keepdims=False)
        return lc_xla

    def _decode_attend_per_slot(self, lc, q, k, v, pos, full, li):
        """Per-slot decode: pos [B]; n_chunks [B]; vectorized compaction."""
        B, _, Hq, D = q.shape
        Hkv = self.model.num_kv_heads
        C, r = self.C, self.r
        mc = self.max_chunks
        nc = lc["n_chunks"]                                     # [B]
        win_len = pos + 1 - nc * C                              # [B]
        bidx = jnp.arange(B)

        upd = {}
        for key, tok in (("k_win", k), ("v_win", v)):
            upd[key] = full[key].at[li, bidx, :, win_len - 1].set(
                tok[:, 0].astype(full[key].dtype))

        opa = self.k_opa or self.v_opa
        p_win = None
        if self.use_pallas:
            extra = "win_probs" if self.v_opa else None
            if self.qcodec is not None:
                from mustafar_tpu.ops.kernels import quant_attention as qa
                call = lambda q_, pool7_, s7_, kw5_, vw5_, nc_, wl_, li_: \
                    qa.fused_q_decode_attention_ps(
                        q_, self._pool_bh7(pool7_), *self._scales_bh7(s7_),
                        self._win_bh(kw5_), self._win_bh(vw5_), nc_, wl_,
                        self.qcodec, mc, li=li_, window=self.window,
                        return_win_probs=self.v_opa)
                if self.mesh is not None:
                    from mustafar_tpu.parallel import sharding as sh
                    call = sh.shard_headlocal_attend(
                        call, self.mesh, per_slot=True, quant=True,
                        stacked=True, extra_out=extra)
                out = call(q, full["kv_pool"], full["kv_scales"],
                           upd["k_win"], upd["v_win"], nc, win_len, li)
            elif self.bitmap_q8:
                from mustafar_tpu.ops.kernels import sparse_attention as ska
                call = lambda q_, pool7_, s7_, kw5_, vw5_, nc_, wl_, li_: \
                    ska.fused_sparse_decode_attention_v6ps(
                        q_, self._pool_bh7(pool7_),
                        self._win_bh(kw5_), self._win_bh(vw5_), nc_, wl_,
                        self.kfmt, self.vfmt, mc, li=li_, window=self.window,
                        return_win_probs=self.v_opa,
                        **dict(zip(("kscales", "vscales"),
                                   self._scales_bh7(s7_))))
                if self.mesh is not None:
                    from mustafar_tpu.parallel import sharding as sh
                    call = sh.shard_headlocal_attend(
                        call, self.mesh, per_slot=True, quant=True,
                        stacked=True, extra_out=extra)
                out = call(q, full["kv_pool"], full["kv_scales"],
                           upd["k_win"], upd["v_win"], nc, win_len, li)
            else:
                from mustafar_tpu.ops.kernels import sparse_attention as ska
                call = lambda q_, pool7_, kw5_, vw5_, nc_, wl_, li_: \
                    ska.fused_sparse_decode_attention_v6ps(
                        q_, self._pool_bh7(pool7_),
                        self._win_bh(kw5_), self._win_bh(vw5_), nc_, wl_,
                        self.kfmt, self.vfmt, mc, li=li_, window=self.window,
                        return_win_probs=self.v_opa)
                if self.mesh is not None:
                    from mustafar_tpu.parallel import sharding as sh
                    call = sh.shard_headlocal_attend(
                        call, self.mesh, per_slot=True, stacked=True,
                        extra_out=extra)
                out = call(q, full["kv_pool"], upd["k_win"], upd["v_win"],
                           nc, win_len, li)
            if self.v_opa:
                out, p_win = out
        else:
            lc_xla = self._lc_xla(lc, upd, full, li)
            out = self._decode_attend_xla(lc_xla, q, nc, win_len, B, Hkv, D,
                                          return_win_probs=self.v_opa)
            if self.v_opa:
                out, p_win = out
        if opa:
            upd = self._accumulate_scores(
                upd, full, li, q, self._win_validity(nc, win_len, pos, B),
                p_win)

        # compaction deferred to compact_slots (see decode_attend note)
        return out, lc, upd

    def needs_compact(self, total: int) -> bool:
        """True when a sequence of ``total`` tokens has a full r+C window
        (host-side; total and the chunk count are in lockstep:
        nc(total) = max(0, (total - r) // C))."""
        d = total - self.r
        return d >= self.C and d % self.C == 0

    def compact_layer(self, lc: dict) -> dict:
        """Pack the oldest C window tokens into the pools (uniform batch)."""
        C = self.C
        lc = dict(lc)
        n_chunks = lc["n_chunks"][0]
        lc = self._append_chunk(
            lc, n_chunks, lc["k_win"][:, :, :C], lc["v_win"][:, :, :C],
            lc["k_score"][:, :, :C] if self.k_opa else None,
            lc["v_score"][:, :, :C] if self.v_opa else None)
        for key in ("k_win", "v_win") + self.score_keys:
            lc[key] = jnp.concatenate(
                [lc[key][:, :, C:], jnp.zeros_like(lc[key][:, :, :C])],
                axis=2)
        lc["n_chunks"] = lc["n_chunks"] + 1
        return lc

    def _compact_scan(self, cache: dict, sel, do_i32):
        """Shared compaction machinery: layer-scan over the NON-pool state
        (window shift + chunk pack, both predicated by ``sel``), returning
        (rest-of-state, staged rows [L,B,Hkv,ROWS,128], staged scales|None).

        The pool stays out of the scan — a scan that threads it restacks the
        full multi-GiB buffer as its output (the 32k OOM); callers apply the
        staged pack with one in-place update instead."""
        C = self.C
        rest = {k: v for k, v in cache.items()
                if k not in self.segment_invariant_keys}

        def one(_, lc):
            new6, scales6 = self._pack_rows_scales(
                lc["k_win"][:, :, :C], lc["v_win"][:, :, :C],
                lc["k_score"][:, :, :C] if self.k_opa else None,
                lc["v_score"][:, :, :C] if self.v_opa else None)
            out = {"n_chunks": lc["n_chunks"] + do_i32, "_rows": new6}
            if scales6 is not None:
                out["_scales"] = scales6
            for key in ("k_win", "v_win") + self.score_keys:
                shifted = jnp.concatenate(
                    [lc[key][:, :, C:], jnp.zeros_like(lc[key][:, :, :C])],
                    axis=2)
                out[key] = jnp.where(sel, shifted, lc[key])
            return 0, out

        scanned = jax.lax.scan(one, 0, rest)[1]
        rows = scanned.pop("_rows")
        scales = scanned.pop("_scales", None)
        return scanned, rows, scales

    def compact(self, cache: dict, do=True) -> dict:
        """Pack the oldest C window tokens into the pools across all layers
        (uniform batch).  ``do``: scalar predicate — when False the state
        passes through unchanged.  Predication instead of lax.cond because
        XLA:TPU executes BOTH cond branches (materializing a dead full-pool
        copy); see _compact_scan for why the pool write is hoisted."""
        do = jnp.asarray(do)
        scanned, rows, scales = self._compact_scan(
            cache, do, do.astype(jnp.int32))
        slot = jnp.clip(cache["n_chunks"][0, 0], 0, self.max_chunks - 1)

        def put(pool, upd):                          # pool [L, mc, ...]
            cur = jax.lax.dynamic_slice(
                pool, (0, slot) + (0,) * (pool.ndim - 2),
                (pool.shape[0], 1, *pool.shape[2:]))
            return jax.lax.dynamic_update_slice(
                pool, jnp.where(do, upd[:, None].astype(pool.dtype), cur),
                (0, slot) + (0,) * (pool.ndim - 2))

        out = dict(cache, **scanned)
        out["kv_pool"] = put(cache["kv_pool"], rows)
        if scales is not None:
            out["kv_scales"] = put(cache["kv_scales"], scales)
        return out

    def compact_slots(self, cache: dict, do) -> dict:
        """Per-slot compaction of the stacked cache for slots where do[b]."""
        mc = self.max_chunks
        do = jnp.asarray(do)                                   # [B]
        scanned, rows, scales = self._compact_scan(
            cache, do[:, None, None, None], do.astype(jnp.int32))
        B = do.shape[0]
        b_i = jnp.arange(B)
        ci = jnp.clip(cache["n_chunks"][0], 0, mc - 1)         # [B]

        def put(pool, upd):                          # pool [L, mc, B, ...]
            existing = pool[:, ci, b_i]                        # [L, B, ...]
            sel = do.reshape((1, B) + (1,) * (upd.ndim - 2))
            return pool.at[:, ci, b_i].set(
                jnp.where(sel, upd.astype(pool.dtype), existing))

        out = dict(cache, **scanned)
        out["kv_pool"] = put(cache["kv_pool"], rows)
        if scales is not None:
            out["kv_scales"] = put(cache["kv_scales"], scales)
        return out

    def _decode_attend_xla(self, lc, q, n_chunks, win_len, B, Hkv, D,
                           return_win_probs: bool = False):
        """XLA fallback: decompress pools, two-part masked attention.

        Numerically mirrors the kernel path (and the reference decode,
        llama_mustafar_kernel.py:256-321).  n_chunks/win_len: scalar (uniform)
        or [B,1,1,1] (per-slot).  ``return_win_probs``: also return the
        post-softmax window-column weights folded over the query group,
        [B, Hkv, wcap] fp32 (Opa scoring)."""
        S = self.max_chunks * self.C
        k_dense, v_dense = self._dense_pools(lc, B)
        G = q.shape[2] // Hkv
        qg = q[:, 0].reshape(B, Hkv, G, D)
        scale = 1.0 / jnp.sqrt(jnp.float32(D))
        nc_b = jnp.asarray(n_chunks).reshape(-1, 1, 1, 1)   # [1|B, 1, 1, 1]
        wl_b = jnp.asarray(win_len).reshape(-1, 1, 1, 1)

        s_comp = jnp.einsum("bhgd,bhsd->bhgs", qg, k_dense,
                            preferred_element_type=jnp.float32) * scale
        comp_valid = jnp.arange(S)[None, None, None, :] < nc_b * self.C
        if self.window is not None:
            low = nc_b * self.C + wl_b - 1 - self.window
            comp_valid &= jnp.arange(S)[None, None, None, :] > low
        s_comp = jnp.where(comp_valid, s_comp, NEG_INF)
        kw = lc["k_win"]                                         # [B,Hkv,W,D]
        s_win = jnp.einsum("bhgd,bhwd->bhgw", qg, kw,
                           preferred_element_type=jnp.float32) * scale
        s_win = jnp.where(jnp.arange(self.wcap)[None, None, None, :] < wl_b,
                          s_win, NEG_INF)
        logits = jnp.concatenate([s_comp, s_win], axis=-1)
        w = jax.nn.softmax(logits, axis=-1)
        w_comp, w_win = w[..., :S], w[..., S:]
        vw = lc["v_win"]
        out = (jnp.einsum("bhgs,bhsd->bhgd", w_comp.astype(v_dense.dtype), v_dense,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bhgw,bhwd->bhgd", w_win.astype(vw.dtype), vw,
                            preferred_element_type=jnp.float32))
        out = out.reshape(B, 1, q.shape[2], D).astype(q.dtype)
        if not return_win_probs:
            return out
        return out, w_win.sum(axis=2)                           # [B,Hkv,wcap]
