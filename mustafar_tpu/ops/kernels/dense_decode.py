"""Dense flash-decoding attention kernel (Pallas TPU).

Production decode path for the dense/masked cache modes, replacing the XLA
einsum+softmax decode attention.  Same head-batched flash structure as the
sparse v5/v6 kernels (ops/sparse_attention.py) without the expansion stage:
the per-sequence KV is streamed in S-tiles through the grid pipeline, all
kv-heads of a sequence are processed per step with one cross-product matmul
and a block-diagonal online softmax.

Supports scalar (uniform) or per-slot [B] positions and an optional sliding
window, so it also serves Mistral and the continuous-batching scheduler.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _flash_decode_kernel(pos_ref, k_ref, v_ref, q_ref, out_ref,
                         m_out, l_out, m_ref, l_ref, acc_ref,
                         *, ts: int, hkv: int, g8: int, scale: float,
                         window: Optional[int], n_tiles: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pos = pos_ref[b]
    D = q_ref.shape[3]
    HG = hkv * g8
    HT = hkv * ts

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    base = t * ts
    active = base <= pos

    @pl.when(active)
    def _():
        # stack heads: [ts, hkv, D] -> [hkv*ts, D]
        k_all = jnp.concatenate([k_ref[0, :, h, :] for h in range(hkv)], axis=0)
        v_all = jnp.concatenate([v_ref[0, :, h, :] for h in range(hkv)], axis=0)
        q_all = q_ref[0].reshape(HG, D)

        hq = jax.lax.broadcasted_iota(jnp.int32, (HG, HT), 0) // g8
        hk = jax.lax.broadcasted_iota(jnp.int32, (HG, HT), 1) // ts
        kpos = base + jax.lax.broadcasted_iota(jnp.int32, (HG, HT), 1) % ts
        mask = (hq == hk) & (kpos <= pos)
        if window is not None:
            mask &= kpos > (pos - window)

        s = jax.lax.dot_general(q_all, k_all, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask, s, -1e30)
        m_old = m_ref[:].reshape(HG, 128)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new[:, :1])
        corr = jnp.exp(m_old - m_new)
        l_ref[:] = (l_ref[:].reshape(HG, 128) * corr
                    + jnp.sum(p, axis=-1, keepdims=True)).reshape(l_ref.shape)
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), v_all,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:] = (acc_ref[:].reshape(HG, D) * corr[:, :D] + pv).reshape(acc_ref.shape)
        m_ref[:] = m_new.reshape(m_ref.shape)

    @pl.when(t == n_tiles - 1)
    def _():
        out_ref[0] = (acc_ref[:].reshape(HG, D)
                      / jnp.maximum(l_ref[:].reshape(HG, 128)[:, :1], 1e-30)
                      ).reshape(out_ref.shape[1:])
        # final softmax stats: p(kpos) = exp(s - m) / l can be reconstructed
        # for any position in XLA (Opa scoring needs only the residual-window
        # columns — cache/dense.py window_probs)
        m_out[0] = m_ref[:].reshape(HG, 128)[:, :1].reshape(m_out.shape[1:])
        l_out[0] = l_ref[:].reshape(HG, 128)[:, :1].reshape(l_out.shape[1:])


def flash_decode_attention(q, k_cache, v_cache, pos,
                           window: Optional[int] = None, ts: int = 512,
                           return_norm: bool = False):
    """q [B,1,Hq,D]; k_cache/v_cache [B,S,Hkv,D]; pos scalar or [B] int32
    (index of the newest token, already written into the cache).
    Returns [B,1,Hq,D] in q.dtype; with return_norm also the final online-
    softmax stats (m, l) [B,Hkv,G,1] f32, from which the attention
    probability of any position is exp(s - m)/l (Opa decode scoring)."""
    B, _, Hq, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    G = Hq // Hkv
    G8 = max(8, G)
    ts = min(ts, S)
    while S % ts:
        ts //= 2
    n_tiles = S // ts

    pos = jnp.asarray(pos)
    pos_v = jnp.broadcast_to(pos.reshape(-1), (B,)).astype(jnp.int32)

    qg = q[:, 0].reshape(B, Hkv, G, D)
    qpad = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - G), (0, 0))).astype(jnp.bfloat16)

    def clamp_map(b, t, pref):
        # skip refetch for tiles past pos: clamp to last active tile
        last = jnp.maximum(pref[b] // ts, 0)
        return (b, jnp.minimum(t, last), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, ts, Hkv, D), clamp_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, Hkv, D), clamp_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, G8, D), lambda b, t, pref: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, Hkv, G8, D),
                                lambda b, t, pref: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, Hkv, G8, 1),
                                lambda b, t, pref: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, Hkv, G8, 1),
                                lambda b, t, pref: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G8, 128), jnp.float32),
            pltpu.VMEM((Hkv, G8, 128), jnp.float32),
            pltpu.VMEM((Hkv, G8, D), jnp.float32),
        ],
    )
    out, m, l = pl.pallas_call(
        functools.partial(_flash_decode_kernel, ts=ts, hkv=Hkv, g8=G8,
                          scale=float(1.0 / np.sqrt(D)), window=window,
                          n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, Hkv, G8, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hkv, G8, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hkv, G8, 1), jnp.float32)),
        interpret=_interpret(),
    )(pos_v, k_cache.astype(jnp.bfloat16), v_cache.astype(jnp.bfloat16), qpad)
    out = out[:, :, :G, :].reshape(B, 1, Hq, D).astype(q.dtype)
    if return_norm:
        return out, m[:, :, :G, :], l[:, :, :G, :]
    return out
