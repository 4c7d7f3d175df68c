"""Scaling-efficiency harness: decode throughput across dp x tp mesh shapes.

On real multi-chip hardware this reports tokens/s at 1 chip / 1 host / N
hosts (BASELINE.md target: >=85% scaling efficiency on 2 hosts).  Without
multi-chip hardware it runs the same sharded program on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) to validate the
program scales structurally; wall-times on virtual devices are not
throughput claims.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python benchmarks/bench_scaling.py
"""

import os
import time

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the axon TPU plugin ignores the env var; enforce via config
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    from mustafar_tpu.config import (CacheMode, EngineConfig, ModelConfig,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.cache import make_cache
    from mustafar_tpu.models import llama
    from mustafar_tpu.models.llama import init_params
    from mustafar_tpu.parallel import sharding as sh

    ndev = len(jax.devices())
    cfg = ModelConfig(name="scale-test", vocab_size=1024, hidden_size=512,
                      intermediate_size=1024, num_layers=4, num_heads=8,
                      num_kv_heads=8, head_dim=64, max_position_embeddings=2048)
    eng = EngineConfig(model=cfg, cache_mode=CacheMode.MASKED,
                       prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                         k_sparsity=0.7, v_sparsity=0.7),
                       max_seq_len=512)
    impl = make_cache(eng)

    shapes = [(1, 1)]
    if ndev >= 2:
        shapes += [(2, 1), (1, 2)]
    if ndev >= 4:
        shapes += [(2, 2), (4, 1)]
    if ndev >= 8:
        shapes += [(4, 2), (8, 1)]

    results = {}
    for dp, tp in shapes:
        mesh = sh.make_mesh(dp, tp)
        B = 4 * dp
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        params = sh.shard_pytree(params, sh.filter_specs_for(params, sh.param_specs(cfg)), mesh)
        cache = impl.init(B, jnp.float32)
        cache = sh.shard_pytree(cache, sh.cache_specs(eng, cache), mesh)
        tok = jax.device_put(jnp.zeros((B, 1), jnp.int32),
                             NamedSharding(mesh, P("data", None)))

        @jax.jit
        def step(params, tok, cache, pos):
            logits, cache = llama.decode_step(cfg, params, tok, cache, impl, pos)
            return jnp.argmax(logits[:, 0], -1).astype(jnp.int32)[:, None], cache

        t, cache = step(params, tok, cache, jnp.int32(64))
        jax.block_until_ready(t)
        t0 = time.perf_counter()
        iters = 20
        for i in range(iters):
            t, cache = step(params, t, cache, jnp.int32(65 + i))
        jax.block_until_ready(t)
        dt = (time.perf_counter() - t0) / iters
        tps = B / dt
        results[(dp, tp)] = tps
        base = results[(1, 1)]
        print(f"dp={dp} tp={tp} devices={dp*tp}: {tps:9.1f} tok/s "
              f"({tps/base/(dp*tp)*100:5.1f}% per-device efficiency vs 1x1)")


if __name__ == "__main__":
    main()
