"""Multi-process (multi-host) runtime groundwork.

The reference is strictly single-GPU (SURVEY.md §2.6: no NCCL/MPI/torchrun
anywhere); multi-host serving is a north-star capability built fresh.  The
TPU-native shape of it: one SPMD program per process over a global
``jax.sharding.Mesh``, jax.distributed for the coordination plane, GSPMD
collectives over ICI/DCN.  On real pods each process owns its local chips;
here the same code paths are exercised hardware-independently with N virtual
CPU devices per process (xla_force_host_platform_device_count), which is how
the 2-process test runs in CI.

Run one process of a 2-process sharded decode step:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python -m mustafar_tpu.parallel.distributed \
        --coordinator localhost:9911 --num-processes 2 --process-id 0 \
        --out /tmp/dist0.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int,
               heartbeat_s: int = 100):
    """Join the jax.distributed coordination service (idempotent per process)."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               heartbeat_timeout_seconds=heartbeat_s)


def _step_program(program: str = "masked"):
    """The tiny sharded prefill+decode program shared by the multi-process
    driver and the single-process reference (tests compare the two).

    program = "masked" (prune-in-place accuracy path) or "q8q4" (the
    PRODUCTION serving path: compressed pools + quantized-dense codec +
    fused decode kernel, interpret mode off-TPU) — the latter is what a
    real >=2-host deployment runs, so parity is asserted on it too."""
    import jax
    import jax.numpy as jnp

    from mustafar_tpu.config import (CacheMode, EngineConfig, ModelConfig,
                                     PruneConfig, PruneMethod)
    from mustafar_tpu.cache import make_cache
    from mustafar_tpu.models import llama
    from mustafar_tpu.models.llama import init_params

    if program == "masked":
        cfg = ModelConfig(name="dist-step", vocab_size=256, hidden_size=128,
                          intermediate_size=256, num_layers=2, num_heads=4,
                          num_kv_heads=2, head_dim=32,
                          max_position_embeddings=512)
        eng = EngineConfig(model=cfg, cache_mode=CacheMode.MASKED,
                           prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                             k_sparsity=0.5, v_sparsity=0.5),
                           max_seq_len=256)
        impl = make_cache(eng)
        P_len = 64
    else:
        assert program == "q8q4", program
        from mustafar_tpu.cache.compressed import CompressedKVCache
        cfg = ModelConfig(name="dist-q8q4", vocab_size=256, hidden_size=256,
                          intermediate_size=512, num_layers=2, num_heads=4,
                          num_kv_heads=2, head_dim=128,
                          max_position_embeddings=2048)
        eng = EngineConfig(model=cfg, cache_mode=CacheMode.COMPRESSED,
                           prune=PruneConfig(method=PruneMethod.KT_MAG_VT_MAG,
                                             k_sparsity=0.5, v_sparsity=0.5),
                           max_seq_len=1056, prefill_bucket=512,
                           chunk_size=256, codec="q8q4")
        impl = CompressedKVCache(eng, use_pallas=True)
        P_len = 400           # packs one compressed chunk during prefill
    B = 8
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tokens = np.random.RandomState(0).randint(
        0, 256, (B, P_len)).astype(np.int32)
    cache = impl.init(B, jnp.float32)

    def fn(params, tokens, cache):
        logits, cache = llama.prefill(cfg, params, tokens, cache, impl,
                                      jnp.int32(P_len))
        tok = jnp.argmax(logits[:, P_len - 1], -1).astype(jnp.int32)[:, None]
        logits2, cache = llama.decode_step(cfg, params, tok, cache, impl,
                                           jnp.int32(P_len))
        # replicated scalars: identical on every process iff the sharded
        # computation is correct end to end
        return (jnp.sum(jnp.abs(logits[:, P_len - 1])),
                jnp.sum(jnp.abs(logits2)), tok[:, 0])

    return cfg, eng, impl, params, tokens, cache, fn


def _shard_inputs(mesh, cfg, eng, impl, params, tokens_np, cache):
    """Place params/cache/tokens onto the global mesh per the sharding plan."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mustafar_tpu.parallel import sharding as sh

    if hasattr(impl, "mesh"):
        impl.mesh = mesh

    def put(np_arr, spec):
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(np_arr.shape, s,
                                            lambda idx: np_arr[idx])

    pspecs = sh.filter_specs_for(params, sh.param_specs(cfg))
    params = jax.tree.map(lambda x, sp: put(np.asarray(x), sp), params, pspecs,
                          is_leaf=lambda x: isinstance(x, P))
    cspecs = sh.cache_specs(eng, cache)
    cache = jax.tree.map(lambda x, sp: put(np.asarray(x), sp), cache, cspecs,
                         is_leaf=lambda x: isinstance(x, P))
    tokens = put(tokens_np, P("data", None))
    return params, tokens, cache


def run_sharded_step(dp: int, tp: int, program: str = "masked"):
    """Run the sharded step on the GLOBAL mesh (works single- or
    multi-process).  Returns (checksum_prefill, checksum_decode, tokens)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mustafar_tpu.parallel import sharding as sh

    cfg, eng, impl, params, tokens_np, cache, fn = _step_program(program)
    mesh = sh.make_mesh(dp, tp)
    params, tokens, cache = _shard_inputs(mesh, cfg, eng, impl, params,
                                          tokens_np, cache)

    # replicate all outputs so every process can fetch them (the token vector
    # is data-sharded inside the program; an out_sharding of P() all-gathers)
    rep = NamedSharding(mesh, P())
    s1, s2, tok = jax.jit(fn, out_shardings=(rep, rep, rep))(
        params, tokens, cache)
    return float(s1), float(s2), np.asarray(jax.device_get(tok))


def _barrier(name: str, timeout_ms: int):
    """Cross-process health barrier via the coordination service.

    Raises (DEADLINE_EXCEEDED / unhealthy-task error) if a peer is gone —
    the clean failure surface: a dead process is detected BEFORE the next
    collective is entered, instead of hanging inside it."""
    from jax._src import distributed as jdist

    client = jdist.global_state.client
    assert client is not None, "jax.distributed not initialized"
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def _write_snapshot(path: str, payload: dict):
    """Atomic request-state snapshot (the persistence half of recovery)."""
    import os
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def run_timed_decode(dp: int, tp: int, program: str = "q8q4",
                     steps: int = 32, die_after: int | None = None,
                     process_id: int = 0, barrier_ms: int = 15000,
                     snapshot_path: str | None = None):
    """Timed multi-step sharded decode (the DIST_r04 measurement).

    Prefills once, then runs ``steps`` single-token decode steps on the
    global mesh, blocking and wall-timing each.  When ``die_after`` is set,
    every step is preceded by a health barrier and process 1 exits abruptly
    after that many steps — the surviving process must surface a CLEAN error
    (barrier deadline), not a hang inside a collective.

    Returns dict with per-step ms, checksums, and (in failure mode) how the
    peer loss surfaced.
    """
    import time

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mustafar_tpu.models import llama
    from mustafar_tpu.parallel import sharding as sh

    cfg, eng, impl, params, tokens_np, cache, _ = _step_program(program)
    mesh = sh.make_mesh(dp, tp)
    params, tokens, cache = _shard_inputs(mesh, cfg, eng, impl, params,
                                          tokens_np, cache)
    P_len = tokens_np.shape[1]
    rep = NamedSharding(mesh, P())

    @jax.jit
    def prefill(params, tokens, cache):
        logits, cache = llama.prefill(cfg, params, tokens, cache, impl,
                                      jnp.int32(P_len))
        tok = jnp.argmax(logits[:, P_len - 1], -1).astype(jnp.int32)[:, None]
        return jax.lax.with_sharding_constraint(tok, rep), cache

    @jax.jit
    def dec(params, tok, cache, pos):
        logits, cache = llama.decode_step(cfg, params, tok, cache, impl, pos)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        s = jnp.sum(jnp.abs(logits.astype(jnp.float32)))
        return (jax.lax.with_sharding_constraint(tok, rep), cache,
                jax.lax.with_sharding_constraint(s, rep))

    t0 = time.perf_counter()
    tok, cache = jax.block_until_ready(prefill(params, tokens, cache))
    prefill_s = time.perf_counter() - t0

    failure_mode = die_after is not None
    step_ms, csum = [], 0.0
    stream = [np.asarray(jax.device_get(tok))[:, 0].tolist()]  # prefill token
    result = {"program": program, "dp": dp, "tp": tp, "steps_requested": steps,
              "prefill_s_incl_compile": round(prefill_s, 3)}

    def snap(i):
        # request-state persistence: prompt identity is implicit (the
        # deterministic _step_program seed); a real serving engine persists
        # the prompt ids here too.  The KV cache is NOT persisted — recovery
        # re-admits by prefill + replay (run_recovery), the recompute model
        # preemption-tolerant engines use.
        if snapshot_path and process_id == 0:
            _write_snapshot(snapshot_path,
                            {"program": program, "steps_done": i,
                             "steps_requested": steps, "stream": stream})

    snap(0)
    try:
        for i in range(steps):
            if failure_mode:
                _barrier(f"dist-step-{i}", barrier_ms)
                if process_id == 1 and i == die_after:
                    import os
                    os._exit(17)          # abrupt death, no shutdown handshake
            t0 = time.perf_counter()
            tok, cache, s = jax.block_until_ready(
                dec(params, tok, cache, jnp.int32(P_len + i)))
            step_ms.append((time.perf_counter() - t0) * 1e3)
            csum = float(s)
            stream.append(np.asarray(jax.device_get(tok))[:, 0].tolist())
            snap(i + 1)
    except Exception as e:                                # noqa: BLE001
        result["peer_loss_detected"] = True
        result["error_type"] = type(e).__name__
        result["error"] = str(e)[:400]
    result["stream"] = stream
    arr = np.asarray(step_ms[1:] or step_ms)             # drop compile step
    result.update(
        steps_done=len(step_ms), decode_checksum=csum,
        last_tokens=np.asarray(jax.device_get(tok))[:, 0].tolist(),
        step_ms={"mean": round(float(arr.mean()), 3) if len(arr) else None,
                 "p50": round(float(np.percentile(arr, 50)), 3) if len(arr) else None,
                 "p95": round(float(np.percentile(arr, 95)), 3) if len(arr) else None,
                 "all": [round(float(x), 3) for x in step_ms]})
    return result


def run_recovery(snapshot_path: str, dp: int, tp: int,
                 total_steps: int | None = None):
    """Resume serving from a request-state snapshot on a (smaller) mesh.

    The TPU-pod failure model is fail-fast: when a process dies, the job
    terminates (see leg_peer_death) and the world restarts with whatever
    hosts remain.  The KV cache died with the old world, so recovery is
    RE-ADMISSION: rebuild the engine on the new mesh, prefill the persisted
    prompt, replay the already-emitted tokens (teacher-forced decode steps
    — each replayed step's own prediction is asserted against the snapshot,
    which is the recovered-request checksum), then continue decoding to the
    original target.  Greedy decoding makes the result bit-identical to an
    uninterrupted run; the caller verifies exactly that.

    Returns the completed stream + timing breakdown (init/compile+prefill /
    replay / continuation).
    """
    import time

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mustafar_tpu.models import llama
    from mustafar_tpu.parallel import sharding as sh

    t_init0 = time.perf_counter()
    with open(snapshot_path) as f:
        snap = json.load(f)
    program = snap["program"]
    done = snap["steps_done"]
    stream = [list(s) for s in snap["stream"]]
    assert len(stream) == done + 1, (len(stream), done)
    steps = total_steps if total_steps is not None else snap["steps_requested"]

    cfg, eng, impl, params, tokens_np, cache, _ = _step_program(program)
    mesh = sh.make_mesh(dp, tp)
    params, tokens, cache = _shard_inputs(mesh, cfg, eng, impl, params,
                                          tokens_np, cache)
    P_len = tokens_np.shape[1]
    rep = NamedSharding(mesh, P())

    @jax.jit
    def prefill(params, tokens, cache):
        logits, cache = llama.prefill(cfg, params, tokens, cache, impl,
                                      jnp.int32(P_len))
        tok = jnp.argmax(logits[:, P_len - 1], -1).astype(jnp.int32)[:, None]
        return jax.lax.with_sharding_constraint(tok, rep), cache

    @jax.jit
    def dec(params, tok, cache, pos):
        logits, cache = llama.decode_step(cfg, params, tok, cache, impl, pos)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        return jax.lax.with_sharding_constraint(tok, rep), cache

    tok, cache = jax.block_until_ready(prefill(params, tokens, cache))
    got0 = np.asarray(jax.device_get(tok))[:, 0].tolist()
    assert got0 == stream[0], ("prefill token mismatch on recovery",
                               got0, stream[0])
    t_prefill = time.perf_counter() - t_init0

    # replay the emitted tokens, teacher-forcing from the snapshot and
    # checking each replayed step reproduces the recorded next token
    t0 = time.perf_counter()
    replay_checked = 0
    for i in range(done):
        forced = jnp.asarray(np.asarray(stream[i], np.int32)[:, None])
        forced = jax.device_put(forced, rep)
        tok, cache = jax.block_until_ready(
            dec(params, forced, cache, jnp.int32(P_len + i)))
        got = np.asarray(jax.device_get(tok))[:, 0].tolist()
        assert got == stream[i + 1], ("replay divergence at step", i,
                                      got, stream[i + 1])
        replay_checked += 1
    t_replay = time.perf_counter() - t0

    # continue to the original target
    t0 = time.perf_counter()
    for i in range(done, steps):
        tok, cache = jax.block_until_ready(
            dec(params, tok, cache, jnp.int32(P_len + i)))
        stream.append(np.asarray(jax.device_get(tok))[:, 0].tolist())
    t_cont = time.perf_counter() - t0

    return {"program": program, "recovered_from_step": done,
            "steps_total": steps, "dp": dp, "tp": tp,
            "replay_steps_checked": replay_checked,
            "prefill_s_incl_compile": round(t_prefill, 3),
            "replay_s": round(t_replay, 3),
            "continuation_s": round(t_cont, 3),
            "stream": stream}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--dp", type=int, default=4)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--program", default="masked",
                    choices=["masked", "q8q4"])
    ap.add_argument("--steps", type=int, default=0,
                    help="timed decode steps (0 = single checksum step)")
    ap.add_argument("--die-after", type=int, default=None,
                    help="failure drill: process 1 exits abruptly after N "
                         "steps; survivors must error cleanly")
    ap.add_argument("--init-timeout", type=int, default=300,
                    help="seconds to wait for the coordinator at startup")
    ap.add_argument("--probe-init", action="store_true",
                    help="only probe coordinator reachability; a dead "
                         "coordinator surfaces as a fast process abort with "
                         "a DEADLINE_EXCEEDED diagnostic (jax's C++ client "
                         "LOG(FATAL)s — not a catchable exception), never "
                         "a hang")
    ap.add_argument("--snapshot", default=None,
                    help="persist request state (emitted token streams) to "
                         "this path every step (process 0)")
    ap.add_argument("--recover-from", default=None,
                    help="LOCAL recovery mode: resume from a snapshot on "
                         "this process's devices alone (no coordinator) — "
                         "the restart-the-world survivor")
    ap.add_argument("--total-steps", type=int, default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")   # axon ignores JAX_PLATFORMS
    if args.recover_from:
        res = run_recovery(args.recover_from, args.dp, args.tp,
                           total_steps=args.total_steps)
        with open(args.out, "w") as f:
            json.dump(res, f)
        print(f"recovered from step {res['recovered_from_step']}: "
              f"replayed {res['replay_steps_checked']}, total "
              f"{res['steps_total']} steps", flush=True)
        return
    assert args.coordinator, "--coordinator required outside recovery mode"
    if args.probe_init:
        # coordinator-loss surface: initialization against a dead address
        # must fail with a clean deadline error within --init-timeout
        try:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
                initialization_timeout=args.init_timeout)
            res = {"coordinator_reachable": True}
        except Exception as e:                            # noqa: BLE001
            res = {"coordinator_reachable": False,
                   "error_type": type(e).__name__, "error": str(e)[:300]}
        with open(args.out, "w") as f:
            json.dump(res, f)
        print(json.dumps(res), flush=True)
        return
    # failure drills use a tight heartbeat so peer death surfaces in ~10 s
    # instead of the 100 s default (production keeps the default)
    initialize(args.coordinator, args.num_processes, args.process_id,
               heartbeat_s=10 if args.die_after is not None else 100)
    assert jax.process_count() == args.num_processes

    if args.steps:
        res = run_timed_decode(args.dp, args.tp, args.program,
                               steps=args.steps, die_after=args.die_after,
                               process_id=args.process_id,
                               snapshot_path=args.snapshot)
        res.update(process=args.process_id,
                   n_processes=jax.process_count(),
                   n_devices=len(jax.devices()),
                   n_local=len(jax.local_devices()))
        with open(args.out, "w") as f:
            json.dump(res, f)
        print(f"process {args.process_id}: {res['steps_done']} steps, "
              f"mean {res['step_ms']['mean']} ms"
              + (f", peer loss: {res.get('error_type')}"
                 if res.get("peer_loss_detected") else ""), flush=True)
        return

    s1, s2, tok = run_sharded_step(args.dp, args.tp, args.program)
    with open(args.out, "w") as f:
        json.dump({"process": args.process_id,
                   "n_processes": jax.process_count(),
                   "n_devices": len(jax.devices()),
                   "n_local": len(jax.local_devices()),
                   "prefill_sum": s1, "decode_sum": s2,
                   "tokens": tok.tolist()}, f)
    print(f"process {args.process_id}: prefill_sum={s1:.6f} "
          f"decode_sum={s2:.6f}", flush=True)


if __name__ == "__main__":
    main()
