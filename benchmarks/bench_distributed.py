"""Timed 2-process distributed evidence (DIST_r05-style artifact).

VERDICT r3 item 8 + r4 missing #4: per-step wall times for the 2-OS-process
sharded decode, process-failure surfaces, and failure RECOVERY.  Four legs:

  1. timed: 2 processes x 4 virtual CPU devices, dp4 x tp2 mesh, q8q4
     compressed program — N decode steps each blocked+wall-timed per process;
     checksums must agree across processes (SPMD parity while timing).
  2. coordinator loss: a worker pointed at a dead coordinator address must
     fail with a CLEAN deadline error within --init-timeout (no hang).
  3. peer death: process 1 exits abruptly (os._exit, no shutdown handshake)
     mid-run; process 0 detects it at the next health barrier and errors
     cleanly instead of hanging inside a collective.
  4. recovery: the same failure with per-step request-state snapshots;
     the survivor restarts as a SMALLER mesh (dp2 x tp2), re-admits the
     in-flight requests from the snapshot (prefill + checked token replay),
     finishes the generation, and the result is asserted TOKEN-EXACT
     against an uninterrupted reference run.

Writes the combined artifact to --out (default DIST_r05.json at repo root).

Run: python benchmarks/bench_distributed.py [--steps 48] [--out DIST_r05.json]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    return env


def _spawn(i, port, outs, extra):
    return subprocess.Popen(
        [sys.executable, "-m", "mustafar_tpu.parallel.distributed",
         "--coordinator", f"localhost:{port}",
         "--num-processes", "2", "--process-id", str(i),
         "--out", str(outs[i])] + extra,
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def leg_timed(steps, program, tmp):
    port = _free_port()
    outs = [f"{tmp}/timed{i}.json" for i in range(2)]
    procs = [_spawn(i, port, outs,
                    ["--program", program, "--steps", str(steps)])
             for i in range(2)]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}:\n{logs[i][-2000:]}"
    rs = [json.load(open(o)) for o in outs]
    assert rs[0]["decode_checksum"] == rs[1]["decode_checksum"], \
        (rs[0]["decode_checksum"], rs[1]["decode_checksum"])
    assert rs[0]["last_tokens"] == rs[1]["last_tokens"]
    return {
        "program": program, "mesh": "dp4 x tp2 over 2 procs x 4 cpu devs",
        "steps": rs[0]["steps_done"],
        "checksums_match": True,
        "prefill_s_incl_compile": [r["prefill_s_incl_compile"] for r in rs],
        "per_process_step_ms": [
            {k: r["step_ms"][k] for k in ("mean", "p50", "p95")} for r in rs],
        "step_ms_p0_first8": rs[0]["step_ms"]["all"][:8],
    }


def leg_coordinator_loss(tmp):
    """A worker pointed at a dead coordinator must fail FAST and LOUD.

    jax's C++ coordination client LOG(FATAL)s on registration deadline
    (absl DEADLINE_EXCEEDED) — a process abort with a diagnostic, not a
    catchable Python exception.  The evidence asserted here: nonzero exit
    within ~init-timeout and the DEADLINE_EXCEEDED diagnostic in the log
    (i.e. deterministic detection, no hang)."""
    port = _free_port()          # nothing listens here
    out = f"{tmp}/probe.json"
    t0 = time.perf_counter()
    p = _spawn(1, port, {1: out}, ["--probe-init", "--init-timeout", "8"])
    log = p.communicate(timeout=120)[0].decode()
    dt = time.perf_counter() - t0
    assert p.returncode != 0 and "DEADLINE_EXCEEDED" in log, \
        (p.returncode, log[-1000:])
    return {"coordinator_reachable": False, "detected_in_s": round(dt, 1),
            "surface": "process abort with DEADLINE_EXCEEDED diagnostic "
                       "(jax C++ coordination client LOG(FATAL)s; no hang)",
            "exit_code": p.returncode}


def leg_peer_death(tmp, program):
    """Process 1 os._exit(17)s mid-run; process 0 must DETECT, not hang.

    Two valid surfaces, whichever fires first:
      * the per-step health barrier raises DEADLINE_EXCEEDED in Python
        (survivor writes its JSON and exits 0), or
      * jax's coordination service error-polling declares task 1 unhealthy
        and terminates the survivor with a diagnostic (LOG(FATAL) — the
        fail-fast whole-job semantics real TPU pods run with, where
        restart-the-world + checkpoint resume is the recovery model).
    """
    port = _free_port()
    outs = [f"{tmp}/die{i}.json" for i in range(2)]
    procs = [_spawn(i, port, outs,
                    ["--program", program, "--steps", "24",
                     "--die-after", "6"])
             for i in range(2)]
    t0 = time.perf_counter()
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    dt = time.perf_counter() - t0
    assert procs[1].returncode == 17, (procs[1].returncode, logs[1][-800:])
    res = {"steps_before_death": 6, "drill_wall_s": round(dt, 1)}
    if procs[0].returncode == 0:
        r0 = json.load(open(outs[0]))
        assert r0.get("peer_loss_detected"), r0
        res.update(surface="health barrier (survivor caught "
                           f"{r0['error_type']}, exited cleanly)",
                   survivor_steps_done=r0["steps_done"],
                   error_head=r0["error"][:160])
    else:
        assert "unhealthy" in logs[0], logs[0][-2000:]
        res.update(surface="coordination-service error polling terminated "
                           "the survivor with an 'unhealthy task' diagnostic "
                           "(jax fail-fast job semantics)",
                   survivor_exit_code=procs[0].returncode,
                   error_head=[ln for ln in logs[0].splitlines()
                               if "unhealthy" in ln][0][:200])
    return res


def leg_recovery(tmp, program, steps=24, die_after=6):
    """Failure RECOVERY drill (VERDICT r4 missing #4): persist request
    state, lose a process mid-run, restart the survivor as a smaller mesh,
    re-admit the in-flight requests (prefill + checked replay), and finish
    the generation.  Done-criterion: the recovered streams are TOKEN-EXACT
    against an uninterrupted reference run.
    """
    # reference: uninterrupted 1-process run on the recovery mesh (dp2 x tp2)
    port = _free_port()
    ref_out = f"{tmp}/ref.json"
    p = subprocess.Popen(
        [sys.executable, "-m", "mustafar_tpu.parallel.distributed",
         "--coordinator", f"localhost:{port}", "--num-processes", "1",
         "--process-id", "0", "--dp", "2", "--tp", "2",
         "--program", program, "--steps", str(steps), "--out", ref_out],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    log = p.communicate(timeout=900)[0].decode()
    assert p.returncode == 0, log[-2000:]
    ref_stream = json.load(open(ref_out))["stream"]

    # failure phase: 2 processes, snapshots on process 0, process 1 dies
    port = _free_port()
    outs = [f"{tmp}/rec{i}.json" for i in range(2)]
    snap = f"{tmp}/snapshot.json"
    t0 = time.perf_counter()
    procs = [_spawn(i, port, outs,
                    ["--program", program, "--steps", str(steps),
                     "--die-after", str(die_after), "--snapshot", snap])
             for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    t_fail = time.perf_counter() - t0
    assert procs[1].returncode == 17, (procs[1].returncode, logs[1][-800:])
    sd = json.load(open(snap))
    assert sd["steps_done"] >= die_after, sd["steps_done"]

    # recovery phase: restart-the-world survivor = ONE process on the
    # smaller dp2 x tp2 mesh, re-admitting from the snapshot
    rec_out = f"{tmp}/recovered.json"
    t0 = time.perf_counter()
    p = subprocess.Popen(
        [sys.executable, "-m", "mustafar_tpu.parallel.distributed",
         "--recover-from", snap, "--dp", "2", "--tp", "2",
         "--total-steps", str(steps), "--out", rec_out],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    log = p.communicate(timeout=900)[0].decode()
    t_rec = time.perf_counter() - t0
    assert p.returncode == 0, log[-2000:]
    rec = json.load(open(rec_out))
    assert rec["stream"] == ref_stream, \
        ("recovered stream != uninterrupted reference",
         rec["stream"][-2:], ref_stream[-2:])
    return {
        "program": program, "steps": steps, "died_at_step": die_after,
        "snapshot_steps_recovered": sd["steps_done"],
        "replay_steps_checked": rec["replay_steps_checked"],
        "failure_phase_wall_s": round(t_fail, 1),
        "recovery_wall_s_incl_compile": round(t_rec, 1),
        "recovery_breakdown_s": {
            "prefill_incl_compile": rec["prefill_s_incl_compile"],
            "replay": rec["replay_s"],
            "continuation": rec["continuation_s"]},
        "mesh_before": "dp4 x tp2 (2 procs x 4 devs)",
        "mesh_after": "dp2 x tp2 (survivor, 4 devs)",
        "streams_token_exact_vs_uninterrupted": True,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--program", default="q8q4")
    ap.add_argument("--out", default="DIST_r05.json")
    args = ap.parse_args()

    import tempfile
    tmp = tempfile.mkdtemp(prefix="dist_bench_")
    result = {"metric": "distributed_2proc",
              "legs": {}}
    print("leg 1: timed 2-process decode ...", flush=True)
    result["legs"]["timed"] = leg_timed(args.steps, args.program, tmp)
    print(json.dumps(result["legs"]["timed"], indent=2), flush=True)
    print("leg 2: coordinator loss ...", flush=True)
    result["legs"]["coordinator_loss"] = leg_coordinator_loss(tmp)
    print(json.dumps(result["legs"]["coordinator_loss"]), flush=True)
    print("leg 3: peer death mid-run ...", flush=True)
    result["legs"]["peer_death"] = leg_peer_death(tmp, args.program)
    print(json.dumps(result["legs"]["peer_death"]), flush=True)
    print("leg 4: failure recovery (snapshot -> smaller mesh -> re-admit) ...",
          flush=True)
    result["legs"]["recovery"] = leg_recovery(tmp, args.program)
    print(json.dumps(result["legs"]["recovery"], indent=2), flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"metric": "distributed_2proc", "ok": True,
                      "out": args.out}))


if __name__ == "__main__":
    main()
