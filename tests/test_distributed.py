"""Two-process jax.distributed test (SURVEY.md north star: multi-host).

Spawns two real OS processes, each with 4 virtual CPU devices, joined through
jax.distributed into one 8-device global mesh; both run the same sharded
prefill+decode SPMD program (parallel.distributed.run_sharded_step) and must
agree with each other AND with the single-process 8-device run.  This is the
hardware-independent groundwork for >= 2-host TPU serving — on a pod the same
code runs with real local chips instead of virtual CPU devices.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("program", ["masked", "q8q4"])
def test_two_process_sharded_step_parity(tmp_path, program):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = []
    outs = [tmp_path / f"dist{i}.json" for i in range(2)]
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mustafar_tpu.parallel.distributed",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--program", program,
             "--out", str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd="/root/repo"))
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"process {i} failed:\n{logs[i][-3000:]}"

    r0 = json.loads(outs[0].read_text())
    r1 = json.loads(outs[1].read_text())
    assert r0["n_processes"] == 2 and r0["n_devices"] == 8
    assert r0["n_local"] == 4
    # both processes of the SPMD program agree exactly
    assert r0["tokens"] == r1["tokens"]
    np.testing.assert_allclose(r0["prefill_sum"], r1["prefill_sum"], rtol=1e-6)
    np.testing.assert_allclose(r0["decode_sum"], r1["decode_sum"], rtol=1e-6)

    # and match the single-process 8-device run of the same program
    from mustafar_tpu.parallel.distributed import run_sharded_step
    assert len(jax.devices()) >= 8
    s1, s2, tok = run_sharded_step(dp=4, tp=2, program=program)
    np.testing.assert_allclose(r0["prefill_sum"], s1, rtol=2e-4)
    np.testing.assert_allclose(r0["decode_sum"], s2, rtol=2e-4)
    assert r0["tokens"] == tok.tolist()


def test_recovery_from_snapshot_token_exact(tmp_path):
    """Failure-recovery core (VERDICT r4 #4): a request-state snapshot from
    an interrupted run re-admits on a DIFFERENT (smaller) mesh via prefill +
    checked replay and completes to the exact tokens of an uninterrupted
    run.  Runs in one process: the reference run (dp2 x tp2, 24 steps)
    doubles as the snapshot source by truncating its stream to 6 steps."""
    from mustafar_tpu.parallel import distributed as dist

    ref = dist.run_timed_decode(2, 2, "q8q4", steps=24)
    assert len(ref["stream"]) == 25
    snap = tmp_path / "snapshot.json"
    snap.write_text(json.dumps({"program": "q8q4", "steps_done": 6,
                                "steps_requested": 24,
                                "stream": ref["stream"][:7]}))
    rec = dist.run_recovery(str(snap), dp=4, tp=2)   # recover on a WIDER mesh
    assert rec["replay_steps_checked"] == 6
    assert rec["stream"] == ref["stream"]
