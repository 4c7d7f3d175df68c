"""bench.py smoke tests (VERDICT r4 weak #1).

Round 4's driver bench run was killed by `timeout` before bench.py printed
anything, losing the round's TPU number.  These tests pin the two defenses:
(a) on CPU, the orchestrator produces at least one parseable headline JSON
line well inside a timeout, and (b) the headline line is emitted BEFORE the
detail legs run, so a mid-run kill can no longer erase the flagship result.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _parse_headlines(stdout: str):
    out = []
    for line in stdout.splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            assert d["metric"] == "full8b_w8_sparse_decode_throughput"
            out.append(d)
    return out


def test_bench_cpu_emits_headline_json():
    env = dict(os.environ, MUSTAFAR_BENCH_CPU="1",
               MUSTAFAR_BENCH_BUDGET_S="540")
    proc = subprocess.run(
        [sys.executable, BENCH, "--batch", "2", "--prompt", "16",
         "--gen", "4"],
        capture_output=True, text=True, timeout=600, env=env)
    heads = _parse_headlines(proc.stdout)
    assert heads, f"no headline JSON line:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    assert heads[0]["value"] > 0, heads[0]
    assert heads[0]["unit"] == "tok/s"
    # the early emission must carry the full flagship result already
    assert heads[0]["detail"]["dense_tok_s"] > 0


def test_bench_budget_exhaustion_still_prints_line():
    """With a budget too small for any leg, bench.py must still print a
    headline line (value 0) rather than dying silently."""
    env = dict(os.environ, MUSTAFAR_BENCH_CPU="1",
               MUSTAFAR_BENCH_BUDGET_S="10")
    proc = subprocess.run(
        [sys.executable, BENCH, "--batch", "2", "--prompt", "16",
         "--gen", "4"],
        capture_output=True, text=True, timeout=120, env=env)
    heads = _parse_headlines(proc.stdout)
    assert heads, f"no headline line on budget exhaustion:\n{proc.stdout}"
    assert heads[0]["value"] == 0.0
    assert "skipped (budget exhausted)" in json.dumps(heads[0]["detail"])
