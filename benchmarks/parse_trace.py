"""Parse a jax.profiler trace (vm.trace.json.gz) into a device-time summary.

Wall-clock benchmarking through the axon dispatch tunnel overstates kernel
times ~2x (25 ms round-trip, pipelining artifacts, and occasional program
elision for trivial graphs — see CLAUDE.md).  Device-true timing:

    with jax.profiler.trace("/tmp/mytrace"):
        for i in range(10): out = fn(inputs[i % k])
        jax.block_until_ready(out)

    python benchmarks/parse_trace.py /tmp/mytrace 10
"""

import collections
import glob
import gzip
import json
import sys


def summarize(trace_dir: str, iters: int = 1, top: int = 20):
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e.get("pid"), ""):
            name = e.get("name", "")
            if name.startswith("jit"):
                total += e["dur"]
                continue
            durs[name[:60]] += e["dur"]
            cnt[name[:60]] += 1
    print(f"total device time: {total/iters/1000:.3f} ms per iteration")
    for n, t in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {t/iters/1000:9.3f} ms/iter n={cnt[n]:6d} "
              f"({t/cnt[n]/1000:8.3f} ms/call)  {n}")


if __name__ == "__main__":
    d = sys.argv[1]
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    summarize(d, it)
