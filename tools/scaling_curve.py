"""Scaling CURVE evidence: the flagship job at every power-of-two cluster
size 2..32, each emulated faithfully by pinning the whole process tree
(JVM + python workers) to exactly N cores (`sched_setaffinity`, inherited
by children) — `local[N]` alone caps task slots but lets GC/JIT threads
spill onto idle host cores, over-serving small configs.

One warm measurement per config (fresh JVM, un-timed warmup, 3 timed
passes, best wall), largest config first: the wide configs are the
bandwidth-hungry, throttle-sensitive ones, so they get the freshest burst
credits; a 2–4 core run is insensitive to the drained state. Output: one JSON line with
docs/sec per N and per-step efficiencies, for BENCH/BASELINE.md.

Usage: python tools/scaling_curve.py [n_pages] [cooldown_sec] [sizes...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import BUCKETS, GEN_SNIPPET, RUN_SNIPPET, _run  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cooldown = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    sizes = [int(a) for a in sys.argv[3:]] or [32, 16, 8, 4, 2]

    wh = os.path.join(tempfile.gettempdir(), f"scaling_pages_bucketed_{n}_b{BUCKETS}")
    location = os.path.join(wh, "scaling_pages")
    if not os.path.isdir(location):
        gen = subprocess.run(
            [sys.executable, "-c", GEN_SNIPPET.format(repo=REPO, n=n, wh=wh, buckets=BUCKETS)],
            capture_output=True, text=True, timeout=1800,
        )
        if gen.returncode != 0:
            sys.stderr.write(gen.stderr[-2000:])
            sys.exit(1)

    results: dict[int, dict] = {}
    for i, cpus in enumerate(sizes):
        if i:
            time.sleep(cooldown)
        m = _run(RUN_SNIPPET.format(repo=REPO, cpus=cpus, location=location, buckets=BUCKETS))
        if m is not None:
            results[cpus] = m
            sys.stderr.write(f"local[{cpus}]: walls {m['walls_trial']} cpu_sec {m['cpu_sec_trial']}\n")

    ordered = sorted(results)
    curve = {
        c: {
            "wall_sec": results[c]["wall_sec"],
            "docs_per_sec": results[c]["docs_per_sec"],
            "cpu_sec": results[c]["cpu_sec"],
            "saturation": round(results[c]["cpu_sec"] / (results[c]["wall_sec"] * c), 2),
        }
        for c in ordered
    }
    # efficiency of each 2x step and vs the smallest config
    base = ordered[0]
    for c in ordered:
        curve[c]["speedup_vs_min"] = round(
            results[c]["docs_per_sec"] / results[base]["docs_per_sec"], 2
        )
        curve[c]["eff_vs_min"] = round(
            results[c]["docs_per_sec"] / results[base]["docs_per_sec"] / (c / base), 3
        )
    print(json.dumps({
        "metric": "scaling-curve",
        "n_pages": n,
        "protocol": "pinned-affinity cluster emulation; fresh JVM; warmup+3 passes, best wall; largest config first (most credits for the small tail)",
        "curve": curve,
    }))


if __name__ == "__main__":
    main()
