"""Scaling-efficiency evidence (north rule: eff ≥ 0.8 from N to 4N
executors). Sandbox methodology per SURVEY.md §6: the identical flagship
job (copernicusdata_jl_spark/flagship.py) over the identical url-bucketed
pages table at local[8] vs local[32]; eff = (docs_per_sec_32 /
docs_per_sec_8) / 4.

The pages table uses the PRODUCTION layout (bucketed by url — the Iceberg
bucket-partition analog): dedup + extraction plan with zero Exchange, so
per-pass shuffle traffic is independent of parallelism and the 32-thread
memory-bandwidth pressure that round 1 measured is gone from the hot path.

Measurement protocol — this sandbox VM has TIME-VARYING CPU capacity
(burst-credit throttling: sustained load degrades all configs, idle
restores them; /proc steal stays ~0). Round-2 protocol hardening:

- each (config, trial) runs in a FRESH subprocess (own JVM), does one
  un-timed warmup pass, then times 3 passes;
- the two configs of a trial run BACK-TO-BACK (15 s apart) with the order
  alternating per trial, so each paired ratio sees near-identical host
  state; the idle cooldown sits BETWEEN trials;
- every timed pass records process-tree CPU-seconds (JVM + python workers,
  /proc jiffies). Three efficiency views are reported:
  * eff_paired    — per-trial (docs/s@4N ÷ docs/s@N)/4 from that trial's
                    back-to-back pair; median + each trial listed.
                    **This is THE gate metric** (ADVICE r2): pass ⇔
                    eff_paired_median ≥ 0.8, pre-declared, no fallback.
  * eff_best      — best wall per config across all trials (unthrottled
                    capacity); DIAGNOSTIC only.
  * eff_cpu_norm  — eff_paired × (cpu4N/cpuN): removes the host's
                    CPU-second inflation for identical work (row counts
                    are equal every pass). DIAGNOSTIC only — genuine
                    parallel overhead (GC, contention busy-time) also
                    inflates cpu_ratio, so this view may flatter and can
                    never flip FAIL→PASS on its own.

The cluster-size pair is configurable (the north rule asks for two
cluster sizes N and 4N, not a specific N): 8→32 exercises the full host
but collides with its 32-thread bandwidth throttling; 4→16 keeps both
configs inside the host's unthrottled regime and isolates the ENGINE's
scaling behavior. Both pairs are reported in BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [n_pages] [trials] [cooldown_sec] [N] [N4]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUCKETS = 256

RUN_SNIPPET = """
import json, os, sys, time
sys.path.insert(0, {repo!r})

# Emulate a cluster of {cpus} cores faithfully: pin this process (and every
# child it forks — JVM, python workers — which inherit the mask) to {cpus}
# physical CPUs. Without this, local[N] caps TASK slots at N but the JVM's
# GC/JIT/compiler threads and Arrow IPC spill onto the host's idle cores,
# over-serving the small config (measured core-saturation 1.06 at local[4])
# and understating true N->4N scaling.
os.sched_setaffinity(0, set(range({cpus})))

def tree_cpu_seconds():
    # sum utime+stime over this process and all descendants (JVM + python
    # workers), PLUS each process's cutime+cstime: a worker that dies
    # mid-pass is reaped by its parent and its jiffies migrate into the
    # parent's cutime/cstime — without those fields the tree walk
    # UNDERcounts a pass (measured: sporadic ~25% dips at local[4]).
    # cutime/cstime only include already-waited-on children, so live
    # descendants are never double-counted.
    hz = os.sysconf("SC_CLK_TCK")
    info = {{}}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{{pid}}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
            info[int(pid)] = (
                int(rest[1]),
                int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14]),
            )
        except Exception:
            continue
    kids = {{}}
    for pid, (ppid, _t) in info.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack = 0, [os.getpid()]
    while stack:
        p = stack.pop()
        if p in info:
            total += info[p][1]
            stack.extend(kids.get(p, []))
    return total / hz

from copernicusdata_jl_spark.session import get_spark
from copernicusdata_jl_spark.flagship import register_pages_bucketed, run_flagship
# 4 partitions per core: post-scan shuffles (tile agg, lineage) stay small;
# the dedup itself is exchange-free over the bucketed table
spark = get_spark(app_name="scaling-bench", master="local[{cpus}]", shuffle_partitions=4 * {cpus})
spark.sparkContext.setLogLevel("ERROR")
register_pages_bucketed(spark, {location!r}, table="scaling_pages", buckets={buckets})
src = "table:scaling_pages"
run_flagship(spark, src)          # warmup: codegen + python worker pool
runs = []
for _ in range(3):
    c0 = tree_cpu_seconds()
    m = run_flagship(spark, src)
    m["cpu_sec"] = round(tree_cpu_seconds() - c0, 1)
    runs.append(m)
best = min(runs, key=lambda r: r["wall_sec"])
best["cpus"] = {cpus}
best["walls_trial"] = [r["wall_sec"] for r in runs]
best["cpu_sec_trial"] = [r["cpu_sec"] for r in runs]
# median cpu across passes: the /proc tree walk occasionally UNDERcounts a
# pass (a python worker that dies mid-pass takes its accumulated jiffies
# with it), so per-pass cpu is noisy-low, never noisy-high — median is the
# robust estimate for identical work
best["cpu_sec_med"] = sorted(r["cpu_sec"] for r in runs)[len(runs) // 2]
print("METRICS " + json.dumps(best))
spark.sql("DROP TABLE IF EXISTS scaling_pages")  # external: metadata only
spark.stop()
"""

GEN_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
from copernicusdata_jl_spark.session import get_spark
from copernicusdata_jl_spark.flagship import build_pages, write_pages_bucketed
spark = get_spark(app_name="gen-pages", master="local[32]",
                  extra_conf={{"spark.sql.warehouse.dir": {wh!r}}})
spark.sparkContext.setLogLevel("ERROR")
write_pages_bucketed(build_pages(spark, {n}, 64, rich=True),
                     table="scaling_pages", buckets={buckets})
spark.stop()
"""


def _run(snippet: str, timeout: int = 1800) -> dict | None:
    out = subprocess.run(
        [sys.executable, "-c", snippet], capture_output=True, text=True, timeout=timeout
    )
    for line in out.stdout.splitlines():
        if line.startswith("METRICS "):
            return json.loads(line[len("METRICS "):])
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
    return None


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cooldown = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    nA = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    nB = int(sys.argv[5]) if len(sys.argv) > 5 else 4 * nA
    # cache the generated table across invocations (generation itself is a
    # 32-core burst that would otherwise drain credits right before trial 0)
    wh = os.path.join(tempfile.gettempdir(), f"scaling_pages_bucketed_{n}_b{BUCKETS}")
    location = os.path.join(wh, "scaling_pages")
    if not os.path.isdir(location):
        gen = subprocess.run(
            [sys.executable, "-c", GEN_SNIPPET.format(repo=REPO, n=n, wh=wh, buckets=BUCKETS)],
            capture_output=True, text=True, timeout=max(1800, n // 1500),
        )
        if gen.returncode != 0:
            sys.stderr.write(gen.stderr[-2000:])
            sys.exit(1)

    all_runs: dict[int, list[dict]] = {nA: [], nB: []}
    pairs: list[dict] = []
    for t in range(trials):
        order = (nA, nB) if t % 2 == 0 else (nB, nA)
        time.sleep(cooldown)  # idle BETWEEN trials; configs run back-to-back
        trial: dict[int, dict] = {}
        for j, cpus in enumerate(order):
            if j:
                time.sleep(15)
            # 4 timed+warmup passes; budget scales with input so an
            # 8M-page local[8] config doesn't hit the 30-min default
            m = _run(RUN_SNIPPET.format(
                repo=REPO, cpus=cpus, location=location, buckets=BUCKETS),
                timeout=max(1800, n // 1200))
            if m is not None:
                all_runs[cpus].append(m)
                trial[cpus] = m
                sys.stderr.write(
                    f"trial {t} local[{cpus}]: walls {m['walls_trial']} cpu_sec {m['cpu_sec_trial']}\n"
                )
        if nA in trial and nB in trial:
            e = (trial[nB]["docs_per_sec"] / trial[nA]["docs_per_sec"]) / (nB / nA)
            cpu_ratio = trial[nB].get("cpu_sec_med", trial[nB]["cpu_sec"]) / trial[nA].get(
                "cpu_sec_med", trial[nA]["cpu_sec"]
            )
            pairs.append({
                "trial": t, "order": f"{order[0]}->{order[1]}",
                "eff_paired": round(e, 3),
                "cpu_ratio_big_over_small": round(cpu_ratio, 3),
                "eff_cpu_norm": round(e * cpu_ratio, 3),
            })
    if not all_runs[nA] or not all_runs[nB]:
        sys.exit(1)

    best = {c: min(rs, key=lambda r: r["wall_sec"]) for c, rs in all_runs.items()}
    eff = round((best[nB]["docs_per_sec"] / best[nA]["docs_per_sec"]) / (nB / nA), 3)
    eff_paired_med = round(statistics.median(p["eff_paired"] for p in pairs), 3) if pairs else None
    eff_cpu_med = round(statistics.median(p["eff_cpu_norm"] for p in pairs), 3) if pairs else None
    walls = {c: [w for r in rs for w in r["walls_trial"]] for c, rs in all_runs.items()}
    cpus_all = {c: [w for r in rs for w in r["cpu_sec_trial"]] for c, rs in all_runs.items()}
    # core saturation in the best pass: cpu_sec / (wall * cores)
    sat = {c: round(best[c]["cpu_sec"] / (best[c]["wall_sec"] * c), 2) for c in (nA, nB)}
    result = {
        "metric": "scaling-efficiency",
        "n_pages": n,
        "layout": f"url-bucketed table ({BUCKETS} buckets), aggregate dedup (zero-exchange)",
        "protocol": "fresh JVM/measurement; warmup+3 timed passes; configs back-to-back per trial, order alternating; idle cooldown between trials",
        "configs": [nA, nB],
        "small": best[nA],
        "large": best[nB],
        "all_walls": walls,
        "all_cpu_sec": cpus_all,
        "core_saturation_best": sat,
        "pairs": pairs,
        "efficiency_paired_median": eff_paired_med,
        "efficiency_best_diagnostic": eff,
        "efficiency_cpu_normalized_median_diagnostic": eff_cpu_med,
        "target": 0.8,
        "gate_metric": "efficiency_paired_median",
        "pass": (eff_paired_med or 0.0) >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", f"scaling_latest_{nA}_{nB}.md" if (nA, nB) != (8, 32) else "scaling_latest.md"), "w") as f:
        pair_rows = "\n".join(
            f"| {p['trial']} | {p['order']} | {p['eff_paired']} | {p['cpu_ratio_big_over_small']} | {p['eff_cpu_norm']} |"
            for p in pairs
        )
        f.write(
            f"""# BENCH — scaling-efficiency evidence (north rule)

Job: flagship spatial-join + tiling pipeline over the PRODUCTION table
layout — {n:,} rich-HTML pages (~3 KB/page) bucketed by url into {BUCKETS}
buckets (Iceberg bucket-partition analog). Dedup + extraction plan with
ZERO Exchange (plan-asserted in tests/test_flagship.py): per-pass shuffle
volume is parallelism-independent.

Protocol: fresh JVM per measurement; un-timed warmup then 3 timed passes;
the two configs of a trial run back-to-back (15 s apart, order alternating
per trial) so each paired ratio sees near-identical host state; idle
cooldown between trials; process-tree CPU-seconds per pass.

| cluster size | best wall (s) | docs/sec | tiles/sec | cpu-sec (best) | core saturation | all walls (s) |
|---|---|---|---|---|---|---|
| local[{nA}]  (N)  | {best[nA]['wall_sec']} | {best[nA]['docs_per_sec']:,} | {best[nA]['tiles_per_sec']:,} | {best[nA]['cpu_sec']} | {sat[nA]} | {walls[nA]} |
| local[{nB}] (4N) | {best[nB]['wall_sec']} | {best[nB]['docs_per_sec']:,} | {best[nB]['tiles_per_sec']:,} | {best[nB]['cpu_sec']} | {sat[nB]} | {walls[nB]} |

**GATE — paired-trial median: {eff_paired_med}** (target ≥ 0.8; the single
pre-declared pass metric). Diagnostics: best-wall-per-config {eff},
CPU-normalized median {eff_cpu_med} (reported for host forensics only —
neither can flip FAIL→PASS).

Paired back-to-back trials (eff = (docs/s@4N ÷ docs/s@N)/4; cpu_ratio =
cpu-sec@4N ÷ cpu-sec@N for identical work — >1 means the host counted
bandwidth stalls as busy time at 32 threads; eff × cpu_ratio removes that
inflation, leaving pure thread-utilization scaling):

| trial | order | eff_paired | cpu_ratio 4N/N | eff_cpu_norm |
|---|---|---|---|---|
{pair_rows}

CPU-seconds at both configs: {cpus_all[nA]} (N) vs {cpus_all[nB]} (4N).
Row counts are identical across every run (same dedup output, same
{int(best[nB]['n_tile_assignments']):,} tile assignments over
{int(best[nB]['n_tiles'])} tiles, same {int(best[nB]['n_lineage_buckets'])}
lineage buckets) — parallelism changes the schedule, not the answer.
"""
        )


if __name__ == "__main__":
    main()
