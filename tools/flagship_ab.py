"""Flagship layout A/B at bench scale (VERDICT r2 #3 / what's-wrong #2):
same protocol as bench.py (one untimed warmup, best of N timed warm trials)
over three layouts of the SAME sf0.1-sized pages table:

  plain      — parquet, no bucketing (the r1 protocol)
  bucket128  — url-bucketed, fixed 4×cpus buckets (the r2 protocol)
  bucketAuto — url-bucketed, input-scaled bucket count (the r3 protocol)

Writes BENCH/flagship_ab_sf01.json so the r1→r2 flagship-wall delta is
attributed by a committed artifact rather than a hypothesis.

Usage: python tools/flagship_ab.py [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = 0.1
    n_pages = max(20_000, int(1_000_000 * sf))

    from copernicusdata_jl_spark.flagship import (
        build_pages,
        run_flagship,
        write_pages_bucketed,
    )
    from copernicusdata_jl_spark.session import get_spark

    spark = get_spark(app_name="flagship-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")

    auto = cpus * max(1, min(4, n_pages // (3000 * cpus)))
    layouts: dict[str, int | None] = {"plain": None, "bucket128": 4 * cpus, f"bucket{auto}_auto": auto}

    pages = build_pages(spark, n_pages, cpus * 2)
    plain_path = "/tmp/ab_pages_plain.parquet"
    shutil.rmtree(plain_path, ignore_errors=True)
    pages.write.parquet(plain_path)

    results: dict[str, dict] = {}
    for name, buckets in layouts.items():
        if buckets is None:
            src = plain_path
        else:
            table = f"ab_pages_{buckets}"
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            shutil.rmtree(os.path.join(wh, table), ignore_errors=True)
            write_pages_bucketed(spark.read.parquet(plain_path), table=table, buckets=buckets)
            src = f"table:{table}"
        run_flagship(spark, src)  # untimed warmup
        walls = []
        for _ in range(trials):
            t0 = time.perf_counter()
            m = run_flagship(spark, src)
            walls.append(m["wall_sec"])
            assert time.perf_counter() - t0 >= m["wall_sec"]
        results[name] = {
            "buckets": buckets,
            "walls": walls,
            "best": min(walls),
            "docs_per_sec_best": round(n_pages * 1.05 / min(walls), 1),
        }
        print(name, results[name], flush=True)

    out = {
        "protocol": f"warmup + best-of-{trials} warm trials, local[{cpus}], "
        f"{n_pages} pages (+5% dup rows), aggregate dedup",
        "results": results,
    }
    with open("BENCH/flagship_ab_sf01.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    for buckets in layouts.values():
        if buckets is not None:
            spark.sql(f"DROP TABLE IF EXISTS ab_pages_{buckets}")
    shutil.rmtree(plain_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
