"""As-of (point-in-time) join.

For every left row, attach the most recent right row with the same key
and ``right.ts <= left.ts`` — snapshot/attribution semantics (latest
crawl of a url before a cutoff, last click before a purchase).  The
reference's closest shape is its time-window granule selection
(start/stop_time, reference test/resources/payload.toml:19-20); the
as-of join is that semantics made per-row.

Scale design (10^12 rows): the naive formulation — range join then
max() per left row — explodes to O(|L|·|R|) per key and is a known
scale-killer.  The distributed idiom used here is UNION + ONE WINDOW
PASS: tag both inputs, hash-partition by key, sort each partition once
by (ts, side, tiebreak), and carry the last non-null right payload
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
row frame.  Exactly one shuffle (by key), no join at all, linear work —
and the same plan Spark uses for sessionization.  Ties: a right row at
exactly left.ts is visible (<= semantics, side orders right before
left); among right rows sharing a timestamp the highest ``tiebreak``
wins (deterministic resume/golden outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join → every ``left`` row plus ``{prefix}{ts_col}`` and
    ``{prefix}{v}`` for each value column (NULL when no right row
    precedes it).  ``right`` must carry ``keys + [ts_col] + value_cols``
    (+ ``tiebreak_col``); ``left``'s other columns pass through."""
    lcols = [c for c in left.columns if c not in keys]
    tb = tiebreak_col if tiebreak_col is not None else ts_col

    r = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(tb).alias("_tb"),
        F.struct(F.col(ts_col).alias("_rts"), *[F.col(v) for v in value_cols]).alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != ts_col],
    )
    l = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c) for c in lcols if c != ts_col],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select(
        *keys,
        ts_col,
        *[c for c in lcols if c != ts_col],
        F.col(f"_m._rts").alias(f"{prefix}{ts_col}"),
        *[F.col(f"_m.{v}").alias(f"{prefix}{v}") for v in value_cols],
    )
