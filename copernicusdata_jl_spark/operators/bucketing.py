"""J1 at scale: bucketed storage → co-located sort-merge joins with NO
shuffle (SURVEY.md §7.5 "bucket both sides by cell_id").

At 10^12 rows the cell-ID equi-join's dominant cost is shuffling both
sides. Iceberg bucket partitioning (`bucket(N, cell_id)`) makes the join
key layout a storage property; Spark's equivalent primitive is
``bucketBy(N, key).sortBy(key)`` table writes: when both join sides are
bucketed on the join key with compatible bucket counts, Catalyst plans a
SortMergeJoin with ZERO Exchange — each task reads matching bucket files
from both tables. This module wraps the write + the plan assertion.

Verification matters as much as the write: ``has_exchange`` inspects the
physical plan, and tests assert the bucketed join plans without a shuffle
while the plain-parquet twin plans with one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucket-partitioned, bucket-sorted parquet table (the
    Iceberg `bucket(N, col)` layout analog)."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col).sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans as a
    shuffle-free SortMergeJoin. The merge hint keeps the planner from
    falling back to broadcast on small test tables; at production sizes
    SMJ is what it would pick anyway, and the bucketed layout removes both
    Exchanges."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), key, how)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan repartitions data (a shuffle Exchange —
    broadcast exchanges don't move the big side and don't count)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan
