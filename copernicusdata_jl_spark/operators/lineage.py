"""☆ Lineage + idempotent resume (SURVEY.md §2.10 O8, §2.3 J6).

Mirrors the reference payload's ``breakpoints`` block (reference
test/resources/payload.toml:5-9, parsed at src/EOTriggering.jl:11-16):
every run emits per-work-unit lineage rows ``(bucket, cell_min, cell_max,
row_count, checksum)`` to a checkpoint table; a re-run anti-joins pending
work against completed lineage and recomputes only what's missing.

The checksum is an order-insensitive BIT_XOR of row hashes — stable under
any partitioning/shuffle order, so resume verification works no matter how
AQE re-plans the job. Checkpoint storage: ``atomic=True`` (the default for
:func:`run_with_resume`) commits through :class:`..operators.snapshot.
SnapshotTable` — manifest-listed parquet with atomic create-if-absent
publishes, so a crashed run can never expose a torn checkpoint to the next
resume (Iceberg's guarantee, implemented locally; the jar-backed catalog
drops into the same seam). ``atomic=False`` is the plain append-only
parquet directory. Reads auto-detect the layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as _d
from .snapshot import SnapshotTable

LINEAGE_COLS = ["bucket", "cell_min", "cell_max", "row_count", "checksum"]


def lineage_rows(
    df: DataFrame,
    bucket_col: str = "bucket",
    cell_col: str = "cell_id",
    hash_cols: list[str] | None = None,
    portable: bool = False,
) -> DataFrame:
    """Aggregate per-bucket lineage: cell range + row count + order-
    insensitive checksum. Partial-aggregates map-side; the shuffle carries
    one row per bucket."""
    hash_cols = hash_cols or [c for c in df.columns if c != bucket_col]
    if portable:
        h = _d.h56_expr(F.concat_ws("|", *[F.col(c).cast("string") for c in hash_cols]), "lin")
    else:
        h = F.xxhash64(*hash_cols)
    return (
        df.withColumn("_h", h)
        .groupBy(F.col(bucket_col).alias("bucket"))
        .agg(
            F.min(cell_col).alias("cell_min"),
            F.max(cell_col).alias("cell_max"),
            F.count(F.lit(1)).alias("row_count"),
            F.expr("bit_xor(_h)").alias("checksum"),
        )
    )


def write_checkpoint(lineage: DataFrame, path: str, run_id: str, atomic: bool = False) -> None:
    """Append this run's lineage snapshot (run_id column added).
    ``atomic=True`` publishes through the SnapshotTable manifest protocol
    (readers see all of this run's rows or none of them)."""
    df = lineage.withColumn("run_id", F.lit(run_id))
    if atomic:
        if (
            os.path.isdir(path)
            and not os.path.isdir(os.path.join(path, "_manifests"))
            and any(f.endswith(".parquet") for f in os.listdir(path))
        ):
            # refusing beats silently shadowing: once _manifests exists the
            # auto-detecting reader serves ONLY manifest-listed files, so
            # committing a snapshot on top of plain appended parquet would
            # make every pre-existing lineage row invisible to resume
            raise ValueError(
                f"{path!r} holds a plain append-only checkpoint; pass "
                "atomic=False or migrate to a fresh path for snapshot commits"
            )
        SnapshotTable(path).commit(df, run_id)
    else:
        df.write.mode("append").parquet(path)


def read_checkpoint(spark: SparkSession, path: str) -> DataFrame | None:
    """Layout auto-detect: a ``_manifests/`` dir means snapshot-committed
    (read the latest manifest's files only — orphans from crashed runs are
    invisible); otherwise the plain parquet directory."""
    if os.path.isdir(os.path.join(path, "_manifests")):
        return SnapshotTable(path).read(spark)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def pending_buckets(work: DataFrame, checkpoint: DataFrame | None, bucket_col: str = "bucket") -> DataFrame:
    """J6 resume: anti-join work units against completed lineage buckets."""
    if checkpoint is None:
        return work
    done = checkpoint.select(F.col("bucket").alias(bucket_col)).distinct()
    return work.join(done, bucket_col, "left_anti")


def run_with_resume(
    df: DataFrame,
    bucket_col: str,
    checkpoint_path: str,
    run_id: str,
    cell_col: str = "cell_id",
    atomic: bool = True,
) -> tuple[DataFrame, int]:
    """Compute lineage for buckets not yet checkpointed, append them, and
    return (lineage_df_written, n_buckets_skipped). Idempotent: a second
    call with the same checkpoint writes nothing. With ``atomic`` (default)
    a run killed mid-commit leaves the checkpoint exactly as before — the
    retry recomputes that run's buckets instead of trusting torn state."""
    spark = df.sparkSession
    ckpt = read_checkpoint(spark, checkpoint_path)
    total = df.select(bucket_col).distinct()
    todo = pending_buckets(total, ckpt, bucket_col)
    n_skip = total.count() - todo.count()
    fresh = df.join(todo, bucket_col, "left_semi")
    lin = lineage_rows(fresh, bucket_col, cell_col)
    if lin.limit(1).count() > 0:
        write_checkpoint(lin, checkpoint_path, run_id, atomic=atomic)
    return lin, n_skip
