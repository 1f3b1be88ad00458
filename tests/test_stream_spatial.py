"""Streaming spatial half (VERDICT r2 #8): availableNow drain of the
incremental flagship must equal the batch spatial_products tiles + lineage,
and a kill/restart on the same checkpoint must lose/duplicate nothing."""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from copernicusdata_jl_spark.flagship import build_pages, flagship_pipeline
from copernicusdata_jl_spark.streaming.spatial import (
    read_stream_lineage,
    read_stream_tiles,
    start_stream_spatial,
)

SENTINEL = "https://sentinel/"


def _write_sliced_pages(spark, tmp_path, n_pages=300, n_slices=4):
    """Pages parquet split into warc_ts-ordered files (a real ingest tail;
    mtime-ordered so the file source replays them in event-time order),
    plus a far-future sentinel page arriving last to close the real window
    under a 0-second watermark."""
    pages = build_pages(spark, n_pages, partitions=4)
    src = str(tmp_path / "pages")
    os.makedirs(src)
    lo, hi = pages.select(F.min("warc_ts"), F.max("warc_ts")).first()
    step = (hi - lo) / n_slices
    for i in range(n_slices):
        a = lo + step * i
        b = hi if i == n_slices - 1 else lo + step * (i + 1)
        cond = (F.col("warc_ts") >= F.lit(a)) & (
            (F.col("warc_ts") <= F.lit(b)) if i == n_slices - 1 else (F.col("warc_ts") < F.lit(b))
        )
        tmp_out = str(tmp_path / f"slice{i}")
        pages.filter(cond).coalesce(1).write.parquet(tmp_out)
        part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dst = os.path.join(src, f"f{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1700000000 + i * 10, 1700000000 + i * 10))
    schema = spark.read.parquet(src).schema
    sentinel = spark.createDataFrame(
        [(SENTINEL, datetime.datetime(2035, 1, 1), b"<html></html>", "en", 0.0, 0.0)], schema
    )
    sent_out = str(tmp_path / "sent")
    sentinel.coalesce(1).write.parquet(sent_out)
    dst = os.path.join(src, "f_sentinel.parquet")
    shutil.move(glob.glob(f"{sent_out}/part-*.parquet")[0], dst)
    os.utime(dst, (1700000000 + n_slices * 10, 1700000000 + n_slices * 10))
    return src, schema, pages


def _batch_truth(spark, src):
    pages = spark.read.parquet(src).filter(F.col("url") != SENTINEL)
    stages = flagship_pipeline(pages)
    return stages["tiles"], stages["lineage"]


def test_stream_spatial_matches_batch(spark, tmp_path):
    src, schema, _ = _write_sliced_pages(spark, tmp_path)
    out_dir = str(tmp_path / "out")
    q = start_stream_spatial(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src),
        out_dir,
        checkpoint=str(tmp_path / "ckpt"),
        window="365 days",
        watermark="0 seconds",
        available_now=True,
    )
    q.awaitTermination()
    want_tiles, want_lineage = _batch_truth(spark, src)
    got_t = sorted(map(tuple, read_stream_tiles(spark, out_dir).collect()))
    want_t = sorted(map(tuple, want_tiles.collect()))
    assert got_t == want_t and len(got_t) > 0
    got_l = sorted(map(tuple, read_stream_lineage(spark, out_dir).collect()))
    want_l = sorted(map(tuple, want_lineage.collect()))
    assert got_l == want_l and len(got_l) > 0


def test_stream_spatial_restart_no_loss_no_dup(spark, tmp_path):
    """Kill the query mid-stream, restart on the SAME checkpoint with an
    availableNow drain: combined per-batch partials still equal the batch
    job exactly (foreachBatch replay is idempotent via overwrite into
    batch_id-addressed paths)."""
    src, schema, _ = _write_sliced_pages(spark, tmp_path)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start(available_now: bool):
        return start_stream_spatial(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
            out_dir,
            checkpoint=ckpt,
            window="365 days",
            watermark="0 seconds",
            available_now=available_now,
        )

    q1 = start(available_now=False)
    deadline = time.time() + 60
    while time.time() < deadline:
        p = q1.lastProgress
        if p and p["batchId"] >= 2:
            break
        time.sleep(0.3)
    q1.stop()
    q1.awaitTermination(30)

    q2 = start(available_now=True)
    q2.awaitTermination()

    want_tiles, want_lineage = _batch_truth(spark, src)
    got_t = sorted(map(tuple, read_stream_tiles(spark, out_dir).collect()))
    want_t = sorted(map(tuple, want_tiles.collect()))
    assert got_t == want_t and len(got_t) > 0
    got_l = sorted(map(tuple, read_stream_lineage(spark, out_dir).collect()))
    want_l = sorted(map(tuple, want_lineage.collect()))
    assert got_l == want_l and len(got_l) > 0
