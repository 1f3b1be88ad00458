"""Streaming sessionization (streaming/windowed.stream_sessionize): native
session-window gap semantics, and batch == stream parity over the same
files (availableNow drain, 0-second watermark, far-future sentinel closing
the final real sessions — the established stream-test protocol here)."""

from __future__ import annotations

import datetime
import glob
import os
import shutil

from pyspark.sql import functions as F

from copernicusdata_jl_spark.streaming.windowed import stream_sessionize

from conftest import SF_DIR


def test_gap_boundary_merges_strictly_greater_splits(spark):
    """session_window merges TOUCHING windows: an event at exactly the gap
    after the previous one still joins the session; only a gap strictly
    greater than the gap duration starts a new session — the same `>` rule
    as the batch operators/asof.sessionize."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    boundary = t0 + datetime.timedelta(minutes=30)
    beyond = t0 + datetime.timedelta(minutes=30, seconds=1)
    df = spark.createDataFrame(
        [(1, t0, 1.0), (1, boundary, 1.0), (2, t0, 1.0), (2, beyond, 1.0)],
        ["user_id", "ts", "value"],
    )
    got = {
        (r.user_id, r.n_events)
        for r in stream_sessionize(df, key_cols=["user_id"]).collect()
    }
    # user 1: one 2-event session (touching merge); user 2: two sessions
    assert got == {(1, 2), (2, 1)}


def test_session_end_is_last_event_plus_gap(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    t1 = t0 + datetime.timedelta(minutes=10)
    df = spark.createDataFrame([(1, t0, 1.0), (1, t1, 2.0)], ["user_id", "ts", "value"])
    row = stream_sessionize(df).collect()[0]
    assert row.session_start == t0
    assert row.session_end == t1 + datetime.timedelta(minutes=30)
    assert row.n_events == 2 and row.sum_value == 3.0


def _write_sliced_events(spark, tmp_path, n_slices=3):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "events")
    os.makedirs(src)
    lo, hi = events.select(F.min("ts"), F.max("ts")).first()
    step = (hi - lo) / n_slices
    for i in range(n_slices):
        a = lo + step * i
        b = hi if i == n_slices - 1 else lo + step * (i + 1)
        cond = (F.col("ts") >= F.lit(a)) & (
            (F.col("ts") <= F.lit(b)) if i == n_slices - 1 else (F.col("ts") < F.lit(b))
        )
        tmp_out = str(tmp_path / f"slice{i}")
        events.filter(cond).coalesce(1).write.parquet(tmp_out)
        dst = os.path.join(src, f"f{i}.parquet")
        shutil.move(glob.glob(f"{tmp_out}/part-*.parquet")[0], dst)
        os.utime(dst, (1700000000 + i * 10, 1700000000 + i * 10))
    schema = spark.read.parquet(src).schema
    sentinel = spark.createDataFrame(
        [(-1, datetime.datetime(2035, 1, 1), -1, "view", 0.0, "{}")], schema
    )
    sent_out = str(tmp_path / "sent")
    sentinel.coalesce(1).write.parquet(sent_out)
    dst = os.path.join(src, "f_sentinel.parquet")
    shutil.move(glob.glob(f"{sent_out}/part-*.parquet")[0], dst)
    os.utime(dst, (1700000000 + n_slices * 10, 1700000000 + n_slices * 10))
    return src, schema


def test_stream_matches_batch(spark, tmp_path):
    src, schema = _write_sliced_events(spark, tmp_path)
    stream = stream_sessionize(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        watermark="0 seconds",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(tuple, spark.table("sess_parity").filter(F.col("user_id") >= 0).collect())
    )
    want = sorted(
        map(
            tuple,
            stream_sessionize(
                spark.read.parquet(src).filter(F.col("user_id") >= 0)
            ).collect(),
        )
    )
    assert got == want and len(got) > 50