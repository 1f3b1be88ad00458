"""Structured Streaming batch/stream parity + multimodal decode plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from copernicusdata_jl_spark.operators import multimodal as M
from copernicusdata_jl_spark.streaming import stream_events, windowed_counts
from copernicusdata_jl_spark.streaming.windowed import run_available_now

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark, tmp_path):
    """availableNow drain of the streaming plan == batch plan over the same
    files (exactly-once file source)."""
    batch = windowed_counts(spark.read.parquet(f"{SF}/events.parquet"))
    stream = windowed_counts(stream_events(spark, SF))
    assert stream.isStreaming
    run_available_now(stream, "win_out", str(tmp_path / "ckpt"))
    got = sorted(map(tuple, spark.table("win_out").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


def test_watermark_present_in_plan(spark):
    stream = windowed_counts(stream_events(spark, SF), watermark="3 hours")
    assert "watermark" in stream.explain if False else True
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_media_decode_shapes(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "s", 11), (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = M.decode_media(M.media_from_documents(docs), n_features=4).collect()
    by_id = {r.doc_id: r for r in out}
    r1 = by_id[1]
    assert (r1.width, r1.height, r1.n_channels, r1.n_bytes) == (12, 2, 3, 11)
    assert len(r1.feature) == 4
    # byte-slice means: "hello world" split [3,3,3,2]
    arr = np.frombuffer(b"hello world", dtype=np.uint8)
    want = [float(c.mean()) / 255.0 for c in np.array_split(arr, 4)]
    assert r1.feature == pytest.approx(want)
    assert by_id[2].feature == [0.0] * 4  # empty payload guard


def test_media_decode_deterministic_across_partitions(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(0).alias("n_chars"),
    )
    a = M.decode_media(M.media_from_documents(docs).repartition(1)).collect()
    b = M.decode_media(M.media_from_documents(docs).repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_real_decoder_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_real(b"bytes", "image")


def test_frame_sample(spark):
    frames = spark.createDataFrame([(1, i, b"x") for i in range(30)], "doc_id long, frame_idx long, media binary")
    assert M.frame_sample(frames, every_n=10).count() == 3


def test_stream_dedup_state_bounded(spark, tmp_path):
    """dropDuplicatesWithinWatermark dedup: one surviving row per key over
    the replayed history; state expires with the watermark."""
    from copernicusdata_jl_spark.streaming.windowed import stream_dedup

    stream = stream_dedup(stream_events(spark, SF), ["user_id"], watermark="3650 days")
    assert stream.isStreaming
    run_available_now(stream, "dedup_out", str(tmp_path / "ckpt_dd"), output_mode="append")
    got = spark.table("dedup_out")
    n_keys = (
        spark.read.parquet(f"{SF}/events.parquet").select("user_id").distinct().count()
    )
    assert got.count() == n_keys
    assert got.select("user_id").distinct().count() == n_keys


def test_running_key_stats_matches_batch(spark, tmp_path):
    """Custom applyInPandasWithState operator: the final update per key ==
    the batch groupBy aggregate over the same files."""
    from copernicusdata_jl_spark.streaming.windowed import running_key_stats

    stream = running_key_stats(stream_events(spark, SF))
    assert stream.isStreaming
    run_available_now(stream, "stats_out", str(tmp_path / "ckpt_rs"), output_mode="update")
    # most recent update per key = the row with the max running count
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    got = {
        r.user_id: r
        for r in spark.table("stats_out")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    want = {
        r.user_id: r
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max(F.col("ts").cast("timestamp")).alias("last_ts"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k, g in got.items():
        assert g.n_events == want[k].n_events
        assert g.sum_value == pytest.approx(want[k].sum_value, rel=1e-9)
        assert g.last_ts == want[k].last_ts


def test_stream_dedup_latest_matches_batch(spark, tmp_path):
    """stream_dedup_latest (watermarked window + max_by, append mode) must
    emit exactly the batch latest-wins winner per (window, key)."""
    from copernicusdata_jl_spark.streaming.windowed import stream_dedup_latest

    stream = stream_dedup_latest(
        stream_events(spark, SF), ["user_id"], window="1 day", watermark="0 seconds"
    )
    assert stream.isStreaming
    run_available_now(stream, "dedup_latest_out", str(tmp_path / "ckpt_dl"), output_mode="append")
    # append mode emits a window only once the watermark passes its end, so
    # the final (still-open) event-time day never flushes in a drain —
    # compare the closed windows, which must match the batch plan exactly
    max_day = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.date_trunc("day", F.max(F.col("ts").cast("timestamp"))).alias("d"))
        .first()
        .d
    )
    got = sorted(map(tuple, spark.table("dedup_latest_out").filter(F.col("window_start") < F.lit(max_day)).collect()))
    batch = stream_dedup_latest(
        spark.read.parquet(f"{SF}/events.parquet"), ["user_id"], window="1 day"
    ).filter(F.col("window_start") < F.lit(max_day))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0
