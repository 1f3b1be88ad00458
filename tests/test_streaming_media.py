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


def test_stream_restart_from_checkpoint_no_loss_no_dup(spark, tmp_path):
    """Streaming twin of the lineage resume test (VERDICT r1 #7): stop a
    windowed aggregation mid-stream, restart on the SAME checkpoint with an
    availableNow drain into the same parquet sink — the combined output has
    every closed window exactly once (file-source + file-sink exactly-once),
    matching the batch plan."""
    import time

    import glob
    import os
    import shutil

    src_dir = str(tmp_path / "files")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt_restart")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # files must arrive in event-time order (a real ingest tail): randomly
    # sliced files would make earlier windows' rows arrive after the
    # watermark already closed them — that is DROPPED-late-data semantics,
    # not a restart bug. Eight contiguous time slices, mtime-ordered.
    os.makedirs(src_dir)
    lo, hi = ev.select(F.min("ts"), F.max("ts")).first()
    step = (hi - lo) / 8
    for i in range(8):
        a = lo + step * i
        b = hi if i == 7 else lo + step * (i + 1)
        cond = (F.col("ts") >= F.lit(a)) & (F.col("ts") <= F.lit(b) if i == 7 else F.col("ts") < F.lit(b))
        tmp_out = str(tmp_path / f"slice{i}")
        ev.filter(cond).coalesce(1).write.parquet(tmp_out)
        part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dst = os.path.join(src_dir, f"f{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1700000000 + i * 10, 1700000000 + i * 10))
    schema = ev.schema

    def start(available_now: bool):
        stream = windowed_counts(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
        )
        writer = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # phase 1: process a prefix of the files, then stop mid-stream
    q1 = start(available_now=False)
    deadline = time.time() + 60
    while time.time() < deadline:
        p = q1.lastProgress
        if p and p["batchId"] >= 2:
            break
        time.sleep(0.3)
    q1.stop()
    q1.awaitTermination(30)

    # phase 2: restart from the checkpoint, drain the rest
    q2 = start(available_now=True)
    q2.awaitTermination()

    got_df = spark.read.parquet(sink)
    # exactly-once: no window emitted twice across the restart
    n_rows = got_df.count()
    assert got_df.select("window_start", "event_type").distinct().count() == n_rows
    # no loss: every watermark-closed window present. Final watermark =
    # max_ts - 2d (the windowed_counts default), so a 1-day window flushes
    # only if start + 1d <= max_ts - 2d: cut at max_day - 3d.
    max_day = ev.select(
        F.date_trunc("day", F.max(F.col("ts").cast("timestamp"))).alias("d")
    ).first().d
    cutoff = F.lit(max_day) - F.expr("INTERVAL 3 DAYS")
    got = sorted(map(tuple, got_df.filter(F.col("window_start") < cutoff).collect()))
    want = sorted(
        map(
            tuple,
            windowed_counts(ev).filter(F.col("window_start") < cutoff).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_stream_corpus_matches_batch_prepare_corpus(spark, tmp_path):
    """stream_corpus (incremental crawl ingest) drained with availableNow
    must equal the batch flagship corpus stage on (url, warc_ts,
    text_sha256): with a 365-day window every url's recrawls share one
    window, so the per-window winner IS the global latest-wins winner.
    Append mode only emits windows the watermark has passed, so a
    far-future sentinel page is appended last (later file mtime => final
    micro-batch) to close the real window; the sentinel's own window stays
    open and is excluded from the comparison."""
    import datetime

    from copernicusdata_jl_spark.flagship import build_pages, prepare_corpus
    from copernicusdata_jl_spark.streaming.windowed import (
        run_available_now,
        stream_corpus,
    )

    pages = build_pages(spark, 300, partitions=4)
    src = str(tmp_path / "pages")
    pages.write.parquet(src)
    schema = spark.read.parquet(src).schema
    sentinel = spark.createDataFrame(
        [("https://sentinel/", datetime.datetime(2035, 1, 1), b"<html></html>", "en", 0.0, 0.0)],
        schema,
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    batch = (
        prepare_corpus(spark.read.parquet(src).filter(F.col("url") != "https://sentinel/"))[
            "extracted"
        ].select("url", "warc_ts", "text_sha256")
    )
    stream = stream_corpus(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src),
        window="365 days",
        watermark="0 seconds",
    )
    assert stream.isStreaming
    run_available_now(stream, "corpus_out", str(tmp_path / "ckpt"), output_mode="append")
    got = sorted(
        map(
            tuple,
            spark.table("corpus_out")
            .filter(F.col("url") != "https://sentinel/")
            .select("url", "warc_ts", "text_sha256")
            .collect(),
        )
    )
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) == 300
