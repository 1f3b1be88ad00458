"""☆ Round-5 analytics suite: ordered funnel, geohash keys, native session
windows, WARC container scan, bloom-pruned snapshot point reads.

These close the event-time trio (sessionize and asof_join have registry
entries in queries_ext.py; the funnel is the third classic derived view),
add the external-facing spatial string key (geohash — prefix-hierarchical,
pure Catalyst), pin Spark's NATIVE session windows against an independent
SQL derivation (the batch plan of the streaming operator), and round-trip
the documents table through a real ISO 28500 WARC archive via the
file-parallel scan.

Parity rules as in queries.py: integer/0-1 arithmetic wherever possible
(engine-exact), identical-IEEE double formulas otherwise, identical column
aliases on both sides, explicit BIGINT casts for DuckDB's HUGEINT sums.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.asof import funnel_flags
from .queries_ext import load

# ---------------------------------------------------------------------------
# ordered funnel (signup -> view -> purchase)
# ---------------------------------------------------------------------------


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Ordered funnel signup→view→purchase: chained seen-so-far window
    flags in one window stage (operators/asof.funnel_flags), then an
    integer-only two-level rollup (per-user max → global sum)."""
    ev = load(spark, sf_dir, "events")
    f = funnel_flags(
        ev,
        keys=["user_id"],
        ts_col="ts",
        tiebreak_col="event_id",
        steps=[
            F.col("event_type") == "signup",
            F.col("event_type") == "view",
            F.col("event_type") == "purchase",
        ],
    )
    per_user = f.groupBy("user_id").agg(
        F.max("step0").alias("s0"), F.max("step1").alias("s1"), F.max("step2").alias("s2")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("s0").alias("n_signup"),
        F.sum("s1").alias("n_view_after_signup"),
        F.sum("s2").alias("n_purchase_after_view"),
    )


_FUNNEL_SQL = """
WITH e0 AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS step0
  FROM events
), e1 AS (
  SELECT *, MAX(step0) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen0
  FROM e0
), e2 AS (
  SELECT *, CASE WHEN event_type = 'view' AND seen0 = 1 THEN 1 ELSE 0 END AS step1 FROM e1
), e3 AS (
  SELECT *, MAX(step1) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seen1
  FROM e2
), e4 AS (
  SELECT *, CASE WHEN event_type = 'purchase' AND seen1 = 1 THEN 1 ELSE 0 END AS step2 FROM e3
), per_user AS (
  SELECT user_id, MAX(step0) AS s0, MAX(step1) AS s1, MAX(step2) AS s2
  FROM e4 GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(s0) AS BIGINT) AS n_signup,
       CAST(SUM(s1) AS BIGINT) AS n_view_after_signup,
       CAST(SUM(s2) AS BIGINT) AS n_purchase_after_view
FROM per_user
"""


# ---------------------------------------------------------------------------
# geohash encode (even + odd precision through the asymmetric interleave)
# ---------------------------------------------------------------------------


def q_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Geohash keys over the geotagged event stream
    (functions/geohash.geohash_expr — pure Catalyst, map-side only, zero
    shuffle before the output sort): gh8 (even bit count) and gh7 (odd —
    exercises the asymmetric lon-leading interleave), plus the gh4 prefix
    truncation that makes geohash hierarchies aggregate without
    re-encoding."""
    from .functions.geohash import geohash_expr
    from .geo_events import geotagged_events

    ev = geotagged_events(spark, sf_dir)
    return (
        ev.select(
            "event_id",
            geohash_expr(F.col("lat"), F.col("lon"), 8).alias("gh8"),
            geohash_expr(F.col("lat"), F.col("lon"), 7).alias("gh7"),
        )
        .withColumn("gh4", F.substring("gh8", 1, 4))
        .orderBy("event_id")
    )


def _geohash_sql() -> str:
    from .functions.geohash import geohash_sql
    from .geo_events import GEO_EVENTS_SQL

    return f"""
WITH g AS (
  SELECT event_id, {geohash_sql("lat", "lon", 8)} AS gh8,
         {geohash_sql("lat", "lon", 7)} AS gh7
  FROM {GEO_EVENTS_SQL} e
)
SELECT event_id, gh8, gh7, substr(gh8, 1, 4) AS gh4 FROM g ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# native session windows (batch plan of the streaming operator)
# ---------------------------------------------------------------------------


def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Spark-native session windows (streaming/windowed.stream_sessionize
    run in batch mode — the SAME plan the stream executes incrementally):
    per-user 30-min-gap sessions where the window is [first_event,
    last_event + gap) and touching windows merge (only a gap STRICTLY
    greater than 30 min splits). The oracle re-derives that rule
    independently with a lag/running-sum CTE in integer microseconds."""
    from .streaming.windowed import stream_sessionize

    ev = load(spark, sf_dir, "events")
    out = stream_sessionize(ev)  # batch frame -> plain aggregation plan
    return (
        out.withColumn("session_start", F.col("session_start").cast("timestamp_ntz"))
        .withColumn("session_end", F.col("session_end").cast("timestamp_ntz"))
        .orderBy("user_id", "session_start")
    )


_SESSION_WINDOW_SQL = """
WITH t AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), s AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
              OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM t
), x AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM s
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       round(CAST(sum(CAST(round(value, 3) AS DECIMAL(18,3))) AS DOUBLE), 3) AS sum_value
FROM x GROUP BY user_id, sid ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# WARC container round trip through the distributed scan
# ---------------------------------------------------------------------------


def q_warc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ WARC (ISO 28500) round trip (sources/warc.py): the documents
    table is written as a real member-per-record .warc.gz (driver-side
    fixture write — catalog-scale, same contract as nc3_scan's granule),
    then re-read through the file-parallel binaryFile + mapInPandas scan;
    parsed HTTP bodies must match the parquet source of truth byte for
    byte. Eagerly materialized before the temp archive is removed."""
    import os
    import shutil
    import tempfile

    from .sources.warc import scan_warc, write_warc

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").orderBy("doc_id").collect()
    tmp = tempfile.mkdtemp(prefix="warc-")
    try:
        recs = [
            {
                "warc_type": "response",
                "target_uri": f"https://corpus.example/doc/{r.doc_id}",
                "content_type": "application/http;msgtype=response",
                "payload": b"HTTP/1.1 200 OK\r\n\r\n" + r.text.encode("utf-8"),
            }
            for r in docs
        ]
        write_warc(os.path.join(tmp, "docs.warc.gz"), recs)
        return (
            scan_warc(spark, tmp, glob="*.warc.gz")
            .select(
                F.regexp_extract("target_uri", r"([0-9]+)$", 1).cast("long").alias("doc_id"),
                "http_status",
                F.length("payload").cast("long").alias("body_bytes"),
                F.col("payload").cast("string").alias("body"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_WARC_SCAN_SQL = """
SELECT doc_id, 200 AS http_status,
       octet_length(encode(text)) AS body_bytes,
       text AS body
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# bloom-pruned snapshot point read
# ---------------------------------------------------------------------------


def q_snapshot_pointread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Equality file-skipping on the governed table
    (operators/snapshot._build_blooms / files_for): documents are committed
    hash-distributed on a content digest — every file's [min, max]
    straddles any probe, so range stats prune nothing — with per-file
    blooms on the digest; a point read then touches only the files whose
    bloom admits the probe (the takedown/dedup access pattern at 100 TB).
    Eagerly materialized before the temp table is removed."""
    import shutil
    import tempfile

    from .operators.snapshot import SnapshotTable

    docs = (
        load(spark, sf_dir, "documents")
        .withColumn("digest", F.md5("text"))
        .select("doc_id", "digest", "lang")
        .repartition(8, "digest")
    )
    tmp = tempfile.mkdtemp(prefix="snapbloom-")
    try:
        t = SnapshotTable(tmp)
        t.commit(docs, "base", bloom_cols=["digest"])
        probe = docs.filter(F.col("doc_id") == 7).collect()[0].digest
        return (
            t.read(spark, where=[("digest", "==", probe)])
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SNAPSHOT_POINTREAD_SQL = """
SELECT doc_id, md5(text) AS digest, lang FROM documents
WHERE md5(text) = (SELECT md5(text) FROM documents WHERE doc_id = 7)
ORDER BY doc_id
"""


ANALYTICS_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "funnel_steps": (q_funnel_steps, _FUNNEL_SQL),
    "geohash_encode": (q_geohash_encode, _geohash_sql()),
    "session_window_agg": (q_session_window_agg, _SESSION_WINDOW_SQL),
    "warc_scan": (q_warc_scan, _WARC_SCAN_SQL),
    "snapshot_pointread": (q_snapshot_pointread, _SNAPSHOT_POINTREAD_SQL),
}
