"""☆ Event-analytics suite: sessionization, as-of join, ordered funnel.

Registry (driver-gated) coverage for the event-time operators in
operators/asof.py, which until now were pytest-verified only.  The
reference stops at interval selection over the events stream (J5,
src/Payloads.jl start/stop_time); these are the three derived views a
web-scale event pipeline layers on top, each ONE hash partition by user +
per-partition sort + window expressions — no join nodes, and the follow-up
rollups reuse the window's partitioning (group keys ⊇ partition keys, so
Spark's ClusteredDistribution is already satisfied — no second Exchange).

Parity rules as in queries.py: timezone-free integer time arithmetic
(timestamp_diff / whole-second truncation mirrored by floor(epoch(ts))),
decimal-exact money sums, identical column aliases on both sides, explicit
BIGINT casts for DuckDB's HUGEINT integer sums.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.asof import asof_join, funnel_flags, sessionize
from .queries_ext import load

# ---------------------------------------------------------------------------
# sessionization (30-minute inactivity gap)
# ---------------------------------------------------------------------------


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Per-user 30-min-gap sessions over events (operators/asof.sessionize):
    lag + running-sum windows over one Exchange, then a session rollup on
    (user_id, session_id) that reuses the same partitioning."""
    ev = load(spark, sf_dir, "events")
    s = sessionize(ev, keys=["user_id"], ts_col="ts", gap_seconds=1800)
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


# unix_timestamp truncates to whole seconds; floor(epoch(ts)) is the DuckDB
# mirror (events are post-1970, so truncation == floor).  Ties on ts need no
# tiebreak: a zero gap lands in the same session under either order.
_SESSIONIZE_SQL = """
WITH t AS (
  SELECT user_id, ts, value,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS t_s,
         LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_s
  FROM events
), s AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_s IS NULL OR t_s - prev_s > 1800 THEN 1 ELSE 0 END AS is_new
  FROM t
), x AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM s
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM x GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# as-of join (latest prior view for each purchase)
# ---------------------------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ As-of join via the union-interleave plan (operators/asof.asof_join):
    each purchase event picks the user's latest view event at-or-before it —
    no join node, one Exchange, ties resolved to the highest event_id."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    j = asof_join(
        purchases,
        views,
        keys=["user_id"],
        ts_col="ts",
        value_cols=["event_id"],
        tiebreak_col="event_id",
        prefix="view_",
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("view_event_id").alias("view_id"),
        F.timestamp_diff("MICROSECOND", F.col("view_ts"), F.col("ts")).alias("gap_us"),
    ).orderBy("purchase_id")


_ASOF_SQL = """
WITH u AS (
  SELECT user_id, ts AS t, 1 AS side, event_id AS purchase_id,
         NULL::BIGINT AS view_id, NULL::TIMESTAMP AS vts, ts AS pts
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 0, NULL::BIGINT, event_id, ts, NULL::TIMESTAMP
  FROM events WHERE event_type = 'view'
), w AS (
  SELECT *, LAST_VALUE(view_id IGNORE NULLS) OVER win AS m_view_id,
            LAST_VALUE(vts IGNORE NULLS) OVER win AS m_vts
  FROM u
  WINDOW win AS (PARTITION BY user_id ORDER BY t, side, view_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT purchase_id, user_id, m_view_id AS view_id,
       epoch_us(pts) - epoch_us(m_vts) AS gap_us
FROM w WHERE side = 1 ORDER BY purchase_id
"""


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


ANALYTICS_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "sessionize": (q_sessionize, _SESSIONIZE_SQL),
    "asof_join": (q_asof_join, _ASOF_SQL),
    "funnel_steps": (q_funnel_steps, _FUNNEL_SQL),
}
