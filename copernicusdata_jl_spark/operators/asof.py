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


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: events of a key whose timestamps are
    within ``gap_seconds`` of the previous event share a session;
    ``session_col`` numbers sessions per key from 1 in time order.

    The classic large-scale formulation — ONE shuffle by key, then two
    windowed passes over the sorted partition (lag to flag gaps,
    running sum to number sessions); no self-join, no state beyond the
    sort. Streaming twin: ``streaming/windowed.stream_sessionize``
    (native ``session_window`` state; identical strictly-greater gap
    rule, up to this function's whole-second truncation vs the
    stream's microsecond arithmetic)."""
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # unix_timestamp = whole-second truncation (TIMESTAMP_NTZ in a UTC
    # session); the oracle mirrors it with floor(epoch(ts))
    new_session = F.when(
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn("_new", new_session).withColumn(
        session_col,
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    ).drop("_new")


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


def funnel_flags(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_col: str,
    steps: list,
    prefix: str = "step",
) -> DataFrame:
    """Ordered-funnel membership: ``{prefix}{i}`` is 1 on a row iff the row
    satisfies ``steps[i]`` (a boolean Column) AND an earlier-or-same row of
    the same key already satisfied step i-1 in sequence order.

    ``max(step[i-1]) OVER (key ORDER BY ts ROWS UNBOUNDED PRECEDING..
    CURRENT)`` is the "seen so far" flag; chaining it keeps the whole
    funnel in ONE window stage — Spark stacks the N window expressions
    over a single Exchange + sort because they share the window spec
    (same idiom as :func:`sessionize`).  Aggregate the flags with ``max``
    per key to count users reaching each stage; all arithmetic is 0/1
    integer, so results are engine- and partitioning-exact.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    seen_prev = None
    for i, cond in enumerate(steps):
        hit = cond if seen_prev is None else (cond & (seen_prev == 1))
        out = out.withColumn(f"{prefix}{i}", F.when(hit, F.lit(1)).otherwise(F.lit(0)))
        seen_prev = F.max(F.col(f"{prefix}{i}")).over(w)
    return out


def range_lookup_join(
    facts: DataFrame,
    ranges: DataFrame,
    key_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 64,
    how: str = "inner",
) -> DataFrame:
    """☆ Interval-dimension lookup (geo-IP / AS / tariff-band style): join
    each fact row to the range rows whose half-open ``[lo, hi)`` interval
    contains its key — WITHOUT a cartesian range join.

    Plan: each range explodes to the fixed-width buckets it overlaps
    (``sequence(lo div w, (hi-1) div w)`` — dimension-side work, done
    once); each fact computes its single bucket map-side; the join is a
    plain EQUALITY join on the bucket (AQE broadcasts dimension-sized
    range tables), refined by the exact containment filter. At 100 TB the
    fact side is scanned once with no shuffle beyond the bucket hash; the
    classic ``ON key >= lo AND key < hi`` formulation degenerates to
    BroadcastNestedLoopJoin (per-row interval scan) — the difference
    between O(facts) and O(facts × ranges).

    ``bucket_width`` trades dimension blow-up (wide ranges explode to
    hi/w buckets) against per-bucket candidate count; size it near the
    median range width. Overlapping ranges emit one row per match;
    ``how='left'`` keeps unmatched facts with NULL range columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    lo, hi = F.col(lo_col), F.col(hi_col)
    # INTEGER division for the bucket: float division (`x / w` then floor)
    # loses exactness past 2^53 and can put a 64-bit key in a bucket the
    # range's sequence never emitted — silently dropped matches (r5
    # review). `div` truncates toward zero, which is monotone in the
    # numerator, so every key in [lo, hi) lands within
    # [lo div w, (hi-1) div w] for any sign.
    r = ranges.filter(hi > lo).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"CAST({lo_col} AS BIGINT) div {w}"),
                F.expr(f"(CAST({hi_col} AS BIGINT) - 1) div {w}"),
            )
        ),
    )
    f = facts.withColumn("_fb", F.expr(f"CAST({key_col} AS BIGINT) div {w}"))
    cond = (
        (F.col("_fb") == F.col("_bucket"))
        & (F.col(key_col) >= lo)
        & (F.col(key_col) < hi)
    )
    # one pass for both flavors: the containment predicate rides the
    # equality join as a join filter (still a hash join — plan-gated);
    # LeftOuter NULL-pads unmatched facts natively instead of a second
    # join + distinct + anti-join (r5 review)
    joined = f.join(r, cond, how).drop("_fb", "_bucket")
    return joined
