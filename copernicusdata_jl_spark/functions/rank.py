"""BM25 / TF-IDF document relevance scoring — the classic ranking layer a
training-data pipeline runs after dedup and quality filtering (topic
selection, query-focused corpus carving). Pure Catalyst expressions: the
per-document term statistics are array ops over a split-once token array
(no explode — one row stays one row, no shuffle), and the corpus
statistics (N, avgdl, per-term document frequencies) reduce in a single
partial-aggregated pass that broadcasts one scalar row back. At 10^12
docs the scoring pass is map-side whole-stage codegen against broadcast
constants; the only wide op is the one-row stats aggregate.

Reference provenance: the reference has no ranking surface (its queries
are array/geo reductions, src/YAXTrees.jl); BM25 is part of the ☆ LLM
training-data extension the north rule asks for, next to dedup
(operators/dedup.py) and quality scoring (functions/text.py).

Okapi BM25 with the +1 idf floor (Robertson/Sparck-Jones with the
Lucene-style log1p form, always positive): for query term t and doc d

    idf(t)  = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )
    s(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Every constant is integer-derived (token counts), so the Spark and
DuckDB twins agree bit-for-bit before the final round(6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens_expr(text: Column) -> Column:
    """Lowercased alphanumeric tokens as an array (empty strings from the
    split dropped; NULL text → empty array, same contract as
    ``word_ngrams_expr``)."""
    toks = F.split(F.lower(text), TOKEN_SPLIT)
    return F.coalesce(
        F.filter(toks, lambda t: t != F.lit("")), F.array().cast("array<string>")
    )


def term_tf_expr(toks: Column, term: str) -> Column:
    """Term frequency = size of the filtered token array (no explode)."""
    return F.size(F.filter(toks, lambda t: t == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a fixed query-term list.

    Plan shape (asserted in tests/test_plans.py): one projection computes
    the token array + per-term tfs + doc length; ONE aggregate reduces
    (N, sum dl, per-term dfs) to a single row; that row broadcasts back
    via a BroadcastNestedLoopJoin (1-row build side) and the score is a
    map-side projection. No data-sized shuffle anywhere."""
    toks = tokens_expr(F.col(text_col))
    tf_cols = [term_tf_expr(F.col("_toks"), t).alias(f"_tf_{i}") for i, t in enumerate(terms)]
    base = docs.select(id_col, toks.alias("_toks")).select(
        id_col, F.size("_toks").alias("_dl"), *tf_cols
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.join(F.broadcast(stats))
    n = F.col("_n").cast("double")
    avgdl = F.col("_sumdl").cast("double") / n
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}").cast("double")
        df = F.col(f"_df_{i}").cast("double")
        idf = F.log((n - df + 0.5) / (df + 0.5) + 1.0)
        score = score + idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * F.col("_dl") / avgdl))
    return scored.select(id_col, F.round(score, 6).alias("bm25"))


def bm25_sql(table: str, terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin with identical arithmetic (oracle for ``bm25_scores``)."""
    tok = (
        f"list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT}'), x -> x != '')"
    )
    tf_cols = ", ".join(
        f"len(list_filter(_toks, x -> x = '{t}')) AS _tf_{i}" for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN _tf_{i} > 0 THEN 1 ELSE 0 END) AS _df_{i}" for i in range(len(terms))
    )
    score = " + ".join(
        f"ln((CAST(_n AS DOUBLE) - CAST(_df_{i} AS DOUBLE) + 0.5) / (CAST(_df_{i} AS DOUBLE) + 0.5) + 1.0)"
        f" * CAST(_tf_{i} AS DOUBLE) * ({k1} + 1.0)"
        f" / (CAST(_tf_{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b} * _dl / (CAST(_sumdl AS DOUBLE) / CAST(_n AS DOUBLE))))"
        for i in range(len(terms))
    )
    return f"""
WITH toks AS (SELECT doc_id, {tok} AS _toks FROM {table}),
base AS (SELECT doc_id, len(_toks) AS _dl, {tf_cols} FROM toks),
stats AS (SELECT COUNT(*) AS _n, SUM(_dl) AS _sumdl, {df_cols} FROM base)
SELECT doc_id, round({score}, 6) AS bm25 FROM base CROSS JOIN stats
"""


def build_postings(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float = 1.0,
) -> DataFrame:
    """☆ Inverted-index construction — the retrieval sidecar BM25 scores
    against at interactive latency: one row per term with ``df`` (document
    frequency), ``cf`` (corpus frequency), and the posting list serialized
    as ``"doc:tf"`` tokens sorted by doc id (a flat string so the driver
    gate hashes it portably; a production sink would keep the struct
    array).

    ``max_df_ratio`` drops terms appearing in more than that fraction of
    documents — the standard stopword cut that also bounds the worst
    posting list: at 10^12 docs the list for "the" is the corpus itself,
    and no retrieval system materializes it.

    Scale: explode → (term, doc) partial-counted map-side → a cheap
    df-only pre-aggregate decides which terms SURVIVE the cut, and only
    survivors' (term, doc, tf) triples reach the collect (left-semi prune
    BELOW the posting aggregation) — so the worst aggregation buffer is
    bounded by ``max_df_ratio × N`` BY CONSTRUCTION: the "the" list is
    never materialized, not even transiently (r5 review: a post-filter on
    the aggregate output would build it first and discard it after). N
    rides in as a broadcast scalar (one-row aggregate).
    """
    if not 0.0 < max_df_ratio <= 1.0:
        raise ValueError("max_df_ratio must be in (0, 1]")
    n_docs = corpus.select(F.countDistinct(id_col).alias("_n"))
    tf = (
        corpus.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_df_ratio < 1.0:
        keep = (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("df") <= F.col("_n") * max_df_ratio)
            .select("term")
        )
        tf = tf.join(keep, "term", "left_semi")
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct(id_col, "tf"))),
                lambda s: F.concat_ws(":", s[id_col].cast("string"), s["tf"].cast("string")),
            ),
            " ",
        ).alias("postings"),
    )


def build_postings_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float = 1.0,
) -> str:
    """DuckDB twin of ``build_postings`` (identical serialization)."""
    return f"""
WITH tf AS (
  SELECT term, {id_col}, COUNT(*) AS tf
  FROM (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS term FROM {table}) t
  GROUP BY term, {id_col}
), n AS (SELECT COUNT(DISTINCT {id_col}) AS n_docs FROM {table})
SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
       string_agg(CAST({id_col} AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                  ' ' ORDER BY {id_col}) AS postings
FROM tf GROUP BY term
HAVING COUNT(*) <= (SELECT n_docs FROM n) * {max_df_ratio}
"""
