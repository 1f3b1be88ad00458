"""☆ Corpus-hygiene query registry (operators/corpus.py, functions/pii.py):
benchmark decontamination, duplicated-span stats, unigram-LM quality
scoring, host frequency caps, and PII redaction — the layer a training-data
pipeline runs between dedup and tokenization. Each entry is a
(Spark callable, DuckDB oracle SQL) pair merged into the main REGISTRY.

Parity rules as in queries.py: identical column aliases, explicit rounding
on doubles, md5 for portable deterministic ordering, and regex patterns
restricted to the Java-regex ∩ RE2 subset (functions/pii.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import pii as P
from .operators import corpus as C
from .operators import dedup as D
from .queries_ext import load

# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

_DECON_N = 4  # 4-grams give a non-trivial contaminated set on the fixture vocab


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Benchmark decontamination (operators/corpus.decontaminate): docs
    with doc_id % 50 == 0 stand in for a held-out eval suite; every other
    document sharing a word 4-gram with it is flagged with its hit count.
    The eval gram set broadcasts; the corpus never shuffles data rows."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    rest = docs.filter(F.col("doc_id") % 50 != 0)
    return C.decontaminate(rest, bench, n=_DECON_N).orderBy("doc_id")


def _decontaminate_sql() -> str:
    grams = D.word_ngrams_sql("text", _DECON_N)
    return f"""
WITH g AS (SELECT doc_id, unnest({grams}) AS gram FROM documents),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
SELECT doc_id, count(*) AS n_contaminated
FROM g JOIN bench USING (gram)
WHERE doc_id % 50 <> 0
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# duplicated-span statistics
# ---------------------------------------------------------------------------

_SPAN_K, _SPAN_MIN_DOCS = 5, 2


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Cross-document duplicated-span stats (operators/corpus.
    dup_span_stats, Lee et al. 2021 reduced to positional k-gram
    multiplicity): per doc, how many of its 5-gram positions also occur in
    ≥2 distinct documents."""
    docs = load(spark, sf_dir, "documents")
    return C.dup_span_stats(docs, k=_SPAN_K, min_docs=_SPAN_MIN_DOCS).orderBy("doc_id")


def _dup_spans_sql() -> str:
    k = _SPAN_K
    grams = D.word_ngrams_sql("text", k, distinct=False)
    return f"""
WITH base AS (
  SELECT doc_id, greatest(len(string_split(text, ' ')) - {k - 1}, 0) AS total_grams
  FROM documents),
g AS (SELECT doc_id, unnest({grams}) AS gram FROM documents),
hot AS (
  SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram) t
  WHERE nd >= {_SPAN_MIN_DOCS}),
d AS (SELECT doc_id, count(*) AS dup_grams FROM g JOIN hot USING (gram) GROUP BY doc_id)
SELECT b.doc_id, b.total_grams,
       coalesce(d.dup_grams, 0) AS dup_grams,
       CASE WHEN b.total_grams > 0
            THEN round(coalesce(d.dup_grams, 0) / b.total_grams, 6)
            ELSE 0.0 END AS dup_ratio
FROM base b LEFT JOIN d USING (doc_id) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# unigram-LM quality score
# ---------------------------------------------------------------------------


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Corpus-LM quality score (operators/corpus.unigram_logprob, CCNet
    unigram reduction): avg add-one-smoothed unigram log-prob per doc; the
    vocab stats broadcast back onto the exploded tokens."""
    docs = load(spark, sf_dir, "documents")
    return C.unigram_logprob(docs).orderBy("doc_id")


def _unigram_logprob_sql() -> str:
    return """
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
s AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
tot AS (SELECT sum(cnt) AS total, count(*) AS vocab FROM s),
lp AS (SELECT tok, ln((cnt + 1.0) / (total + vocab)) AS logp FROM s, tot)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(coalesce(logp, ln(1.0 / (total + vocab)))), 4) AS avg_logp
FROM t CROSS JOIN tot LEFT JOIN lp USING (tok)
GROUP BY doc_id ORDER BY doc_id
"""


_BLOCKED = ("spam.farm", "tracker.net")


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Domain blocklist (operators/corpus.blocklist_filter, UT1/C4
    style): hosts synthesized deterministically from doc_id; documents on
    a blocked domain or any subdomain of one are dropped. The Spark plan
    explodes dot-suffixes map-side against the broadcast blocklist; the
    oracle states the same semantics as a LIKE."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "host",
        F.when(F.col("doc_id") % 4 == 0, F.lit("spam.farm"))
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("sub"), (F.col("doc_id") % 7).cast("string"), F.lit(".spam.farm")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("host"), (F.col("doc_id") % 50).cast("string"), F.lit(".example.com")),
        )
        .otherwise(F.lit("ads.tracker.net")),
    )
    bl = spark.createDataFrame([(d,) for d in _BLOCKED], "domain string")
    return (
        C.blocklist_filter(docs, bl, host_col="host")
        .select("doc_id", "host")
        .orderBy("doc_id")
    )


def _blocklist_filter_sql() -> str:
    vals = ", ".join(f"('{d}')" for d in _BLOCKED)
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN 'spam.farm'
              WHEN doc_id % 4 = 1 THEN 'sub' || CAST(doc_id % 7 AS VARCHAR) || '.spam.farm'
              WHEN doc_id % 4 = 2 THEN 'host' || CAST(doc_id % 50 AS VARCHAR) || '.example.com'
              ELSE 'ads.tracker.net' END AS host
  FROM documents),
b(domain) AS (VALUES {vals})
SELECT doc_id, host FROM d
WHERE NOT EXISTS (SELECT 1 FROM b WHERE d.host = b.domain OR d.host LIKE '%.' || b.domain)
ORDER BY doc_id
"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ CCNet head/middle/tail split (operators/corpus.ccnet_buckets,
    Wenzek et al. 2020 §4.4): exact equal-frequency bands over the
    unigram-LM score — ntile over (rounded score desc, doc_id)."""
    docs = load(spark, sf_dir, "documents")
    return C.ccnet_buckets(docs).orderBy("doc_id")


def _ccnet_buckets_sql() -> str:
    return """
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
s AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
tot AS (SELECT sum(cnt) AS total, count(*) AS vocab FROM s),
lp AS (SELECT tok, ln((cnt + 1.0) / (total + vocab)) AS logp FROM s, tot),
sc AS (SELECT doc_id, count(*) AS n_tokens,
              round(avg(coalesce(logp, ln(1.0 / (total + vocab)))), 4) AS avg_logp
       FROM t CROSS JOIN tot LEFT JOIN lp USING (tok) GROUP BY doc_id)
SELECT doc_id, n_tokens, avg_logp,
       (['head', 'middle', 'tail'])[ntile(3) OVER (ORDER BY avg_logp DESC, doc_id)] AS bucket
FROM sc ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# host frequency cap
# ---------------------------------------------------------------------------

_HOST_CAP = 10


def q_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Per-host document cap (operators/corpus.host_frequency_cap, C4/
    CCNet style): keep ≤10 docs per source, ranked by md5(doc_id) — a
    deterministic unbiased per-host sample via two-phase top-k."""
    docs = load(spark, sf_dir, "documents")
    return C.host_frequency_cap(docs, cap=_HOST_CAP).orderBy("host", "rk")


def _host_cap_sql() -> str:
    return f"""
SELECT doc_id, host, rk FROM (
  SELECT doc_id, source AS host,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents) t
WHERE rk <= {_HOST_CAP} ORDER BY host, rk
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def _messy_text_expr() -> F.Column:
    """Deterministic PII injected into the fixture text (the fixture corpus
    itself contains none): every doc gets an email, even docs an IPv4,
    doc_id % 3 == 0 docs a phone number."""
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), did, F.lit("@mail.example.com"),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit(" ip 10."), (F.col("doc_id") % 256).cast("string"), F.lit(".0.1"))
               ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" call +1 555-123-"),
                        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
               ).otherwise(F.lit("")),
    )


def _messy_text_sql() -> str:
    return (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'"
        " || CASE WHEN doc_id % 2 = 0 THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' ELSE '' END"
        " || CASE WHEN doc_id % 3 = 0 THEN ' call +1 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ PII redaction (functions/pii.py): scrub emails/phones/IPv4 into
    typed placeholders and count each class — pure Catalyst regexp ops in
    whole-stage codegen, RE2-compatible patterns for the DuckDB twin."""
    docs = load(spark, sf_dir, "documents")
    messy = _messy_text_expr()
    return docs.select(
        "doc_id",
        P.pii_count_expr(messy, "email").alias("n_email"),
        P.pii_count_expr(messy, "phone").alias("n_phone"),
        P.pii_count_expr(messy, "ipv4").alias("n_ip"),
        P.redact_pii_expr(messy).alias("redacted"),
    ).orderBy("doc_id")


def _pii_redact_sql() -> str:
    m = _messy_text_sql()
    return f"""
SELECT doc_id,
       {P.pii_count_sql(m, "email")} AS n_email,
       {P.pii_count_sql(m, "phone")} AS n_phone,
       {P.pii_count_sql(m, "ipv4")} AS n_ip,
       {P.redact_pii_sql(m)} AS redacted
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

_SEQ_LEN = 64


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Sequence packing (operators/corpus.pack_sequences): docs
    concatenated in deterministic md5 order, each assigned the fixed-
    length training sequence holding its first token. Distributed
    prefix sum (range partitions + per-partition windows + tiny offset
    aggregate) — the oracle is the equivalent single-window cumsum."""
    from .operators import corpus as C

    docs = load(spark, sf_dir, "documents")
    return C.pack_sequences(docs, seq_len=_SEQ_LEN).orderBy("doc_id")


def _pack_sequences_sql() -> str:
    from .functions.text import token_count_sql

    n = token_count_sql("text")
    s = _SEQ_LEN
    return f"""
WITH b AS (SELECT doc_id, {n} AS n_tokens, md5(CAST(doc_id AS VARCHAR)) AS k FROM documents),
c AS (SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             - n_tokens AS start
      FROM b)
SELECT doc_id, n_tokens, start,
       CAST(floor(start / {s}) AS BIGINT) AS seq_id,
       start % {s} AS offset,
       (start + n_tokens) > (CAST(floor(start / {s}) AS BIGINT) + 1) * {s} AS straddles
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# temperature resampling
# ---------------------------------------------------------------------------

_TEMP_ALPHA, _TEMP_FRAC = 0.5, 0.4


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Temperature resampling of the source mix (operators/corpus.
    temperature_sample, p_s ∝ count^0.5): deterministic salted-hash
    selection at per-source rates; rates derive from integerized sqrt
    weights so the normalizer is bit-deterministic."""
    from .operators import corpus as C

    docs = load(spark, sf_dir, "documents")
    return (
        C.temperature_sample(docs, "source", _TEMP_ALPHA, _TEMP_FRAC)
        .select("doc_id", "source", "_keep_p")
        .orderBy("doc_id")
    )


def _temperature_sample_sql() -> str:
    from .functions.sample import sample_mod_sql

    h = sample_mod_sql("CAST(doc_id AS VARCHAR)", "tmp")
    return f"""
WITH c AS (SELECT source, count(*) AS _c,
                  CAST(round(sqrt(count(*)) * 1000000) AS BIGINT) AS _w
           FROM documents GROUP BY source),
t AS (SELECT SUM(_c) AS _n, SUM(_w) AS _s FROM c),
r AS (SELECT source, least(1.0, ({_TEMP_FRAC} * _n * _w / _s) / _c) AS p FROM c, t)
SELECT d.doc_id, d.source, round(p, 6) AS _keep_p
FROM documents d JOIN r USING (source)
WHERE {h} < floor(p * 1000000)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# composed corpus flagship: the full hygiene chain in one plan
# ---------------------------------------------------------------------------

_MIX_CAP, _MIX_MIN_TOKENS, _MIX_MAX_REP, _MIX_FRAC = 15, 40, 0.3, 0.6


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ The corpus-side flagship: host frequency cap → exact text dedup
    (min doc_id survives) → quality gates (token floor, Gopher repetition
    ceiling) → temperature resampling of the surviving source mix — the
    whole training-mix construction as ONE declarative plan (each stage's
    individual oracle lives in its own registry entry; this one pins the
    composition). The dedup stage keys its one Exchange on
    ``xxhash64(text)`` (8 bytes) — never the text bytes — and the window
    runs over ``(_h, text)`` on top of that distribution (a hash
    partitioning on a subset of the clustering satisfies the window's
    requirement, so Catalyst adds no second Exchange; the text column in
    the window spec is the equality tie-check that keeps the result exact
    under hash collisions). Plan-asserted in tests/test_plans.py: no
    Exchange carries text."""
    from pyspark.sql import Window

    from .functions.text import repetition_ratio_expr, token_count_expr
    from .operators import corpus as C

    docs = load(spark, sf_dir, "documents")
    capped = C.host_frequency_cap(docs, _MIX_CAP).select("doc_id")
    base = docs.join(capped, "doc_id")
    hashed = base.withColumn("_h", F.xxhash64("text")).repartition(F.col("_h"))
    w = Window.partitionBy("_h", "text").orderBy("doc_id")
    deduped = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_h")
    )
    gated = deduped.filter(
        (token_count_expr(F.col("text")) >= _MIX_MIN_TOKENS)
        & (repetition_ratio_expr(F.col("text"), 3) <= _MIX_MAX_REP)
    )
    mixed = C.temperature_sample(gated, "source", 0.5, _MIX_FRAC)
    return mixed.select(
        "doc_id",
        "source",
        token_count_expr(F.col("text")).alias("n_tokens"),
        "_keep_p",
    ).orderBy("doc_id")


def _training_mix_sql() -> str:
    from .functions.sample import sample_mod_sql
    from .functions.text import repetition_ratio_sql, token_count_sql

    tok = token_count_sql("text")
    rep = repetition_ratio_sql("text", 3)
    h = sample_mod_sql("CAST(doc_id AS VARCHAR)", "tmp")
    return f"""
WITH capped AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents) t WHERE rk <= {_MIX_CAP}),
base AS (SELECT d.* FROM documents d JOIN capped USING (doc_id)),
ded AS (SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM base) t
  WHERE rn = 1),
gated AS (SELECT * FROM ded WHERE {tok} >= {_MIX_MIN_TOKENS} AND ({rep}) <= {_MIX_MAX_REP}),
c AS (SELECT source, count(*) AS _c,
             CAST(round(sqrt(count(*)) * 1000000) AS BIGINT) AS _w
      FROM gated GROUP BY source),
t AS (SELECT SUM(_c) AS _n, SUM(_w) AS _s FROM c),
r AS (SELECT source, least(1.0, ({_MIX_FRAC} * _n * _w / _s) / _c) AS p FROM c, t)
SELECT g.doc_id, g.source, {tok} AS n_tokens, round(p, 6) AS _keep_p
FROM gated g JOIN r USING (source)
WHERE {h} < floor(p * 1000000)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# BPE pair counts + corpus version diff
# ---------------------------------------------------------------------------


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ One distributed BPE-training iteration (operators/corpus.
    bpe_pair_counts, Sennrich et al. 2016): corpus-wide adjacent-symbol
    pair counts weighted by word frequency — the corpus collapses to its
    vocabulary BEFORE the pair explode (10^7 vocab rows vs 10^12 tokens)."""
    from .operators import corpus as C

    docs = load(spark, sf_dir, "documents")
    return C.bpe_pair_counts(docs).orderBy(F.desc("cnt"), "pair")


def _bpe_pairs_sql() -> str:
    return """
WITH w AS (SELECT tok AS w, count(*) AS wc
           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
           WHERE tok <> '' GROUP BY tok),
p AS (SELECT unnest(list_transform(range(1, length(w)), i -> w[i] || ' ' || w[i+1])) AS pair, wc
      FROM w)
SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt
FROM p GROUP BY pair ORDER BY cnt DESC, pair
"""


def q_dup_span_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Contiguous duplicated spans (operators/corpus.dup_span_islands):
    maximal runs of consecutive duplicated 5-gram positions merged to
    (doc_id, span_start, n_grams, span_tokens) rows via the
    gaps-and-islands window — Lee et al. 2021's removal unit."""
    docs = load(spark, sf_dir, "documents")
    return C.dup_span_islands(docs, k=_SPAN_K, min_docs=_SPAN_MIN_DOCS).orderBy(
        "doc_id", "span_start"
    )


def _dup_span_islands_sql() -> str:
    k = _SPAN_K
    grams = D.word_ngrams_sql("text", k, distinct=False)
    return f"""
WITH g AS (SELECT doc_id, {grams} AS gl FROM documents),
pos AS (SELECT doc_id, CAST(u.i AS BIGINT) AS p, gl[CAST(u.i AS INT)] AS gram
        FROM g, unnest(range(1, len(gl) + 1)) AS u(i)),
hot AS (
  SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS nd FROM pos GROUP BY gram) t
  WHERE nd >= {_SPAN_MIN_DOCS}),
dp AS (SELECT doc_id, p FROM pos JOIN hot USING (gram)),
isl AS (SELECT doc_id, p,
               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        FROM dp)
SELECT doc_id, min(p) AS span_start, CAST(count(*) AS BIGINT) AS n_grams,
       max(p) - min(p) + {k} AS span_tokens
FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start
"""


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Dup-span REMOVAL (operators/corpus.remove_dup_spans): every token
    covered by a duplicated island is deleted and the residual text kept —
    Lee et al. 2021's ExactSubstr removal applied, not just detected."""
    docs = load(spark, sf_dir, "documents")
    return C.remove_dup_spans(docs, k=_SPAN_K, min_docs=_SPAN_MIN_DOCS).orderBy("doc_id")


def _dup_span_removal_sql() -> str:
    k = _SPAN_K
    grams = D.word_ngrams_sql("text", k, distinct=False)
    return f"""
WITH g AS (SELECT doc_id, {grams} AS gl FROM documents),
pos AS (SELECT doc_id, CAST(u.i AS BIGINT) AS p, gl[CAST(u.i AS INT)] AS gram
        FROM g, unnest(range(1, len(gl) + 1)) AS u(i)),
hot AS (
  SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS nd FROM pos GROUP BY gram) t
  WHERE nd >= {_SPAN_MIN_DOCS}),
dp AS (SELECT doc_id, p FROM pos JOIN hot USING (gram)),
isl AS (SELECT doc_id, p,
               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        FROM dp),
islands AS (SELECT doc_id, min(p) AS s, max(p) - min(p) + {k} AS n
            FROM isl GROUP BY doc_id, grp),
toks AS (SELECT doc_id, CAST(u.i AS BIGINT) AS tp, tl[CAST(u.i AS INT)] AS tok
         FROM (SELECT doc_id, string_split(text, ' ') AS tl FROM documents) t,
              unnest(range(1, len(tl) + 1)) AS u(i)),
keep AS (SELECT t.* FROM toks t
         WHERE NOT EXISTS (SELECT 1 FROM islands s
                           WHERE s.doc_id = t.doc_id
                             AND t.tp BETWEEN s.s AND s.s + s.n - 1))
SELECT d.doc_id,
       coalesce((SELECT string_agg(kp.tok, ' ' ORDER BY kp.tp)
                 FROM keep kp WHERE kp.doc_id = d.doc_id), '') AS clean_text,
       CAST(len(string_split(d.text, ' '))
            - (SELECT count(*) FROM keep kp WHERE kp.doc_id = d.doc_id)
            AS BIGINT) AS n_removed
FROM documents d ORDER BY doc_id
"""


_BPE_MERGES = 3


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Full BPE-trainer loop (operators/corpus.bpe_train_merges,
    Sennrich et al. 2016 Alg. 1): 3 merge iterations — pair count, argmax,
    greedy leftmost vocab rewrite — over the vocab-collapsed corpus; the
    learned merge table (merge_rank, lft, rgt, cnt) is the result."""
    docs = load(spark, sf_dir, "documents")
    return C.bpe_train_merges(docs, n_merges=_BPE_MERGES).orderBy("merge_rank")


def _bpe_merges_sql() -> str:
    """Chained-CTE iterative twin: one (pairs, argmax, rewrite) block per
    merge, the rewrite as the same greedy leftmost list_reduce fold Spark
    runs (string accumulator; CROSS JOIN carries the argmax row into the
    lambda)."""
    ctes = [
        """words AS (SELECT tok AS w, count(*) AS wc
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  WHERE tok <> '' GROUP BY tok)""",
        "v0 AS (SELECT array_to_string(string_split(w, ''), ' ') AS sym, wc FROM words)",
    ]
    for r in range(1, _BPE_MERGES + 1):
        ctes.append(f"""p{r} AS (
  SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS pair, wc
  FROM (SELECT string_split(sym, ' ') AS l, wc FROM v{r - 1}) t)""")
        ctes.append(f"""m{r} AS (
  SELECT {r} AS merge_rank, split_part(pair, ' ', 1) AS lft, split_part(pair, ' ', 2) AS rgt,
         CAST(sum(wc) AS BIGINT) AS cnt
  FROM p{r} GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1)""")
        if r < _BPE_MERGES:
            ctes.append(f"""v{r} AS (
  SELECT list_reduce(string_split(sym, ' '), (acc, x) -> CASE
    WHEN regexp_extract(acc, '[^ ]*$') = lft AND x = rgt
    THEN CASE WHEN acc = lft THEN '' ELSE regexp_replace(acc, ' [^ ]*$', '') || ' ' END
         || lft || rgt
    ELSE acc || ' ' || x END) AS sym, wc
  FROM v{r - 1} CROSS JOIN m{r})""")
    union = " UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(1, _BPE_MERGES + 1))
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT merge_rank, lft, rgt, cnt FROM ({union}) ORDER BY merge_rank"
    )


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ BPE encode (operators/corpus.bpe_encode): apply the 3 learned
    merges to the corpus — vocab-side rewrite with the trainer's own fold,
    broadcast join back, per-doc reassembly by position. Train → encode,
    end to end."""
    docs = load(spark, sf_dir, "documents")
    merges = C.bpe_train_merges(docs, n_merges=_BPE_MERGES)
    return C.bpe_encode(docs, merges).orderBy("doc_id")


def _bpe_encode_sql() -> str:
    """The trainer's chained-CTE twin extended through ALL merge rewrites
    (keyed by the original word) + positional document reassembly."""
    rewrite = """list_reduce(string_split(sym, ' '), (acc, x) -> CASE
    WHEN regexp_extract(acc, '[^ ]*$') = lft AND x = rgt
    THEN CASE WHEN acc = lft THEN '' ELSE regexp_replace(acc, ' [^ ]*$', '') || ' ' END
         || lft || rgt
    ELSE acc || ' ' || x END) AS sym"""
    ctes = [
        """tw AS (SELECT tok AS w, count(*) AS wc
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  WHERE tok <> '' GROUP BY tok)""",
        "v0 AS (SELECT w, array_to_string(string_split(w, ''), ' ') AS sym, wc FROM tw)",
    ]
    for r in range(1, _BPE_MERGES + 1):
        ctes.append(f"""p{r} AS (
  SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS pair, wc
  FROM (SELECT string_split(sym, ' ') AS l, wc FROM v{r - 1}) t)""")
        ctes.append(f"""m{r} AS (
  SELECT split_part(pair, ' ', 1) AS lft, split_part(pair, ' ', 2) AS rgt
  FROM (SELECT pair, sum(wc) AS cnt FROM p{r} GROUP BY pair
        ORDER BY cnt DESC, pair LIMIT 1) t)""")
        ctes.append(f"v{r} AS (SELECT w, {rewrite}, wc FROM v{r - 1} CROSS JOIN m{r})")
    ctes.append("""docw AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, tl[CAST(u.i AS INT)] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS tl FROM documents) t,
       unnest(range(1, len(tl) + 1)) AS u(i)
  WHERE tl[CAST(u.i AS INT)] <> '')""")
    ctes.append(f"""enc AS (
  SELECT d.doc_id, count(*) AS n_words, string_agg(v.sym, ' | ' ORDER BY d.pos) AS encoded
  FROM docw d JOIN v{_BPE_MERGES} v USING (w) GROUP BY d.doc_id)""")
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(len(string_split(encoded, ' ')) - (n_words - 1) AS BIGINT) AS n_symbols,
       encoded
FROM enc ORDER BY doc_id
"""
    )


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Corpus version diff by content digest: v2 simulated
    deterministically (doc_id % 7 == 0 removed, % 11 == 0 edited); full
    outer join on id, status from digest comparison — the audit step
    between two releases of a training set."""
    docs = load(spark, sf_dir, "documents")
    v2 = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")),
    )
    a = docs.select("doc_id", F.md5(F.col("text")).alias("h1"))
    b = v2.select("doc_id", F.md5(F.col("text")).alias("h2"))
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h1") != F.col("h2"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return j.select("doc_id", status.alias("status")).orderBy("doc_id")


def _corpus_diff_sql() -> str:
    return """
WITH a AS (SELECT doc_id, md5(text) AS h1 FROM documents),
b AS (SELECT doc_id,
             md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS h2
      FROM documents WHERE doc_id % 7 <> 0)
SELECT doc_id,
       CASE WHEN h2 IS NULL THEN 'removed'
            WHEN h1 IS NULL THEN 'added'
            WHEN h1 <> h2 THEN 'changed'
            ELSE 'same' END AS status
FROM a FULL OUTER JOIN b USING (doc_id)
ORDER BY doc_id
"""


LLM_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "decontaminate": (q_decontaminate, _decontaminate_sql()),
    "dup_spans": (q_dup_spans, _dup_spans_sql()),
    "unigram_logprob": (q_unigram_logprob, _unigram_logprob_sql()),
    "host_cap": (q_host_cap, _host_cap_sql()),
    "pii_redact": (q_pii_redact, _pii_redact_sql()),
    "pack_sequences": (q_pack_sequences, _pack_sequences_sql()),
    "temperature_sample": (q_temperature_sample, _temperature_sample_sql()),
    "training_mix": (q_training_mix, _training_mix_sql()),
    "bpe_pairs": (q_bpe_pairs, _bpe_pairs_sql()),
    "corpus_diff": (q_corpus_diff, _corpus_diff_sql()),
    "dup_span_islands": (q_dup_span_islands, _dup_span_islands_sql()),
    "bpe_merges": (q_bpe_merges, _bpe_merges_sql()),
    "dup_span_removal": (q_dup_span_removal, _dup_span_removal_sql()),
    "bpe_encode": (q_bpe_encode, _bpe_encode_sql()),
    "ccnet_buckets": (q_ccnet_buckets, _ccnet_buckets_sql()),
    "blocklist_filter": (q_blocklist_filter, _blocklist_filter_sql()),
}
