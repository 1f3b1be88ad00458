"""Extended query registry: dedup/similarity suite, k-ring kNN, lineage,
skew-salted aggregation, interpolation — each a (Spark callable, DuckDB
oracle SQL) pair, merged into the main REGISTRY by queries.py.

Parity rules as in queries.py: identical column aliases, explicit round(6)
on doubles, portable md5-prefix hashing (operators/dedup.py h56) so both
engines derive identical hash values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup as D


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (☆ training-data dedup)
# ---------------------------------------------------------------------------

_NH, _BANDS, _ROWS, _THRESH = 8, 4, 2, 0.8


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8)+LSH(4×2) near-dup pairs over documents, exact-Jaccard
    verified at ≥ 0.8. Portable-hash flavor for the oracle; the production
    path is operators/dedup.minhash_dedup(fast=True) (xxhash64)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", D.word_ngrams_expr(F.col("text"), 3).alias("sh")
    )
    sig = D.minhash_signatures(docs, "doc_id", "sh", _NH, fast=False)
    cand = D.candidate_pairs(D.lsh_bands(sig, "doc_id", _BANDS, _ROWS), "doc_id", max_bucket=64)
    out = D.jaccard_verify(cand, docs, "doc_id", "sh").filter(F.col("jaccard") >= _THRESH)
    return out.orderBy("id_a", "id_b")


def _minhash_sql() -> str:
    sh = D.word_ngrams_sql("text", 3)
    mins = ", ".join(f"min({D.h56_sql('g', f's{j}')}) AS m{j}" for j in range(_NH))
    bands_sel = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, CAST(m{i} AS VARCHAR) || '_' || CAST(m{j} AS VARCHAR) AS key FROM sig".format(
            b=b, i=b * _ROWS, j=b * _ROWS + 1
        )
        for b in range(_BANDS)
    )
    return f"""
WITH sh AS (SELECT doc_id, {sh} AS sh FROM documents),
ex AS (SELECT doc_id, unnest(sh) AS g FROM sh),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
bands AS ({bands_sel}),
sized AS (
  SELECT band, key, count(*) AS n FROM bands GROUP BY band, key
),
kept AS (
  SELECT b.* FROM bands b JOIN sized s USING (band, key) WHERE s.n <= 64
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM kept a JOIN kept b USING (band, key)
  WHERE a.doc_id < b.doc_id
),
j AS (
  SELECT id_a, id_b,
         round(len(list_intersect(x.sh, y.sh)) * 1.0
               / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
  FROM pairs JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b
)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= {_THRESH}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# SimHash (per-doc fingerprint + near-dup pairs)
# ---------------------------------------------------------------------------

_SIMBITS = 32


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (bitwise token-hash majority)."""
    return D.simhash(load(spark, sf_dir, "documents"), "doc_id", "text", _SIMBITS, fast=False).orderBy(
        "doc_id"
    )


def _simhash_sql() -> str:
    h = D.h56_sql("t", "sim")
    votes = ", ".join(
        f"sum(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(_SIMBITS)
    )
    combine = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMBITS))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
votes AS (SELECT doc_id, {votes} FROM toks GROUP BY doc_id)
SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM votes ORDER BY doc_id
"""


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding near-dup: pairs within Hamming ≤ 2 of the 16-bit
    fingerprint, candidates via 4-bit chunk buckets."""
    return D.simhash_neardup(
        load(spark, sf_dir, "documents"), "doc_id", "text", _SIMBITS, 4, 2, fast=False
    ).orderBy("id_a", "id_b")


def _simhash_neardup_sql() -> str:
    chunks = _SIMBITS // 4
    bands_sel = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {c} AS band, (simhash >> {c * 4}) & 15 AS key FROM sh"
        for c in range(chunks)
    )
    return f"""
WITH base AS ({_simhash_sql().replace('ORDER BY doc_id', '')}),
sh AS (SELECT doc_id, simhash FROM base),
bands AS ({bands_sel}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a JOIN bands b USING (band, key)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 2
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (metric demo; scale path is minhash_lsh)
# ---------------------------------------------------------------------------


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard for candidate pairs blocked by (lang,
    |n_chars| diff ≤ 20) — demonstrates the exact metric; at 10^12 docs the
    blocked self-join is replaced by the MinHash-LSH candidate generator."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", D.word_ngrams_expr(F.col("text"), 3).alias("sh")
    )
    a, b = docs.alias("a"), docs.alias("b")
    pairs = (
        a.join(b, "lang")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 20)
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return pairs.filter(F.col("jaccard") >= 0.5).orderBy("id_a", "id_b")


def _ngram_jaccard_sql() -> str:
    sh = D.word_ngrams_sql("text", 3)
    return f"""
WITH s AS (SELECT doc_id, lang, n_chars, {sh} AS sh FROM documents),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(len(list_intersect(a.sh, b.sh)) * 1.0
               / len(list_distinct(a.sh || b.sh)), 6) AS jaccard
  FROM s a JOIN s b ON a.lang = b.lang
  WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
)
SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5 ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# embedding near-dup + LSH ANN (☆ similarity search)
# ---------------------------------------------------------------------------

_DIM = 64


def _w_sql(j: int, vec: str = "embedding") -> str:
    """DuckDB projection j: weights derived inline from index arithmetic —
    identical to operators/dedup.projection_weights."""
    return (
        f"list_sum(list_transform(range({_DIM}), i -> "
        f"CAST({vec}[i + 1] AS DOUBLE) * (((i * 31 + {j} * 17 + 13) % 7) - 3)))"
    )


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: 8-bit sign-LSH bucket join + exact cosine
    verification. Gate threshold 0.35 exercises real pairs in the synthetic
    embeddings (max pairwise cosine there is ~0.51); production near-dup
    threshold defaults to 0.99 in operators/dedup.embedding_neardup."""
    return D.embedding_neardup(
        load(spark, sf_dir, "embeddings"), "vec_id", "embedding", _DIM, 8, 0.35
    ).orderBy("id_a", "id_b")


def _bucket_sql(vec: str, num_proj: int) -> str:
    return " + ".join(
        f"(CASE WHEN {_w_sql(j, vec)} > 0 THEN {1 << j} ELSE 0 END)" for j in range(num_proj)
    )


_COS_SQL = """round(
  list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
  / (SQRT(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * SQRT(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"""


def _embed_neardup_sql() -> str:
    cos = _COS_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
WITH b AS (SELECT vec_id, embedding, ({_bucket_sql('embedding', 8)}) AS bucket FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos_sim
  FROM b a JOIN b b ON a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.35 ORDER BY id_a, id_b
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors per query (vec_id < 3) via 4-bit
    sign-LSH bucket probe — the scale path next to brute-force cosine_topk."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    base = emb.filter(F.col("vec_id") >= 3)
    return D.ann_lsh_topk(base, q, 5, "vec_id", "embedding", "query_id", "qe", _DIM, 4).orderBy(
        "query_id", "rank"
    )


def _ann_lsh_sql() -> str:
    cos = _COS_SQL.format(a="e.embedding", b="q.qe")
    return f"""
WITH base AS (
  SELECT vec_id, embedding, ({_bucket_sql('embedding', 4)}) AS bucket
  FROM embeddings WHERE vec_id >= 3
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe, ({_bucket_sql('embedding', 4)}) AS bucket
  FROM embeddings WHERE vec_id < 3
),
c AS (
  SELECT q.query_id, e.vec_id, {cos} AS cos_sim
  FROM base e JOIN q ON e.bucket = q.bucket
)
SELECT query_id, vec_id, rank, cos_sim FROM (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM c) t
WHERE rank <= 5 ORDER BY query_id, rank
"""


EXT_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "minhash_lsh": (q_minhash_lsh, _minhash_sql()),
    "simhash": (q_simhash, _simhash_sql()),
    "simhash_neardup": (q_simhash_neardup, _simhash_neardup_sql()),
    "ngram_jaccard": (q_ngram_jaccard, _ngram_jaccard_sql()),
    "embed_neardup": (q_embed_neardup, _embed_neardup_sql()),
    "ann_lsh": (q_ann_lsh, _ann_lsh_sql()),
}
