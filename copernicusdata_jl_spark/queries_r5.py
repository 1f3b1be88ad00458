"""☆ Round-5 query registry: merge-on-read takedown deletes, incremental
cross-snapshot dedup, and the full Gopher document-quality rule set — the
governance/quality layer of the training-data pipeline (VERDICT r4 next-round
items #2, #6, #7). Each entry is a (Spark callable, DuckDB oracle SQL) pair
merged into the main REGISTRY by queries.py.

The snapshot-backed queries build a real SnapshotTable in a fresh temp dir on
every run (the committed data is a deterministic function of the sf tables,
so the read-back result is oracle-stable); they exercise the actual commit /
delete / read machinery, not a simulation.

Parity rules as in queries.py: identical column aliases, md5 digests,
booleans compared raw, doubles rounded at the gate.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import corpus as C
from .operators.snapshot import SnapshotTable
from .queries_ext import load

# ---------------------------------------------------------------------------
# merge-on-read row-level deletes (takedown lists)
# ---------------------------------------------------------------------------


def q_snapshot_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Takedown via merge-on-read equality deletes
    (operators/snapshot.SnapshotTable.delete): commit the documents table,
    delete doc_ids ≡ 0 (mod 7) WITHOUT rewriting data files, then re-append
    the even half of the deleted ids — which become visible again because a
    delete applies only to data files with a lower sequence number
    (Iceberg's equality-delete rule). The read is the merge-on-read
    anti-join plan over the final manifest."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    t = SnapshotTable(tempfile.mkdtemp(prefix="snapdel-"))
    t.commit(docs, "base")
    t.delete(docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"), "takedown")
    t.commit(
        docs.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 2 == 0)),
        "reappend",
    )
    return t.read(spark).orderBy("doc_id")


_SNAPSHOT_DELETE_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id % 7 <> 0 OR doc_id % 2 = 0
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# incremental cross-snapshot dedup
# ---------------------------------------------------------------------------


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Incremental crawl dedup (SnapshotTable.dedup_append): the
    accumulated corpus is docs with doc_id % 3 != 0; the new increment is
    the even ids. Only increment rows whose content digest is absent from
    the corpus are appended (anti-join against the stored digest sidecar —
    a single-column scan, the corpus text is never re-read); the result is
    the incremental read of exactly what the commit added."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    t = SnapshotTable(tempfile.mkdtemp(prefix="incdedup-"))
    t.dedup_append(spark, docs.filter(F.col("doc_id") % 3 != 0), run_id="corpus")
    v, _n = t.dedup_append(spark, docs.filter(F.col("doc_id") % 2 == 0),
                           run_id="crawl-1")
    return t.read_added(spark, v).select("doc_id", "lang").orderBy("doc_id")


_INCREMENTAL_DEDUP_SQL = """
WITH corpus AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 3 <> 0
), inc AS (
  SELECT doc_id, lang, md5(text) AS h,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents WHERE doc_id % 2 = 0
)
SELECT doc_id, lang FROM inc
WHERE rn = 1 AND NOT EXISTS (SELECT 1 FROM corpus WHERE corpus.h = inc.h)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Gopher document-quality rules
# ---------------------------------------------------------------------------

# the sf fixture's documents are shorter than real web pages; a 20-word
# floor keeps both rule outcomes represented in the oracle comparison
_GOPHER_MIN_WORDS = 20


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """☆ Full Gopher quality rule set (Rae et al. 2021 Table A1) as one
    JVM-side Catalyst projection (operators/corpus.gopher_rules): per-rule
    booleans + keep verdict per document."""
    d = load(spark, sf_dir, "documents")
    out = C.gopher_rules(d, min_words=_GOPHER_MIN_WORDS)
    return out.select(
        "doc_id", "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
        "keep",
    ).orderBy("doc_id")


def _gopher_rules_sql() -> str:
    return C.gopher_rules_sql("documents", min_words=_GOPHER_MIN_WORDS) + " ORDER BY doc_id"


R5_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "snapshot_delete": (q_snapshot_delete, _SNAPSHOT_DELETE_SQL),
    "incremental_dedup": (q_incremental_dedup, _INCREMENTAL_DEDUP_SQL),
    "gopher_rules": (q_gopher_rules, _gopher_rules_sql()),
}
