"""Flagship pipeline: deterministic outputs across parallelism/partitioning
(the golden-output + scaling-consistency contract, SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from copernicusdata_jl_spark import flagship
from copernicusdata_jl_spark.functions.text import expected_text


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fp") / "pages.parquet")
    flagship.build_pages(spark, 3000, 4).write.parquet(p)
    return p


def test_build_pages_deterministic(spark, pages_path):
    again = flagship.build_pages(spark, 3000, 9)  # different partitioning
    a = spark.read.parquet(pages_path).orderBy("url", "warc_ts").collect()
    b = again.orderBy("url", "warc_ts").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 3150  # 3000 + 5% dups


def test_extracted_text_matches_golden(spark, pages_path):
    stages = flagship.flagship_pipeline(spark.read.parquet(pages_path))
    sample = stages["extracted"].filter(F.col("url").endswith("/p/42")).select("text").first()
    assert sample.text == expected_text(42)  # byte-identical per-row invariant


def test_dedup_keeps_latest(spark, pages_path):
    stages = flagship.flagship_pipeline(spark.read.parquet(pages_path))
    dd = stages["deduped"]
    assert dd.count() == 3000
    assert dd.groupBy("url").count().filter(F.col("count") > 1).count() == 0
    # a duplicated url keeps the +30d timestamp
    dup_url = spark.read.parquet(pages_path).groupBy("url").count().filter(F.col("count") == 2).first().url
    kept = dd.filter(F.col("url") == dup_url).first()
    orig = spark.read.parquet(pages_path).filter(F.col("url") == dup_url).agg(F.max("warc_ts")).first()[0]
    assert kept.warc_ts == orig


def test_pipeline_outputs_stable_across_parallelism(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    s1 = flagship.flagship_pipeline(pages.repartition(2))
    s2 = flagship.flagship_pipeline(pages.repartition(11))
    t1 = sorted(map(tuple, s1["tiles"].collect()))
    t2 = sorted(map(tuple, s2["tiles"].collect()))
    assert t1 == t2 and len(t1) > 0
    l1 = sorted(map(tuple, s1["lineage"].collect()))
    l2 = sorted(map(tuple, s2["lineage"].collect()))
    assert l1 == l2  # checksums order-insensitive -> partitioning-invariant


def test_run_flagship_metrics(spark, pages_path, tmp_path):
    m = flagship.run_flagship(spark, pages_path, checkpoint_path=str(tmp_path / "ck"))
    assert m["n_docs"] == 3150 and m["docs_per_sec"] > 0
    assert m["n_tile_assignments"] >= m["n_tiles"] > 0
    ck = spark.read.parquet(str(tmp_path / "ck"))
    assert ck.count() == int(m["n_lineage_buckets"])


def test_dedup_strategies_identical(spark, pages_path):
    """window and aggregate dedup must produce the same surviving rows."""
    pages = spark.read.parquet(pages_path)
    a = sorted(map(tuple, flagship.prepare_corpus(pages, "window")["deduped"].collect()))
    b = sorted(map(tuple, flagship.prepare_corpus(pages, "aggregate")["deduped"].collect()))
    assert a == b and len(a) == 3000


def test_dedup_full_tie_key_duplicates_keep_one_whole_row(spark, pages_path):
    """On full (url, warc_ts, html) tie-key duplicates, the aggregate
    strategy must keep exactly ONE whole input row (single max_by over the
    payload struct), not a per-column mix whose lang/lat/lon depend on
    Spark's encounter order — and must match the window strategy."""
    pages = spark.read.parquet(pages_path).limit(50)
    ties = pages.withColumn("lang", F.lit("zz")).withColumn("lat", F.col("lat") + 1.0)
    both = pages.unionByName(ties).repartition(7)
    agg = flagship.prepare_corpus(both, "aggregate")["deduped"]
    assert agg.count() == 50
    rows = {tuple(r) for r in pages.collect()} | {tuple(r) for r in ties.collect()}
    for r in agg.collect():
        assert tuple(r) in rows, "aggregate dedup mixed columns across tied rows"


def test_bucketed_dedup_is_shuffle_free(spark, pages_path):
    """Production layout (VERDICT r1 top-next): over the url-bucketed pages
    table (the Iceberg bucket-partition analog), the dedup + extraction
    segment plans with ZERO Exchange — html never crosses a shuffle."""
    pages = spark.read.parquet(pages_path)
    flagship.write_pages_bucketed(pages, table="pages_bucketed_test", buckets=8)
    t = spark.table("pages_bucketed_test")
    for strategy in ("aggregate", "window"):
        corpus = flagship.prepare_corpus(t, strategy=strategy)["extracted"]
        plan = corpus._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{strategy} dedup shuffled on bucketed input"
    # and the answer is identical to the plain-parquet path
    a = sorted(map(tuple, flagship.prepare_corpus(t, "aggregate")["deduped"].collect()))
    b = sorted(map(tuple, flagship.prepare_corpus(pages, "window")["deduped"].collect()))
    assert a == b
    # cross-session re-registration DDL reads the same rows shuffle-free
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    import os

    t2 = flagship.register_pages_bucketed(
        spark, os.path.join(wh, "pages_bucketed_test"), table="pages_bucketed_reg", buckets=8
    )
    corpus2 = flagship.prepare_corpus(t2, "aggregate")["extracted"]
    assert "Exchange" not in corpus2._jdf.queryExecution().executedPlan().toString()
    assert t2.count() == 3150
    spark.sql("DROP TABLE IF EXISTS pages_bucketed_reg")
    spark.sql("DROP TABLE IF EXISTS pages_bucketed_test")
