"""Bucketed co-located join: the shuffle must disappear from the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from copernicusdata_jl_spark.functions import cells
from copernicusdata_jl_spark.operators import bucketing as B


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("buckets")
    pages = spark.range(5000).select(
        F.col("id").alias("page_id"),
        cells.latlng_to_cell_expr(
            (F.col("id") % 170 - 85).cast("double"), (F.col("id") % 350 - 175).cast("double"), 6
        ).alias("cell_id"),
    )
    covers = spark.range(0, 5000, 3).select(
        F.col("id").alias("poly_id"),
        cells.latlng_to_cell_expr(
            (F.col("id") % 170 - 85).cast("double"), (F.col("id") % 350 - 175).cast("double"), 6
        ).alias("cell_id"),
    )
    B.write_bucketed(pages, "pages_b", "cell_id", 8, path=str(d / "pages_b"))
    B.write_bucketed(covers, "covers_b", "cell_id", 8, path=str(d / "covers_b"))
    yield "pages_b", "covers_b"
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS covers_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = B.colocated_join(spark, lt, rt, "cell_id")
    assert not B.has_shuffle(j)  # co-located: no shuffle Exchange in the plan
    assert j.count() > 0


def test_plain_join_shuffles_for_contrast(spark, bucketed_tables):
    lt, rt = bucketed_tables
    a = spark.table(lt).repartition(5)  # break the bucket layout
    b = spark.table(rt)
    j = a.hint("merge").join(b, "cell_id")
    assert B.has_shuffle(j)


def test_bucketed_results_match_plain(spark, bucketed_tables):
    lt, rt = bucketed_tables
    fast = sorted(map(tuple, B.colocated_join(spark, lt, rt, "cell_id").collect()))
    slow = sorted(map(tuple, spark.table(lt).repartition(7).join(spark.table(rt), "cell_id").collect()))
    assert fast == slow
