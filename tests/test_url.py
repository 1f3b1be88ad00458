"""URL canonicalization + repetition-filter unit tests (crawl hygiene
ahead of url dedup — functions/url.py, functions/text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from copernicusdata_jl_spark.functions.text import repetition_ratio_expr
from copernicusdata_jl_spark.functions.url import canonicalize_url_expr

CASES = [
    # fragment + tracking params + unsorted query + mixed case + default port
    ("HTTPS://Example.COM:443/Path/X?utm_source=a&b=2&a=1#frag",
     "https://example.com/Path/X?a=1&b=2"),
    ("http://HOST.example:80/p?gclid=g&fbclid=f",
     "http://host.example/p"),
    # non-default port survives; param order normalizes; path case preserved
    ("https://Host.example:8443/A/B?z=1&a=2",
     "https://host.example:8443/A/B?a=2&z=1"),
    # no query, no fragment — untouched apart from case
    ("HTTP://WWW.Example.com/Q", "http://www.example.com/Q"),
    # utm param in the middle; empty param segments dropped
    ("https://e.com/p?a=1&utm_campaign=x&b=2", "https://e.com/p?a=1&b=2"),
    # scheme-less / malformed urls pass through UNCHANGED (no '://' mangling)
    ("example.com/x?b=2&a=1", "example.com/x?b=2&a=1"),
    ("//Host.example/protocol-relative", "//Host.example/protocol-relative"),
    ("/relative/Path#frag", "/relative/Path#frag"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _want) in enumerate(CASES)], ["i", "url"]
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonicalize_url_expr(F.col("url")).alias("c")).collect()
    }
    for i, (_raw, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i], got[i])


def test_canonicalize_url_is_jvm_side(spark):
    df = spark.range(4).select(
        canonicalize_url_expr(
            F.concat(F.lit("https://E.com/p/"), F.col("id").cast("string"))
        ).alias("c")
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_ratio_bounds_and_discrimination(spark):
    rows = [
        (0, "a b " * 20),                      # maximally repetitive
        (1, " ".join(f"w{i}" for i in range(40))),  # all-distinct prose
        (2, "x y"),                            # shorter than n -> 0.0
        (3, None),                             # NULL -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.rep
        for r in df.select(
            "doc_id", repetition_ratio_expr(F.col("text"), 3).alias("rep")
        ).collect()
    }
    assert got[0] > 0.9
    assert got[1] == 0.0
    assert got[2] == 0.0 and got[3] == 0.0
