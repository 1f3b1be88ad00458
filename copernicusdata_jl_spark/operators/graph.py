"""Host-graph ranking: weighted PageRank over a (src, dst) edge table.

A web-scale training-data pipeline ranks HOSTS, not documents: link-graph
authority is a standard quality prior (CommonCrawl host ranks, Gopher's
"sources ranked by quality", CCNet's per-domain buckets), and the host
graph is ~10^7 nodes even when the corpus is 10^12 documents — the rank
table is a broadcast-sized sidecar the hygiene chain can join for free.

Reference parity: the reference has no graph operator; this extends its
selection semantics the same way operators/components.py extends its
dedup-adjacent semantics (see that module's header). Both are the
iterative-graph half of the ☆ LLM-pipeline suite (SURVEY §2.13).

Scale design (10^7 hosts / 10^10 edges):
- The transition matrix (src, dst, p = w/out_w) is materialized ONCE
  before the loop — the per-edge division never re-runs, and the loop's
  joins carry only (host, rank) pairs against it. No payload columns
  ever move.
- Each iteration is one shuffle join (ranks × transitions on src) + one
  groupBy(dst) sum — map-side partial aggregation applies, so the
  shuffle volume is bounded by the host count, not the edge count.
- Dangling mass (rank parked on hosts with no out-links) is a ONE-ROW
  aggregate broadcast back into the update — never a driver round-trip
  of data-sized rows, never a skewed key.
- Every iteration ends in an eager localCheckpoint: lineage stays O(1)
  across rounds (the components.py / knn.py lesson) and the next
  round's dangling aggregate reads materialized rows instead of
  re-running the pipeline.
- Total rank is conserved at 1.0 by construction (the damping base,
  conserved link mass, and redistributed dangling mass sum to 1), so a
  drifting sum is a correctness alarm, not a tuning knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    nodes: DataFrame | None = None,
    id_col: str = "host",
) -> DataFrame:
    """Weighted PageRank → ``(id_col, rank)`` after a FIXED number of
    power iterations (deterministic output — convergence-threshold
    stopping would make the result depend on float noise).

    ``edges`` rows are (src, dst[, weight]); parallel edges are summed
    into one weighted edge. ``nodes`` (optional, one ``id_col`` column)
    fixes the node universe — hosts absent from it are dropped, hosts
    in it but absent from the edges rank as pure dangling/sink nodes.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), w.alias("_w"))
        .groupBy("_src", "_dst")
        .agg(F.sum("_w").alias("_w"))
    )
    if nodes is None:
        nodes = e.select(F.col("_src").alias(id_col)).union(
            e.select(F.col("_dst").alias(id_col))
        )
    nodes = nodes.select(F.col(id_col)).distinct().persist()
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return nodes.select(F.col(id_col), F.lit(0.0).alias("rank")).limit(0)

    # transition probabilities, built once outside the loop. Edges whose
    # endpoints fall outside the node universe are dropped BEFORE the
    # out-weight sum: out-degree must describe the surviving edges, or a
    # node with a dropped edge ships only part of its rank (mass leak).
    e = (
        e.join(nodes.select(F.col(id_col).alias("_src")), "_src", "left_semi")
        .join(nodes.select(F.col(id_col).alias("_dst")), "_dst", "left_semi")
    )
    outw = e.groupBy("_src").agg(F.sum("_w").alias("_ow"))
    trans = (
        e.join(outw, "_src")
        .select("_src", "_dst", (F.col("_w") / F.col("_ow")).alias("_p"))
        .persist()
    )
    has_out = trans.select(F.col("_src").alias(id_col)).distinct().persist()

    base = (1.0 - damping) / n
    ranks = nodes.select(F.col(id_col), F.lit(1.0 / n).alias("rank")).localCheckpoint(eager=True)
    for _ in range(iterations):
        dangling = ranks.join(has_out, id_col, "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contrib = (
            ranks.join(trans, ranks[id_col] == trans["_src"])
            .groupBy(F.col("_dst").alias(id_col))
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_c"))
        )
        new = (
            nodes.join(contrib, id_col, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                id_col,
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") / F.lit(float(n)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        ranks = new
    trans.unpersist()
    has_out.unpersist()
    nodes.unpersist()
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count of the UNDIRECTED simple graph induced by
    ``edges`` (direction, self-loops and parallel edges are normalized
    away first). Returns one row ``(n_nodes, n_edges, n_triangles)`` —
    the clustering signal a host-graph quality prior feeds on (link-farm
    neighborhoods are triangle-dense, legitimate hub/authority
    neighborhoods are star-like).

    Scale shape — degree-ordered wedge enumeration (the MapReduce-classic
    Suri & Vassilvitskii 2011 orientation): every edge is directed from
    its lower-(degree, id) endpoint to the higher one, making the
    oriented out-degree O(sqrt(E)) even for celebrity nodes. Each wedge
    (a→b, a→c) is then generated exactly once at its lowest-rank apex,
    and one join back onto the oriented edge set closes it. Two shuffle
    joins + one aggregate, no cartesian, skew bounded by the orientation
    — the standard plan that survives power-law host graphs at 10^10
    edges.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    ranked = und.join(da, "a").join(db, "b")
    lower_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lower_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lower_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    e1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("u"))
    e2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("w"))
    wedges = e1.join(e2, "apex").filter(F.col("u") < F.col("w"))
    # the closing-edge set is exactly the normalized undirected edge set
    closing = und.select(F.col("a").alias("u"), F.col("b").alias("w"))
    tri = wedges.join(closing, ["u", "w"], "left_semi")
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    nedges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    ntri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return nodes.crossJoin(nedges).crossJoin(ntri)
