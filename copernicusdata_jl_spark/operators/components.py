"""Connected components + duplicate-cluster resolution.

The dedup operators (operators/dedup.py) emit near-duplicate PAIRS
(id_a, id_b). A production training-data pipeline must go one step
further: group pairs into duplicate CLUSTERS and keep exactly one
canonical survivor per cluster. Transitivity matters — if A~B and B~C,
all three are one cluster even when A~C was never emitted — so this is
connected components over the pair graph.

Reference parity: the reference has no graph operator; this extends its
dedup-adjacent semantics (latest-granule-wins selection, reference
src/YAXTrees.jl:311 tile naming / product selection) the same way the
north rule extends its bbox filter to spatial joins.

Scale design (10^12 docs / 10^10 edges):
- Min-label propagation with POINTER JUMPING: each round every vertex
  takes the min of (its label, its neighbors' labels, its label's
  label).  The extra label(label(v)) hop is the classic pointer-jumping
  trick — label chains halve every round, so convergence is
  O(log(diameter)) rounds instead of O(diameter).  Near-dup clusters
  are overwhelmingly tiny (pairs share ≥0.8 Jaccard), so in practice
  2-4 rounds; the alternating large-star/small-star formulation
  (Kiveris et al., SoCC'14) is the fallback if a pathological
  boilerplate mega-cluster ever dominates.
- Each round is one edge join + one groupBy(min): two shuffles of
  (id, comp) longs only — no payload columns ever move.
- Convergence is detected by counting changed labels (a scalar
  aggregate per round, not a data collect); rounds persist their label
  frame and unpersist the previous one (no cache leak across rounds).
- Vertices absent from any edge keep their own id as component — they
  are unioned in at the end without entering the iteration, so the
  loop's working set is only the ~few-% of docs that have a duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    id_col: str = "id",
    max_rounds: int = 20,
) -> DataFrame:
    """Components of the undirected graph given by ``edges`` →
    ``(id, component_id)`` where ``component_id`` is the minimum vertex
    id in the component (deterministic canonical representative).

    ``vertices`` (optional, one ``id_col`` column) adds isolated
    vertices: each comes back as its own singleton component without
    joining the propagation loop.
    """
    sym = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).union(edges.select(F.col(dst_col).alias("_s"), F.col(src_col).alias("_d"))).persist()

    lab = (
        sym.select(F.col("_s").alias(id_col))
        .distinct()
        .select(F.col(id_col), F.col(id_col).alias("component_id"))
        .persist()
    )
    if lab.isEmpty():
        lab.unpersist()
        out = lab
    else:
        # convergence probe: labels only ever DECREASE, so the label
        # assignment is a fixpoint iff sum(component_id) is unchanged —
        # one aggregate on the new frame (the same job that materializes
        # its cache), no join against the previous round needed.
        # decimal(38,0) keeps the sum exact at 10^12 × 64-bit ids.
        def _label_sum(df: DataFrame):
            return df.agg(F.sum(F.col("component_id").cast("decimal(38,0)"))).first()[0]

        prev_sum = None
        for _ in range(max_rounds):
            nbr = sym.join(
                lab.withColumnRenamed(id_col, "_s"), "_s"
            ).select(F.col("_d").alias(id_col), "component_id")
            hop = (
                lab.alias("a")
                .join(
                    lab.select(
                        F.col(id_col).alias("component_id"),
                        F.col("component_id").alias("_c2"),
                    ).alias("b"),
                    "component_id",
                )
                .select(F.col(f"a.{id_col}").alias(id_col), F.col("_c2").alias("component_id"))
            )
            new = (
                lab.unionByName(nbr)
                .unionByName(hop)
                .groupBy(id_col)
                .agg(F.min("component_id").alias("component_id"))
                .persist()
            )
            new_sum = _label_sum(new)
            lab.unpersist()
            lab = new
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        # truncate the round lineage and release every loop cache: the
        # result is a localCheckpointed (id, comp) frame, so downstream
        # actions never re-walk the propagation rounds (and the final
        # round's persist doesn't leak — the knn.py lesson, ADVICE r2)
        out = lab.localCheckpoint(eager=True)
        lab.unpersist()
    sym.unpersist()
    if vertices is not None:
        iso = vertices.select(F.col(id_col)).distinct().join(
            out.select(id_col), id_col, "left_anti"
        )
        out = out.unionByName(
            iso.select(F.col(id_col), F.col(id_col).alias("component_id"))
        )
    return out


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Full cluster resolution over a corpus: every doc labeled with its
    duplicate-cluster ``component_id`` and an ``is_survivor`` flag (1 for
    the cluster's minimum id — the canonical copy a dedup keeps, 0 for
    every shadowed duplicate).  Docs with no near-dup pair survive as
    their own singleton cluster."""
    comp = connected_components(
        pairs,
        vertices=docs.select(F.col(id_col).alias("id")),
        src_col=src_col,
        dst_col=dst_col,
        id_col="id",
    )
    return comp.select(
        F.col("id").alias(id_col),
        "component_id",
        (F.col("id") == F.col("component_id")).cast("int").alias("is_survivor"),
    )
