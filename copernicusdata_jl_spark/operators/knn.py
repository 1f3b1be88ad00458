"""☆ J4: kNN join via cell k-ring expansion (SURVEY.md §2.3).

The reference's geolocated-granule model (per-pixel lat/lon variables,
reference docs/src/examples.md:44-46) generalizes to: index points to EQC
cells, expand each query's cell to its radius-k Moore ring (JVM array
expression, antimeridian-wrapped), equi-join candidates on cell id, rank by
exact haversine, keep k.

Scale design: queries are the small side and broadcast after the k-ring
explode — the point table never shuffles and is touched once with its
cell id computed in whole-stage codegen. Candidate count per query is
bounded by ring area × cell density; escalate ``k_ring`` (or coarsen
``res``) when a query's ring under-fills, never scan beyond the ring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cells, geo


def topk_per_group(df: DataFrame, group_cols: list, order_cols: list, k: int,
                   rank_col: str = "rank") -> DataFrame:
    """Two-phase top-k: local row_number within (group, input-partition)
    prunes to ≤ k rows per group per partition, then the global window
    ranks the survivors. A single window over the group key sorts the
    ENTIRE group on however few reducers there are groups — with 5 queries
    over 10^12 points that is 5 reducers sorting everything; two-phase
    bounds the final sort at k × num_partitions rows per group. Output is
    identical to the one-window form (local top-k is a superset of the
    global top-k)."""
    w1 = Window.partitionBy(*group_cols, F.spark_partition_id()).orderBy(*order_cols)
    local = df.withColumn("_lr", F.row_number().over(w1)).filter(F.col("_lr") <= k).drop("_lr")
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return local.withColumn(rank_col, F.row_number().over(w2)).filter(F.col(rank_col) <= k)


def knn_kring(
    points: DataFrame,
    queries: DataFrame,
    res: int = 6,
    k_ring: int = 2,
    k: int = 5,
    lat_col: str = "lat",
    lon_col: str = "lon",
    qlat_col: str = "qlat",
    qlon_col: str = "qlon",
    query_id_col: str = "query_id",
    point_id_col: str = "event_id",
) -> DataFrame:
    """Top-k nearest points per query among the query's k-ring candidate
    cells → (query_id, point_id, rank, dist_m)."""
    pts = points.withColumn("cell_id", cells.latlng_to_cell_expr(lat_col, lon_col, res))
    q = queries.withColumn("qcell", cells.latlng_to_cell_expr(qlat_col, qlon_col, res))
    qx = q.withColumn("cell_id", F.explode(cells.kring_expr(F.col("qcell"), res, k_ring))).select(
        query_id_col, qlat_col, qlon_col, "cell_id"
    )
    cand = pts.join(F.broadcast(qx), "cell_id")
    dist = F.round(
        geo.haversine_m_expr(F.col(lat_col), F.col(lon_col), F.col(qlat_col), F.col(qlon_col)), 3
    )
    ranked = topk_per_group(
        cand.withColumn("dist_m", dist),
        [query_id_col],
        [F.asc("dist_m"), F.asc(point_id_col)],
        k,
    )
    return ranked.select(query_id_col, point_id_col, "rank", "dist_m")
