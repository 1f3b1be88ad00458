"""Spatial join: cell-cover candidate generation + exact PIP refinement.

Generalizes the reference's lat/lon bounding-box subsetting over per-pixel
coordinate variables (reference test/test_yaxtree.jl:299-302 ``Where``
selector; notebooks/slstr_l2_frp.ipynb cell 8 box plots) to polygon joins at
scale: coarse filter = EQC cell equi-join against a compacted polygon cover;
exact filter = vectorized ray-cast PIP (Arrow-batched) on boundary cells
only. Interior-cell matches skip PIP entirely — at 100 TB, interior cells
dominate (area ∝ cells², boundary ∝ cells), so the expensive kernel touches
only the O(perimeter) fraction of candidates.

Two physical strategies, picked by cover size:

- ``broadcast`` (default): covers uncompacted to page resolution and
  broadcast — a BroadcastHashJoin on ``cell_id``; the big side never
  shuffles. Right whenever the uncompacted cover fits the broadcast
  threshold (polygon sets up to ~10^6 cells).
- ``sortmerge``: pages explode to their parent-cell chain (res_min..res) —
  ~4 keys/row — and sort-merge-join the *compacted* cover on ``cell_id``.
  Right when covers are too big to broadcast; both sides can be bucketed by
  ``cell_id`` in storage to make the shuffle a no-op.

Skew: hot cells (mega-hosts, dense cities) are handled by AQE skew-join in
the sortmerge path and are a non-issue in the broadcast path (no shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cells, geo

COVER_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.StringType()),
        T.StructField("cell_id", T.LongType()),
        T.StructField("is_boundary", T.BooleanType()),
    ]
)


def build_covers(
    polygons: list[dict],
    res: int,
    id_key: str = "poly_id",
    compact: bool = True,
) -> pd.DataFrame:
    """Compute compacted covers for a polygon list (driver-side NumPy; the
    polygon side is small — this is the reference's ADF/broadcast shape,
    reference src/EOTriggering.jl:156-168). Antimeridian polygons are split
    first. Returns pandas (poly_id, cell_id, is_boundary)."""
    ids: list[str] = []
    cids: list[int] = []
    bnds: list[bool] = []
    for poly in polygons:
        rings = [np.asarray(r, dtype=np.float64) for r in poly["rings"]]
        for part in geo.split_antimeridian(rings):
            cover, boundary = geo.polygon_cover(part, res=res, compact=compact)
            ids.extend([poly[id_key]] * len(cover))
            cids.extend(cover.tolist())
            bnds.extend(boundary.tolist())
    return pd.DataFrame({"poly_id": ids, "cell_id": cids, "is_boundary": bnds})


def covers_df(spark: SparkSession, polygons: list[dict], res: int, id_key: str = "poly_id", compact: bool = True) -> DataFrame:
    pdf = build_covers(polygons, res, id_key=id_key, compact=compact)
    return spark.createDataFrame(pdf, schema=COVER_SCHEMA)


def _uncompact_cover_pdf(cover: pd.DataFrame, res: int) -> pd.DataFrame:
    """Expand compacted interior cells to uniform page resolution."""
    rows_id: list[str] = []
    rows_cell: list[int] = []
    rows_b: list[bool] = []
    for pid, cid, b in cover.itertuples(index=False):
        r = int(cid) >> cells.RES_BITS
        if r == res:
            rows_id.append(pid)
            rows_cell.append(int(cid))
            rows_b.append(bool(b))
        else:
            for leaf in cells.uncompact_cells(np.array([cid]), res).tolist():
                rows_id.append(pid)
                rows_cell.append(leaf)
                rows_b.append(bool(b))
    return pd.DataFrame({"poly_id": rows_id, "cell_id": rows_cell, "is_boundary": rows_b})


def make_pip_udf(spark: SparkSession, polygons: list[dict], id_key: str = "poly_id"):
    """Arrow-batched PIP refinement: (lat, lon, poly_id) -> bool.

    Polygon rings ship once per executor via a Spark broadcast (not
    re-pickled per task); inside each Arrow batch points are grouped by
    polygon and ray-cast vectorized."""
    # antimeridian crossers are tested against their split parts (inside any)
    parts_by_id = {
        p[id_key]: geo.split_antimeridian([np.asarray(r, dtype=np.float64) for r in p["rings"]])
        for p in polygons
    }
    bc = spark.sparkContext.broadcast(parts_by_id)

    @F.pandas_udf(T.BooleanType())
    def pip(lat: pd.Series, lon: pd.Series, poly_id: pd.Series) -> pd.Series:
        table = bc.value
        out = np.zeros(len(lat), dtype=bool)
        la = lat.to_numpy(dtype=np.float64)
        lo = lon.to_numpy(dtype=np.float64)
        poly_id = poly_id.reset_index(drop=True)
        for pid, idx in poly_id.groupby(poly_id).groups.items():
            parts = table.get(pid)
            if parts is None:
                continue
            ix = np.asarray(idx)
            hit = np.zeros(len(ix), dtype=bool)
            for rings in parts:
                hit |= geo.points_in_rings(la[ix], lo[ix], rings)
            out[ix] = hit
        return pd.Series(out)

    return pip


def spatial_join(
    points: DataFrame,
    polygons: list[dict],
    res: int = 8,
    id_key: str = "poly_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    strategy: str = "broadcast",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Join points to containing polygons.

    Returns points' ``keep_cols`` + ``poly_id`` + ``match_kind``
    (``interior`` | ``boundary``). Exactly the rows where the point is
    inside the polygon (even-odd rule, half-open on horizontal edges).
    """
    spark = points.sparkSession
    keep_cols = keep_cols or [c for c in points.columns if c not in (lat_col, lon_col)]
    pts = points.withColumn("cell_id", cells.latlng_to_cell_expr(lat_col, lon_col, res))

    cover_pdf = build_covers(polygons, res, id_key=id_key, compact=True)

    if strategy == "broadcast":
        flat = _uncompact_cover_pdf(cover_pdf, res)
        cover = spark.createDataFrame(flat, schema=COVER_SCHEMA)
        cand = pts.join(F.broadcast(cover), "cell_id", "inner")
    elif strategy == "sortmerge":
        res_list = sorted({int(c) >> cells.RES_BITS for c in cover_pdf["cell_id"]})
        parents = F.array(
            *[cells.cell_parent_expr(F.col("cell_id"), res, r) for r in res_list]
        )
        exploded = pts.withColumn("join_cell", F.explode(parents))
        cover = spark.createDataFrame(cover_pdf, schema=COVER_SCHEMA).withColumnRenamed(
            "cell_id", "join_cell"
        )
        # hint both sides into a shuffle merge join (covers may be huge)
        cand = exploded.join(cover.hint("merge"), "join_cell", "inner")
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    pip = make_pip_udf(spark, polygons, id_key=id_key)
    refined = cand.filter(
        (~F.col("is_boundary")) | pip(F.col(lat_col), F.col(lon_col), F.col("poly_id"))
    )
    return refined.select(
        *keep_cols,
        lat_col,
        lon_col,
        F.col("poly_id"),
        F.when(F.col("is_boundary"), F.lit("boundary")).otherwise(F.lit("interior")).alias("match_kind"),
    )


def tile_pyramid(
    events: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    res_fine: int = 7,
    res_coarse: int = 4,
) -> DataFrame:
    """Multi-resolution tile pyramid (the raster overview / map-tile
    rollup the reference's granule tiling implies, src/YAXTrees.jl
    chunk_sizes + notebooks' per-tile rendering — generalized to cell
    counts): one row per (res, cell) for every resolution in
    ``[res_coarse, res_fine]`` with event counts and the number of
    res_fine cells covered.

    Scale shape: the EVENT table is scanned and aggregated exactly once
    (at ``res_fine``, map-side partials) — the finest aggregate is
    materialized with an eager ``localCheckpoint`` because a plain union
    of levels would re-plan that whole lineage per level (Spark performs
    no cross-branch subplan sharing), turning one event scan into
    ``n_levels`` scans at 100 TB. Every coarser level then re-aggregates
    the PREVIOUS level's (cell, n) rows — input shrinks geometrically
    (≥4× per level on this quadtree), so levels beyond the first cost
    ~nothing. Parent derivation composes (floor-div chain), pinned
    against direct fine→level truncation in the oracle twin.
    """
    base = (
        events.select(
            cells.latlng_to_cell_expr(lat_col, lon_col, res_fine).alias("cell_id")
        )
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit(res_fine).alias("res"),
            "cell_id",
            "n_events",
            F.lit(1).cast("long").alias("n_fine_cells"),
        )
        .localCheckpoint(eager=True)
    )
    levels = [base]
    prev, prev_res = base, res_fine
    for r in range(res_fine - 1, res_coarse - 1, -1):
        nxt = (
            prev.select(
                cells.cell_parent_expr(F.col("cell_id"), prev_res, r).alias("cell_id"),
                "n_events",
                "n_fine_cells",
            )
            .groupBy("cell_id")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("n_fine_cells").alias("n_fine_cells"),
            )
            .select(F.lit(r).alias("res"), "cell_id", "n_events", "n_fine_cells")
        )
        levels.append(nxt)
        prev, prev_res = nxt, r
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def compact_cells_df(
    cells_df: DataFrame,
    cell_col: str = "cell_id",
    *,
    from_res: int,
    to_res: int,
) -> DataFrame:
    """Distributed cover compaction (H3 ``compact_cells`` semantics on the
    EQC quadtree, reference SURVEY §2.8 ☆): given a set of cells at uniform
    ``from_res``, repeatedly replace any complete sibling quad (all 4
    children of one parent present) with the parent, down to ``to_res``.
    The driver-side NumPy twin is functions/cells.compact_cells; this is
    the DataFrame flavor for covers too large to collect (a continental
    polygon at res 12+, or a corpus-derived occupancy mask).

    Returns ``(res, cell_id)`` — the mixed-resolution compacted cover.

    Scale shape: one Exchange per level, not three — each level sorts by
    the parent key ONCE (window count over parent), the keep/promote
    split is map-side on the counted rows, and the promoted-parent dedup
    reuses the window's hash partitioning (Catalyst sees the distribution
    satisfied, so dropDuplicates adds no shuffle). Input shrinks ≥4× per
    promoted level, so the level loop's total cost is a constant factor
    of the first level. Promotion cascades exactly like the driver twin:
    a parent promoted at level r re-enters the quad test at r-1.
    """
    from pyspark.sql import Window

    if from_res <= to_res:
        raise ValueError("from_res must be > to_res")
    cur = cells_df.select(F.col(cell_col).alias("cell_id")).distinct()
    kept: list[DataFrame] = []
    for r in range(from_res, to_res, -1):
        t = cur.select(
            "cell_id",
            cells.cell_parent_expr(F.col("cell_id"), r, r - 1).alias("parent"),
        ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("parent")))
        kept.append(
            t.filter(F.col("n") < 4).select(F.lit(r).alias("res"), "cell_id")
        )
        cur = (
            t.filter(F.col("n") == 4)
            .select(F.col("parent").alias("cell_id"))
            .dropDuplicates(["cell_id"])
        )
    out = cur.select(F.lit(to_res).alias("res"), "cell_id")
    for k in kept:
        out = out.unionByName(k)
    return out
