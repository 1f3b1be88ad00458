"""Spatial join end-to-end on Spark: both strategies must equal exact PIP.

This is the engine's golden-parity analog of the reference's structural
`isomorphic` + value assertions (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from copernicusdata_jl_spark.functions import cells, geo
from copernicusdata_jl_spark.operators.spatial_join import spatial_join

POLYGONS = [
    {"poly_id": "SQ", "rings": [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]]},
    {
        "poly_id": "CC",
        "rings": [
            [[20.0, 0.0], [30.0, 0.0], [30.0, 3.0], [23.0, 3.0], [23.0, 7.0], [30.0, 7.0], [30.0, 10.0], [20.0, 10.0]]
        ],
    },
    {
        "poly_id": "AM",  # antimeridian crosser: lon 177..-177
        "rings": [[[177.0, -5.0], [-177.0, -5.0], [-177.0, 5.0], [177.0, 5.0]]],
    },
]


def exact_matches(lat, lon):
    out = []
    for p in POLYGONS:
        rings = [np.asarray(r) for r in p["rings"]]
        mask = np.zeros(len(lat), dtype=bool)
        for part in geo.split_antimeridian(rings):
            mask |= geo.points_in_rings(lat, lon, part)
        out.append(mask)
    return out


@pytest.fixture(scope="module")
def points_pdf():
    rng = np.random.default_rng(7)
    n = 3000
    lat = rng.uniform(-12, 15, n)
    lon = rng.uniform(-20, 35, n)
    # cluster near the antimeridian too
    lon[:300] = np.where(rng.random(300) < 0.5, rng.uniform(176, 180, 300), rng.uniform(-180, -176, 300))
    return pd.DataFrame({"pid": np.arange(n, dtype=np.int64), "lat": lat, "lon": lon})


@pytest.mark.parametrize("strategy", ["broadcast", "sortmerge"])
def test_spatial_join_matches_exact_pip(spark, points_pdf, strategy):
    df = spark.createDataFrame(points_pdf).repartition(6)
    got = (
        spatial_join(df, POLYGONS, res=7, strategy=strategy, keep_cols=["pid"])
        .select("pid", "poly_id")
        .toPandas()
    )
    got_set = set(map(tuple, got.itertuples(index=False)))
    lat = points_pdf["lat"].to_numpy()
    lon = points_pdf["lon"].to_numpy()
    want_set = set()
    for p, mask in zip(POLYGONS, exact_matches(lat, lon)):
        for pid in points_pdf["pid"].to_numpy()[mask].tolist():
            want_set.add((pid, p["poly_id"]))
    assert got_set == want_set
    assert len(got) == len(got_set)  # no duplicate candidate rows


def test_interior_rows_skip_pip(spark, points_pdf):
    df = spark.createDataFrame(points_pdf)
    got = spatial_join(df, POLYGONS, res=7, keep_cols=["pid"]).toPandas()
    kinds = got["match_kind"].value_counts()
    assert kinds.get("interior", 0) > 0 and kinds.get("boundary", 0) > 0
    # interior-marked points must be strictly inside
    sq = got[(got["poly_id"] == "SQ") & (got["match_kind"] == "interior")]
    assert ((sq["lat"] > 0) & (sq["lat"] < 10) & (sq["lon"] > 0) & (sq["lon"] < 10)).all()


def test_cell_expr_matches_numpy(spark):
    pdf = pd.DataFrame(
        {
            "lat": np.linspace(-89.9, 89.9, 500),
            "lon": np.linspace(-179.9, 179.9, 500),
        }
    )
    df = spark.createDataFrame(pdf)
    for res in (3, 8, 12):
        got = (
            df.select(cells.latlng_to_cell_expr("lat", "lon", res).alias("c"))
            .toPandas()["c"]
            .to_numpy()
        )
        want = cells.latlng_to_cell(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), res)
        assert np.array_equal(got, want)


def test_kring_expr_matches_numpy(spark):
    pdf = pd.DataFrame({"lat": [10.0, 89.9, -89.9, 0.0], "lon": [-179.99, 0.0, 179.99, 5.0]})
    df = spark.createDataFrame(pdf).withColumn(
        "cell_id", cells.latlng_to_cell_expr("lat", "lon", 8)
    )
    rows = df.select("cell_id", cells.kring_expr("cell_id", 8, 2).alias("ring")).collect()
    for r in rows:
        assert sorted(r["ring"]) == cells.grid_disk(int(r["cell_id"]), 2)


def test_tile_pyramid_levels_consistent(spark):
    """Every level conserves the event total; n_fine_cells sums to the
    fine-level cell count; each level has <= the previous level's cells."""
    from copernicusdata_jl_spark.operators.spatial_join import tile_pyramid
    from copernicusdata_jl_spark.queries import geotagged_events
    from conftest import SF_DIR

    ev = geotagged_events(spark, SF_DIR)
    pyr = tile_pyramid(ev, res_fine=7, res_coarse=4).collect()
    by_res: dict[int, list] = {}
    for r in pyr:
        by_res.setdefault(r["res"], []).append(r)
    total = ev.count()
    n_fine = len(by_res[7])
    sizes = []
    for res in (7, 6, 5, 4):
        rows = by_res[res]
        assert sum(x["n_events"] for x in rows) == total
        assert sum(x["n_fine_cells"] for x in rows) == n_fine
        sizes.append(len(rows))
    assert sizes == sorted(sizes, reverse=True)
