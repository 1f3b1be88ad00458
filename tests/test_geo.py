"""Geometry kernel tests: PIP (vs scalar reference), covers, antimeridian.

The scalar ray-caster here is an independent reimplementation used only to
check the vectorized kernel (property-test style per SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from copernicusdata_jl_spark.functions import cells, geo


def scalar_pip(lat: float, lon: float, rings) -> bool:
    inside = False
    for ring in rings:
        r = np.asarray(ring, dtype=float)
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[0]])
        for i in range(len(r) - 1):
            x1, y1 = r[i]
            x2, y2 = r[i + 1]
            if y1 == y2:
                continue
            if (y1 <= lat) != (y2 <= lat):
                xint = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
                if lon < xint:
                    inside = not inside
    return inside


SQUARE = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])]
# concave "C" shape
CONCAVE = [
    np.array(
        [[0, 0], [10, 0], [10, 3], [3, 3], [3, 7], [10, 7], [10, 10], [0, 10]],
        dtype=float,
    )
]
DONUT = SQUARE + [np.array([[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0]])]


def test_pip_square():
    lat = np.array([5.0, -1.0, 10.5, 5.0])
    lon = np.array([5.0, 5.0, 5.0, 11.0])
    assert geo.points_in_rings(lat, lon, SQUARE).tolist() == [True, False, False, False]


def test_pip_concave_and_donut():
    lat = np.array([5.0, 5.0, 1.5])
    lon = np.array([5.0, 1.0, 5.0])
    assert geo.points_in_rings(lat, lon, CONCAVE).tolist() == [False, True, True]
    assert geo.points_in_rings(lat, lon, DONUT).tolist() == [False, True, True]


@given(
    st.floats(min_value=-12, max_value=22, allow_nan=False),
    st.floats(min_value=-12, max_value=22, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_pip_matches_scalar_reference(lat, lon):
    for rings in (SQUARE, CONCAVE, DONUT):
        got = bool(geo.points_in_rings(np.array([lat]), np.array([lon]), rings)[0])
        assert got == scalar_pip(lat, lon, rings)


def test_haversine_known_distance():
    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ≈ 343.5 km
    d = float(geo.haversine_m(48.8566, 2.3522, 51.5074, -0.1278))
    assert 340_000 < d < 348_000
    assert float(geo.haversine_m(0, 0, 0, 0)) == 0.0


def test_polygon_cover_classifies_interior_and_boundary():
    cover, boundary = geo.polygon_cover(SQUARE, res=7, compact=False)
    assert len(cover) > 4
    # every interior cell: all 4 corners strictly inside
    for cid, b in zip(cover.tolist(), boundary.tolist()):
        mnx, mny, mxx, mxy = (float(v[0]) for v in cells.cell_bounds(np.array([cid])))
        corners_in = all(
            scalar_pip(la, lo, SQUARE)
            for lo, la in [(mnx, mny), (mxx, mny), (mnx, mxy), (mxx, mxy)]
        )
        if not b:
            assert corners_in
    assert boundary.any() and (~boundary).any()


def test_cover_join_equivalence_to_exact_pip():
    """Points bucketed to cells then filtered via cover+PIP must equal
    direct PIP — the core spatial-join invariant."""
    rng = np.random.default_rng(42)
    lat = rng.uniform(-12, 22, 2000)
    lon = rng.uniform(-12, 22, 2000)
    res = 7
    for rings in (SQUARE, CONCAVE, DONUT):
        cover, boundary = geo.polygon_cover(rings, res=res, compact=True)
        # uncompact interior for membership check
        interior = set(
            cells.uncompact_cells(cover[~boundary], res).tolist()
        ) if (~boundary).any() else set()
        bound = set(cover[boundary].tolist())
        pt_cells = cells.latlng_to_cell(lat, lon, res)
        joined = np.zeros(len(lat), dtype=bool)
        for i, c in enumerate(pt_cells.tolist()):
            if c in interior:
                joined[i] = True
            elif c in bound:
                joined[i] = bool(geo.points_in_rings(lat[i : i + 1], lon[i : i + 1], rings)[0])
        exact = geo.points_in_rings(lat, lon, rings)
        assert np.array_equal(joined, exact)


def test_split_antimeridian():
    # box from lon 178 to -178 crossing the antimeridian
    ring = [np.array([[178.0, -5.0], [-178.0, -5.0], [-178.0, 5.0], [178.0, 5.0]])]
    parts = geo.split_antimeridian(ring)
    assert len(parts) == 2
    # each part stays within [-180, 180]
    for part in parts:
        for r in part:
            assert (r[:, 0] >= -180.0).all() and (r[:, 0] <= 180.0).all()
    # a point at lon 179 is in exactly one part; lon 0 in none
    hits = sum(
        bool(geo.points_in_rings(np.array([0.0]), np.array([179.0]), part)[0]) for part in parts
    )
    assert hits == 1
    misses = sum(
        bool(geo.points_in_rings(np.array([0.0]), np.array([0.0]), part)[0]) for part in parts
    )
    assert misses == 0
    # non-crossing polygon passes through
    assert len(geo.split_antimeridian([np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])])) == 1
