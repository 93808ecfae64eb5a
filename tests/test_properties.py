"""Property-based tests (hypothesis) for the pure kernels — the invariants
that must hold for ANY input, not just fixtures."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from cloudtile_spark import cells, geom, tiles

lat_st = st.floats(min_value=-89.9, max_value=89.9,
                   allow_nan=False, allow_infinity=False)
lon_st = st.floats(min_value=-180.0, max_value=179.999999,
                   allow_nan=False, allow_infinity=False)
zoom_st = st.integers(min_value=0, max_value=16)


@settings(max_examples=300, deadline=None)
@given(lon_st, lat_st, zoom_st)
def test_point_inside_its_tile_bounds(lon, lat, z):
    x, y = tiles.lonlat_to_tile(np.array([lon]), np.array([lat]), z)
    lon_min, lat_min, lon_max, lat_max = tiles.tile_bounds(z, x, y)
    assert lon_min[0] - 1e-9 <= lon <= lon_max[0] + 1e-9
    clamped = min(max(lat, tiles.MIN_LAT), tiles.MAX_LAT)
    assert lat_min[0] - 1e-7 <= clamped <= lat_max[0] + 1e-7


@settings(max_examples=300, deadline=None)
@given(lon_st, lat_st, zoom_st.filter(lambda z: z >= 1))
def test_quadkey_prefix_is_parent(lon, lat, z):
    """quadkey(z) of a point starts with quadkey(z-1) of the same point —
    the hierarchical-containment property."""
    x1, y1 = tiles.lonlat_to_tile(np.array([lon]), np.array([lat]), z)
    x0, y0 = tiles.lonlat_to_tile(np.array([lon]), np.array([lat]), z - 1)
    qk1 = tiles.quadkey(x1, y1, z)[0]
    qk0 = tiles.quadkey(x0, y0, z - 1)[0]
    assert qk1.startswith(qk0)


@settings(max_examples=300, deadline=None)
@given(lon_st, lat_st, st.integers(min_value=1, max_value=15))
def test_cell_parent_consistency(lon, lat, res):
    c = cells.cell(np.array([lon]), np.array([lat]), res)
    p = cells.parent(c)
    direct = cells.cell(np.array([lon]), np.array([lat]), res - 1)
    assert p[0] == direct[0]
    r, x, y = cells.cell_to_xy(c)
    assert r[0] == res
    rebuilt = (tiles.morton(x, y) << cells.RES_BITS) | res
    assert rebuilt[0] == c[0]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.floats(-100, 100, allow_nan=False), st.floats(-100, 100, allow_nan=False)
), min_size=2, max_size=30))
def test_wkb_linestring_roundtrip(coords):
    arr = np.array(coords, dtype=np.float64)
    t, back = geom.wkb_parse(geom.wkb_linestring(arr))
    assert t == 2 and np.array_equal(back, arr)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.floats(-50, 50, allow_nan=False, allow_infinity=False),
    st.floats(-50, 50, allow_nan=False, allow_infinity=False)
), min_size=3, max_size=25), st.floats(0.001, 20))
def test_douglas_peucker_invariants(coords, tol):
    arr = np.array(coords, dtype=np.float64)
    out = geom.douglas_peucker(arr, tol)
    # endpoints preserved; output is a subsequence; never grows
    assert np.array_equal(out[0], arr[0]) and np.array_equal(out[-1], arr[-1])
    assert len(out) <= len(arr)
    idx = 0
    for p in out:
        while idx < len(arr) and not np.array_equal(arr[idx], p):
            idx += 1
        assert idx < len(arr), "output point not a subsequence of input"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.floats(-10, 10, allow_nan=False), st.floats(-10, 10, allow_nan=False)
), min_size=2, max_size=20))
def test_clip_line_stays_in_rect(coords):
    arr = np.array(coords, dtype=np.float64)
    for seg in geom.clip_line_to_rect(arr, -1, -1, 1, 1):
        assert np.all(seg[:, 0] >= -1 - 1e-9) and np.all(seg[:, 0] <= 1 + 1e-9)
        assert np.all(seg[:, 1] >= -1 - 1e-9) and np.all(seg[:, 1] <= 1 + 1e-9)


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 10), st.integers(0, 2 ** 10 - 1), st.integers(0, 2 ** 10 - 1))
def test_hilbert_morton_bounds(z, x, y):
    z = max(z, 1)
    n = 1 << z
    x, y = x % n, y % n
    d = tiles.hilbert_d(z, np.array([x]), np.array([y]))[0]
    assert 0 <= d < n * n
    m = tiles.morton(np.array([x]), np.array([y]))[0]
    r, bx, by = cells.cell_to_xy(np.array([(m << 5) | z]))
    assert bx[0] == x and by[0] == y


@settings(max_examples=100, deadline=None)
@given(st.floats(-720, 720, allow_nan=False, allow_infinity=False))
def test_norm_lon_range(v):
    import duckdb

    # long literals parse as DECIMAL in DuckDB too -> cast to double
    got = duckdb.sql(
        f"SELECT {tiles.norm_lon_sql(f'cast({v!r} as double)')} AS x"
    ).fetchone()[0]
    assert -180.0 <= got < 180.0 or math.isclose(got, 180.0)
