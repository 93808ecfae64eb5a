"""Geometry-kernel tests: WKB roundtrip, PIP vs brute oracle, DP, clip,
rasterize."""

import numpy as np
import pytest

from cloudtile_spark import geom


def test_wkb_roundtrip():
    t, c = geom.wkb_parse(geom.wkb_point(12.5, -33.25))
    assert t == 1 and np.allclose(c, [[12.5, -33.25]])
    line = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, -1.0]])
    t, c = geom.wkb_parse(geom.wkb_linestring(line))
    assert t == 2 and np.allclose(c, line)
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    t, c = geom.wkb_parse(geom.wkb_polygon(ring))
    assert t == 3 and len(c) == 5 and np.allclose(c[0], c[-1])


def _py_pip(px, py, ring):
    """Slow scalar even-odd oracle."""
    inside = False
    n = len(ring)
    j = n - 1
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi > py) != (yj > py):
            xint = xi + (py - yi) / (yj - yi) * (xj - xi)
            if px < xint:
                inside = not inside
        j = i
    return inside


def test_points_in_polygon_vs_scalar_oracle():
    rng = np.random.default_rng(3)
    # random star-convex polygon
    angles = np.sort(rng.uniform(0, 2 * np.pi, 9))
    radii = rng.uniform(0.5, 2.0, 9)
    ring = np.c_[radii * np.cos(angles), radii * np.sin(angles)]
    px = rng.uniform(-2.5, 2.5, 400)
    py = rng.uniform(-2.5, 2.5, 400)
    got = geom.points_in_polygon(px, py, ring)
    expect = np.array([_py_pip(a, b, ring) for a, b in zip(px, py)])
    assert np.array_equal(got, expect)


def test_shoelace_area():
    square = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    assert geom.shoelace_area(square) == pytest.approx(4.0)
    assert geom.shoelace_area(square[::-1]) == pytest.approx(-4.0)


def test_haversine_known_distance():
    # London (-0.1278, 51.5074) to Paris (2.3522, 48.8566): ~343.5 km
    d = geom.haversine_m(
        np.array([-0.1278]), np.array([51.5074]),
        np.array([2.3522]), np.array([48.8566]),
    )
    assert d[0] == pytest.approx(343_500, rel=0.01)


def test_haversine_sql_matches_numpy():
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "lon1": rng.uniform(-180, 180, 1000),
        "lat1": rng.uniform(-85, 85, 1000),
        "lon2": rng.uniform(-180, 180, 1000),
        "lat2": rng.uniform(-85, 85, 1000),
    })
    con = duckdb.connect()
    con.register("t", df)
    got = con.execute(
        f"SELECT {geom.haversine_sql('lon1','lat1','lon2','lat2')} AS d FROM t"
    ).fetchnumpy()["d"]
    expect = geom.haversine_m(df.lon1, df.lat1, df.lon2, df.lat2)
    assert np.allclose(got, expect, rtol=1e-12)


def test_douglas_peucker():
    # collinear middle points vanish
    line = np.array([[0.0, 0.0], [1.0, 0.001], [2.0, -0.001], [3.0, 0.0]])
    out = geom.douglas_peucker(line, 0.01)
    assert len(out) == 2
    # a real corner survives
    line = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    out = geom.douglas_peucker(line, 0.5)
    assert len(out) == 3


def test_clip_ring():
    ring = np.array([[-1.0, -1.0], [3.0, -1.0], [3.0, 3.0], [-1.0, 3.0]])
    clipped = geom.clip_ring_to_rect(ring, 0, 0, 2, 2)
    assert abs(geom.shoelace_area(clipped)) == pytest.approx(4.0)
    # fully outside -> empty
    out = geom.clip_ring_to_rect(ring, 10, 10, 12, 12)
    assert len(out) == 0


def test_clip_line():
    line = np.array([[-1.0, 0.5], [3.0, 0.5]])
    segs = geom.clip_line_to_rect(line, 0, 0, 2, 1)
    assert len(segs) == 1
    assert np.allclose(segs[0], [[0.0, 0.5], [2.0, 0.5]])
    # zigzag exits and re-enters -> two segments
    zig = np.array([[0.5, 0.5], [2.5, 0.5], [2.5, 0.6], [0.5, 0.6]])
    segs = geom.clip_line_to_rect(zig, 0, 0, 2, 1)
    assert len(segs) == 2


def test_rasterize_ring_area_parity():
    ring = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]])
    grid = geom.rasterize_ring(ring, 0, 0, 1, 1, size=64)
    frac = grid.sum() / grid.size
    assert frac == pytest.approx(0.25, abs=0.02)


# ---------------------------------------------------------------------------
# clip_ring_to_convex: polygon-general overlay kernel parity
# ---------------------------------------------------------------------------

def _convex_convex_area(P, C):
    """INDEPENDENT convex-convex intersection area: collect candidate
    vertices (P verts inside C, C verts inside P, all edge-edge
    intersections), order by angle around their centroid, shoelace.
    A completely different algorithm from Sutherland-Hodgman."""
    def inside_convex(pt, poly):
        n = len(poly)
        for i in range(n):
            a, b = poly[i], poly[(i + 1) % n]
            if ((b[0] - a[0]) * (pt[1] - a[1])
                    - (b[1] - a[1]) * (pt[0] - a[0])) < -1e-12:
                return False
        return True

    def seg_ix(p1, p2, q1, q2):
        r = p2 - p1
        s = q2 - q1
        denom = r[0] * s[1] - r[1] * s[0]
        if abs(denom) < 1e-15:
            return None
        t = ((q1[0] - p1[0]) * s[1] - (q1[1] - p1[1]) * s[0]) / denom
        u = ((q1[0] - p1[0]) * r[1] - (q1[1] - p1[1]) * r[0]) / denom
        if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
            return p1 + t * r
        return None

    pts = [p for p in P if inside_convex(p, C)]
    pts += [c for c in C if inside_convex(c, P)]
    for i in range(len(P)):
        for j in range(len(C)):
            ix = seg_ix(P[i], P[(i + 1) % len(P)],
                        C[j], C[(j + 1) % len(C)])
            if ix is not None:
                pts.append(ix)
    if len(pts) < 3:
        return 0.0
    pts = np.asarray(pts)
    ctr = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - ctr[1], pts[:, 0] - ctr[0])
    pts = pts[np.argsort(ang)]
    return abs(geom.shoelace_area(pts))


def _ccw_ngon(cx, cy, r, n, phase=0.0):
    a = phase + np.arange(n) * (2 * np.pi / n)
    return np.stack([cx + r * np.cos(a), cy + r * np.sin(a)], axis=1)


def test_clip_convex_rect_special_case_matches_rect_kernel():
    ring = _ccw_ngon(1.0, 1.0, 2.0, 7, phase=0.3)
    rect = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    a_convex = abs(geom.shoelace_area(
        geom.clip_ring_to_convex(ring, rect)))
    a_rect = abs(geom.shoelace_area(
        geom.clip_ring_to_rect(ring, 0.0, 0.0, 2.0, 2.0)))
    assert a_convex == pytest.approx(a_rect, rel=1e-12)


def test_clip_convex_cw_clipper_normalized():
    ring = _ccw_ngon(0.0, 0.0, 1.0, 6)
    cw = _ccw_ngon(0.0, 0.0, 1.0, 5)[::-1]  # clockwise clipper
    a = abs(geom.shoelace_area(geom.clip_ring_to_convex(ring, cw)))
    assert a > 0.0


def test_clip_convex_nonconvex_subject_vs_fan_triangulation():
    """The real parity check: non-convex star subject x convex pentagon
    clipper. Independent computation: the star is star-shaped about its
    center, so fan triangles (center, v_i, v_{i+1}) PARTITION it; each
    triangle is convex, so the vertex-collection convex-convex routine
    gives its exact intersection with the pentagon; the sum equals the
    true star-pentagon intersection area."""
    from cloudtile_spark.queries import _pentagon_ring, _star_ring

    rng_cases = [
        (7, -3.0, 1.0, 4, 0.5, -1.0),
        (12, 0.0, 0.0, 9, 0.0, 0.0),       # concentric
        (33, 5.0, -2.0, 2, 12.0, 6.0),     # far apart (likely disjoint)
        (101, -1.0, 2.5, 17, 2.0, -3.0),
        (58, 10.0, 10.0, 23, 4.0, 12.0),
    ]
    for doc_id, lon, lat, zone_id, cx, cy in rng_cases:
        star = _star_ring(doc_id, lon, lat)
        pent = _pentagon_ring(zone_id, cx, cy)
        clipped = geom.clip_ring_to_convex(star, pent)
        a_sh = abs(geom.shoelace_area(clipped)) if len(clipped) >= 3 else 0.0

        ctr = star.mean(axis=0)
        a_fan = 0.0
        for i in range(len(star)):
            tri = np.array([ctr, star[i], star[(i + 1) % len(star)]])
            if geom.shoelace_area(tri) < 0:
                tri = tri[::-1]
            a_fan += _convex_convex_area(tri, pent)
        assert a_sh == pytest.approx(a_fan, rel=1e-9, abs=1e-9), (
            doc_id, zone_id, a_sh, a_fan)
