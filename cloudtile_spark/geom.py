"""Vectorized geometry kernels (pure NumPy — no GDAL/GEOS in this engine).

The reference outsources every geometry operation to ogr2ogr/tippecanoe C++
(reference src/cloudtile/geofile.py:151-163, 224-234). Here the same
semantics are implemented as NumPy array math intended to run inside
Arrow-batched pandas UDFs / applyInPandas — never per-row Python objects in
the hot path (BASELINE.json input_hint mandate).

Covers: WKB (point/linestring/polygon) encode/decode, ray-casting
point-in-polygon (tippecanoe feature-filter analogue + the PIP join),
haversine, Douglas-Peucker simplification (tippecanoe ``simplification``,
reference tippecanoe.yaml:70), Sutherland-Hodgman clipping (tippecanoe
tile-buffer clipping, tippecanoe.yaml:81-84), shoelace area / tiny-polygon
reduction (tippecanoe.yaml:75-76), and scanline rasterization (raster<->vector).
"""

from __future__ import annotations

import math
import struct

import numpy as np

EARTH_RADIUS_M = 6_371_008.8

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3


# ---------------------------------------------------------------------------
# WKB (little-endian, 2D) — standard OGC well-known binary
# ---------------------------------------------------------------------------

def wkb_point(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, lon, lat)


def wkb_linestring(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype="<f8")
    head = struct.pack("<BII", 1, _WKB_LINESTRING, len(coords))
    return head + coords.tobytes()


def wkb_polygon(ring: np.ndarray) -> bytes:
    """Single-ring polygon; closes the ring if needed."""
    ring = np.asarray(ring, dtype="<f8")
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    head = struct.pack("<BIII", 1, _WKB_POLYGON, 1, len(ring))
    return head + ring.tobytes()


def wkb_parse(buf: bytes) -> tuple[int, np.ndarray]:
    """Parse one 2D WKB geometry -> (type, coords[n,2]).

    Polygons: outer ring only (inner rings are not produced by this engine's
    sources; multi-geometries are normalized upstream).
    """
    byte_order, gtype = struct.unpack_from("<BI", buf, 0)
    assert byte_order == 1, "big-endian WKB not produced by this engine"
    if gtype == _WKB_POINT:
        lon, lat = struct.unpack_from("<dd", buf, 5)
        return gtype, np.array([[lon, lat]])
    if gtype == _WKB_LINESTRING:
        (n,) = struct.unpack_from("<I", buf, 5)
        coords = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=9)
        return gtype, coords.reshape(n, 2).copy()
    if gtype == _WKB_POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, 5)
        (n,) = struct.unpack_from("<I", buf, 9)
        coords = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=13)
        return gtype, coords.reshape(n, 2).copy()
    raise ValueError(f"unsupported WKB geometry type {gtype}")


# ---------------------------------------------------------------------------
# Point-in-polygon (vectorized ray casting) — the "prepared geometry" path
# ---------------------------------------------------------------------------

def points_in_polygon(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Boolean mask: which of N points fall inside one polygon ring.

    Vectorized even-odd ray casting over all points x all edges at once —
    this is the inner kernel of the PIP join's exact-refine stage (the
    coarse stage is a cell-prefix equi-join, see operators/joins.py).
    Boundary points follow the even-odd crossing convention.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    if np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(ring[:, 0], -1)
    y2 = np.roll(ring[:, 1], -1)
    # edges x points  ->  (E, N)
    cond = (y1[:, None] > py[None, :]) != (y2[:, None] > py[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[:, None] + (py[None, :] - y1[:, None]) / (
            y2[:, None] - y1[:, None]
        ) * (x2[:, None] - x1[:, None])
    crossings = (cond & (px[None, :] < xint)).sum(axis=0)
    return (crossings % 2) == 1


def polygon_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    ring = np.asarray(ring, dtype=np.float64)
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def shoelace_area(ring: np.ndarray) -> float:
    """Signed area (CCW positive) of a ring in its native coordinates."""
    ring = np.asarray(ring, dtype=np.float64)
    if np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


# ---------------------------------------------------------------------------
# Distance
# ---------------------------------------------------------------------------

def haversine_m(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in meters, vectorized (broadcasting)."""
    lon1, lat1, lon2, lat2 = (
        np.radians(np.asarray(a, dtype=np.float64))
        for a in (lon1, lat1, lon2, lat2)
    )
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0, 1)))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Same formula as :func:`haversine_m` as a SQL expression (valid in both
    Spark SQL and DuckDB) for oracle-checked kNN queries."""
    rl1, rp1 = f"radians({lon1})", f"radians({lat1})"
    rl2, rp2 = f"radians({lon2})", f"radians({lat2})"
    h = (
        f"(pow(sin(({rp2} - {rp1}) / 2), 2)"
        f" + cos({rp1}) * cos({rp2}) * pow(sin(({rl2} - {rl1}) / 2), 2))"
    )
    return f"(2 * {EARTH_RADIUS_M} * asin(sqrt(least(greatest({h}, 0.0), 1.0))))"


# ---------------------------------------------------------------------------
# Simplification — Douglas-Peucker (tippecanoe `simplification`, yaml:70)
# ---------------------------------------------------------------------------

def douglas_peucker(coords: np.ndarray, tolerance: float,
                    protect: np.ndarray | None = None) -> np.ndarray:
    """Iterative (stack-based) DP simplification; keeps endpoints.

    ``tolerance`` is in the same units as coords (tile-local units when called
    from the pyramid encoder: tolerance = simplification setting, i.e. 10
    tile units by default, matching tippecanoe's interpretation of its
    default resolution).

    ``protect``: optional bool mask — protected vertices (shared-border
    nodes, tippecanoe ``no-simplification-of-shared-nodes``) are anchors:
    they always survive, and DP runs independently on each sub-chain
    between consecutive anchors so the simplified shape on either side of
    a shared node cannot depend on the non-shared remainder.
    """
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n <= 2:
        return coords
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    if protect is not None and protect.any():
        keep |= np.asarray(protect, dtype=bool)
        anchors = np.nonzero(keep)[0]
        stack = [(int(anchors[i]), int(anchors[i + 1]))
                 for i in range(len(anchors) - 1)]
    else:
        stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = coords[i0 + 1 : i1]
        a = coords[i0]
        b = coords[i1]
        ab = b - a
        ab_len = math.hypot(ab[0], ab[1])
        if ab_len == 0.0:
            d = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
        else:
            d = np.abs(np.cross(ab, seg - a)) / ab_len
        imax = int(np.argmax(d))
        if d[imax] > tolerance:
            j = i0 + 1 + imax
            keep[j] = True
            stack.append((i0, j))
            stack.append((j, i1))
    return coords[keep]


def visvalingam(coords: np.ndarray, min_area: float,
                protect: np.ndarray | None = None) -> np.ndarray:
    """Visvalingam-Whyatt simplification (tippecanoe's ``visvalingam``
    alternative, reference tippecanoe.yaml:77): iteratively remove the
    vertex forming the smallest triangle until every remaining triangle's
    effective area >= ``min_area``. Endpoints kept; ``protect``-masked
    vertices (shared-border nodes) are never removal candidates.
    """
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return pts
    prot = (np.asarray(protect, dtype=bool) if protect is not None
            else np.zeros(n, dtype=bool))
    alive = list(range(n))

    def tri_area(i0, i1, i2):
        a, b, c = pts[i0], pts[i1], pts[i2]
        return 0.5 * abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        )

    while len(alive) > 2:
        areas = [
            math.inf if prot[alive[k]]
            else tri_area(alive[k - 1], alive[k], alive[k + 1])
            for k in range(1, len(alive) - 1)
        ]
        k_min = int(np.argmin(areas))
        if areas[k_min] >= min_area:
            break
        del alive[k_min + 1]
    return pts[alive]


# ---------------------------------------------------------------------------
# Clipping — Sutherland-Hodgman (polygons) / Liang-Barsky (lines)
# (tippecanoe clipping-to-tile-bounds + buffer, yaml:81-84)
# ---------------------------------------------------------------------------

def clip_ring_to_rect(
    ring: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float
) -> np.ndarray:
    """Sutherland-Hodgman clip of a polygon ring to an axis-aligned rect.

    Returns the clipped ring (possibly empty array of shape (0, 2)).
    """
    pts = np.asarray(ring, dtype=np.float64)
    if np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]

    def clip_edge(poly: np.ndarray, inside, intersect) -> np.ndarray:
        if len(poly) == 0:
            return poly
        out = []
        prev = poly[-1]
        prev_in = inside(prev)
        for cur in poly:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        return np.asarray(out).reshape(-1, 2)

    def ix_x(bound):
        def f(p, q):
            t = (bound - p[0]) / (q[0] - p[0])
            return np.array([bound, p[1] + t * (q[1] - p[1])])
        return f

    def ix_y(bound):
        def f(p, q):
            t = (bound - p[1]) / (q[1] - p[1])
            return np.array([p[0] + t * (q[0] - p[0]), bound])
        return f

    pts = clip_edge(pts, lambda p: p[0] >= xmin, ix_x(xmin))
    pts = clip_edge(pts, lambda p: p[0] <= xmax, ix_x(xmax))
    pts = clip_edge(pts, lambda p: p[1] >= ymin, ix_y(ymin))
    pts = clip_edge(pts, lambda p: p[1] <= ymax, ix_y(ymax))
    return pts


def clip_ring_to_convex(ring: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman clip of an ARBITRARY (possibly non-convex)
    subject ring against a CONVEX clipper ring — the polygon-general
    overlay kernel (generalizes :func:`clip_ring_to_rect`, whose four
    axis-aligned half-planes are the rect special case).

    The clipper is normalized to CCW internally. The output ring may
    contain coincident "bridge" edges for non-convex subjects, but its
    shoelace area is still the EXACT intersection area (bridges cancel in
    the signed sum) — which is all the overlay area join consumes.
    Returns an (n, 2) array, possibly empty.
    """
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    clip = np.asarray(clip_ring, dtype=np.float64)
    if len(clip) and np.array_equal(clip[0], clip[-1]):
        clip = clip[:-1]
    if shoelace_area(np.vstack([clip, clip[:1]])) < 0:
        clip = clip[::-1]

    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        ex, ey = b[0] - a[0], b[1] - a[1]
        if len(pts) == 0:
            break
        # signed distance to the (a, b) half-plane, vectorized per pass
        d = ex * (pts[:, 1] - a[1]) - ey * (pts[:, 0] - a[0])
        out = []
        for j in range(len(pts)):
            k = (j - 1) % len(pts)
            cur, prev = pts[j], pts[k]
            cur_in, prev_in = d[j] >= 0.0, d[k] >= 0.0
            if cur_in != prev_in:
                t = d[k] / (d[k] - d[j])
                out.append(prev + t * (cur - prev))
            if cur_in:
                out.append(cur)
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    return pts


def clip_line_to_rect(
    coords: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float
) -> list[np.ndarray]:
    """Clip a polyline to a rect; may split into multiple segments."""
    coords = np.asarray(coords, dtype=np.float64)
    segments: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(coords) - 1):
        p, q = coords[i], coords[i + 1]
        clipped = _liang_barsky(p, q, xmin, ymin, xmax, ymax)
        if clipped is None:
            if cur:
                segments.append(cur)
                cur = []
            continue
        a, b = clipped
        if cur and np.allclose(cur[-1], a):
            cur.append(b)
        else:
            if cur:
                segments.append(cur)
            cur = [a, b]
    if cur:
        segments.append(cur)
    return [np.asarray(s) for s in segments if len(s) >= 2]


def _liang_barsky(p, q, xmin, ymin, xmax, ymax):
    # Python floats: numpy scalars emit a RuntimeWarning when qq/pp
    # overflows float64; plain floats overflow to inf silently, and the
    # t0/t1 comparisons below already handle inf correctly.
    x0, y0 = float(p[0]), float(p[1])
    x1, y1 = float(q[0]), float(q[1])
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for pp, qq in (
        (-dx, x0 - xmin), (dx, xmax - x0), (-dy, y0 - ymin), (dy, ymax - y0),
    ):
        if pp == 0:
            if qq < 0:
                return None
            continue
        r = qq / pp
        if pp < 0:
            if r > t1:
                return None
            t0 = max(t0, r)
        else:
            if r < t0:
                return None
            t1 = min(t1, r)
    return (
        np.array([x0 + t0 * dx, y0 + t0 * dy]),
        np.array([x0 + t1 * dx, y0 + t1 * dy]),
    )


# ---------------------------------------------------------------------------
# Rasterization (raster<->vector bridge, grouped per tile partition)
# ---------------------------------------------------------------------------

def rasterize_ring(
    ring: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float,
    size: int = 256,
) -> np.ndarray:
    """Even-odd scanline fill of one ring into a (size x size) uint8 grid.

    Row 0 is the TOP of the bbox (image convention). Pixel centers are
    sampled, matching the vectorize inverse in operators/raster.py.
    """
    grid = np.zeros((size, size), dtype=np.uint8)
    ring = np.asarray(ring, dtype=np.float64)
    if np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    ys = ymax - (np.arange(size) + 0.5) * (ymax - ymin) / size
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for row, yv in enumerate(ys):
        cond = (y1 > yv) != (y2 > yv)
        if not cond.any():
            continue
        xint = x1[cond] + (yv - y1[cond]) / (y2[cond] - y1[cond]) * (
            x2[cond] - x1[cond]
        )
        xint.sort()
        for i in range(0, len(xint) - 1, 2):
            c0 = int(np.ceil((xint[i] - xmin) / (xmax - xmin) * size - 0.5))
            c1 = int(np.floor((xint[i + 1] - xmin) / (xmax - xmin) * size - 0.5))
            c0 = max(c0, 0)
            c1 = min(c1, size - 1)
            if c1 >= c0:
                grid[row, c0 : c1 + 1] = 1
    return grid
