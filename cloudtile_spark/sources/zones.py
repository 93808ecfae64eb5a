"""Deterministic polygon zones for point-in-polygon joins (FIXTURES.md §3).

Convex polygons (regular m-gons with per-zone radius/rotation) centered with
the same integer-arithmetic generator as the pages coordinates. Convexity is
deliberate: it lets the DuckDB oracle express EXACT point-in-polygon as a
conjunction of edge half-plane tests with the vertex coordinates inlined as
literals — the Spark side runs the engine's general ray-casting kernel, so
the oracle independently checks it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _u(i: int, salt: int) -> float:
    """Python twin of sources.pages._u (same constants)."""
    from .pages import _M, _MULTS

    mult = _MULTS[salt % len(_MULTS)]
    return ((i * mult + salt * 40503 + 12345) % _M) / float(_M)


def synth_zones(n: int = 25, verts: int = 8) -> pd.DataFrame:
    """zone_id + convex ring ndarray (verts+1, 2), closed."""
    from .pages import HOTSPOTS

    rows = []
    for zid in range(n):
        # zones concentrate over the metro hotspots (FIXTURES.md §3) with
        # ~30% mutual overlap so PIP exercises multi-match
        _, hx, hy = HOTSPOTS[zid % len(HOTSPOTS)]
        cx = hx + (_u(zid, 8) - 0.5) * 6.0
        cy = hy + (_u(zid, 9) - 0.5) * 6.0
        r = 2.0 + _u(zid, 10) * 4.0
        phase = _u(zid, 11) * 2 * np.pi
        ang = phase + np.arange(verts) * (2 * np.pi / verts)
        ring = np.c_[cx + r * np.cos(ang), cy + r * 0.7 * np.sin(ang)]
        ring = np.vstack([ring, ring[:1]])
        rows.append({"zone_id": zid, "ring": ring})
    return pd.DataFrame(rows)


def zone_predicate_sql(ring: np.ndarray, lon: str, lat: str) -> str:
    """Exact convex-PIP SQL: AND over edge cross-product tests (CCW)."""
    ring = np.asarray(ring, dtype=np.float64)
    if np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    # ensure CCW
    area = 0.5 * np.sum(
        ring[:, 0] * np.roll(ring[:, 1], -1) - np.roll(ring[:, 0], -1) * ring[:, 1]
    )
    if area < 0:
        ring = ring[::-1]
    terms = []
    for i in range(len(ring)):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % len(ring)]
        terms.append(
            f"(({x2!r} - {x1!r}) * (({lat}) - {y1!r})"
            f" - ({y2!r} - {y1!r}) * (({lon}) - {x1!r}) >= 0.0)"
        )
    return "(" + " AND ".join(terms) + ")"
