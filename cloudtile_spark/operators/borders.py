"""Shared-border topology (tippecanoe ``detect-shared-borders`` /
``no-simplification-of-shared-nodes`` — the option universe the reference
exposes via src/cloudtile/tippecanoe.yaml, passed through
src/cloudtile/tippecanoe.py:108-110).

Semantics here: vertices incident to a SHARED segment (the same
canonicalized edge appearing in more than one feature — adjacent admin
polygons' common boundary) are protected from simplification on every
feature that contains them. Protecting all shared-edge vertices makes
the border survive simplification byte-identically on both sides (the
outcome tippecanoe's detect-shared-borders aims for by simplifying the
border consistently; this implementation is the conservative superset —
the shared border is not simplified at all, matching
no-simplification-of-shared-nodes).

All stages are DataFrame ops sized for an unbounded feature table:

    features --Arrow map--> segment table (canonical quantized endpoints)
             --hash agg--> shared segments (distinct feature count > 1)
             --equi-join + agg--> per-feature protected vertex lists

No driver-side geometry, no broadcast requirement (the join keys are
segment endpoints; skew on a popular border is bounded by the number of
features sharing an edge, which is ~2 for real topologies).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import geom

# segment-identity quantum: 1e-7 deg ~ 1.1 cm at the equator — two rings
# digitized from the same source snap to identical keys, distinct borders
# never collide
QUANT = 1e7

_SEG_SCHEMA = T.StructType([
    T.StructField("feature_id", T.LongType()),
    T.StructField("ax", T.LongType()),
    T.StructField("ay", T.LongType()),
    T.StructField("bx", T.LongType()),
    T.StructField("by", T.LongType()),
])


def quantize(v: np.ndarray) -> np.ndarray:
    return np.round(np.asarray(v, dtype=np.float64) * QUANT).astype(np.int64)


def segment_table(features: DataFrame) -> DataFrame:
    """(feature_id, geom_wkb) -> one row per ring/line segment with the
    CANONICAL endpoint order (lexicographic), so the same physical edge
    yields the same key regardless of each feature's winding."""

    def segs(batches):
        for pdf in batches:
            fids, axs, ays, bxs, bys = [], [], [], [], []
            for fid, wkb in zip(pdf.feature_id, pdf.geom_wkb):
                _, coords = geom.wkb_parse(bytes(wkb))
                if len(coords) < 2:
                    continue
                q = np.c_[quantize(coords[:, 0]), quantize(coords[:, 1])]
                a, b = q[:-1], q[1:]
                # drop zero-length segments (closing duplicates)
                nz = (a != b).any(axis=1)
                a, b = a[nz], b[nz]
                swap = (b[:, 0] < a[:, 0]) | (
                    (b[:, 0] == a[:, 0]) & (b[:, 1] < a[:, 1]))
                lo = np.where(swap[:, None], b, a)
                hi = np.where(swap[:, None], a, b)
                fids.append(np.full(len(lo), int(fid), dtype=np.int64))
                axs.append(lo[:, 0]); ays.append(lo[:, 1])
                bxs.append(hi[:, 0]); bys.append(hi[:, 1])
            if not fids:
                yield pd.DataFrame(
                    {c: pd.Series(dtype="int64")
                     for c in ("feature_id", "ax", "ay", "bx", "by")})
                continue
            yield pd.DataFrame(
                {"feature_id": np.concatenate(fids),
                 "ax": np.concatenate(axs), "ay": np.concatenate(ays),
                 "bx": np.concatenate(bxs), "by": np.concatenate(bys)})

    return features.select("feature_id", "geom_wkb") \
        .mapInPandas(segs, schema=_SEG_SCHEMA)


def shared_segments(segments: DataFrame) -> DataFrame:
    """Canonical segments appearing in MORE THAN ONE feature — the shared
    borders. Pure hash aggregate on the endpoint key."""
    return (
        segments.groupBy("ax", "ay", "bx", "by")
        .agg(F.countDistinct("feature_id").alias("n_features"))
        .filter(F.col("n_features") > 1)
    )


def protected_nodes(features: DataFrame) -> DataFrame:
    """Per-feature quantized vertices incident to a shared segment:
    (feature_id, prot_x array<bigint>, prot_y array<bigint>) — the inputs
    the tile encoder uses to mask simplification."""
    seg = segment_table(features)
    hit = seg.join(shared_segments(seg),
                   ["ax", "ay", "bx", "by"])
    pts = (
        hit.select("feature_id", F.col("ax").alias("qx"),
                   F.col("ay").alias("qy"))
        .unionByName(hit.select("feature_id", F.col("bx").alias("qx"),
                                F.col("by").alias("qy")))
        .distinct()
    )
    return (
        pts.groupBy("feature_id")
        .agg(F.collect_list(F.struct("qx", "qy")).alias("_ps"))
        .select(
            "feature_id",
            F.expr("transform(_ps, s -> s.qx)").alias("prot_x"),
            F.expr("transform(_ps, s -> s.qy)").alias("prot_y"),
        )
    )


def protect_mask(coords: np.ndarray,
                 prot_set: set[tuple[int, int]]) -> np.ndarray:
    """Bool mask over ``coords`` rows: True where the quantized vertex is a
    protected shared node."""
    qx = quantize(coords[:, 0])
    qy = quantize(coords[:, 1])
    return np.fromiter(
        ((int(x), int(y)) in prot_set for x, y in zip(qx, qy)),
        dtype=bool, count=len(qx))
