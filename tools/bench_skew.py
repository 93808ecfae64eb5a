"""Skew-handling evidence -> BENCH/SKEW.md.

The synthetic corpus concentrates 80% of features in 5 metro hotspots; the
z0..z4 tiles are world-scale hot keys. This measures the capped per-tile
id-summary with and without salting (capped_tile_summary salt_buckets=32 vs
1): unsalted, the hot tile's ENTIRE id list funnels through one reducer's
collect_list before truncation; salted, every reducer pre-truncates to cap.

Usage: python tools/bench_skew.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudtile_spark.operators.extract import extract_features  # noqa: E402
from cloudtile_spark.operators.pyramid import (  # noqa: E402
    assign_xy, capped_tile_summary, explode_zooms,
)
from cloudtile_spark.session import get_spark  # noqa: E402
from cloudtile_spark.sources.pages import synth_pages  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
CAP = 20_000


def main() -> None:
    spark = get_spark("skew", cores=32)
    feats = extract_features(synth_pages(spark, N, partitions=64)
                             .drop("page_id")) \
        .select("feature_id", "lon", "lat").cache()
    feats.count()
    df = assign_xy(explode_zooms(feats, 0, 4))
    results = {}
    fingerprints = {}
    for salt in (32, 1):
        best = None
        for _ in range(2):
            t0 = time.time()
            out = capped_tile_summary(df, CAP, with_ids=True,
                                      salt_buckets=salt)
            rows = out.select("z", "x", "y", "feature_count",
                              "checksum").collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[salt] = round(best, 2)
        fingerprints[salt] = sorted(map(tuple, rows))
    identical = fingerprints[1] == fingerprints[32]
    spark.stop()
    os.makedirs("BENCH", exist_ok=True)
    speedup = results[1] / results[32]
    with open("BENCH/SKEW.md", "w") as f:
        f.write(f"""# BENCH/SKEW — hot-tile salting evidence

{N:,} features (80% in 5 metro hotspots), z0-4 capped id-summary
(cap={CAP:,}): the z0 tile is a world-scale hot key.

| strategy | wall-clock (best of 2) |
|---|---|
| salted two-phase (32 buckets) | {results[32]} s |
| unsalted (single reducer per tile) | {results[1]} s |

Wall-clock ratio salted/unsalted: **{1/speedup:.1f}x** (salting is NOT a
speed optimization at this scale — outputs identical: {identical}).

What the numbers mean: collect_list partials concatenate, so both variants
shuffle every id. The difference is REDUCER MEMORY: unsalted, the hot
tile's complete id list ({N:,} ids at z0) materializes in one aggregation
buffer — fine here, an OOM at 100 TB; salted, each buffer holds one
(tile, salt) slice and the phase-2 merge is <= 32 x cap ids per tile.
Salting is bounded-memory insurance bought with one extra exchange. The
true unbounded-tile path is counts-only (with_ids=False): one map-side-
combined row per tile, no id shuffle at all.
""")
    print(json.dumps({"salted_sec": results[32], "unsalted_sec": results[1],
                      "speedup": round(speedup, 2), "identical": identical}))


if __name__ == "__main__":
    main()
