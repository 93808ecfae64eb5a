"""Regenerate cloudtile_spark/goldens.py — committed golden-fixture oracles
for the deterministic queries whose outputs are not SQL-expressible
(MVT byte lengths, rasterized pixel counts, the pages-extraction invariant).

Each golden is an ANSI-SQL ``SELECT ... FROM (VALUES ...)`` captured from
the Spark result at the driver's gate scale (sf0.01), so the DuckDB side of
the correctness gate replays it and the driver records rows/schema/hash for
these queries too. The queries are deterministic by construction
(synthetic inputs + deterministic encoders); regenerate with:

    python tools/make_goldens.py [sf_dir]

after any intentional encoder change, and commit the diff.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = ["pages_extract", "mvt_tiles", "raster_zone_fill",
                  "raster_zonal_stats", "geom_mvt_tiles",
                  "zone_overlap_area_poly", "raster_polygonize"]

HEADER = '''"""AUTO-GENERATED golden-fixture oracles (tools/make_goldens.py).

DuckDB-runnable VALUES oracles captured from the deterministic Spark
results at sf0.01 (the driver's correctness-gate scale). Do not edit by
hand — regenerate after intentional encoder changes.
"""

GOLDEN_SQL = {
'''


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from cloudtile_spark.queries import REGISTRY
    from cloudtile_spark.session import get_spark

    spark = get_spark("goldens", cores=8, shuffle_partitions=8)
    out = [HEADER]
    for name in GOLDEN_QUERIES:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        cols = df.columns
        rows = sorted(tuple(r) for r in df.collect())
        values = ",\n      ".join(
            "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
        sql = (f"SELECT * FROM (VALUES\n      {values}\n"
               f"    ) AS t({', '.join(cols)})")
        out.append(f'    "{name}": """\n    {sql}\n    """,\n')
        print(f"{name}: {len(rows)} rows captured")
    out.append("}\n")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cloudtile_spark", "goldens.py")
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
