"""Decompose the no-broadcast PIP leg's scaling by stage family: which
part fails to scale 2->8 — the JVM plan (shuffle + joins), the
Arrow/Python boundary, or the refine arithmetic?

Legs, each min-of-3 at local[2] and local[8] (fresh pinned JVM per
level, same /dev/shm input bench_bandwidth.py prepared):

  jvm_candidates — the IDENTICAL plan up to the cogroup (cell cover,
                   semi-join prefilter, salt explode) but the refine
                   replaced by a JVM count over the joined candidates:
                   zero Python, zero Arrow.
  arrow_passthru — the same point volume pushed through a trivial
                   mapInPandas (per-batch numpy sum): isolates the
                   JVM->Arrow->pandas->JVM round trip.
  full_pip       — pip_join_shuffle as benched.

Usage: python tools/bench_pip_decompose.py           # orchestrates
       python tools/bench_pip_decompose.py --single N
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT_DIR = "/dev/shm/bw_input"


def run_at(cores: int) -> dict:
    from pyspark.sql import functions as F

    from cloudtile_spark import cells as _cells
    from cloudtile_spark.operators.joins import (
        pip_join_shuffle, zone_cell_cover, zones_to_df)
    from cloudtile_spark.session import get_spark
    from cloudtile_spark.sources.zones import synth_zones

    spark = get_spark(
        f"decomp_{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf={
            "spark.driver.extraJavaOptions":
                f"-XX:ActiveProcessorCount={cores} "
                "-Djava.net.preferIPv4Stack=true",
        })
    feats = spark.read.parquet(INPUT_DIR)
    zdf = zones_to_df(spark, synth_zones(200))
    out = {"cores": cores}

    def timed3(fn):
        fn()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            n = fn()
            ts.append(time.time() - t0)
        return round(min(ts), 2), n

    # 1. JVM-only: identical candidate generation, no Python refine
    cover = zone_cell_cover(zdf, 7)
    pts = feats.withColumn("cell", F.expr(_cells.cell_sql("lon", "lat", 7)))
    pts = pts.join(cover.select("cell").distinct(), "cell", "left_semi")

    def jvm_candidates():
        return pts.join(cover.select("cell", "zone_id"), "cell").count()

    out["jvm_candidates_sec"], out["jvm_candidates_rows"] = \
        timed3(jvm_candidates)

    # 2. Arrow pass-through: same point volume, trivial python kernel
    import pandas as pd

    def passthru(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "s": [float(pdf.lon.to_numpy().sum()
                            + pdf.lat.to_numpy().sum())]})

    def arrow_passthru():
        return feats.mapInPandas(
            passthru, schema="s double").count()

    out["arrow_passthru_sec"], out["arrow_passthru_rows"] = \
        timed3(arrow_passthru)

    # 3. the full leg
    def full():
        return pip_join_shuffle(feats, zdf, res=7, salt_buckets=8).count()

    out["full_pip_sec"], out["full_pip_rows"] = timed3(full)
    spark.stop()
    print(json.dumps(out))
    return out


def main() -> None:
    if "--single" in sys.argv:
        run_at(int(sys.argv[sys.argv.index("--single") + 1]))
        return

    import subprocess

    res = []
    for c in (2, 8):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(c)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        res.append(json.loads(out.stdout.strip().splitlines()[-1]))
    lo, hi = res
    for leg in ("jvm_candidates", "arrow_passthru", "full_pip"):
        eff = (lo[f"{leg}_sec"] / hi[f"{leg}_sec"]) / 4
        print(f"{leg}: local[2]={lo[f'{leg}_sec']}s "
              f"local[8]={hi[f'{leg}_sec']}s eff={eff:.2f}")
    print(json.dumps({"lo": lo, "hi": hi}))


if __name__ == "__main__":
    main()
