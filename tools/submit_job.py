"""spark-submit entry point (the reference's remote-execution analogue —
ECS Fargate task, reference src/cloudtile/ecs.py:104-143 — re-pointed at
spark-submit, which is how the north star runs at N and 4N executors).

Usage (tools/make_dist.sh builds the zip):
    spark-submit --master local[8] \
        --py-files dist/cloudtile_spark.zip \
        tools/submit_job.py pyramid <pages.parquet|synth:N> <minz> <maxz> <out>

On a cluster the only change is --master/--deploy-mode and executor sizing
(the Fargate memory/storage overrides of reference ecs.py:58-102 become
--executor-memory/--executor-cores).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def run_job(spark, job: str, src: str, out: str, settings) -> dict:
    """Execute one job described by a job spec (callable from tests and
    from the spark-submit entry below)."""
    from cloudtile_spark.operators.extract import extract_features
    from cloudtile_spark.operators.pyramid import build_pyramid
    from cloudtile_spark.sources.pages import synth_pages

    t0 = time.time()
    if src.startswith("synth:"):
        pages = synth_pages(spark, int(src.split(":")[1]))
    elif src.startswith("table:"):
        pages = spark.read.table(src.split(":", 1)[1])
    else:
        pages = spark.read.parquet(src)
    feats = extract_features(pages.drop(*(
        c for c in ("page_id",) if c in pages.columns)))
    if job == "pyramid":
        tiles_df = build_pyramid(feats, settings=settings, with_ids=False)
        tiles_df.write.mode("overwrite").partitionBy("z").parquet(out)
        n = spark.read.parquet(out).count()
        return {"job": job, "tiles": n, "sec": round(time.time() - t0, 2)}
    raise SystemExit(f"unknown job {job}")


def run_query_job(spark, name: str, sf_dir: str, out: str) -> dict:
    """Run ANY registry query by name against a table directory and sink
    the result to parquet — the deployment shape for the whole engine:
    `spark-submit --py-files dist/cloudtile_spark.zip tools/submit_job.py
    query <name> <sf_dir> <out>`. On a cluster only --master and executor
    sizing change."""
    from cloudtile_spark.queries import REGISTRY

    if name not in REGISTRY:
        raise SystemExit(f"unknown query {name!r} "
                         f"({len(REGISTRY)} registered)")
    t0 = time.time()
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    df.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    return {"job": "query", "query": name, "rows": n,
            "sec": round(time.time() - t0, 2)}


def main() -> int:
    from cloudtile_spark.settings import TilingSettings

    if sys.argv[1] == "--job-spec":
        # JSON job spec (TilingSettings.to_job_spec round-trip): the arg
        # re-serialization path for remote execution — reference
        # cli convert_to_list_args semantics, as a spec file instead of argv
        with open(sys.argv[2]) as f:
            spec = json.load(f)
        job, src, out = spec["job"], spec["src"], spec["out"]
        settings = TilingSettings.from_job_spec(spec)
    elif sys.argv[1] == "query":
        name, sf_dir, out = sys.argv[2:5]
        spark = SparkSession.builder.appName(
            f"cloudtile_spark_query_{name}").getOrCreate()
        print(json.dumps(run_query_job(spark, name, sf_dir, out)))
        spark.stop()
        return 0
    else:
        job, src, minz, maxz, out = sys.argv[1:6]
        settings = TilingSettings()
        settings["minimum-zoom"] = int(minz)
        settings["maximum-zoom"] = maxz if maxz == "g" else int(maxz)
    spark = SparkSession.builder.appName(f"cloudtile_spark_{job}").getOrCreate()
    print(json.dumps(run_job(spark, job, src, out, settings)))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
