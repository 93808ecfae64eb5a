"""Corpus-scale + two-parallelism probe for the word-gram quality
pipeline (text_repetition_gopher): the heaviest LLM-corpus shape added
in round 5 — per-doc 2-gram and 5-gram hash aggs over ~115 n-gram rows
per document.

Same discipline as tools/bench_scaling.py: a deterministic synthetic
corpus is materialized ONCE to /dev/shm (untimed), then the identical
registry SQL runs at local[8] and local[32] on the same parquet;
reports docs/s at both levels, efficiency = (T_8 / T_32) / 4, and an
order-insensitive output fingerprint that must be identical at both
levels (the determinism half of the two-cluster-size equivalence
check).

Usage: python tools/bench_grams.py [docs_n]   (default 1,000,000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudtile_spark import queries  # noqa: E402
from cloudtile_spark.session import get_spark  # noqa: E402

DOCS_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALE_LEVELS", "8,32").split(","))
INPUT_DIR = "/dev/shm/grams_input"

# 64-word vocabulary; every doc is 60 words drawn by integer hash
# arithmetic, and every 7th doc repeats one 5-word block 4x so the
# duplicated-5-gram branch does real work. Pure codegen — no Python.
_VOCAB = ("array(" + ", ".join(
    f"'w{i:02d}'" for i in range(64)) + ")")
_TEXT = (
    "array_join(transform(sequence(0, 59), j -> element_at(v, 1 + cast("
    "  (id * 61 + CASE WHEN id % 7 = 0 THEN (j % 5) * 17"
    "   ELSE j * 17 + j * j END) % 64 as int))), ' ')"
)


def prepare_input() -> None:
    spark = get_spark("grams_prep", cores=32, shuffle_partitions=32)
    (spark.range(DOCS_N).repartition(64)
          .withColumn("v", F.expr(_VOCAB))
          .select(F.col("id").alias("doc_id"),
                  F.expr(_TEXT).alias("text"))
          .write.mode("overwrite").parquet(INPUT_DIR))
    spark.stop()


REPEATS = int(os.environ.get("BENCH_REPEATS", "2"))


def run_level(cores: int) -> dict:
    """min-of-REPEATS (same discipline as bench.py: the shared host shows
    ~20% run-to-run swing; one sample grades noise, not the engine)."""
    spark = get_spark(f"grams_{cores}", cores=cores,
                      shuffle_partitions=cores)
    spark.read.parquet(INPUT_DIR).createOrReplaceTempView("documents")
    best, row = None, None
    for _ in range(REPEATS):
        t0 = time.time()
        out = spark.sql(queries.GOPHER_SPARK_SQL)
        row = out.agg(
            F.count("*").alias("n"),
            F.sum("passes_gopher").alias("n_pass"),
            F.expr("bit_xor(xxhash64(doc_id, top2_chars, norm_chars,"
                   " dup5_chars, all5_chars, passes_gopher))").alias("fp"),
        ).collect()[0]
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return {"cores": cores, "sec": round(best, 2),
            "docs_per_sec": round(DOCS_N / best, 1),
            "n": row["n"], "n_pass": row["n_pass"], "fp": row["fp"]}


def main() -> None:
    prepare_input()
    res = [run_level(c) for c in LEVELS]
    lo, hi = res[0], res[-1]
    ratio = hi["cores"] / lo["cores"]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    report = {
        "probe": "gopher_grams", "docs_n": DOCS_N, "levels": res,
        "identical_output": all(r["fp"] == lo["fp"] and r["n"] == lo["n"]
                                for r in res),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))
    shutil.rmtree(INPUT_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
