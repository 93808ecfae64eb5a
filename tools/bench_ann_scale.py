"""Corpus-scale + two-parallelism probe for the similarity-search family:
the registry's brute-force cosine top-k shape (`ann_cosine_topk` — fold
dot products in JVM higher-order functions, per-query window top-k) over
a deterministic synthetic embedding table.

Same discipline as bench_grams/bench_dedup_scale: vectors materialized
ONCE to /dev/shm (untimed), identical SQL at local[8] and local[32],
min-of-REPEATS, rank output fingerprint must match across levels.

Usage: python tools/bench_ann_scale.py [vecs_n] [n_queries] [dim]
       (defaults 500,000 / 32 / 32)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudtile_spark.session import get_spark  # noqa: E402

VECS_N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
N_Q = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 32
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALE_LEVELS", "8,32").split(","))
REPEATS = int(os.environ.get("BENCH_REPEATS", "2"))
INPUT_DIR = "/dev/shm/ann_input"

_VEC = (f"transform(sequence(0, {DIM - 1}), j -> "
        "cast(pmod(xxhash64(id, j), 1000) as float) / cast(1000.0 as float))")

_DOT = ("aggregate(zip_with(q.embedding, e.embedding, (x, y) -> "
        "cast(x as double) * cast(y as double)), cast(0.0 as double), "
        "(acc, v) -> acc + v)")
_NORM = ("sqrt(aggregate(transform({col}, x -> cast(x as double) * "
         "cast(x as double)), cast(0.0 as double), (acc, v) -> acc + v))")

# SHAPE=plain: the monolithic per-query window sort (the gate-scale
# baseline). SHAPE=salted (default): the scale shape — partial top-10
# per (query, salt) slice, final top-10 over the survivors; provably
# identical output (registry twin ann_cosine_topk_salted, hash-equal to
# the plain form in the oracle gate). The plain shape goes INVERSE at
# 64M candidates x 32 cores: 32 concurrent multi-GB sorts spill.
SHAPE = os.environ.get("ANN_SHAPE", "salted")

_D_CTE = f"""
WITH q AS (SELECT vec_id, embedding FROM vectors
           WHERE vec_id % {max(1, VECS_N // N_Q)} = 0),
d AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {_DOT} / ({_NORM.format(col='q.embedding')} *
                       {_NORM.format(col='e.embedding')}) AS sim
      FROM q CROSS JOIN vectors e WHERE e.vec_id <> q.vec_id)"""

if SHAPE == "plain":
    _SQL = _D_CTE + """,
r AS (SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM d)
SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 10
"""
else:
    _SQL = _D_CTE + """,
p AS (SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id, pmod(neighbor_id, 64)
                                ORDER BY sim DESC, neighbor_id) AS prk
      FROM d),
r AS (SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM p WHERE prk <= 10)
SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 10
"""


def prepare_input() -> None:
    spark = get_spark("ann_prep", cores=32, shuffle_partitions=32)
    (spark.range(VECS_N).repartition(64)
          .select(F.col("id").alias("vec_id"), F.expr(_VEC).alias("embedding"))
          .write.mode("overwrite").parquet(INPUT_DIR))
    spark.stop()


def run_level(cores: int) -> dict:
    spark = get_spark(f"ann_{cores}", cores=cores, shuffle_partitions=cores)
    spark.read.parquet(INPUT_DIR).createOrReplaceTempView("vectors")
    best, row = None, None
    for _ in range(REPEATS):
        t0 = time.time()
        row = spark.sql(_SQL).agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(query_id, neighbor_id, rank))")
             .alias("fp"),
        ).collect()[0]
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    cands = N_Q * VECS_N
    return {"cores": cores, "sec": round(best, 2),
            "cands_per_sec": round(cands / best, 1),
            "n": row["n"], "fp": row["fp"]}


def main() -> None:
    prepare_input()
    res = [run_level(c) for c in LEVELS]
    lo, hi = res[0], res[-1]
    eff = (hi["cands_per_sec"] / lo["cands_per_sec"]) / (hi["cores"] / lo["cores"])
    print(json.dumps({
        "probe": "ann_brute_cosine", "shape": SHAPE,
        "vecs_n": VECS_N, "n_queries": N_Q,
        "dim": DIM, "levels": res,
        "identical_output": all(r["fp"] == lo["fp"] and r["n"] == lo["n"]
                                for r in res),
        "scaling_efficiency": round(eff, 3),
    }))
    shutil.rmtree(INPUT_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
