"""Two-parallelism probe for the graph family's workhorse: star-
contraction connected components (the engine behind every near-dup
cluster closure) at millions of edges.

Same discipline as the other round-5 probes: the edge list is
materialized ONCE to /dev/shm (untimed), connected_components runs at
local[8] and local[32] on the same parquet, min-of-REPEATS per level,
and the (node, component) output fingerprint must be identical at both
levels — CC is the hardest determinism case because its round count is
data-dependent, so identical fingerprints across parallelism are the
strongest cheap signal the contraction is order-free.

Graph: 2M nodes, 2 hash-mixed out-edges each (~4M directed rows before
dedup) — a sparse random graph whose giant component emerges at this
density, plus 100k planted 3-node chains off the main mass via the id
space above 2M (so small components exist too).

Usage: python tools/bench_graph_scale.py [nodes_n]   (default 2,000,000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudtile_spark.operators.graph import connected_components  # noqa: E402
from cloudtile_spark.session import get_spark  # noqa: E402

NODES_N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALE_LEVELS", "8,32").split(","))
REPEATS = int(os.environ.get("BENCH_REPEATS", "2"))
INPUT_DIR = "/dev/shm/graph_input"


def prepare_input() -> None:
    spark = get_spark("graph_prep", cores=32, shuffle_partitions=32)
    base = spark.range(NODES_N).selectExpr(
        "id AS src",
        f"pmod(xxhash64(id, 1), {NODES_N}) AS dst",
    ).unionAll(spark.range(NODES_N).selectExpr(
        "id AS src",
        f"pmod(xxhash64(id, 2), {NODES_N}) AS dst",
    ))
    chains = spark.range(100_000).selectExpr(
        f"{NODES_N} + id * 3 AS src", f"{NODES_N} + id * 3 + 1 AS dst"
    ).unionAll(spark.range(100_000).selectExpr(
        f"{NODES_N} + id * 3 + 1 AS src", f"{NODES_N} + id * 3 + 2 AS dst"))
    (base.unionAll(chains).repartition(64)
         .write.mode("overwrite").parquet(INPUT_DIR))
    spark.stop()


def run_level(cores: int) -> dict:
    spark = get_spark(f"graph_{cores}", cores=cores,
                      shuffle_partitions=cores * 2)
    edges = spark.read.parquet(INPUT_DIR)
    best, row = None, None
    for _ in range(REPEATS):
        t0 = time.time()
        cc = connected_components(edges, "src", "dst")
        row = cc.agg(
            F.count("*").alias("n"),
            F.countDistinct("component").alias("n_comp"),
            F.expr("bit_xor(xxhash64(node, component))").alias("fp"),
        ).collect()[0]
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    n_edges = 2 * NODES_N + 200_000
    return {"cores": cores, "sec": round(best, 2),
            "edges_per_sec": round(n_edges / best, 1),
            "n_nodes": row["n"], "n_components": row["n_comp"],
            "fp": row["fp"]}


def main() -> None:
    prepare_input()
    res = [run_level(c) for c in LEVELS]
    lo, hi = res[0], res[-1]
    eff = ((hi["edges_per_sec"] / lo["edges_per_sec"])
           / (hi["cores"] / lo["cores"]))
    print(json.dumps({
        "probe": "connected_components", "nodes_n": NODES_N,
        "planted_chains": 100_000, "levels": res,
        "identical_output": all(
            r["fp"] == lo["fp"] and r["n_nodes"] == lo["n_nodes"]
            and r["n_components"] == lo["n_components"] for r in res),
        "scaling_efficiency": round(eff, 3),
    }))
    shutil.rmtree(INPUT_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
