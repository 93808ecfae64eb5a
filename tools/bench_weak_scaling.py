"""WEAK-scaling evidence for the two no-broadcast PIP twins (r5 VERDICT
Next #5): double the candidate volume WITH the cores.

The strong-scaling proxy (bench_scaling.py) is confounded by the measured
per-candidate row-production plateau on this shared-socket sandbox
(BENCH/SHUFFLE_JOIN.md): fixed work at more cores saturates the socket,
which reads as poor scaling even when parallelization itself is fine. In
a weak-scaling run — cores x4 AND input x4 — per-core work is constant,
so shared-socket saturation and true parallelization loss separate:
efficiency = T_small / T_big (ideal 1.0; north-rule bar 0.8).

Levels: local[2] @ 1x pages vs local[8] @ 4x pages, each level in its own
subprocess with -XX:ActiveProcessorCount pinning (same discipline as
bench_scaling.py). Appends a table to BENCH/BASELINE.md.

Usage: python tools/bench_weak_scaling.py [small_pages_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 500_000
LEVELS = ((2, 1), (8, 4))  # (cores, input multiple)
INPUT_TMPL = "/dev/shm/weak_input_x{mult}"
N_ZONES = 200


def prepare_inputs() -> None:
    from cloudtile_spark.operators.extract import extract_features
    from cloudtile_spark.session import get_spark
    from cloudtile_spark.sources.pages import synth_pages

    spark = get_spark("weak_prep", cores=32, shuffle_partitions=32)
    for _, mult in LEVELS:
        out = INPUT_TMPL.format(mult=mult)
        if os.path.isdir(out):
            continue
        feats = extract_features(
            synth_pages(spark, SMALL_PAGES * mult, partitions=64)
            .drop("page_id")).select("feature_id", "lon", "lat")
        feats.repartition(64).write.mode("overwrite").parquet(out)
    spark.stop()


def run_at(cores: int, mult: int) -> dict:
    from pyspark.sql import functions as F  # noqa: F401
    from cloudtile_spark.operators.joins import (
        pip_join_shuffle, pip_join_shuffle_codegen, zones_to_df)
    from cloudtile_spark.session import get_spark
    from cloudtile_spark.sources.zones import synth_zones

    spark = get_spark(
        f"weak_{cores}x{mult}", cores=cores, shuffle_partitions=cores,
        extra_conf={
            "spark.driver.extraJavaOptions":
                f"-XX:ActiveProcessorCount={cores} "
                "-Djava.net.preferIPv4Stack=true",
        },
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    feats = spark.read.parquet(INPUT_TMPL.format(mult=mult))
    zones = synth_zones(N_ZONES)
    zdf = zones_to_df(spark, zones)

    pip_join_shuffle(feats.limit(50_000), zdf, res=7,
                     salt_buckets=8).count()  # warmup
    ts, n_sh = [], 0
    for _ in range(3):
        t0 = time.time()
        n_sh = pip_join_shuffle(feats, zdf, res=7, salt_buckets=8).count()
        ts.append(time.time() - t0)
    t_cogroup = min(ts)

    pip_join_shuffle_codegen(feats.limit(50_000), zones, res=7).count()
    ts2, n_cg = [], 0
    for _ in range(3):
        t0 = time.time()
        n_cg = pip_join_shuffle_codegen(feats, zones, res=7).count()
        ts2.append(time.time() - t0)
    t_codegen = min(ts2)
    spark.stop()
    return {
        "cores": cores, "mult": mult,
        "pages": SMALL_PAGES * mult,
        "cogroup_sec": round(t_cogroup, 2), "cogroup_rows": n_sh,
        "codegen_sec": round(t_codegen, 2), "codegen_rows": n_cg,
    }


def main() -> None:
    import subprocess

    prepare_inputs()
    results = []
    for cores, mult in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(SMALL_PAGES),
             "--single", str(cores), str(mult)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    lo, hi = results
    eff_co = lo["cogroup_sec"] / hi["cogroup_sec"]
    eff_cg = lo["codegen_sec"] / hi["codegen_sec"]
    rows_ratio_co = hi["cogroup_rows"] / max(1, lo["cogroup_rows"])
    table = f"""

## Weak scaling (r6, VERDICT Next #5): cores x4 AND input x4

Per-core work constant — separates shared-socket row-production
saturation (which poisons the strong-scaling proxy) from true
parallelization loss. Efficiency = T_small / T_big, ideal 1.0, bar 0.8.
local[{lo['cores']}] @ {lo['pages']:,} pages vs local[{hi['cores']}] @
{hi['pages']:,} pages, {N_ZONES} zones, both no-broadcast twins
(autoBroadcastJoinThreshold=-1).

| leg | local[{lo['cores']}] @1x (sec) | local[{hi['cores']}] @4x (sec) | weak efficiency |
|---|---|---|---|
| no-broadcast cogroup PIP | {lo['cogroup_sec']} | {hi['cogroup_sec']} | {eff_co:.2f} |
| no-broadcast ALL-JVM PIP | {lo['codegen_sec']} | {hi['codegen_sec']} | {eff_cg:.2f} |

Output rows scale with input ({lo['cogroup_rows']:,} -> {hi['cogroup_rows']:,},
x{rows_ratio_co:.2f}); cogroup and codegen twins agree at both levels:
{lo['cogroup_rows'] == lo['codegen_rows']} / {hi['cogroup_rows'] == hi['codegen_rows']}.

Raw: ```{json.dumps(results)}```
"""
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(table)
    print(json.dumps({
        "weak_efficiency_cogroup": round(eff_co, 3),
        "weak_efficiency_codegen": round(eff_cg, 3),
        "results": results,
    }))


if __name__ == "__main__":
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        print(json.dumps(run_at(int(sys.argv[i + 1]), int(sys.argv[i + 2]))))
    else:
        main()
