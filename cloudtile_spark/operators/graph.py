"""Distributed connected components (alternating large-star / small-star).

Near-dup detection (MinHash/SimHash/n-gram — operators/dedup.py) emits
PAIRS; a real corpus dedup needs the transitive closure of those pairs so
a keeper policy runs once per CLUSTER, not per edge (A~B, B~C must put
A,B,C in one cluster even though A~C was never emitted). The reference has
no graph surface (subprocess pipeline, SURVEY.md §2.C); this is the
north-rule / training-pipeline operator.

Scale design — why star-contraction, not label propagation or recursion:
- Plain min-label propagation converges in O(component diameter)
  iterations — a 10k-long chain of near-dups (boilerplate drift) costs
  10k shuffles. The alternating large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14) converges in O(log n) rounds on any graph shape.
- Every round is two hash aggregations + joins keyed on node id — plain
  Catalyst shuffles, no broadcast, no UDF, AQE-splittable. Edge state
  never exceeds the input edge count (stars only shrink it).
- The driver loop only compares two scalar aggregates per round
  (edge count + xor-ish checksum) — no .collect() of data.

Result: every node maps to the MINIMUM node id of its component (the
star algorithms provably converge to min-rooted stars), which makes the
output deterministic and oracle-checkable (DuckDB recursive CTE computes
the same min-reachable label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _checksum(e: DataFrame) -> tuple:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("s"),
    ).collect()[0]
    return (row["n"], row["s"])


def _large_star(e: DataFrame) -> DataFrame:
    """Input: symmetric edge list (u,v). For each u connect every strictly
    larger neighbor to min(Gamma(u) ∪ {u}). Output directed (bigger ->
    smaller) edges.

    No dedup here: the output is exactly one row per undirected input edge
    (the v > u filter keeps one orientation), so it cannot grow, and
    _small_star's terminal distinct dedupes anything that coincides — a
    distinct at this point was one whole extra exchange per round."""
    mins = e.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        e.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"),
                F.least(F.col("u"), F.col("mn")).alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Input: directed (u,v) with v < u. Connect u and all its smaller
    neighbors to the smallest of them."""
    mins = e.groupBy("u").agg(F.min("v").alias("mn"))
    joined = e.join(mins, "u")
    a = (joined.where(F.col("v") != F.col("mn"))
         .select(F.col("v").alias("u"), F.col("mn").alias("v")))
    b = (mins.where(F.col("u") != F.col("mn"))
         .select("u", F.col("mn").alias("v")))
    return a.unionByName(b).distinct()


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (node BIGINT, component BIGINT): component = min node id of
    the node's connected component. Self-loops ignored; isolated endpoints
    (only self-loop rows) still appear mapped to themselves."""
    # Truncate the INPUT lineage once: the edge list is consumed by three
    # independent subtrees (nodes, the loop seed, nothing else) and often
    # sits on top of an expensive upstream plan (the MinHash verify join in
    # dedup_cc_clusters). Without this, every consumer re-plans, re-codegens
    # and re-executes that whole subtree — measured 4.7s of the leg's time
    # in the final output job alone. The checkpoint materializes lazily
    # inside the first checksum job.
    raw = edges.select(F.col(src).cast("long").alias("u"),
                       F.col(dst).cast("long").alias("v")) \
        .localCheckpoint(eager=False)
    nodes = (raw.select("u").unionByName(raw.select(F.col("v").alias("u")))
             .distinct())
    # Loop state is the DIRECTED edge set (every row v < u, one row per
    # undirected edge): the symmetric view each large-star round needs is
    # d UNION swap(d), which is distinct BY CONSTRUCTION (the two halves
    # are disjoint), so the old symmetrize-then-distinct exchange at the
    # end of every round disappears and the checkpointed state is half
    # the rows.
    d = (raw.where(F.col("u") != F.col("v"))
         .select(F.greatest("u", "v").alias("u"),
                 F.least("u", "v").alias("v"))
         .distinct())

    # Iterative state MUST truncate lineage each round (localCheckpoint):
    # without it the plan doubles per iteration and analysis time explodes
    # (measured: 3 edges / 3 rounds = 86s un-truncated, <10s truncated).
    # eager=False: the checkpoint materializes inside the SAME job as the
    # convergence checksum that immediately follows (the first action on
    # the marked RDD caches it), so each round costs ONE Spark job instead
    # of two — per-round latency, not data volume, dominates this loop.
    # On a real cluster with executor churn, swap for checkpoint() against
    # a reliable dir — same call shape, durability instead of locality.
    d = d.localCheckpoint(eager=False)
    prev_sig = _checksum(d)
    for _ in range(max_iter):
        sym = d.unionByName(
            d.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star needs the symmetric view; its output is directed,
        # small-star keeps it directed (every output row has v < u).
        d = _small_star(_large_star(sym)).localCheckpoint(eager=False)
        sig = _checksum(d)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds")

    # converged: the directed state is a star child -> root map.
    roots = d.groupBy("u").agg(F.min("v").alias("comp"))
    return (nodes.join(roots, "u", "left")
            .select(F.col("u").alias("node"),
                    F.coalesce(F.col("comp"), F.col("u"))
                    .alias("component")))


def pagerank_quantized(edges: DataFrame, nodes: DataFrame,
                       iters: int = 3, scale: int = 10**9,
                       damping_pct: int = 85) -> DataFrame:
    """PageRank in QUANTIZED INTEGER space — the bit-exact-iteration
    trick (kmeans_embeddings_exact) applied to graph analytics: ranks are
    integers, per-edge contributions are floor(rank / out_degree), and
    the damping step is floor(sum * damping_pct / 100), all via exact
    double ops on values << 2^53 — so the whole trajectory is identical
    for ANY partitioning and replayable as a straight-line SQL unrolling
    (the DuckDB oracle of `graph_pagerank`).

    Scale shape per iteration: one equi-join of edges with the rank table
    on src (shuffle on node id, AQE-splittable), one hash aggregate on
    dst, one left join back to the node table — no broadcast of
    data-derived frames, lineage truncated per round (localCheckpoint,
    the O(log) lesson from connected_components).

    `edges` needs (src, dst, out_deg); `nodes` needs (node). Returns
    (node, rank_q) with rank_q = quantized integer rank after `iters`
    iterations.
    """
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.select("node", F.lit(int(scale)).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(
                "dst",
                F.floor(F.col("r").cast("double")
                        / F.col("out_deg").cast("double"))
                .cast("long").alias("c"),
            )
        )
        s = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(s, nodes["node"] == s["dst"], "left")
            .select(
                "node",
                (F.lit(int(base)) + F.floor(
                    F.coalesce(F.col("s"), F.lit(0)).cast("double")
                    * damping_pct / 100.0).cast("long")).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_q"))


def kcore_residual(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Fixed-round k-core peeling: each round drops every node whose
    degree in the CURRENT residual graph is < k, then induces the
    subgraph on the survivors. With a fixed `rounds` the trajectory is
    deterministic for any partitioning (same fixed-iteration discipline
    as pagerank_quantized, so the DuckDB oracle is a straight-line CTE
    unrolling); pick rounds so the peel has converged at the data scale
    (the oracle prototype converged in 6 on the gate graph — and a
    converged residual IS the k-core).

    Scale shape per round: one hash agg on u (degree), two semi-joins of
    the residual edges against the survivor set — all shuffles on the
    node key, no broadcast of data-derived frames, lineage truncated per
    round (localCheckpoint, the O(log) lesson from connected_components).

    `edges` must hold BOTH directions of each undirected edge,
    deduplicated, no self-loops: columns (u, v). Returns (node, deg) =
    survivors of the last round with their residual degree.
    """
    e = edges.select("u", "v")
    for _ in range(rounds):
        alive = (e.groupBy("u").agg(F.count("*").alias("deg"))
                  .filter(F.col("deg") >= k).select("u"))
        e = (e.join(alive, "u", "left_semi")
              .join(alive.withColumnRenamed("u", "v"), "v", "left_semi")
              .select("u", "v")
              .localCheckpoint(eager=True))
    return (e.groupBy("u").agg(F.count("*").alias("deg"))
             .select(F.col("u").alias("node"), "deg"))


def label_propagation_sync(edges: DataFrame, nodes: DataFrame,
                           rounds: int) -> DataFrame:
    """SYNCHRONOUS label propagation (community detection): every node
    starts as its own label; each round ALL nodes simultaneously adopt
    the mode of their neighbors' labels, ties broken by smallest label.
    Synchronous updates + deterministic tiebreak make the trajectory
    identical for any partitioning (async LPA — the textbook default —
    is order-dependent and would not oracle), so the DuckDB oracle is a
    straight-line MATERIALIZED-CTE unrolling of the same recurrence.

    Scale shape per round: one edges-labels equi-join on the node key,
    one (node, label) hash agg, one per-node argmax window (partitioned
    by node — never a global sort), lineage truncated per round.

    `edges` must hold both directions, deduplicated, no self-loops:
    (u, v). `nodes` needs (node). Returns (node, lbl) for nodes WITH at
    least one incident edge: an isolated node has no neighbor mode to
    adopt and drops out after round 1 (r5 ADVICE note — callers that
    need every input node back should left-join `nodes` and
    coalesce(lbl, node)).
    """
    labels = nodes.select("node", F.col("node").alias("lbl"))
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("lbl"))
    for _ in range(rounds):
        neigh = (edges.join(labels, edges["v"] == labels["node"])
                      .select(edges["u"].alias("node"), "lbl"))
        counts = neigh.groupBy("node", "lbl").agg(F.count("*").alias("cnt"))
        labels = (counts.withColumn("rn", F.row_number().over(w))
                        .filter(F.col("rn") == 1)
                        .select("node", "lbl")
                        .localCheckpoint(eager=True))
    return labels


def bfs_distances(edges: DataFrame, nodes: DataFrame, source: int,
                  rounds: int) -> DataFrame:
    """Fixed-round BFS shortest-path distances from `source`: each round
    relaxes the frontier one hop (min-distance union of the settled set
    and every settled neighbor + 1). min() makes each round a hash agg —
    re-settling an already-settled node can never raise its distance, so
    the fixed-round trajectory is deterministic for any partitioning and
    the DuckDB oracle is a straight-line MATERIALIZED-CTE unrolling.

    Scale shape per round: one edges-frontier equi-join on the node key
    + one min() hash agg — the same cost envelope as a PageRank round;
    lineage truncated per round (localCheckpoint).

    `edges` must hold both directions, deduplicated, no self-loops:
    (u, v). Returns (node, dist) for every node within `rounds` hops.
    """
    dist = (nodes.filter(F.col("node") == source)
                 .select("node", F.lit(0).cast("long").alias("dist")))
    for _ in range(rounds):
        nxt = (edges.join(dist, edges["v"] == dist["node"])
                    .select(edges["u"].alias("node"),
                            (F.col("dist") + 1).alias("dist")))
        dist = (dist.unionByName(nxt)
                    .groupBy("node").agg(F.min("dist").alias("dist"))
                    .localCheckpoint(eager=True))
    return dist
