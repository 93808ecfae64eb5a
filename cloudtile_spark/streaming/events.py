"""Structured Streaming pipelines over the events table.

The reference is batch-only (SURVEY.md §2.C: no streaming anywhere in
cloudtile); this module adds the streaming surface a web-scale ingest
pipeline needs, with semantics matching the oracle-checked batch twins in
queries.py (events_hourly / events_sessionize):

- hourly tumbling-window counts with a 2h watermark for late data
- streaming dedup (dropDuplicatesWithinWatermark on event_id)
- stateful per-user running counts via applyInPandasWithState

Tested by streaming the events parquet through a file source into a memory
sink and comparing against the batch aggregation (tests/test_streaming.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path_dir)


def hourly_counts(stream: DataFrame) -> DataFrame:
    """Tumbling 1h window per event_type; watermark bounds state for late
    rows (the streaming twin of the oracle-checked events_hourly query)."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum((F.round(F.col("value") * 100, 0)).cast("bigint"))
              .alias("value_cents"))
        .select(
            F.col("w.start").alias("hour"), "event_type", "n", "value_cents",
        )
    )


def session_windows_stream(stream: DataFrame,
                           gap: str = "30 minutes",
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the oracle-checked `events_session_window` batch
    query: native ``F.session_window`` (the whole point of the built-in —
    the same operator serves batch and stream), watermark-bounded state.
    In append mode only sessions finalized by the watermark emit (a
    session closes once the watermark passes its end); in complete mode
    the sink holds every session, matching batch exactly. Output schema
    matches the batch query: (user_id, session_start_us, session_end_us,
    n_events), integer micros."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start"))
            .alias("session_start_us"),
            F.unix_micros(F.col("session_window.end"))
            .alias("session_end_us"),
            "n_events",
        )
    )


def dedup_stream(stream: DataFrame) -> DataFrame:
    """Exactly-once-per-event_id within the watermark horizon."""
    return stream.withWatermark("ts", "2 hours") \
        .dropDuplicatesWithinWatermark(["event_id"])


_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])
_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("events_so_far", T.LongType()),
])


def running_user_counts(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running event count via
    applyInPandasWithState (the engine's arbitrary-state surface)."""

    def fn(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "events_so_far": [n]})

    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            fn, outputStructType=_OUT_SCHEMA, stateStructType=_STATE_SCHEMA,
            outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FEATURES_SCHEMA = "feature_id long, lon double, lat double"


def read_features_stream(spark: SparkSession, path_dir: str) -> DataFrame:
    return spark.readStream.schema(FEATURES_SCHEMA).parquet(path_dir)


def incremental_tile_counts(stream: DataFrame, minz: int, maxz: int) -> DataFrame:
    """Streaming tile-pyramid maintenance: as new features arrive, per-tile
    feature counts update incrementally (update output mode) — the
    incremental twin of the batch pyramid; same JVM-side tile math.

    State per (z, x, y) is a counter — bounded by the tile universe touched
    so far, no per-feature state.
    """
    from .. import tiles as _tiles

    return (
        stream
        .withColumn("z", F.explode(F.sequence(F.lit(minz), F.lit(maxz))))
        .withColumn("x", F.expr(_tiles.tile_x_sql("lon", "z")))
        .withColumn("y", F.expr(_tiles.tile_y_sql("lat", "z")))
        .groupBy("z", "x", "y")
        .agg(F.count("*").alias("feature_count"))
    )


def sliding_counts(stream: DataFrame,
                   duration: str = "2 hours",
                   slide: str = "1 hour") -> DataFrame:
    """OVERLAPPING (sliding) window counts per event_type — the streaming
    shape hourly_counts (tumbling) does not cover: each event lands in
    duration/slide windows, so the operator tests window REPLICATION, not
    just bucketing. Same ``F.window`` call serves batch and stream; the
    parity test runs this exact function in both modes. Watermark bounds
    state to (duration + lateness) per key."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"), "event_type", "n")
    )


def run_to_parquet_once(stream_df: DataFrame, out_dir: str,
                        checkpoint_dir: str):
    """One availableNow pass into a parquet sink with a durable
    checkpointLocation — the restart/exactly-once contract: a SECOND call
    with the same checkpoint processes only source files the first pass
    had not committed (file-source offsets are replayed from the
    checkpoint's offset/commit logs), so a crash between passes never
    duplicates or drops rows."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return q


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "update"):
    """Drive a streaming DF into a memory sink until idle; returns the query."""
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return q


DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")


def read_docs_stream(spark: SparkSession, path_dir: str) -> DataFrame:
    """File-source stream over a directory of documents parquet files."""
    return spark.readStream.schema(DOCS_SCHEMA).parquet(path_dir)


def flag_near_dups_stream(doc_stream: DataFrame,
                          corpus_index: DataFrame) -> DataFrame:
    """STREAM-STATIC near-dup flagging: incoming documents are checked
    against a static MinHash band-key index of the existing corpus — the
    online admission filter a training pipeline runs on a crawl stream.

    The stream side computes the SAME banded signature SQL as the batch
    dedup path (JVM codegen per micro-batch); the join is stream-static
    (no state store, the static side broadcast/hash per micro-batch), so
    throughput scales with the micro-batch, not history. Output: one row
    per (incoming doc, band-colliding corpus doc), deduplicated.
    """
    from ..operators import dedup as dd

    d = dd.SPARK
    sigc = d.minhash_sig_cols("hashes")
    bands = d.band_keys(sigc)
    with_keys = doc_stream.selectExpr(
        "doc_id",
        f"{d.shingle_hashes('text', 3)} AS hashes",
    ).selectExpr(
        "doc_id",
        *[f"{b} AS bk{i}" for i, b in enumerate(bands)],
    )
    melted = with_keys.selectExpr(
        "doc_id",
        "stack(4, 0, bk0, 1, bk1, 2, bk2, 3, bk3) AS (band, key)",
    )
    hits = melted.join(
        corpus_index,
        (melted.band == corpus_index.c_band)
        & (melted.key == corpus_index.c_key)
        & (melted.doc_id != corpus_index.corpus_doc_id),
    )
    return hits.select("doc_id", "corpus_doc_id").dropDuplicates(
        ["doc_id", "corpus_doc_id"])


def corpus_band_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static band-key index over the documents table (the 'already
    admitted' corpus)."""
    from ..operators import dedup as dd

    d = dd.SPARK
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")
    corpus = "corpus AS (SELECT doc_id, text FROM documents)"
    sql = dd.minhash_band_rows_sql(d, corpus)
    return spark.sql(sql).selectExpr(
        "doc_id AS corpus_doc_id", "band AS c_band", "key AS c_key")


def follow_up_pairs(stream: DataFrame, gap_minutes: int = 10) -> DataFrame:
    """STREAM-STREAM self-join: pairs of events by the same user where the
    second follows the first within ``gap_minutes`` — the funnel/attribution
    shape. Both sides carry watermarks and the join condition is
    time-bounded, so Spark can expire state (the unbounded-state trap of
    stream-stream joins is exactly what the bound avoids).
    """
    from pyspark.sql import functions as F

    a = stream.withWatermark("ts", f"{gap_minutes} minutes") \
              .select(F.col("user_id").alias("a_user"),
                      F.col("event_id").alias("a_event"),
                      F.col("ts").alias("a_ts"))
    b = stream.withWatermark("ts", f"{gap_minutes} minutes") \
              .select(F.col("user_id").alias("b_user"),
                      F.col("event_id").alias("b_event"),
                      F.col("ts").alias("b_ts"))
    return a.join(
        b,
        F.expr(f"""
            a_user = b_user AND b_ts > a_ts
            AND b_ts <= a_ts + interval {gap_minutes} minutes
            AND a_event < b_event
        """),
    ).select("a_user", "a_event", "b_event")


_ASOF_STATE = T.StructType([
    T.StructField("click_id", T.LongType()),
    T.StructField("click_ts_us", T.LongType()),
])
_ASOF_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("purchase_id", T.LongType()),
    T.StructField("ts_us", T.LongType()),
    T.StructField("click_id", T.LongType()),
    T.StructField("click_ts_us", T.LongType()),
    T.StructField("gap_us", T.LongType()),
])


def asof_enrich_stream(stream: DataFrame) -> DataFrame:
    """Streaming as-of: the stateful twin of operators/temporal.asof_join.

    The state store keeps ONE row per user (latest click id + timestamp);
    every purchase emits immediately, enriched with that state — O(1)
    state per key vs. the batch union+window which needs the whole
    history. Equal-timestamp semantics match the batch operator: a click
    at exactly the purchase ts IS visible (clicks sort first within a
    batch), and equal-ts clicks resolve to the highest event_id.

    Cross-batch ordering caveat (standard for stream processing): rows
    are ordered within each micro-batch; late clicks arriving in a LATER
    batch than a purchase they precede do not retro-enrich it. The batch
    twin is the backfill path for that case.
    """

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            last_id, last_ts = state.get
        else:
            last_id, last_ts = None, None
        out = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf["tus"] = pdf["ts"].astype("int64") // 1000  # ns -> us
        pdf["prank"] = (pdf["event_type"] == "purchase").astype("int64")
        pdf = pdf.sort_values(["tus", "prank", "event_id"])
        for r in pdf.itertuples():
            if r.event_type == "click":
                last_id, last_ts = int(r.event_id), int(r.tus)
            elif r.event_type == "purchase":
                out.append((
                    int(key[0]), int(r.event_id), int(r.tus),
                    last_id, last_ts,
                    None if last_ts is None else int(r.tus) - last_ts,
                ))
        if last_id is not None:
            state.update((last_id, last_ts))
        yield pd.DataFrame(
            out, columns=[f.name for f in _ASOF_OUT.fields])

    return (
        stream.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, outputStructType=_ASOF_OUT, stateStructType=_ASOF_STATE,
            outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def route_quality_stream(doc_stream: DataFrame, pass_dir: str,
                         fail_dir: str, checkpoint_dir: str):
    """Multi-sink quality routing via foreachBatch — the production
    corpus-ingest shape: one pass over the stream, rows routed to a
    keep sink and a reject sink by a stateless quality rule (alnum
    ratio >= 60% and length >= 20, computed JVM-side).

    foreachBatch is exactly-once only if the batch write is IDEMPOTENT
    under retries; each sink therefore writes to a batch=<id>
    subdirectory with mode("overwrite") — a replayed batch overwrites
    its own output instead of duplicating it (read the sink with
    spark.read.parquet(dir) — the batch= partitioning is transparent).
    """
    flagged = doc_stream.withColumn(
        "q_pass",
        (F.length("text") >= 20)
        & (F.length(F.regexp_replace("text", "[^a-z0-9A-Z]", ""))
           * 10 >= F.length("text") * 6),
    )

    def route(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.filter("q_pass").drop("q_pass").write \
                .mode("overwrite").parquet(f"{pass_dir}/batch={batch_id}")
            batch_df.filter("NOT q_pass").drop("q_pass").write \
                .mode("overwrite").parquet(f"{fail_dir}/batch={batch_id}")
        finally:
            batch_df.unpersist()

    q = (flagged.writeStream.foreachBatch(route)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
