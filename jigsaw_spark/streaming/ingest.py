"""Structured Streaming: incremental ingest + windowed aggregation.

The reference's only incrementality is skip-existing file downloads (F8,
jigsaw/io_utils.py:89,150). The engine upgrade (SURVEY §2.8, §7.1 step 10):
a Structured Streaming file source with ``Trigger.AvailableNow`` — Spark's
checkpoint tracks which files were ingested, so re-runs process only new
arrivals (exactly the skip-existing contract, but transactional and
cluster-safe instead of ls-based).

Windowed aggregation: tumbling event-time windows + watermark for late
data — the streaming form of the w3_hourly_rollup batch query; the batch
and streaming plans produce identical results on a static directory, which
is what tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # The parquet physical type is TIMESTAMP(NANOS). Declaring TIMESTAMP
        # here makes the scan emit µs-truncated instants directly (UTC
        # session) — same values as session.load_table's batch read. (On
        # Spark 4.1.2 a LongType declaration silently yields MICROS, not
        # nanos, so the old `div 1000` normalization corrupted event time.)
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, glob: str = "documents.parquet"
) -> DataFrame:
    """File-source stream over the documents table — the arrival shape of
    a crawl ingest: new document files land, the checkpoint tracks which
    were processed (the same skip-existing contract as events)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )


def read_event_stream(
    spark: SparkSession, path: str, glob: str = "*.parquet"
) -> DataFrame:
    """File-source stream over the events directory (nanos ts read as µs
    instants, same values as the batch reader). ``path`` must be a
    directory; ``glob`` narrows it (e.g. 'events.parquet' inside a
    multi-table dir)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data watermark.
    Works on both a stream (readStream) and a batch frame (window() is the
    same expression; watermark is a no-op in batch)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact decimal accumulation → order/partitioning-independent
            # cent rounding (see plans/queries.py money-arithmetic note)
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_dedup(
    events: DataFrame, keys: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Exact dedup INSIDE the stream: `dropDuplicatesWithinWatermark` keeps
    key state only for the watermark horizon, so state size is bounded by
    the duplicate-arrival window — not the full stream history. That bound
    is what makes exact streaming dedup viable at 100 TB/day (the batch
    form, dedup.exact_dedup, holds every key ever seen). On a batch frame
    the same call degrades to plain dropDuplicates for plan parity."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def incremental_ingest(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    checkpoint: str,
    transform=None,
) -> int:
    """F8 replacement: ingest only files not seen by previous runs.
    Returns rows ingested this run. ``Trigger.AvailableNow`` drains all
    currently-available input then stops — batch-style semantics with
    streaming bookkeeping."""
    stream = read_event_stream(spark, src_path)
    if transform is not None:
        stream = transform(stream)
    query = (
        stream.writeStream.format("parquet")
        .option("path", dest_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return _rows_from_progress(query)


def _rows_from_progress(query) -> int:
    import json

    total = 0
    for p in query.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        total += int(p["numInputRows"])
    return total


def streaming_upsert(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    checkpoint: str,
    keys: list[str],
    order_col: str = "ts",
    glob: str = "*.parquet",
) -> "DataFrame":
    """CDC upsert sink: drain the stream with AvailableNow and MERGE each
    micro-batch into a keyed parquet snapshot — latest row per key wins
    (ordered by ``order_col``, then the keys for a total order). The
    streaming side of ``operators/joins.merge_into``: F8 incrementality
    (checkpoint skips already-seen files) + upsert semantics instead of
    blind append.

    Each batch first collapses to one row per key KERNEL-FREE (max_by over
    a (order_col, keys) struct — one hash agg), then functional-MERGEs
    into the current snapshot and atomically swaps directories. Local-FS
    snapshot swap here; at cluster scale the snapshot is a partitioned
    table and the merge rewrites only affected partitions (same
    merge_into plan, partition-pruned on the join key range) or targets a
    table format with native MERGE. Returns the final snapshot frame."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from jigsaw_spark.operators.joins import merge_into

    stream = read_event_stream(spark, src_path, glob=glob)

    def sink(batch_df, _batch_id):
        if not batch_df.columns:
            return
        cols = [c for c in batch_df.columns if c not in keys]
        # latest row per key within the batch: deterministic max_by struct
        latest = batch_df.groupBy(*keys).agg(
            F.max_by(
                F.struct(*cols), F.struct(F.col(order_col), *[F.col(k) for k in keys])
            ).alias("_r")
        ).select(*keys, "_r.*")
        if os.path.exists(dest_path):
            current = spark.read.parquet(dest_path)
            merged = merge_into(current, latest, keys)
        else:
            merged = latest
        nxt = dest_path + ".next"
        merged.write.mode("overwrite").parquet(nxt)
        if os.path.exists(dest_path):
            shutil.rmtree(dest_path)
        os.rename(nxt, dest_path)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(dest_path)


def rocksdb_state_conf() -> dict[str, str]:
    """Streaming-state-at-scale recipe: the default HDFS-backed state store
    keeps every key in executor HEAP — a watermark's worth of sessions /
    join state at 100 TB/day OOMs it. RocksDB (bundled with Spark 4) spills
    state to local disk with incremental checkpointing; same results,
    bounded memory. Apply before starting the query (runtime-settable);
    verified identical output vs the default provider in
    tests/test_stateful_skew.py::test_rocksdb_state_store_same_results."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        # bound RocksDB native memory per executor; changelog checkpointing
        # uploads deltas, not full snapshots
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
            "true"
        ),
    }


def enriched_event_counts(
    events: DataFrame,
    dim: DataFrame,
    on: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment join → windowed rollup. The static side is
    broadcast (stream-static equi-joins keep NO join state — each
    micro-batch joins against the current static snapshot, so this is the
    zero-state enrichment pattern, unlike stream-stream joins whose state
    is watermark-bounded). Dimension tables at 100 TB stream volume stay
    KB-MB — exactly the broadcast regime. Works identically on a batch
    frame for plan parity / the oracle."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    joined = src.join(F.broadcast(dim), on)
    return (
        joined.groupBy(F.window("ts", window).alias("w"), "category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "category",
            "n",
            "total_value",
        )
    )


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, glob: str = "documents.parquet"
) -> DataFrame:
    """File-source stream over the documents table — the ingest shape of a
    continuously-arriving crawl: each new parquet drop becomes a
    micro-batch. Map-only text kernels (minhash_band_sigs, tokens_expr)
    run on this stream unchanged."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )
