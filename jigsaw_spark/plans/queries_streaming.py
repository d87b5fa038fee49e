"""Streaming query exposed through the driver contract.

The streaming plan (file-source → watermark → tumbling window agg) drained
with Trigger.AvailableNow over a static directory produces exactly the
batch answer, so it gets a full DuckDB oracle: 1-hour tumbling windows are
epoch-aligned, i.e. window_start == date_trunc('hour', ts).
"""

from __future__ import annotations

import contextlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from jigsaw_spark.plans.queries import register
from jigsaw_spark.streaming.ingest import read_event_stream, windowed_event_counts

# A streaming query's state-store partition count is frozen from
# spark.sql.shuffle.partitions at FIRST start with a fresh checkpoint —
# size it to expected state volume, not to the batch shuffle width. These
# drains hold tiny bounded state (distinct event ids / open sessions over
# testdata), so 8 partitions beats the session default 32: every extra
# state partition is an extra state-store instance per micro-batch. At
# production state volumes, raise it BEFORE the first run; it cannot be
# changed without a new checkpoint.
STREAM_STATE_PARTITIONS = 8


@contextlib.contextmanager
def _state_partitions(spark: SparkSession, n: int = STREAM_STATE_PARTITIONS):
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _detach_and_clean(df: DataFrame, *dirs: str) -> DataFrame:
    """Eagerly materialize a drain's read-back (localCheckpoint detaches
    the lineage from the on-disk files), then delete the run's temp
    output/checkpoint dirs. Without this every bench/gate run leaves
    mkdtemp droppings behind (r6 verdict #6); checkpoints only need to
    outlive their own drain here because each run starts fresh."""
    import shutil

    out = df.localCheckpoint(eager=True)
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)
    return out


@register(
    "stream_stateful_sessions",
    """
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, count(*) AS n_events,
           CAST(sum(new_s) AS BIGINT) AS n_sessions
    FROM o GROUP BY user_id
    """,
    "applyInPandasWithState per-user session state drained with "
    "AvailableNow — full-history drain equals the batch island answer",
)
def stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from jigsaw_spark.streaming.stateful import run_stateful_sessions

    checkpoint = tempfile.mkdtemp(prefix="jigsaw_stateful_ckpt_")
    with _state_partitions(spark):
        _name, updates = run_stateful_sessions(
            spark, sf_dir, checkpoint, glob="events.parquet"
        )
    updates = _detach_and_clean(updates, checkpoint)
    # update-mode sink may hold one row per user per micro-batch; totals are
    # cumulative, so the latest = max
    return updates.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("n_sessions").alias("n_sessions"),
    )


@register(
    "stream_dedup_counts",
    """
    SELECT event_type, count(*) AS n
    FROM (SELECT DISTINCT ON (event_id) event_id, event_type
          FROM events ORDER BY event_id, ts)
    GROUP BY event_type
    """,
    "streaming exact dedup: dropDuplicatesWithinWatermark on event_id "
    "(state bounded by the watermark horizon) drained with AvailableNow, "
    "then counted per type — equals the batch distinct-key answer",
)
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from jigsaw_spark.streaming.ingest import stream_dedup

    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    deduped = stream_dedup(stream, ["event_id"], watermark="2 hours")
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "stream_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "Structured Streaming tumbling-window agg (AvailableNow drain == batch)",
)
def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    agg = windowed_event_counts(stream, "1 hour")
    name = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "stream_stream_join",
    """
    SELECT v.user_id, count(*) AS n_pairs
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    GROUP BY v.user_id
    """,
    "stream-stream interval join: view-stream ⋈ click-stream on user_id "
    "within a 10-minute event-time band, both sides watermarked so join "
    "state is evicted once the watermark passes the band (the 100 TB/day "
    "requirement: state is bounded by watermark × arrival rate, not by "
    "stream history). AvailableNow drain over a static dir == batch "
    "interval join, which is the oracle.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    views = (
        read_event_stream(spark, sf_dir, glob="events.parquet")
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    )
    clicks = (
        read_event_stream(spark, sf_dir, glob="events.parquet")
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user = c_user AND c_ts >= v_ts"
            " AND c_ts <= v_ts + interval 10 minutes"
        ),
    )
    name = f"stream_join_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from pyspark.sql import functions as F2

    return (
        spark.table(name)
        .groupBy(F2.col("v_user").alias("user_id"))
        .agg(F2.count(F2.lit(1)).alias("n_pairs"))
    )


@register(
    "stream_synth_rollup",
    None,  # rows are generated by the Python streaming DataSource, not a
    # driver table — determinism is pinned by
    # tests/test_r4_ops.py::test_synthetic_stream_datasource_deterministic
    "Spark 4 Python streaming DataSource drain: 200 offset-derived "
    "deterministic events -> AvailableNow -> per-type rollup (counts + "
    "integer-cent sums); replays identically from any checkpoint",
)
def stream_synth_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from jigsaw_spark.sources.synthetic_stream import register_synthetic_stream

    register_synthetic_stream(spark)
    out = tempfile.mkdtemp(prefix="jigsaw_synth_out_")
    ckpt = tempfile.mkdtemp(prefix="jigsaw_synth_ckpt_")
    with _state_partitions(spark):
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 200)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    synth = _detach_and_clean(spark.read.parquet(out), out, ckpt)
    return synth.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.round(F.col("value") * 100, 0).cast("bigint")
        ).alias("total_cents"),
    )


_CK_MOD_STREAM = 2_305_843_009_213_693_952  # 2^61, matches dq_table_checksum


@register(
    "stream_table_checksum",
    f"""
    SELECT 'events' AS tbl,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(('0x' || substr(md5('e|' || CAST(event_id AS VARCHAR)),
                                    1, 12))::UBIGINT)
                % {_CK_MOD_STREAM} AS BIGINT) AS key_checksum
    FROM events
    """,
    "INCREMENTAL table fingerprint maintenance — the streaming twin of "
    "dq_table_checksum, possible only because the checksum is an "
    "ALGEBRAIC aggregate (count + decimal sum of md5-int48 key hashes: "
    "commutative, mergeable): each arriving file contributes partial "
    "sums into the running complete-mode state, so the fingerprint of "
    "an ever-growing table stays current without ever rescanning it — "
    "the CDC-era answer to 'is the replica still identical?'. The mod "
    "reduction applies once at read-out (mod of a sum == mod of the "
    "running decimal state). Drained with AvailableNow, equals the "
    "batch checksum exactly",
)
def stream_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    partial = stream.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.expr(
                "CAST(conv(substring(md5('e|' || CAST(event_id AS STRING)),"
                " 1, 12), 16, 10) AS DECIMAL(38,0))"
            )
        ).alias("running_sum"),
    )
    name = f"stream_ck_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            partial.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        F.lit("events").alias("tbl"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.expr(f"CAST(running_sum % {_CK_MOD_STREAM} AS BIGINT)").alias(
            "key_checksum"
        ),
    )
