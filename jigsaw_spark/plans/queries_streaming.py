"""Streaming query exposed through the driver contract.

The streaming plan (file-source → watermark → tumbling window agg) drained
with Trigger.AvailableNow over a static directory produces exactly the
batch answer, so it gets a full DuckDB oracle: 1-hour tumbling windows are
epoch-aligned, i.e. window_start == date_trunc('hour', ts).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from jigsaw_spark.plans.queries import register
from jigsaw_spark.streaming.ingest import read_event_stream, windowed_event_counts


@register(
    "stream_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "Structured Streaming tumbling-window agg (AvailableNow drain == batch)",
)
def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    agg = windowed_event_counts(stream, "1 hour")
    name = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
