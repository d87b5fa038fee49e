from jigsaw_spark.streaming.ingest import incremental_ingest, windowed_event_counts

__all__ = ["incremental_ingest", "windowed_event_counts"]
