"""Deterministic synthetic event stream — a Spark 4 Python *streaming*
DataSource (`spark.readStream.format("synthetic_events")`).

Complements the batch TFRecord Python DataSource (tfrecord_source.py) on
the other half of the Spark 4 pluggable-source API: a rate-style source
whose rows are a pure function of their offset, so every streaming
operator in this repo can be integration-tested (and demoed) without
file fixtures, and a restarted query regenerates byte-identical batches
from the checkpointed offset — exactly the replayability contract a
production source (Kafka) provides.

Rows mirror the driver's `events` schema: (event_id, ts, user_id,
event_type, value). Determinism comes from the md5 stream on event_id
(functions/hashing.py rationale), NOT Python's `random` — partition- and
restart-independent.

Options:
  rows_per_batch (default 100) — rows emitted per microbatch.
  start_id (default 0) — first event_id.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

EVENT_TYPES = ("click", "view", "purchase", "error")
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)
_EPOCH_US = 1704067200_000_000  # 2024-01-01T00:00:00Z


def _row(eid: int):
    import datetime

    h = hashlib.md5(f"synth|{eid}".encode()).hexdigest()
    user = int(h[:6], 16) % 50
    etype = EVENT_TYPES[int(h[6], 16) % len(EVENT_TYPES)]
    value = round(int(h[7:11], 16) % 10000 / 100, 2)
    ts = datetime.datetime.fromtimestamp(
        (_EPOCH_US + eid * 1_000_000) / 1e6, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    return (eid, ts, user, etype, value)


class _SyntheticEventsReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.start_id = int(options.get("start_id", 0))

    def initialOffset(self) -> dict:
        return {"next_id": self.start_id}

    def read(self, start: dict):
        begin = int(start["next_id"])
        end = begin + self.rows_per_batch
        return iter([_row(i) for i in range(begin, end)]), {"next_id": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: same pure function of the offset range
        return iter([_row(i) for i in range(int(start["next_id"]), int(end["next_id"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — rows are derived, not buffered


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema):
        return _SyntheticEventsReader(self.options)


def register_synthetic_stream(spark) -> None:
    spark.dataSource.register(SyntheticEventsSource)
