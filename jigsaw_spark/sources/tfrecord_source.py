"""TFRecord as a first-class Spark source: `spark.read.format("tfrecord")`.

The write path (`tfrecord.write_tfrecords`, K2) made the engine a TFRecord
*producer*; this Python DataSource (Spark 4 `pyspark.sql.datasource` API)
closes the loop so a reference user's existing shards are queryable
DataFrames — no TensorFlow, no JVM package, stdlib-only parsing via
`tfrecord.decode_example`.

Scale shape: one input partition per `.record` shard file (shards are the
reference's ~1000-row unit, so thousands of shards → thousands of tasks);
records stream through the generator, never materializing a shard in
memory. Schema drives projection: only requested fields are converted.

Usage:
    from jigsaw_spark.sources.tfrecord_source import register_tfrecord_source
    register_tfrecord_source(spark)
    df = (spark.read.format("tfrecord")
          .schema("id long, name string, emb array<float>")
          .load("/path/to/shards"))

Schema notes (TFExample is weakly typed — three physical kinds only):
  long/int      ← int64_list[0]      array<long>   ← int64_list
  float/double  ← float_list[0]      array<float>  ← float_list
  string        ← utf-8(bytes[0])    binary        ← bytes[0]
  timestamp     ← epoch-micros int64 date ← epoch-days int64
    (the temporal convention `rows_to_tfexamples` writes)
Omit `.schema(...)` and the source infers one from the first record of the
first shard: int64→long, float→double, bytes→binary, >1 value→array.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from jigsaw_spark.sources.tfrecord import decode_example, read_tfrecords


def _shard_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.record")))
    return sorted(_glob.glob(path))


class TFRecordDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tfrecord"

    def schema(self):
        """Infer from the first record (only called when the user gave no
        schema). Ambiguity is inherent to TFExample: a 1-element list reads
        as a scalar, bytes as binary — pass an explicit schema to override."""
        files = _shard_files(self.options.get("path", ""))
        if not files:
            raise FileNotFoundError(
                f"no .record shards under {self.options.get('path')!r}"
            )
        recs = read_tfrecords(files[0])
        if not recs:
            raise ValueError(f"empty shard {files[0]}")
        fields = []
        for name, (kind, values) in sorted(decode_example(recs[0]).items()):
            base = {"int64": "long", "float": "double", "bytes": "binary"}[kind]
            typ = f"array<{base}>" if len(values) > 1 else base
            fields.append(f"`{name}` {typ}")
        return ", ".join(fields)

    def reader(self, schema):
        return TFRecordReader(self.options, schema)


def _convert(kind: str, values: list, dt):
    """One decoded feature → the python value for Spark type ``dt``."""
    from datetime import date, datetime, timedelta, timezone
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        DateType,
        StringType,
        TimestampType,
    )

    if isinstance(dt, ArrayType):
        return [_convert(kind, [v], dt.elementType) for v in values]
    if not values:
        return None
    v = values[0]
    if isinstance(dt, StringType):
        return v.decode() if isinstance(v, bytes) else str(v)
    if isinstance(dt, BinaryType):
        return bytes(v)
    if isinstance(dt, TimestampType):
        return datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(
            microseconds=int(v)
        )
    if isinstance(dt, DateType):
        return date(1970, 1, 1) + timedelta(days=int(v))
    t = dt.simpleString()
    if t in ("double", "float"):
        return float(v)
    if t in ("bigint", "int", "smallint", "tinyint"):
        return int(v)
    if t == "boolean":
        return bool(v)
    raise TypeError(f"tfrecord source cannot produce {t}")


class TFRecordReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path", "")
        self.schema = schema

    def partitions(self):
        files = _shard_files(self.path)
        if not files:
            raise FileNotFoundError(f"no .record shards under {self.path!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition):
        fields = [(f.name, f.dataType) for f in self.schema.fields]
        for rec in read_tfrecords(partition.value):
            ex = decode_example(rec)
            yield tuple(
                _convert(*ex[name], dt) if name in ex else None
                for name, dt in fields
            )


def register_tfrecord_source(spark) -> None:
    spark.dataSource.register(TFRecordDataSource)
