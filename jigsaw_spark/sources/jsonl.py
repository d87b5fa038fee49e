"""JSONL corpus source/sink — the de-facto LLM-training-data interchange
format (one JSON document per line: The Pile, RedPajama, Dolma all ship
this way).

Thin, deliberately: Spark's native JSON reader/writer IS the right
engine for JSONL at scale (distributed line-split reads, per-task
writes). What this module adds is the corpus contract around it:

- **Schema is mandatory on read.** Schema inference scans the whole
  input once before the real job — at 100 TB that is a full extra pass.
  Callers pass the DDL; inference is opt-in for exploration only.
- **Corrupt-record policy**: PERMISSIVE with a `_corrupt` capture column
  (web-scale dumps always contain broken lines; dropping them silently
  (DROPMALFORMED) or failing the job (FAILFAST) are both wrong defaults
  for curation — you want to count and inspect them).
- **Shard-size control on write** via repartition — one file per task;
  the 100 TB guidance is ~128-512 MB shards, uncompressed or zstd-via-
  parquet for the hot path (gzip JSONL is unsplittable: one task per
  file on re-read, however large).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    keep_corrupt: bool = True,
):
    """Schema-enforced JSONL read. Returns ``(good, corrupt)``: rows that
    parsed, and the raw text of lines that did not (empty if none).

    Implementation note: Spark disallows querying only the corrupt column
    of a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN — it would otherwise have to re-parse per query). So the read
    is a *text* scan + ``from_json`` with the capture column inside the
    parse schema: one line-split distributed parse, both branches legal,
    no caching required (each branch re-scans — the 100 TB-safe choice)."""
    if not keep_corrupt:
        return spark.read.schema(schema).json(path), None
    full_schema = f"{schema}, {CORRUPT_COL} string"
    parsed = spark.read.text(path).select(
        F.from_json(
            "value", full_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ).alias("_j"),
        "value",
    )
    good = parsed.filter(F.col(f"_j.{CORRUPT_COL}").isNull()).select("_j.*").drop(
        CORRUPT_COL
    )
    corrupt = parsed.filter(F.col(f"_j.{CORRUPT_COL}").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return good, corrupt


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = None,
    overwrite: bool = False,
) -> None:
    """One JSON object per line, ``n_shards`` output files (round-robin
    repartition — even shard sizes without a sort barrier)."""
    out = df.repartition(n_shards) if n_shards else df
    writer = out.write.mode("overwrite" if overwrite else "error")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
