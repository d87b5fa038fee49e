"""Multimodal (binary-column) queries exposed through the driver contract.

There is no binary table in the driver's testdata, so these synthesize an
opaque `content BINARY` column from `documents.text` — the point is to
exercise the REAL Spark-side plumbing (binary schema, Arrow batch shape,
mapInPandas partitioning) of the multimodal operators end-to-end. Pixel
decode itself is stubbed per the container contract (no image codecs
installed; jigsaw_spark/multimodal/binary_ops.py STUB CONTRACT), so these
register with oracle=None → the driver records the weaker rows-only check.

Reference parity targets: dimension inference (base/mask.py:103), A6/A7
mask→bbox extraction (instance_mask/model.py:104-107, bbox/model.py:381-390),
feature extraction feeding the similarity operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.multimodal.binary_ops import (
    decode_image_meta,
    extract_features,
    mask_to_bboxes,
)
from jigsaw_spark.operators.similarity import srp_buckets
from jigsaw_spark.plans.queries import register, _t


def _as_binary_table(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("image_id"),
        F.lit(kind).alias("kind"),
        F.concat(F.lit("mem://documents/"), F.col("doc_id")).alias("path"),
        F.length("text").cast("long").alias("length"),
        F.encode("text", "utf-8").alias("content"),
    )


@register(
    "mm_decode_meta",
    None,
    "multimodal: binary-column metadata decode (PNG header parse + format "
    "sniffing) over mapInPandas — rows-only check (codec-free path)",
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_image_meta(_as_binary_table(spark, sf_dir, "image"))


@register(
    "mm_mask_bboxes",
    None,
    "multimodal A6/A7: mask → per-label tight bboxes child table "
    "(deterministic-fake decode) — rows-only check",
)
def mm_mask_bboxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mask_to_bboxes(_as_binary_table(spark, sf_dir, "mask"), fake=True)


@register(
    "mm_extract_features",
    None,
    "multimodal: binary → embedding (deterministic-fake extractor) "
    "composed into SRP-LSH bucketing — rows-only check",
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(
        _as_binary_table(spark, sf_dir, "image"), dim=64, fake=True
    )
    ids = feats.select(
        F.col("image_id").cast("bigint").alias("vec_id"), "embedding"
    )
    return srp_buckets(ids, num_planes=16)
