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
    "mm_png_mask_bboxes",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 20 = 0)
    SELECT CAST(doc_id AS VARCHAR) AS image_id,
           0 AS label_r, 0 AS label_g, 0 AS label_b,
           0 AS xmin, 31 AS xmax, 0 AS ymin, 23 AS ymax
    FROM d
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR),
           64, 0, 128,
           CAST(1 + doc_id % 11 AS INT),
           CAST(1 + doc_id % 11 + 2 + doc_id % 3 AS INT),
           CAST(1 + doc_id % 5 AS INT),
           CAST(1 + doc_id % 5 + 2 + doc_id % 3 AS INT)
    FROM d
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR),
           0, 64, 64,
           CAST(17 + doc_id % 9 AS INT),
           CAST(17 + doc_id % 9 + 2 + doc_id % 4 AS INT),
           CAST(12 + doc_id % 7 AS INT),
           CAST(12 + doc_id % 7 + 2 + doc_id % 2 AS INT)
    FROM d
    """,
    "multimodal A6 REAL path: doc_id-derived PNG masks (pure-Python "
    "encode) decoded by the stdlib-zlib PNG codec into per-color tight "
    "bboxes — the oracle recomputes the painted-rectangle geometry in SQL, "
    "so the whole encode→decode→extent kernel is value-checked. Map-only "
    "Arrow kernels, zero shuffle.",
)
def mm_png_mask_bboxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.session import widen

    docs = widen(
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from jigsaw_spark.multimodal.png_codec import encode_png

        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                arr = np.zeros((24, 32, 3), dtype=np.uint8)
                x0, y0 = 1 + i % 11, 1 + i % 5
                arr[y0 : y0 + 3 + i % 3, x0 : x0 + 3 + i % 3] = (64, 0, 128)
                x1, y1 = 17 + i % 9, 12 + i % 7
                arr[y1 : y1 + 3 + i % 2, x1 : x1 + 3 + i % 4] = (0, 64, 64)
                ids.append(str(i))
                blobs.append(encode_png(arr))
            yield pd.DataFrame({"image_id": ids, "content": blobs})

    masks = docs.mapInPandas(synth, "image_id string, content binary")
    return mask_to_bboxes(masks, fake=False)


def _as_audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize deterministic PCM16 WAV clips from documents.text (fixture
    generator — see audio_ops.synthesize_wav); real producers hand the same
    (audio_id, content) shape straight from binaryFile reads."""
    from jigsaw_spark.multimodal.audio_ops import synthesize_wav

    from jigsaw_spark.session import widen

    # widen(): the synth kernel is CPU-bound and would otherwise run
    # single-task on the 1-partition local scan (SCALE.md §9)
    docs = widen(
        _t(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("string").alias("audio_id"), "text"
        )
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "audio_id": pdf["audio_id"],
                    "content": [
                        synthesize_wav(t.encode("utf-8")) for t in pdf["text"]
                    ],
                }
            )

    return docs.mapInPandas(synth, "audio_id string, content binary")


@register(
    "mm_audio_pipeline",
    None,
    "multimodal audio: WAV header decode (real RIFF parse) + PCM windowing "
    "(rms/peak/zero-crossings) joined and aggregated per clip — no codec "
    "deps, fully real path; rows-only check (binary synth not expressible "
    "in the oracle)",
)
def mm_audio_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.multimodal.audio_ops import window_audio

    audio = _as_audio_table(spark, sf_dir)
    # ONE kernel pass: the windower carries clip metadata (already parsed
    # for the PCM decode), so no second decode + join is needed
    win = window_audio(audio, window=512, hop=256, include_clip_meta=True)
    return win.groupBy(
        "audio_id", "sample_rate", "n_samples", "duration_ms"
    ).agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.round(F.avg("rms"), 6).alias("avg_rms"),
        F.round(F.max("peak"), 6).alias("max_peak"),
        F.sum("zero_crossings").alias("total_zc"),
    )


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
