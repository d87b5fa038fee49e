"""Multimodal (binary-column) queries exposed through the driver contract.

There is no binary table in the driver's testdata, so these synthesize an
opaque `content BINARY` column from `documents.text` — the point is to
exercise the REAL Spark-side plumbing (binary schema, Arrow batch shape,
mapInPandas partitioning) of the multimodal operators end-to-end. PNG
pixel paths are fully real (multimodal/png_codec.py) and value-checked by
exact oracles (mm_png_mask_bboxes, k6_bbox_norm); non-PNG decode is
stubbed per the container contract (binary_ops.py STUB CONTRACT) and those
queries register with oracle=None → rows-only check.

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
    """
    SELECT CAST(doc_id AS VARCHAR) AS image_id,
           'image' AS kind,
           'mem://documents/' || doc_id AS path,
           CAST(length(text) AS BIGINT) AS length,
           'unknown' AS format,
           CAST(NULL AS INT) AS width,
           CAST(NULL AS INT) AS height
    FROM documents
    """,
    "multimodal: binary-column metadata decode (PNG header parse + format "
    "sniffing) over mapInPandas — text payloads sniff to 'unknown', so the "
    "oracle value-checks the kernel's passthrough + sniff result exactly",
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_image_meta(_as_binary_table(spark, sf_dir, "image"))


@register(
    "mm_mask_bboxes",
    """
    WITH cells AS (
      SELECT doc_id, i % 4 AS x, i // 4 AS y,
             ('0x' || substr(md5(text), 2 * i + 1, 2))::INT AS v
      FROM documents CROSS JOIN (SELECT unnest(range(16)) AS i) g)
    SELECT CAST(doc_id AS VARCHAR) AS image_id,
           v AS label_r, v AS label_g, v AS label_b,
           CAST(min(x) AS INT) AS xmin, CAST(max(x) AS INT) AS xmax,
           CAST(min(y) AS INT) AS ymin, CAST(max(y) AS INT) AS ymax
    FROM cells GROUP BY doc_id, v
    """,
    "multimodal A6/A7: mask → per-label tight bboxes child table. The "
    "deterministic fake grid is md5(content)-derived, so the oracle "
    "replays the digest arithmetic relationally (hex pair i = cell i of "
    "the 4×4 grid) and value-checks the extent kernel exactly",
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


_FAKE_RAW = (
    "list_transform(range(64), i -> "
    "('0x' || substr(md5(text), 2 * (i % 16) + 1, 2))::INT / 255.0 - 0.5)"
)
_FAKE_NORM = f"sqrt(list_sum(list_transform({_FAKE_RAW}, x -> x * x)))"
# the kernel emits float32 (Arrow array<float>); replicate the rounding
_FAKE_EMB = (
    f"list_transform({_FAKE_RAW}, "
    f"x -> CAST(CAST(x / {_FAKE_NORM} AS FLOAT) AS DOUBLE))"
)


def _mm_feat_oracle() -> str:
    from jigsaw_spark.operators.similarity import srp_planes, srp_signature_sql

    # materialize the embedding once per row; inlining it into the
    # signature expression re-evaluates the md5 arithmetic 16× per plane
    return (
        f"WITH emb AS (SELECT CAST(doc_id AS BIGINT) AS vec_id, "
        f"{_FAKE_EMB} AS e FROM documents) "
        f"SELECT vec_id, {srp_signature_sql('e', srp_planes(16, 64))} AS sig "
        f"FROM emb"
    )


@register(
    "mm_extract_features",
    _mm_feat_oracle(),
    "multimodal: binary → embedding (deterministic md5-fake extractor, "
    "unit-norm float32) composed into SRP-LSH bucketing. The oracle "
    "replays the digest arithmetic, the float32 rounding, AND the 16 "
    "inlined-hyperplane signature relationally — full value check of the "
    "extract→bucket pipeline",
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(
        _as_binary_table(spark, sf_dir, "image"), dim=64, fake=True
    )
    ids = feats.select(
        F.col("image_id").cast("bigint").alias("vec_id"), "embedding"
    )
    return srp_buckets(ids, num_planes=16)


@register(
    "k6_bbox_norm",
    """
    WITH d AS (
      SELECT doc_id, 320 + (doc_id % 5) * 64 AS w, 480 AS h
      FROM documents WHERE doc_id % 10 = 0
    ), b AS (
      SELECT doc_id, w, h,
             'lab_' || CAST(doc_id % 3 AS VARCHAR) AS label,
             CAST(1 + doc_id % 3 AS BIGINT) AS label_int,
             doc_id % 100 AS xmin, doc_id % 80 AS ymin,
             doc_id % 100 + 10 + doc_id % 50 AS xmax,
             doc_id % 80 + 5 + doc_id % 40 AS ymax
      FROM d
      UNION ALL
      SELECT doc_id, w, h,
             'lab_' || CAST((doc_id + 1) % 3 AS VARCHAR),
             CAST(1 + (doc_id + 1) % 3 AS BIGINT),
             (doc_id * 7) % 150, (doc_id * 3) % 90,
             (doc_id * 7) % 150 + 20, (doc_id * 3) % 90 + 30
      FROM d)
    SELECT CAST(doc_id AS VARCHAR) AS image_id,
           CAST(xmin AS DOUBLE) / w AS xmin_n,
           CAST(xmax AS DOUBLE) / w AS xmax_n,
           CAST(ymin AS DOUBLE) / h AS ymin_n,
           CAST(ymax AS DOUBLE) / h AS ymax_n,
           label, label_int
    FROM b
    """,
    "K6 bbox export projection (reference bbox/model.py:310-356): pixel "
    "boxes normalized to [0,1] by per-image width/height through "
    "bbox_tfexample_projection, exploded back to rows — the oracle "
    "recomputes the synthesis arithmetic and the normalization division. "
    "Projection is pure column expressions + one broadcast label-map join.",
)
def k6_bbox_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.sources.model_exports import bbox_tfexample_projection

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    sid = F.col("doc_id").cast("string")
    images = docs.select(
        sid.alias("image_id"),
        F.concat(sid, F.lit(".png")).alias("filename"),
        F.lit("png").alias("format"),
        (F.lit(320) + (F.col("doc_id") % 5) * 64).cast("int").alias("width"),
        F.lit(480).alias("height"),
        F.encode(sid, "utf-8").alias("encoded"),
    )
    d = F.col("doc_id")
    b1 = docs.select(
        sid.alias("image_id"),
        F.concat(F.lit("lab_"), (d % 3).cast("string")).alias("label"),
        (d % 100).alias("xmin"),
        (d % 80).alias("ymin"),
        (d % 100 + 10 + d % 50).alias("xmax"),
        (d % 80 + 5 + d % 40).alias("ymax"),
    )
    b2 = docs.select(
        sid.alias("image_id"),
        F.concat(F.lit("lab_"), ((d + 1) % 3).cast("string")).alias("label"),
        ((d * 7) % 150).alias("xmin"),
        ((d * 3) % 90).alias("ymin"),
        ((d * 7) % 150 + 20).alias("xmax"),
        ((d * 3) % 90 + 30).alias("ymax"),
    )
    label_map = spark.createDataFrame(
        [("lab_0", 1), ("lab_1", 2), ("lab_2", 3)], "label string, label_int int"
    )
    proj = bbox_tfexample_projection(images, b1.unionByName(b2), label_map)
    z = F.arrays_zip(
        F.col("`image/object/bbox/xmin`").alias("xmin_n"),
        F.col("`image/object/bbox/xmax`").alias("xmax_n"),
        F.col("`image/object/bbox/ymin`").alias("ymin_n"),
        F.col("`image/object/bbox/ymax`").alias("ymax_n"),
        F.col("`image/object/class/text`").alias("label"),
        F.col("`image/object/class/label`").alias("label_int"),
    )
    return proj.select("image_id", F.explode(z).alias("b")).select(
        "image_id", "b.*"
    )


_DEEPLAB_SQL = """
    SELECT CAST(doc_id AS VARCHAR) AS image_id,
           CAST(24 AS BIGINT) AS height,
           CAST(32 AS BIGINT) AS width,
           CAST((3 + doc_id % 3) * (3 + doc_id % 3) AS BIGINT) AS car_px,
           CAST((3 + doc_id % 2) * (3 + doc_id % 4) AS BIGINT) AS ped_px,
           CAST(768 - (3 + doc_id % 3) * (3 + doc_id % 3)
                    - (3 + doc_id % 2) * (3 + doc_id % 4) AS BIGINT)
             AS bg_px
    FROM documents WHERE doc_id % 20 = 0
"""


@register(
    "k6_deeplab_export",
    _DEEPLAB_SQL,
    "K6 deeplab projection (reference deeplab/model.py:17-44) end-to-end "
    "WITH an exact oracle: synthesized color masks → grayscale class-id "
    "PNG (deeplab_projection) → serialized tf.train.Example (pure-Python "
    "protobuf) → PARSED BACK (decode_example + decode_png) into "
    "height/width and per-class pixel counts. The synthesis rectangles "
    "are closed-form in doc_id (disjoint, never clipped at 24x32), so "
    "the oracle recomputes the expected class histogram in SQL while the "
    "Spark side earns it by round-tripping the full binary pipeline — "
    "encode AND decode must both be right for the hash to match "
    "(formerly rows-only; byte-level parity stays in "
    "tests/test_model_exports.py).",
)
def k6_deeplab_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.session import widen
    from jigsaw_spark.sources.model_exports import (
        deeplab_projection,
        rows_to_tfexamples,
    )

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
            rows = {"image_id": [], "filename": [], "format": [], "width": [],
                    "height": [], "encoded": [], "mask": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                arr = np.zeros((24, 32, 3), dtype=np.uint8)
                x0, y0 = 1 + i % 11, 1 + i % 5
                arr[y0 : y0 + 3 + i % 3, x0 : x0 + 3 + i % 3] = (64, 0, 128)
                x1, y1 = 17 + i % 9, 12 + i % 7
                arr[y1 : y1 + 3 + i % 2, x1 : x1 + 3 + i % 4] = (0, 64, 64)
                rows["image_id"].append(str(i))
                rows["filename"].append(f"{i}.png")
                rows["format"].append("png")
                rows["width"].append(32)
                rows["height"].append(24)
                rows["encoded"].append(b"IMG" + str(i).encode())
                rows["mask"].append(encode_png(arr))
            yield pd.DataFrame(rows)

    import pandas as pd  # noqa: F401  (kernel dep)

    masks = docs.mapInPandas(
        synth,
        "image_id string, filename string, format string, width int, "
        "height int, encoded binary, mask binary",
    )
    label_colors = [("car", 1, (64, 0, 128)), ("pedestrian", 2, (0, 64, 64))]
    proj = deeplab_projection(masks, label_colors)
    ex = rows_to_tfexamples(proj)

    def roundtrip(batches):
        import numpy as np
        import pandas as pd

        from jigsaw_spark.multimodal.png_codec import decode_png
        from jigsaw_spark.sources.tfrecord import decode_example

        for pdf in batches:
            out = {"image_id": [], "height": [], "width": [],
                   "car_px": [], "ped_px": [], "bg_px": []}
            for _, row in pdf.iterrows():
                feats = decode_example(bytes(row["example"]))
                arr = decode_png(
                    bytes(feats["image/segmentation/class/encoded"][1][0])
                )
                out["image_id"].append(str(row["image_id"]))
                out["height"].append(int(feats["image/height"][1][0]))
                out["width"].append(int(feats["image/width"][1][0]))
                out["car_px"].append(int(np.count_nonzero(arr == 1)))
                out["ped_px"].append(int(np.count_nonzero(arr == 2)))
                out["bg_px"].append(int(np.count_nonzero(arr == 0)))
            yield pd.DataFrame(out)

    return ex.mapInPandas(
        roundtrip,
        "image_id string, height bigint, width bigint, "
        "car_px bigint, ped_px bigint, bg_px bigint",
    )


@register(
    "k6_feature_points",
    """
    SELECT CAST(doc_id AS VARCHAR) AS image_id,
           480 AS height, 640 AS width,
           doc_id % 97 AS x_nose,
           (doc_id * 3) % 97 AS x_tail,
           doc_id % 89 AS y_nose,
           (doc_id * 7) % 89 AS y_tail,
           CAST(doc_id % 13 AS DOUBLE) / 13.0 AS pose0,
           CAST(doc_id % 17 AS DOUBLE) / 17.0 AS pose1
    FROM documents WHERE doc_id % 10 = 0
    """,
    "K6 feature-points export projection (reference "
    "feature_points/model.py:115-148): centroid map -> consistency check "
    "against the label universe -> xs-then-ys packing in sorted label "
    "order + pose floats, re-flattened to scalars for the oracle, which "
    "recomputes the synthesis arithmetic. Pure column expressions.",
)
def k6_feature_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.sources.model_exports import feature_points_projection

    d = F.col("doc_id")
    sid = d.cast("string")
    meta = _t(spark, sf_dir, "documents").filter(d % 10 == 0).select(
        sid.alias("image_id"),
        F.lit(640).alias("width"),
        F.lit(480).alias("height"),
        F.encode(sid, "utf-8").alias("encoded"),
        F.lit("png").alias("format"),
        F.create_map(
            F.lit("nose"),
            F.array((d % 97).cast("int"), (d % 89).cast("int")),
            F.lit("tail"),
            F.array(((d * 3) % 97).cast("int"), ((d * 7) % 89).cast("int")),
        ).alias("centroids"),
        F.array(
            (d % 13).cast("double") / 13.0, (d % 17).cast("double") / 17.0
        ).alias("pose"),
    )
    proj = feature_points_projection(meta, ["nose", "tail"])
    fp = F.col("feature_points")
    return proj.select(
        "image_id",
        "height",
        "width",
        fp[0].alias("x_nose"),
        fp[1].alias("x_tail"),
        fp[2].alias("y_nose"),
        fp[3].alias("y_tail"),
        F.col("pose")[0].alias("pose0"),
        F.col("pose")[1].alias("pose1"),
    )


@register(
    "mm_png_instance_bboxes",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 20 = 0),
    inst AS (
      SELECT doc_id, 64 AS r, 0 AS g, 128 AS b,
             1 + doc_id % 6 AS xmin, 1 + doc_id % 6 + 2 AS xmax,
             1 + doc_id % 4 AS ymin, 1 + doc_id % 4 + 2 AS ymax,
             9 AS area
      FROM d
      UNION ALL
      SELECT doc_id, 64, 0, 128,
             20 + doc_id % 5, 20 + doc_id % 5 + 2,
             2 + doc_id % 6, 2 + doc_id % 6 + 2, 9
      FROM d
      UNION ALL
      SELECT doc_id, 0, 64, 64,
             10 + doc_id % 4, 10 + doc_id % 4 + 3,
             15 + doc_id % 5, 15 + doc_id % 5 + 3, 16
      FROM d)
    SELECT CAST(doc_id AS VARCHAR) AS image_id,
           r AS label_r, g AS label_g, b AS label_b,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY ymin, xmin) - 1 AS INT)
             AS instance_id,
           CAST(xmin AS INT) AS xmin, CAST(xmax AS INT) AS xmax,
           CAST(ymin AS INT) AS ymin, CAST(ymax AS INT) AS ymax,
           CAST(area AS BIGINT) AS area
    FROM inst
    """,
    "multimodal A7 REAL path: two disjoint SAME-color rectangles + one "
    "other color per synthesized PNG — per-INSTANCE boxes via run-based "
    "connected-component labeling (the findContours analog), which "
    "mask_to_bboxes's per-color extents cannot separate. Oracle replays "
    "the geometry with raster-order instance ids.",
)
def mm_png_instance_bboxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.multimodal.binary_ops import mask_to_instance_bboxes
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
                x0, y0 = 1 + i % 6, 1 + i % 4
                arr[y0 : y0 + 3, x0 : x0 + 3] = (64, 0, 128)
                x1, y1 = 20 + i % 5, 2 + i % 6
                arr[y1 : y1 + 3, x1 : x1 + 3] = (64, 0, 128)
                x2, y2 = 10 + i % 4, 15 + i % 5
                arr[y2 : y2 + 4, x2 : x2 + 4] = (0, 64, 64)
                ids.append(str(i))
                blobs.append(encode_png(arr))
            yield pd.DataFrame({"image_id": ids, "content": blobs})

    masks = docs.mapInPandas(synth, "image_id string, content binary")
    return mask_to_instance_bboxes(masks, fake=False)
