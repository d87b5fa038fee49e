"""K6 model-export projections: byte-level TFExample parity per model
against hand-computed encode_example() dicts, plus the feature-points
consistency check and real instance/deeplab mask pixels."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jigsaw_spark.multimodal.png_codec import decode_png, encode_png
from jigsaw_spark.sources.model_exports import (
    bbox_tfexample_projection,
    deeplab_projection,
    feature_points_projection,
    instance_mask_projection,
    rows_to_tfexamples,
    validate_feature_points,
)
from jigsaw_spark.sources.tfrecord import encode_example


def _images_df(spark, image_id="img1", w=640, h=480):
    return spark.createDataFrame(
        [(image_id, f"{image_id}.png", "png", w, h, bytearray(b"IMGBYTES"))],
        "image_id string, filename string, format string, width int, "
        "height int, encoded binary",
    )


def test_bbox_projection_bytes(spark):
    images = _images_df(spark)
    boxes = spark.createDataFrame(
        [
            ("img1", "car", 64, 48, 320, 240),
            ("img1", "sky", 0, 0, 640, 96),
        ],
        "image_id string, label string, xmin int, ymin int, xmax int, ymax int",
    )
    label_map = spark.createDataFrame(
        [("car", 1), ("sky", 2)], "label string, label_int int"
    )
    proj = bbox_tfexample_projection(images, boxes, label_map)
    ex = rows_to_tfexamples(proj).collect()[0]
    # sorted-by-(label, corners) order: car first, then sky
    expected = encode_example(
        {
            "image/height": 480,
            "image/width": 640,
            "image/filename": "img1.png",
            "image/source_id": "img1.png",
            "image/encoded": b"IMGBYTES",
            "image/format": "png",
            "image/object/bbox/xmin": [64 / 640, 0 / 640],
            "image/object/bbox/xmax": [320 / 640, 640 / 640],
            "image/object/bbox/ymin": [48 / 480, 0 / 480],
            "image/object/bbox/ymax": [240 / 480, 96 / 480],
            "image/object/class/text": ["car", "sky"],
            "image/object/class/label": [1, 2],
        }
    )
    assert bytes(ex["example"]) == expected


def test_feature_points_projection_bytes_and_check(spark):
    labels = ["nose", "tail"]
    meta = spark.createDataFrame(
        [
            (
                "img1",
                640,
                480,
                bytearray(b"IMGBYTES"),
                "png",
                {"nose": [10, 20], "tail": [30, 40]},
                [0.1, 0.2, 0.3, 0.4],
            )
        ],
        "image_id string, width int, height int, encoded binary, "
        "format string, centroids map<string, array<int>>, pose array<double>",
    )
    proj = feature_points_projection(meta, labels)
    ex = rows_to_tfexamples(proj, include_id=True).collect()[0]
    expected = encode_example(
        {
            "image_id": "img1",
            "height": 480,
            "width": 640,
            "image_data": b"IMGBYTES",
            "image_format": "png",
            # xs for sorted labels (nose, tail), then ys
            "feature_points": [10, 30, 20, 40],
            "pose": [0.1, 0.2, 0.3, 0.4],
        }
    )
    assert bytes(ex["example"]) == expected

    bad = meta.withColumn(
        "centroids",
        F.create_map(F.lit("nose"), F.array(F.lit(1), F.lit(2))),
    )
    assert validate_feature_points(bad, labels).count() == 1
    with pytest.raises(ValueError, match="inconsistent feature points"):
        feature_points_projection(bad, labels)


def _mask_df(spark):
    arr = np.zeros((6, 8, 3), dtype=np.uint8)
    arr[1:3, 2:5] = (64, 0, 128)  # car
    arr[4:6, 6:8] = (0, 64, 64)  # pedestrian
    return (
        spark.createDataFrame(
            [
                (
                    "img1",
                    "img1.png",
                    "png",
                    8,
                    6,
                    bytearray(b"IMGBYTES"),
                    bytearray(encode_png(arr)),
                )
            ],
            "image_id string, filename string, format string, width int, "
            "height int, encoded binary, mask binary",
        ),
        arr,
    )


LABEL_COLORS = [("car", 1, (64, 0, 128)), ("pedestrian", 2, (0, 64, 64))]


def test_instance_mask_projection_real_pixels(spark):
    masks, arr = _mask_df(spark)
    row = instance_mask_projection(masks, LABEL_COLORS).collect()[0]
    assert row["image/object/class/text"] == [bytearray(b"car"), bytearray(b"pedestrian")]
    assert row["image/object/class/label"] == [1, 2]
    car_mask = decode_png(bytes(row["image/object/mask"][0]))
    ped_mask = decode_png(bytes(row["image/object/mask"][1]))
    np.testing.assert_array_equal(
        car_mask, (arr == np.array([64, 0, 128])).all(axis=2).astype(np.uint8)
    )
    np.testing.assert_array_equal(
        ped_mask, (arr == np.array([0, 64, 64])).all(axis=2).astype(np.uint8)
    )
    # byte-level: full example matches a hand-built dict
    ex = rows_to_tfexamples(
        instance_mask_projection(masks, LABEL_COLORS)
    ).collect()[0]
    expected = encode_example(
        {
            "image/height": 6,
            "image/width": 8,
            "image/filename": "img1.png",
            "image/source_id": "img1.png",
            "image/encoded": b"IMGBYTES",
            "image/format": "png",
            "image/object/class/text": [b"car", b"pedestrian"],
            "image/object/class/label": [1, 2],
            "image/object/mask": [
                encode_png((arr == np.array([64, 0, 128])).all(axis=2).astype(np.uint8)),
                encode_png((arr == np.array([0, 64, 64])).all(axis=2).astype(np.uint8)),
            ],
        }
    )
    assert bytes(ex["example"]) == expected


def test_deeplab_projection_grayscale_ids(spark):
    masks, arr = _mask_df(spark)
    row = deeplab_projection(masks, LABEL_COLORS).collect()[0]
    gray = decode_png(bytes(row["image/segmentation/class/encoded"]))
    expected = np.zeros((6, 8), dtype=np.uint8)
    expected[1:3, 2:5] = 1  # car id
    expected[4:6, 6:8] = 2  # pedestrian id
    np.testing.assert_array_equal(gray, expected)
    assert row["image/height"] == 6 and row["image/width"] == 8
    assert row["image/format"] == "png"
    assert bytes(row["image/encoded"]) == b"IMGBYTES"


def test_projections_roundtrip_through_tfrecord_sink(spark, tmp_path):
    from jigsaw_spark.sources.tfrecord import read_tfrecords, write_tfrecords

    masks, _ = _mask_df(spark)
    examples = rows_to_tfexamples(deeplab_projection(masks, LABEL_COLORS))
    write_tfrecords(
        examples.select("example"),
        str(tmp_path / "dl"),
        basename="deeplab",
        raw_col="example",
    )
    recs = []
    for f in sorted((tmp_path / "dl").glob("*.record")):
        recs.extend(read_tfrecords(str(f)))
    assert len(recs) == 1
    assert recs[0] == bytes(examples.collect()[0]["example"])


def test_packed_corpus_to_tfrecord_integration(spark, tmp_path):
    """LLM pretraining-batch layout end to end: tokenize → pack into
    budget bins → one serialized Example per bin (concatenated token
    stream + doc boundaries) → TFRecord shards → byte-identical readback."""
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.text import pack_sequences, tokens_expr
    from jigsaw_spark.sources.model_exports import rows_to_tfexamples
    from jigsaw_spark.sources.tfrecord import read_tfrecords, write_tfrecords

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta"),
            (3, "eta theta iota kappa lambda mu"),
            (4, "nu xi"),
        ],
        "doc_id long, text string",
    )
    toks = docs.select(
        "doc_id",
        tokens_expr("text").alias("t"),
        F.size(tokens_expr("text")).alias("n_tokens"),
    )
    packed = pack_sequences(toks, ["doc_id"], "n_tokens", budget=8)
    bins = (
        packed.groupBy("pack_bin")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pack_offset", "doc_id", "t"))
                    ),
                    lambda s: s["t"],
                )
            ).alias("tokens"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .select(
            F.col("pack_bin").cast("string").alias("image_id"),
            "tokens",
            "doc_ids",
        )
    )
    examples = rows_to_tfexamples(bins)
    out = tmp_path / "packed"
    write_tfrecords(examples.select("example"), str(out), basename="pack", raw_col="example")
    recs = []
    for f in sorted(out.glob("*.record")):
        recs.extend(read_tfrecords(str(f)))
    assert len(recs) == bins.count() >= 2
    assert sorted(recs) == sorted(bytes(r["example"]) for r in examples.collect())


def test_instance_tfexample_combines_boxes_and_masks(spark):
    """instance_mask/model.py:119-181 parity: one example carrying both
    the normalized bbox features and the per-label mask PNGs."""
    from jigsaw_spark.sources.model_exports import instance_tfexample_projection

    masks, arr = _mask_df(spark)
    images = masks.drop("mask")
    boxes = spark.createDataFrame(
        [("img1", "car", 2, 1, 4, 2), ("img1", "pedestrian", 6, 4, 7, 5)],
        "image_id string, label string, xmin int, ymin int, xmax int, ymax int",
    )
    label_map = spark.createDataFrame(
        [("car", 1), ("pedestrian", 2)], "label string, label_int int"
    )
    proj = instance_tfexample_projection(
        images, boxes, masks, label_map, LABEL_COLORS
    )
    ex = rows_to_tfexamples(proj).collect()[0]
    expected = encode_example(
        {
            "image/height": 6,
            "image/width": 8,
            "image/filename": "img1.png",
            "image/source_id": "img1.png",
            "image/encoded": b"IMGBYTES",
            "image/format": "png",
            "image/object/bbox/xmin": [2 / 8, 6 / 8],
            "image/object/bbox/xmax": [4 / 8, 7 / 8],
            "image/object/bbox/ymin": [1 / 6, 4 / 6],
            "image/object/bbox/ymax": [2 / 6, 5 / 6],
            "image/object/class/text": ["car", "pedestrian"],
            "image/object/class/label": [1, 2],
            "image/object/mask": [
                encode_png((arr == np.array([64, 0, 128])).all(axis=2).astype(np.uint8)),
                encode_png((arr == np.array([0, 64, 64])).all(axis=2).astype(np.uint8)),
            ],
        }
    )
    assert bytes(ex["example"]) == expected


def test_label_regions_separates_instances(spark):
    """Run-based CC labeling: disjoint same-color regions get distinct
    instance ids; diagonal touching does NOT connect (4-connectivity);
    L-shapes stay one instance."""
    import numpy as np

    from jigsaw_spark.multimodal.binary_ops import mask_to_instance_bboxes
    from jigsaw_spark.multimodal.png_codec import encode_png

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    c = (64, 0, 128)
    # L-shape (one instance)
    arr[1:4, 1] = c
    arr[3, 1:4] = c
    # diagonal-touching pixel at (4,4) vs L corner (3,3): separate
    arr[4, 4] = c
    # far square, same color: separate
    arr[6:8, 6:8] = c
    df = spark.createDataFrame(
        [("m", bytearray(encode_png(arr)))], "image_id string, content binary"
    )
    rows = sorted(
        (r.instance_id, r.xmin, r.xmax, r.ymin, r.ymax, r.area)
        for r in mask_to_instance_bboxes(df, fake=False).collect()
    )
    assert len(rows) == 3
    assert rows[0] == (0, 1, 3, 1, 3, 5)  # the L: 3 vertical + 2 more horizontal
    assert rows[1] == (1, 4, 4, 4, 4, 1)  # diagonal singleton
    assert rows[2] == (2, 6, 7, 6, 7, 4)  # far square
