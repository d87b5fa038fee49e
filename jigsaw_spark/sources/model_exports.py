"""K6: the reference's four model-specific TFExample export projections,
re-expressed as declarative DataFrame transforms feeding the generic
TFRecord sink (sources/tfrecord.py).

Reference parity (semantics, not code):
  - bbox detection (reference: jigsaw/models/bbox/model.py:310-356):
    per-image example with bbox corners normalized to [0,1] by image
    width/height, parallel class text/int lists.
  - instance masks (reference: jigsaw/model_utils/base/mask.py:256-316):
    one BINARY mask per label — pixels matching the label's color → 1 —
    each re-encoded as PNG (real here via multimodal/png_codec.py).
  - feature points (reference: jigsaw/models/feature_points/model.py:115-148):
    centroid-key consistency check against the label universe (fail fast,
    like the reference's ValueError), then xs-then-ys int64 list in sorted
    label order + pose floats.
  - deeplab semantic segmentation (reference: jigsaw/models/deeplab/model.py:17-44):
    color mask → single-channel grayscale class-id mask (background 0),
    PNG-encoded.

Scale notes: the projections are pure column expressions + one broadcast
join against the (tiny) label map; only the pixel-level projections
(instance/deeplab) run an Arrow kernel, and that kernel is map-only — one
decode per mask, no shuffle. Serialization to tf.train.Example bytes is
`rows_to_tfexamples`, another map-only kernel over the already-projected
columns.

Deliberate deviation (documented, same policy as A2 dense numbering): the
reference emits boxes/labels in dict-insertion order; distributed
collect_list order is partition-dependent, so every list here is sorted by
(label, corner) — deterministic under any partitioning, AQE, or retry.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(field: str, dim_col: str) -> Column:
    # [0,1] normalization per reference bbox/model.py:334-337 — plain
    # double division; identical operands give identical doubles on any
    # IEEE engine, so no rounding is needed for cross-engine parity.
    return F.transform(
        F.col("bs"), lambda x: x[field].cast("double") / F.col(dim_col)
    )


def bbox_tfexample_projection(
    images: DataFrame, boxes: DataFrame, label_map: DataFrame
) -> DataFrame:
    """Per-image bbox-detection example columns (bbox/model.py:310-356).

    images: (image_id, filename, format, width, height, encoded)
    boxes:  (image_id, label, xmin, ymin, xmax, ymax)  [pixel coords]
    label_map: (label, label_int)  [tiny — broadcast]

    Output columns use the TFExample feature names verbatim; feed to
    `rows_to_tfexamples` + `write_tfrecords`.
    """
    tagged = boxes.join(F.broadcast(label_map), "label")
    per_img = tagged.groupBy("image_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("label", "xmin", "ymin", "xmax", "ymax", "label_int")
            )
        ).alias("bs")
    )
    # images with no boxes keep null lists → their box features are
    # skipped at serialization (encode_example drops None), matching an
    # objectless example
    return (
        images.join(per_img, "image_id", "left")
        .select(
            "image_id",
            F.col("height").alias("image/height"),
            F.col("width").alias("image/width"),
            F.col("filename").alias("image/filename"),
            F.col("filename").alias("image/source_id"),
            F.col("encoded").alias("image/encoded"),
            F.col("format").alias("image/format"),
            _norm("xmin", "width").alias("image/object/bbox/xmin"),
            _norm("xmax", "width").alias("image/object/bbox/xmax"),
            _norm("ymin", "height").alias("image/object/bbox/ymin"),
            _norm("ymax", "height").alias("image/object/bbox/ymax"),
            F.col("bs.label").alias("image/object/class/text"),
            F.col("bs.label_int")
            .cast("array<long>")
            .alias("image/object/class/label"),
        )
    )


def feature_points_projection(
    meta: DataFrame, feature_point_labels: list[str]
) -> DataFrame:
    """Feature-points example columns (feature_points/model.py:115-148).

    meta: (image_id, width, height, encoded, format,
           centroids map<string, array<int>>, pose array<double>)

    The reference raises ValueError when an image's centroid keys differ
    from the dataset's label universe; `validate_feature_points` exposes
    the offending rows, and this projection fails fast the same way if any
    exist. The xs-then-ys packing follows the sorted label order exactly
    (`[x for each label] + [y for each label]`).
    """
    bad = validate_feature_points(meta, feature_point_labels)
    first_bad = bad.select("image_id").limit(1).collect()
    if first_bad:
        raise ValueError(
            f"image {first_bad[0]['image_id']} contains inconsistent feature "
            f"points: expected {sorted(feature_point_labels)}"
        )
    labels = sorted(feature_point_labels)
    xs = [F.col("centroids").getItem(k).getItem(0) for k in labels]
    ys = [F.col("centroids").getItem(k).getItem(1) for k in labels]
    # `image_id` doubles as row id and as the reference's bytes feature —
    # serialize with rows_to_tfexamples(include_id=True)
    return meta.select(
        "image_id",
        F.col("height").alias("height"),
        F.col("width").alias("width"),
        F.col("encoded").alias("image_data"),
        F.col("format").alias("image_format"),
        F.array(*xs, *ys).cast("array<long>").alias("feature_points"),
        F.col("pose").cast("array<double>").alias("pose"),
    )


def validate_feature_points(
    meta: DataFrame, feature_point_labels: list[str]
) -> DataFrame:
    """Rows whose centroid keys ≠ the expected label universe — the
    distributed form of the reference's consistency ValueError
    (feature_points/model.py:123-129). Pure expression, no kernel."""
    expected = F.array(*[F.lit(s) for s in sorted(feature_point_labels)])
    return meta.filter(F.array_sort(F.map_keys(F.col("centroids"))) != expected)


def instance_mask_projection(
    masks: DataFrame, label_colors: list[tuple[str, int, tuple[int, int, int]]]
) -> DataFrame:
    """Per-label binary mask features (base/mask.py:256-316), REAL:
    decode the color mask PNG once, emit one 0/1 grayscale PNG per label
    (pixels matching the label's RGB color), plus parallel class lists.

    masks: (image_id, filename, format, width, height, encoded, mask)
           — `mask` is the color-mask PNG, `encoded` the real image.
    label_colors: [(label, label_int, (r, g, b)), ...] — rides the UDF
    closure (KB-scale broadcast), sorted here for deterministic order.

    Map-only Arrow kernel — one decode + L boolean compares per mask."""
    items = sorted(label_colors)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from jigsaw_spark.multimodal.png_codec import decode_png, encode_png

        for pdf in batches:
            texts, ints, mask_lists = [], [], []
            for blob in pdf["mask"]:
                arr = decode_png(bytes(blob))
                if arr.ndim == 2:
                    arr = np.repeat(arr[:, :, None], 3, axis=2)
                texts.append([lab.encode() for lab, _i, _c in items])
                ints.append([i for _lab, i, _c in items])
                mask_lists.append(
                    [
                        encode_png(
                            (arr[:, :, :3] == np.array(c, dtype=np.uint8))
                            .all(axis=2)
                            .astype(np.uint8)
                        )
                        for _lab, _i, c in items
                    ]
                )
            out = pdf[
                ["image_id", "filename", "format", "width", "height", "encoded"]
            ].copy()
            out["class_text"] = texts
            out["class_label"] = ints
            out["instance_masks"] = mask_lists
            yield out

    projected = masks.mapInPandas(
        op,
        "image_id string, filename string, format string, width int, "
        "height int, encoded binary, class_text array<binary>, "
        "class_label array<long>, instance_masks array<binary>",
    )
    return projected.select(
        "image_id",
        F.col("height").alias("image/height"),
        F.col("width").alias("image/width"),
        F.col("filename").alias("image/filename"),
        F.col("filename").alias("image/source_id"),
        F.col("encoded").alias("image/encoded"),
        F.col("format").alias("image/format"),
        F.col("class_text").alias("image/object/class/text"),
        F.col("class_label").alias("image/object/class/label"),
        F.col("instance_masks").alias("image/object/mask"),
    )


def deeplab_projection(
    masks: DataFrame, label_colors: list[tuple[str, int, tuple[int, int, int]]]
) -> DataFrame:
    """Deeplab grayscale class-id mask (deeplab/model.py:17-44), REAL:
    color mask → uint8 image where each pixel holds its 1-indexed class id
    (0 = background), PNG-encoded. Same input shape as
    `instance_mask_projection`; map-only kernel."""
    items = sorted(label_colors)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from jigsaw_spark.multimodal.png_codec import decode_png, encode_png

        colors = np.array([c for _lab, _i, c in items], dtype=np.uint8)
        ids = np.array([i for _lab, i, _c in items], dtype=np.int64)
        for pdf in batches:
            gray = []
            for blob in pdf["mask"]:
                arr = decode_png(bytes(blob))
                if arr.ndim == 2:
                    arr = np.repeat(arr[:, :, None], 3, axis=2)
                # (h, w, 1, 3) == (L, 3) → (h, w, L); exactly the
                # broadcasting projection of deeplab/model.py:31-32
                binary = (arr[:, :, None, :3] == colors).all(axis=3)
                grayscale = np.where(binary, ids, 0).sum(axis=2)
                gray.append(encode_png(grayscale.astype(np.uint8)))
            out = pdf[["image_id", "filename", "width", "height", "encoded"]].copy()
            out["seg_encoded"] = gray
            yield out

    projected = masks.mapInPandas(
        op,
        "image_id string, filename string, width int, height int, "
        "encoded binary, seg_encoded binary",
    )
    # feature names follow deeplab's build_data.image_seg_to_tfexample
    return projected.select(
        "image_id",
        F.col("encoded").alias("image/encoded"),
        F.col("filename").alias("image/filename"),
        F.col("height").alias("image/height"),
        F.col("width").alias("image/width"),
        F.lit("png").alias("image/format"),
        F.col("seg_encoded").alias("image/segmentation/class/encoded"),
        F.lit("png").alias("image/segmentation/class/format"),
    )


def rows_to_tfexamples(
    df: DataFrame, id_col: str = "image_id", include_id: bool = False
) -> DataFrame:
    """Serialize every non-id column of each row into one tf.train.Example
    (column name == feature name) via the pure-Python protobuf encoder.
    ``include_id`` also emits the id column as a feature (the
    feature-points schema wants `image_id` inside the example). Map-only;
    output (id, example binary) feeds write_tfrecords."""
    from jigsaw_spark.sources.tfrecord import encode_example

    feature_cols = [c for c in df.columns if include_id or c != id_col]

    def _py(v):
        import numpy as np

        if isinstance(v, np.generic):
            return v.item()
        if isinstance(v, np.ndarray):
            return [_py(x) for x in v.tolist()]
        if isinstance(v, (list, tuple)):
            return [_py(x) for x in v]
        if isinstance(v, bytearray):
            return bytes(v)
        return v

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            examples = [
                encode_example(
                    {c: _py(row[c]) for c in feature_cols if row[c] is not None}
                )
                for _, row in pdf.iterrows()
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "example": examples})

    return df.mapInPandas(op, f"{id_col} string, example binary")


def instance_tfexample_projection(
    images: DataFrame,
    boxes: DataFrame,
    masks: DataFrame,
    label_map: DataFrame,
    label_colors: list[tuple[str, int, tuple[int, int, int]]],
) -> DataFrame:
    """The instance-segmentation export (reference:
    jigsaw/models/instance_mask/model.py:119-181): the bbox projection's
    normalized-coordinate features PLUS the per-label binary mask PNGs in
    one example. Composed from the two base projections joined on
    image_id — masks ride a map-only kernel, boxes are pure expressions,
    the join is 1 row per image on both sides."""
    bbox_part = bbox_tfexample_projection(images, boxes, label_map)
    mask_part = instance_mask_projection(masks, label_colors).select(
        "image_id", F.col("`image/object/mask`").alias("image/object/mask")
    )
    return bbox_part.join(mask_part, "image_id")
