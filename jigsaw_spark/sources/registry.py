"""Readers for jigsaw-style dataset trees and the relational catalog.

The reference ingests a directory (or S3 prefix) of per-example sidecar
files named by convention (SURVEY §1.3, §2.1):

    meta_<image_id>.json      {dataset, tags, ...}         (S8/S9)
    labels_<image_id>.csv     label,R,G,B palette          (S10)
    mask_<image_id>.png       semantic mask pixels         (S4)
    <image_id>.jpg/.png       the image                    (S4)
    <image_id>_labels.xml     PASCAL-VOC bboxes            (S12)

Spark mapping: one scan per file class with a `pathGlobFilter` (late
materialization: metadata first — the reference's two-phase pattern, SURVEY
§4), `image_id` recovered from the filename with an anchored regex
(fixing reference quirk #7: first-'_'/first-'.' extraction breaks on ids
containing either; jigsaw/model_utils/filters.py:258-262).

Scale: at 100 TB the 4-small-files-per-example layout is the enemy
(SURVEY §7.3.4) — ingest once into parquet/binary-packed tables with these
readers, then run everything downstream off the packed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jigsaw_spark.operators.filters import with_default_tag

# anchored id extraction per file class (quirk-7 fix)
_ID_FROM_META = r"meta_(.+)\.json$"
_ID_FROM_LABELS = r"labels_(.+)\.csv$"
_ID_FROM_MASK = r"mask_(.+)\.png$"
_ID_FROM_IMAGE = r"([^/]+?)\.(?:png|jpg|jpeg)$"

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)

LABEL_COLORS_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField("R", T.IntegerType()),
        T.StructField("G", T.IntegerType()),
        T.StructField("B", T.IntegerType()),
    ]
)


def _with_image_id(df: DataFrame, pattern: str) -> DataFrame:
    return df.withColumn(
        "image_id", F.regexp_extract(F.input_file_name(), pattern, 1)
    )


def read_metadata_tree(spark: SparkSession, path: str) -> DataFrame:
    """S8/S9: the tag table — one row per example, `tags` defaulted to
    ['untagged'] when empty/missing (filters.py:50-52). Metadata-only scan:
    this is the cheap side of the late-materialization split."""
    df = (
        spark.read.schema(METADATA_SCHEMA)
        .option("pathGlobFilter", "meta_*.json")
        .json(path)
    )
    return with_default_tag(_with_image_id(df, _ID_FROM_META)).select(
        "image_id", "dataset", "tags"
    )


def read_label_colors(spark: SparkSession, path: str) -> DataFrame:
    """S10: label palette child table (labels_<id>.csv, header label,R,G,B;
    reader base/mask.py:101-110)."""
    df = (
        spark.read.schema(LABEL_COLORS_SCHEMA)
        .option("header", "true")
        .option("pathGlobFilter", "labels_*.csv")
        .csv(path)
    )
    return _with_image_id(df, _ID_FROM_LABELS).select(
        "image_id",
        "label",
        F.col("R").alias("r"),
        F.col("G").alias("g"),
        F.col("B").alias("b"),
    )


def read_binaries(
    spark: SparkSession, path: str, kind: str = "image", glob: str | None = None
) -> DataFrame:
    """S1-S4: binary payloads as opaque columns (FIXTURES.md §4). `kind`
    selects the filename convention; Spark's binaryFile source gives
    (path, modificationTime, length, content)."""
    if kind == "mask":
        glob = glob or "mask_*.png"
        pattern = _ID_FROM_MASK
    elif kind == "image":
        glob = glob or "*.{png,jpg,jpeg}"
        pattern = _ID_FROM_IMAGE
    else:
        raise ValueError(f"unknown binary kind {kind!r}")
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    out = _with_image_id(df, pattern)
    if kind == "image":
        # images don't carry a prefix; exclude the other sidecar classes
        out = out.filter(
            ~F.col("image_id").rlike(r"^(meta_|labels_|mask_)")
        )
    return out.select(
        "image_id",
        F.lit(kind).alias("kind"),
        "path",
        "length",
        "content",
    )


def read_voc_bboxes(spark: SparkSession, path: str) -> DataFrame:
    """S12: PASCAL-VOC XML sidecars (<image_id>_labels.xml) → bbox child
    table (FIXTURES.md §3). Parsed with Python's stdlib ElementTree inside
    a mapInPandas batch (no JVM XML package dependency); the XML files are
    tiny sidecars so this is not a hot path. Parser semantics follow
    jigsaw/models/bbox/model.py:174-191 (size/width,height + repeated
    object/name,bndbox)."""
    import pandas as pd

    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*_labels.xml")
        .load(path)
        .select("path", "content")
    )

    schema = (
        "image_id string, label string, xmin int, xmax int, "
        "ymin int, ymax int, width int, height int"
    )

    def parse(batches):
        import re
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                m = re.search(r"([^/]+)_labels\.xml$", path_)
                image_id = m.group(1) if m else None
                root = ET.fromstring(bytes(content))
                size = root.find("size")
                w = int(size.findtext("width")) if size is not None else None
                h = int(size.findtext("height")) if size is not None else None
                for obj in root.findall("object"):
                    bb = obj.find("bndbox")
                    rows.append(
                        {
                            "image_id": image_id,
                            "label": obj.findtext("name"),
                            "xmin": int(float(bb.findtext("xmin"))),
                            "xmax": int(float(bb.findtext("xmax"))),
                            "ymin": int(float(bb.findtext("ymin"))),
                            "ymax": int(float(bb.findtext("ymax"))),
                            "width": w,
                            "height": h,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id",
                    "label",
                    "xmin",
                    "xmax",
                    "ymin",
                    "ymax",
                    "width",
                    "height",
                ],
            )

    return bin_df.mapInPandas(parse, schema)


def read_voc_bboxes_xml(spark: SparkSession, path: str) -> DataFrame:
    """S12 via Spark 4's NATIVE XML datasource (`format("xml")`, the
    spark-xml lineage merged into core) — the JVM-side alternative to
    :func:`read_voc_bboxes`'s ElementTree kernel, same output schema.
    Parity between the two is pinned in
    tests/test_sources_sinks.py::test_read_voc_bboxes_xml_parity.

    At scale the native reader wins: parsing stays in the JVM (no Python
    boundary), the explicit schema prevents the double scan schema
    inference costs, and `object` declared as array<struct> makes the
    single-object-vs-repeated-element XML ambiguity explicit."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    bnd = StructType(
        [
            StructField("xmin", IntegerType()),
            StructField("xmax", IntegerType()),
            StructField("ymin", IntegerType()),
            StructField("ymax", IntegerType()),
        ]
    )
    schema = StructType(
        [
            StructField(
                "size",
                StructType(
                    [
                        StructField("width", IntegerType()),
                        StructField("height", IntegerType()),
                    ]
                ),
            ),
            StructField(
                "object",
                ArrayType(
                    StructType(
                        [
                            StructField("name", StringType()),
                            StructField("bndbox", bnd),
                        ]
                    )
                ),
            ),
        ]
    )
    df = (
        spark.read.format("xml")
        .option("rowTag", "annotation")
        .schema(schema)
        .load(f"{path}/*_labels.xml")
        .withColumn(
            "image_id",
            F.regexp_extract(
                F.col("_metadata.file_path"), r"([^/]+)_labels\.xml$", 1
            ),
        )
    )
    obj = F.explode("object").alias("o")
    return df.select("image_id", "size", obj).select(
        "image_id",
        F.col("o.name").alias("label"),
        F.col("o.bndbox.xmin").alias("xmin"),
        F.col("o.bndbox.xmax").alias("xmax"),
        F.col("o.bndbox.ymin").alias("ymin"),
        F.col("o.bndbox.ymax").alias("ymax"),
        F.col("size.width").alias("width"),
        F.col("size.height").alias("height"),
    )
