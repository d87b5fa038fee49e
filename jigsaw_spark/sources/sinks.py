"""Dataset export: directory layout, lineage manifest, label map.

Reference semantics:
  - K1 write_dataset driver: overwrite old output, 80/20 test/dev split,
    write test payloads + "complete" split (jigsaw/write_dataset.py:208-237)
  - documented full layout test/ + splits/{complete,standard,fold_k}
    (docs/Output_Dataset_File_Structure.md:8-24; the fold loop is coded but
    commented out in the reference — we implement the documented layout,
    SURVEY §3.3)
  - K4 lineage metadata.json (write_dataset.py:241-277) — schema kept
    verbatim (FIXTURES.md §7)
  - K5 label_map.pbtxt from the dense label dimension
    (base/mask.py:130-146), with a configurable skip set generalizing the
    hard-coded panel_left/panel_right exclusion (instance_mask/model.py:194-195,
    quirk #9)
  - K9 delete_dir → functional overwrite (no 5s grace period; mode
    semantics belong to the engine, not sleep())
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import DataFrame

from jigsaw_spark.operators.samples import kfold_assign, split_data
from jigsaw_spark.sources.tfrecord import write_tfrecords


def write_manifest(
    out_dir: str,
    name: str,
    image_ids: list[str],
    filters: dict,
    transforms: list[dict],
    created_by: str = "jigsaw_spark",
    comments: str = "",
    training_type: str = "",
) -> str:
    """K4: metadata.json with the reference's exact key set
    (write_dataset.py:267-277)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "metadata.json")
    payload = {
        "name": name,
        "date_created": datetime.now(timezone.utc)
        .isoformat()
        .replace("+00:00", "Z"),
        "created_by": created_by,
        "comments": comments,
        "training_type": training_type,
        "image_ids": image_ids,
        "filters": filters,
        "transforms": transforms,
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    return path


def write_label_map(
    out_dir: str, label_map: DataFrame, skip: tuple[str, ...] = ()
) -> str:
    """K5: TF-object-detection label_map.pbtxt. ``label_map`` is the dense
    dimension (label, label_int) from aggregates.dense_label_map — tiny, so
    collecting to the driver is correct at any scale."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "label_map.pbtxt")
    rows = sorted(
        (r["label_int"], r["label"]) for r in label_map.collect()
    )
    with open(path, "w") as f:
        for label_int, label in rows:
            if label in skip:
                continue
            f.write(
                "item {\n"
                f"  id: {label_int}\n"
                f"  name: '{label}'\n"
                "}\n\n"
            )
    return path


def write_voc_xml(bboxes: DataFrame, out_dir: str) -> int:
    """K10: re-serialize bbox tables to PASCAL-VOC XML sidecars
    (`<image_id>_labels.xml`), the functional replacement for the
    reference's in-place save_changes (jigsaw/models/bbox/model.py:256-306).
    Expects the read_voc_bboxes child-table schema (image_id, label, xmin,
    xmax, ymin, ymax, width, height). One file per image, written
    partition-locally (no driver collect); returns files written.
    Round-trips through sources.registry.read_voc_bboxes."""
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    grouped = bboxes.groupBy("image_id", "width", "height").agg(
        F.collect_list(
            F.struct("label", "xmin", "xmax", "ymin", "ymax")
        ).alias("objs")
    )

    def write_partition(rows) -> "list[int]":
        import xml.etree.ElementTree as ET

        n = 0
        for row in rows:
            root = ET.Element("annotation")
            ET.SubElement(root, "filename").text = f"{row['image_id']}.jpg"
            size = ET.SubElement(root, "size")
            ET.SubElement(size, "width").text = str(row["width"])
            ET.SubElement(size, "height").text = str(row["height"])
            ET.SubElement(size, "depth").text = "3"
            for o in sorted(row["objs"], key=lambda o: (o["label"], o["xmin"])):
                obj = ET.SubElement(root, "object")
                ET.SubElement(obj, "name").text = o["label"]
                bb = ET.SubElement(obj, "bndbox")
                for tag in ("xmin", "xmax", "ymin", "ymax"):
                    ET.SubElement(bb, tag).text = str(o[tag])
            path = os.path.join(out_dir, f"{row['image_id']}_labels.xml")
            ET.ElementTree(root).write(path)
            n += 1
        return [n]

    return sum(grouped.rdd.mapPartitions(write_partition).collect())


def write_feature_stats(
    df: DataFrame,
    out_dir: str,
    vec_col: str = "embedding",
    feature_names: list[str] | None = None,
) -> dict:
    """K8: per-dimension mean/stdev artifacts (`mean.npy`, `stdev.npy`,
    `feature_points.json`) from the distributed Welford aggregate
    (jigsaw/models/feature_points/model.py:104-113). The aggregation is
    cluster-side (vector_moments); only the |dims|-row result lands on the
    driver for numpy serialization."""
    import json as _json

    import numpy as np

    from jigsaw_spark.operators.aggregates import vector_moments

    os.makedirs(out_dir, exist_ok=True)
    rows = sorted(
        (r["dim"], r["mean"], r["stdev"])
        for r in vector_moments(df, vec_col).collect()
    )
    mean = np.array([m for _, m, _ in rows])
    stdev = np.array([s for _, _, s in rows])
    np.save(os.path.join(out_dir, "mean.npy"), mean)
    np.save(os.path.join(out_dir, "stdev.npy"), stdev)
    names = feature_names or [f"f{i}" for i, _, _ in rows]
    with open(os.path.join(out_dir, "feature_points.json"), "w") as f:
        _json.dump({"feature_points": names}, f, indent=2)
    return {"dims": len(rows), "out_dir": out_dir}


def write_dataset(
    df: DataFrame,
    out_dir: str,
    key_cols: list[str],
    test_fraction: float = 0.2,
    num_folds: int = 5,
    rows_per_shard: int = 1000,
    overwrite: bool = True,
) -> dict:
    """K1 + documented layout: the full split/export pipeline.

    out_dir/
      test/                       the held-out payload split (K3 analog)
      splits/complete/            train+test over everything else
      splits/standard/            a second independent 80/20
      splits/fold_0..k-1/         k-fold train/test records

    Sharding: `repartition(num_shards)` with `n//rows_per_shard + 1` —
    the reference's shard-count formula via Spark's round-robin
    repartition (write_dataset.py:185,194-198).
    """
    if overwrite and os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    counts: dict[str, int] = {}
    test, dev = split_data(df, key_cols, test_fraction, seed="split-42")
    test = test.cache()
    dev = dev.cache()
    _write_split(test, os.path.join(out_dir, "test"), "test", rows_per_shard, counts)

    # complete: train/test over the dev remainder
    tr, te = split_data(dev, key_cols, test_fraction, seed="split-complete")
    _write_split(tr, os.path.join(out_dir, "splits", "complete"), "train", rows_per_shard, counts)
    _write_split(te, os.path.join(out_dir, "splits", "complete"), "test", rows_per_shard, counts)

    # standard: independent re-split (write_out_fold is_standard path)
    tr, te = split_data(dev, key_cols, test_fraction, seed="split-standard")
    _write_split(tr, os.path.join(out_dir, "splits", "standard"), "train", rows_per_shard, counts)
    _write_split(te, os.path.join(out_dir, "splits", "standard"), "test", rows_per_shard, counts)

    if num_folds:
        folded = kfold_assign(dev, num_folds, key_cols).cache()
        for k in range(num_folds):
            fold_dir = os.path.join(out_dir, "splits", f"fold_{k}")
            val = folded.filter(folded.fold == k).drop("fold")
            trn = folded.filter(folded.fold != k).drop("fold")
            _write_split(trn, fold_dir, "train", rows_per_shard, counts)
            _write_split(val, fold_dir, "test", rows_per_shard, counts)
        folded.unpersist()
    test.unpersist()
    dev.unpersist()
    return counts


def _write_split(
    df: DataFrame, out_dir: str, basename: str, rows_per_shard: int, counts: dict
) -> None:
    n = df.count()
    num_shards = n // rows_per_shard + 1
    write_tfrecords(df.repartition(num_shards), out_dir, basename)
    counts[os.path.join(out_dir, basename)] = n


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its join
    key — the co-located-join layout. Two tables bucketed the same way
    join with ZERO shuffle: each bucket pairs off by file, and with sort
    columns the join is a streaming sort-merge over pre-sorted runs.

    This is the 100 TB answer to "every query re-shuffles lineitem on
    orderkey": pay the shuffle once at write time, amortize it over every
    downstream join/aggregation on the bucket key (SURVEY §4 "partitioning
    reuse"). Bucket count is fixed at write time — size it so
    |table| / num_buckets ≈ executor-memory-sized splits at target scale.

    Requires a metastore-backed ``saveAsTable`` (bucketing metadata lives
    in the catalog, not the parquet footer)."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Persist with hive-style directory partitioning (`col=value/` dirs) —
    the lake layout that makes partition PRUNING work: a reader filtering
    on a partition column never lists, opens, or schedules the other
    directories, which is the difference between scanning 100 TB and
    scanning one day of it.

    `sort_cols` sorts within each output task so parquet min/max row-group
    stats become selective (row-group skipping on the sort key — the
    poor-man's z-order for a single key). `maxRecordsPerFile` bounds file
    size without an extra repartition job; pick partition columns with
    bounded cardinality (date, source, language), never high-cardinality
    keys (one dir per value kills the file system at scale)."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12
):
    """Morton (Z-order) interleave key over 2-4 numeric/temporal columns —
    the multi-dimensional clustering layout behind data skipping: sorting
    by a Z-key keeps EVERY participating column's values locally dense, so
    parquet row-group/file min-max stats prune scans for predicates on ANY
    of the dimensions (a lexicographic sort only prunes the leading one).

    Each column is min-max scaled to [0, 2^bits) with a 1-row broadcast of
    the bounds (one extra cheap aggregate pass), then bit i of column j
    lands at interleaved position i·n_cols + j — pure shift/or JVM
    expressions, whole-stage-codegen friendly. Returns (df_with_bounds,
    key_column); compose with ``write_zordered`` or your own sort."""
    from pyspark.sql import functions as F

    n = len(cols)
    if not 2 <= n <= 4:
        raise ValueError("zorder_key wants 2-4 columns")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_zmin_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_zmax_{c}") for c in cols],
    )
    with_bounds = df.join(F.broadcast(bounds))
    maxq = (1 << bits) - 1
    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        span = F.col(f"_zmax_{c}") - F.col(f"_zmin_{c}")
        q = F.when(span <= 0, F.lit(0)).otherwise(
            F.least(
                F.lit(maxq),
                F.floor(
                    (F.col(c).cast("double") - F.col(f"_zmin_{c}"))
                    / span
                    * maxq
                ).cast("bigint"),
            )
        )
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j
            ).cast("bigint")
    return with_bounds, key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Persist Z-order-clustered parquet: repartitionByRange on the Morton
    key (files cover disjoint Z-ranges → disjoint hyper-rectangles), sorted
    within files so row-group stats are tight too. One range shuffle at
    write time buys min-max skipping on every clustered dimension for all
    later scans — the OPTIMIZE ZORDER pattern, expressed with stock Spark
    primitives."""
    from pyspark.sql import functions as F  # noqa: F401  (key exprs)

    with_bounds, key = zorder_key(df, cols, bits)
    keyed = with_bounds.withColumn("_zkey", key)
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_zmin_{c}" for c in cols], *[f"_zmax_{c}" for c in cols])
        .write.mode(mode)
        .parquet(path)
    )
