"""End-to-end replay of the reference CLI pipeline (SURVEY §3.1 steps 1-9)
as ONE test: file-tree ingest → tag filters → exact-N sample →
union-distinct → label transforms → construct join → dense label map →
split/export layout with TFRecord shards + lineage manifest + label map.

This is the "a jigsaw user could switch" proof: every stage the CLI
(jigsaw/cli.py:33-143) walks interactively runs here through the
declarative API, with the documented outputs byte-checked.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from pyspark.sql import functions as F


def _minimal_png(width: int, height: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def test_cli_pipeline_replay(spark, tmp_path):
    from jigsaw_spark.operators.aggregates import dense_label_map, distinct_labels
    from jigsaw_spark.operators.filters import FilterGroup, FilterStep
    from jigsaw_spark.operators.joins import construct, semi_join
    from jigsaw_spark.operators.transforms import Transform, recode_column
    from jigsaw_spark.plans.pipeline import PipelineSpec, run_pipeline
    from jigsaw_spark.sources.registry import (
        read_binaries,
        read_label_colors,
        read_metadata_tree,
    )
    from jigsaw_spark.sources.sinks import (
        write_dataset,
        write_label_map,
        write_manifest,
    )
    from jigsaw_spark.sources.tfrecord import read_tfrecords

    # -- stage 1-3: a reference-convention source tree (12 ids) ------------
    tree = tmp_path / "tree"
    tree.mkdir()
    ids = [f"Seq{i:02d}_f{i:05d}" for i in range(12)]
    tag_sets = [
        ["tag_1", "tag_A"], ["tag_1", "tag_A"], ["tag_1", "tag_A"],
        ["tag_1", "tag_A"], ["tag_1"], ["tag_2"], ["tag_2", "tag_B"],
        ["tag_3"], ["tag_3", "tag_B"], ["tag_2", "tag_3"], [], [],
    ]
    for image_id, tags in zip(ids, tag_sets):
        (tree / f"meta_{image_id}.json").write_text(
            json.dumps({"dataset": "CamVid", "tags": tags})
        )
        (tree / f"labels_{image_id}.csv").write_text(
            "label,R,G,B\nCar,64,0,128\nTree,0,128,0\nBush,0,64,0\n"
            "Background,0,0,0\n"
        )
        (tree / f"mask_{image_id}.png").write_bytes(_minimal_png(4, 2))
        (tree / f"{image_id}.png").write_bytes(_minimal_png(960, 720))

    # -- stage 4: filter & load (metadata-first late materialization) ------
    meta = read_metadata_tree(spark, str(tree))
    assert meta.count() == 12
    spec = PipelineSpec(
        name="replay_ds",
        key_cols=["image_id"],
        groups=[
            FilterGroup(
                name="setA",
                steps=[FilterStep(type="and", tags=["tag_1", "tag_A"])],
                sample_n=3,
            ),
            FilterGroup(
                name="setB",
                steps=[FilterStep(type="or", tags=["tag_2", "tag_3"])],
            ),
        ],
        transforms=[
            Transform(transform_type="rename", original="Car", new="Vehicle"),
            Transform(
                transform_type="merge", original=["Tree", "Bush"], new="Foliage"
            ),
        ],
        test_fraction=0.25,
        num_folds=None,
        training_type="Semantic Segmentation",
    )
    result = run_pipeline(meta, spec, collect_counts=True)
    selected = result.selected.cache()
    sel_ids = sorted(r["image_id"] for r in selected.select("image_id").collect())
    # exact-N from setA (4 candidates → 3) + OR-matches from setB (5), all
    # distinct: union-distinct keeps each id once
    assert len(sel_ids) == len(set(sel_ids))
    assert 5 <= len(sel_ids) <= 8
    groups_meta = result.lineage["filters"]["groups"]
    assert [g["name"] for g in groups_meta] == ["setA", "setB"]
    and_counts = groups_meta[0]["filters"][0]
    assert and_counts["type"] == "and" and and_counts["tags"] == ["tag_1", "tag_A"]

    # -- stage 4b: payload fetch ONLY for selected ids (F4 semi-join) ------
    sel_keys = selected.select("image_id")
    masks = semi_join(read_binaries(spark, str(tree), "mask"), sel_keys, ["image_id"])
    assert masks.count() == len(sel_ids)

    # -- stage 5: label transforms over the label universe -----------------
    colors = semi_join(read_label_colors(spark, str(tree)), sel_keys, ["image_id"])
    recoded = recode_column(colors, "label", spec.transforms)
    labels_after = {
        r["label"]
        for r in distinct_labels(recoded.select("label")).collect()
    }
    assert labels_after == {"Vehicle", "Foliage"}  # Background excluded, merge fused

    # -- stage 6: construct (J1 multi-source equi-join) --------------------
    wide = construct(
        {
            "meta": selected,
            "mask": masks.select("image_id", F.col("length").alias("mask_len")),
        },
        on="image_id",
    )
    assert wide.count() == len(sel_ids)

    # -- stage 7: split & export (K1/K2 layout, shards, .numexamples) ------
    out = str(tmp_path / "out")
    counts = write_dataset(
        wide.select("image_id", "dataset", "mask_len"),
        out,
        ["image_id"],
        test_fraction=0.25,
        num_folds=2,
        rows_per_shard=2,
    )
    test_n = counts[os.path.join(out, "test", "test")]
    assert test_n == max(1, int(len(sel_ids) * 0.25))
    for split in ("complete", "standard", "fold_0", "fold_1"):
        d = os.path.join(out, "splits", split)
        assert os.path.isdir(d), split
    # shard-count formula n//rows_per_shard + 1 and .numexamples sidecar
    test_dir = os.path.join(out, "test")
    shards = [f for f in os.listdir(test_dir) if f.endswith(".record")]
    assert len(shards) == test_n // 2 + 1
    assert int(open(os.path.join(test_dir, "test.numexamples")).read()) == test_n
    assert sum(
        len(read_tfrecords(os.path.join(test_dir, s))) for s in shards
    ) == test_n

    # -- stage 8: lineage manifest + label map (K4/K5) ---------------------
    manifest_path = write_manifest(
        out,
        spec.name,
        sel_ids,
        result.lineage["filters"],
        result.lineage["transforms"],
        training_type=spec.training_type,
    )
    m = json.load(open(manifest_path))
    assert set(m) == {
        "name", "date_created", "created_by", "comments", "training_type",
        "image_ids", "filters", "transforms",
    }
    assert m["image_ids"] == sel_ids
    assert m["transforms"][0] == {
        "type": "rename", "original": "Car", "new": "Vehicle",
    }

    lm_path = write_label_map(out, dense_label_map(recoded.select("label")))
    text = open(lm_path).read()
    # dense 1..N over the POST-transform sorted label universe
    assert "id: 1" in text and "name: 'Foliage'" in text
    assert "id: 2" in text and "name: 'Vehicle'" in text
    assert "Car" not in text and "Background" not in text
    selected.unpersist()
