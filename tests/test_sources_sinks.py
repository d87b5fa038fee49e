"""Tests for jigsaw-tree sources, TFRecord sink, dataset layout, multimodal
plumbing, and streaming ingest."""

from __future__ import annotations

import json
import os
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from jigsaw_spark.multimodal import (
    decode_image_meta,
    extract_features,
    mask_to_bboxes,
)
from jigsaw_spark.sources.registry import (
    read_binaries,
    read_label_colors,
    read_metadata_tree,
    read_voc_bboxes,
)
from jigsaw_spark.sources.sinks import write_dataset, write_label_map, write_manifest
from jigsaw_spark.sources.tfrecord import (
    encode_example,
    frame_record,
    read_tfrecords,
    write_tfrecords,
)
from jigsaw_spark.streaming.ingest import (
    incremental_ingest,
    read_event_stream,
    windowed_event_counts,
)


def _minimal_png(width: int, height: int) -> bytes:
    """A spec-valid (if pointless) PNG: signature + IHDR chunk only."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


@pytest.fixture(scope="module")
def jigsaw_tree(tmp_path_factory):
    """A reference-convention dataset tree (SURVEY §1.3 file classes)."""
    d = tmp_path_factory.mktemp("tree")
    ids = ["Seq05VD_f04950", "0016E5_07560", "plain.id_1"]
    tags = [["tag_1", "tag_A"], ["tag_2"], []]
    for image_id, t in zip(ids, tags):
        (d / f"meta_{image_id}.json").write_text(
            json.dumps({"dataset": "CamVid", "tags": t})
        )
        (d / f"labels_{image_id}.csv").write_text(
            "label,R,G,B\nCar,64,0,128\nBackground,0,0,0\n"
        )
        (d / f"mask_{image_id}.png").write_bytes(_minimal_png(4, 2))
        (d / f"{image_id}.png").write_bytes(_minimal_png(960, 720))
    (d / "0016E5_07560_labels.xml").write_text(
        """<annotation><size><width>960</width><height>720</height></size>
        <object><name>Car</name><bndbox><xmin>10</xmin><ymin>20</ymin>
        <xmax>110</xmax><ymax>220</ymax></bndbox></object>
        <object><name>Sky</name><bndbox><xmin>0</xmin><ymin>0</ymin>
        <xmax>960</xmax><ymax>100</ymax></bndbox></object></annotation>"""
    )
    return str(d), ids


def test_read_metadata_tree(spark, jigsaw_tree):
    path, ids = jigsaw_tree
    df = read_metadata_tree(spark, path)
    got = {r.image_id: r.tags for r in df.collect()}
    assert set(got) == set(ids)  # quirk-7 fix: dotted/underscored ids survive
    assert got["Seq05VD_f04950"] == ["tag_1", "tag_A"]
    assert got["plain.id_1"] == ["untagged"]


def test_read_label_colors(spark, jigsaw_tree):
    path, ids = jigsaw_tree
    df = read_label_colors(spark, path)
    assert df.count() == 2 * len(ids)
    row = df.filter((F.col("image_id") == ids[0]) & (F.col("label") == "Car")).first()
    assert (row.r, row.g, row.b) == (64, 0, 128)


def test_read_binaries_images_and_masks(spark, jigsaw_tree):
    path, ids = jigsaw_tree
    masks = read_binaries(spark, path, kind="mask")
    images = read_binaries(spark, path, kind="image")
    assert {r.image_id for r in masks.collect()} == set(ids)
    assert {r.image_id for r in images.collect()} == set(ids)
    assert images.first().kind == "image"


def test_read_voc_bboxes(spark, jigsaw_tree):
    path, _ = jigsaw_tree
    df = read_voc_bboxes(spark, path)
    rows = {r.label: r for r in df.collect()}
    assert set(rows) == {"Car", "Sky"}
    car = rows["Car"]
    assert (car.xmin, car.ymin, car.xmax, car.ymax) == (10, 20, 110, 220)
    assert (car.width, car.height) == (960, 720)
    assert car.image_id == "0016E5_07560"


def test_construct_join_over_tree(spark, jigsaw_tree):
    """J1 end-to-end: meta ⋈ palette ⋈ mask ⋈ image on image_id."""
    from jigsaw_spark.operators.joins import construct

    path, ids = jigsaw_tree
    meta = read_metadata_tree(spark, path)
    palette = read_label_colors(spark, path).groupBy("image_id").count()
    masks = read_binaries(spark, path, "mask").select("image_id", F.col("length").alias("mask_len"))
    wide = construct(
        {"meta": meta, "palette": palette, "mask": masks}, on="image_id"
    )
    assert wide.count() == len(ids)
    assert {"image_id", "dataset", "tags", "count", "mask_len"} <= set(wide.columns)


# -- TFRecord ----------------------------------------------------------------


def test_tfrecord_roundtrip_bytes(tmp_path):
    rec = encode_example({"a": 1, "b": "x", "c": [1.5, 2.5], "d": b"\x00\x01"})
    framed = frame_record(rec)
    path = tmp_path / "t.record"
    path.write_bytes(framed + frame_record(rec))
    back = read_tfrecords(str(path))
    assert back == [rec, rec]


def test_tfrecord_known_encoding():
    # int64 feature 'x'=1: field map entries hand-derived from the protobuf spec
    enc = encode_example({"x": 1})
    #   Example.features(1) > entry(1) > key(1)="x", value(2)=Feature{int64_list(3)={value(1)=[1]}}
    assert enc == bytes(
        [0x0A, 0x0C, 0x0A, 0x0A, 0x0A, 0x01, 0x78, 0x12, 0x05, 0x1A, 0x03, 0x0A, 0x01, 0x01]
    )


def test_write_tfrecords_shards_and_count(spark, tmp_path):
    df = spark.range(2500).select(
        F.col("id"), F.concat(F.lit("doc_"), F.col("id")).alias("name")
    )
    out = str(tmp_path / "records")
    write_tfrecords(df.repartition(3), out, "train")
    shards = sorted(f for f in os.listdir(out) if f.endswith(".record"))
    assert len(shards) == 3
    total = sum(len(read_tfrecords(os.path.join(out, s))) for s in shards)
    assert total == 2500
    assert open(os.path.join(out, "train.numexamples")).read() == "2500"


def test_write_dataset_layout(spark, tmp_path):
    df = spark.range(200).withColumnRenamed("id", "image_id")
    out = str(tmp_path / "ds")
    counts = write_dataset(df, out, ["image_id"], num_folds=2, rows_per_shard=100)
    assert os.path.isdir(os.path.join(out, "test"))
    assert os.path.isdir(os.path.join(out, "splits", "complete"))
    assert os.path.isdir(os.path.join(out, "splits", "standard"))
    assert os.path.isdir(os.path.join(out, "splits", "fold_0"))
    assert counts[os.path.join(out, "test", "test")] == 40  # 20% of 200
    # fold train/test partition the dev set
    f0 = counts[os.path.join(out, "splits", "fold_0", "train")]
    f0t = counts[os.path.join(out, "splits", "fold_0", "test")]
    assert f0 + f0t == 160


def test_manifest_and_label_map(spark, tmp_path):
    from jigsaw_spark.operators.aggregates import dense_label_map

    p = write_manifest(
        str(tmp_path),
        "ds1",
        ["a", "b"],
        {"groups": []},
        [{"type": "rename", "original": "x", "new": "y"}],
    )
    m = json.load(open(p))
    assert m["name"] == "ds1" and m["date_created"].endswith("Z")
    assert set(m) == {
        "name", "date_created", "created_by", "comments", "training_type",
        "image_ids", "filters", "transforms",
    }

    labels = spark.createDataFrame([("Car",), ("Sky",), ("panel_left",)], "label string")
    lm = write_label_map(str(tmp_path), dense_label_map(labels), skip=("panel_left",))
    text = open(lm).read()
    assert "name: 'Car'" in text and "panel_left" not in text
    assert "id: 1" in text


# -- multimodal --------------------------------------------------------------


def test_decode_image_meta_png_header(spark, jigsaw_tree):
    path, _ = jigsaw_tree
    images = read_binaries(spark, path, "image")
    meta = decode_image_meta(images)
    row = meta.first()
    assert row.format == "png" and (row.width, row.height) == (960, 720)


def test_mask_to_bboxes_stub_contract(spark, jigsaw_tree):
    # non-PNG payloads still go through the stub contract
    raw = spark.createDataFrame(
        [("m1", b"not-a-png-payload")], "image_id string, content binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mask_to_bboxes(raw, fake=False).collect()
    path, _ = jigsaw_tree
    masks = read_binaries(spark, path, "mask")
    boxes = mask_to_bboxes(masks, fake=True)
    assert boxes.count() > 0
    b = boxes.first()
    assert b.xmin <= b.xmax and b.ymin <= b.ymax


def test_mask_to_bboxes_real_png(spark):
    # real path: encode a known mask, decode through the operator, expect
    # exact tight extents per color
    import numpy as np

    from jigsaw_spark.multimodal.png_codec import encode_png

    arr = np.zeros((6, 8, 3), dtype=np.uint8)
    arr[1:3, 2:5] = (64, 0, 128)  # Car: y 1..2, x 2..4
    arr[4:6, 6:8] = (0, 64, 64)  # Pedestrian: y 4..5, x 6..7
    df = spark.createDataFrame(
        [("m1", bytearray(encode_png(arr)))], "image_id string, content binary"
    )
    rows = {
        (r.label_r, r.label_g, r.label_b): (r.xmin, r.xmax, r.ymin, r.ymax)
        for r in mask_to_bboxes(df, fake=False).collect()
    }
    assert rows[(64, 0, 128)] == (2, 4, 1, 2)
    assert rows[(0, 64, 64)] == (6, 7, 4, 5)
    assert rows[(0, 0, 0)] == (0, 7, 0, 5)


def test_extract_features_fake_is_unit_norm(spark, jigsaw_tree):
    path, _ = jigsaw_tree
    images = read_binaries(spark, path, "image")
    feats = extract_features(images, dim=8, fake=True)
    v = feats.first().embedding
    assert len(v) == 8
    assert abs(sum(x * x for x in v) - 1.0) < 1e-5


# -- streaming ---------------------------------------------------------------


def test_streaming_matches_batch(spark, tmp_path):
    """Windowed agg over the stream == the same agg over the batch read."""
    import shutil

    from jigsaw_spark.session import load_table

    src = "/root/testdata/sf0.001"
    stream_dir = str(tmp_path / "stream_src")
    os.makedirs(stream_dir)
    shutil.copy(os.path.join(src, "events.parquet"), stream_dir)
    stream = read_event_stream(spark, stream_dir)
    agg = windowed_event_counts(stream, "1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM stream_counts").collect()
    }
    batch = windowed_event_counts(load_table(spark, src, "events"))
    want = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_incremental_ingest_skips_seen_files(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    dest = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    import shutil

    shutil.copy("/root/testdata/sf0.001/events.parquet", os.path.join(src, "a.parquet"))
    n1 = incremental_ingest(spark, src, dest, ckpt)
    assert n1 > 0
    # second run, nothing new
    n2 = incremental_ingest(spark, src, dest, ckpt)
    assert n2 == 0
    # drop a new file in, only it is ingested
    shutil.copy("/root/testdata/sf0.001/events.parquet", os.path.join(src, "b.parquet"))
    n3 = incremental_ingest(spark, src, dest, ckpt)
    assert n3 == n1


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must sort-merge join with
    zero Exchange (and zero Sort) in the physical plan — the write-once,
    join-forever layout."""
    from jigsaw_spark.sources.sinks import write_bucketed

    left = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "a", F.col("k") * 2
    )
    right = spark.range(0, 1000, 2).withColumnRenamed("id", "k").withColumn(
        "b", F.col("k") + 1
    )
    write_bucketed(left, "bkt_left", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "l"))
    write_bucketed(right, "bkt_right", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "r"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 500
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_sample_frames_stub_contract(spark):
    from jigsaw_spark.multimodal.binary_ops import sample_frames

    vids = spark.createDataFrame(
        [("v1", b"fake-video-payload-1"), ("v2", b"fake-video-payload-two")],
        "video_id string, content binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        sample_frames(vids, fake=False).collect()
    frames = sample_frames(vids, every_n=4, fake=True).collect()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert set(by_vid) == {"v1", "v2"}
    for rows in by_vid.values():
        idxs = sorted(r["frame_idx"] for r in rows)
        # every_n stride starting at 0
        assert idxs == list(range(0, max(idxs) + 1, 4))
        assert all(len(r["frame"]) == 16 for r in rows)
    # deterministic across runs
    again = sample_frames(vids, every_n=4, fake=True).collect()
    assert sorted(map(tuple, frames)) == sorted(map(tuple, again))


def test_resize_images_stub_contract(spark):
    from jigsaw_spark.multimodal.binary_ops import resize_images

    imgs = spark.createDataFrame(
        [("i1", b"img-bytes-a"), ("i2", b"img-bytes-b")],
        "image_id string, content binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_images(imgs, fake=False).collect()
    out = resize_images(imgs, width=8, height=8, fake=True).collect()
    assert {r["image_id"] for r in out} == {"i1", "i2"}
    for r in out:
        assert (r["width"], r["height"]) == (8, 8)
        assert len(r["resized"]) >= 64


def test_audio_wav_roundtrip_and_windows(spark):
    from jigsaw_spark.multimodal.audio_ops import (
        decode_audio_meta,
        extract_audio_features,
        parse_wav_header,
        synthesize_wav,
        window_audio,
    )

    wav = synthesize_wav(b"hello-audio", sample_rate=8000, n_samples=2048)
    meta = parse_wav_header(wav)
    assert meta["channels"] == 1 and meta["sample_rate"] == 8000
    assert meta["bits"] == 16 and meta["n_samples"] == 2048

    clips = spark.createDataFrame(
        [
            ("a1", synthesize_wav(b"payload-one")),
            ("a2", synthesize_wav(b"payload-two")),
            ("bad", b"not-a-wav-at-all-but-long-enough-to-check-the-magic-bytes"),
        ],
        "audio_id string, content binary",
    )

    got = {r["audio_id"]: r for r in decode_audio_meta(clips).collect()}
    assert got["a1"]["format"] == "wav" and got["a1"]["n_samples"] == 2048
    assert got["a1"]["duration_ms"] == 256.0  # 2048 / 8000 Hz
    assert got["bad"]["format"] == "unknown" and got["bad"]["sample_rate"] is None

    wins = window_audio(clips, window=512, hop=256).collect()
    by_id = {}
    for r in wins:
        by_id.setdefault(r["audio_id"], []).append(r)
    assert "bad" not in by_id  # non-WAV rows are dropped, not crashed
    # 2048 samples, window 512, hop 256 -> starts 0..1536 = 7 windows
    assert sorted(r["window_idx"] for r in by_id["a1"]) == list(range(7))
    for r in wins:
        assert 0.0 <= r["rms"] <= r["peak"] <= 1.0

    feats = {r["audio_id"]: r["embedding"] for r in extract_audio_features(clips, dim=8).collect()}
    assert set(feats) == {"a1", "a2"}
    for emb in feats.values():
        assert len(emb) == 8
        assert abs(sum(x * x for x in emb) - 1.0) < 1e-5  # unit norm
    # deterministic and content-sensitive
    assert feats["a1"] != feats["a2"]


def test_stream_dedup_drops_cross_file_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a source containing the SAME
    events file twice yields the single-copy answer."""
    import shutil

    from jigsaw_spark.streaming.ingest import stream_dedup

    src = "/root/testdata/sf0.001"
    stream_dir = str(tmp_path / "dup_src")
    os.makedirs(stream_dir)
    shutil.copy(os.path.join(src, "events.parquet"), os.path.join(stream_dir, "a.parquet"))
    shutil.copy(os.path.join(src, "events.parquet"), os.path.join(stream_dir, "b.parquet"))

    from pyspark.sql import functions as F

    stream = read_event_stream(spark, stream_dir)
    deduped = stream_dedup(stream, ["event_id"], watermark="2 hours")
    agg = deduped.groupBy().agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("dedup_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    (got,) = spark.sql("SELECT n FROM dedup_counts").collect()
    want = spark.read.parquet(os.path.join(src, "events.parquet")).count()
    # doubled input, single-copy output
    assert got["n"] == want


def test_write_partitioned_prunes_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from jigsaw_spark.session import load_table
    from jigsaw_spark.sources.sinks import write_partitioned

    events = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_date")
    write_partitioned(events, out, ["event_date"], sort_cols=["user_id"])

    # hive-style dirs exist
    dirs = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert len(dirs) > 1

    back = spark.read.parquet(out)
    one_day = sorted(d.split("=")[1] for d in dirs)[0]
    q = back.filter(F.col("event_date") == one_day)
    # partition filter reaches the scan: non-matching dirs are never read
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_date" in plan.split("PartitionFilters")[1][:200]
    # round-trip count matches the unpartitioned filter
    want = events.filter(F.col("event_date") == one_day).count()
    assert q.count() == want > 0


def test_orc_roundtrip_pushdown(spark, tmp_path):
    """ORC source/sink parity: write the orders table as ORC, read it back
    identically, and confirm predicate pushdown reaches the ORC scan."""
    from jigsaw_spark.session import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").limit(500)
    out = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == 500
    assert {f.name for f in back.schema} == {f.name for f in orders.schema}
    filtered = back.filter(back.o_orderkey < 100)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey," in plan
    assert filtered.count() == orders.filter("o_orderkey < 100").count()


def test_jsonl_roundtrip_schema_and_values(spark, tmp_path):
    """JSON-lines sink/source parity: nested struct + array columns
    survive the roundtrip with explicit schema on re-read."""
    from pyspark.sql import functions as F

    from jigsaw_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id",
        "lang",
        F.struct("source", "n_chars").alias("meta"),
        F.split("text", " ").alias("words"),
    )
    out = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(docs.schema).json(out)
    assert back.count() == docs.count()
    a = {r.doc_id: (r.meta.source, len(r.words)) for r in docs.collect()}
    b = {r.doc_id: (r.meta.source, len(r.words)) for r in back.collect()}
    assert a == b


def test_csv_roundtrip_header_and_types(spark, tmp_path):
    """CSV sink/source parity with header + explicit schema (the lake
    interchange format for flat tables)."""
    from jigsaw_spark.session import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    out = str(tmp_path / "orders_csv")
    orders.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True).schema(orders.schema).csv(out)
    )
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    a = sorted(r.o_orderkey for r in orders.collect())
    b = sorted(r.o_orderkey for r in back.collect())
    assert a == b


def test_foreachbatch_sink_idempotent_across_restarts(spark, tmp_path):
    """foreachBatch + checkpoint = exactly-once file sink: a second
    AvailableNow run from the same checkpoint re-processes nothing, and a
    new input file is picked up incrementally without duplicating old
    batches."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", str(src / "events.parquet")
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = read_event_stream(spark, str(src), glob="*.parquet")
        agg = stream.select("event_id", "event_type")

        def write_batch(df, batch_id):
            df.write.mode("append").parquet(out)

        q = (
            agg.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    n1 = spark.read.parquet(out).count()
    run()  # same checkpoint, no new files -> no new rows
    n2 = spark.read.parquet(out).count()
    assert n2 == n1
    # drop a renamed copy in -> only the new file's rows are appended
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", str(src / "events2.parquet")
    )
    run()
    n3 = spark.read.parquet(out).count()
    assert n3 == 2 * n1


def test_dynamic_partition_overwrite_preserves_siblings(spark, tmp_path):
    """Dynamic partitionOverwriteMode: rewriting one partition's data must
    not clobber sibling partitions — the incremental-backfill contract for
    a hive-partitioned lake (static mode would truncate the whole table)."""
    out = str(tmp_path / "lake")
    base = spark.range(100).selectExpr(
        "id", "CAST(id % 4 AS INT) AS bucket"
    )
    base.write.partitionBy("bucket").mode("overwrite").parquet(out)
    assert spark.read.parquet(out).count() == 100

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = spark.range(1000, 1010).selectExpr(
            "id", "CAST(1 AS INT) AS bucket"
        )
        patch.write.partitionBy("bucket").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(out)
    # bucket 1 replaced (25 -> 10 rows), buckets 0/2/3 untouched
    assert back.filter("bucket = 1").count() == 10
    assert back.filter("bucket != 1").count() == 75
    assert back.filter("bucket = 1 AND id >= 1000").count() == 10


def test_foreachbatch_merge_materialized_rollup(spark, tmp_path):
    """Streaming materialized-view maintenance: each micro-batch MERGEs its
    partial per-type counts into a parquet rollup target via merge_into —
    the incremental-aggregation pattern where the stream updates a stored
    rollup instead of recomputing it. After draining two file arrivals,
    the target equals the batch answer over all input."""
    import shutil

    from jigsaw_spark.operators.joins import merge_into

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", str(src / "e1.parquet")
    )
    target = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = read_event_stream(spark, str(src), glob="*.parquet")
        partial = stream.groupBy("event_type").count()

        def upsert(batch_df, batch_id):
            import os

            # update mode: the batch holds the NEW cumulative total for
            # every key that changed — a true key-level upsert into the
            # stored rollup (replace matched keys, insert new ones)
            incoming = batch_df.withColumnRenamed("count", "n")
            if os.path.exists(target):
                current = spark.read.parquet(target)
                out = merge_into(current, incoming, ["event_type"])
            else:
                out = incoming
            out.write.mode("overwrite").parquet(target + "_next")
            spark.read.parquet(target + "_next").write.mode(
                "overwrite"
            ).parquet(target)

        q = (
            partial.writeStream.outputMode("update")
            .foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = {
        r.event_type: r.n for r in spark.read.parquet(target).collect()
    }
    assert sum(first.values()) == 1000
    # second arrival doubles every count after the next drain
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet", str(src / "e2.parquet")
    )
    run()
    second = {
        r.event_type: r.n for r in spark.read.parquet(target).collect()
    }
    assert sum(second.values()) == 2000
    assert all(second[k] == 2 * first[k] for k in first)


def test_tfrecord_temporal_features(tmp_path):
    """Timestamp/date columns encode as epoch-micros / epoch-days int64
    features (the crash a user hits first when exporting a table that
    carries an order-date column)."""
    import datetime as dt

    ts = dt.datetime(2024, 1, 2, 3, 4, 5, 123456)
    d = dt.date(2024, 1, 2)
    rec = encode_example({"ts": ts, "d": d, "x": 1})
    # same bytes as encoding the equivalent int64s directly
    want = encode_example(
        {
            "ts": int(
                (ts - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
            ),
            "d": (d - dt.date(1970, 1, 1)).days,
            "x": 1,
        }
    )
    assert rec == want


def test_tfrecord_datasource_roundtrip(spark, tmp_path):
    """K2 closes the loop: shards written by write_tfrecords come back as a
    DataFrame through the Python DataSource (spark.read.format)."""
    from jigsaw_spark.sources.tfrecord_source import register_tfrecord_source

    df = spark.range(250).select(
        F.col("id"),
        F.concat(F.lit("doc_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
        F.array(F.col("id"), F.col("id") + 1).alias("pair"),
    )
    out = str(tmp_path / "rt")
    write_tfrecords(df.repartition(3), out, "train")

    register_tfrecord_source(spark)
    back = (
        spark.read.format("tfrecord")
        .schema("id long, name string, score double, pair array<long>")
        .load(out)
    )
    got = {r["id"]: r for r in back.collect()}
    assert len(got) == 250
    assert got[7]["name"] == "doc_7" and got[7]["pair"] == [7, 8]
    # floats were framed as f32 — equal after the same narrowing
    import struct as _s

    assert got[7]["score"] == _s.unpack("<f", _s.pack("<f", 10.5))[0]
    # parallelism = one partition per shard
    assert back.rdd.getNumPartitions() == 3

    # missing feature → NULL; projection subset works
    sub = (
        spark.read.format("tfrecord")
        .schema("name string, absent long")
        .load(out)
    )
    row = sub.filter(F.col("name") == "doc_3").first()
    assert row["absent"] is None

    # schema inference: int64→long, bytes→binary, >1 values→array
    inferred = spark.read.format("tfrecord").load(out)
    assert dict(inferred.dtypes) == {
        "id": "bigint",
        "name": "binary",
        "score": "double",
        "pair": "array<bigint>",
    }
    assert inferred.count() == 250


def test_read_voc_bboxes_xml_parity(spark, jigsaw_tree):
    """The native-XML datasource path (JVM, explicit schema) must agree
    row-for-row with the ElementTree mapInPandas parser."""
    from jigsaw_spark.sources.registry import read_voc_bboxes_xml

    path, _ = jigsaw_tree
    et_rows = {
        tuple(r) for r in read_voc_bboxes(spark, path).collect()
    }
    xml_rows = {
        tuple(r) for r in read_voc_bboxes_xml(spark, path).collect()
    }
    assert xml_rows == et_rows and len(xml_rows) > 0
