"""Stateful streaming (applyInPandasWithState), skew helpers, IVF assign."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from jigsaw_spark.operators.similarity import ivf_assign
from jigsaw_spark.operators.skew import count_distinct_twophase, salted_agg

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark, tables):
    events = tables["events"]
    plain = {
        (r["event_type"]): (r["n"], round(r["tv"], 2))
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    salted = salted_agg(
        events,
        ["event_type"],
        {"n": ("count", F.lit(1)), "tv": ("sum", F.col("value"))},
        num_salts=8,
    )
    got = {
        (r["event_type"]): (r["n"], round(r["tv"], 2))
        for r in salted.collect()
    }
    assert got == plain


def test_salted_agg_two_stage_plan(spark, tables):
    events = tables["events"]
    plan = (
        salted_agg(events, ["event_type"], {"n": ("count", F.lit(1))})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stage-1 partitioning carries the salt
    assert "_salt" in plan


def test_count_distinct_twophase_matches(spark, tables):
    events = tables["events"]
    plain = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r["event_type"]: r["n_distinct"]
        for r in count_distinct_twophase(events, ["event_type"], "user_id").collect()
    }
    assert got == plain


def test_ivf_assign_nearest_and_total(spark, tables):
    emb = tables["embeddings"]
    cents = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 4).collect()
    ]
    out = ivf_assign(emb, cents)
    assert out.count() == emb.count()
    # a centroid's own vector must land in its own cell (cosine=1 with itself)
    own = {r["vec_id"]: r["cell"] for r in out.filter(F.col("vec_id") < 4).collect()}
    assert own == {0: 0, 1: 1, 2: 2, 3: 3}
    # every cell id is a centroid id
    cells = {r["cell"] for r in out.select("cell").distinct().collect()}
    assert cells <= {0, 1, 2, 3}


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    return str(src), ckpt


def test_stateful_sessions_incremental_across_runs(spark, stream_dirs):
    """State survives the checkpoint: a second AvailableNow run over newly
    arrived files continues counting from the first run's state."""
    from jigsaw_spark.streaming.stateful import run_stateful_sessions

    src, ckpt = stream_dirs
    events = spark.read.parquet(os.path.join(SF, "events.parquet")).orderBy(
        "event_id"
    )
    n = events.count()
    half = n // 2
    first = events.limit(half)
    second = events.subtract(first)
    first.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "batch1"))

    _, upd1 = run_stateful_sessions(spark, src + "/*", ckpt, glob="*.parquet")
    got1 = upd1.groupBy("user_id").agg(F.max("n_events").alias("n")).collect()
    assert sum(r["n"] for r in got1) == half

    second.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "batch2"))
    _, upd2 = run_stateful_sessions(spark, src + "/*", ckpt, glob="*.parquet")
    got2 = {
        r["user_id"]: r["n"]
        for r in upd2.groupBy("user_id").agg(F.max("n_events").alias("n")).collect()
    }
    # counts are cumulative over BOTH batches for users updated in run 2 —
    # that's the stored state continuing; users absent from batch 2 keep
    # their run-1 totals (the sink dir accumulates all updates)
    full = {
        r["user_id"]: r["count"] for r in events.groupBy("user_id").count().collect()
    }
    b1 = {
        r["user_id"]: r["count"] for r in first.groupBy("user_id").count().collect()
    }
    b2_users = {r["user_id"] for r in second.select("user_id").distinct().collect()}
    assert got2
    for uid, cnt in got2.items():
        assert cnt == (full[uid] if uid in b2_users else b1[uid])
    # at least one user must have genuinely accumulated across runs
    assert any(
        got2[u] == full[u] and full[u] > b1.get(u, 0) for u in b2_users
    )


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.skew import salted_join
    from jigsaw_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(
            orders, cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", num_salts=8
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_streaming_upsert_latest_per_key(spark, tmp_path):
    """CDC upsert sink: two AvailableNow drains — the second sees only the
    newly arrived file (checkpoint) and its rows overwrite matching keys
    in the snapshot, insert the rest."""
    import datetime as dt

    from jigsaw_spark.streaming.ingest import streaming_upsert

    src = tmp_path / "src"
    src.mkdir()
    dest = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows, name):
        # the file stream source does not recurse into write-dir layouts;
        # land each batch as a single flat file under src/
        import glob
        import shutil

        tmp = str(tmp_path / f"_stage_{name}")
        spark.createDataFrame(
            [(ts, uid, et, val, "{}") for ts, uid, et, val in rows],
            "ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(part, str(src / name))

    mk(
        [
            (t0, 1, "a", 1.0),
            (t0 + dt.timedelta(minutes=1), 1, "b", 2.0),  # latest for key 1
            (t0, 2, "a", 5.0),
        ],
        "batch1.parquet",
    )
    snap = streaming_upsert(spark, str(src), dest, ckpt, keys=["user_id"])
    got = {r.user_id: (r.event_type, r.value) for r in snap.collect()}
    assert got == {1: ("b", 2.0), 2: ("a", 5.0)}

    mk(
        [
            (t0 + dt.timedelta(minutes=5), 2, "c", 9.0),  # update key 2
            (t0, 3, "a", 7.0),  # insert key 3
        ],
        "batch2.parquet",
    )
    snap2 = streaming_upsert(spark, str(src), dest, ckpt, keys=["user_id"])
    got2 = {r.user_id: (r.event_type, r.value) for r in snap2.collect()}
    assert got2 == {1: ("b", 2.0), 2: ("c", 9.0), 3: ("a", 7.0)}


def test_rocksdb_state_store_same_results(spark, tmp_path):
    """The RocksDB provider (disk-spilling state — the 100 TB/day streaming
    path) must produce byte-identical windowed aggregates to the default
    in-heap provider."""
    import uuid

    from jigsaw_spark.streaming.ingest import (
        read_event_stream,
        rocksdb_state_conf,
        windowed_event_counts,
    )

    def drain(provider_confs):
        for k, v in provider_confs.items():
            spark.conf.set(k, v)
        try:
            stream = read_event_stream(
                spark, os.path.join(SF), glob="events.parquet"
            )
            name = f"ss_{uuid.uuid4().hex[:8]}"
            q = (
                windowed_event_counts(stream, "1 hour")
                .writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", str(tmp_path / name))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return sorted(map(tuple, spark.table(name).collect()))
        finally:
            for k in provider_confs:
                spark.conf.unset(k)

    default = drain({})
    rocks = drain(rocksdb_state_conf())
    assert default == rocks and len(rocks) > 0
