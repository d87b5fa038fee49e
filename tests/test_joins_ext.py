"""as-of / range joins, stratified sampling, grouping sets, vector moments."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jigsaw_spark.operators.aggregates import cube_agg, rollup_agg, vector_moments
from jigsaw_spark.operators.joins import asof_join, range_join
from jigsaw_spark.operators.samples import stratified_sample


@pytest.fixture(scope="module")
def quotes(spark):
    # (sym, ts, px): the right side of the as-of join
    return spark.createDataFrame(
        [
            ("A", 1, 10.0),
            ("A", 5, 11.0),
            ("A", 9, 12.0),
            ("B", 4, 20.0),
        ],
        "sym string, ts long, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", 0, 100),  # before any quote -> null
            ("A", 5, 101),  # exactly at a quote -> that quote
            ("A", 7, 102),  # between quotes -> earlier one
            ("B", 3, 103),  # before B's only quote -> null
            ("B", 8, 104),
            ("C", 1, 105),  # no quotes at all -> null
        ],
        "sym string, ts long, qty int",
    )


def test_asof_backward_semantics(trades, quotes):
    out = {
        r["qty"]: r["r_px"]
        for r in asof_join(trades, quotes, on=["sym"], ts="ts").collect()
    }
    assert out == {100: None, 101: 11.0, 102: 11.0, 103: None, 104: 20.0, 105: None}


def test_asof_keeps_all_left_rows(trades, quotes):
    assert asof_join(trades, quotes, on=["sym"], ts="ts").count() == trades.count()


def test_asof_single_shuffle_plan(trades, quotes):
    plan = (
        asof_join(trades, quotes, on=["sym"], ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union-tag formulation: exactly one exchange (the window's), no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_bands(spark):
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 99.0)], "id int, x double"
    )
    bands = spark.createDataFrame(
        [(0.0, 10.0, "lo"), (10.0, 20.0, "mid"), (20.0, 30.0, "hi")],
        "lo double, hi double, band string",
    )
    got = {
        r["id"]: r["band"]
        for r in range_join(pts, bands, "x", "lo", "hi").collect()
    }
    assert got == {1: "lo", 2: "mid", 3: "hi"}  # 99.0 unmatched (inner)


def test_range_join_is_broadcast(spark):
    pts = spark.createDataFrame([(1, 5.0)], "id int, x double")
    bands = spark.createDataFrame([(0.0, 10.0, "lo")], "lo double, hi double, band string")
    plan = (
        range_join(pts, bands, "x", "lo", "hi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan


def test_stratified_sample_exact_per_group(spark, tables):
    orders = tables["orders"]
    out = stratified_sample(orders, 5, ["o_orderpriority"], ["o_orderkey"])
    counts = {
        r["o_orderpriority"]: r["n"]
        for r in out.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    per_group = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    for g, n in counts.items():
        assert n == min(5, per_group[g])
    # deterministic
    again = stratified_sample(orders, 5, ["o_orderpriority"], ["o_orderkey"])
    assert sorted(r["o_orderkey"] for r in out.collect()) == sorted(
        r["o_orderkey"] for r in again.collect()
    )


def test_rollup_and_cube_counts(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x")], "g1 string, g2 string"
    )
    roll = rollup_agg(df, ["g1", "g2"], [F.count("*").alias("n")]).collect()
    # rows: 3 leaf + 2 per-g1 + 1 grand total
    assert len(roll) == 6
    assert {(r["g1"], r["g2"]): r["n"] for r in roll}[(None, None)] == 3
    cube = cube_agg(df, ["g1", "g2"], [F.count("*").alias("n")]).collect()
    # cube adds the per-g2 level: 6 + 2
    assert len(cube) == 8


def test_vector_moments_matches_numpy(spark):
    import numpy as np

    vecs = [[1.0, 2.0], [3.0, 6.0], [5.0, 10.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id int, embedding array<double>"
    )
    out = {r["dim"]: r for r in vector_moments(df).collect()}
    arr = np.array(vecs)
    for d in (0, 1):
        assert out[d]["n"] == 3
        assert abs(out[d]["mean"] - arr[:, d].mean()) < 1e-12
        assert abs(out[d]["stdev"] - arr[:, d].std()) < 1e-12


def test_merge_into_upsert_and_delete(spark):
    from jigsaw_spark.operators.joins import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, v double",
    )
    source = spark.createDataFrame(
        # update k=2, insert k=4, delete k=3
        [(2, "b2", 22.0, False), (4, "d", 40.0, False), (3, "c", 30.0, True)],
        "k int, name string, v double, is_deleted boolean",
    )
    got = {
        r["k"]: (r["name"], r["v"])
        for r in merge_into(target, source, ["k"], delete_col="is_deleted").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b2", 22.0), 4: ("d", 40.0)}
    # schema mismatch is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        merge_into(target, source.drop("v"), ["k"])


def test_asof_join_forward_and_tolerance(spark):
    from jigsaw_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("u", 100, 1), ("u", 205, 2), ("u", 400, 3), ("v", 50, 4)],
        "k string, t long, lid int",
    ).select("k", F.timestamp_micros("t").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("u", 100, 10), ("u", 210, 11), ("u", 300, 12)],
        "k string, t long, rid int",
    ).select("k", F.timestamp_micros("t").alias("ts"), "rid")

    fwd = {
        r["lid"]: (r["r_rid"])
        for r in asof_join(
            left, right, ["k"], direction="forward"
        ).collect()
    }
    # equal ts matches (inclusive); 205→210 (earliest at-or-after); 400→None
    assert fwd == {1: 10, 2: 11, 3: None, 4: None}

    back = {
        r["lid"]: r["r_rid"]
        for r in asof_join(left, right, ["k"]).collect()
    }
    assert back == {1: 10, 2: 10, 3: 12, 4: None}

    tol = {
        r["lid"]: (r["r_rid"], r["r_ts"])
        for r in asof_join(
            left, right, ["k"], direction="forward", tolerance_us=5
        ).collect()
    }
    # 205→210 is 5µs away: inside an inclusive 5µs tolerance; 100→100 is 0
    assert tol[1][0] == 10 and tol[2][0] == 11
    # row SURVIVES with a nulled match (merge_asof contract), incl. its ts
    assert tol[3] == (None, None) and tol[4] == (None, None)
