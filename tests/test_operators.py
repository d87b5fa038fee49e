"""Unit tests for operator semantics (reference edge cases, SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jigsaw_spark.operators.filters import (
    FilterGroup,
    FilterStep,
    and_filter,
    apply_filter_groups,
    or_filter,
    with_default_tag,
)
from jigsaw_spark.operators.joins import anti_join, semi_join, union_distinct
from jigsaw_spark.operators.samples import (
    approx_split,
    exact_sample,
    kfold_assign,
    shard_assign,
    split_data,
)
from jigsaw_spark.operators.aggregates import dense_label_map, distinct_labels
from jigsaw_spark.operators.transforms import Transform, recode_column


@pytest.fixture(scope="module")
def tags_df(spark):
    rows = [
        ("a", ["tag_1", "tag_A"]),
        ("b", ["tag_1", "tag_B"]),
        ("c", ["tag_2", "tag_A"]),
        ("d", []),
        ("e", None),
    ]
    return spark.createDataFrame(rows, "image_id string, tags array<string>")


def test_with_default_tag(tags_df):
    out = with_default_tag(tags_df)
    got = {r.image_id: r.tags for r in out.collect()}
    assert got["d"] == ["untagged"]
    assert got["e"] == ["untagged"]
    assert got["a"] == ["tag_1", "tag_A"]


def test_and_filter_all_tags_required(tags_df):
    ids = {r.image_id for r in and_filter(tags_df, ["tag_1", "tag_A"]).collect()}
    assert ids == {"a"}


def test_and_filter_empty_tags_is_identity(tags_df):
    assert and_filter(tags_df, []).count() == tags_df.count()


def test_and_filter_unknown_tag_raises(tags_df):
    with pytest.raises(KeyError):
        and_filter(tags_df, ["nope"], validate=True)


def test_or_filter_any_tag(tags_df):
    ids = {r.image_id for r in or_filter(tags_df, ["tag_2", "tag_B"]).collect()}
    assert ids == {"b", "c"}


def test_or_filter_no_duplicate_rows(tags_df):
    # row 'a' matches both tags but must appear once (reference dedups by hand)
    out = or_filter(tags_df, ["tag_1", "tag_A"])
    assert out.count() == out.dropDuplicates(["image_id"]).count() == 3


def test_filter_groups_union_and_lineage(tags_df):
    df = with_default_tag(tags_df)
    groups = [
        FilterGroup("s1", [FilterStep("and", ["tag_1"])]),
        FilterGroup("s2", [FilterStep("or", ["tag_A", "untagged"])]),
    ]
    merged, lineage = apply_filter_groups(df, groups, ["image_id"], collect_counts=True)
    assert {r.image_id for r in merged.collect()} == {"a", "b", "c", "d", "e"}
    assert lineage[0]["name"] == "s1" and lineage[0]["number_included"] == 2
    assert lineage[1]["filters"][0]["count"] == 4


def test_exact_sample_deterministic(spark, tables):
    li = tables["lineitem"]
    a = exact_sample(li, 100, ["l_orderkey", "l_linenumber"]).collect()
    b = exact_sample(li, 100, ["l_orderkey", "l_linenumber"]).collect()
    assert len(a) == 100 and a == b
    # different seed → different membership
    c = exact_sample(li, 100, ["l_orderkey", "l_linenumber"], seed="other").collect()
    assert {(r.l_orderkey, r.l_linenumber) for r in a} != {
        (r.l_orderkey, r.l_linenumber) for r in c
    }


def test_split_exact_counts(spark, tables):
    orders = tables["orders"]
    n = orders.count()
    test, dev = split_data(orders, ["o_orderkey"], 0.2)
    assert test.count() == max(1, int(n * 0.2))
    assert test.count() + dev.count() == n
    # disjoint
    assert semi_join(test, dev.select("o_orderkey"), "o_orderkey").count() == 0


def test_split_min_one_row(spark):
    df = spark.createDataFrame([(1,), (2,)], "k int")
    test, dev = split_data(df, ["k"], 0.2)
    assert test.count() == 1 and dev.count() == 1


def test_approx_split_partitions_everything(spark, tables):
    orders = tables["orders"]
    t, d = approx_split(orders, ["o_orderkey"], 0.2)
    assert t.count() + d.count() == orders.count()
    frac = t.count() / orders.count()
    assert 0.1 < frac < 0.3


def test_kfold_equal_sizes(spark, tables):
    orders = tables["orders"]
    n = orders.count()
    folds = kfold_assign(orders, 5, ["o_orderkey"])
    sizes = {r.fold: r.n for r in folds.groupBy("fold").agg(F.count("*").alias("n")).collect()}
    assert len(sizes) == 5
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == n


def test_shard_count_formula(spark, tables):
    li = tables["lineitem"]
    n = li.count()
    sharded = shard_assign(li, ["l_orderkey", "l_linenumber"], rows_per_shard=1000)
    n_shards = sharded.select("shard").distinct().count()
    assert n_shards == n // 1000 + 1


def test_union_distinct_dedupes(spark):
    a = spark.createDataFrame([("x", 1), ("y", 2)], "k string, v int")
    b = spark.createDataFrame([("y", 2), ("z", 3)], "k string, v int")
    out = union_distinct([a, b], ["k"])
    assert out.count() == 3


def test_union_distinct_missing_columns(spark):
    a = spark.createDataFrame([("x", 1)], "k string, v int")
    b = spark.createDataFrame([("y",)], "k string")
    out = union_distinct([a, b], ["k"])
    got = {r.k: r.v for r in out.collect()}
    assert got == {"x": 1, "y": None}


def test_anti_join_skip_existing(spark):
    incoming = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    existing = spark.createDataFrame([("b",)], "k string")
    assert {r.k for r in anti_join(incoming, existing, "k").collect()} == {"a", "c"}


def test_distinct_labels_excludes_background_case_insensitive(spark):
    df = spark.createDataFrame(
        [("Car",), ("background",), ("Background",), ("Sky",), ("Car",)],
        "label string",
    )
    labels = [r.label for r in distinct_labels(df).collect()]
    assert labels == ["Car", "Sky"]


def test_dense_label_map_contiguous(spark):
    df = spark.createDataFrame([("b",), ("c",), ("a",), ("c",)], "label string")
    got = {r.label: r.label_int for r in dense_label_map(df).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}


def test_recode_rename_then_merge_sequential(spark):
    # transforms apply in order: rename a→b, then merge {b,c}→d catches old a's
    df = spark.createDataFrame([("a",), ("b",), ("c",), ("x",)], "label string")
    ts = [Transform("rename", "a", "b"), Transform("merge", ["b", "c"], "d")]
    got = sorted(r.label for r in recode_column(df, "label", ts).collect())
    assert got == ["d", "d", "d", "x"]


def test_ranked_strategies_agree(spark):
    from jigsaw_spark.operators.samples import _ranked
    from jigsaw_spark.session import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey"
    )
    ranks = {}
    for strategy in ("local", "distributed"):
        got = _ranked(orders, ["o_orderkey"], "t-seed", strategy=strategy)
        ranks[strategy] = {
            r["o_orderkey"]: (r["_rn"], r["_n"]) for r in got.collect()
        }
    assert ranks["local"] == ranks["distributed"]
    n = len(ranks["local"])
    assert sorted(rn for rn, _ in ranks["local"].values()) == list(range(1, n + 1))


def test_bernoulli_sample_deterministic_and_unbiased(spark):
    from jigsaw_spark.operators.samples import bernoulli_sample, bernoulli_threshold_hex
    from jigsaw_spark.session import load_table

    # threshold is the hex rendering of fraction * 16^digits
    assert bernoulli_threshold_hex(0.25) == "40000000"
    assert bernoulli_threshold_hex(1.0) == "ffffffff"

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    n = orders.count()
    a = bernoulli_sample(orders, ["o_orderkey"], 0.25)
    b = bernoulli_sample(orders, ["o_orderkey"], 0.25)
    keys_a = sorted(r.o_orderkey for r in a.select("o_orderkey").collect())
    keys_b = sorted(r.o_orderkey for r in b.select("o_orderkey").collect())
    assert keys_a == keys_b  # membership is a pure function of the key
    # binomial tolerance: ±5 sigma around n/4
    import math

    sigma = math.sqrt(n * 0.25 * 0.75)
    assert abs(len(keys_a) - n / 4) < 5 * sigma
    # different seed draws an independent stream
    c = bernoulli_sample(orders, ["o_orderkey"], 0.25, seed="other")
    keys_c = sorted(r.o_orderkey for r in c.select("o_orderkey").collect())
    assert keys_a != keys_c


def test_edit_distance_pairs_blocked(spark):
    from jigsaw_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en"),
            (2, "the quick brown fax", "en"),   # distance 1 from doc 1
            (3, "the quick brown fox", "fr"),   # identical text, other block
            (4, "completely different words!", "en"),  # other length bucket
        ],
        "doc_id long, text string, lang string",
    )
    got = edit_distance_pairs(
        df, key="doc_id", text="text", block_cols=["lang"],
        length_bucket=10, prefix_len=60, max_distance=5,
    ).collect()
    assert [(r.doc_a, r.doc_b, r.distance) for r in got] == [(1, 2, 1)]


def test_weighted_sample_exact_n_and_weight_bias(spark):
    """A-ES weighted sampling: exactly N rows, deterministic membership,
    and heavy-weight rows overrepresented vs their population share."""
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.samples import weighted_sample

    # 2000 rows: 10% carry weight 20, 90% weight 1
    base = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, 20.0).otherwise(1.0).alias("w"),
    )
    got = weighted_sample(base, 200, ["id"], F.col("w"))
    rows = got.collect()
    assert len(rows) == 200
    # determinism: same call → same membership
    again = {r.id for r in weighted_sample(base, 200, ["id"], F.col("w")).collect()}
    assert {r.id for r in rows} == again
    # bias: heavy rows are 10% of the population but weight 20/1; expected
    # share in the sample is far above 10% — assert a loose 25% floor
    heavy = sum(1 for r in rows if r.id % 10 == 0)
    assert heavy >= 50, heavy


def test_weighted_sample_uniform_weights_match_exact_sample_scale(spark):
    """With all weights equal the selection law reduces to a uniform
    exact-N draw: ln(u)/c is a monotone transform of u."""
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.samples import weighted_sample

    base = spark.range(500).select("id", F.lit(3.0).alias("w"))
    a = {r.id for r in weighted_sample(base, 50, ["id"], F.col("w")).collect()}
    b = {r.id for r in weighted_sample(base, 50, ["id"], F.lit(7.0)).collect()}
    assert a == b  # weight scale cancels out of the ranking


def test_widen_noop_when_already_wide(spark):
    """widen(): repartitions a 1-partition scan to defaultParallelism, and
    no-ops when the input already has width (the 100 TB case)."""
    from jigsaw_spark.session import load_table, widen

    narrow = load_table(spark, "/root/testdata/sf0.001", "documents")
    assert narrow.rdd.getNumPartitions() == 1
    wide = widen(narrow)
    assert (
        wide.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    already = narrow.repartition(spark.sparkContext.defaultParallelism)
    assert widen(already) is already
