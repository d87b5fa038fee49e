"""Round-5 batch 16: semantic checks (cluster-coherent split law,
rule-audit recompute)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_leakage_safe_split_cluster_coherent(spark):
    from jigsaw_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(docs, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    ]
    rows = {
        r["doc_id"]: (r["keeper"], r["split"])
        for r in entrymod.queries()["p_leakage_safe_split"](
            spark, SF
        ).collect()
    }
    assert set(rows) == all_ids
    # THE invariant: no near-dup pair straddles the boundary
    for a, b in pairs:
        assert rows[a][1] == rows[b][1], (a, b)
        assert rows[a][0] == rows[b][0]  # same cluster keeper
    # keeper is the component min (union-find replay)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for d in all_ids:
        want_keeper = find(d) if d in parent else d
        assert rows[d][0] == want_keeper, d
        h = hashlib.md5(f"lss|{want_keeper}".encode()).hexdigest()
        want_split = "train" if int(h[:12], 16) % 10 < 8 else "test"
        assert rows[d][1] == want_split, d
    # the split is roughly 80/20 over clusters
    n_train = sum(1 for _, s in rows.values() if s == "train")
    assert 0.6 * len(rows) < n_train < 0.95 * len(rows)


def test_rule_violations_recompute(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    n = len(li)
    import datetime

    lo = datetime.datetime(1992, 1, 1)
    hi = datetime.datetime(1999, 1, 1)
    want = {
        "quantity_in_1_50": sum(
            1 for r in li if r["l_quantity"] < 1 or r["l_quantity"] > 50
        ),
        "discount_in_0_10pct": sum(
            1 for r in li if r["l_discount"] < 0 or r["l_discount"] > 0.1
        ),
        "price_positive": sum(1 for r in li if r["l_extendedprice"] <= 0),
        "shipdate_in_range": sum(
            1
            for r in li
            if r["l_shipdate"] < lo or r["l_shipdate"] >= hi
        ),
    }
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["rate_micro"], r["passes"])
        for r in entrymod.queries()["dq_rule_violations"](spark, SF).collect()
    }
    for rule, v in want.items():
        assert got[rule] == (n, v, v * 1000000 // n, 1 if v == 0 else 0)
