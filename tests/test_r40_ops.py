"""Round-9 queue: python replays for MASE and deterministic walks."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_mase_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in rows:
        day = int(r["ts"].timestamp() // 86400)
        daily[(r["event_type"], day)] += round(r["value"] * 100)
    want = {}
    types = {t for t, _ in daily}
    for et in types:
        pts = {d: c for (t, d), c in daily.items() if t == et}
        e7 = [
            abs(c - pts[d - 7]) for d, c in pts.items() if d - 7 in pts
        ]
        e1 = [
            abs(c - pts[d - 1]) for d, c in pts.items() if d - 1 in pts
        ]
        if not e7 or not e1:
            continue
        s7, n7, s1, n1 = sum(e7), len(e7), sum(e1), len(e1)
        mase = 0 if s1 == 0 else s7 * n1 * 1000000 // (s1 * n7)
        want[et] = (n7, s7, n1, s1, mase)
    got = {
        r["event_type"]: (r["n7"], r["s7"], r["n1"], r["s1"],
                          r["mase_micro"])
        for r in entrymod.queries()["ts_mase"](spark, SF).collect()
    }
    assert got == want


def test_random_walk_replays(spark):
    rows = entrymod.queries()["graph_random_walk"](spark, SF).collect()
    if not rows:
        return  # no near-dup edges at this SF — nothing to walk
    # rebuild adjacency from the emitted paths' first steps is circular;
    # instead verify the walk LAW: given each path prefix, the next hop
    # must be the md5-selected neighbor of some adjacency — we recheck
    # determinism and structure
    for r in rows:
        hops = r["path"].split("->")
        assert len(hops) == 5
        assert int(hops[0]) == r["start"]
        assert int(hops[-1]) == r["final_node"]

    # full determinism: a second run yields the identical walk set
    again = {
        (r["start"], r["path"])
        for r in entrymod.queries()["graph_random_walk"](
            spark, SF
        ).collect()
    }
    assert {(r["start"], r["path"]) for r in rows} == again


def test_random_walk_follows_md5_rule(spark):
    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    pairs = simhash_pairs(keepers, "doc_id", max_hamming=2).select(
        "doc_a", "doc_b"
    ).collect()
    adj = defaultdict(set)
    for p in pairs:
        adj[p["doc_a"]].add(p["doc_b"])
        adj[p["doc_b"]].add(p["doc_a"])
    got = {
        r["start"]: r["path"]
        for r in entrymod.queries()["graph_random_walk"](
            spark, SF
        ).collect()
    }
    assert set(got) == {u for u in adj if adj[u]}
    for start, path in got.items():
        node = start
        hops = [int(h) for h in path.split("->")]
        for s in range(4):
            nbrs = sorted(adj[node])
            h = hashlib.md5(
                f"walk|{start}|{s}|{node}".encode()
            ).hexdigest()
            node = nbrs[int(h[:12], 16) % len(nbrs)]
            assert hops[s + 1] == node
