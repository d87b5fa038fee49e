"""Round-12 queue replays: local bridges and the Fano factor (module
r65 sits behind the certification window; these replicas are the
pre-certification evidence, shipped in the queue commit — the r55
pattern verdict r10 #2 restored)."""

from __future__ import annotations

import calendar
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def test_local_bridges_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    closed = {(a, b) for a, b in pairs if adj[a] & adj[b]}
    [g] = entrymod.queries()["graph_local_bridges"](
        spark, SF
    ).collect()
    assert g["n_edges"] == len(pairs)
    assert g["n_triangle_edges"] == len(closed)
    assert g["n_bridges"] == len(pairs) - len(closed)
    expect = (
        0
        if not pairs
        else (len(pairs) - len(closed)) * 1000 // len(pairs)
    )
    assert g["bridge_milli"] == expect
    # consistency with the transitivity queue query: a graph with
    # triangles must have triangle edges, and vice versa
    [t] = entrymod.queries()["graph_transitivity"](spark, SF).collect()
    assert (t["triangles"] > 0) == (g["n_triangle_edges"] > 0)
    assert len(pairs) > 0  # fixture exercises the metric


def test_fano_factor_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in rows:
        daily[(r["event_type"], _day(r["ts"]))] += 1
    per = defaultdict(list)
    for (et, _), x in daily.items():
        per[et].append(x)
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["ts_fano_factor"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    for et, xs in per.items():
        n = len(xs)
        s = sum(xs)
        q = sum(x * x for x in xs)
        g = got[et]
        assert g["n_days"] == n
        assert g["n_events"] == s
        num = n * q - s * s
        assert num >= 0  # Cauchy-Schwarz: variance is non-negative
        assert g["fano_milli"] == (
            0 if n * s == 0 else num * 1000 // (n * s)
        )
