"""Round-9 batch 8: replays for the KS statistic, the k-anonymity
audit, and degree assortativity."""

from __future__ import annotations

import calendar
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _dow(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return (us // 86_400_000_000) % 7


def test_ks_statistic_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    pts = [
        (round(r["value"] * 100), 1 if r["event_type"] == "purchase" else 0)
        for r in rows
    ]
    lo = min(c for c, _ in pts)
    hi = max(c for c, _ in pts)
    n = len(pts)
    npos = sum(y for _, y in pts)
    nneg = n - npos
    groups = defaultdict(lambda: [0, 0])
    for c, y in pts:
        p = 500000 if hi == lo else (c - lo) * 1000000 // (hi - lo)
        groups[p][0] += 1
        groups[p][1] += y
    cpos = cneg = 0
    best = None  # (d_scaled, p_micro)
    for p in sorted(groups):
        n_k, pos_k = groups[p]
        cpos += pos_k
        cneg += n_k - pos_k
        d = abs(cpos * nneg - cneg * npos)
        # ties prefer the HIGHER threshold: >= replaces on equal d
        if best is None or d > best[0] or (d == best[0] and p > best[1]):
            best = (d, p)
    g = entrymod.queries()["ml_ks_statistic"](spark, SF).collect()[0]
    assert (g["n"], g["npos"], g["nneg"]) == (n, npos, nneg)
    assert g["n_thresholds"] == len(groups)
    assert (g["d_scaled"], g["at_threshold_micro"]) == best
    assert g["ks_nano"] == best[0] * 1_000_000_000 // (npos * nneg)
    # KS is a probability gap: 0 <= D <= 1
    assert 0 <= g["ks_nano"] <= 1_000_000_000


def _qi_classes(rows):
    classes = defaultdict(int)
    for r in rows:
        band = round(r["value"] * 100) // 2000
        classes[(r["event_type"], _dow(r["ts"]), band)] += 1
    return classes


def test_k_anonymity_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    classes = _qi_classes(rows)
    per = defaultdict(list)
    for (et, _, _), k in classes.items():
        per[et].append(k)
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["privacy_k_anonymity"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    for et, ks in per.items():
        g = got[et]
        unsafe_rows = sum(k for k in ks if k < 5)
        assert g["n_rows"] == sum(ks)
        assert g["n_classes"] == len(ks)
        assert g["min_k"] == min(ks)
        assert g["n_unsafe_classes"] == sum(1 for k in ks if k < 5)
        assert g["n_unsafe_rows"] == unsafe_rows
        assert g["risk_milli"] == unsafe_rows * 1000 // sum(ks)
    # the audit partitions the table: per-type rows sum to the total
    assert sum(g["n_rows"] for g in got.values()) == len(rows)


def test_degree_assortativity_replays(spark):
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
    edges = pairs | {(b, a) for a, b in pairs}
    deg = defaultdict(int)
    for u, _ in edges:
        deg[u] += 1
    m = len(edges)
    sx = sum(deg[u] for u, _ in edges)
    sxy = sum(deg[u] * deg[v] for u, v in edges)
    sxx = sum(deg[u] * deg[u] for u, _ in edges)
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    g = entrymod.queries()["graph_degree_assortativity"](
        spark, SF
    ).collect()[0]
    assert g["n_nodes"] == len(deg)
    assert g["m_directed"] == m
    assert (g["sum_deg"], g["sum_xy"], g["sum_xx"]) == (sx, sxy, sxx)
    assert (g["num"], g["den"]) == (num, den)
    if den == 0:
        assert g["r_milli"] == 0
    else:
        # both engines truncate the signed division toward zero
        tz = abs(num) * 1000 // abs(den)
        if (num < 0) != (den < 0):
            tz = -tz
        assert g["r_milli"] == tz
        assert -1000 <= g["r_milli"] <= 1000
