"""Round-9 batch 11: replays for harmonic centrality, pairwise ER F1,
cohort LTV, and error slices."""

from __future__ import annotations

import calendar
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def test_harmonic_centrality_replays(spark):
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
    nodes = set(adj)
    scores = {}
    for u in nodes:
        d1 = adj[u]
        d2 = set()
        for m in d1:
            d2 |= adj[m]
        d2 -= d1 | {u}
        d3 = set()
        for m in d2:
            d3 |= adj[m]
        d3 -= d1 | d2 | {u}
        scores[u] = (len(d1), len(d2), len(d3))
    ranked = sorted(
        scores.items(),
        key=lambda t: (-(6 * t[1][0] + 3 * t[1][1] + 2 * t[1][2]), t[0]),
    )
    got = {
        r["rn"]: r
        for r in entrymod.queries()["graph_harmonic_centrality"](
            spark, SF
        ).collect()
    }
    n = len(nodes)
    assert set(got) == set(range(1, min(10, n) + 1))
    for rn, (u, (n1, n2, n3)) in enumerate(ranked[:10], 1):
        g = got[rn]
        h6 = 6 * n1 + 3 * n2 + 2 * n3
        assert g["doc_id"] == u
        assert (g["n1"], g["n2"], g["n3"], g["h6"]) == (n1, n2, n3, h6)
        expect = 0 if n <= 1 else h6 * 1000 // (6 * (n - 1))
        assert g["harmonic_milli"] == expect
        assert 0 <= g["harmonic_milli"] <= 1000


def test_pairwise_f1_replays(spark):
    rows = spark.read.parquet(f"{SF}/part.parquet").collect()
    keepers = {}
    for r in rows:
        key = (r["p_brand"], r["p_name"])
        if key not in keepers or r["p_partkey"] < keepers[key]:
            keepers[key] = r["p_partkey"]
    ents = [
        (pk, brand, name, name.split(" ")[0])
        for (brand, name), pk in keepers.items()
    ]

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    by_brand = defaultdict(list)
    for e in ents:
        by_brand[e[1]].append(e)
    n_pred = n_truth = n_common = 0
    for es in by_brand.values():
        es.sort()
        for i, (ka, _, na, ta) in enumerate(es):
            for kb, _, nb, tb in es[i + 1 :]:
                pred = ta == tb
                truth = lev(na, nb) <= 3
                n_pred += pred
                n_truth += truth
                n_common += pred and truth
    g = entrymod.queries()["er_pairwise_f1"](spark, SF).collect()[0]
    assert (g["n_pred"], g["n_truth"], g["n_common"]) == (
        n_pred,
        n_truth,
        n_common,
    )
    assert g["precision_milli"] == (
        0 if n_pred == 0 else n_common * 1000 // n_pred
    )
    assert g["recall_milli"] == (
        0 if n_truth == 0 else n_common * 1000 // n_truth
    )
    assert g["f1_milli"] == (
        0
        if n_pred + n_truth == 0
        else 2 * n_common * 1000 // (n_pred + n_truth)
    )


def test_cohort_ltv_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    per_user_weeks = defaultdict(list)
    for r in rows:
        per_user_weeks[r["user_id"]].append(_day(r["ts"]) // 7)
    cohort = {u: min(ws) for u, ws in per_user_weeks.items()}
    sizes = defaultdict(int)
    for c in cohort.values():
        sizes[c] += 1
    rev = defaultdict(int)
    for r in rows:
        u = r["user_id"]
        w = _day(r["ts"]) // 7
        rev[(cohort[u], w - cohort[u])] += round(r["value"] * 100)
    got = {
        (r["cohort_week"], r["week_offset"]): r
        for r in entrymod.queries()["rel_cohort_ltv"](spark, SF).collect()
    }
    assert set(got) == set(rev)
    by_cohort = defaultdict(list)
    for (c, off), cents in rev.items():
        by_cohort[c].append((off, cents))
    for c, entries in by_cohort.items():
        entries.sort()
        cum = 0
        for off, cents in entries:
            cum += cents
            g = got[(c, off)]
            assert g["revenue_cents"] == cents
            assert g["cum_revenue_cents"] == cum
            assert g["cohort_size"] == sizes[c]
            assert g["ltv_per_user_scaled"] == cum * 100 // sizes[c]
    # cross-check against the retention triangle's cohort sizes
    ret = {
        (r["cohort_week"], r["week_offset"]): r["cohort_size"]
        for r in entrymod.queries()["rel_retention_cohorts"](
            spark, SF
        ).collect()
    }
    for key, size in ret.items():
        if key in got:
            assert got[key]["cohort_size"] == size


def test_error_slices_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    pts = []
    for r in rows:
        cents = round(r["value"] * 100)
        y = 1 if r["event_type"] == "purchase" else 0
        dow = _day(r["ts"]) % 7
        pts.append((cents, y, r["event_type"], dow))
    lo = min(c for c, *_ in pts)
    hi = max(c for c, *_ in pts)
    npos = sum(y for _, y, *_ in pts)
    scored = [
        (
            500000 if hi == lo else (c - lo) * 1000000 // (hi - lo),
            y,
            et,
            dow,
        )
        for c, y, et, dow in pts
    ]
    groups = defaultdict(lambda: [0, 0])
    for p, y, *_ in scored:
        groups[p][0] += 1
        groups[p][1] += y
    tp = fp = 0
    best = None
    for p in sorted(groups, reverse=True):
        n_k, pos_k = groups[p]
        tp += pos_k
        fp += n_k - pos_k
        cost = fp + 5 * (npos - tp)
        if best is None or cost < best[0]:
            best = (cost, p)
    thr = best[1]
    slices = defaultdict(lambda: [0, 0, 0])
    for p, y, et, dow in scored:
        s = slices[(et, dow)]
        s[0] += 1
        if p >= thr and y == 0:
            s[1] += 1
        if p < thr and y == 1:
            s[2] += 1
    ranked = sorted(
        slices.items(),
        key=lambda t: (-((t[1][1] + t[1][2]) * 1000 // t[1][0]), t[0]),
    )
    got = {
        r["rn"]: r
        for r in entrymod.queries()["ml_error_slices"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(range(1, min(5, len(ranked)) + 1))
    for rn, ((et, dow), (n, nfp, nfn)) in enumerate(ranked[:5], 1):
        g = got[rn]
        assert (g["event_type"], g["dow"]) == (et, dow)
        assert (g["n"], g["fp"], g["fn"]) == (n, nfp, nfn)
        assert g["err_milli"] == (nfp + nfn) * 1000 // n
        assert g["threshold_micro"] == thr
