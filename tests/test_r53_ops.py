"""Round-9 batch 13: replays for hub-removal impact and threshold
transfer."""

from __future__ import annotations

import calendar
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def _components(edges):
    """Min-reachable-id components over an undirected pair set."""
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seen, comps = set(), []
    for start in adj:
        if start in seen:
            continue
        stack, comp = [start], set()
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u] - comp)
        seen |= comp
        comps.append(comp)
    return comps


def test_hub_removal_replays(spark):
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
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    hubs = {
        u
        for u, _ in sorted(deg.items(), key=lambda t: (-t[1], t[0]))[:5]
    }
    comps_b = _components(pairs)
    kept = {
        (a, b) for a, b in pairs if a not in hubs and b not in hubs
    }
    comps_a = _components(kept)
    g = entrymod.queries()["graph_hub_removal_impact"](
        spark, SF
    ).collect()[0]
    assert g["n_nodes"] == len(deg)
    assert g["m_directed"] == 2 * len(pairs)
    assert g["n_hubs"] == min(5, len(deg))
    assert g["comp_before"] == len(comps_b)
    largest_b = max((len(c) for c in comps_b), default=0)
    largest_a = max((len(c) for c in comps_a), default=0)
    assert g["largest_before"] == largest_b
    assert g["comp_after"] == len(comps_a)
    assert g["largest_after"] == largest_a
    assert g["largest_drop_milli"] == (
        0
        if largest_b == 0
        else (largest_b - largest_a) * 1000 // largest_b
    )
    # removing nodes never grows the largest component
    assert largest_a <= largest_b


def test_threshold_transfer_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    pts = [
        (
            round(r["value"] * 100),
            1 if r["event_type"] == "purchase" else 0,
            _day(r["ts"]) // 7,
        )
        for r in rows
    ]
    wmin = min(w for *_, w in pts)
    wmax = max(w for *_, w in pts)
    cut = (wmin + wmax) // 2 + 1
    train = [(c, y) for c, y, w in pts if w < cut]
    test = [(c, y) for c, y, w in pts if w >= cut]
    lo = min(c for c, _ in train)
    hi = max(c for c, _ in train)

    def score(c):
        return 500000 if hi == lo else (c - lo) * 1000000 // (hi - lo)

    def sweep(data):
        groups = defaultdict(lambda: [0, 0])
        for c, y in data:
            p = score(c)
            groups[p][0] += 1
            groups[p][1] += y
        npos = sum(y for _, y in data)
        tp = fp = 0
        best = None  # (cost, thr)
        for p in sorted(groups, reverse=True):
            n_k, pos_k = groups[p]
            tp += pos_k
            fp += n_k - pos_k
            cost = fp + 5 * (npos - tp)
            if best is None or cost < best[0]:
                best = (cost, p)
        return best

    _, thr = sweep(train)
    fp_at = sum(1 for c, y in test if score(c) >= thr and y == 0)
    fn_at = sum(1 for c, y in test if score(c) < thr and y == 1)
    cost_at = fp_at + 5 * fn_at
    best_cost, _ = sweep(test)
    g = entrymod.queries()["ml_threshold_transfer"](
        spark, SF
    ).collect()[0]
    assert g["cut_week"] == cut
    assert g["train_thr_micro"] == thr
    assert g["n_test"] == len(test)
    assert g["npos_test"] == sum(y for _, y in test)
    assert g["test_cost_at_train_thr"] == cost_at
    assert g["test_best_cost"] == best_cost
    assert g["regret_milli"] == (
        0
        if best_cost == 0
        else (cost_at - best_cost) * 1000 // best_cost
    )
    # the frozen threshold can never beat the test optimum
    assert cost_at >= best_cost
