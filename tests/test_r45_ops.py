"""Round-9 batch 5: replays for split leakage, small-cell suppression,
and the ANN recall curve."""

from __future__ import annotations

import calendar
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def test_split_user_leakage_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    days = [(r["user_id"], _day(r["ts"])) for r in rows]
    lo = min(d for _, d in days)
    hi = max(d for _, d in days)
    cut = lo + (hi - lo) * 8 // 10
    train_u = {u for u, d in days if d <= cut}
    eval_ev = [(u, d) for u, d in days if d > cut]
    eval_users = {u for u, _ in eval_ev}
    leaked_users = {u for u in eval_users if u in train_u}
    leaked_events = sum(1 for u, _ in eval_ev if u in train_u)
    g = entrymod.queries()["dq_split_user_leakage"](spark, SF).collect()[0]
    assert g["cut_day"] == cut
    assert g["train_users"] == len(train_u)
    assert g["eval_users"] == len(eval_users)
    assert g["leaked_users"] == len(leaked_users)
    assert g["leaked_user_milli"] == len(leaked_users) * 1000 // len(
        eval_users
    )
    assert g["eval_events"] == len(eval_ev)
    assert g["leaked_events"] == leaked_events
    assert g["leaked_event_milli"] == leaked_events * 1000 // len(eval_ev)


def test_small_cell_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    cells = defaultdict(int)
    for r in rows:
        cells[(r["event_type"], _day(r["ts"]))] += 1
    per_type = defaultdict(lambda: [0, 0, 0, 0])  # cells, supp, supp_rows, rel_rows
    for (et, _), c in cells.items():
        agg = per_type[et]
        agg[0] += 1
        if c < 5:
            agg[1] += 1
            agg[2] += c
        else:
            agg[3] += c
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["privacy_small_cell"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per_type)
    for et, (nc, sc, sr, rr) in per_type.items():
        g = got[et]
        assert (
            g["n_cells"],
            g["suppressed_cells"],
            g["suppressed_rows"],
            g["released_rows"],
        ) == (nc, sc, sr, rr)
        assert g["released_milli"] == rr * 1000 // (sr + rr)


def test_recall_curve_consistent_with_registered_ann_queries(spark):
    qs = entrymod.queries()
    bf = defaultdict(dict)
    for r in qs["ann_cosine_topk"](spark, SF).collect():
        bf[r["query_id"]][r["vec_id"]] = r["rank"]
    ivf = defaultdict(dict)
    for r in qs["ann_ivf_topk"](spark, SF).collect():
        ivf[r["query_id"]][r["vec_id"]] = r["rank"]
    got = {
        (r["query_id"], r["k"]): (r["hits"], r["recall_milli"])
        for r in qs["ann_recall_curve"](spark, SF).collect()
    }
    assert {q for q, _ in got} == set(bf)
    for q in bf:
        for k in (1, 5, 10):
            hits = sum(
                1
                for v, rk in bf[q].items()
                if rk <= k and ivf[q].get(v, 99) <= k
            )
            assert got[(q, k)] == (hits, hits * 1000 // k)
            # recall can never exceed 1000 milli
            assert got[(q, k)][1] <= 1000
