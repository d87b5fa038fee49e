"""Round-8 batch 3: python replays for the Hampel filter, Wilson CI,
largest-remainder allocation, and URL parsing."""

from __future__ import annotations

import math
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_hampel_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in rows:
        day = int(r["ts"].timestamp() // 86400)
        daily[(r["event_type"], day)] += round(r["value"] * 100)
    series = defaultdict(list)
    for (et, day), c in sorted(daily.items()):
        series[et].append((day, c))
    want = {}
    for et, pts in series.items():
        for i, (day, c) in enumerate(pts):
            win = sorted(v for _, v in pts[max(0, i - 6): i + 1])
            s = len(win)
            med2 = win[(s - 1) // 2] + win[s // 2]
            dwin = sorted(abs(2 * v - med2) for v in win)
            mad4 = dwin[(s - 1) // 2] + dwin[s // 2]
            out = 1 if 20000 * abs(2 * c - med2) > 44478 * mad4 else 0
            want[(et, day)] = (c, med2, mad4, out)
    got = {
        (r["event_type"], r["day"]): (
            r["cents"], r["med_x2"], r["mad_x4"], r["is_outlier"]
        )
        for r in entrymod.queries()["ts_hampel_outliers"](
            spark, SF
        ).collect()
    }
    assert got == want


def test_wilson_replays_and_brackets_p(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        a = agg[r["event_type"]]
        a[0] += 1
        if r["value"] > 100:
            a[1] += 1
    got = entrymod.queries()["ab_wilson_ci"](spark, SF).collect()
    assert len(got) == len(agg)
    for r in got:
        n, x = agg[r["event_type"]]
        assert (r["n"], r["x"]) == (n, x)
        assert r["p_micro"] == x * 1000000 // n
        p = x / n
        zz = 3.8415 / n
        half = 1.9600 * math.sqrt(p * (1.0 - p) / n + zz / (4.0 * n))
        lo = round(round((p + zz / 2.0 - half) / (1.0 + zz), 9), 6)
        hi = round(round((p + zz / 2.0 + half) / (1.0 + zz), 9), 6)
        assert abs(r["wilson_lo"] - lo) < 1e-9
        assert abs(r["wilson_hi"] - hi) < 1e-9
        assert r["wilson_lo"] <= p <= r["wilson_hi"]
        assert 0.0 <= r["wilson_lo"] and r["wilson_hi"] <= 1.0


def test_largest_remainder_reconciles_and_replays(spark):
    orders = {
        r["o_orderkey"]: round(r["o_totalprice"] * 100)
        for r in spark.read.parquet(f"{SF}/orders.parquet").collect()
        if r["o_orderkey"] % 100 == 0
    }
    lines = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if r["l_orderkey"] % 100 == 0 and r["l_orderkey"] in orders:
            lines[r["l_orderkey"]].append(
                (r["l_linenumber"], round(r["l_extendedprice"] * 100))
            )
    want = {}
    for ok, items in lines.items():
        total = orders[ok]
        se = sum(e for _, e in items)
        # per-ROW replay: synthetic lineitem repeats (orderkey,
        # linenumber), so bumps must be assigned by rank, not by a
        # line-number set (the original set-based replay over-bumped)
        base = [
            (total * e // se, (total * e) % se, ln, e)
            for ln, e in items
        ]
        rem = total - sum(fl for fl, _, _, _ in base)
        order = sorted(
            range(len(base)),
            key=lambda i: (-base[i][1], base[i][2], base[i][3]),
        )
        allocs = [fl for fl, _, _, _ in base]
        for i in order[:rem]:
            allocs[i] += 1
        want[ok] = (
            len(items), total, sum(allocs), max(allocs), min(allocs)
        )
    got = {
        r["o_orderkey"]: (
            r["n_items"], r["total_cents"], r["sum_alloc_cents"],
            r["max_alloc_cents"], r["min_alloc_cents"],
        )
        for r in entrymod.queries()["rel_largest_remainder"](
            spark, SF
        ).collect()
    }
    assert got == want
    for _, total, sa, _, _ in got.values():
        assert sa == total  # the whole point: exact reconciliation


def test_url_parse_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    agg = defaultdict(lambda: [0, set(), set(), set(), 0])
    for d in docs:
        i = d["doc_id"]
        host = f"{d['source']}.example.com"
        a = agg[host]
        a[0] += 1
        a[1].add(f"/docs/{d['lang']}/{i}")
        a[2].add(f"id={i % 7}&page={i % 3}")
        a[3].add(f"sec{i % 2}")
        a[4] += i % 7
    got = {
        r["host"]: (
            r["n_docs"], r["n_paths"], r["n_queries"],
            r["n_fragments"], r["sum_q_id"],
        )
        for r in entrymod.queries()["fn_url_parse"](spark, SF).collect()
    }
    want = {
        h: (a[0], len(a[1]), len(a[2]), len(a[3]), a[4])
        for h, a in agg.items()
    }
    assert got == want
