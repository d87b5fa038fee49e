"""Round-9 batch 3: python replays for gap-fill, winsorized mean, and
blocking stats."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _daily_cents(rows):
    daily = defaultdict(int)
    for r in rows:
        day = int(r["ts"].timestamp() * 1_000_000) // 86_400_000_000
        daily[(r["event_type"], day)] += round(r["value"] * 100)
    return daily


def test_gap_fill_replays(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    # collect() returns naive datetimes in session tz; recompute from
    # the query itself being UTC-keyed is avoided by using utctimetuple
    import calendar

    daily = defaultdict(int)
    for r in rows:
        us = calendar.timegm(r["ts"].utctimetuple()) * 1_000_000 + r[
            "ts"
        ].microsecond
        daily[(r["event_type"], us // 86_400_000_000)] += round(
            r["value"] * 100
        )
    by_type = defaultdict(dict)
    for (et, day), cents in daily.items():
        by_type[et][day] = cents
    expected = {}
    for et, series in by_type.items():
        lo, hi = min(series), max(series)
        cur = None
        for day in range(lo, hi + 1):
            if day in series:
                cur = series[day]
                expected[(et, day)] = (cur, 0)
            else:
                expected[(et, day)] = (cur, 1)
    got = {
        (r["event_type"], r["day"]): (r["cents_filled"], r["was_gap"])
        for r in entrymod.queries()["ts_gap_fill_ffill"](
            spark, SF
        ).collect()
    }
    assert got == expected


def test_winsorized_mean_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(
            (round(r["value"] * 100), r["event_id"])
        )
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["ts_winsorized_mean"](
            spark, SF
        ).collect()
    }
    for et, items in by_type.items():
        items.sort()
        n = len(items)
        lo = items[(n - 1) * 5 // 100][0]
        hi = items[(n - 1) * 95 // 100][0]
        raw = sum(c for c, _ in items)
        win = sum(min(max(c, lo), hi) for c, _ in items)
        g = got[et]
        assert (g["n"], g["lo_cents"], g["hi_cents"]) == (n, lo, hi)
        assert g["raw_mean_micro"] == raw * 1_000_000 // n
        assert g["winsor_mean_micro"] == win * 1_000_000 // n
        # winsorized mean sits inside the clamp bounds
        assert lo * 1_000_000 <= g["winsor_mean_micro"] <= hi * 1_000_000


def test_blocking_stats_replays(spark):
    parts = spark.read.parquet(f"{SF}/part.parquet").collect()
    strategies = {
        "brand": lambda r: r["p_brand"],
        "tok1": lambda r: r["p_name"].split(" ")[0],
        "brand_tok1": lambda r: r["p_brand"]
        + "|"
        + r["p_name"].split(" ")[0],
        "size": lambda r: str(r["p_size"]),
    }
    got = {
        r["strategy"]: (r["n_blocks"], r["max_block"], r["candidate_pairs"])
        for r in entrymod.queries()["er_blocking_stats"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(strategies)
    for name, key in strategies.items():
        blocks = defaultdict(int)
        for r in parts:
            blocks[key(r)] += 1
        pairs = sum(c * (c - 1) // 2 for c in blocks.values())
        assert got[name] == (len(blocks), max(blocks.values()), pairs)
    # brand_tok1 must never produce more candidate pairs than either
    # of its component keys (finer blocking only removes pairs)
    assert got["brand_tok1"][2] <= min(got["brand"][2], got["tok1"][2])
