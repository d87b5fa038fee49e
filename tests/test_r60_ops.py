"""Round-11 queue replays: global transitivity and dominant period
(module r60 sat behind the r10 certification window; these replicas are
the pre-certification evidence, the r40/r55 pattern — verdict r10 #2:
the queue pair shipped without unit tests, breaking the
every-operator-has-a-test invariant)."""

from __future__ import annotations

import calendar
from collections import defaultdict
from datetime import datetime, timezone

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def _trunc_div(a: int, b: int) -> int:
    """Spark `div` and DuckDB `//` truncate toward zero; Python floors."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_transitivity_replays(spark):
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
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    # each unordered triangle closes exactly 3 of its adjacent pairs
    closures = sum(len(adj[a] & adj[b]) for a, b in pairs)
    assert closures % 3 == 0
    triangles = closures // 3

    [g] = entrymod.queries()["graph_transitivity"](spark, SF).collect()
    assert g["n_nodes"] == len(adj)
    assert g["n_edges"] == len(pairs)
    assert g["wedges"] == wedges
    assert g["triangles"] == triangles
    expect = 0 if wedges == 0 else 3 * triangles * 1000 // wedges
    assert g["transitivity_milli"] == expect
    # transitivity is a wedge-closure fraction: 3T <= wedges always
    assert 0 <= g["transitivity_milli"] <= 1000
    # the data must exercise the metric, not vacuously pass on an
    # empty graph
    assert wedges > 0


def test_dominant_period_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in rows:
        daily[(r["event_type"], _day(r["ts"]))] += round(r["value"] * 100)
    series = defaultdict(dict)
    for (et, day), cents in daily.items():
        series[et][day] = cents

    got = {
        r["event_type"]: r
        for r in entrymod.queries()["ts_dominant_period"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(series)
    for et, by_day in series.items():
        n = len(by_day)
        s = sum(by_day.values())
        u = {day: n * c - s for day, c in by_day.items()}
        den = sum(x * x for x in u.values())
        nums = {}
        for lag in range(1, 15):
            pairs = [
                (ua, u[day + lag])
                for day, ua in u.items()
                if day + lag in u
            ]
            if pairs:  # lags with no aligned day pair produce no row
                nums[lag] = sum(a * b for a, b in pairs)
        best = min(nums, key=lambda l: (-nums[l], l))
        g = got[et]
        assert g["dominant_lag"] == best
        assert g["n_days"] == n
        # num can be negative: trunc toward zero, not Python floor
        expect = 0 if den == 0 else _trunc_div(nums[best] * 1000, den)
        assert g["acf_milli"] == expect
        assert -1000 <= g["acf_milli"] <= 1000


def test_dominant_period_tie_and_constant_series(spark, tmp_path):
    """Seeded fixture: a constant daily series has u_t = 0 everywhere, so
    every lag ties at num = 0 — the tie rule must pick lag 1 — and
    den = 0 must report acf_milli 0, not divide. A second type with an
    exact period-3 square wave must report dominant_lag 3."""
    rows = []
    for day in range(30):
        ts = datetime.fromtimestamp(day * 86_400 + 3600, tz=timezone.utc)
        rows.append((day, ts, 1, "flat", 5.0, "{}"))
        # period-3 signal: 9, 1, 1, 9, 1, 1, ...
        rows.append(
            (100 + day, ts, 2, "wave", 9.0 if day % 3 == 0 else 1.0, "{}")
        )
    df = spark.createDataFrame(
        [
            {
                "event_id": eid,
                "ts": ts.replace(tzinfo=None),
                "user_id": uid,
                "event_type": et,
                "value": v,
                "props": p,
            }
            for eid, ts, uid, et, v, p in rows
        ]
    )
    fix = str(tmp_path / "r60fix")
    df.write.parquet(f"{fix}/events.parquet")
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["ts_dominant_period"](
            spark, fix
        ).collect()
    }
    assert got["flat"]["dominant_lag"] == 1  # all-tie -> smallest lag
    assert got["flat"]["acf_milli"] == 0  # den = 0 guard
    assert got["flat"]["n_days"] == 30
    assert got["wave"]["dominant_lag"] == 3
    assert got["wave"]["acf_milli"] > 0
