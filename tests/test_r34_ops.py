"""Round-8 batch 7: python replays for WoE/IV and seasonal strength."""

from __future__ import annotations

import math
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_woe_iv_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    scored = sorted(
        (
            (-round(r["value"] * 100), r["event_id"],
             1 if r["event_type"] == "purchase" else 0)
            for r in rows
        )
    )
    n = len(scored)
    bins = defaultdict(lambda: [0, 0])
    for rank, (_, _, pos) in enumerate(scored):
        d = rank * 10 // n
        bins[d][0] += 1
        bins[d][1] += pos
    tp = sum(p for _, p in bins.values())
    tn = sum(c - p for c, p in bins.values())
    iv_nano = 0
    woe_micro = {}
    for d, (c, p) in bins.items():
        neg = c - p
        woe = math.log(((p + 0.5) / tp) / ((neg + 0.5) / tn))

        def rnd(x):
            return (
                math.floor(x * 1e9 + 0.5)
                if x >= 0
                else -math.floor(-x * 1e9 + 0.5)
            )

        woe_micro[d] = _tdiv(rnd(woe), 1000)
        iv_nano += rnd(((p + 0.5) / tp - (neg + 0.5) / tn) * woe)
    got = {
        r["decile"]: (r["n"], r["pos"], r["woe_micro"], r["iv_micro"])
        for r in entrymod.queries()["ml_woe_iv"](spark, SF).collect()
    }
    for d, (c, p) in bins.items():
        assert got[d] == (c, p, woe_micro[d], _tdiv(iv_nano, 1000))


def _tdiv(a: int, b: int) -> int:
    return -((-a) // b) if a < 0 else a // b


def test_seasonal_strength_replays_and_bounded(spark):
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
        det = []
        for i in range(len(pts)):
            win = pts[max(0, i - 3): i + 4]
            if len(win) == 7 and i >= 3 and i + 3 < len(pts):
                d7 = 7 * pts[i][1] - sum(c for _, c in win)
                det.append((pts[i][0] % 7, d7))
        seas = defaultdict(lambda: [0, 0])
        for dow, d7 in det:
            seas[dow][0] += d7
            seas[dow][1] += 1
        xs, rs = [], []
        for dow, d7 in det:
            sd7, nd = seas[dow]
            xs.append(d7 * 1000)
            rs.append(d7 * 1000 - _tdiv(sd7 * 1000, nd))
        m = len(xs)
        vd = m * sum(x * x for x in xs) - sum(xs) ** 2
        vr = m * sum(x * x for x in rs) - sum(rs) ** 2
        if vd == 0 or vr >= vd:
            s = 0
        else:
            s = 1000000 - vr * 1000000 // vd
        want[et] = (m, s)
    got = {
        r["event_type"]: (r["n_days"], r["strength_micro"])
        for r in entrymod.queries()["ts_seasonal_strength"](
            spark, SF
        ).collect()
    }
    assert got == want
    for _, s in got.values():
        assert 0 <= s <= 1000000
