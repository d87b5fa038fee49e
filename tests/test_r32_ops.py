"""Round-8 batch 5: python replays for the clamped balance closed form,
streaming sliding WAU vs batch, and the salted skew join."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_clamped_balance_replays_sequential_fold(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    tx = defaultdict(int)
    for r in rows:
        day = int(r["ts"].timestamp() // 86400)
        c = round(r["value"] * 100)
        if r["event_type"] == "purchase":
            tx[(r["user_id"], day)] += c
        elif r["event_type"] == "error":
            tx[(r["user_id"], day)] -= c
        else:
            tx[(r["user_id"], day)] += 0
    series = defaultdict(list)
    for (u, d), a in sorted(tx.items()):
        series[u].append((d, a))
    want = {}
    for u, pts in series.items():
        if u % 10 != 0:
            continue
        bal = 0
        for d, a in pts:
            bal = max(bal + a, 0)  # the sequential definition
            want[(u, d)] = (a, bal)
    got = {
        (r["user_id"], r["day"]): (r["amount_cents"], r["balance_cents"])
        for r in entrymod.queries()["rel_clamped_balance"](
            spark, SF
        ).collect()
    }
    assert got == want
    assert all(b >= 0 for _, b in got.values())


def test_stream_sliding_wau_equals_batch(spark):
    batch = {
        r["day"]: r["wau"]
        for r in entrymod.queries()["rel_wau_sliding"](spark, SF).collect()
    }
    stream = {
        r["day"]: r["wau"]
        for r in entrymod.queries()["stream_sliding_wau"](
            spark, SF
        ).collect()
    }
    assert stream == batch


def test_salted_join_equals_plain_join(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    want = defaultdict(lambda: [0, 0])
    for r in rows:
        k = 0 if r["user_id"] % 10 < 7 else r["user_id"] % 10
        w = want[f"seg_{k}"]
        w[0] += 1
        w[1] += round(r["value"] * 100)
    got = {
        r["label"]: [r["n"], r["cents"]]
        for r in entrymod.queries()["j14_salted_join"](spark, SF).collect()
    }
    assert got == dict(want)
    # the hot key holds ~70% of the rows — the point of the salt
    assert got["seg_0"][0] > 0.5 * sum(n for n, _ in got.values())
