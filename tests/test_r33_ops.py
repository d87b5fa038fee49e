"""Round-8 batch 6: python replays for exact DTW and survivorship."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_dtw_replays_classic_dp(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in rows:
        if r["event_type"] in ("view", "purchase"):
            day = int(r["ts"].timestamp() // 86400)
            daily[(r["event_type"], day)] += round(r["value"] * 100)
    a = [c for (t, _), c in sorted(daily.items()) if t == "view"]
    b = [c for (t, _), c in sorted(daily.items()) if t == "purchase"]
    inf = 1 << 60
    prev = [0] + [inf] * len(b)
    for i in range(1, len(a) + 1):
        cur = [inf] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            cur[j] = abs(a[i - 1] - b[j - 1]) + min(
                prev[j], cur[j - 1], prev[j - 1]
            )
        prev = cur
    got = entrymod.queries()["ts_dtw_exact"](spark, SF).collect()[0]
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    assert got["dtw_cents"] == prev[len(b)]
    # DTW lower bound: |sum(a) - sum(b)| <= dtw is NOT a valid bound,
    # but dtw >= |a[0]-b[0]| and dtw >= |a[-1]-b[-1]| always hold
    # (the path must match both endpoint pairs)
    assert got["dtw_cents"] >= abs(a[0] - b[0])
    assert got["dtw_cents"] >= abs(a[-1] - b[-1])


def test_survivorship_field_rules(spark):
    custs = spark.read.parquet(f"{SF}/customer.parquet").collect()
    got = {
        r["entity"]: (r["name"], r["bal_cents"], r["segment"],
                      r["n_records"])
        for r in entrymod.queries()["er_survivorship"](spark, SF).collect()
    }
    want = {}
    for c in custs:
        k = c["c_custkey"]
        if k % 10 != 0:
            continue
        # v1 (rec_ts = k%5+1, version 1) always wins name: upper-cased
        name = c["c_name"].upper()
        # balance: v1 wins unless its balance is NULL (k%3==0) -> v0
        bal = (
            round(c["c_acctbal"] * 100)
            if k % 3 == 0
            else round(c["c_acctbal"] * 100) + 1000
        )
        # segment exists only on v0
        want[k] = (name, bal, c["c_mktsegment"], 2)
    assert got == want
