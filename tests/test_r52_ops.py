"""Round-9 batch 12: replays for growth accounting and McNemar."""

from __future__ import annotations

import calendar
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def test_growth_accounting_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    weeks = defaultdict(set)  # user -> {weeks}
    for r in rows:
        weeks[r["user_id"]].add(_day(r["ts"]) // 7)
    stats = defaultdict(lambda: [0, 0, 0, 0])  # w -> active/new/ret/res
    prev_active = defaultdict(int)  # w -> actives of w-1 re-keyed
    for u, ws in weeks.items():
        sw = sorted(ws)
        for i, w in enumerate(sw):
            s = stats[w]
            s[0] += 1
            if i == 0:
                s[1] += 1
            elif sw[i - 1] == w - 1:
                s[2] += 1
            else:
                s[3] += 1
            prev_active[w + 1] += 1
    got = {
        r["week"]: r
        for r in entrymod.queries()["rel_growth_accounting"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(stats)
    for w, (act, new, ret, res) in stats.items():
        g = got[w]
        churn = prev_active.get(w, 0) - ret
        assert (
            g["n_active"],
            g["n_new"],
            g["n_retained"],
            g["n_resurrected"],
        ) == (act, new, ret, res)
        assert g["n_churned"] == churn
        assert g["quick_ratio_milli"] == (
            0 if churn == 0 else (new + res) * 1000 // churn
        )
        # the classification partitions the actives
        assert act == new + ret + res
    # every week's actives are accounted for as next week's
    # retained + churned
    for w in stats:
        nxt = got.get(w + 1)
        if nxt is not None:
            assert stats[w][0] == nxt["n_retained"] + nxt["n_churned"]


def test_mcnemar_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    pts = []
    for r in rows:
        cents = round(r["value"] * 100)
        y = 1 if r["event_type"] == "purchase" else 0
        pred_b = 1 if _day(r["ts"]) % 7 >= 5 else 0
        pts.append((cents, y, pred_b))
    lo = min(c for c, *_ in pts)
    hi = max(c for c, *_ in pts)
    cells = [0, 0, 0, 0]  # both_right, b, c, both_wrong
    acc_a = acc_b = 0
    for cents, y, pb in pts:
        if hi == lo:
            pa = 1
        else:
            pa = 1 if (cents - lo) * 1000000 // (hi - lo) >= 500000 else 0
        ra, rb = pa == y, pb == y
        acc_a += ra
        acc_b += rb
        if ra and rb:
            cells[0] += 1
        elif ra:
            cells[1] += 1
        elif rb:
            cells[2] += 1
        else:
            cells[3] += 1
    n = len(pts)
    g = entrymod.queries()["ml_mcnemar_test"](spark, SF).collect()[0]
    assert g["n"] == n
    assert (g["both_right"], g["b"], g["c"], g["both_wrong"]) == tuple(
        cells
    )
    assert g["acc_a_micro"] == acc_a * 1_000_000 // n
    assert g["acc_b_micro"] == acc_b * 1_000_000 // n
    b, c = cells[1], cells[2]
    assert g["mcnemar_milli"] == (
        0 if b + c == 0 else (b - c) * (b - c) * 1000 // (b + c)
    )
    # the 2x2 table partitions the dataset
    assert sum(cells) == n
