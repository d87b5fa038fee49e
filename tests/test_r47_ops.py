"""Round-9 batch 7: replays for pinball loss, lexical diversity, and
the cost-optimal threshold."""

from __future__ import annotations

import calendar
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def test_pinball_loss_replays_and_matches_mase_at_q50(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in rows:
        daily[(r["event_type"], _day(r["ts"]))] += round(r["value"] * 100)
    expected = {}
    sums_abs = defaultdict(lambda: [0, 0])  # per type: n, sum|diff|
    for (et, day), cents in daily.items():
        prev = daily.get((et, day - 7))
        if prev is None:
            continue
        diff = cents - prev
        for q in (50, 90):
            loss = q * diff if diff >= 0 else (q - 100) * diff
            n, s = expected.get((et, q), (0, 0))
            expected[(et, q)] = (n + 1, s + loss)
        sums_abs[et][0] += 1
        sums_abs[et][1] += abs(diff)
    got = {
        (r["event_type"], r["q"]): (
            r["n"],
            r["sum_loss_centi"],
            r["mean_loss_micro"],
        )
        for r in entrymod.queries()["ts_pinball_loss"](spark, SF).collect()
    }
    assert set(got) == set(expected)
    for key, (n, s) in expected.items():
        assert got[key] == (n, s, s * 10000 // n)
    # q=50 pinball is half the absolute error: 2 * sum_loss = 100 * sum|d|
    mase = {
        r["event_type"]: (r["n7"], r["s7"])
        for r in entrymod.queries()["ts_mase"](spark, SF).collect()
    }
    for et, (n, sabs) in sums_abs.items():
        assert got[(et, 50)][1] * 2 == 100 * sabs
        if et in mase:  # ts_mase only reports types with both lags
            assert mase[et] == (n, sabs)


def test_lexical_diversity_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    counts = defaultdict(lambda: defaultdict(int))
    for r in docs:
        for t in re.split("[^a-z0-9]+", (r["text"] or "").lower()):
            if t:
                counts[r["lang"]][t] += 1
    got = {
        r["lang"]: r
        for r in entrymod.queries()["text_lexical_diversity"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(counts)
    for lang, toks in counts.items():
        n_tokens = sum(toks.values())
        n_types = len(toks)
        hapax = sum(1 for c in toks.values() if c == 1)
        g = got[lang]
        assert (g["n_tokens"], g["n_types"], g["n_hapax"]) == (
            n_tokens,
            n_types,
            hapax,
        )
        assert g["ttr_micro"] == n_types * 1_000_000 // n_tokens
        assert g["hapax_milli"] == hapax * 1000 // n_types


def test_cost_threshold_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    pts = [
        (round(r["value"] * 100), 1 if r["event_type"] == "purchase" else 0)
        for r in rows
    ]
    lo = min(c for c, _ in pts)
    hi = max(c for c, _ in pts)
    npos = sum(y for _, y in pts)
    groups = defaultdict(lambda: [0, 0])
    for c, y in pts:
        p = 500000 if hi == lo else (c - lo) * 1000000 // (hi - lo)
        groups[p][0] += 1
        groups[p][1] += y
    tp = fp = 0
    best = None
    for p in sorted(groups, reverse=True):
        n_k, pos_k = groups[p]
        tp += pos_k
        fp += n_k - pos_k
        cost = 1 * fp + 5 * (npos - tp)
        # ties prefer the HIGHER threshold: strict < keeps the earlier p
        if best is None or cost < best[4]:
            best = (p, tp, fp, npos - tp, cost)
    g = entrymod.queries()["ml_cost_threshold"](spark, SF).collect()[0]
    assert (
        g["best_threshold_micro"],
        g["tp"],
        g["fp"],
        g["fn"],
        g["best_cost"],
    ) == best
    assert g["all_negative_cost"] == 5 * npos
    assert g["best_cost"] <= g["all_negative_cost"]
