"""Round-10 batch 2: python replays for fairness gaps, Brier
decomposition, per-group AUC, risk-coverage, and confident learning."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _scores(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    rows = [
        (
            int(round(r["value"] * 100)),
            1 if r["event_type"] == "purchase" else 0,
            r["user_id"],
        )
        for r in events
    ]
    lo = min(c for c, _, _ in rows)
    hi = max(c for c, _, _ in rows)
    return [
        (
            500000 if hi == lo else (c - lo) * 1000000 // (hi - lo),
            y,
            uid,
        )
        for c, y, uid in rows
    ]


def test_fairness_parity_replays(spark):
    scored = _scores(spark)
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, pos, predpos, tp
    for p, y, uid in scored:
        a = agg[uid % 5]
        pred = p >= 500000
        a[0] += 1
        a[1] += y
        a[2] += pred
        a[3] += pred and y
    rates = {}
    for c, (n, pos, pp, tp) in agg.items():
        rates[c] = (
            pp * 1000000 // n,
            tp * 1000000 // pos if pos else 0,
            (pp - tp) * 1000000 // (n - pos) if n - pos else 0,
        )
    dp = max(r[0] for r in rates.values()) - min(r[0] for r in rates.values())
    eo = max(
        max(r[1] for r in rates.values()) - min(r[1] for r in rates.values()),
        max(r[2] for r in rates.values()) - min(r[2] for r in rates.values()),
    )
    got = {
        r["cohort"]: r
        for r in entrymod.queries()["ml_fairness_parity"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(agg)
    for c, (n, pos, pp, tp) in agg.items():
        g = got[c]
        assert (g["n"], g["n_pos"], g["n_predpos"], g["tp"]) == (
            n,
            pos,
            pp,
            tp,
        )
        assert g["fp"] == pp - tp
        assert (g["sel_micro"], g["tpr_micro"], g["fpr_micro"]) == rates[c]
        assert g["dp_gap_micro"] == dp
        assert g["eo_gap_micro"] == eo


def test_brier_decomp_replays(spark):
    scored = _scores(spark)
    bins = defaultdict(lambda: [0, 0, 0])  # n, sum_p, pos
    for p, y, _ in scored:
        b = bins[min(p // 100000, 9)]
        b[0] += 1
        b[1] += p
        b[2] += y
    n = sum(b[0] for b in bins.values())
    pos = sum(b[2] for b in bins.values())
    base = pos * 1000000 // n
    rel = sum(
        (sp // nb - 1000000 * pb // nb) ** 2 * nb
        for nb, sp, pb in bins.values()
    ) // (n * 1000000)
    res = sum(
        (1000000 * pb // nb - base) ** 2 * nb for nb, sp, pb in bins.values()
    ) // (n * 1000000)
    unc = base * (1000000 - base) // 1000000
    [g] = entrymod.queries()["ml_brier_decomp"](spark, SF).collect()
    assert g["n"] == n
    assert g["base_micro"] == base
    assert g["rel_micro"] == rel
    assert g["res_micro"] == res
    assert g["unc_micro"] == unc
    assert g["brier_binned_micro"] == rel - res + unc


def test_auc_by_group_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    groups = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in docs:
        c = groups[r["source"]][r["n_chars"]]
        if r["lang"] == "en":
            c[0] += 1
        else:
            c[1] += 1
    got = {
        r["source"]: r
        for r in entrymod.queries()["ml_auc_by_group"](spark, SF).collect()
    }
    assert set(got) == set(groups)
    for src, by_score in groups.items():
        n_pos = sum(c[0] for c in by_score.values())
        n_neg = sum(c[1] for c in by_score.values())
        num, c0_below = 0, 0
        for score in sorted(by_score):
            c1, c0 = by_score[score]
            num += 2 * c0_below * c1 + c0 * c1
            c0_below += c0
        g = got[src]
        assert g["n_pos"] == n_pos
        assert g["n_neg"] == n_neg
        if n_pos and n_neg:
            assert g["auc"] == round(num / (2.0 * n_pos * n_neg), 6)
        else:
            assert g["auc"] == 0.0


def test_risk_coverage_replays(spark):
    scored = _scores(spark)
    n = len(scored)
    got = {
        r["thresh"]: r
        for r in entrymod.queries()["ml_risk_coverage"](spark, SF).collect()
    }
    assert set(got) == {500000, 600000, 700000, 800000, 900000}
    for t in got:
        kept = [
            (p >= 500000) == (y == 1)
            for p, y, _ in scored
            if max(p, 1000000 - p) >= t
        ]
        g = got[t]
        assert g["n_covered"] == len(kept)
        assert g["n_correct"] == sum(kept)
        assert g["coverage_micro"] == len(kept) * 1000000 // n
        assert g["acc_micro"] == (
            sum(kept) * 1000000 // len(kept) if kept else 0
        )


def test_confident_learning_replays(spark):
    scored = _scores(spark)
    pos = [p for p, y, _ in scored if y == 1]
    neg = [1000000 - p for p, y, _ in scored if y == 0]
    t1 = sum(pos) // max(len(pos), 1)
    t0 = sum(neg) // max(len(neg), 1)
    joint = defaultdict(int)
    for p, y, _ in scored:
        q1, q0 = p >= t1, 1000000 - p >= t0
        if q1 and q0:
            pred = 1 if p >= 1000000 - p else 0
        elif q1:
            pred = 1
        elif q0:
            pred = 0
        else:
            continue
        joint[(y, pred)] += 1
    total = sum(joint.values())
    noise = (
        sum(v for (y, p), v in joint.items() if y != p) * 1000000 // total
    )
    got = {
        (r["y"], r["pred"]): r
        for r in entrymod.queries()["ml_confident_learning"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(joint)
    for key, n in joint.items():
        g = got[key]
        assert g["n"] == n
        assert g["share_micro"] == n * 1000000 // total
        assert g["noise_micro"] == noise
