"""Round-8 batch: python replays for the scoring-rule / ranking /
survival / reconciliation / drift operators, independent of the DuckDB
oracle gate (these recompute the semantics from raw parquet rows)."""

from __future__ import annotations

import math
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").collect()


def test_brier_log_loss_replays(spark):
    rows = _events(spark)
    cents = [round(r["value"] * 100) for r in rows]
    ys = [1 if r["event_type"] == "purchase" else 0 for r in rows]
    lo, hi, n = min(cents), max(cents), len(cents)
    sq = 0
    ll = 0
    for c, y in zip(cents, ys):
        p = 500000 if hi == lo else (c - lo) * 1000000 // (hi - lo)
        sq += (p - y * 1000000) ** 2
        p1 = min(max(p, 1), 999999)
        t = -math.log(p1 / 1000000.0) if y else -math.log(
            (1000000 - p1) / 1000000.0
        )
        # mirror the engines' pre-sum nano rounding (half away from zero;
        # all terms are positive here so round-half-up matches)
        ll += math.floor(t * 1e9 + 0.5)
    got = entrymod.queries()["ml_brier_log_loss"](spark, SF).collect()[0]
    assert got["n"] == n
    assert got["brier_e12"] == sq // n
    assert got["log_loss_micro"] == ll // (n * 1000)


def test_ndcg_replays(spark):
    rows = _events(spark)
    spend = defaultdict(int)
    rel = defaultdict(int)
    for r in rows:
        spend[(r["event_type"], r["user_id"])] += round(r["value"] * 100)
        if r["event_type"] == "purchase":
            rel[r["user_id"]] += 1
    per_type = defaultdict(list)
    for (et, uid), s in spend.items():
        per_type[et].append((uid, s, rel.get(uid, 0)))
    want = {}
    for et, users in per_type.items():
        by_spend = sorted(users, key=lambda t: (-t[1], t[0]))[:10]
        by_rel = sorted(users, key=lambda t: (-t[2], t[0]))[:10]
        dcg = sum(
            r * math.log(2.0) / math.log(i + 2)
            for i, (_, _, r) in enumerate(by_spend)
        )
        idcg = sum(
            r * math.log(2.0) / math.log(i + 2)
            for i, (_, _, r) in enumerate(by_rel)
        )
        nd = 0.0 if idcg == 0 else round(round(dcg / idcg, 9), 6)
        want[et] = (len(users), round(round(dcg, 9), 6),
                    round(round(idcg, 9), 6), nd)
    got = {
        r["event_type"]: (
            r["n_users"], r["dcg_at10"], r["idcg_at10"], r["ndcg_at10"]
        )
        for r in entrymod.queries()["ml_ndcg_exact"](spark, SF).collect()
    }
    assert got == want
    for _, _, _, nd in got.values():
        assert 0.0 <= nd <= 1.0


def test_survival_km_replays(spark):
    rows = _events(spark)
    first, last, purch = {}, {}, {}
    for r in rows:
        day = int(r["ts"].timestamp() // 86400)
        u = r["user_id"]
        first[u] = min(first.get(u, day), day)
        last[u] = max(last.get(u, day), day)
        if r["event_type"] == "purchase":
            purch[u] = min(purch.get(u, day), day)
    obs = [
        (purch[u] - first[u], 1) if u in purch else (last[u] - first[u], 0)
        for u in first
    ]
    n_at_risk = len(obs)
    surv = 1.0
    want = {}
    for t in sorted({d for d, _ in obs}):
        d_t = sum(1 for dur, ev in obs if dur == t and ev)
        m_t = sum(1 for dur, _ in obs if dur == t)
        if d_t > 0:
            surv *= (n_at_risk - d_t) / n_at_risk
            want[t] = (n_at_risk, d_t, surv)
        n_at_risk -= m_t
    got = {
        r["t_days"]: (r["n_risk"], r["n_events"], r["survival"])
        for r in entrymod.queries()["ml_survival_km"](spark, SF).collect()
    }
    assert set(got) == set(want)
    prev = 1.0
    for t in sorted(got):
        nr, d, s = got[t]
        assert (nr, d) == (want[t][0], want[t][1])
        assert abs(s - want[t][2]) < 1e-6
        assert s <= prev + 1e-12  # survival is non-increasing
        prev = s


def test_kappa_mcc_consistent_with_confusion_metrics(spark):
    cm = entrymod.queries()["ml_confusion_metrics"](spark, SF).collect()[0]
    got = entrymod.queries()["ml_kappa_mcc"](spark, SF).collect()[0]
    tp, fp, fn, tn = cm["tp"], cm["fp"], cm["fn"], cm["tn"]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    n = tp + fp + fn + tn
    x = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    knum, kden = n * (tp + tn) - x, n * n - x
    want_kappa = (
        0
        if kden == 0
        else (
            -((-knum * 1000000) // kden)
            if knum < 0
            else (knum * 1000000) // kden
        )
    )
    assert got["kappa_micro"] == want_kappa
    den = math.sqrt(
        float(tp + fp) * float(tp + fn) * (float(tn + fp) * float(tn + fn))
    )
    want_mcc = 0.0 if den == 0 else round(
        round((float(tp) * tn - float(fp) * fn) / den, 9), 6
    )
    assert got["mcc"] == want_mcc
    assert -1.0 <= got["mcc"] <= 1.0


def test_reconciliation_partitions_all_orders(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    micro4 = defaultdict(int)
    for r in li:
        micro4[r["l_orderkey"]] += (
            round(r["l_extendedprice"] * 100)
            * (100 - round(r["l_discount"] * 100))
            * (100 + round(r["l_tax"] * 100))
        )
    want = defaultdict(lambda: [0, 0])
    for o in orders:
        k = o["o_orderkey"]
        if k not in micro4:
            want[(2, 0)][0] += 1
            continue
        diff = round(o["o_totalprice"] * 100) - micro4[k] // 10000
        sign = 0 if diff == 0 else (1 if diff > 0 else -1)
        digits = 0 if diff == 0 else len(str(abs(diff)))
        w = want[(sign, digits)]
        w[0] += 1
        w[1] += abs(diff)
    got = {
        (r["sign"], r["digits"]): [r["n_orders"], r["sum_abs_diff_cents"]]
        for r in entrymod.queries()["dq_reconciliation"](spark, SF).collect()
    }
    assert got == dict(want)
    assert sum(v[0] for v in got.values()) == len(orders)


def test_embedding_drift_replays(spark):
    import numpy as np

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    cells = defaultdict(lambda: [0, 0, 0, 0])  # (label,pos) -> se,so,ne,no
    for r in rows:
        half = r["vec_id"] % 2
        for pos, v in enumerate(r["embedding"]):
            q = int(np.floor(float(v) * 1000000 + 0.5)) if float(
                v
            ) >= 0 else -int(np.floor(-float(v) * 1000000 + 0.5))
            c = cells[(r["label"], pos)]
            if half == 0:
                c[0] += q
                c[2] += 1
            else:
                c[1] += q
                c[3] += 1
    per_label = defaultdict(list)
    for (lab, pos), (se, so, ne, no) in cells.items():
        if ne > 0 and no > 0:
            per_label[lab].append((pos, se * no - so * ne, ne * no, ne, no))
    want = {}
    for lab, items in per_label.items():
        den = items[0][2]
        l1 = sum(abs(d) for _, d, _, _, _ in items)
        mx = max(abs(d) * 64 + 63 - pos for pos, d, _, _, _ in items)
        want[lab] = (
            items[0][3],
            items[0][4],
            den,
            l1,
            mx // 64,
            63 - mx % 64,
        )
    got = {
        r["label"]: (
            r["n_even"], r["n_odd"], r["den"], r["l1_drift_num"],
            r["max_abs_diff_num"], r["max_dim"],
        )
        for r in entrymod.queries()["dq_embedding_drift"](spark, SF).collect()
    }
    assert got == want


def test_rolling_median_replays(spark):
    rows = _events(spark)
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
            win = sorted(c2 for _, c2 in pts[max(0, i - 6): i + 1])
            s = len(win)
            want[(et, day)] = (
                c, s, win[(s - 1) // 2] + win[s // 2]
            )
    got = {
        (r["event_type"], r["day"]): (
            r["cents"], r["n_in_window"], r["med_x2"]
        )
        for r in entrymod.queries()["ts_rolling_median"](spark, SF).collect()
    }
    assert got == want


def test_deeplab_roundtrip_matches_closed_form(spark):
    got = entrymod.queries()["k6_deeplab_export"](spark, SF).collect()
    assert got, "no masks produced"
    for r in got:
        i = int(r["image_id"])
        assert i % 20 == 0
        car = (3 + i % 3) ** 2
        ped = (3 + i % 2) * (3 + i % 4)
        assert (r["height"], r["width"]) == (24, 32)
        assert (r["car_px"], r["ped_px"], r["bg_px"]) == (
            car, ped, 768 - car - ped
        )
