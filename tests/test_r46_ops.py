"""Round-9 batch 6: replays for linear SHAP, exact AUPRC, and blocking
recall."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_linear_shap_replays_from_ridge_weights(spark):
    qs = entrymod.queries()
    ridge = {
        r["l_linestatus"]: (r["b1_micro"], r["b2_micro"])
        for r in qs["ml_ridge_2feature"](spark, SF).collect()
    }
    rows = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    pts = defaultdict(list)
    for r in rows:
        pts[r["l_linestatus"]].append(
            (round(r["l_quantity"]), round(r["l_tax"] * 100))
        )
    got = {
        (r["l_linestatus"], r["feature"]): (
            r["weight_micro"],
            r["mean_abs_phi_micro"],
            r["share_milli"],
        )
        for r in qs["ml_linear_shap"](spark, SF).collect()
    }
    for grp, items in pts.items():
        n = len(items)
        m1 = sum(x for x, _ in items) // n
        m2 = sum(x for _, x in items) // n
        b1, b2 = ridge[grp]
        s1 = sum(abs(b1 * (x1 - m1)) for x1, _ in items)
        s2 = sum(abs(b2 * (x2 - m2)) for _, x2 in items)
        st = s1 + s2
        assert got[(grp, "quantity")] == (
            b1,
            s1 // n,
            s1 * 1000 // st if st else 0,
        )
        assert got[(grp, "tax_pct")] == (
            b2,
            s2 // n,
            s2 * 1000 // st if st else 0,
        )


def test_auprc_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    pts = [
        (round(r["value"] * 100), 1 if r["event_type"] == "purchase" else 0)
        for r in rows
    ]
    lo = min(c for c, _ in pts)
    hi = max(c for c, _ in pts)
    n, npos = len(pts), sum(y for _, y in pts)
    groups = defaultdict(lambda: [0, 0])
    for c, y in pts:
        p = 500000 if hi == lo else (c - lo) * 1000000 // (hi - lo)
        groups[p][0] += 1
        groups[p][1] += y
    tp = pred = 0
    ap_nano = 0
    for p in sorted(groups, reverse=True):
        n_k, pos_k = groups[p]
        tp += pos_k
        pred += n_k
        if pos_k > 0:
            ap_nano += pos_k * tp * 1_000_000_000 // (npos * pred)
    g = entrymod.queries()["ml_auprc_exact"](spark, SF).collect()[0]
    assert (g["n"], g["npos"], g["n_thresholds"], g["ap_nano"]) == (
        n,
        npos,
        len(groups),
        ap_nano,
    )
    # AP of any score on this data is bounded by (npos-weighted) sanity
    assert 0 < g["ap_nano"] <= 10**9


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_blocking_recall_replays_and_bounds_fuzzy_match(spark):
    parts = spark.read.parquet(f"{SF}/part.parquet").collect()
    keepers: dict = {}
    for r in parts:
        k = (r["p_brand"], r["p_name"])
        keepers[k] = min(keepers.get(k, r["p_partkey"]), r["p_partkey"])
    by_brand = defaultdict(list)
    for (brand, name), key in keepers.items():
        by_brand[brand].append((key, name))
    expected = {}
    for brand, items in by_brand.items():
        truth = found = 0
        for ka, na in items:
            for kb, nb in items:
                if ka < kb and _lev(na, nb) <= 3:
                    truth += 1
                    if na.split(" ")[0] == nb.split(" ")[0]:
                        found += 1
        if truth:
            expected[brand] = (truth, found, found * 1000 // truth)
    got = {
        r["p_brand"]: (r["n_truth"], r["n_found"], r["recall_milli"])
        for r in entrymod.queries()["er_blocking_recall"](
            spark, SF
        ).collect()
    }
    assert got == expected
    # the found pairs are exactly er_fuzzy_match's output universe
    fuzzy = entrymod.queries()["er_fuzzy_match"](spark, SF).collect()
    by_brand_fuzzy = defaultdict(int)
    for r in fuzzy:
        by_brand_fuzzy[r["p_brand"]] += 1
    for brand, (_, found, _) in expected.items():
        assert by_brand_fuzzy.get(brand, 0) == found
