"""Round-11 batch 4 replays: fold stability, label-shift weights,
ESS weight clipping, and the streaming PSI monitor."""

from __future__ import annotations

import calendar
import hashlib
import math
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def test_fold_stability_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    pts = [
        (
            r["event_id"],
            round(r["value"] * 100),
            1 if r["event_type"] == "purchase" else 0,
        )
        for r in rows
    ]
    cents = sorted(c for _, c, _ in pts)
    n = len(cents)
    # lower median: smallest value with 2*cum >= n
    cum = 0
    med = None
    from collections import Counter

    for v, c in sorted(Counter(cents).items()):
        cum += c
        if 2 * cum >= n:
            med = v
            break
    per = defaultdict(lambda: [0, 0])
    for eid, c, y in pts:
        h = hashlib.md5(f"foldstab|{eid}".encode()).hexdigest()[:15]
        fold = int(h, 16) % 5
        per[fold][0] += 1
        per[fold][1] += 1 if (c > med) == (y == 1) else 0
    accs = {f: nc * 1000 // nn for f, (nn, nc) in per.items()}
    spread = max(accs.values()) - min(accs.values())
    got = {
        r["fold"]: r
        for r in entrymod.queries()["ml_fold_stability"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    for f, (nn, nc) in per.items():
        g = got[f]
        assert g["n"] == nn
        assert g["n_correct"] == nc
        assert g["acc_milli"] == accs[f]
        assert g["spread_milli"] == spread


def test_label_shift_weights_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    weeks = [(_day(r["ts"]) // 7, r["event_type"]) for r in rows]
    wmin = min(w for w, _ in weeks)
    wmax = max(w for w, _ in weeks)
    cut = (wmin + wmax) // 2 + 1
    tr = defaultdict(int)
    te = defaultdict(int)
    for w, et in weeks:
        (tr if w < cut else te)[et] += 1
    nt, ne = sum(tr.values()), sum(te.values())
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["ml_label_shift_weights"](
            spark, SF
        ).collect()
    }
    assert set(got) == {et for _, et in weeks}
    for et in got:
        g = got[et]
        assert g["n_train"] == tr[et]
        assert g["n_test"] == te[et]
        assert g["train_share_milli"] == (
            0 if nt == 0 else tr[et] * 1000 // nt
        )
        assert g["test_share_milli"] == (
            0 if ne == 0 else te[et] * 1000 // ne
        )
        expect_w = (
            0
            if tr[et] == 0 or ne == 0
            else te[et] * nt * 1_000_000 // (tr[et] * ne)
        )
        assert g["weight_micro"] == expect_w
    # the weights average to ~1 under the test mix: sanity bound
    assert any(g["weight_micro"] > 0 for g in got.values())


def test_ess_weight_clip_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    ws = sorted(r["n_chars"] for r in docs)
    n = len(ws)
    # exact distinct-value p95: smallest w with 100*cum >= 95*n
    from collections import Counter

    cum = 0
    cap = None
    for v, c in sorted(Counter(ws).items()):
        cum += c
        if 100 * cum >= 95 * n:
            cap = v
            break
    per = defaultdict(list)
    for r in docs:
        per[r["lang"]].append(r["n_chars"])
    got = {
        r["lang"]: r
        for r in entrymod.queries()["p_ess_weight_clip"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    for lang, vals in per.items():
        wc = [min(v, cap) for v in vals]
        nn = len(vals)
        sw, sw2 = sum(vals), sum(v * v for v in vals)
        swc, swc2 = sum(wc), sum(v * v for v in wc)
        g = got[lang]
        assert g["n"] == nn
        assert g["n_clipped"] == sum(1 for v in vals if v > cap)
        assert g["ess_raw_milli"] == (
            0 if sw2 == 0 else sw * sw * 1000 // (nn * sw2)
        )
        assert g["ess_clipped_milli"] == (
            0 if swc2 == 0 else swc * swc * 1000 // (nn * swc2)
        )
        # clipping can only concentrate weights toward uniform
        assert g["ess_clipped_milli"] >= g["ess_raw_milli"]
        assert g["ess_clipped_milli"] <= 1000


def test_stream_psi_monitor_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    cents = [round(r["value"] * 100) for r in rows]
    lo, hi, n_ref = min(cents), max(cents), len(cents)

    def _bin(c):
        b = 5 if hi == lo else (c - lo) * 10 // (hi - lo)
        return min(b, 9)

    expected = defaultdict(int)
    for c in cents:
        expected[_bin(c)] += 1
    per_day = defaultdict(lambda: defaultdict(int))
    for r in rows:
        per_day[_day(r["ts"])][_bin(round(r["value"] * 100))] += 1
    got = {
        _day(r["day"]): r
        for r in entrymod.queries()["stream_psi_monitor"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per_day)
    for day, bins in per_day.items():
        n_day = sum(bins.values())
        psi = 0.0
        for b in range(10):
            a_s = (bins.get(b, 0) + 0.5) / (n_day + 5.0)
            e_s = (expected.get(b, 0) + 0.5) / (n_ref + 5.0)
            psi += (a_s - e_s) * math.log(a_s / e_s)
        g = got[day]
        assert g["n"] == n_day
        # one float ln per bin, milli-snapped on both sides: allow the
        # same +-1 milli slop the PSI family's replays use
        assert abs(g["psi_milli"] - round(psi * 1000)) <= 1
        assert g["psi_milli"] >= 0 or n_day < 10


# --- batch 5 ---------------------------------------------------------------


def _tokens(text: str) -> list[str]:
    import re as _re

    return [
        t for t in _re.split("[^a-z0-9]+", (text or "").lower()) if t
    ]


def test_prefix_clusters_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    sizes = defaultdict(int)
    n_keyed = 0
    for r in docs:
        t = _tokens(r["text"])
        if len(t) >= 8:
            sizes[" ".join(t[:8])] += 1
            n_keyed += 1
    hist = defaultdict(int)
    for sz in sizes.values():
        hist[sz] += 1
    got = {
        r["cluster_size"]: r
        for r in entrymod.queries()["dedup_prefix_clusters"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(hist)
    for sz, cnt in hist.items():
        assert got[sz]["n_clusters"] == cnt
        assert got[sz]["n_docs"] == sz * cnt
    assert sum(r["n_docs"] for r in got.values()) == n_keyed


def test_edge_source_mix_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    keepers = (
        exact_dedup(docs_df, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in docs_df.select("doc_id", "source").collect()
    }
    per = defaultdict(lambda: [0, 0])  # source -> [within, cross]
    for a, b in pairs:
        for u, v in ((a, b), (b, a)):
            if src[u] == src[v]:
                per[src[u]][0] += 1
            else:
                per[src[u]][1] += 1
    got = {
        r["source"]: r
        for r in entrymod.queries()["dedup_edge_source_mix"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    for s, (w, c) in per.items():
        g = got[s]
        assert g["n_edges_directed"] == w + c
        assert g["n_within"] == w
        assert g["n_cross"] == c
        assert g["within_milli"] == w * 1000 // (w + c)


def test_oov_rate_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    train_counts = defaultdict(int)
    for r in docs:
        if r["doc_id"] % 2 == 0:
            for t in _tokens(r["text"]):
                train_counts[t] += 1
    vocab = {
        t
        for t, _ in sorted(
            train_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:1000]
    }
    per = defaultdict(lambda: [0, 0])
    for r in docs:
        if r["doc_id"] % 2 != 0:
            for t in _tokens(r["text"]):
                per[r["lang"]][0] += 1
                if t not in vocab:
                    per[r["lang"]][1] += 1
    got = {
        r["lang"]: r
        for r in entrymod.queries()["text_oov_rate"](
            spark, SF
        ).collect()
    }
    assert set(got) == {
        lang for lang, (n, _) in per.items() if n > 0
    }
    for lang, (n, oov) in per.items():
        if n == 0:
            continue
        g = got[lang]
        assert g["n_tokens"] == n
        assert g["n_oov"] == oov
        assert g["oov_milli"] == oov * 1000 // n
        assert g["vocab_size"] == len(vocab)
