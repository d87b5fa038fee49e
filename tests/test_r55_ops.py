"""Round-10 queue replays: calibration drift and vocabulary growth
(module r55 sits behind the certification window; these replicas are
the pre-certification evidence, the r40 pattern)."""

from __future__ import annotations

import calendar
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def test_calibration_drift_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    pts = [
        (
            round(r["value"] * 100),
            1 if r["event_type"] == "purchase" else 0,
            _day(r["ts"]) // 7,
        )
        for r in rows
    ]
    wmin = min(w for *_, w in pts)
    wmax = max(w for *_, w in pts)
    cut = (wmin + wmax) // 2 + 1
    train = [(c, y) for c, y, w in pts if w < cut]
    lo = min(c for c, _ in train)
    hi = max(c for c, _ in train)
    bins = defaultdict(lambda: [0, 0, 0, 0, 0])  # nt, spt, post, ne, pose
    for c, y, w in pts:
        p = 500000 if hi == lo else (c - lo) * 1000000 // (hi - lo)
        p = min(p, 999999)
        b = bins[min(max(p, 0) // 100000, 9)]
        if w < cut:
            b[0] += 1
            b[1] += p
            b[2] += y
        else:
            b[3] += 1
            b[4] += y
    nt = sum(b[0] for b in bins.values())
    ne = sum(b[3] for b in bins.values())
    ece_train = (
        sum(abs(b[1] - 1000000 * b[2]) for b in bins.values()) // nt
    )
    ece_test = (
        sum(
            0
            if b[3] == 0
            else abs(b[1] * b[3] // max(b[0], 1) - 1000000 * b[4])
            for b in bins.values()
        )
        // ne
    )
    got = {
        r["bin"]: r
        for r in entrymod.queries()["ml_calibration_drift"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(bins)
    for bkt, (bnt, spt, post, bne, pose) in bins.items():
        g = got[bkt]
        assert (g["n_train"], g["pos_train"]) == (bnt, post)
        assert (g["n_test"], g["pos_test"]) == (bne, pose)
        assert g["conf_train_micro"] == (0 if bnt == 0 else spt // bnt)
        assert g["acc_train_micro"] == (
            0 if bnt == 0 else post * 1000000 // bnt
        )
        assert g["acc_test_micro"] == (
            0 if bne == 0 else pose * 1000000 // bne
        )
        assert g["ece_train_micro"] == ece_train
        assert g["ece_test_micro"] == ece_test


def test_vocab_growth_replays(spark):
    docs = sorted(
        spark.read.parquet(f"{SF}/documents.parquet").collect(),
        key=lambda r: r["doc_id"],
    )
    lo = min(r["doc_id"] for r in docs)
    hi = max(r["doc_id"] for r in docs)
    seen = set()
    dec_tokens = defaultdict(int)
    dec_new = defaultdict(int)
    for r in docs:
        decile = min((r["doc_id"] - lo) * 10 // (hi - lo + 1), 9)
        toks = [
            t
            for t in re.split("[^a-z0-9]+", (r["text"] or "").lower())
            if t
        ]
        dec_tokens[decile] += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                dec_new[decile] += 1
    got = {
        r["decile"]: r
        for r in entrymod.queries()["text_vocab_growth"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(range(10))  # every decile emits a row
    cum_t = cum_v = 0
    for d in range(10):
        cum_t += dec_tokens[d]
        cum_v += dec_new[d]
        g = got[d]
        assert g["new_types"] == dec_new[d]
        assert g["cum_tokens"] == cum_t
        assert g["cum_types"] == cum_v
    # endpoint agrees with the lexical-diversity totals
    total_types = len(seen)
    assert got[9]["cum_types"] == total_types
    ld = entrymod.queries()["text_lexical_diversity"](spark, SF).collect()
    assert got[9]["cum_tokens"] == sum(r["n_tokens"] for r in ld)
