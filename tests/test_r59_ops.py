"""Round-10 batch 4: python replays for the dup-rate trend, repeat
revenue, embedding isotropy, and the streaming ECE monitor."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from decimal import Decimal

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def test_dup_rate_trend_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    first = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        fp = hashlib.md5(" ".join(_tokens(r["text"])).encode()).hexdigest()
        first.setdefault(fp, r["doc_id"])
    lo = min(r["doc_id"] for r in docs)
    hi = max(r["doc_id"] for r in docs)
    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        fp = hashlib.md5(" ".join(_tokens(r["text"])).encode()).hexdigest()
        dec = min((r["doc_id"] - lo) * 10 // (hi - lo + 1), 9)
        agg[dec][0] += 1
        agg[dec][1] += r["doc_id"] > first[fp]
    got = {
        r["decile"]: r
        for r in entrymod.queries()["dq_dup_rate_trend"](spark, SF).collect()
    }
    assert set(got) == set(range(10))
    for dec in range(10):
        n, d = agg.get(dec, [0, 0])
        g = got[dec]
        assert g["n_docs"] == n
        assert g["n_dups"] == d
        assert g["dup_milli"] == (d * 1000 // n if n else 0)


def test_repeat_revenue_replays(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    rows = [
        (
            r["o_custkey"],
            r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1,
            int(Decimal(str(r["o_totalprice"])).quantize(Decimal("0.01")) * 100),
        )
        for r in orders
    ]
    first = {}
    for ck, m, _ in rows:
        first[ck] = min(first.get(ck, m), m)
    agg = defaultdict(lambda: [0, 0, set(), set()])
    for ck, m, cents in rows:
        a = agg[m]
        if m == first[ck]:
            a[0] += cents
            a[2].add(ck)
        else:
            a[1] += cents
            a[3].add(ck)
    got = {
        r["month_idx"]: r
        for r in entrymod.queries()["rel_repeat_revenue"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(agg)
    for m, (new, rep, nc, rc) in agg.items():
        g = got[m]
        assert g["new_rev_cents"] == new
        assert g["repeat_rev_cents"] == rep
        assert g["n_new_customers"] == len(nc)
        assert g["n_repeat_customers"] == len(rc)
        assert g["repeat_share_milli"] == rep * 1000 // (new + rep)


def test_embedding_isotropy_replays(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = [list(r["embedding"]) for r in rows]
    n = len(vecs)
    dim = len(vecs[0])
    units = []
    for v in vecs:
        nrm = math.sqrt(sum(float(x) * float(x) for x in v))
        units.append(
            [Decimal(str(round(float(x) / nrm, 9))) for x in v]
        )
    S = [sum(u[d] for u in units) for d in range(dim)]
    s2 = float(sum(x * x for x in S))
    t = float(sum(x * x for u in units for x in u))
    [g] = entrymod.queries()["ml_embedding_isotropy"](spark, SF).collect()
    assert g["n_vectors"] == n
    assert g["dim"] == dim
    assert abs(g["sumvec_norm2"] - round(s2, 4)) < 1e-6
    assert abs(g["avg_pair_cos"] - round((s2 - t) / (n * (n - 1)), 6)) < 2e-6


def test_stream_ece_monitor_replays(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    cents = [int(round(r["value"] * 100)) for r in events]
    lo, hi = min(cents), max(cents)
    days = defaultdict(lambda: defaultdict(lambda: [0, 0, 0]))
    for r, c in zip(events, cents):
        day = r["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        p = 500000 if hi == lo else (c - lo) * 1000000 // (hi - lo)
        b = days[day][min(p // 100000, 9)]
        b[0] += 1
        b[1] += p
        b[2] += r["event_type"] == "purchase"
    got = {
        r["day"]: r
        for r in entrymod.queries()["stream_ece_monitor"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(days)
    for day, bins in days.items():
        n = sum(b[0] for b in bins.values())
        pos = sum(b[2] for b in bins.values())
        ece = sum(abs(b[1] - 1000000 * b[2]) for b in bins.values()) // n
        g = got[day]
        assert g["n"] == n
        assert g["pos"] == pos
        assert g["ece_micro"] == ece
