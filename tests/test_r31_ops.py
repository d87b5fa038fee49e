"""Round-8 batch 4: python replays for lag features, sliding WAU, and
hash-collision accounting."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

WEEK_US = 7 * 86_400_000_000


def test_lag_features_replays_and_never_leaks(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (
                int(r["ts"].timestamp() * 1_000_000),
                r["event_id"],
                r["event_type"],
                round(r["value"] * 100),
            )
        )
    want = {}
    for evs in by_user.values():
        for us, eid, _, _ in evs:
            if eid % 50 != 0:
                continue
            prior = [e for e in evs if e[0] < us]
            in7 = [
                e
                for e in prior
                if e[0] >= us - WEEK_US and e[2] == "purchase"
            ]
            want[eid] = (
                len(in7), sum(e[3] for e in in7), len(prior)
            )
    got = {
        r["event_id"]: (
            r["n_purch_7d"], r["sum_purch_cents_7d"], r["n_events_before"]
        )
        for r in entrymod.queries()["ml_lag_features"](spark, SF).collect()
    }
    assert got == want


def test_wau_sliding_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    active = {
        (r["user_id"], int(r["ts"].timestamp() // 86400)) for r in rows
    }
    hi = max(d for _, d in active)
    wau = defaultdict(set)
    dau = defaultdict(set)
    for u, d in active:
        dau[d].add(u)
        for a in range(d, min(d + 6, hi) + 1):
            wau[a].add(u)
    got = {
        r["day"]: (r["dau"], r["wau"], r["stickiness_micro"])
        for r in entrymod.queries()["rel_wau_sliding"](spark, SF).collect()
    }
    want = {
        a: (
            len(dau.get(a, set())),
            len(us),
            len(dau.get(a, set())) * 1000000 // len(us),
        )
        for a, us in wau.items()
    }
    assert got == want
    # WAU >= DAU always
    for d, w, _ in got.values():
        assert w >= d


def test_hash_collisions_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    vocab = set()
    for d in docs:
        vocab.update(
            t for t in re.split(r"[^a-z0-9]+", d["text"].lower()) if t
        )
    got = {
        r["k"]: (r["n_terms"], r["n_buckets_used"], r["collision_rate_micro"])
        for r in entrymod.queries()["ml_hash_collisions"](
            spark, SF
        ).collect()
    }
    for k in (8, 12, 16):
        buckets = {
            int(hashlib.md5(f"feat|{t}".encode()).hexdigest()[:12], 16)
            % (1 << k)
            for t in vocab
        }
        n, used = len(vocab), len(buckets)
        assert got[k] == (n, used, (n - used) * 1000000 // n)
    # wider tables can only reduce collisions
    assert got[8][2] >= got[12][2] >= got[16][2]
