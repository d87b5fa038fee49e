"""Round-8 batch 2: python replays and invariants for isotonic
calibration, DP release, TF-IDF kNN, windowed funnel, bipartite
projection, and the NN-resize roundtrip."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_isotonic_is_monotone_and_mass_preserving(spark):
    rows = entrymod.queries()["ml_isotonic_decile"](spark, SF).collect()
    assert len(rows) == 10
    by_d = sorted(rows, key=lambda r: r["decile"])
    iso = [r["iso_rate_micro"] for r in by_d]
    assert iso == sorted(iso), "isotonic fit must be nondecreasing"
    # PAV preserves the total positive mass inside each pooled block:
    # sum over bins of n * iso_rate equals sum of n * raw_rate up to the
    # floor-division granularity (1 micro per bin per pooling boundary)
    tot_iso = sum(r["n"] * r["iso_rate_micro"] for r in by_d)
    tot_raw = sum(r["npos"] * 1000000 for r in by_d)
    assert abs(tot_iso - tot_raw) <= sum(r["n"] for r in by_d) * 2
    # replay PAV directly (stack algorithm) and compare pooled rates
    blocks: list[tuple[int, int]] = []  # (y, n)
    for r in by_d:
        y, n = r["npos"], r["n"]
        blocks.append((y, n))
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            y2, n2 = blocks.pop()
            y1, n1 = blocks.pop()
            blocks.append((y1 + y2, n1 + n2))
    # expand pooled blocks back to per-bin values using the bin sizes
    idx = 0
    pooled = []
    sizes = [r["n"] for r in by_d]
    for y, n in blocks:
        covered = 0
        while covered < n:
            covered += sizes[idx]
            pooled.append((y * 10**12 // n) // 10**6)
            idx += 1
    assert pooled == iso


def test_dp_counts_replays_and_noise_is_bounded(spark):
    rows = entrymod.queries()["privacy_dp_counts"](spark, SF).collect()
    assert len(rows) == 5
    two48 = 281474976710656
    for r in rows:
        h = hashlib.md5(f"dp-eps1|{r['event_type']}".encode()).hexdigest()
        s = 2 * int(h[:12], 16) + 1 - two48
        t = (-1.0 if s >= 0 else 1.0) * math.log((two48 - abs(s)) / two48)
        want = math.floor(t * 1e6 + 0.5) if t >= 0 else -math.floor(
            -t * 1e6 + 0.5
        )
        assert r["noise_micro"] == want
        assert r["noisy_micro"] == r["n"] * 1000000 + want
        # eps=1 Laplace: |noise| beyond 20 has probability ~2e-9
        assert abs(r["noise_micro"]) < 20_000_000


def test_tfidf_knn_replays(spark):
    import re

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n_docs = len(docs)
    tf: dict[tuple[int, str], int] = defaultdict(int)
    for d in docs:
        for tok in re.split(r"[^a-z0-9]+", d["text"].lower()):
            if tok:
                tf[(d["doc_id"], tok)] += 1
    df: dict[str, int] = defaultdict(int)
    for (_, term) in tf:
        df[term] += 1
    w = {
        (doc, term): cnt
        * round(math.log((n_docs + 1.0) / (df[term] + 1.0)) * 1000)
        for (doc, term), cnt in tf.items()
        if df[term] <= 100
    }
    norm: dict[int, int] = defaultdict(int)
    for (doc, _), wt in w.items():
        norm[doc] += wt * wt
    postings: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for (doc, term), wt in w.items():
        postings[term].append((doc, wt))
    dots: dict[tuple[int, int], int] = defaultdict(int)
    for term, plist in postings.items():
        plist.sort()
        for i in range(len(plist)):
            for j in range(i + 1, len(plist)):
                (a, wa), (b, wb) = plist[i], plist[j]
                dots[(a, b)] += wa * wb
    want: dict[int, list[tuple[int, int, int]]] = defaultdict(list)
    for (a, b), dot in dots.items():
        c_ab = dot * dot * 1000000 // (norm[a] * norm[b])
        want[a].append((-c_ab, b, dot))
        want[b].append((-c_ab, a, dot))
    top = {}
    for doc, cands in want.items():
        for rnk, (negc, nb, dot) in enumerate(sorted(cands)[:3], 1):
            top[(doc, nb)] = (dot, -negc, rnk)
    got = {
        (r["doc_id"], r["neighbor_id"]): (
            r["dot"], r["cos2_micro"], r["rnk"]
        )
        for r in entrymod.queries()["text_tfidf_knn"](spark, SF).collect()
    }
    assert got == top


def test_funnel_windowed_replays(spark):
    week = 7 * 86_400_000_000
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(
            (int(r["ts"].timestamp() * 1_000_000), r["event_type"])
        )
    nv = nc = np_ = 0
    for evs in by_user.values():
        views = [t for t, e in evs if e == "view"]
        if not views:
            continue
        nv += 1
        v = min(views)
        clicks = [t for t, e in evs if e == "click" and v <= t <= v + week]
        if not clicks:
            continue
        nc += 1
        c = min(clicks)
        if any(e == "purchase" and c <= t <= c + week for t, e in evs):
            np_ += 1
    got = {
        r["step"]: (r["stage"], r["n_users"], r["conv_from_prev_micro"])
        for r in entrymod.queries()["rel_funnel_windowed"](
            spark, SF
        ).collect()
    }
    assert got[1] == ("view", nv, 1000000)
    assert got[2] == ("click_7d", nc, nc * 1000000 // nv if nv else 0)
    assert got[3] == (
        "purchase_7d", np_, np_ * 1000000 // nc if nc else 0
    )


def test_bipartite_project_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    ctxs = defaultdict(set)
    for r in rows:
        day = int(r["ts"].timestamp() // 86400)
        ctxs[(r["event_type"], day)].add(r["user_id"])
    weights = defaultdict(int)
    for users in ctxs.values():
        if not (2 <= len(users) <= 50):
            continue
        us = sorted(users)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                weights[(us[i], us[j])] += 1
    want = sorted(
        ((w, u, v) for (u, v), w in weights.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = [
        (r["shared_contexts"], r["u"], r["v"])
        for r in entrymod.queries()["graph_bipartite_project"](
            spark, SF
        ).collect()
    ]
    assert sorted(got, key=lambda t: (-t[0], t[1], t[2])) == want


def test_resize_nn_matches_closed_form(spark):
    got = entrymod.queries()["mm_resize_nn"](spark, SF).collect()
    assert got
    for r in got:
        i = int(r["image_id"])
        y0, hc = 1 + i % 5, 3 + i % 3
        x0, wc = 1 + i % 11, 3 + i % 3
        y1, hp = 12 + i % 7, 3 + i % 2
        x1, wp = 17 + i % 9, 3 + i % 4
        rows_c = (y0 + hc - 1) // 2 - (y0 + 1) // 2 + 1
        cols_c = (x0 + wc - 1) // 2 - (x0 + 1) // 2 + 1
        rows_p = (y1 + hp - 1) // 2 - (y1 + 1) // 2 + 1
        cols_p = (x1 + wp - 1) // 2 - (x1 + 1) // 2 + 1
        assert (r["height"], r["width"]) == (12, 16)
        assert r["car_px"] == rows_c * cols_c
        assert r["ped_px"] == rows_p * cols_p
