"""Round-12 batch 1 replays: cross-modal dedup evidence, split repair,
the ANN Pareto frontier, and the watermark advisor — independent Python
replicas at sf0.001 (the per-batch evidence discipline)."""

from __future__ import annotations

import calendar
import hashlib
import re
from collections import defaultdict

import numpy as np

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _is_holdout(doc_id: int) -> bool:
    h = hashlib.md5(f"contam|{doc_id}".encode()).hexdigest()[:12]
    return int(h, 16) % 20 == 0


def test_cross_modal_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    tdocs = set()
    for r in (
        simhash_pairs(keepers, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    ):
        tdocs |= {r["doc_a"], r["doc_b"]}
    idocs = set()
    for r in entrymod.queries()["mm_phash_near_dup"](
        spark, SF
    ).collect():
        idocs |= {int(r["img_a"]), int(r["img_b"])}
    universe = {
        r["doc_id"]
        for r in docs.select("doc_id").collect()
        if r["doc_id"] % 10 == 0
    }
    cells = defaultdict(int)
    for d in universe:
        cells[(int(d in tdocs), int(d in idocs))] += 1
    got = {
        (r["text_dup"], r["image_dup"]): r
        for r in entrymod.queries()["dedup_cross_modal"](
            spark, SF
        ).collect()
    }
    assert set(got) == {(a, b) for a in (0, 1) for b in (0, 1)}
    n_images = len(universe)
    for key, g in got.items():
        assert g["n_docs"] == cells.get(key, 0), key
        expect = (
            0 if n_images == 0 else cells.get(key, 0) * 1000 // n_images
        )
        assert g["share_milli"] == expect, key
    assert sum(r["n_docs"] for r in got.values()) == n_images
    # the fixture must exercise the metric: image near-dups exist (the
    # synthetic twins), so at least one image_dup=1 cell is non-empty
    assert (
        got[(0, 1)]["n_docs"] + got[(1, 1)]["n_docs"] > 0
    )


def test_split_repair_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    grams = {}
    src = {}
    hold = {}
    for r in docs:
        t = _tokens(r["text"])
        grams[r["doc_id"]] = {
            " ".join(t[i : i + 8]) for i in range(len(t) - 7)
        }
        src[r["doc_id"]] = r["source"]
        hold[r["doc_id"]] = _is_holdout(r["doc_id"])
    train_sh = set()
    for d, gs in grams.items():
        if not hold[d]:
            train_sh |= gs
    df = defaultdict(int)
    for d, gs in grams.items():
        for g in gs:
            df[g] += 1
    contam = {
        d for d, gs in grams.items() if hold[d] and gs & train_sh
    }
    pool = {
        d
        for d, gs in grams.items()
        if not hold[d] and all(df[g] <= 1 for g in gs)
    }
    per = defaultdict(lambda: [0, 0, 0])
    for d in grams:
        s = src[d]
        if hold[d]:
            per[s][0] += 1
            if d in contam:
                per[s][1] += 1
        elif d in pool:
            per[s][2] += 1
    got = {
        r["source"]: r
        for r in entrymod.queries()["dq_split_repair"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    for s, (nh, nc, np_) in per.items():
        g = got[s]
        assert g["n_holdout"] == nh
        assert g["n_contaminated"] == nc
        assert g["n_pool"] == np_
        assert g["n_promote"] == min(nc, np_)
        assert g["n_residual"] == nc - min(nc, np_)
        assert g["post_holdout"] == nh - nc + min(nc, np_)
    # the fixture must exercise the metric: contamination exists (same
    # fixture leaks as dq_contamination_by_source) and a swap pool too
    assert any(g["n_contaminated"] > 0 for g in got.values())
    assert any(g["n_pool"] > 0 for g in got.values())


def _cos(Q, C):
    return (Q @ C.T) / np.outer(
        np.linalg.norm(Q, axis=1), np.linalg.norm(C, axis=1)
    )


def test_pareto_frontier_replays(spark):
    rows = sorted(
        spark.read.parquet(f"{SF}/embeddings.parquet").collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array(
        [[float(x) for x in r["embedding"]] for r in rows],
        dtype=np.float64,
    )
    qm = ids < 5
    cm = ids < 8
    qids = ids[qm]
    C = M[cm]
    cids = ids[cm]
    # corpus -> cell (round-9 DESC, cid ASC) and query probe order
    S = np.round(_cos(M, C), 9)
    assign = {}
    for i, vid in enumerate(ids):
        best = min(
            range(len(cids)), key=lambda j: (-S[i, j], cids[j])
        )
        assign[vid] = cids[best]
    probes = {}
    for qi, qid in enumerate(qids):
        row = S[qm][qi]
        order = sorted(
            range(len(cids)), key=lambda j: (-row[j], cids[j])
        )
        probes[qid] = [cids[j] for j in order]
    # truth: raw brute top-10 keys
    truth_rank = {}
    raw_cos = np.round(_cos(M[qm], M), 9)
    for qi, qid in enumerate(qids):
        scored = sorted(
            (
                (-raw_cos[qi, ci], ids[ci])
                for ci in range(len(ids))
                if ids[ci] != qid
            )
        )[:10]
        for vid in (v for _, v in scored):
            truth_rank[(qid, vid)] = 1
    # SQ8 reconstruction (the certified codec recipe)
    mn, mx = M.min(0), M.max(0)
    span = np.where(mx > mn, mx - mn, 1.0)
    ratio = np.where(mx > mn, np.round((M - mn) / span, 9), 0.0)
    codes = np.round(ratio * 255).astype(int)
    sq8 = mn + codes / 255.0 * (mx - mn)
    recon = {"raw": M, "sq8": sq8}
    n_brute = len(qids) * (len(ids) - 1)
    got = {
        (r["codec"], r["nprobe"]): r
        for r in entrymod.queries()["ann_pareto_frontier"](
            spark, SF
        ).collect()
    }
    assert set(got) == {
        (c, n) for c in ("raw", "sq8") for n in (1, 2, 4)
    }
    for np_ in (1, 2, 4):
        cand = {
            qid: [
                vid
                for vid in ids
                if vid != qid and assign[vid] in probes[qid][:np_]
            ]
            for qid in qids
        }
        n_scored = sum(len(v) for v in cand.values())
        for codec, R in recon.items():
            hits = 0
            for qi, qid in enumerate(qids):
                cv = R[np.isin(ids, cand[qid])]
                cvids = ids[np.isin(ids, cand[qid])]
                if len(cvids) == 0:
                    continue
                cc = np.round(
                    _cos(M[qm][qi : qi + 1], cv)[0], 9
                )
                top = sorted(
                    ((-cc[j], cvids[j]) for j in range(len(cvids)))
                )[:10]
                hits += sum(
                    1
                    for _, vid in top
                    if (qid, vid) in truth_rank
                )
            g = got[(codec, np_)]
            assert g["n_scored"] == n_scored, (codec, np_)
            assert g["hits"] == hits, (codec, np_)
            # denominator counted from the truth set, not hardcoded
            # 5x10 (advisor r12 #3)
            n_truth = len(truth_rank)
            assert g["recall_milli"] == hits * 1000 // n_truth
            scan = n_scored * 1000 // n_brute
            assert g["scan_share_milli"] == scan
            expect_eff = (
                0
                if n_scored == 0
                else (hits * 1000 // n_truth) * 1000 // scan
            )
            assert g["recall_per_scan_milli"] == expect_eff
    # monotonicity invariants of the frontier itself
    for codec in ("raw", "sq8"):
        r1, r2, r4 = (
            got[(codec, n)]["recall_milli"] for n in (1, 2, 4)
        )
        assert r1 <= r2 <= r4
    # recall is bounded by the panel's truth volume (5 queries x k=10)
    assert all(r["hits"] <= 50 for r in got.values())
    # both codecs share one candidate generation: identical scan ledger
    for n in (1, 2, 4):
        assert (
            got[("raw", n)]["n_scored"] == got[("sq8", n)]["n_scored"]
        )


def _us(ts) -> int:
    return (
        calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    )


def test_watermark_advisor_replays(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type = defaultdict(list)
    for r in events:
        by_type[r["event_type"]].append((r["event_id"], _us(r["ts"])))
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["stream_watermark_advisor"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(by_type)
    for et, rows in by_type.items():
        rows.sort()
        gaps = [
            (rows[i][1] - rows[i - 1][1] + 999_999) // 1_000_000
            for i in range(1, len(rows))
        ]
        n = len(gaps)
        idx = (99 * n + 99) // 100
        p99 = sorted(gaps)[idx - 1]
        days = defaultdict(int)
        for _, x in rows:
            days[x // 86_400_000_000] += 1
        dx = list(days.values())
        nd, sx = len(dx), sum(dx)
        qx = sum(v * v for v in dx)
        fano = 0 if nd * sx == 0 else (nd * qx - sx * sx) * 1000 // (nd * sx)
        wm = ((p99 + 59) // 60) * 60 * (2 if fano > 2000 else 1)
        beyond = sum(1 for s in gaps if s > wm)
        g = got[et]
        assert g["n_gaps"] == n
        assert g["fano_milli"] == fano
        assert g["p99_gap_s"] == p99
        assert g["idle_timeout_s"] == wm
        assert g["n_beyond"] == beyond
        assert g["beyond_milli"] == (
            0 if n == 0 else beyond * 1000 // n
        )
    # the fixture must exercise the metric: real silences exist, and
    # the recommended timeout is finite and positive
    assert any(g["p99_gap_s"] > 0 for g in got.values())
    assert all(g["idle_timeout_s"] > 0 for g in got.values())
