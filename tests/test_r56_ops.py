"""Round-10 batch 1: python replays for semantic contamination,
skip-gram decontamination, packing efficiency, drift reweighting, and
recall@k."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


def test_contamination_semantic_replays(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    emb = {r["vec_id"]: list(r["embedding"]) for r in rows}
    label = {r["vec_id"]: r["label"] for r in rows}
    cents = [(i, emb[i]) for i in sorted(emb) if i < 8]

    def ranked_cells(v, n):
        scored = sorted(
            ((round(_cos(v, cv), 9), cid) for cid, cv in cents),
            key=lambda t: (-t[0], t[1]),
        )
        return [cid for _, cid in scored[:n]]

    cell = {
        i: ranked_cells(v, 1)[0]
        for i, v in emb.items()
        if i % 20 != 7
    }
    by_cell = defaultdict(list)
    for i, c in cell.items():
        by_cell[c].append(i)
    expected = defaultdict(lambda: [0, 0])
    for i, v in emb.items():
        if i % 20 != 7:
            continue
        contam = any(
            round(_cos(v, emb[j]), 9) >= 0.3
            for c in ranked_cells(v, 2)
            for j in by_cell.get(c, [])
        )
        expected[label[i]][0] += 1
        expected[label[i]][1] += contam
    got = {
        r["label"]: r
        for r in entrymod.queries()["dq_contamination_semantic"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(expected)
    for lb, (nh, nc) in expected.items():
        assert got[lb]["n_holdout"] == nh
        assert got[lb]["n_contam"] == nc
        assert got[lb]["contam_milli"] == nc * 1000 // nh


def test_decontam_skipgram_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n = 13
    train_ex: set[str] = set()
    train_sk: set[str] = set()
    evals = []
    for r in docs:
        t = _tokens(r["text"])
        ex = {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}
        sk = {
            " ".join(t[i : i + 7] + ["#"] + t[i + 8 : i + 14])
            for i in range(len(t) - 13)
        }
        if _h48(f"decon|{r['doc_id']}") % 25 == 0:
            evals.append((r["source"], ex, sk))
        else:
            train_ex |= ex
            train_sk |= sk
    expected = defaultdict(lambda: [0, 0, 0, 0, 0])
    for src, ex, sk in evals:
        hx = bool(ex & train_ex)
        hk = bool(sk & train_sk)
        e = expected[src]
        e[0] += 1
        e[1] += hx
        e[2] += hk
        e[3] += hk and not hx
        e[4] += hx or hk
    got = {
        r["source"]: r
        for r in entrymod.queries()["dq_decontam_skipgram"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(expected)
    for src, (ne, nx, nk, nso, nany) in expected.items():
        g = got[src]
        assert g["n_eval"] == ne
        assert g["n_exact_hit"] == nx
        assert g["n_skip_hit"] == nk
        assert g["n_skip_only"] == nso
        assert g["flagged_milli"] == nany * 1000 // ne


def _packed_bins():
    return 512, 8


def test_packing_efficiency_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    budget, shards = _packed_bins()
    groups = defaultdict(list)
    for r in docs:
        n_tok = len(_tokens(r["text"]))
        if n_tok == 0:
            continue
        pri = _h48(f"pack|{r['doc_id']}")
        groups[(r["lang"], pri % shards)].append((pri, r["doc_id"], n_tok))
    # per (lang, shard, bin): fill, nseg, sum seg^2
    bins = defaultdict(lambda: [0, 0, 0])
    for (lang, shard), docs_ in groups.items():
        cum = 0
        for pri, did, n_tok in sorted(docs_):
            start, cum = cum, cum + n_tok
            for b in range(start // budget, (cum - 1) // budget + 1):
                seg = min(cum, (b + 1) * budget) - max(start, b * budget)
                entry = bins[(lang, shard, b)]
                entry[0] += seg
                entry[1] += 1
                entry[2] += seg * seg
    expected = defaultdict(lambda: [0, 0, 0, 0, 0])
    for (lang, _shard, _b), (fill, nseg, ss) in bins.items():
        e = expected[lang]
        e[0] += 1
        e[1] += nseg
        e[2] += budget - fill
        e[3] += (fill * fill - ss) // 2
        e[4] += fill * (fill - 1) // 2
    got = {
        r["lang"]: r
        for r in entrymod.queries()["text_packing_efficiency"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(expected)
    for lang, (nb, nseg, pad, cross, tot) in expected.items():
        g = got[lang]
        assert g["n_bins"] == nb
        assert g["n_segments"] == nseg
        assert g["seg_per_bin_milli"] == nseg * 1000 // nb
        assert g["pad_tokens"] == pad
        assert g["cross_pairs"] == cross
        assert g["cross_share_micro"] == cross * 1000000 // tot


def test_drift_reweight_replays(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    rows = [
        (
            r["event_type"],
            int(round(r["value"] * 100)),
            int(r["ts"].timestamp() * 1_000_000) // 86400000000 // 7,
        )
        for r in events
    ]
    ws = [w for _, _, w in rows]
    cut = (min(ws) + max(ws)) // 2 + 1
    tr_cents = [c for _, c, w in rows if w < cut]
    lo, hi = min(tr_cents), max(tr_cents)
    hist = defaultdict(lambda: [[0] * 10, [0] * 10])
    for t, c, w in rows:
        b = min(max((c - lo) * 10 // (hi - lo + 1), 0), 9)
        hist[t][w >= cut][b] += 1
    g_total = sum(sum(h[0]) for h in hist.values())
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["p_drift_reweight"](spark, SF).collect()
    }
    assert set(got) == set(hist)
    for t, (tr, te) in hist.items():
        n_tr, n_te = sum(tr), sum(te)
        psi = sum(
            ((tr[b] + 0.5) / (n_tr + 5.0) - (te[b] + 0.5) / (n_te + 5.0))
            * math.log(
                ((tr[b] + 0.5) / (n_tr + 5.0))
                / ((te[b] + 0.5) / (n_te + 5.0))
            )
            for b in range(10)
        )
        psi_milli = int(round(round(psi * 1000, 0)))
        share = n_tr * 1000000 // g_total
        g = got[t]
        assert g["n_train"] == n_tr
        assert g["n_test"] == n_te
        assert g["share_micro"] == share
        assert abs(g["psi_milli"] - psi_milli) <= 1  # float vs JVM ln ulp
        assert g["weight_micro"] == 10**15 // (
            max(share, 1) * (1000 + max(g["psi_milli"], 0))
        )


def test_recall_at_k_replays(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    emb = [(r["vec_id"], list(r["embedding"]), r["label"]) for r in rows]
    n_label = defaultdict(int)
    for _, _, lb in emb:
        n_label[lb] += 1
    expected = defaultdict(lambda: [0, 0, 0])  # n_queries, hits, sum_rec
    for qid, qv, ql in emb:
        if qid >= 200:
            continue
        scored = sorted(
            (
                (-round(_cos(qv, cv), 9), cid, cl)
                for cid, cv, cl in emb
                if cid != qid
            ),
        )
        for k in (5, 10):
            hits = sum(1 for _, _, cl in scored[:k] if cl == ql)
            denom = n_label[ql] - 1
            rec = hits * 1000000 // denom if denom > 0 else 0
            e = expected[(ql, k)]
            e[0] += 1
            e[1] += hits
            e[2] += rec
    got = {
        (r["label"], r["k"]): r
        for r in entrymod.queries()["ml_recall_at_k"](spark, SF).collect()
    }
    assert set(got) == set(expected)
    for key, (nq, nh, sr) in expected.items():
        g = got[key]
        assert g["n_queries"] == nq
        assert g["n_hits"] == nh
        assert g["recall_macro_micro"] == sr // nq
