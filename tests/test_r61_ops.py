"""Round-11 batch 1 replays: per-source contamination attribution, the
token-budget water-filling solver, the codec recall curve, and the IVF
balance report."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import numpy as np

import __spark_entry__ as entrymod
from tests.test_r60_ops import _trunc_div

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _is_holdout(doc_id: int) -> bool:
    h = hashlib.md5(f"contam|{doc_id}".encode()).hexdigest()[:12]
    return int(h, 16) % 20 == 0


def test_contamination_by_source_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    hold_sh = set()
    hold_doc_sh = set()
    train_src = set()
    train_sources = set()
    for r in docs:
        t = _tokens(r["text"])
        grams = {
            " ".join(t[i : i + 8]) for i in range(len(t) - 7)
        }
        if _is_holdout(r["doc_id"]):
            hold_sh |= grams
            hold_doc_sh |= {(r["doc_id"], g) for g in grams}
        else:
            train_sources.add(r["source"])
            train_src |= {(r["source"], g) for g in grams}
    hits = {(s, g) for s, g in train_src if g in hold_sh}
    n_leakers = defaultdict(int)
    for _, g in hits:
        n_leakers[g] += 1
    got = {
        r["source"]: r
        for r in entrymod.queries()["dq_contamination_by_source"](
            spark, SF
        ).collect()
    }
    assert set(got) == train_sources
    for src in train_sources:
        mine = {g for s, g in hits if s == src}
        sole = {g for g in mine if n_leakers[g] == 1}
        docs_touched = {d for d, g in hold_doc_sh if g in mine}
        g = got[src]
        assert g["n_hit_shingles"] == len(mine)
        assert g["n_sole_shingles"] == len(sole)
        assert g["n_holdout_docs"] == len(docs_touched)
        expect = (
            0 if not hold_sh else len(mine) * 1000 // len(hold_sh)
        )
        assert g["hit_share_milli"] == expect
    # the fixture must exercise the metric: at least one leak must exist
    assert any(g["n_hit_shingles"] > 0 for g in got.values())


def test_token_budget_mix_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    cap = defaultdict(int)
    for r in docs:
        cap[r["source"]] += len(_tokens(r["text"]))
    total = sum(cap.values())
    s = len(cap)
    budget = total * 9 // 10
    # closed-form water-filling replay
    order = sorted(cap.items(), key=lambda kv: (kv[1], kv[0]))
    pexcl, capped = 0, {}
    for j, (src, c) in enumerate(order, start=1):
        capped[src] = c * (s - j + 1) <= budget - pexcl
        pexcl += c
    pk = sum(c for src, c in cap.items() if capped[src])
    kk = sum(1 for src in cap if capped[src])
    q, r = divmod(budget - pk, s - kk)
    unc_sorted = sorted(src for src in cap if not capped[src])
    alloc = {}
    for src, c in cap.items():
        if capped[src]:
            alloc[src] = c
        else:
            alloc[src] = q + (1 if unc_sorted.index(src) < r else 0)
    got = {
        row["source"]: row
        for row in entrymod.queries()["p_token_budget_mix"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(cap)
    for src in cap:
        g = got[src]
        assert g["cap_tokens"] == cap[src]
        assert g["alloc_tokens"] == alloc[src]
        assert g["capped"] == capped[src]
        expect = 0 if cap[src] == 0 else alloc[src] * 1000 // cap[src]
        assert g["fill_milli"] == expect
    # solver invariants: the budget is exactly spent, never over-fills
    assert sum(r["alloc_tokens"] for r in got.values()) == budget
    assert all(
        r["alloc_tokens"] <= r["cap_tokens"] for r in got.values()
    )


def _rank_topk(ids, qv_ids, cos, k=10):
    """(round-9 DESC, id ASC) rank table: {(query_id, vec_id): rank}."""
    out = {}
    for qi, qid in enumerate(qv_ids):
        scored = sorted(
            (
                (-np.round(cos[qi, ci], 9), ids[ci])
                for ci in range(len(ids))
                if ids[ci] != qid
            ),
        )[:k]
        for rank, (_, vid) in enumerate(scored, start=1):
            out[(qid, vid)] = rank
    return out


def test_codec_recall_replays(spark):
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
    qids = ids[qm]

    def cos(Q, C):
        return (Q @ C.T) / np.outer(
            np.linalg.norm(Q, axis=1), np.linalg.norm(C, axis=1)
        )

    truth = _rank_topk(ids, qids, cos(M[qm], M))
    # SQ8 reconstruction
    mn, mx = M.min(0), M.max(0)
    span = np.where(mx > mn, mx - mn, 1.0)
    ratio = np.where(mx > mn, np.round((M - mn) / span, 9), 0.0)
    codes = np.round(ratio * 255).astype(int)
    sq8 = mn + codes / 255.0 * (mx - mn)
    sq8t = _rank_topk(ids, qids, cos(M[qm], sq8))
    # PQ reconstruction (seeds in md5 'pq-train' order, m=4, k=16)
    seed_order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(f"pq-train|{ids[i]}".encode()).hexdigest(),
            ids[i],
        ),
    )[:16]
    S = M[seed_order]
    pq = np.empty_like(M)
    for j in range(4):
        sub = M[:, j * 16 : (j + 1) * 16]
        B = S[:, j * 16 : (j + 1) * 16]
        d2 = (
            (sub * sub).sum(1, keepdims=True)
            - 2.0 * (sub @ B.T)
            + (B * B).sum(1)
        )
        code = np.argmin(np.round(d2, 9), axis=1)
        pq[:, j * 16 : (j + 1) * 16] = B[code]
    pqt = _rank_topk(ids, qids, cos(M[qm], pq))

    got = {
        (r["codec"], r["k"]): (r["hits"], r["recall_milli"])
        for r in entrymod.queries()["ann_codec_recall"](
            spark, SF
        ).collect()
    }
    assert set(got) == {(c, k) for c in ("sq8", "pq") for k in (1, 5, 10)}
    for codec, arm in (("sq8", sq8t), ("pq", pqt)):
        for k in (1, 5, 10):
            hits = sum(
                1
                for key, rk in truth.items()
                if rk <= k and arm.get(key, 99) <= k
            )
            assert got[(codec, k)] == (
                hits,
                hits * 1000 // (k * len(qids)),
            ), (codec, k)
            assert got[(codec, k)][1] <= 1000


def test_ivf_balance_replays(spark):
    rows = sorted(
        spark.read.parquet(f"{SF}/embeddings.parquet").collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array(
        [[float(x) for x in r["embedding"]] for r in rows],
        dtype=np.float64,
    )
    cm = ids < 8
    C = M[cm]
    S = np.round(
        (M @ C.T)
        / np.outer(np.linalg.norm(M, axis=1), np.linalg.norm(C, axis=1)),
        9,
    )
    cell = ids[cm][np.argmax(S, axis=1)]
    member_cos = S[np.arange(len(ids)), np.argmax(S, axis=1)]
    got = {
        r["cell"]: r
        for r in entrymod.queries()["ann_ivf_balance"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(ids[cm].tolist())
    total = len(ids)
    for cid in ids[cm]:
        members = cell == cid
        n = int(members.sum())
        g = got[cid]
        assert g["n_vectors"] == n
        assert g["share_milli"] == n * 1000 // total
        assert g["load_milli"] == n * 8 * 1000 // total
        if n == 0:
            assert g["coherence_milli"] == 0
        else:
            nano = int(
                np.rint(member_cos[members] * 1_000_000_000).sum()
            )
            # trunc-toward-zero division to match Spark `div` / DuckDB
            # `//` even if a fixture ever yields a negative cosine sum
            # (advisor r11 #3)
            assert g["coherence_milli"] == _trunc_div(
                nano, n * 1_000_000
            )
    assert sum(r["n_vectors"] for r in got.values()) == total


# --- batch 8 ---------------------------------------------------------------


def _gate_passes(text, toks):
    from jigsaw_spark.operators.text import LANG_MARKERS

    lowered = (text or "").lower()
    kept = len(re.sub("[^a-z0-9 ]", "", lowered))
    alnum = kept / len(lowered) if lowered else float("nan")
    hits = {
        lang: sum(1 for x in toks if x in set(ms))
        for lang, ms in LANG_MARKERS.items()
    }
    if hits["en"] >= hits["es"] and hits["en"] >= hits["fr"]:
        pred = "en"
    elif hits["es"] >= hits["fr"]:
        pred = "es"
    else:
        pred = "fr"
    return len(toks) >= 20 and alnum >= 0.5 and pred == "en"


import re  # noqa: E402


def test_dedup_bias_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    keepers = (
        exact_dedup(docs_df, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    ]
    docs = docs_df.collect()
    parent = {r["doc_id"]: r["doc_id"] for r in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {True: [0, 0, 0], False: [0, 0, 0]}
    for r in docs:
        dropped = find(r["doc_id"]) != r["doc_id"]
        g = groups[dropped]
        g[0] += 1
        g[1] += 1 if _gate_passes(r["text"], _tokens(r["text"])) else 0
        g[2] += r["n_chars"]
    n_all = len(docs)
    got = {
        r["is_dropped"]: r
        for r in entrymod.queries()["dq_dedup_bias"](
            spark, SF
        ).collect()
    }
    expected_flags = {k for k, v in groups.items() if v[0] > 0}
    assert set(got) == expected_flags
    for flag in expected_flags:
        n, np_, sc = groups[flag]
        g = got[flag]
        assert g["n_docs"] == n
        assert g["share_milli"] == n * 1000 // n_all
        assert g["n_pass"] == np_
        assert g["pass_milli"] == np_ * 1000 // n
        assert g["mean_chars"] == sc // n
    assert sum(g["n_docs"] for g in got.values()) == n_all


def test_split_smd_replays(spark):
    import math

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    covs = {"n_chars": [], "n_tokens": [], "alnum_milli": []}
    flags = []
    for r in docs:
        t = _tokens(r["text"])
        lowered = (r["text"] or "").lower()
        kept = len(re.sub("[^a-z0-9 ]", "", lowered))
        alnum_milli = round(kept / len(lowered) * 1000) if lowered else 0
        covs["n_chars"].append(r["n_chars"])
        covs["n_tokens"].append(len(t))
        covs["alnum_milli"].append(alnum_milli)
        flags.append(_is_holdout(r["doc_id"]))
    got = {
        r["covariate"]: r
        for r in entrymod.queries()["dq_split_smd"](spark, SF).collect()
    }
    assert set(got) == set(covs)
    for cov, xs in covs.items():
        tr = [x for x, h in zip(xs, flags) if not h]
        ho = [x for x, h in zip(xs, flags) if h]
        g = got[cov]
        assert g["n_tr"] == len(tr)
        assert g["n_ho"] == len(ho)
        assert g["mean_train"] == sum(tr) // len(tr)
        assert g["mean_holdout"] == sum(ho) // len(ho)
        vt = (len(tr) * sum(x * x for x in tr) - sum(tr) ** 2) / (
            len(tr) ** 2
        )
        vh = (len(ho) * sum(x * x for x in ho) - sum(ho) ** 2) / (
            len(ho) ** 2
        )
        pooled = (vt + vh) / 2.0
        smd = (
            0
            if pooled == 0
            else abs(sum(tr) / len(tr) - sum(ho) / len(ho))
            / math.sqrt(pooled)
        )
        # float variance ratio + one sqrt, milli-snapped both sides
        assert abs(g["smd_milli"] - round(smd * 1000)) <= 1
        assert g["smd_milli"] >= 0
