"""Round-13 batch 3 replays: gate × dup overlap, leak-detector
agreement, the curated budget mix, and embedding split drift —
independent Python replicas at sf0.001."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _is_holdout(doc_id: int) -> bool:
    h = hashlib.md5(f"contam|{doc_id}".encode()).hexdigest()[:12]
    return int(h, 16) % 20 == 0


def _uf_components(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _gate_pass(text: str, toks: list[str]) -> bool:
    from jigsaw_spark.operators.text import LANG_MARKERS

    if len(toks) < 20:
        return False
    lowered = (text or "").lower()
    if lowered:
        kept = len(re.sub("[^a-z0-9 ]", "", lowered))
        if kept / len(lowered) < 0.5:
            return False
    hits = {
        lang: sum(1 for x in toks if x in set(ms))
        for lang, ms in LANG_MARKERS.items()
    }
    if not (hits["en"] >= hits["es"] and hits["en"] >= hits["fr"]):
        return False
    if len(toks) >= 3:
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        if 2 * (len(grams) - len(set(grams))) > len(grams):
            return False
    return True


def _clusters(spark):
    """doc -> cluster (keeper-fold + SimHash components) and keeper_of,
    the shared text-dedup replay machinery."""
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    keeper_of = {
        r["doc_id"]: r["keeper"]
        for r in exact_dedup(docs_df, "doc_id")
        .select("doc_id", "keeper")
        .collect()
    }
    keepers_df = (
        exact_dedup(docs_df, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers_df, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    nodes = sorted({d for p in pairs for d in p})
    comp = _uf_components(nodes, pairs)
    return {d: comp.get(k, k) for d, k in keeper_of.items()}


def test_gate_dup_overlap_replays(spark):
    cluster = _clusters(spark)
    csz = defaultdict(int)
    for c in cluster.values():
        csz[c] += 1
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {
        r["source"]: r
        for r in entrymod.queries()["curation_gate_dup_overlap"](
            spark, SF
        ).collect()
    }
    cells = defaultdict(lambda: defaultdict(int))
    for r in docs:
        ok = _gate_pass(r["text"], _tokens(r["text"]))
        dup = csz[cluster[r["doc_id"]]] >= 2
        cells[r["source"]][(ok, dup)] += 1
    assert set(got) == set(cells)
    for s, c in cells.items():
        g = got[s]
        assert g["n_docs"] == sum(c.values())
        assert g["n_pass_dup"] == c[(True, True)]
        assert g["n_pass_uniq"] == c[(True, False)]
        assert g["n_fail_dup"] == c[(False, True)]
        assert g["n_fail_uniq"] == c[(False, False)]
        nf = c[(False, True)] + c[(False, False)]
        np_ = c[(True, True)] + c[(True, False)]
        assert g["dup_rate_fail_milli"] == (
            0 if nf == 0 else c[(False, True)] * 1000 // nf
        )
        assert g["dup_rate_pass_milli"] == (
            0 if np_ == 0 else c[(True, True)] * 1000 // np_
        )


def test_leak_detector_overlap_replays(spark):
    cluster = _clusters(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    grams, hold = {}, {}
    for r in docs:
        t = _tokens(r["text"])
        grams[r["doc_id"]] = {
            " ".join(t[i : i + 8]) for i in range(len(t) - 7)
        }
        hold[r["doc_id"]] = _is_holdout(r["doc_id"])
    train_sh = set()
    for d, gs in grams.items():
        if not hold[d]:
            train_sh |= gs
    by_gram = {
        d for d, gs in grams.items() if hold[d] and gs & train_sh
    }
    sides = defaultdict(lambda: [0, 0])
    for d, c in cluster.items():
        sides[c][0 if hold[d] else 1] += 1
    strad = {c for c, (h, t) in sides.items() if h > 0 and t > 0}
    by_cluster = {d for d in grams if hold[d] and cluster[d] in strad}
    holdout = {d for d in grams if hold[d]}
    [g] = entrymod.queries()["dq_leak_detector_overlap"](
        spark, SF
    ).collect()
    both = by_gram & by_cluster
    union = by_gram | by_cluster
    assert g["n_holdout"] == len(holdout)
    assert g["n_both"] == len(both)
    assert g["n_gram_only"] == len(by_gram - by_cluster)
    assert g["n_cluster_only"] == len(by_cluster - by_gram)
    assert g["n_neither"] == len(holdout - union)
    assert g["jaccard_milli"] == (
        0 if not union else len(both) * 1000 // len(union)
    )


def test_curated_budget_mix_replays(spark):
    cluster = _clusters(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    kt, ct = defaultdict(int), defaultdict(int)
    for r in docs:
        toks = _tokens(r["text"])
        # survivor: non-empty exact keeper that is its cluster min
        if toks and cluster[r["doc_id"]] == r["doc_id"]:
            kt[r["source"]] += len(toks)
            if _gate_pass(r["text"], toks):
                ct[r["source"]] += len(toks)
    sources = sorted({r["source"] for r in docs})
    tot_k, tot_c = sum(kt.values()), sum(ct.values())
    budget = tot_c * 9 // 10

    def seats(cap, total):
        base = {
            s: (0 if total == 0 else budget * cap[s] // total)
            for s in sources
        }
        rem = {
            s: (0 if total == 0 else budget * cap[s] % total)
            for s in sources
        }
        lo = budget - sum(base.values())
        order = sorted(sources, key=lambda s: (-rem[s], s))
        return {
            s: base[s] + (1 if order.index(s) < lo else 0)
            for s in sources
        }

    ded = seats(kt, tot_k)
    cur = seats(ct, tot_c)
    got = {
        r["source"]: r
        for r in entrymod.queries()["p_curated_budget_mix"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(sources)
    for s in sources:
        g = got[s]
        assert g["keeper_tokens"] == kt[s], s
        assert g["curated_tokens"] == ct[s], s
        assert g["gate_loss_milli"] == (
            0 if kt[s] == 0 else (kt[s] - ct[s]) * 1000 // kt[s]
        )
        assert g["dedup_alloc"] == ded[s], s
        assert g["curated_alloc"] == cur[s], s
        assert g["alloc_shift"] == cur[s] - ded[s], s
    # seats conserve the budget exactly in both arms
    assert sum(ded.values()) == budget
    assert sum(cur.values()) == budget


def _round_half_away(v: float) -> float:
    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def test_split_embedding_drift_replays(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    st = [0] * 64
    sh = [0] * 64
    nt = nh = 0
    for r in rows:
        hold = _is_holdout(r["vec_id"])
        if hold:
            nh += 1
        else:
            nt += 1
        for d, x in enumerate(r["embedding"]):
            q = int(_round_half_away(float(x) * 1_000_000))
            if hold:
                sh[d] += q
            else:
                st[d] += q
    dnum = [st[d] * nh - sh[d] * nt for d in range(64)]
    [g] = entrymod.queries()["dq_split_embedding_drift"](
        spark, SF
    ).collect()
    assert g["n_train"] == nt
    assert g["n_holdout"] == nh
    assert g["den"] == nt * nh
    assert g["l1_drift_num"] == sum(abs(x) for x in dnum)
    mx = max(abs(x) for x in dnum)
    assert g["max_abs_diff_num"] == mx
    # argmax ties resolve to the LOWEST dimension
    assert g["max_dim"] == min(
        d for d in range(64) if abs(dnum[d]) == mx
    )
