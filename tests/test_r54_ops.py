"""Round-9 batch 14: replays for cluster language purity and
precision@k."""

from __future__ import annotations

import math
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_cluster_purity_replays(spark):
    from jigsaw_spark.operators.dedup import near_dup_keepers

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assigned = {
        r["doc_id"]: r["keeper"]
        for r in near_dup_keepers(docs, "doc_id").collect()
    }
    lang = {r["doc_id"]: r["lang"] for r in docs.collect()}
    clusters = defaultdict(lambda: defaultdict(int))
    for d, k in assigned.items():
        clusters[k][lang[d]] += 1
    buckets = defaultdict(lambda: [0, 0, 0, 0])  # clusters/docs/mixed/maj
    for langs in clusters.values():
        size = sum(langs.values())
        bucket = size.bit_length() - 1
        b = buckets[bucket]
        b[0] += 1
        b[1] += size
        b[2] += len(langs) > 1
        b[3] += max(langs.values())
    got = {
        r["bucket"]: r
        for r in entrymod.queries()["dedup_cluster_purity"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(buckets)
    for bkt, (nc, nd, nm, mj) in buckets.items():
        g = got[bkt]
        assert g["n_clusters"] == nc
        assert g["n_docs"] == nd
        assert g["n_mixed_clusters"] == nm
        assert g["majority_docs"] == mj
        assert g["purity_milli"] == mj * 1000 // nd
        assert g["purity_milli"] <= 1000
    # every document lands in exactly one cluster bucket
    assert sum(b[1] for b in buckets.values()) == len(assigned)


def test_precision_at_k_replays(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    emb = [(r["vec_id"], list(r["embedding"]), r["label"]) for r in rows]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(x * x for x in b))
        )

    per = defaultdict(lambda: [0, 0])  # (label, k) -> [n_queries, hits]
    for qid, qv, qlbl in emb:
        if qid >= 200:
            continue
        top = sorted(
            (
                (-round(cos(qv, cv), 9), cid, clbl)
                for cid, cv, clbl in emb
                if cid != qid
            )
        )[:10]
        for k in (1, 5, 10):
            rel = sum(1 for _, _, clbl in top[:k] if clbl == qlbl)
            per[(qlbl, k)][0] += 1
            per[(qlbl, k)][1] += rel
    got = {
        (r["label"], r["k"]): r
        for r in entrymod.queries()["ml_precision_at_k"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    mrr = {
        r["label"]: r
        for r in entrymod.queries()["ml_mrr_exact"](spark, SF).collect()
    }
    for (lbl, k), (nq, hits) in per.items():
        g = got[(lbl, k)]
        assert g["n_queries"] == nq
        assert g["n_hits"] == hits
        assert g["precision_micro"] == hits * 1_000_000 // (k * nq)
        # same panel as MRR: per-label query counts agree
        assert mrr[lbl]["n_queries"] == nq
        # a P@1 hit is exactly rank-1 relevance: hits@1 <= MRR hit count
        if k == 1:
            assert hits <= mrr[lbl]["n_hit"]
