"""Round-13 batch 1 replays: pooled cluster leakage, the repair
fixpoint, threshold purity, and retrieval under dedup — independent
Python replicas at sf0.001."""

from __future__ import annotations

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


def _cos(Q, C):
    return (Q @ C.T) / np.outer(
        np.linalg.norm(Q, axis=1), np.linalg.norm(C, axis=1)
    )


def _text_machinery(spark):
    """keeper_of map + SimHash keeper pair set (the shared text-side
    dedup machinery, reused by three replays here)."""
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
    tpairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers_df, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    return keeper_of, tpairs


def _ledger(keeper_of, pairs):
    nodes = sorted({d for p in pairs for d in p})
    comp = _uf_components(nodes, pairs)
    clusters = defaultdict(lambda: [0, 0])
    for d, k in keeper_of.items():
        c = comp.get(k, k)
        if _is_holdout(d):
            clusters[c][0] += 1
        else:
            clusters[c][1] += 1
    straddling = {
        c for c, (h, t) in clusters.items() if h > 0 and t > 0
    }
    return {
        "n_clusters": len(clusters),
        "n_straddling": len(straddling),
        "n_docs_straddling": sum(
            h + t
            for c, (h, t) in clusters.items()
            if c in straddling
        ),
        "n_holdout_in_straddling": sum(
            h for c, (h, _) in clusters.items() if c in straddling
        ),
        "n_holdout_docs": sum(h for h, _ in clusters.values()),
    }


def test_pooled_cluster_leakage_replays(spark):
    keeper_of, tpairs = _text_machinery(spark)
    ipairs_raw = {
        (int(r["img_a"]), int(r["img_b"]))
        for r in entrymod.queries()["mm_phash_near_dup"](
            spark, SF
        ).collect()
    }
    # image endpoints folded to exact keepers
    ipairs = set()
    for a, b in ipairs_raw:
        ka, kb = keeper_of[a], keeper_of[b]
        if ka != kb:
            ipairs.add((min(ka, kb), max(ka, kb)))
    got = {
        r["arm"]: r
        for r in entrymod.queries()["dq_pooled_cluster_leakage"](
            spark, SF
        ).collect()
    }
    assert set(got) == {"text", "pooled"}
    for arm, pairs in (
        ("text", tpairs),
        ("pooled", tpairs | ipairs),
    ):
        exp = _ledger(keeper_of, pairs)
        g = got[arm]
        for k, v in exp.items():
            assert g[k] == v, (arm, k)
        nh = exp["n_holdout_docs"]
        assert g["leak_milli"] == (
            0
            if nh == 0
            else exp["n_holdout_in_straddling"] * 1000 // nh
        )
    # pooling can only FUSE clusters: fewer-or-equal clusters, and the
    # text arm must match the certified r70 single-arm audit
    assert got["pooled"]["n_clusters"] <= got["text"]["n_clusters"]
    [r70] = entrymod.queries()["dq_split_cluster_leakage"](
        spark, SF
    ).collect()
    assert got["text"]["n_clusters"] == r70["n_clusters"]
    assert got["text"]["n_straddling"] == r70["n_straddling"]
    assert (
        got["text"]["n_holdout_in_straddling"]
        == r70["n_holdout_in_straddling"]
    )


def _repair_round(grams, src, hold, safe, salt):
    """One demote+promote repair round; returns (contam, promoted,
    next_hold)."""
    train_sh = set()
    for d, gs in grams.items():
        if not hold[d]:
            train_sh |= gs
    contam = {
        d for d, gs in grams.items() if hold[d] and gs & train_sh
    }
    pool = {d for d in safe if not hold[d]}
    demote_by_src = defaultdict(int)
    for d in contam:
        demote_by_src[src[d]] += 1
    pool_by_src = defaultdict(list)
    for d in sorted(
        pool,
        key=lambda d: (
            hashlib.md5(f"{salt}|{d}".encode()).hexdigest(),
            d,
        ),
    ):
        pool_by_src[src[d]].append(d)
    promoted = set()
    for s, lst in pool_by_src.items():
        promoted |= set(lst[: min(demote_by_src[s], len(lst))])
    nhold = {
        d: (
            False
            if d in contam
            else True
            if d in promoted
            else hold[d]
        )
        for d in grams
    }
    return contam, promoted, nhold


def test_repair_fixpoint_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    grams, src, hold0 = {}, {}, {}
    for r in docs:
        t = _tokens(r["text"])
        grams[r["doc_id"]] = {
            " ".join(t[i : i + 8]) for i in range(len(t) - 7)
        }
        src[r["doc_id"]] = r["source"]
        hold0[r["doc_id"]] = _is_holdout(r["doc_id"])
    df = defaultdict(int)
    for gs in grams.values():
        for g in gs:
            df[g] += 1
    safe = {
        d for d, gs in grams.items() if all(df[g] <= 1 for g in gs)
    }
    c0, prom1, hold1 = _repair_round(grams, src, hold0, safe, "repair")
    c1, prom2, hold2 = _repair_round(
        grams, src, hold1, safe, "repair2"
    )
    # round-3 contamination count only (no further promotion needed)
    train_sh2 = set()
    for d, gs in grams.items():
        if not hold2[d]:
            train_sh2 |= gs
    c2 = {
        d for d, gs in grams.items() if hold2[d] and gs & train_sh2
    }
    got = {
        r["source"]: r
        for r in entrymod.queries()["dq_repair_fixpoint"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(src.values())
    for s in set(src.values()):
        g = got[s]
        e0 = sum(1 for d in c0 if src[d] == s)
        e1 = sum(1 for d in c1 if src[d] == s)
        e2 = sum(1 for d in c2 if src[d] == s)
        assert g["contam_r0"] == e0, s
        assert g["contam_r1"] == e1, s
        assert g["contam_r2"] == e2, s
        assert g["promoted_r1"] == sum(
            1 for d in prom1 if src[d] == s
        ), s
        assert g["promoted_r2"] == sum(
            1 for d in prom2 if src[d] == s
        ), s
        assert g["monotone"] == (e0 >= e1 >= e2), s
    # cross-query consistency: iteration 0/1 must agree with the
    # certified dq_repair_residual ledger
    res = {
        r["source"]: r
        for r in entrymod.queries()["dq_repair_residual"](
            spark, SF
        ).collect()
    }
    for s, g in got.items():
        assert g["contam_r0"] == res[s]["n_contam_before"], s
        assert g["contam_r1"] == res[s]["n_contam_after"], s
        assert g["promoted_r1"] == res[s]["n_promoted"], s


def test_phash_threshold_purity_replays(spark):
    rows = entrymod.queries()["mm_image_phash"](spark, SF).collect()
    bytes_of = defaultdict(dict)
    for r in rows:
        bytes_of[int(r["image_id"])][r["byte_idx"]] = r["byte_val"]
    ids = sorted(bytes_of)
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(
            f"{SF}/documents.parquet"
        ).collect()
    }
    ham = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if any(
                bytes_of[a][k] == bytes_of[b][k] for k in bytes_of[a]
            ):
                ham[(a, b)] = sum(
                    bin(bytes_of[a][k] ^ bytes_of[b][k]).count("1")
                    for k in bytes_of[a]
                )
    got = {
        r["threshold"]: r
        for r in entrymod.queries()["mm_phash_threshold_purity"](
            spark, SF
        ).collect()
    }
    assert set(got) == {0, 2, 4, 6}
    for t in (0, 2, 4, 6):
        pairs = {p for p, h in ham.items() if h <= t}
        comp = _uf_components(
            sorted({d for p in pairs for d in p}), pairs
        )
        clusters = defaultdict(lambda: defaultdict(int))
        for img in ids:
            clusters[comp.get(img, img)][src[img]] += 1
        n_multi = sum(1 for v in clusters.values() if len(v) > 1)
        maj = sum(max(v.values()) for v in clusters.values())
        tot = sum(sum(v.values()) for v in clusters.values())
        g = got[t]
        assert g["n_clusters"] == len(clusters), t
        assert g["n_multi_source"] == n_multi, t
        assert g["multi_milli"] == n_multi * 1000 // len(clusters), t
        assert g["majority_mass_milli"] == maj * 1000 // tot, t
    # tighter thresholds split clusters: counts are non-increasing in t
    assert (
        got[0]["n_clusters"]
        >= got[2]["n_clusters"]
        >= got[4]["n_clusters"]
        >= got[6]["n_clusters"]
    )


def test_ann_recall_under_dedup_replays(spark):
    keeper_of, tpairs = _text_machinery(spark)
    nodes = sorted({d for p in tpairs for d in p})
    comp = _uf_components(nodes, tpairs)
    cluster = {
        d: comp.get(k, k) for d, k in keeper_of.items()
    }
    surv = {d for d, c in cluster.items() if d == c}
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
    S = np.round(_cos(M[qm], M), 9)

    def _topk(qi, qid, allowed):
        scored = sorted(
            (
                (-S[qi, ci], ids[ci])
                for ci in range(len(ids))
                if ids[ci] != qid and ids[ci] in allowed
            )
        )[:10]
        return [v for _, v in scored]

    allv = set(int(i) for i in ids)
    got = {
        r["query_id"]: r
        for r in entrymod.queries()["ann_recall_under_dedup"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(int(q) for q in qids)
    for qi, qid in enumerate(qids):
        truth = _topk(qi, qid, allv)
        after = set(_topk(qi, qid, allv & surv))
        kept = [v for v in truth if v in surv]
        lost = [v for v in truth if v not in surv]
        lost_rep = [v for v in lost if cluster[int(v)] in after]
        g = got[int(qid)]
        assert g["n_truth"] == len(truth)
        assert g["n_kept"] == len(kept)
        assert g["n_lost"] == len(lost)
        assert g["n_lost_rep"] == len(lost_rep)
        assert g["recall_milli"] == len(kept) * 1000 // len(truth)
        assert (
            g["rep_recall_milli"]
            == (len(kept) + len(lost_rep)) * 1000 // len(truth)
        )
    # keeper collapse must actually drop vectors in this fixture (the
    # SimHash near-dup clusters are non-trivial), so the audit is
    # exercised: some truth is lost somewhere OR the survivor set is
    # the whole corpus (in which case every recall is 1000)
    if surv != set(keeper_of):
        assert any(g["n_lost"] > 0 for g in got.values())
