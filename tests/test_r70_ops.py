"""Round-13 queue replays: image threshold sweep and cluster-level
split leakage (module r70 sits behind the certification window; these
replicas are the pre-certification evidence, shipped in the queue
commit — the r55/r60/r65 pattern)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


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


def test_phash_threshold_sweep_replays(spark):
    rows = entrymod.queries()["mm_image_phash"](spark, SF).collect()
    bytes_of = defaultdict(dict)
    for r in rows:
        bytes_of[int(r["image_id"])][r["byte_idx"]] = r["byte_val"]
    ids = sorted(bytes_of)
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
        for r in entrymod.queries()["mm_phash_threshold_sweep"](
            spark, SF
        ).collect()
    }
    assert set(got) == {0, 2, 4, 6}
    for t in (0, 2, 4, 6):
        pairs = {p for p, h in ham.items() if h <= t}
        covered = {d for p in pairs for d in p}
        g = got[t]
        assert g["n_pairs"] == len(pairs), t
        assert g["n_covered"] == len(covered), t
        assert g["covered_milli"] == len(covered) * 1000 // len(ids)
    # monotone in the threshold; the production threshold (6) admits
    # the synthetic twins, so coverage is non-zero there
    assert (
        got[0]["n_pairs"]
        <= got[2]["n_pairs"]
        <= got[4]["n_pairs"]
        <= got[6]["n_pairs"]
    )
    assert got[6]["n_covered"] > 0
    # consistency with the certified near-dup query at threshold 6
    nd = entrymod.queries()["mm_phash_near_dup"](spark, SF).collect()
    assert got[6]["n_pairs"] == len(nd)


def test_split_cluster_leakage_replays(spark):
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
    clusters = defaultdict(lambda: [0, 0])
    for d, k in keeper_of.items():
        c = comp.get(k, k)
        if _is_holdout(d):
            clusters[c][0] += 1
        else:
            clusters[c][1] += 1
    n_clusters = len(clusters)
    n_holdout = sum(h for h, _ in clusters.values())
    straddling = {
        c for c, (h, t) in clusters.items() if h > 0 and t > 0
    }
    docs_straddling = sum(
        h + t for c, (h, t) in clusters.items() if c in straddling
    )
    hold_in = sum(
        h for c, (h, _) in clusters.items() if c in straddling
    )
    [g] = entrymod.queries()["dq_split_cluster_leakage"](
        spark, SF
    ).collect()
    assert g["n_clusters"] == n_clusters
    assert g["n_straddling"] == len(straddling)
    assert g["n_docs_straddling"] == docs_straddling
    assert g["n_holdout_in_straddling"] == hold_in
    assert g["n_holdout_docs"] == n_holdout
    assert g["leak_milli"] == (
        0 if n_holdout == 0 else hold_in * 1000 // n_holdout
    )
    # the fixture has near-dup pairs and a 5% holdout, so the audit is
    # exercised: clusters exist and some holdout docs exist
    assert n_clusters > 0 and n_holdout > 0
