"""Round-14 queue replays: cluster-safe repair and pooled text
detectors (module r75 sits behind the certification window; these
replicas are the pre-certification evidence, shipped in the queue
commit — the r55/r60/r65/r70 pattern)."""

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


def test_cluster_safe_repair_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    src = {
        r["doc_id"]: r["source"] for r in docs_df.collect()
    }
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
    cluster = {d: comp.get(k, k) for d, k in keeper_of.items()}
    hold = {d: _is_holdout(d) for d in cluster}
    sides = defaultdict(lambda: [0, 0])
    for d, c in cluster.items():
        sides[c][0 if hold[d] else 1] += 1
    csz = defaultdict(int)
    for c in cluster.values():
        csz[c] += 1
    strad = {c for c, (h, t) in sides.items() if h > 0 and t > 0}
    demote = {d for d in cluster if hold[d] and cluster[d] in strad}
    pool = {
        d
        for d in cluster
        if not hold[d] and csz[cluster[d]] == 1
    }
    demote_by = defaultdict(int)
    for d in demote:
        demote_by[src[d]] += 1
    pool_by = defaultdict(list)
    for d in sorted(
        pool,
        key=lambda d: (
            hashlib.md5(f"crepair|{d}".encode()).hexdigest(),
            d,
        ),
    ):
        pool_by[src[d]].append(d)
    prom = set()
    for s, lst in pool_by.items():
        prom |= set(lst[: min(demote_by[s], len(lst))])
    nhold = {
        d: (False if d in demote else True if d in prom else hold[d])
        for d in cluster
    }
    nsides = defaultdict(lambda: [0, 0])
    for d, c in cluster.items():
        nsides[c][0 if nhold[d] else 1] += 1
    nstrad = sum(
        1 for c, (h, t) in nsides.items() if h > 0 and t > 0
    )
    got = {
        r["source"]: r
        for r in entrymod.queries()["dq_cluster_safe_repair"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(src.values())
    for s in set(src.values()):
        g = got[s]
        assert g["n_holdout_before"] == sum(
            1 for d in cluster if src[d] == s and hold[d]
        ), s
        assert g["n_demoted"] == sum(
            1 for d in demote if src[d] == s
        ), s
        assert g["n_promoted"] == sum(
            1 for d in prom if src[d] == s
        ), s
        assert g["n_holdout_after"] == sum(
            1 for d in cluster if src[d] == s and nhold[d]
        ), s
        assert g["global_straddle_after"] == nstrad
    # the construction guarantees a straddle-free repaired split:
    # singleton promotes cannot mint a new straddle
    assert nstrad == 0


def test_pooled_text_detectors_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    keepers_df = (
        exact_dedup(docs_df, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    mhp = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(keepers_df, "doc_id")
        .select("doc_a", "doc_b")
        .collect()
    }
    shp = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers_df, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    got = {
        r["arm"]: r
        for r in entrymod.queries()["dedup_pooled_text_detectors"](
            spark, SF
        ).collect()
    }
    assert set(got) == {"minhash", "simhash", "pooled"}
    for arm, pairs in (
        ("minhash", mhp),
        ("simhash", shp),
        ("pooled", mhp | shp),
    ):
        nodes = {d for p in pairs for d in p}
        comp = _uf_components(sorted(nodes), pairs)
        sizes = defaultdict(int)
        for n in nodes:
            sizes[comp[n]] += 1
        g = got[arm]
        assert g["n_nodes"] == len(nodes), arm
        assert g["n_components"] == len(sizes), arm
        assert g["max_size"] == max(sizes.values()), arm
    # pooling can only fuse: pooled components <= sum of arm components
    assert (
        got["pooled"]["n_components"]
        <= got["minhash"]["n_components"]
        + got["simhash"]["n_components"]
    )
    # and covers the union of both node sets
    assert got["pooled"]["n_nodes"] == len(
        {d for p in (mhp | shp) for d in p}
    )
