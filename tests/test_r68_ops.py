"""Round-12 batch 3 replays: executed split repair, edge support
histogram, and pooled-evidence components — independent Python
replicas at sf0.001."""

from __future__ import annotations

import hashlib
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


def test_repair_residual_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    grams, src, hold = {}, {}, {}
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
    for gs in grams.values():
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
    # md5-ordered promotion within source
    demote_by_src = defaultdict(int)
    for d in contam:
        demote_by_src[src[d]] += 1
    pool_by_src = defaultdict(list)
    for d in sorted(
        pool,
        key=lambda d: (
            hashlib.md5(f"repair|{d}".encode()).hexdigest(),
            d,
        ),
    ):
        pool_by_src[src[d]].append(d)
    promoted = set()
    for s, lst in pool_by_src.items():
        promoted |= set(lst[: min(demote_by_src[s], len(lst))])
    # repaired split + full recount
    nhold = {
        d: (False if d in contam else True if d in promoted else hold[d])
        for d in grams
    }
    ntrain_sh = set()
    for d, gs in grams.items():
        if not nhold[d]:
            ntrain_sh |= gs
    ncontam = {
        d for d, gs in grams.items() if nhold[d] and gs & ntrain_sh
    }
    got = {
        r["source"]: r
        for r in entrymod.queries()["dq_repair_residual"](
            spark, SF
        ).collect()
    }
    sources = set(src.values())
    assert set(got) == sources
    for s in sources:
        g = got[s]
        hb = sum(1 for d in grams if src[d] == s and hold[d])
        cb = sum(1 for d in contam if src[d] == s)
        pr = sum(1 for d in promoted if src[d] == s)
        ha = sum(1 for d in grams if src[d] == s and nhold[d])
        ca = sum(1 for d in ncontam if src[d] == s)
        assert g["n_holdout_before"] == hb
        assert g["n_contam_before"] == cb
        assert g["n_promoted"] == pr
        assert g["n_holdout_after"] == ha
        assert g["n_contam_after"] == ca
        assert g["repair_gain"] == cb - ca
    # invariants: promoted docs are clean by construction, so every
    # post-repair contamination is a sideways leak from demotions;
    # the repair never makes a source WORSE than doing nothing would
    # leave rows where n_pool = 0 (gain >= 0 is NOT guaranteed per
    # source, but promoted-doc cleanliness is)
    assert promoted.isdisjoint(ncontam)
    assert any(g["n_contam_before"] > 0 for g in got.values())


def test_edge_support_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    hist = defaultdict(int)
    for a, b in pairs:
        hist[len(adj[a] & adj[b])] += 1
    got = {
        r["support"]: r
        for r in entrymod.queries()["graph_edge_support"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(hist)
    for s, n in hist.items():
        assert got[s]["n_edges"] == n
        assert got[s]["share_milli"] == n * 1000 // len(pairs)
    # consistency with the queue query: support-0 edges ARE the local
    # bridges
    [lb] = entrymod.queries()["graph_local_bridges"](
        spark, SF
    ).collect()
    assert got.get(0, {"n_edges": 0})["n_edges"] == lb["n_bridges"]
    assert sum(r["n_edges"] for r in got.values()) == lb["n_edges"]


def test_pooled_components_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    tpairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    ipairs = {
        (int(r["img_a"]), int(r["img_b"]))
        for r in entrymod.queries()["mm_phash_near_dup"](
            spark, SF
        ).collect()
    }
    upairs = tpairs | ipairs

    def _metrics(ps):
        nodes = sorted({d for p in ps for d in p})
        comp = _uf_components(nodes, ps)
        sizes = defaultdict(int)
        for n in nodes:
            sizes[comp[n]] += 1
        return (
            len(nodes),
            len(sizes),
            max(sizes.values()) if sizes else 0,
        )

    expect = {
        "text": _metrics(tpairs),
        "image": _metrics(ipairs),
        "pooled": _metrics(upairs),
    }
    got = {
        r["arm"]: r
        for r in entrymod.queries()["dedup_pooled_components"](
            spark, SF
        ).collect()
    }
    assert set(got) == {"text", "image", "pooled"}
    for arm, (nn, nc, mx) in expect.items():
        assert got[arm]["n_nodes"] == nn, arm
        assert got[arm]["n_components"] == nc, arm
        assert got[arm]["max_size"] == mx, arm
    # pooling can only merge: components(pooled) <= components(text)
    # + components(image), and the pooled giant is >= either giant
    assert (
        got["pooled"]["n_components"]
        <= got["text"]["n_components"] + got["image"]["n_components"]
    )
    assert got["pooled"]["max_size"] >= got["text"]["max_size"]
    assert got["pooled"]["max_size"] >= got["image"]["max_size"]
    assert len(tpairs) > 0 and len(ipairs) > 0
