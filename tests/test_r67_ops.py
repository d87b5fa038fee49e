"""Round-12 batch 2 replays: bridge fragmentation, label coherence,
dedup-aware mixture, and the Fano grain curve — independent Python
replicas at sf0.001."""

from __future__ import annotations

import calendar
import re
from collections import defaultdict

import numpy as np

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


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


def test_bridge_fragmentation_replays(spark):
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
    closed = {(a, b) for a, b in pairs if adj[a] & adj[b]}
    universe = sorted(adj)

    def _metrics(ps):
        comp = _uf_components(universe, ps)
        sizes = defaultdict(int)
        for n in universe:
            sizes[comp[n]] += 1
        return {
            "n_nodes": len(universe),
            "n_components": len(sizes),
            "max_size": max(sizes.values()),
            "n_singletons": sum(
                1 for v in sizes.values() if v == 1
            ),
        }

    expect = {
        "full": _metrics(pairs),
        "corroborated": _metrics(closed),
    }
    got = {
        r["arm"]: r
        for r in entrymod.queries()["graph_bridge_fragmentation"](
            spark, SF
        ).collect()
    }
    assert set(got) == {"full", "corroborated"}
    for arm, e in expect.items():
        for k, v in e.items():
            assert got[arm][k] == v, (arm, k)
    # consistency with the queue query: singletons appear iff local
    # bridges strand nodes; corroborated can only fragment further
    assert (
        got["corroborated"]["n_components"]
        >= got["full"]["n_components"]
    )
    assert got["full"]["n_singletons"] == 0
    assert len(pairs) > 0


def _half_away(v):
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def test_label_coherence_replays(spark):
    rows = sorted(
        spark.read.parquet(f"{SF}/embeddings.parquet").collect(),
        key=lambda r: r["vec_id"],
    )
    labels = np.array([r["label"] for r in rows])
    M = np.array(
        [[float(x) for x in r["embedding"]] for r in rows],
        dtype=np.float64,
    )
    vm = _half_away(M * 1_000_000)
    cents = {}
    for lab in sorted(set(labels.tolist())):
        cents[lab] = vm[labels == lab].sum(0)
    per = {}
    for lab in cents:
        for clab, cv in cents.items():
            mem = M[labels == lab]
            cos = (mem @ cv) / (
                np.linalg.norm(mem, axis=1) * np.linalg.norm(cv)
            )
            nano = int(_half_away(np.round(cos, 9) * 1e9).sum())
            n = len(mem)
            q = abs(nano) // (n * 1_000_000)
            per[(lab, clab)] = q if nano >= 0 else -q
    got = {
        r["label"]: r
        for r in entrymod.queries()["emb_label_coherence"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(cents)
    for lab in cents:
        own = per[(lab, lab)]
        others = sorted(
            ((-per[(lab, c)], c) for c in cents if c != lab)
        )
        best_milli, best = -others[0][0], others[0][1]
        g = got[lab]
        assert g["n_vectors"] == int((labels == lab).sum())
        assert g["coherence_milli"] == own
        assert g["best_other"] == best
        assert g["best_other_milli"] == best_milli
        assert g["margin_milli"] == own - best_milli
    # separable synthetic labels: members must cohere with their own
    # centroid more than with the most confusable other label
    assert all(r["margin_milli"] > 0 for r in got.values())


def test_dedup_aware_mix_replays(spark):
    import hashlib

    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    docs = docs_df.collect()
    fp_min = {}
    recs = []
    for r in docs:
        t = _tokens(r["text"])
        fp = hashlib.md5(" ".join(t).encode()).hexdigest()
        recs.append((r["doc_id"], r["source"], len(t), fp))
        if fp not in fp_min or r["doc_id"] < fp_min[fp]:
            fp_min[fp] = r["doc_id"]
    # near-dup components over the production keeper graph (the
    # simhash banding is replayed via the operator; components and
    # survivor selection are replayed in Python)
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
    raw = defaultdict(int)
    keeper = defaultdict(int)
    for doc_id, src, ntok, fp in recs:
        raw[src] += ntok
        if fp_min[fp] == doc_id and comp.get(doc_id, doc_id) == doc_id:
            keeper[src] += ntok
    rt, kt = sum(raw.values()), sum(keeper.values())
    budget = kt * 9 // 10

    def _alloc(cap, total):
        base = {s: budget * cap[s] // total for s in raw}
        rem = {s: budget * cap[s] % total for s in raw}
        lo = budget - sum(base.values())
        order = sorted(raw, key=lambda s: (-rem[s], s))
        return {
            s: base[s] + (1 if order.index(s) < lo else 0)
            for s in raw
        }

    ar = _alloc(raw, rt)
    ad = _alloc(defaultdict(int, keeper), kt)
    got = {
        r["source"]: r
        for r in entrymod.queries()["p_dedup_aware_mix"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(raw)
    for s in raw:
        g = got[s]
        assert g["raw_tokens"] == raw[s]
        assert g["keeper_tokens"] == keeper[s]
        assert g["dup_share_milli"] == (
            0 if raw[s] == 0 else (raw[s] - keeper[s]) * 1000 // raw[s]
        )
        assert g["raw_alloc"] == ar[s]
        assert g["dedup_alloc"] == ad[s]
        assert g["alloc_shift"] == ad[s] - ar[s]
    # both allocations spend the budget exactly; the shift sums to 0
    assert sum(r["raw_alloc"] for r in got.values()) == budget
    assert sum(r["dedup_alloc"] for r in got.values()) == budget
    assert sum(r["alloc_shift"] for r in got.values()) == 0
    # the fixture has exact dups, so at least one source shifts
    assert any(r["dup_share_milli"] > 0 for r in got.values())


def _us(ts) -> int:
    return (
        calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    )


def test_fano_grain_curve_replays(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    grains = {
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
        "week": 604_800_000_000,
    }
    buckets = defaultdict(lambda: defaultdict(int))
    for r in events:
        us = _us(r["ts"])
        for g, gus in grains.items():
            buckets[(r["event_type"], g)][us // gus] += 1
    got = {
        (r["event_type"], r["grain"]): r
        for r in entrymod.queries()["ts_fano_grain_curve"](
            spark, SF
        ).collect()
    }
    types = {r["event_type"] for r in events}
    assert set(got) == {(t, g) for t in types for g in grains}
    for key, bk in buckets.items():
        xs = list(bk.values())
        n, sx = len(xs), sum(xs)
        qx = sum(v * v for v in xs)
        fano = 0 if n * sx == 0 else (n * qx - sx * sx) * 1000 // (n * sx)
        g = got[key]
        assert g["n_buckets"] == n
        assert g["n_events"] == sx
        assert g["fano_milli"] == fano
    # finer grains have at least as many buckets; totals agree per type
    for t in types:
        assert (
            got[(t, "hour")]["n_buckets"]
            >= got[(t, "day")]["n_buckets"]
            >= got[(t, "week")]["n_buckets"]
        )
        assert (
            got[(t, "hour")]["n_events"]
            == got[(t, "day")]["n_events"]
            == got[(t, "week")]["n_events"]
        )
