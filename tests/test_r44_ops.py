"""Round-9 batch 4: replays for streaming contamination, node2vec
walks, and walk skip-grams."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _shingles(toks: list[str], n: int = 8) -> list[str]:
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_stream_contamination_replays_occurrence_counts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    train_sh: set[str] = set()
    hold = {}
    for r in docs:
        sh = _shingles(_tokens(r["text"]))
        if _h48(f"contam|{r['doc_id']}") % 20 == 0:
            hold[r["doc_id"]] = sh
        else:
            train_sh |= set(sh)
    expected = {}
    for doc_id, sh in hold.items():
        if not sh:
            continue  # zero-shingle docs produce no stream rows
        hits = sum(1 for s in sh if s in train_sh)
        expected[doc_id] = (len(sh), hits, hits * 1000 // len(sh))
    got = {
        r["doc_id"]: (r["n_occ"], r["n_hit_occ"], r["contam_occ_milli"])
        for r in entrymod.queries()["stream_contamination"](
            spark, SF
        ).collect()
    }
    assert got == expected


def _keeper_adjacency(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    ]
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    return {u: sorted(vs) for u, vs in nbrs.items()}


def test_node2vec_walk_replays(spark):
    adj = _keeper_adjacency(spark)
    expected = {}
    for start in adj:
        prev, node, path = None, start, str(start)
        for s in range(3):
            cn = adj[node]
            ws = [
                1
                if prev is None or x == prev
                else (2 if x in adj.get(prev, []) else 4)
                for x in cn
            ]
            h = _h48(f"n2v|{start}|{s}|{prev if prev is not None else -1}|{node}")
            r = h % sum(ws)
            cum = 0
            for x, w in zip(cn, ws):
                cum += w
                if cum > r:
                    nxt = x
                    break
            prev, node = node, nxt
            path += f"->{nxt}"
        expected[start] = (node, path)
    got = {
        r["start"]: (r["final_node"], r["path"])
        for r in entrymod.queries()["graph_node2vec_walk"](
            spark, SF
        ).collect()
    }
    assert got == expected


def test_walk_skipgrams_replay_from_walks(spark):
    walks = entrymod.queries()["graph_random_walk"](spark, SF).collect()
    expected = defaultdict(int)
    for r in walks:
        toks = [int(t) for t in r["path"].split("->")]
        for i, c in enumerate(toks):
            for j, x in enumerate(toks):
                if i != j and abs(i - j) <= 2:
                    expected[(c, x)] += 1
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in entrymod.queries()["graph_walk_skipgrams"](
            spark, SF
        ).collect()
    }
    assert got == dict(expected)
