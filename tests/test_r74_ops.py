"""Round-13 batch 4 replays: signature size sweep, phash band sweep,
KMV precision curve, component depth profile — independent Python
replicas at sf0.001."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

_KMV_DOMAIN = 1 << 48


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


def test_signature_size_sweep_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    sh = {}
    for r in docs:
        t = _tokens(r["text"])
        if len(t) >= 3:
            sh[r["doc_id"]] = {
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            }
    got = {
        r["num_perm"]: r
        for r in entrymod.queries()["dedup_signature_size_sweep"](
            spark, SF
        ).collect()
    }
    assert set(got) == {8, 16, 32}
    ids = sorted(sh)
    for np_ in (8, 16, 32):
        mh = {
            d: [
                min(
                    hashlib.md5(f"{s}|{g}".encode()).hexdigest()
                    for g in sh[d]
                )
                for s in range(np_)
            ]
            for d in ids
        }
        bands = {
            d: [
                tuple(mh[d][b * 4 : b * 4 + 4])
                for b in range(np_ // 4)
            ]
            for d in ids
        }
        cands = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if any(
                    bands[a][k] == bands[b][k]
                    for k in range(np_ // 4)
                ):
                    cands.add((a, b))
        errs = []
        for a, b in cands:
            est = (
                sum(1 for k in range(np_) if mh[a][k] == mh[b][k])
                * 1000
                // np_
            )
            inter = len(sh[a] & sh[b])
            jac = inter * 1000 // (len(sh[a]) + len(sh[b]) - inter)
            errs.append(abs(est - jac))
        g = got[np_]
        assert g["n_candidates"] == len(cands), np_
        assert g["mean_abs_err_milli"] == (
            sum(errs) // max(len(errs), 1)
        ), np_
        assert g["max_abs_err_milli"] == (max(errs) if errs else 0)


def _phash_bytes(spark):
    rows = entrymod.queries()["mm_image_phash"](spark, SF).collect()
    bytes_of = defaultdict(dict)
    for r in rows:
        bytes_of[int(r["image_id"])][r["byte_idx"]] = r["byte_val"]
    return bytes_of


def test_phash_band_sweep_replays(spark):
    bytes_of = _phash_bytes(spark)
    ids = sorted(bytes_of)
    ham = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham[(a, b)] = sum(
                bin(bytes_of[a][k] ^ bytes_of[b][k]).count("1")
                for k in range(8)
            )
    true_pairs = {
        p
        for p, h in ham.items()
        if h <= 6
        and any(bytes_of[p[0]][k] == bytes_of[p[1]][k] for k in range(8))
    }
    got = {
        r["n_bands"]: r
        for r in entrymod.queries()["mm_phash_band_sweep"](
            spark, SF
        ).collect()
    }
    assert set(got) == {8, 4, 2}
    for nb in (8, 4, 2):
        w = 8 // nb
        sig = {
            d: [
                tuple(bytes_of[d][band * w + j] for j in range(w))
                for band in range(nb)
            ]
            for d in ids
        }
        cands = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if any(sig[a][k] == sig[b][k] for k in range(nb))
        }
        verified = cands & true_pairs
        g = got[nb]
        assert g["n_candidates"] == len(cands), nb
        assert g["n_verified"] == len(verified), nb
        assert g["recall_milli"] == (
            0
            if not true_pairs
            else len(verified) * 1000 // len(true_pairs)
        )
        assert g["precision_milli"] == (
            0 if not cands else len(verified) * 1000 // len(cands)
        )
    # narrower bands can only ADD candidates (a w-wide band match
    # implies both half-bands match)
    assert got[2]["n_candidates"] <= got[4]["n_candidates"]
    assert got[4]["n_candidates"] <= got[8]["n_candidates"]


def test_kmv_precision_curve_replays(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    users = defaultdict(set)
    for r in events:
        users[r["event_type"]].add(r["user_id"])
    got = {
        (r["event_type"], r["k"]): r
        for r in entrymod.queries()["agg_kmv_precision_curve"](
            spark, SF
        ).collect()
    }
    assert set(got) == {
        (t, k) for t in users for k in (16, 64, 256)
    }
    for t, us in users.items():
        hs = sorted(
            (
                int(
                    hashlib.md5(f"kmv|{u}".encode()).hexdigest()[:12],
                    16,
                ),
                u,
            )
            for u in us
        )
        for k in (16, 64, 256):
            exact = len(us)
            if exact < k:
                est = exact
            else:
                est = (k - 1) * _KMV_DOMAIN // hs[k - 1][0]
            g = got[(t, k)]
            assert g["exact_users"] == exact, (t, k)
            assert g["est_users"] == est, (t, k)
            assert g["abs_err"] == abs(est - exact)
            assert g["err_milli"] == abs(est - exact) * 1000 // exact


def test_component_depth_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
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
    ipairs = {
        (int(r["img_a"]), int(r["img_b"]))
        for r in entrymod.queries()["mm_phash_near_dup"](
            spark, SF
        ).collect()
    }
    got = defaultdict(dict)
    for r in entrymod.queries()["graph_component_depth"](
        spark, SF
    ).collect():
        got[r["arm"]][r["depth"]] = r["n_nodes"]
    assert set(got) == {"text", "image", "pooled"}
    for arm, pairs in (
        ("text", tpairs),
        ("image", ipairs),
        ("pooled", tpairs | ipairs),
    ):
        nodes = sorted({d for p in pairs for d in p})
        comp = _uf_components(nodes, pairs)
        adj = defaultdict(set)
        for a, b in pairs:
            adj[a].add(b)
            adj[b].add(a)
        # multi-source BFS from the component mins, capped at 8
        dist = {m: 0 for m in set(comp.values())}
        frontier = set(dist)
        for d in range(1, 9):
            nxt = set()
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.add(v)
            frontier = nxt
        exp = defaultdict(int)
        for n in nodes:
            exp[dist.get(n, 9)] += 1
        assert got[arm] == dict(exp), arm
    # every arm's nodes are all accounted for
    for arm, pairs in (("text", tpairs), ("image", ipairs)):
        nodes = {d for p in pairs for d in p}
        assert sum(got[arm].values()) == len(nodes)
