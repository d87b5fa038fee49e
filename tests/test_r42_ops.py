"""Round-9 batch 2: python replays for ECE, Adamic-Adar, fuzzy match,
and the CIDR rollup."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_reliability_ece_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    cents = [round(r["value"] * 100) for r in rows]
    ys = [1 if r["event_type"] == "purchase" else 0 for r in rows]
    lo, hi, n = min(cents), max(cents), len(cents)
    bins = defaultdict(lambda: [0, 0, 0])
    for c, y in zip(cents, ys):
        p = 500000 if hi == lo else (c - lo) * 1000000 // (hi - lo)
        b = min(p // 100000, 9)
        bins[b][0] += 1
        bins[b][1] += p
        bins[b][2] += y
    gap_total = sum(
        abs(sp - 1000000 * pos) for _, sp, pos in bins.values()
    )
    got = {
        r["bin"]: r
        for r in entrymod.queries()["ml_reliability_ece"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(bins)
    for b, (n_b, sp, pos) in bins.items():
        g = got[b]
        assert (g["n_b"], g["sum_p_micro"], g["pos"]) == (n_b, sp, pos)
        assert g["conf_micro"] == sp // n_b
        assert g["acc_micro"] == pos * 1000000 // n_b
        assert g["gap_abs"] == abs(sp - 1000000 * pos)
        assert g["ece_micro"] == gap_total // n


def test_adamic_adar_replays_from_operator_pairs(spark):
    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs
    from pyspark.sql import functions as F

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
    edge_set = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    expected = defaultdict(lambda: [0, 0])
    for mid, ns in nbrs.items():
        if len(ns) < 2:
            continue
        w = round(1e9 / math.log(len(ns)))
        for a in ns:
            for b in ns:
                if a < b and (a, b) not in edge_set:
                    expected[(a, b)][0] += 1
                    expected[(a, b)][1] += w
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["aa_nano"])
        for r in entrymod.queries()["graph_adamic_adar"](
            spark, SF
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in expected.items()}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_match_replays(spark):
    parts = spark.read.parquet(f"{SF}/part.parquet").collect()
    # exact-identity dedup first (C4 order): min partkey per (brand, name)
    keepers: dict = {}
    for r in parts:
        k = (r["p_brand"], r["p_name"])
        keepers[k] = min(keepers.get(k, r["p_partkey"]), r["p_partkey"])
    blocks = defaultdict(list)
    for (brand, name), key in keepers.items():
        blocks[(brand, name.split(" ")[0])].append((key, name))
    expected = {}
    for (brand, _), items in blocks.items():
        for i, (ka, na) in enumerate(items):
            for kb, nb in items:
                if ka < kb:
                    d = _lev(na, nb)
                    if d <= 3:
                        m = max(len(na), len(nb))
                        expected[(ka, kb)] = (
                            brand,
                            d,
                            (m - d) * 1000 // m,
                        )
    got = {
        (r["key_a"], r["key_b"]): (r["p_brand"], r["lev"], r["sim_milli"])
        for r in entrymod.queries()["er_fuzzy_match"](spark, SF).collect()
    }
    assert got == expected


def test_ip_cidr_replays(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    nets = defaultdict(lambda: {"n": 0, "addrs": set(), "o3s": set()})
    for r in cust:
        hv = _h48(f"ip|{r['c_custkey']}")
        o2, o3, o4 = hv % 16, (hv // 256) % 256, (hv // 65536) % 256
        addr = ((10 * 256 + o2) * 256 + o3) * 256 + o4
        net = nets[f"10.{o2}.0.0/16"]
        net["n"] += 1
        net["addrs"].add(addr)
        net["o3s"].add(o3)
    got = {
        r["cidr16"]: r
        for r in entrymod.queries()["fn_ip_cidr"](spark, SF).collect()
    }
    assert set(got) == set(nets)
    for cidr, net in nets.items():
        g = got[cidr]
        assert g["n_ips"] == net["n"]
        assert g["n_uniq"] == len(net["addrs"])
        assert g["n_subnets24"] == len(net["o3s"])
        assert g["min_aton"] == min(net["addrs"])
        assert g["max_aton"] == max(net["addrs"])
