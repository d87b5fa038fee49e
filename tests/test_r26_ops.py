"""Round-6 batch 3: semantic replays (variant extraction, checksum
algebra, clustering-coefficient law) and the DPP plan assertion."""

from __future__ import annotations

import hashlib
import json
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_fn_variant_replays_json(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    want = defaultdict(lambda: [0, 0, None, None, 0])
    for r in rows:
        k = json.loads(r["props"])["k"]
        w = want[r["event_type"]]
        w[0] += 1
        w[1] += k
        w[2] = k if w[2] is None else min(w[2], k)
        w[3] = k if w[3] is None else max(w[3], k)
        w[4] += 1  # '$.absent' is missing from every row
    got = {
        r["event_type"]: [r["n"], r["sum_k"], r["min_k"], r["max_k"], r["n_missing"]]
        for r in entrymod.queries()["fn_variant_agg"](spark, SF).collect()
    }
    assert got == dict(want)


def _md5_int48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_table_checksum_replays_and_detects_mutation(spark):
    got = {
        r["tbl"]: (r["n_rows"], r["key_checksum"])
        for r in entrymod.queries()["dq_table_checksum"](spark, SF).collect()
    }
    assert len(got) == 10
    # replay two tables by hand
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    ck = sum(_md5_int48(f"o|{r['o_orderkey']}") for r in orders) % 2**61
    assert got["orders"] == (len(orders), ck)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    ck = (
        sum(
            _md5_int48(f"l|{r['l_orderkey']}|{r['l_linenumber']}") for r in li
        )
        % 2**61
    )
    assert got["lineitem"] == (len(li), ck)
    # sensitivity: dropping any one row changes the checksum
    r0 = orders[0]
    ck_dropped = (
        got["orders"][1] - _md5_int48(f"o|{r0['o_orderkey']}")
    ) % 2**61
    assert ck_dropped != got["orders"][1]


def test_clustering_coeff_law(spark):
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, "doc_id").collect()
    }
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    got = {
        r["node"]: (r["degree"], r["n_tri"], r["coeff_micro"])
        for r in entrymod.queries()["graph_clustering_coeff"](
            spark, SF
        ).collect()
    }
    want_nodes = {n for n, s in nbrs.items() if len(s) >= 2}
    assert set(got) == want_nodes
    for n in want_nodes:
        d = len(nbrs[n])
        ns = sorted(nbrs[n])
        tri = sum(
            1
            for i, v in enumerate(ns)
            for w in ns[i + 1 :]
            if w in nbrs[v]
        )
        assert got[n] == (d, tri, 2 * tri * 1_000_000 // (d * (d - 1))), n
        assert 0 <= got[n][2] <= 1_000_000


def test_dpp_join_prunes_partitions(spark):
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    df = entrymod.queries()["j13_dpp_join"](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan[-2000:]
    # results equal the plain filtered aggregate
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {
        r["event_type"]: (r["n"], r["c"])
        for r in ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("c"),
        )
        .collect()
    }
    got = {
        r["event_type"]: (r["n_events"], r["total_cents"])
        for r in df.collect()
    }
    assert got == want


def test_stream_checksum_equals_batch_checksum(spark):
    batch = {
        r["tbl"]: (r["n_rows"], r["key_checksum"])
        for r in entrymod.queries()["dq_table_checksum"](spark, SF).collect()
    }
    stream = entrymod.queries()["stream_table_checksum"](spark, SF).collect()
    assert len(stream) == 1
    r = stream[0]
    # the algebraic-merge law: draining the file stream reproduces the
    # batch fingerprint bit-for-bit
    assert (r["n_rows"], r["key_checksum"]) == batch["events"]
