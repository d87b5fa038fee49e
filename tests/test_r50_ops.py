"""Round-9 batch 10: replays for the rich club, control rules, and
term burstiness."""

from __future__ import annotations

import calendar
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def test_rich_club_replays(spark):
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
    edges = pairs | {(b, a) for a, b in pairs}
    deg = defaultdict(int)
    for u, _ in edges:
        deg[u] += 1
    got = {
        r["k"]: r
        for r in entrymod.queries()["graph_rich_club"](spark, SF).collect()
    }
    assert set(got) == {1, 2, 3}
    prev_phi = None
    for k in (1, 2, 3):
        rich = {u for u, d in deg.items() if d > k}
        e_k = sum(1 for u, v in edges if u in rich and v in rich)
        g = got[k]
        assert g["n_nodes"] == len(rich)
        assert g["n_edges_directed"] == e_k
        if len(rich) <= 1:
            assert g["phi_milli"] == 0
        else:
            assert g["phi_milli"] == e_k * 1000 // (
                len(rich) * (len(rich) - 1)
            )
            assert 0 <= g["phi_milli"] <= 1000
        # density among an ever-richer club never loses members' edges
        # to outsiders faster than pairs: monotonic N_k
        if prev_phi is not None:
            assert g["n_nodes"] <= prev_phi
        prev_phi = g["n_nodes"]


def test_control_rules_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in rows:
        daily[(r["event_type"], _day(r["ts"]))] += round(r["value"] * 100)
    series = defaultdict(list)
    for (et, day), cents in sorted(daily.items(), key=lambda t: t[0][1]):
        series[et].append(cents)
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["ts_control_rules"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(series)
    for et, xs in series.items():
        n = len(xs)
        s = sum(xs)
        sxx = sum(x * x for x in xs)
        rule1 = sum(
            1 for x in xs if (n * x - s) ** 2 > 9 * (n * sxx - s * s)
        )
        runs = []
        cur_side, cur_len = 0, 0
        for x in xs:
            side = 1 if n * x - s > 0 else (-1 if n * x - s < 0 else 0)
            if side != 0 and side == cur_side:
                cur_len += 1
            else:
                if cur_side != 0:
                    runs.append(cur_len)
                cur_side, cur_len = side, 1 if side != 0 else 0
        if cur_side != 0:
            runs.append(cur_len)
        g = got[et]
        assert g["n_days"] == n
        assert g["n_beyond_3sigma"] == rule1
        assert g["longest_run"] == (max(runs) if runs else 0)
        assert g["n_runs_ge8"] == sum(1 for r in runs if r >= 8)


def test_burstiness_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n_docs = defaultdict(int)
    per = defaultdict(lambda: defaultdict(int))  # (lang, tok) -> doc -> c
    for r in docs:
        n_docs[r["lang"]] += 1
        for t in re.split("[^a-z0-9]+", (r["text"] or "").lower()):
            if t:
                per[(r["lang"], t)][r["doc_id"]] += 1
    scored = defaultdict(list)
    for (lang, tok), cnts in per.items():
        n = n_docs[lang]
        c_total = sum(cnts.values())
        s2 = sum(c * c for c in cnts.values())
        burst = (n * s2 - c_total * c_total) * 1000 // (n * c_total)
        scored[lang].append((-burst, -c_total, tok, len(cnts)))
    got = defaultdict(dict)
    for r in entrymod.queries()["text_burstiness"](spark, SF).collect():
        got[r["lang"]][r["rn"]] = r
    assert set(got) == set(scored)
    for lang, entries in scored.items():
        entries.sort()
        assert set(got[lang]) == set(range(1, min(5, len(entries)) + 1))
        for rn, (nb, nc, tok, df) in enumerate(entries[:5], 1):
            g = got[lang][rn]
            assert g["tok"] == tok
            assert g["df"] == df
            assert g["total"] == -nc
            assert g["burst_milli"] == -nb
