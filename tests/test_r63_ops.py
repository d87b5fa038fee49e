"""Round-11 batch 3 replays: degree Gini, lang assortativity, turning
points, gap stats."""

from __future__ import annotations

import calendar
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _day(ts) -> int:
    us = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    return us // 86_400_000_000


def _keeper_pairs(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    return {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }


def test_degree_gini_replays(spark):
    pairs = _keeper_pairs(spark)
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    ds = sorted(deg.values())
    n = len(ds)
    s = sum(ds)
    w = sum(i * d for i, d in enumerate(ds, start=1))
    [g] = entrymod.queries()["graph_degree_gini"](spark, SF).collect()
    assert g["n_nodes"] == n
    assert g["sum_degree"] == s
    assert g["gini_num"] == 2 * w - (n + 1) * s
    assert g["gini_den"] == n * s
    assert g["gini_milli"] == (2 * w - (n + 1) * s) * 1000 // (n * s)
    assert 0 <= g["gini_milli"] <= 1000
    assert n > 0  # fixture exercises the metric


def test_lang_assortativity_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    lang = {r["doc_id"]: r["lang"] for r in docs}
    pairs = _keeper_pairs(spark)
    el = [(lang[a], lang[b]) for a, b in pairs]
    el += [(lb, la) for la, lb in el[: len(pairs)]]
    m2 = len(el)
    same = sum(1 for a, b in el if a == b)
    marg = defaultdict(int)
    for a, _ in el:
        marg[a] += 1
    sa2 = sum(v * v for v in marg.values())
    [g] = entrymod.queries()["graph_lang_assortativity"](
        spark, SF
    ).collect()
    assert g["n_edges_directed"] == m2
    assert g["n_same_lang"] == same
    assert g["sum_marg_sq"] == sa2
    assert g["same_share_milli"] == same * 1000 // m2
    assert g["expected_share_milli"] == sa2 * 1000 // (m2 * m2)
    num = m2 * same - sa2
    den = m2 * m2 - sa2
    # trunc toward zero (Spark div / DuckDB //), not Python floor
    q = abs(num) * 1000 // den
    expect = q if num >= 0 else -q
    assert g["assortativity_milli"] == (0 if den == 0 else expect)


def _daily_cents(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in rows:
        daily[(r["event_type"], _day(r["ts"]))] += round(r["value"] * 100)
    series = defaultdict(list)
    for (et, day), cents in sorted(daily.items()):
        series[et].append((day, cents))
    return series


def test_turning_points_replays(spark):
    series = _daily_cents(spark)
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["ts_turning_points"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(series)
    for et, pts in series.items():
        xs = [c for _, c in pts]
        n = len(xs)
        turning = sum(
            1
            for i in range(1, n - 1)
            if (xs[i - 1] < xs[i] > xs[i + 1])
            or (xs[i - 1] > xs[i] < xs[i + 1])
        )
        g = got[et]
        assert g["n_days"] == n
        assert g["n_turning"] == turning
        assert g["turning_rate_milli"] == (
            0 if n < 3 else turning * 1000 // (n - 2)
        )
        assert g["expected_count_milli"] == (
            0 if n < 3 else 2000 * (n - 2) // 3
        )


def test_gap_stats_replays(spark):
    series = _daily_cents(spark)
    got = {
        r["event_type"]: r
        for r in entrymod.queries()["ts_gap_stats"](spark, SF).collect()
    }
    assert set(got) == set(series)
    for et, pts in series.items():
        days = [d for d, _ in pts]
        n = len(days)
        span = days[-1] - days[0] + 1
        gaps = [
            days[i] - days[i - 1] - 1
            for i in range(1, n)
            if days[i] - days[i - 1] > 1
        ]
        g = got[et]
        assert g["n_days"] == n
        assert g["span_days"] == span
        assert g["n_missing"] == span - n
        assert g["n_gaps"] == len(gaps)
        assert g["longest_gap"] == (max(gaps) if gaps else 0)
        # books must balance: missing days = sum of the gaps
        assert g["n_missing"] == sum(gaps)


# --- batch 6 ---------------------------------------------------------------


def test_shard_balance_replays(spark):
    import hashlib
    import re as _re

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    total = 0
    for r in docs:
        h = hashlib.md5(f"shard|{r['doc_id']}".encode()).hexdigest()[:15]
        shard = int(h, 16) % 8
        toks = len(
            [t for t in _re.split("[^a-z0-9]+", (r["text"] or "").lower()) if t]
        )
        per[shard][0] += 1
        per[shard][1] += toks
        total += toks
    got = {
        r["shard"]: r
        for r in entrymod.queries()["p_shard_balance"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    n_shards = len(per)
    for shard, (nd, nt) in per.items():
        g = got[shard]
        assert g["n_docs"] == nd
        assert g["n_tokens"] == nt
        assert g["load_milli"] == (
            0 if total == 0 else nt * n_shards * 1000 // total
        )
    # token mass is conserved across shards
    assert sum(r["n_tokens"] for r in got.values()) == total


def test_near_zero_variance_replays(spark):
    from collections import Counter

    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    got = {
        r["col"]: r
        for r in entrymod.queries()["dq_near_zero_variance"](
            spark, SF
        ).collect()
    }
    assert set(got) == {"l_quantity", "l_discount", "l_tax"}
    for col in got:
        vals = Counter(round(r[col] * 100) for r in li)
        n = sum(vals.values())
        ordered = sorted(vals.items(), key=lambda kv: (-kv[1], kv[0]))
        top1 = ordered[0][1]
        top2 = ordered[1][1] if len(ordered) > 1 else 0
        g = got[col]
        assert g["n"] == n
        assert g["n_distinct"] == len(vals)
        assert g["top1"] == top1
        assert g["top2"] == top2
        fr = top1 * 1000 // max(top2, 1)
        dp = len(vals) * 1000 // n
        assert g["freq_ratio_milli"] == fr
        assert g["distinct_per_mille"] == dp
        assert g["near_zero_var"] == (fr >= 19000 and dp < 100)


def test_power_mde_replays(spark):
    import hashlib
    import math

    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    n_a = n_b = pos = 0
    for r in rows:
        h = hashlib.md5(
            f"power|{r['event_id']}".encode()
        ).hexdigest()[:15]
        if int(h, 16) % 2 == 0:
            n_a += 1
        else:
            n_b += 1
        pos += 1 if r["event_type"] == "purchase" else 0
    n = n_a + n_b
    p_micro = pos * 1_000_000 // n
    mde = round(
        2.801585218
        * math.sqrt(
            2.0 * p_micro * (1_000_000 - p_micro) / 1e6 / min(n_a, n_b)
        )
    )
    [g] = entrymod.queries()["ab_power_mde"](spark, SF).collect()
    assert g["n_a"] == n_a
    assert g["n_b"] == n_b
    assert g["p_pooled_micro"] == p_micro
    # one IEEE sqrt + round snap on both sides: exact in practice,
    # allow the same +-1 ulp-at-the-boundary slop the Welch replays use
    assert abs(g["mde_abs_micro"] - mde) <= 1
    assert g["mde_rel_milli"] == (
        0 if pos == 0 else g["mde_abs_micro"] * 1000 // p_micro
    )
    # a detectable effect exists and shrinks with n: sanity bounds
    assert 0 < g["mde_abs_micro"] < 1_000_000


def test_hapax_rate_replays(spark):
    import re as _re

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    freq = defaultdict(lambda: defaultdict(int))
    for r in docs:
        for t in _re.split("[^a-z0-9]+", (r["text"] or "").lower()):
            if t:
                freq[r["lang"]][t] += 1
    got = {
        r["lang"]: r
        for r in entrymod.queries()["text_hapax_rate"](
            spark, SF
        ).collect()
    }
    assert set(got) == {lang for lang, f in freq.items() if f}
    for lang, f in freq.items():
        if not f:
            continue
        vocab = len(f)
        hapax = sum(1 for c in f.values() if c == 1)
        occ = sum(f.values())
        g = got[lang]
        assert g["vocab_size"] == vocab
        assert g["n_hapax"] == hapax
        assert g["total_occ"] == occ
        assert g["hapax_vocab_milli"] == hapax * 1000 // vocab
        assert g["hapax_mass_milli"] == hapax * 1000 // occ
        # hapax mass share can never exceed hapax vocab share
        assert g["hapax_mass_milli"] <= g["hapax_vocab_milli"]
