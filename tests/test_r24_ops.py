"""Round-6 batch 1: semantic replays (as-of carry, sweep-line peak,
SoftDeDup mass law, novelty/repetition recompute, ridge closed form,
seasonal-naive MAE)."""

from __future__ import annotations

from collections import Counter, defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").collect()


def test_asof_join_replays_carry_forward(spark):
    rows = _events(spark)
    right = defaultdict(dict)  # user -> t -> max cents
    for r in rows:
        if r["event_type"] == "purchase":
            t = int(r["ts"].timestamp() * 1_000_000)
            c = int(round(r["value"] * 100))
            u = r["user_id"]
            right[u][t] = max(right[u].get(t, -(10**18)), c)
    got = {
        r["event_id"]: (r["t_micros"], r["asof_cents"], r["lag_micros"])
        for r in entrymod.queries()["j12_asof_join"](spark, SF).collect()
    }
    n_views = 0
    for r in rows:
        if r["event_type"] != "view":
            continue
        n_views += 1
        t = int(r["ts"].timestamp() * 1_000_000)
        candidates = [(rt, v) for rt, v in right[r["user_id"]].items() if rt <= t]
        if candidates:
            rt, v = max(candidates)  # greatest ts at-or-before
            want = (t, v, t - rt)
        else:
            want = (t, -1, -1)
        assert got[r["event_id"]] == want, r["event_id"]
    assert len(got) == n_views


def test_max_concurrency_replays_sweep_line(spark):
    rows = _events(spark)
    deltas = defaultdict(int)
    for r in rows:
        s = int(r["ts"].timestamp() * 1_000_000)
        e = s + int(round(r["value"] * 1_000_000))
        deltas[s] += 1
        deltas[e] -= 1
    conc, best, at = 0, -1, None
    for t in sorted(deltas):
        conc += deltas[t]
        if conc > best:
            best, at = conc, t
    out = entrymod.queries()["rel_max_concurrency"](spark, SF).collect()
    assert len(out) == 1
    r = out[0]
    assert r["max_concurrency"] == best
    assert r["at_micros"] == at
    assert r["n_intervals"] == len(rows)


def test_soft_dedup_weight_mass_law(spark):
    out = entrymod.queries()["curation_soft_dedup_weights"](
        spark, SF
    ).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(out) == docs.count()
    by_cluster = defaultdict(list)
    for r in out:
        assert r["weight_micro"] == 1_000_000 // r["cluster_size"]
        by_cluster[r["keeper"]].append(r)
    for keeper, members in by_cluster.items():
        size = members[0]["cluster_size"]
        assert len(members) == size, keeper
        assert keeper == min(m["doc_id"] for m in members)
        # mass law: cluster weight sums to 1e6 minus only the floor loss
        total = sum(m["weight_micro"] for m in members)
        assert 1_000_000 - size < total <= 1_000_000


def test_component_size_hist_matches_weights_query(spark):
    weights = entrymod.queries()["curation_soft_dedup_weights"](
        spark, SF
    ).collect()
    sizes = {}
    for r in weights:
        sizes[r["keeper"]] = r["cluster_size"]
    want = defaultdict(lambda: [0, 0])
    for sz in sizes.values():
        b = sz.bit_length() - 1  # == len(bin(sz)) - 1 for sz >= 1
        want[b][0] += 1
        want[b][1] += sz
    got = {
        r["bucket"]: (r["n_clusters"], r["n_docs"])
        for r in entrymod.queries()["graph_component_size_hist"](
            spark, SF
        ).collect()
    }
    assert got == {b: tuple(v) for b, v in want.items()}


def test_ngram_novelty_replays_first_holder(spark):
    from jigsaw_spark.operators.dedup import doc_shingles

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = defaultdict(set)
    for r in doc_shingles(docs, "doc_id").collect():
        sh[r["doc_id"]].add(r["shingle"])
    first = {}
    for d in sorted(sh):
        for s in sh[d]:
            first.setdefault(s, d)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_micro"])
        for r in entrymod.queries()["text_ngram_novelty"](spark, SF).collect()
    }
    assert set(got) == set(sh)
    for d, grams in sh.items():
        novel = sum(1 for s in grams if first[s] == d)
        assert got[d] == (
            len(grams),
            novel,
            novel * 1_000_000 // len(grams),
        ), d
    # the smallest doc id holds every one of its shingles first
    dmin = min(sh)
    assert got[dmin][2] == 1_000_000


def test_repetition_score_replays_counter(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.text import shingles_expr, tokens_expr

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    per_doc = defaultdict(Counter)
    exploded = docs.select(
        "doc_id", F.explode(shingles_expr(tokens_expr("text"))).alias("s")
    ).collect()
    for r in exploded:
        per_doc[r["doc_id"]][r["s"]] += 1
    got = {
        r["doc_id"]: (r["n_grams"], r["top_gram_n"], r["repetition_micro"])
        for r in entrymod.queries()["text_repetition_score"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per_doc)
    for d, cnt in per_doc.items():
        tot, top = sum(cnt.values()), max(cnt.values())
        assert got[d] == (tot, top, top * 1_000_000 // tot), d


def test_repetition_score_flags_degenerate_loop(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.text import shingles_expr, tokens_expr

    df = spark.createDataFrame(
        [
            (1, "spam " * 50),
            (2, "a genuinely varied sentence with many distinct words here"),
        ],
        "doc_id int, text string",
    )
    cnt = (
        df.select(
            "doc_id", F.explode(shingles_expr(tokens_expr("text"))).alias("s")
        )
        .groupBy("doc_id", "s")
        .count()
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(max(count) * 1000000 div sum(count) AS BIGINT)").alias(
                "rep"
            )
        )
        .collect()
    )
    rep = {r["doc_id"]: r["rep"] for r in cnt}
    assert rep[1] == 1_000_000  # one shingle repeated 48 times
    assert rep[2] < 200_000


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_ridge_2feature_replays_integer_closed_form(spark):
    LAM = 1_000_000_000
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    pts = defaultdict(list)
    for r in li:
        pts[r["l_linestatus"]].append(
            (
                int(round(r["l_quantity"])),
                int(round(r["l_tax"] * 100)),
                int(round(r["l_extendedprice"] * 100)),
            )
        )
    got = {
        r["l_linestatus"]: (
            r["n"],
            r["b1_micro"],
            r["b2_micro"],
            r["b0_micro"],
        )
        for r in entrymod.queries()["ml_ridge_2feature"](spark, SF).collect()
    }
    for grp, rows in pts.items():
        n = len(rows)
        m1 = sum(x1 for x1, _, _ in rows) // n
        m2 = sum(x2 for _, x2, _ in rows) // n
        my = sum(y for _, _, y in rows) // n
        suu = sum((x1 - m1) ** 2 for x1, _, _ in rows)
        svv = sum((x2 - m2) ** 2 for _, x2, _ in rows)
        suv = sum((x1 - m1) * (x2 - m2) for x1, x2, _ in rows)
        suy = sum((x1 - m1) * (y - my) for x1, _, y in rows)
        svy = sum((x2 - m2) * (y - my) for _, x2, y in rows)
        det = (suu + LAM) * (svv + LAM) - suv * suv
        assert det > 0  # Cauchy-Schwarz + lambda
        b1 = _tdiv((suy * (svv + LAM) - svy * suv) * 1_000_000, det)
        b2 = _tdiv((svy * (suu + LAM) - suy * suv) * 1_000_000, det)
        b0 = my * 1_000_000 - b1 * m1 - b2 * m2
        assert got[grp] == (n, b1, b2, b0), grp


def test_seasonal_naive_replays_mae(spark):
    rows = _events(spark)
    daily = defaultdict(int)
    for r in rows:
        d = int(r["ts"].timestamp() * 1_000_000) // 86_400_000_000
        daily[d] += int(round(r["value"] * 100))
    per_dow = defaultdict(list)
    for d, c in daily.items():
        if d - 7 in daily:
            per_dow[d % 7].append(abs(c - daily[d - 7]))
    got = {
        r["dow"]: (r["n_days"], r["sum_abs_err_cents"], r["mae_cents_micro"])
        for r in entrymod.queries()["ts_seasonal_naive"](spark, SF).collect()
    }
    assert set(got) == set(per_dow)
    for dow, errs in per_dow.items():
        assert got[dow] == (
            len(errs),
            sum(errs),
            sum(errs) * 1_000_000 // len(errs),
        ), dow


def test_seasonal_naive_bucketing_floor_consistent_pre_1970(spark):
    """Spark `x div y` AND DuckDB integer `//` both truncate toward zero
    (DuckDB floors only for non-integer operands), and Spark pmod is
    non-negative while DuckDB `%` takes the dividend's sign — for
    pre-1970 timestamps (negative epoch micros) naive bucketing diverges
    from floor semantics (r6 advisor). The registered query and oracle
    both use the subtract-pmod floor form; replay both engines' exact
    expressions over negative and positive micros and pin them to
    Python's floor semantics."""
    import duckdb

    day = 86_400_000_000
    micros = [
        -3 * day - 1, -3 * day, -1, 0, 1, day - 1, day, 15 * day + 12345,
    ]
    df = spark.createDataFrame([(m,) for m in micros], "us bigint")
    got_spark = {
        r.us: (r.d, r.dow)
        for r in df.selectExpr(
            "us",
            f"(us - pmod(us, {day})) div {day} as d",
            f"cast(pmod((us - pmod(us, {day})) div {day}, 7) as int) as dow",
        ).collect()
    }
    con = duckdb.connect()
    got_duck = {
        us: (d, dow)
        for us, d, dow in con.execute(
            f"""
            WITH b AS (
              SELECT us,
                     (us - (((us % {day}) + {day}) % {day})) // {day} AS d
              FROM (SELECT unnest(?::BIGINT[]) AS us))
            SELECT us, CAST(d AS BIGINT) AS d,
                   CAST(((d % 7) + 7) % 7 AS INT) AS dow
            FROM b
            """,
            [micros],
        ).fetchall()
    }
    for m in micros:
        want = (m // day, (m // day) % 7)  # Python // and % both floor
        assert got_spark[m] == want, (m, got_spark[m], want)
        assert got_duck[m] == want, (m, got_duck[m], want)
