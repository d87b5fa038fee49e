"""Round-5 batches 2-3: semantic checks against pure-Python references
(Hilbert curve replay, set-algebra overlap, BFS replay, credit
conservation, chi-square reconstruction, histogram bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _hilbert_xy2d(n: int, x: int, y: int) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_stages_match_python_reference(spark):
    """The 8-stage SQL walk must equal the classic xy2d for every cell
    of a 32-point sample grid, and adjacent d values must be grid
    neighbors (the locality property Morton lacks)."""
    from jigsaw_spark.plans.queries_r8 import _HIL_N, _hilbert_stage_exprs

    pts = [(x, y) for x in range(0, 256, 37) for y in range(0, 256, 41)]
    df = spark.createDataFrame(pts, "px int, py int").selectExpr(
        "px", "py",
        "CAST(px AS BIGINT) AS x", "CAST(py AS BIGINT) AS y",
        "CAST(0 AS BIGINT) AS d",
    )
    s = _HIL_N // 2
    while s > 0:
        exprs = _hilbert_stage_exprs(s, "px")
        df = df.selectExpr(exprs[0], "py", *exprs[1:])
        s //= 2
    got = {(r["px"], r["py"]): r["d"] for r in df.collect()}
    for (x, y), d in got.items():
        assert d == _hilbert_xy2d(_HIL_N, x, y), (x, y)

    # full-curve adjacency on a small grid: consecutive d = unit step
    n = 16
    inv = {_hilbert_xy2d(n, x, y): (x, y) for x in range(n) for y in range(n)}
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_bitmap_overlap_matches_set_algebra(spark):
    got = {
        (r["p1"], r["p2"]): (r["n1"], r["n2"], r["n_both"], r["n_union"])
        for r in entrymod.queries()["agg_bitmap_overlap"](spark, SF).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority", "o_custkey"
    )
    sets: dict[str, set] = {}
    for r in orders.collect():
        sets.setdefault(r["o_orderpriority"], set()).add(r["o_custkey"])
    ps = sorted(sets)
    assert len(got) == len(ps) * (len(ps) - 1) // 2
    for i, p1 in enumerate(ps):
        for p2 in ps[i + 1 :]:
            a, b = sets[p1], sets[p2]
            assert got[(p1, p2)] == (
                len(a),
                len(b),
                len(a & b),
                len(a | b),
            ), (p1, p2)


def test_bfs_layers_match_python_bfs(spark):
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4).collect()
    adj: dict[int, set] = {}
    for r in pairs:
        adj.setdefault(r["doc_a"], set()).add(r["doc_b"])
        adj.setdefault(r["doc_b"], set()).add(r["doc_a"])
    seeds = sorted(v for v in adj if v % 97 == 0)
    dist = {v: 0 for v in seeds}
    frontier = list(seeds)
    for depth in range(1, 5):
        nxt = []
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = depth
                    nxt.append(w)
        frontier = nxt
    got = {
        r["node"]: r["dist"]
        for r in entrymod.queries()["graph_bfs_layers"](spark, SF).collect()
    }
    assert got == dist


def test_attribution_linear_conserves_credit(spark):
    """Summed micro-credit over clicks must equal, per purchase,
    n * (1e6 // n) — floor division's exact total."""
    rows = entrymod.queries()["rel_attribution_linear"](spark, SF).collect()
    total_credit = sum(r["credit_micro"] for r in rows)
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "event_id", "ts", "event_type"
    )
    clicks: dict[int, list] = {}
    purchases: dict[int, list] = {}
    for r in ev.collect():
        if r["event_type"] == "click":
            clicks.setdefault(r["user_id"], []).append(r["ts"])
        elif r["event_type"] == "purchase":
            purchases.setdefault(r["user_id"], []).append(r["ts"])
    expect = 0
    for uid, pts in purchases.items():
        cl = clicks.get(uid, [])
        for pt in pts:
            n = sum(1 for ct in cl if ct < pt)
            if n:
                expect += n * (1000000 // n)
    assert total_credit == expect


def test_chi2_terms_reconstruct_statistic(spark):
    rows = entrymod.queries()["ab_chi2_independence"](spark, SF).collect()
    n = sum(r["observed"] for r in rows)
    # expectations sum back to ~n (each cell rounded to 4 decimals)
    assert abs(sum(r["expected"] for r in rows) - n) < 0.01 * len(rows)
    assert all(r["chi2_term"] >= 0 for r in rows)
    types = {r["event_type"] for r in rows}
    variants = {r["variant"] for r in rows}
    assert len(rows) == len(types) * len(variants)


def test_log2_histogram_bounds_contain_values(spark):
    rows = entrymod.queries()["agg_log2_histogram"](spark, SF).collect()
    for r in rows:
        assert r["bucket_lo"] == 2 ** r["bucket"]
        assert r["bucket_hi"] == 2 ** (r["bucket"] + 1) - 1
        # mean of the bucket's values must lie inside the bucket
        mean = r["sum_cents"] / r["n"]
        assert r["bucket_lo"] <= mean <= r["bucket_hi"]


def test_interval_overlap_bounded_by_session_span(spark):
    rows = entrymod.queries()["j9_interval_overlap"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["overlap_secs"] <= r["n_windows"] * 8 * 3600 + 1
