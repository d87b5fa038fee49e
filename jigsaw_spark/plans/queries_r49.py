"""Round-9 batch 9: exact autocorrelation, inter-purchase timing,
retrieval MRR, and ANN range search.

- ``ts_acf_exact``: sample autocorrelation of the daily-cents series
  at lags 1..7 per event type — the EXACT-INTEGER twin of
  ``ts_autocorr`` (r10), which snaps the series mean to an integer
  anchor and emits one final double ratio at lags 1..3. Here the mean
  never exists at all: with u_t = n*x_t - S (integers), r_l =
  sum(u_t * u_{t+l}) / sum(u_t^2) — the n^2 factors cancel, so
  acf_milli is a pure integer ratio; and the lags extend to 7, so the
  weekly spike ts_mase / ts_pinball_loss ASSUME is itself measured.
- ``rel_order_gap_median``: median and p90 inter-order gap in days per
  market segment — the re-engagement cadence behind churn windows and
  campaign timing (rel_retention_cohorts counts who returns; this says
  how long returns take). Exact rank selection over the bounded
  (segment, gap-days) value domain.
- ``ml_mrr_exact``: mean reciprocal rank of the first same-label
  neighbor in the brute-force cosine top-10, per label — THE retrieval
  eval metric next to recall/NDCG (ml_ndcg_exact grades a graded
  ranking; MRR grades find-one-relevant, the embedding-space label
  purity that decides whether nearest-neighbor curation is usable).
  EXACT: reciprocal ranks are scaled by 2520 = lcm(1..10) so every
  1/rank is an integer; only the final mean divides.
- ``ann_range_search``: threshold (range) search over the IVF index —
  the OTHER fundamental ANN API next to top-k (ivf_topk answers "the
  k nearest", this answers "everything at least this similar":
  duplicate sweeps, safety-radius checks, score-floored neighbor
  joins). Same codebook/probe config as ann_ivf_topk; deterministic
  recall, so the oracle replicates the cell restriction exactly.

Scale notes (100 TB): ACF pre-aggregates to day grain before anything
else (the MASE discipline) and its lag joins are day-dim-sized; the
gap query shuffles facts once on the natural customer key, then all
windows run over the bounded (segment, gap) dim; MRR's candidate
stage is the documented brute-force baseline (at scale the candidate
generator swaps to ivf_topk — the eval arithmetic is unchanged);
range search is strictly cheaper than top-k at scale — the threshold
is a map-side predicate, so there is NO per-query rank window at all,
and the corpus is scanned once and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.eval_panel import PANEL_TOPK_CTE
from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ts_acf_exact
# ---------------------------------------------------------------------------

_ACF_SQL = """
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    tot AS MATERIALIZED (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(cents) AS BIGINT) AS s
      FROM daily GROUP BY 1),
    u AS MATERIALIZED (
      SELECT d.event_type, d.day,
             CAST(t.n_days * d.cents - t.s AS HUGEINT) AS u
      FROM daily d JOIN tot t ON d.event_type = t.event_type),
    den AS (
      SELECT event_type, CAST(sum(u * u) AS HUGEINT) AS den
      FROM u GROUP BY 1),
    lags AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag),
    num AS (
      SELECT a.event_type, l.lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(a.u * b.u) AS HUGEINT) AS num
      FROM u a
      CROSS JOIN lags l
      JOIN u b ON b.event_type = a.event_type AND b.day = a.day + l.lag
      GROUP BY 1, 2)
    SELECT n.event_type, CAST(n.lag AS INT) AS lag,
           CAST(t.n_days AS BIGINT) AS n_days,
           CAST(n.n_pairs AS BIGINT) AS n_pairs,
           CAST(CASE WHEN d.den = 0 THEN 0
                ELSE n.num * 1000 // d.den END AS BIGINT) AS acf_milli
    FROM num n
    JOIN den d ON n.event_type = d.event_type
    JOIN tot t ON n.event_type = t.event_type
"""


@register(
    "ts_acf_exact",
    _ACF_SQL,
    "sample autocorrelation of the per-type daily-cents series at lags "
    "1..7: r_l = sum((x_t - m)(x_{t+l} - m)) / sum((x_t - m)^2) with "
    "the numerator over observed day pairs (t, t+l) — the diagnostic "
    "that says whether yesterday predicts today, and whether the "
    "weekly seasonality ts_mase/ts_pinball_loss ASSUME actually exists "
    "(a lag-7 spike is that assumption, made a number). This is the "
    "EXACT-INTEGER twin of ts_autocorr (r10, quantized-anchor mean + "
    "one final double at lags 1..3): scale each centered value by n — "
    "u_t = n*x_t - S is an integer — and the n^2 factors cancel in "
    "the ratio, so acf_milli = sum(u_t*u_{t+l}) * 1000 div sum(u_t^2) "
    "is pure integer arithmetic; the mean never exists even as a "
    "snapped anchor (signed division truncates toward zero identically "
    "on both engines; a constant series has den = 0 and reports 0). "
    "Shape: day-grain pre-agg BEFORE anything else (the MASE "
    "discipline), per-type totals broadcast back, 7 shifted-key joins "
    "against the day-grain dim — every post-agg relation is "
    "day-dim-sized, never facts",
)
def ts_acf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    dec = "decimal(38,0)"
    u = (
        daily.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "day",
            (F.col("n_days") * F.col("cents") - F.col("s"))
            .cast(dec)
            .alias("u"),
        )
        .localCheckpoint()
    )
    den = u.groupBy("event_type").agg(
        F.sum(F.col("u") * F.col("u")).alias("den")
    )
    lags = F.broadcast(
        spark.createDataFrame([(i,) for i in range(1, 8)], "lag int")
    )
    a = u.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("day_a"),
        F.col("u").alias("ua"),
    ).crossJoin(lags)
    b = u.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("day_b"),
        F.col("u").alias("ub"),
    )
    num = (
        a.join(
            b,
            (F.col("et") == F.col("et_b"))
            & (F.col("day_b") == F.col("day_a") + F.col("lag")),
        )
        .groupBy(F.col("et").alias("event_type"), "lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("ua") * F.col("ub")).alias("num"),
        )
    )
    return (
        num.join(F.broadcast(den), "event_type")
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            F.col("n_days").cast("bigint").alias("n_days"),
            "n_pairs",
            F.expr(
                "CAST(CASE WHEN den = 0 THEN 0"
                " ELSE num * 1000 div den END AS BIGINT)"
            ).alias("acf_milli"),
        )
    )


# ---------------------------------------------------------------------------
# rel_order_gap_median
# ---------------------------------------------------------------------------

_ORDER_GAP_SQL = """
    WITH o AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey,
             epoch_us(o.o_orderdate) // 86400000000 AS day,
             o.o_orderkey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    gaps AS (
      SELECT seg,
             day - lag(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day, o_orderkey) AS gap
      FROM o),
    g AS MATERIALIZED (
      SELECT seg, gap, CAST(count(*) AS BIGINT) AS c
      FROM gaps WHERE gap IS NOT NULL GROUP BY 1, 2),
    cum AS (
      SELECT seg, gap, c,
             sum(c) OVER (PARTITION BY seg ORDER BY gap) AS cum,
             sum(c) OVER (PARTITION BY seg) AS n
      FROM g)
    SELECT seg AS c_mktsegment,
           CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN gap END)
                AS BIGINT) AS median_gap_days,
           CAST(min(CASE WHEN cum * 10 >= n * 9 THEN gap END)
                AS BIGINT) AS p90_gap_days
    FROM cum GROUP BY 1
"""


@register(
    "rel_order_gap_median",
    _ORDER_GAP_SQL,
    "median and p90 inter-order gap in days per market segment — the "
    "re-engagement cadence behind churn windows and campaign timing "
    "(rel_retention_cohorts counts who returns; this says how LONG "
    "returns take, and p90 is where the win-back email goes). Gaps "
    "are day differences between a customer's consecutive orders "
    "(ordered by day then order key — a total order, so ties are "
    "deterministic); the lower median is the smallest gap whose "
    "cumulative count reaches ceil(n/2), p90 the smallest reaching "
    "ceil(0.9n) — pure integer rank selection, exact on both engines. "
    "Shape: facts shuffle ONCE on the natural customer key for the "
    "lag window (customer dim broadcast), then collapse to the "
    "bounded (segment, gap-days) value dim — the rank-selection "
    "windows run over that dim, never over facts (the rolling-median "
    "discipline)",
)
def rel_order_gap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("seg"),
        "o_custkey",
        # o_orderdate reads as TIMESTAMP_NTZ; cast to LTZ under the UTC
        # session so unix_micros == DuckDB epoch_us (the r27 pattern)
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000"
        ).alias("day"),
        "o_orderkey",
    )
    wl = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = o.select(
        "seg", (F.col("day") - F.lag("day").over(wl)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    g = gaps.groupBy("seg", "gap").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wc = (
        Window.partitionBy("seg")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("seg")
    cum = g.select(
        "seg",
        "gap",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    return cum.groupBy(F.col("seg").alias("c_mktsegment")).agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n + 1) div 2"), F.col("gap")
            )
        )
        .cast("bigint")
        .alias("median_gap_days"),
        F.min(
            F.when(F.col("cum") * 10 >= F.col("n") * 9, F.col("gap"))
        )
        .cast("bigint")
        .alias("p90_gap_days"),
    )


# ---------------------------------------------------------------------------
# ml_mrr_exact
# ---------------------------------------------------------------------------

_COS = (
    "list_cosine_similarity({a}.embedding::DOUBLE[], {b}.embedding::DOUBLE[])"
)

_MRR_SQL = f"""
    WITH {PANEL_TOPK_CTE},
    hits AS (
      SELECT query_id, qlabel,
             min(CASE WHEN clabel = qlabel AND rank <= 10
                      THEN rank END) AS first_rel
      FROM ranked GROUP BY 1, 2),
    rr AS (
      SELECT qlabel,
             CASE WHEN first_rel IS NULL THEN 0
                  ELSE 2520 // first_rel END AS rr_scaled
      FROM hits)
    SELECT CAST(qlabel AS INT) AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN rr_scaled > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hit,
           CAST(sum(rr_scaled) AS BIGINT) AS sum_rr_scaled,
           CAST(sum(rr_scaled) * 1000000 // (2520 * count(*)) AS BIGINT)
             AS mrr_micro
    FROM rr GROUP BY 1
"""


@register(
    "ml_mrr_exact",
    _MRR_SQL,
    "mean reciprocal rank of the first SAME-LABEL neighbor in the "
    "brute-force cosine top-10, per label, over a FIXED 200-vector "
    "eval panel querying the full corpus (self excluded) — THE "
    "find-one-relevant retrieval metric "
    "next to recall/NDCG (ml_ndcg_exact grades a graded spend ranking; "
    "MRR grades embedding-space label purity, the number that decides "
    "whether nearest-neighbor curation / kNN labeling is usable at "
    "all; queries with no top-10 hit contribute 0). EXACT: reciprocal "
    "ranks are scaled by 2520 = lcm(1..10), so 1/rank is an integer "
    "for every rank <= 10 and only the final mean divides (floor, "
    "micro units); ranking ties are round-9 + vec_id, the ANN family "
    "convention. Shape: the candidate stage is the documented "
    "brute-force baseline over the PANEL (broadcast 200-query side, "
    "corpus scanned once — cost is linear in the corpus, the panel is "
    "the eval-set convention every production metric uses; at scale "
    "the candidate generator swaps to ivf_topk and the eval "
    "arithmetic is unchanged); everything after the top-10 is "
    "label-dim-sized",
)
def ml_mrr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.eval_panel import labeled_panel_topk

    hits = (
        labeled_panel_topk(spark, sf_dir, _t)
        .groupBy("query_id", "qlabel")
        .agg(
            F.min(
                F.when(
                    F.col("clabel") == F.col("qlabel"), F.col("rank")
                )
            ).alias("first_rel")
        )
    )
    rr = hits.select(
        "qlabel",
        F.expr(
            "CASE WHEN first_rel IS NULL THEN 0"
            " ELSE 2520 div first_rel END"
        ).alias("rr_scaled"),
    )
    return rr.groupBy(F.col("qlabel").cast("int").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.when(F.col("rr_scaled") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hit"),
        F.sum("rr_scaled").cast("bigint").alias("sum_rr_scaled"),
        F.expr(
            "CAST(sum(rr_scaled) * 1000000 div (2520 * count(*))"
            " AS BIGINT)"
        ).alias("mrr_micro"),
    )


# ---------------------------------------------------------------------------
# ann_range_search
# ---------------------------------------------------------------------------

_IVF_COS = (
    "round(list_cosine_similarity({a}.embedding::DOUBLE[], {b}.cvec), 9)"
)

_RANGE_SQL = f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id < 8
    ), assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_IVF_COS.format(a='e', b='c')} DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c) t
      WHERE rn = 1
    ), probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cid AS cell,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_IVF_COS.format(a='q', b='c')} DESC, c.cid) AS rn
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < 5) t
      WHERE rn <= 2
    )
    SELECT p.query_id, a.vec_id,
           round({_COS.format(a='q', b='e')}, 4) AS cosine
    FROM probes p
    JOIN assign a ON a.cell = p.cell
    JOIN embeddings q ON q.vec_id = p.query_id
    JOIN embeddings e ON e.vec_id = a.vec_id
    WHERE a.vec_id <> p.query_id
      AND round({_COS.format(a='q', b='e')}, 9) >= 0.3
"""


@register(
    "ann_range_search",
    _RANGE_SQL,
    "threshold (range) search over the IVF index: every vector in the "
    "query's 2 probed cells with round-9 cosine >= 0.3 — the OTHER "
    "fundamental ANN API next to top-k (ivf_topk answers 'the k "
    "nearest', this answers 'everything at least this similar': "
    "duplicate sweeps, safety-radius checks, score-floored neighbor "
    "joins). Same 8-seed codebook and nprobe=2 as ann_ivf_topk; "
    "recall follows the IVF tradeoff and is fully deterministic, so "
    "the oracle replicates the cell restriction exactly (queries with "
    "no match in range emit no row, identically on both engines). "
    "Shape: strictly CHEAPER than top-k at scale — the threshold is a "
    "map-side predicate after the one cell equi-join, so there is no "
    "per-query rank window and no sort anywhere; the corpus is "
    "scanned once and never shuffled (map-only cell assignment, "
    "broadcast codebook + probe list)",
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import ivf_range_search

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    return ivf_range_search(
        emb, queries, centroids, threshold=0.3, nprobe=2
    )
