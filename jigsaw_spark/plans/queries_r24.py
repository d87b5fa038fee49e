"""Round-6 batch 1: temporal joins, interval analytics, SoftDeDup, and
text-novelty curation signals —

- ``j12_asof_join``: the as-of (point-in-time) join Spark lacks as a
  built-in — each left event enriched with the latest right-side value
  at or before its timestamp, implemented as ONE union + per-key
  carry-forward window (no range-join explosion); DuckDB's native
  ``ASOF LEFT JOIN`` is the oracle.
- ``rel_max_concurrency``: sweep-line max-concurrent-intervals with a
  bucketed two-phase prefix sum (no global single-partition window at
  corpus scale).
- ``curation_soft_dedup_weights``: SoftDeDup — instead of dropping
  near-dups, weight every doc by 1/|cluster| (integer micro-units) so
  the training distribution stays unbiased while duplicated content
  stops dominating; clusters from the C4-ordered keeper mapping.
- ``graph_component_size_hist``: log2 histogram of near-dup cluster
  sizes — the dedup-health report (mass in big clusters = boilerplate
  farms) on the same keeper mapping.
- ``text_ngram_novelty``: per-doc fraction of trigrams whose corpus-wide
  FIRST holder (min doc id) is the doc itself — the novelty/redundancy
  curation signal.
- ``text_repetition_score``: top-trigram repetition ratio per doc — the
  degenerate-loop detector for model-generated text.
- ``ml_ridge_2feature``: closed-form ridge regression (2 features) in
  exact anchor-centered integer arithmetic — the regularized twin of
  ml_ols_2feature; Cauchy-Schwarz makes the ridge determinant strictly
  positive, so no degenerate branch is reachable with lambda > 0.
- ``ts_seasonal_naive``: seasonal-naive backtest (predict day d with day
  d-7) with per-weekday exact integer MAE — the forecasting baseline
  every anomaly alert should beat.

Float discipline: NO doubles in this module (every ratio is an integer
micro-unit floor division; money stays in cents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# j12_asof_join
# ---------------------------------------------------------------------------

_ASOF_SQL = """
    WITH l AS (
      SELECT event_id, user_id, epoch_us(ts) AS t
      FROM events WHERE event_type = 'view'),
    r AS (
      SELECT user_id, epoch_us(ts) AS t,
             max(CAST(round(value * 100, 0) AS BIGINT)) AS rv
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2)
    SELECT l.event_id,
           CAST(l.t AS BIGINT) AS t_micros,
           CAST(coalesce(r.rv, -1) AS BIGINT) AS asof_cents,
           CAST(coalesce(l.t - r.t, -1) AS BIGINT) AS lag_micros
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.t
"""


@register(
    "j12_asof_join",
    _ASOF_SQL,
    "as-of (point-in-time) join: every 'view' event enriched with the "
    "latest same-user 'purchase' cents at or before its timestamp — "
    "the feature-store / market-data temporal join, driven through "
    "the library operator (operators/joins.asof_join: union-tag + ONE "
    "per-key carry window, no range-join explosion; right side "
    "pre-aggregated per (user, ts) so the carry is deterministic). "
    "What this query adds over the j5 family is the ORACLE: DuckDB's "
    "NATIVE ASOF LEFT JOIN cross-validates the union+carry "
    "formulation against an independent engine implementation of the "
    "same semantics",
)
def j12_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    t = F.unix_micros("ts")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    left = ev.filter(F.col("event_type") == "view").select(
        "user_id", t.alias("t"), F.col("event_id")
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", t.alias("t"), cents.alias("rv"))
        .groupBy("user_id", "t")
        .agg(F.max("rv").alias("rv"))
    )
    joined = asof_join(left, right, on=["user_id"], ts="t")
    return joined.select(
        "event_id",
        F.col("t").cast("bigint").alias("t_micros"),
        F.coalesce("r_rv", F.lit(-1)).cast("bigint").alias("asof_cents"),
        F.coalesce(F.col("t") - F.col("r_t"), F.lit(-1))
        .cast("bigint")
        .alias("lag_micros"),
    )


# ---------------------------------------------------------------------------
# rel_max_concurrency
# ---------------------------------------------------------------------------

_CONC_SQL = """
    WITH iv AS (
      SELECT epoch_us(ts) AS s,
             epoch_us(ts) + CAST(round(value * 1000000, 0) AS BIGINT) AS e
      FROM events),
    pts AS (
      SELECT s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d FROM iv),
    net AS (SELECT t, sum(d) AS net FROM pts GROUP BY t),
    run AS (
      SELECT t, sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc
      FROM net),
    mx AS (SELECT max(conc) AS cmax FROM run)
    SELECT CAST(cmax AS BIGINT) AS max_concurrency,
           CAST(min(t) AS BIGINT) AS at_micros,
           (SELECT CAST(count(*) AS BIGINT) FROM iv) AS n_intervals
    FROM run, mx WHERE conc = cmax GROUP BY cmax
"""

_CONC_BUCKET_US = 3_600_000_000  # 1 hour


@register(
    "rel_max_concurrency",
    _CONC_SQL,
    "sweep-line max concurrent intervals ([start, start+value-seconds) "
    "per event) — the capacity-planning primitive. Deltas aggregate "
    "per distinct timestamp first (end-exclusive: -1 and +1 at one "
    "instant net out), then the prefix sum runs TWO-PHASE: an "
    "hour-bucket-partitioned running sum plus a tiny prefix over "
    "per-bucket totals (bucket count is bounded by the time span, "
    "never by row count), so no global single-partition window "
    "touches corpus-scale data. Peak tie-break = earliest instant. "
    "Oracle runs the plain global-window form — identical arithmetic",
)
def rel_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = F.unix_micros("ts")
    e = s + F.round(F.col("value") * 1_000_000, 0).cast("bigint")
    iv = ev.select(s.alias("s"), e.alias("e"))
    pts = iv.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    net = pts.groupBy("t").agg(F.sum("d").alias("net"))
    bucketed = net.withColumn(
        "b", F.expr(f"t div {_CONC_BUCKET_US}")
    )
    win_in = (
        Window.partitionBy("b")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    inb = bucketed.withColumn("wsum", F.sum("net").over(win_in))
    # per-bucket totals: rows = number of hours in the span (driver-
    # bounded dim, NOT corpus-sized) — the one global window runs here
    btot = bucketed.groupBy("b").agg(F.sum("net").alias("bt"))
    win_b = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    boff = btot.withColumn(
        "off", F.coalesce(F.sum("bt").over(win_b), F.lit(0))
    ).select("b", "off")
    conc = inb.join(F.broadcast(boff), "b").select(
        "t", (F.col("off") + F.col("wsum")).alias("conc")
    )
    mx = conc.agg(F.max("conc").alias("cmax"))
    n_iv = iv.count()
    return (
        conc.join(F.broadcast(mx), conc["conc"] == mx["cmax"])
        .groupBy("cmax")
        .agg(F.min("t").alias("at"))
        .select(
            F.col("cmax").cast("bigint").alias("max_concurrency"),
            F.col("at").cast("bigint").alias("at_micros"),
            F.lit(n_iv).cast("bigint").alias("n_intervals"),
        )
    )


# ---------------------------------------------------------------------------
# curation_soft_dedup_weights / graph_component_size_hist — both consume
# the C4-ordered keeper mapping (operators/dedup.near_dup_keepers)
# ---------------------------------------------------------------------------


def _keeper_cluster_sql() -> str:
    """Shared oracle CTE chain: doc → near-dup cluster keeper → cluster
    sizes. The oracle builds the SimHash graph over ALL docs (the
    semantic spec); Spark runs the exact-dedup-first composition, which
    is result-identical (see near_dup_keepers)."""
    from jigsaw_spark.plans.queries_llm import _SIMHASH_CTE

    return f"""
    WITH RECURSIVE {_SIMHASH_CTE},
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM prs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM prs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS MATERIALIZED (
      SELECT u AS doc_id, least(u, min(v)) AS keeper
      FROM reach GROUP BY u),
    assigned AS MATERIALIZED (
      SELECT d.doc_id, coalesce(c.keeper, d.doc_id) AS keeper
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
    clusters AS MATERIALIZED (
      SELECT keeper, count(*) AS cluster_size
      FROM assigned GROUP BY keeper)
"""


@register(
    "curation_soft_dedup_weights",
    _keeper_cluster_sql()
    + """
    SELECT a.doc_id,
           CAST(a.keeper AS BIGINT) AS keeper,
           CAST(c.cluster_size AS BIGINT) AS cluster_size,
           CAST(1000000 // c.cluster_size AS BIGINT) AS weight_micro
    FROM assigned a JOIN clusters c ON a.keeper = c.keeper
    """,
    "SoftDeDup: weight every document by 1/|near-dup cluster| (integer "
    "micro-units) instead of dropping duplicates — total cluster mass "
    "stays ~constant, so duplicated content stops dominating the "
    "training mix without the recall risk of hard removal. Clusters "
    "come from the C4-ordered keeper mapping (exact dedup -> SimHash "
    "components over keepers, result-identical to the all-docs graph); "
    "after it, ONE keeper-keyed count + ONE join back. The weights "
    "feed the same weighted samplers as DSIR (p_weighted_sample)",
)
def curation_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import near_dup_keepers

    docs = _t(spark, sf_dir, "documents")
    assigned = near_dup_keepers(docs, "doc_id")
    clusters = assigned.groupBy("keeper").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(clusters, "keeper").select(
        "doc_id",
        F.col("keeper").cast("bigint").alias("keeper"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.expr("1000000 div cluster_size").cast("bigint").alias(
            "weight_micro"
        ),
    )


@register(
    "graph_component_size_hist",
    _keeper_cluster_sql()
    + """
    SELECT CAST(length(bin(cluster_size)) - 1 AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs
    FROM clusters GROUP BY 1
    """,
    "log2 histogram of near-dup cluster sizes (bucket = "
    "length(bin(size))-1, exact — no libm): the dedup-health report. "
    "Mass migrating into high buckets means boilerplate/template farms "
    "(act before pair enumeration bloats); bucket 0 = unique docs. "
    "Cardinality is <= 64 buckets at ANY corpus size, and everything "
    "upstream is the same duplication-proof keeper mapping as "
    "curation_soft_dedup_weights",
)
def graph_component_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import near_dup_keepers

    docs = _t(spark, sf_dir, "documents")
    clusters = (
        near_dup_keepers(docs, "doc_id")
        .groupBy("keeper")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    return (
        clusters.select(
            (F.length(F.bin("cluster_size")) - 1).cast("int").alias("bucket"),
            "cluster_size",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# text_ngram_novelty
# ---------------------------------------------------------------------------


def _novelty_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _SHINGLES_CTE, _TOKS_CTE

    return f"""
    WITH {_TOKS_CTE}, {_SHINGLES_CTE},
    firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS novelty_micro
    FROM sh s JOIN firsts f ON s.shingle = f.shingle
    GROUP BY s.doc_id
"""


@register(
    "text_ngram_novelty",
    _novelty_sql(),
    "per-doc novelty: fraction of its distinct trigrams whose corpus-"
    "wide first holder (min doc id — the deterministic stand-in for "
    "earliest-crawled) is the doc itself. Low novelty = the doc mostly "
    "restates earlier corpus content — the incremental-crawl keep/drop "
    "signal dedup pair-scoring is too expensive for. Shape: one "
    "shingle explode -> ONE shingle-keyed min agg -> join back on the "
    "same key (exchange reuse) -> doc agg; integer micro ratio",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import doc_shingles

    docs = _t(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id")
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_novel"),
            F.expr(
                "CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
                " * 1000000 div count(*) AS BIGINT)"
            ).alias("novelty_micro"),
        )
    )


# ---------------------------------------------------------------------------
# text_repetition_score
# ---------------------------------------------------------------------------


def _repetition_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH toks AS (SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
    shn AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3),
    cnt AS (SELECT doc_id, shingle, count(*) AS c FROM shn GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(max(c) AS BIGINT) AS top_gram_n,
           CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS repetition_micro
    FROM cnt GROUP BY doc_id
"""


@register(
    "text_repetition_score",
    _repetition_sql(),
    "degenerate-repetition detector: top trigram's share of ALL trigram "
    "occurrences per doc (non-distinct, unlike the dedup shingle "
    "relation) — model-generated loops ('the the the', repeated "
    "paragraphs) score near 1e6 while natural text stays low; the "
    "standard quality gate on synthetic corpora. Two map-side-"
    "combinable hash aggs after one explode; integer micro ratio",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr

    # spread BEFORE the explode: a dense parquet file arrives as ONE
    # partition on a local read, and an unspread explode+agg serializes
    # on one core (measured 10s vs 1.5s at sf0.1 — the _spread lesson
    # from operators/dedup.py)
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    shn = docs.select(
        "doc_id",
        F.explode(shingles_expr(tokens_expr("text"))).alias("shingle"),
    )
    cnt = shn.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        F.max("c").cast("bigint").alias("top_gram_n"),
        F.expr("CAST(max(c) * 1000000 div sum(c) AS BIGINT)").alias(
            "repetition_micro"
        ),
    )


# ---------------------------------------------------------------------------
# ml_ridge_2feature
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 1_000_000_000  # in centered-cents² units; demo shrinkage

# CTE chain (pts -> anchors -> m -> sol) shared verbatim with
# ml_linear_shap (queries_r46), which explains this model's predictions.
_RIDGE_WITH = f"""
    WITH pts AS (
      SELECT l_linestatus AS grp,
             CAST(round(l_quantity, 0) AS BIGINT) AS x1,
             CAST(round(l_tax * 100, 0) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
      FROM lineitem),
    anchors AS (
      SELECT grp, count(*) AS n,
             CAST(sum(x1) AS BIGINT) // count(*) AS m1,
             CAST(sum(x2) AS BIGINT) // count(*) AS m2,
             CAST(sum(y) AS BIGINT) // count(*) AS my
      FROM pts GROUP BY grp),
    m AS (
      SELECT p.grp, any_value(a.n) AS n,
             any_value(a.m1) AS m1, any_value(a.m2) AS m2,
             any_value(a.my) AS my,
             sum(CAST((p.x1 - a.m1) * (p.x1 - a.m1) AS HUGEINT)) AS suu,
             sum(CAST((p.x2 - a.m2) * (p.x2 - a.m2) AS HUGEINT)) AS svv,
             sum(CAST((p.x1 - a.m1) * (p.x2 - a.m2) AS HUGEINT)) AS suv,
             sum(CAST((p.x1 - a.m1) * (p.y - a.my) AS HUGEINT)) AS suy,
             sum(CAST((p.x2 - a.m2) * (p.y - a.my) AS HUGEINT)) AS svy
      FROM pts p JOIN anchors a ON p.grp = a.grp
      GROUP BY p.grp),
    sol AS (
      SELECT grp, n, m1, m2, my,
             (suu + {_RIDGE_LAMBDA}) * (svv + {_RIDGE_LAMBDA})
               - suv * suv AS det,
             (suy * (svv + {_RIDGE_LAMBDA}) - svy * suv) * 1000000 AS n1,
             (svy * (suu + {_RIDGE_LAMBDA}) - suy * suv) * 1000000 AS n2
      FROM m)
"""

_RIDGE_SQL = f"""{_RIDGE_WITH}
    SELECT grp AS l_linestatus,
           CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN n1 >= 0 THEN n1 // det
                     ELSE -((-n1) // det) END AS BIGINT) AS b1_micro,
           CAST(CASE WHEN n2 >= 0 THEN n2 // det
                     ELSE -((-n2) // det) END AS BIGINT) AS b2_micro,
           CAST(my * 1000000
                - (CASE WHEN n1 >= 0 THEN n1 // det
                        ELSE -((-n1) // det) END) * m1
                - (CASE WHEN n2 >= 0 THEN n2 // det
                        ELSE -((-n2) // det) END) * m2 AS BIGINT)
             AS b0_micro
    FROM sol
"""


@register(
    "ml_ridge_2feature",
    _RIDGE_SQL,
    "closed-form RIDGE regression (2 features, per line status: price-"
    "cents ~ quantity + tax-pct) on anchor-centered exact integers — "
    "the regularized twin of ml_ols_2feature: beta = (C + lambda*I)^-1 "
    "s with integer lambda, Cramer-rule ratios as truncated-division "
    "micro-units (the tdiv CASE discipline on the DuckDB side; Spark "
    "div truncates natively). Cauchy-Schwarz gives suv² <= suu*svv < "
    "det for lambda > 0, so the determinant is strictly positive — no "
    "degenerate branch. ONE moment agg per group after one fact scan",
)
def ml_ridge_2feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _ridge_fit(spark, sf_dir)
    return f.select(
        F.col("grp").alias("l_linestatus"),
        "n",
        "b1_micro",
        "b2_micro",
        "b0_micro",
    )


def _ridge_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ml_ridge_2feature's fitted-model frame with the anchor means
    kept: (grp, n, m1, m2, b1_micro, b2_micro, b0_micro). Shared with
    ml_linear_shap (r14) so the SHAP query reuses the fit's anchors
    instead of re-scanning lineitem for an identical moment agg."""
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_linestatus").alias("grp"),
        F.round("l_quantity", 0).cast("bigint").alias("x1"),
        F.round(F.col("l_tax") * 100, 0).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("y"),
    )
    anchors = pts.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(x1) AS BIGINT) div count(*)").alias("m1"),
        F.expr("CAST(sum(x2) AS BIGINT) div count(*)").alias("m2"),
        F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("my"),
    )
    dec = "decimal(38,0)"
    c = pts.join(F.broadcast(anchors), "grp").select(
        "grp",
        "n",
        "m1",
        "m2",
        "my",
        (F.col("x1") - F.col("m1")).alias("u"),
        (F.col("x2") - F.col("m2")).alias("v"),
        (F.col("y") - F.col("my")).alias("d"),
    )
    m = c.groupBy("grp").agg(
        F.first("n").alias("n"),
        F.first("m1").alias("m1"),
        F.first("m2").alias("m2"),
        F.first("my").alias("my"),
        F.sum((F.col("u") * F.col("u")).cast(dec)).alias("suu"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("svv"),
        F.sum((F.col("u") * F.col("v")).cast(dec)).alias("suv"),
        F.sum((F.col("u") * F.col("d")).cast(dec)).alias("suy"),
        F.sum((F.col("v") * F.col("d")).cast(dec)).alias("svy"),
    )
    lam = F.lit(_RIDGE_LAMBDA).cast(dec)
    sol = m.select(
        "grp",
        "n",
        "m1",
        "m2",
        "my",
        ((F.col("suu") + lam) * (F.col("svv") + lam)
         - F.col("suv") * F.col("suv")).alias("det"),
        (
            (F.col("suy") * (F.col("svv") + lam) - F.col("svy") * F.col("suv"))
            * F.lit(1000000).cast(dec)
        ).alias("n1"),
        (
            (F.col("svy") * (F.col("suu") + lam) - F.col("suy") * F.col("suv"))
            * F.lit(1000000).cast(dec)
        ).alias("n2"),
    )
    b1 = F.expr("n1 div det")
    b2 = F.expr("n2 div det")
    return sol.select(
        "grp",
        F.col("n").cast("bigint").alias("n"),
        "m1",
        "m2",
        b1.cast("bigint").alias("b1_micro"),
        b2.cast("bigint").alias("b2_micro"),
        (
            F.col("my") * 1000000
            - b1.cast("bigint") * F.col("m1")
            - b2.cast("bigint") * F.col("m2")
        )
        .cast("bigint")
        .alias("b0_micro"),
    )


# ---------------------------------------------------------------------------
# ts_seasonal_naive
# ---------------------------------------------------------------------------

_SNAIVE_SQL = """
    WITH daily AS (
      SELECT CAST((epoch_us(ts)
                   - (((epoch_us(ts) % 86400000000) + 86400000000)
                      % 86400000000)) // 86400000000 AS BIGINT) AS d,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1),
    scored AS (
      SELECT cur.d, cur.cents, prev.cents AS pred,
             abs(cur.cents - prev.cents) AS abs_err
      FROM daily cur JOIN daily prev ON prev.d = cur.d - 7)
    SELECT CAST(((d % 7) + 7) % 7 AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs_err) AS BIGINT) AS sum_abs_err_cents,
           CAST(sum(abs_err) * 1000000 // count(*) AS BIGINT)
             AS mae_cents_micro
    FROM scored GROUP BY 1
"""


@register(
    "ts_seasonal_naive",
    _SNAIVE_SQL,
    "seasonal-naive backtest: predict day d's total cents with day "
    "d-7's, report per-weekday exact integer MAE — the forecasting "
    "baseline (Hyndman's benchmark rule) any anomaly detector or model "
    "forecast must beat before it earns compute. Shape: ONE daily "
    "rollup (map-side combinable), a self-join on the shifted day key "
    "(both sides day-cardinality, broadcastable), 7-row output; "
    "abs errors and MAE stay in integer cents/micro-units. Day "
    "bucketing and weekday are FLOOR-consistent on BOTH engines via the "
    "subtract-pmod form (x - pmod(x, m)) div m — required because Spark "
    "div AND DuckDB integer // BOTH truncate toward zero — and "
    "pmod == ((d %% 7) + 7) %% 7, so pre-1970 timestamps (negative day "
    "numbers) cannot diverge (r6 advisor)",
)
def ts_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(
                "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
                " div 86400000000"
            ).alias("d"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    prev = daily.select(
        (F.col("d") + 7).alias("d"), F.col("cents").alias("pred")
    )
    scored = daily.join(prev, "d").select(
        "d", F.abs(F.col("cents") - F.col("pred")).alias("abs_err")
    )
    return scored.groupBy(
        F.pmod(F.col("d"), F.lit(7)).cast("int").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("abs_err").cast("bigint").alias("sum_abs_err_cents"),
        F.expr(
            "CAST(sum(abs_err) * 1000000 div count(*) AS BIGINT)"
        ).alias("mae_cents_micro"),
    )
