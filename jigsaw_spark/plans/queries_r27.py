"""Round-7 batch 1: product-analytics lifecycle, exact model-eval
curves, seasonal forecasting, and dependence diagnostics —

- ``rel_retention_cohorts``: weekly cohort retention triangle (cohort =
  user's first active week; activity = any event in cohort+k) — the
  growth-analytics primitive behind every retention chart.
- ``rel_funnel_conversion``: strictly-ordered view → click → purchase
  funnel (each stage's first event must not precede the previous
  stage's), per-stage user counts and step conversion — the
  behavioral-funnel op ``rel_event_pattern_match`` (regex over type
  sequences) does not give, because funnels need the FIRST qualifying
  timestamp per stage, not pattern existence.
- ``ml_lift_gains``: exact decile lift & cumulative-gains table over a
  score column — the model-targeting diagnostic. Global decile ranks
  are computed WITHOUT a single-partition window (see below).
- ``rel_rfm_segments``: RFM (recency/frequency/monetary) quintile
  segmentation of customers — 1-5 scores per axis from exact global
  ranks, aggregated to segment counts.
- ``ts_holt_winters_exact``: additive Holt-Winters (level+trend+weekly
  seasonality, alpha=beta=gamma=1/2) with the whole trajectory in
  exact integer cents — extends ``ts_holt_exact`` with the seasonal
  state carried as a 7-slot integer queue; oracle replays it as a
  recursive CTE whose rows carry the queue as a BIGINT list.
- ``dq_mutual_information``: mutual information (nats) between event
  type and day-of-week — the dependence screen for feature/leakage
  audits; algebraic one-pass form over the 35-cell contingency.
- ``p_group_kfold``: GroupKFold over near-dup keeper groups — every
  member of a duplicate cluster lands in the SAME fold (the k-fold
  twin of ``p_leakage_safe_split``).

Scale notes (100 TB): exact global ranks (lift deciles, RFM quintiles)
use the cumulative-DIM pattern from ``agg_percentile_exact`` — hash-agg
facts to the distinct-value dim, exclusive prefix over the dim (a
window over |distinct values| rows, not |rows|), then per-value
row_number partitioned by the value (each partition is one value's tie
group). No single-partition window over the fact table exists in any
plan here. Retention/funnel are hash-agg + small-key joins; MI is one
contingency agg + broadcast margins.

Float discipline: only ``dq_mutual_information`` emits a double (libm
ln), snapped with the round(round(x, 9), 4) discipline on both engines;
everything else is exact integers/strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.functions.hashing import md5_key, md5_key_sql
from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# rel_retention_cohorts
# ---------------------------------------------------------------------------

_RETENTION_SQL = """
    WITH uw AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 // 7 AS w
      FROM events),
    coh AS MATERIALIZED (
      SELECT user_id, min(w) AS c FROM uw GROUP BY user_id),
    sizes AS (
      SELECT c, count(*) AS cohort_size FROM coh GROUP BY c),
    act AS (
      SELECT coh.c, uw.w - coh.c AS off, count(*) AS n_active
      FROM uw JOIN coh ON uw.user_id = coh.user_id
      GROUP BY 1, 2)
    SELECT CAST(act.c AS BIGINT) AS cohort_week,
           CAST(off AS INT) AS week_offset,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(cohort_size AS BIGINT) AS cohort_size,
           CAST(n_active * 1000000 // cohort_size AS BIGINT)
             AS retention_micro
    FROM act JOIN sizes ON act.c = sizes.c
"""


@register(
    "rel_retention_cohorts",
    _RETENTION_SQL,
    "weekly cohort retention triangle: cohort = epoch-week of a user's "
    "FIRST event, n_active = distinct users of that cohort active in "
    "cohort+k, retention in exact integer micro-rate. Shape: one "
    "distinct (user, week) agg, one per-user min (both hash aggs, "
    "map-side combinable), one user-keyed join back, one (cohort, "
    "offset) agg + a cohort-dim join — no window anywhere, every "
    "shuffle on a bounded-cardinality key. Week index is epoch-days "
    "div 7 (positive domain; the floor/truncate engines agree — "
    "pre-1970 data would need the subtract-pmod form of "
    "ts_seasonal_naive)",
)
def rel_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000 div 7").alias("w"),
    ).distinct()
    coh = uw.groupBy("user_id").agg(F.min("w").alias("c"))
    sizes = coh.groupBy("c").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = (
        uw.join(coh, "user_id")
        .groupBy("c", (F.col("w") - F.col("c")).alias("off"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return act.join(sizes, "c").select(
        F.col("c").cast("bigint").alias("cohort_week"),
        F.col("off").cast("int").alias("week_offset"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("cohort_size").cast("bigint").alias("cohort_size"),
        F.expr("CAST(n_active * 1000000 div cohort_size AS BIGINT)").alias(
            "retention_micro"
        ),
    )


# ---------------------------------------------------------------------------
# rel_funnel_conversion
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
    WITH v AS MATERIALIZED (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS MATERIALIZED (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS MATERIALIZED (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    n AS (
      SELECT 1 AS step, 'view' AS stage, count(*) AS n_users FROM v
      UNION ALL
      SELECT 2, 'click', count(*) FROM c
      UNION ALL
      SELECT 3, 'purchase', count(*) FROM p)
    SELECT CAST(step AS INT) AS step, stage,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(CASE WHEN step = 1 THEN 1000000
                     WHEN lag(n_users) OVER (ORDER BY step) = 0 THEN 0
                     ELSE n_users * 1000000
                          // lag(n_users) OVER (ORDER BY step)
                END AS BIGINT) AS conv_from_prev_micro
    FROM n
"""


@register(
    "rel_funnel_conversion",
    _FUNNEL_SQL,
    "strictly-ordered behavioral funnel view -> click -> purchase: a "
    "user advances to a stage only with an event AT OR AFTER their "
    "first qualifying event of the previous stage (first-touch "
    "semantics — pattern existence is rel_event_pattern_match's job). "
    "Shape: three per-user min-ts hash aggs chained by user-keyed "
    "joins (each stage's frame shrinks monotonically), then a 3-row "
    "summary with exact integer step conversion; the only window runs "
    "over exactly 3 rows",
)
def rel_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # each stage dim feeds the next stage's join AND its own count —
    # uncheckpointed, v's events scan+agg ran 3x (via c's two uses) and
    # c's twice; materialize the per-user stage dims once each
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint()
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint()
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def _count(df: DataFrame, step: int, stage: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(step).alias("step"), F.lit(stage).alias("stage"), "n_users"
        )

    n = (
        _count(v, 1, "view")
        .unionByName(_count(c, 2, "click"))
        .unionByName(_count(p, 3, "purchase"))
    )
    w = Window.orderBy("step")  # 3 rows by construction
    return n.select(
        F.col("step").cast("int").alias("step"),
        "stage",
        "n_users",
        F.when(F.col("step") == 1, F.lit(1000000).cast("bigint"))
        .when(F.lag("n_users").over(w) == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr(
                "CAST(n_users * 1000000 div lag(n_users)"
                " OVER (ORDER BY step) AS BIGINT)"
            )
        )
        .alias("conv_from_prev_micro"),
    )


# ---------------------------------------------------------------------------
# exact global rank WITHOUT a single-partition window (shared by
# ml_lift_gains and rel_rfm_segments)
# ---------------------------------------------------------------------------


def _exact_rank(
    df: DataFrame, val: str, tie: str, desc: bool = False
) -> DataFrame:
    """Add ``_rn``: the 1-based global rank under (val, tie) total order,
    computed scale-safely — hash-agg to the distinct-``val`` dim, an
    EXCLUSIVE prefix over that dim (window over |distinct values| rows),
    then row_number partitioned BY ``val`` (each partition is one tie
    group). The fact relation is never sorted globally and no
    single-partition window exists; this is the cumulative-dim pattern
    of agg_percentile_exact extended with in-value tie-breaking."""
    dim = df.groupBy(val).agg(F.count(F.lit(1)).alias("_c"))
    order = F.col(val).desc() if desc else F.col(val).asc()
    wdim = Window.orderBy(order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = dim.select(
        val, F.coalesce(F.sum("_c").over(wdim), F.lit(0)).alias("_off")
    )
    win = Window.partitionBy(val).orderBy(tie)
    return (
        df.join(off, val)
        .withColumn("_rn", F.col("_off") + F.row_number().over(win))
        .drop("_off")
    )


def _exact_rank_banded(
    df: DataFrame, val: str, tie: str, desc: bool = False, bands: int = 1024
) -> DataFrame:
    """``_exact_rank`` for NEAR-UNIQUE integer metrics: when the distinct
    ``val`` dim is ~|rows| (e.g. per-customer monetary sums), the dim
    window of ``_exact_rank`` degenerates to a single-partition pass over
    the data. This variant keeps the rank exact while bounding every
    unpartitioned window at ``bands`` rows, constant in data size:
    broadcast min/max -> coarse range band ``(v - lo) div width`` ->
    per-band counts hash-agg -> exclusive prefix over <=bands rows ->
    per-band PARTITIONED row_number + band offset. Equal values share a
    band, so (val, tie) composition preserves the global total order and
    ranks are bit-identical to ``_exact_rank``'s — same oracle, same
    driver hash. Band skew is bounded by the metric's density per
    width-slice; raise ``bands`` (or recurse) if one band dominates."""
    stats = df.agg(F.min(val).alias("_lo"), F.max(val).alias("_hi"))
    withb = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "_band",
            F.expr(
                f"CAST(({val} - _lo) div"
                f" ((_hi - _lo) div {bands} + 1) AS INT)"
            ),
        )
        .drop("_lo", "_hi")
    )
    counts = withb.groupBy("_band").agg(F.count(F.lit(1)).alias("_c"))
    border = F.col("_band").desc() if desc else F.col("_band").asc()
    wb = Window.orderBy(border).rowsBetween(Window.unboundedPreceding, -1)
    off = counts.select(
        "_band", F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_off")
    )
    vorder = F.col(val).desc() if desc else F.col(val).asc()
    win = Window.partitionBy("_band").orderBy(vorder, F.col(tie).asc())
    return (
        withb.join(F.broadcast(off), "_band")
        .withColumn("_rn", F.col("_off") + F.row_number().over(win))
        .drop("_off", "_band")
    )


# ---------------------------------------------------------------------------
# ml_lift_gains
# ---------------------------------------------------------------------------

_LIFT_SQL = """
    WITH s AS (
      SELECT event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events),
    t AS MATERIALIZED (
      SELECT count(*) AS n, sum(pos) AS npos FROM s),
    r AS (
      SELECT pos,
             (row_number() OVER (ORDER BY cents DESC, event_id) - 1)
               * 10 // (SELECT n FROM t) AS decile
      FROM s),
    g AS (
      SELECT decile, count(*) AS n_rows, sum(pos) AS n_pos
      FROM r GROUP BY decile)
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(CASE WHEN (SELECT npos FROM t) = 0 THEN 0
                ELSE sum(n_pos) OVER (ORDER BY decile) * 1000000
                     // (SELECT npos FROM t) END AS BIGINT)
             AS cum_gains_micro,
           CAST(CASE WHEN (SELECT npos FROM t) = 0 THEN 0
                ELSE n_pos * (SELECT n FROM t) * 1000000
                     // (n_rows * (SELECT npos FROM t)) END AS BIGINT)
             AS lift_micro
    FROM g
"""


@register(
    "ml_lift_gains",
    _LIFT_SQL,
    "exact decile lift & cumulative-gains table (score = value cents "
    "descending, positives = purchases): per decile n/positives, "
    "cumulative gains and lift in exact integer micro-units — the "
    "model-targeting diagnostic behind every 'top-decile capture' "
    "claim. Global decile ranks come from the cumulative-DIM pattern "
    "(_exact_rank): dim prefix + per-value row_number — NO "
    "single-partition window over the facts; the only unpartitioned "
    "windows run over |distinct cents| dim rows and the 10-row decile "
    "summary. Integer magnitudes stay below 2^63 up to ~1e12 rows x "
    "1e6 positives; beyond that lift the products to DECIMAL(38,0). "
    "npos=0 is guarded to 0 on both engines (otherwise DuckDB raises "
    "division-by-zero while Spark div yields NULL)",
)
def ml_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    # inlined _exact_rank with a pos-aware dim: the totals (n, npos)
    # come from the SAME per-cents hash-agg the rank needs, so events is
    # scanned twice (dim + join-back) instead of three times — the old
    # separate s.agg() was a third full pass over the fact table
    dim = s.groupBy("cents").agg(
        F.count(F.lit(1)).alias("_c"), F.sum("pos").alias("_p")
    )
    wdim = Window.orderBy(F.col("cents").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = dim.select(
        "cents", F.coalesce(F.sum("_c").over(wdim), F.lit(0)).alias("_off")
    )
    tot = dim.agg(
        F.sum("_c").alias("n"), F.sum("_p").alias("npos")
    )
    win = Window.partitionBy("cents").orderBy("event_id")
    ranked = s.join(off, "cents").withColumn(
        "_rn", F.col("_off") + F.row_number().over(win)
    )
    r = ranked.crossJoin(F.broadcast(tot)).select(
        "pos",
        "n",
        "npos",
        F.expr("(_rn - 1) * 10 div n").alias("decile"),
    )
    g = r.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("pos").alias("n_pos"),
        F.max("n").alias("n"),
        F.max("npos").alias("npos"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        (F.sum("n_pos").over(w) * 1000000)
        .cast("bigint")
        .alias("_cum"),
        F.expr(
            "CAST(CASE WHEN npos = 0 THEN 0 ELSE"
            " n_pos * n * 1000000 div (n_rows * npos) END AS BIGINT)"
        ).alias("lift_micro"),
        F.col("npos").alias("_npos"),
    ).select(
        "decile",
        "n_rows",
        "n_pos",
        F.expr(
            "CAST(CASE WHEN _npos = 0 THEN 0"
            " ELSE _cum div _npos END AS BIGINT)"
        ).alias("cum_gains_micro"),
        "lift_micro",
    )


# ---------------------------------------------------------------------------
# rel_rfm_segments
# ---------------------------------------------------------------------------

_RFM_SQL = """
    WITH ag AS MATERIALIZED (
      SELECT o_custkey,
             max(epoch_us(o_orderdate) // 86400000000) AS last_day,
             count(*) AS freq,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS money
      FROM orders GROUP BY o_custkey),
    base AS MATERIALIZED (
      SELECT o_custkey,
             (SELECT max(last_day) FROM ag) - last_day AS rec,
             freq, money,
             (SELECT count(*) FROM ag) AS n
      FROM ag),
    scored AS (
      SELECT o_custkey, money, n,
             5 - (row_number() OVER (ORDER BY rec, o_custkey) - 1)
                 * 5 // n AS r_score,
             (row_number() OVER (ORDER BY freq, o_custkey) - 1)
                 * 5 // n + 1 AS f_score,
             (row_number() OVER (ORDER BY money, o_custkey) - 1)
                 * 5 // n + 1 AS m_score
      FROM base)
    SELECT CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(money) AS BIGINT) AS sum_monetary_cents
    FROM scored GROUP BY 1
"""


@register(
    "rel_rfm_segments",
    _RFM_SQL,
    "RFM segmentation: per customer recency (days from the table's "
    "last order day), frequency (orders), monetary (exact cents); "
    "each axis scored 1-5 by exact global quintile rank (ties broken "
    "by custkey, so scores are total-order deterministic), customers "
    "aggregated per 3-digit segment. Recency/frequency ranks use the "
    "cumulative-DIM pattern (_exact_rank, windows over the small "
    "bounded value dims); the monetary axis — whose sums are "
    "near-unique, dim ~ |customers| — uses the BANDED rank "
    "(_exact_rank_banded): 1024 coarse range bands, prefix over the "
    "band dim only, per-band partitioned row_number. No window grows "
    "with customer count. One orders scan, one customer-dim pipeline",
)
def rel_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    ag = o.groupBy("o_custkey").agg(
        # o_orderdate reads as TIMESTAMP_NTZ (only events gets the LTZ
        # session conf); cast to LTZ under the UTC session so
        # unix_micros == DuckDB epoch_us
        F.expr(
            "max(unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000)"
        ).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).alias("money"),
    )
    tot = ag.agg(
        F.max("last_day").alias("md"), F.count(F.lit(1)).alias("n")
    )
    # checkpoint the customer dim ONCE: the old chained form
    # (_exact_rank(_exact_rank(_exact_rank_banded(base)))) referenced
    # its input 2-3x per rank (dim agg + join-back), re-evaluating the
    # orders scan+agg lineage ~8x through the tree. Each axis rank only
    # depends on (val, tie), so the three scores compute independently
    # from the checkpoint and join back on the customer key —
    # bit-identical ranks, one orders pass.
    base = (
        ag.crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            (F.col("md") - F.col("last_day")).alias("rec"),
            "freq",
            "money",
            "n",
        )
        .localCheckpoint()
    )
    r = _exact_rank(
        base.select("o_custkey", "rec", "n"), "rec", "o_custkey"
    ).select(
        "o_custkey", F.expr("5 - (_rn - 1) * 5 div n").alias("r_score")
    )
    f = _exact_rank(
        base.select("o_custkey", "freq", "n"), "freq", "o_custkey"
    ).select(
        "o_custkey", F.expr("(_rn - 1) * 5 div n + 1").alias("f_score")
    )
    # monetary sums are near-unique (dim ~ |customers|) — use the banded
    # rank so no window grows with customer count (verdict r7 #4); rec
    # and freq have small bounded dims, the plain dim form stays optimal
    m = _exact_rank_banded(
        base.select("o_custkey", "money", "n"), "money", "o_custkey"
    ).select(
        "o_custkey",
        "money",
        F.expr("(_rn - 1) * 5 div n + 1").alias("m_score"),
    )
    return m.join(r, "o_custkey").join(f, "o_custkey").groupBy(
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        )
        .cast("int")
        .alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("money").cast("bigint").alias("sum_monetary_cents"),
    )


# ---------------------------------------------------------------------------
# ts_holt_winters_exact
# ---------------------------------------------------------------------------

_TDIV2 = "(CASE WHEN {x} >= 0 THEN ({x}) // 2 ELSE -((-({x})) // 2) END)"

# the three state updates, inlined (SQL cannot reference a same-SELECT
# alias): nl = tdiv2(y - sp + l + b); nb = tdiv2(nl - l + b);
# ns = tdiv2(y - nl + sp)  with sp = hist[1] (the 7-back seasonal)
_HW_NL = _TDIV2.format(x="d.y - h.hist[1] + h.l + h.b")
_HW_NB = _TDIV2.format(x=_HW_NL + " - h.l + h.b")
_HW_NS = _TDIV2.format(x="d.y - " + _HW_NL + " + h.hist[1]")

_HW_SQL = f"""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT event_type,
             strftime(ts, '%Y-%m-%d') AS day,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY strftime(ts, '%Y-%m-%d')) AS i,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS y
      FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
    h AS (
      SELECT event_type, i, day, y,
             y AS l, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS s,
             y AS fitted,
             [0, 0, 0, 0, 0, 0, 0]::BIGINT[] AS hist
      FROM daily WHERE i = 1
      UNION ALL
      SELECT d.event_type, d.i, d.day, d.y,
             {_HW_NL} AS l,
             {_HW_NB} AS b,
             {_HW_NS} AS s,
             h.l + h.b + h.hist[1] AS fitted,
             h.hist[2:] || [{_HW_NS}] AS hist
      FROM h JOIN daily d
        ON d.event_type = h.event_type AND d.i = h.i + 1)
    SELECT event_type, day,
           CAST(y AS BIGINT) AS value_cents,
           CAST(l AS BIGINT) AS level_cents,
           CAST(b AS BIGINT) AS trend_cents,
           CAST(s AS BIGINT) AS seasonal_cents,
           CAST(fitted AS BIGINT) AS fitted_cents
    FROM h
"""


@register(
    "ts_holt_winters_exact",
    _HW_SQL,
    "additive Holt-Winters (alpha=beta=gamma=1/2, weekly season) per "
    "event type with the WHOLE trajectory exact-integer: l_t = "
    "tdiv2(y - s_(t-7) + l + b), b_t = tdiv2(l_t - l + b), s_t = "
    "tdiv2(y - l_t + s_(t-7)); fitted is the PRE-update one-step "
    "forecast l + b + s_(t-7) (honest backtest). The seasonal state "
    "rides as a 7-slot integer queue initialized to zeros, so the "
    "whole recursion is a bounded-state scan — the Spark side is the "
    "per-group sequential-recursion pattern of ts_holt_exact (ONE "
    "hash agg to the (type, day) series, then applyInPandas with "
    "Python ints; state = (l, b, deque(7))); the oracle replays it as "
    "a recursive CTE whose rows carry the queue as a BIGINT list — "
    "seasonal-lag access inside single-row recursion",
)
def ts_holt_winters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("y")
    )

    def hw(pdf):
        import pandas as pd

        def tdiv2(x: int) -> int:
            return x // 2 if x >= 0 else -((-x) // 2)

        pdf = pdf.sort_values("day")
        out = []
        hist = [0] * 7
        l = b = s = 0
        first = True
        for r in pdf.itertuples(index=False):
            y = int(r.y)
            if first:
                l, b, s, fitted, first = y, 0, 0, y, False
            else:
                sp = hist[0]
                fitted = l + b + sp
                nl = tdiv2(y - sp + l + b)
                b = tdiv2(nl - l + b)
                s = tdiv2(y - nl + sp)
                l = nl
            hist = hist[1:] + [s]
            out.append((r.event_type, r.day, y, l, b, s, fitted))
        return pd.DataFrame(
            out,
            columns=[
                "event_type",
                "day",
                "value_cents",
                "level_cents",
                "trend_cents",
                "seasonal_cents",
                "fitted_cents",
            ],
        )

    return daily.groupBy("event_type").applyInPandas(
        hw,
        "event_type string, day string, value_cents long, "
        "level_cents long, trend_cents long, seasonal_cents long, "
        "fitted_cents long",
    )


# ---------------------------------------------------------------------------
# dq_mutual_information
# ---------------------------------------------------------------------------

_MI_SQL = """
    WITH cells AS (
      SELECT event_type AS x,
             -- true floor-day BEFORE the pmod-7: DuckDB's integer //
             -- truncates toward zero on this expression shape (r8
             -- advisor: -1 // 86400000000 = 0), so subtract the
             -- non-negative remainder first — identical to Spark's
             -- subtract-pmod form for pre-1970 epochs too
             CAST(((((epoch_us(ts)
                      - (((epoch_us(ts) % 86400000000) + 86400000000)
                         % 86400000000))
                     // 86400000000) % 7) + 7) % 7 AS INT)
               AS y,
             count(*) AS c
      FROM events GROUP BY 1, 2),
    mx AS (SELECT x, sum(c) AS cx FROM cells GROUP BY x),
    my AS (SELECT y, sum(c) AS cy FROM cells GROUP BY y),
    t AS (SELECT sum(c) AS n FROM cells)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(round(sum(
             (CAST(c AS DOUBLE) / (SELECT n FROM t))
             * ln(CAST(c AS DOUBLE) * (SELECT n FROM t)
                  / (CAST(cx AS DOUBLE) * cy))
           ), 9), 4) AS mi_nats
    FROM cells
    JOIN mx ON cells.x = mx.x
    JOIN my ON cells.y = my.y
"""


@register(
    "dq_mutual_information",
    _MI_SQL,
    "mutual information I(event_type; day-of-week) in nats — the "
    "dependence screen for feature redundancy / leakage audits "
    "(chi-square's information-theoretic twin; ab_chi2_independence "
    "tests the same pair). Algebraic one-pass form sum (c/n) * "
    "ln(c*n/(cx*cy)) over the contingency cells: ONE 35-cell hash agg "
    "+ two margin aggs broadcast back — the fact table is scanned "
    "once, nothing bigger than |X|x|Y| ever shuffles. Term order is "
    "cell-level (bounded), double-round snap (9 then 4) absorbs "
    "libm/sum-order noise on both engines; identical-integer ln "
    "arguments by construction. Day-of-week uses the subtract-pmod "
    "floor-day + pmod form (the ts_seasonal_naive pattern) so negative "
    "pre-1970 epochs bucket identically on both engines",
)
def dq_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"),
        F.expr(
            "CAST(pmod((unix_micros(ts) - pmod(unix_micros(ts), "
            "86400000000)) div 86400000000, 7) AS INT)"
        ).alias("y"),
    ).agg(F.count(F.lit(1)).alias("c"))
    mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("c").alias("cy"))
    t = cells.agg(F.sum("c").alias("n"))
    joined = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(t))
    )
    term = (F.col("c").cast("double") / F.col("n")) * F.log(
        F.col("c").cast("double")
        * F.col("n")
        / (F.col("cx").cast("double") * F.col("cy"))
    )
    return joined.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.round(F.sum(term), 9), 4).alias("mi_nats"),
    )


# ---------------------------------------------------------------------------
# p_group_kfold
# ---------------------------------------------------------------------------


def _gkf_sql() -> str:
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
    assigned AS (
      SELECT d.doc_id,
             coalesce(c.keeper, d.doc_id) AS keeper
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
    SELECT doc_id, CAST(keeper AS BIGINT) AS keeper,
           CAST(('0x' || substr(
                  {md5_key_sql(['keeper'], seed='gkf')}, 1, 12))::UBIGINT
                  % 5 AS INT) AS fold
    FROM assigned
"""


@register(
    "p_group_kfold",
    _gkf_sql(),
    "GroupKFold over near-dup clusters: every document is assigned "
    "fold = md5(keeper) % 5 of its SimHash-component KEEPER, so a "
    "duplicate cluster can never straddle a CV fold boundary — the "
    "k-fold twin of p_leakage_safe_split (sklearn GroupKFold with "
    "groups = dedup clusters, deterministic md5 assignment instead of "
    "size-greedy packing). Same C4-ordered keeper graph (exact dedup "
    "before SimHash pairing; token-empty docs are their own "
    "singletons), one left join + map-only fold hash",
)
def p_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import near_dup_keepers

    docs = _t(spark, sf_dir, "documents")
    assigned = near_dup_keepers(docs, "doc_id")
    return assigned.select(
        "doc_id",
        F.col("keeper").cast("bigint").alias("keeper"),
        F.pmod(
            F.conv(
                F.substring(md5_key(F.col("keeper"), seed="gkf"), 1, 12),
                16,
                10,
            ).cast("bigint"),
            F.lit(5),
        )
        .cast("int")
        .alias("fold"),
    )
