"""Round-8 batch 7: weight-of-evidence scoring features and
seasonality-strength diagnostics —

- ``ml_woe_iv``: weight of evidence per score decile + the information
  value of the whole feature — the credit-scoring / feature-selection
  standard (IV < 0.02 useless, > 0.5 suspicious). The 0.5-adjusted
  form sidesteps empty-cell logs; each bin's WoE and IV term are
  computed from identical integer-derived doubles on both engines and
  PRE-ROUNDED to integer nano-units before the 10-term sum.
- ``ts_seasonal_strength``: F_s = max(0, 1 - Var(residual) /
  Var(detrended)) per event type — how much of the detrended variance
  the weekly seasonal profile explains (the STL-era seasonality
  strength statistic; ts_decompose_ma shows the components, this
  scores them). EXACT integer arithmetic end-to-end: the x7-scaled
  detrended series quantizes the dow-mean seasonal at milli-units, and
  the two variances compare as n*Sum(x^2) - (Sum x)^2 integer
  numerators over the same denominator — the ratio needs no floats.

Scale notes (100 TB): WoE reuses the cumulative-dim decile rank
(windows over the distinct-cents dim + the 10-row bin frame);
seasonal strength is one day-grain hash-agg, type-partitioned MA
windows on the bounded day dim, and one variance agg with
DECIMAL(38,0) sums (milli quantization keeps n*Sum(x^2)*1e6 inside
38 digits at any realistic day count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ml_woe_iv
# ---------------------------------------------------------------------------

_WOE_SQL = """
    WITH s AS (
      SELECT event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events),
    t AS MATERIALIZED (SELECT count(*) AS n FROM s),
    r AS (
      SELECT pos,
             (row_number() OVER (ORDER BY cents DESC, event_id) - 1)
               * 10 // (SELECT n FROM t) AS decile
      FROM s),
    bins AS MATERIALIZED (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS pos
      FROM r GROUP BY decile),
    tot AS MATERIALIZED (
      SELECT sum(pos) AS tp, sum(n - pos) AS tn FROM bins),
    terms AS (
      SELECT decile, n, pos, n - pos AS neg,
             CAST(round(ln(
               ((CAST(pos AS DOUBLE) + 0.5) / (SELECT tp FROM tot))
               / ((CAST(n - pos AS DOUBLE) + 0.5) / (SELECT tn FROM tot)))
               * 1000000000.0, 0) AS BIGINT) AS woe_nano,
             CAST(round(
               (((CAST(pos AS DOUBLE) + 0.5) / (SELECT tp FROM tot))
                - ((CAST(n - pos AS DOUBLE) + 0.5) / (SELECT tn FROM tot)))
               * ln(
               ((CAST(pos AS DOUBLE) + 0.5) / (SELECT tp FROM tot))
               / ((CAST(n - pos AS DOUBLE) + 0.5) / (SELECT tn FROM tot)))
               * 1000000000.0, 0) AS BIGINT) AS iv_nano
      FROM bins)
    SELECT CAST(decile AS INT) AS decile,
           n, pos,
           CAST(woe_nano // 1000 AS BIGINT) AS woe_micro,
           CAST(sum(iv_nano) OVER () // 1000 AS BIGINT) AS iv_micro
    FROM terms
"""


@register(
    "ml_woe_iv",
    _WOE_SQL,
    "weight of evidence per score decile (score = value cents desc, "
    "outcome = purchase) + the feature's information value — the "
    "credit-scoring / feature-selection standard (IV < 0.02 useless, "
    "> 0.5 too good to be true). The 0.5-adjusted form "
    "ln(((pos+.5)/TP) / ((neg+.5)/TN)) never logs zero; WoE and the "
    "IV term are computed from identical integer-derived doubles on "
    "both engines and PRE-ROUNDED to integer nano-units, so the "
    "10-term IV sum is order-free exact integer arithmetic (the "
    "ml_brier_log_loss ln discipline). Deciles reuse the "
    "cumulative-dim rank; the only other global window is the 10-row "
    "bin frame. Floor-div to micro on output",
)
def ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries_r27 import _exact_rank

    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "pos"
        ),
    )
    tot_n = s.agg(F.count(F.lit(1)).alias("n"))
    r = (
        _exact_rank(s, "cents", "event_id", desc=True)
        .crossJoin(F.broadcast(tot_n))
        .select("pos", F.expr("(_rn - 1) * 10 div n").alias("decile"))
    )
    bins = r.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("pos"),
    )
    tot = bins.agg(
        F.sum("pos").alias("tp"),
        F.sum(F.col("n") - F.col("pos")).alias("tn"),
    )
    woe = (
        "ln(((CAST(pos AS DOUBLE) + 0.5) / tp)"
        " / ((CAST(n - pos AS DOUBLE) + 0.5) / tn))"
    )
    terms = bins.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n",
        "pos",
        F.expr(
            f"CAST(round({woe} * 1000000000.0, 0) AS BIGINT)"
        ).alias("woe_nano"),
        F.expr(
            "CAST(round((((CAST(pos AS DOUBLE) + 0.5) / tp)"
            " - ((CAST(n - pos AS DOUBLE) + 0.5) / tn))"
            f" * {woe} * 1000000000.0, 0) AS BIGINT)"
        ).alias("iv_nano"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )  # the 10-row bin frame
    return terms.select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "pos",
        F.expr("CAST(woe_nano div 1000 AS BIGINT)").alias("woe_micro"),
        F.sum("iv_nano").over(w).cast("bigint").alias("_iv_nano_sum"),
    ).select(
        "decile",
        "n",
        "pos",
        "woe_micro",
        F.expr("CAST(_iv_nano_sum div 1000 AS BIGINT)").alias("iv_micro"),
    )


# ---------------------------------------------------------------------------
# ts_seasonal_strength
# ---------------------------------------------------------------------------

_SEASTR_SQL = """
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    tr AS (
      SELECT event_type, day, cents,
             sum(cents) OVER w AS t7,
             count(*) OVER w AS n7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
      SELECT event_type, day,
             7 * cents - t7 AS d7,
             CAST(((day % 7) + 7) % 7 AS INT) AS dow
      FROM tr WHERE n7 = 7),
    seas AS (
      SELECT event_type, dow, sum(d7) AS sd7, count(*) AS nd
      FROM det GROUP BY 1, 2),
    q AS (
      -- milli-quantized values: x = d7 * 1000, seasonal fitted =
      -- floor(sd7 * 1000 / nd); residual = x - fit (exact integers)
      SELECT det.event_type,
             det.d7 * 1000 AS x,
             det.d7 * 1000
               - CASE WHEN seas.sd7 < 0
                      THEN -((-seas.sd7 * 1000) // seas.nd)
                      ELSE (seas.sd7 * 1000) // seas.nd END AS rres
      FROM det JOIN seas
        ON det.event_type = seas.event_type AND det.dow = seas.dow),
    v AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             count(*) * sum(CAST(x AS HUGEINT) * x)
               - CAST(sum(x) AS HUGEINT) * sum(x) AS vd,
             count(*) * sum(CAST(rres AS HUGEINT) * rres)
               - CAST(sum(rres) AS HUGEINT) * sum(rres) AS vr
      FROM q GROUP BY 1)
    SELECT event_type, n_days,
           CAST(CASE WHEN vd = 0 THEN 0
                WHEN vr * 1000000 >= vd * 1000000 THEN 0
                ELSE 1000000 - vr * 1000000 // vd END AS BIGINT)
             AS strength_micro
    FROM v
"""


@register(
    "ts_seasonal_strength",
    _SEASTR_SQL,
    "seasonality strength F_s = max(0, 1 - Var(residual) / "
    "Var(detrended)) per event type — how much of the detrended "
    "variance the weekly profile explains (the STL-era statistic; "
    "ts_decompose_ma shows the components, this scores them; ~0 means "
    "the dow profile is noise). EXACT integers end-to-end: the "
    "x7-scaled detrended series (the decompose_ma trick) quantizes "
    "the dow-mean seasonal at milli-units with truncation-toward-zero "
    "(CASE-guarded // on the DuckDB side to match Spark div on "
    "negatives), and the variances compare as the integer numerators "
    "n*Sum(x^2) - (Sum x)^2 over a COMMON denominator — the ratio "
    "never touches a float. HUGEINT/DECIMAL(38,0) sums. Shape: one "
    "day-grain hash-agg, type-partitioned 7-day MA windows on the "
    "bounded day dim, one dow-profile agg, one variance agg",
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(w).alias("t7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    ).filter(F.col("n7") == 7)
    det = tr.select(
        "event_type",
        (7 * F.col("cents") - F.col("t7")).alias("d7"),
        F.expr("CAST(pmod(day, 7) AS INT)").alias("dow"),
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.sum("d7").alias("sd7"), F.count(F.lit(1)).alias("nd")
    )
    q = det.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        (F.col("d7") * 1000).alias("x"),
        F.expr("d7 * 1000 - (sd7 * 1000) div nd").alias("rres"),
    )
    dec = lambda c: F.expr(f"CAST({c} AS DECIMAL(38,0))")  # noqa: E731
    v = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (
            F.count(F.lit(1)) * F.sum(dec("x") * F.col("x"))
            - F.sum(dec("x")) * F.sum(dec("x"))
        ).alias("vd"),
        (
            F.count(F.lit(1)) * F.sum(dec("rres") * F.col("rres"))
            - F.sum(dec("rres")) * F.sum(dec("rres"))
        ).alias("vr"),
    )
    return v.select(
        "event_type",
        "n_days",
        F.expr(
            "CAST(CASE WHEN vd = 0 THEN 0"
            " WHEN vr * 1000000 >= vd * 1000000 THEN 0"
            " ELSE 1000000 - vr * 1000000 div vd END AS BIGINT)"
        ).alias("strength_micro"),
    )
