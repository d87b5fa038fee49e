"""Round-5 batch 3: experimentation, attribution, and interval-join
operators —

- ``ab_chi2_independence``: chi-square independence test of event type
  vs experiment variant — the categorical A/B significance screen
  (companion to ab_ttest_welch's means test); per-cell contributions
  emitted as rows so no cross-row float summation order exists.
- ``rel_attribution_linear``: linear multi-touch attribution — every
  click before a purchase shares the credit equally (vs the last-touch
  winner-takes-all already in the engine); credits are exact integer
  micro-shares via floor division.
- ``j9_interval_overlap``: interval-overlap join (sessions x
  business-hour windows) via DAY-BUCKET chopping: intervals explode to
  the calendar buckets they span (bounded fan-out), the join is an
  EQUI-join on the bucket key — the scale-safe form of the
  interval-interval join that would otherwise be a non-equi
  nested-loop; overlap durations are exact integer seconds.

Float discipline: chi-square expectations derive from exact integer
contingency counts through one shared expression; attribution credits
and overlaps are exact integers end-to-end. No libm in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ab_chi2_independence
# ---------------------------------------------------------------------------

_CHI2_SQL = """
    WITH obs AS (
      SELECT event_type, CAST(user_id % 2 AS INT) AS variant,
             count(*) AS o
      FROM events GROUP BY 1, 2),
    rt AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY 1),
    ct AS (SELECT variant, sum(o) AS c FROM obs GROUP BY 1),
    n AS (SELECT sum(o) AS n FROM obs)
    SELECT o.event_type, o.variant,
           CAST(o.o AS BIGINT) AS observed,
           round(CAST(rt.r AS DOUBLE) * ct.c / n.n, 4) AS expected,
           round(round(
             (o.o - CAST(rt.r AS DOUBLE) * ct.c / n.n)
             * (o.o - CAST(rt.r AS DOUBLE) * ct.c / n.n)
             / (CAST(rt.r AS DOUBLE) * ct.c / n.n), 9), 6) AS chi2_term
    FROM obs o
    JOIN rt ON o.event_type = rt.event_type
    JOIN ct ON o.variant = ct.variant
    CROSS JOIN n
"""


@register(
    "ab_chi2_independence",
    _CHI2_SQL,
    "chi-square independence test of event type vs experiment variant "
    "(user_id parity): the categorical A/B screen beside the Welch "
    "means test. Observed/row/column/grand totals are ONE hash agg "
    "plus aggregates of the |types|x2 cell dim; expectations and "
    "contributions are one shared double expression from exact "
    "integer counts, emitted PER CELL (the analyst sums the column; "
    "no cross-row float accumulation order exists to diverge)",
)
def ab_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("variant").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    return (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "variant")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "variant",
            F.col("o").cast("bigint").alias("observed"),
            F.round(e, 4).alias("expected"),
            F.round(
                F.round((F.col("o") - e) * (F.col("o") - e) / e, 9), 6
            ).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# rel_attribution_linear
# ---------------------------------------------------------------------------

_ATTR_SQL = """
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts,
             CAST(round(value * 100, 0) AS BIGINT) AS rev_cents
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT user_id, event_id AS click_id, ts
      FROM events WHERE event_type = 'click'),
    np AS (
      SELECT p.user_id, p.purchase_id, p.ts, p.rev_cents,
             count(*) AS n_clicks
      FROM p JOIN c ON p.user_id = c.user_id AND c.ts < p.ts
      GROUP BY 1, 2, 3, 4)
    SELECT c.click_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(1000000 // np.n_clicks) AS BIGINT) AS credit_micro,
           CAST(sum(np.rev_cents // np.n_clicks) AS BIGINT)
             AS attributed_cents
    FROM np JOIN c ON np.user_id = c.user_id AND c.ts < np.ts
    GROUP BY c.click_id
"""


@register(
    "rel_attribution_linear",
    _ATTR_SQL,
    "linear multi-touch attribution: every click preceding a purchase "
    "shares the credit equally — the standard alternative to the "
    "last-touch winner-takes-all already in the engine "
    "(rel_attribution_last_touch). Credit and revenue shares are EXACT "
    "integer floor-division micro-shares (1e6//n, cents//n), so sums "
    "are partitioning-independent. Shape: both click->purchase "
    "correlations are USER-KEYED joins (bounded per-user fan-out, "
    "shuffle on user_id reused), one purchase-level agg, one "
    "click-level agg",
)
def rel_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("rev_cents"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    np_ = (
        p.join(c, "user_id")
        .filter(F.col("c_ts") < F.col("p_ts"))
        .groupBy("user_id", "purchase_id", "p_ts", "rev_cents")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    return (
        np_.join(c, "user_id")
        .filter(F.col("c_ts") < F.col("p_ts"))
        .groupBy("click_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.expr("1000000 div n_clicks")).cast("bigint").alias(
                "credit_micro"
            ),
            F.sum(F.expr("rev_cents div n_clicks")).cast("bigint").alias(
                "attributed_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# j9_interval_overlap
# ---------------------------------------------------------------------------

_IVO_SQL = """
    WITH ev AS (
      SELECT user_id, ts, epoch_us(ts) AS x FROM events),
    o AS (
      SELECT user_id, ts, x,
             CASE WHEN lag(x) OVER w IS NULL
                    OR x - lag(x) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    g AS (
      SELECT user_id, x,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY x
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
    sess AS (
      SELECT user_id, sid, min(x) AS s0, max(x) AS s1
      FROM g GROUP BY 1, 2),
    chopped AS (
      SELECT user_id, sid, s0, s1,
             unnest(range(s0 // 86400000000, s1 // 86400000000 + 1))
               AS day_id
      FROM sess),
    win AS (
      SELECT day_id,
             day_id * 86400000000 + 9 * 3600000000 AS w0,
             day_id * 86400000000 + 17 * 3600000000 AS w1
      FROM (SELECT DISTINCT day_id FROM chopped) d),
    ov AS (
      SELECT c.user_id, c.sid,
             greatest(0, least(c.s1, w.w1) - greatest(c.s0, w.w0))
               AS ov_us
      FROM chopped c JOIN win w ON c.day_id = w.day_id)
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           CAST(sum(CASE WHEN ov_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_windows,
           CAST(sum(ov_us) // 1000000 AS BIGINT) AS overlap_secs
    FROM ov GROUP BY 1, 2
"""


@register(
    "j9_interval_overlap",
    _IVO_SQL,
    "interval-overlap join: 30-min-gap sessions x daily business-hour "
    "(9-17) windows, the campaign/maintenance-window overlap report. "
    "Scale shape: each session CHOPS to the day buckets it spans "
    "(bounded fan-out: days per session), the join is an EQUI-join on "
    "day_id — the bucketed form of the interval-interval join that "
    "would otherwise be a non-equi nested loop over all window pairs. "
    "Overlaps are exact integer microseconds (greatest/least on "
    "epoch-us), floor-divided to whole seconds",
)
def j9_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_micros("ts").alias("x")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    o = ev.withColumn(
        "new_s",
        F.when(
            F.lag("x").over(w).isNull()
            | (F.col("x") - F.lag("x").over(w) >= 1800000000),
            1,
        ).otherwise(0),
    )
    g = o.withColumn(
        "sid",
        F.sum("new_s").over(
            Window.partitionBy("user_id")
            .orderBy("x")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sess = g.groupBy("user_id", "sid").agg(
        F.min("x").alias("s0"), F.max("x").alias("s1")
    )
    chopped = sess.withColumn(
        "day_id",
        F.explode(
            F.sequence(
                F.expr("s0 div 86400000000"), F.expr("s1 div 86400000000")
            )
        ),
    )
    win = chopped.select("day_id").distinct().select(
        "day_id",
        (F.col("day_id") * 86400000000 + 9 * 3600000000).alias("w0"),
        (F.col("day_id") * 86400000000 + 17 * 3600000000).alias("w1"),
    )
    ov = chopped.join(win, "day_id").select(
        "user_id",
        "sid",
        F.greatest(
            F.lit(0),
            F.least(F.col("s1"), F.col("w1"))
            - F.greatest(F.col("s0"), F.col("w0")),
        ).alias("ov_us"),
    )
    return ov.groupBy(
        "user_id", F.col("sid").cast("bigint").alias("session_id")
    ).agg(
        F.sum(F.when(F.col("ov_us") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_windows"),
        F.expr("CAST(sum(ov_us) div 1000000 AS BIGINT)").alias(
            "overlap_secs"
        ),
    )
