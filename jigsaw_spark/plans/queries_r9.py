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


# ---------------------------------------------------------------------------
# curation_pipeline_v3
# ---------------------------------------------------------------------------

_V3_NB_B = 4096
_V3_KN_FLOOR = -8_000_000  # micro-units: avg bigram logP >= -8.0


def _v3_sql() -> str:
    from jigsaw_spark.operators.text import fingerprint_sql, tokens_sql

    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
    -- Naive Bayes stage (fit even docs, score odd): hashed-gram LLR
    grams AS (
      SELECT x.doc_id, unnest(x.t) AS gram FROM toks x
      UNION ALL
      SELECT x.doc_id, x.t[i] || ' ' || x.t[i+1] AS gram
      FROM toks x, LATERAL (SELECT unnest(range(1, len(x.t))) AS i) ii
      WHERE len(x.t) >= 2),
    bucketed AS MATERIALIZED (
      SELECT g.doc_id, d.lang = 'en' AS is_en,
             ('0x' || substr(md5(g.gram), 1, 12))::UBIGINT % {_V3_NB_B}
               AS bucket
      FROM grams g JOIN documents d ON g.doc_id = d.doc_id),
    nb_fit AS MATERIALIZED (
      SELECT bucket,
             sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS ce,
             sum(CASE WHEN is_en THEN 0 ELSE 1 END) AS co
      FROM bucketed WHERE doc_id % 2 = 0 GROUP BY bucket),
    nb_tot AS MATERIALIZED (
      SELECT sum(ce) AS te, sum(co) AS tco,
             (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              FROM documents WHERE doc_id % 2 = 0) AS ne,
             (SELECT sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
              FROM documents WHERE doc_id % 2 = 0) AS no
      FROM nb_fit),
    llr AS MATERIALIZED (
      SELECT f.bucket,
             CAST(round((ln((f.ce + 1.0) / (t.te + {_V3_NB_B}))
                       - ln((f.co + 1.0) / (t.tco + {_V3_NB_B}))) * 1e6)
                  AS BIGINT) AS llr_micro
      FROM nb_fit f CROSS JOIN nb_tot t),
    nb_doc AS MATERIALIZED (
      SELECT s.doc_id,
             CAST(sum(coalesce(l.llr_micro, 0))
                  + (SELECT CAST(round((ln(ne + 1.0) - ln(no + 1.0)) * 1e6)
                              AS BIGINT) FROM nb_tot)
                  AS BIGINT) AS nb_micro
      FROM (SELECT doc_id, bucket FROM bucketed WHERE doc_id % 2 = 1) s
      LEFT JOIN llr l ON s.bucket = l.bucket
      GROUP BY s.doc_id),
    -- Kneser-Ney stage (fit even docs, score odd)
    fit_bg AS (
      SELECT x.t[i] AS w1, x.t[i+1] AS w2
      FROM toks x, LATERAL (SELECT unnest(range(1, len(x.t))) AS i) ii
      WHERE x.doc_id % 2 = 0 AND len(x.t) >= 2),
    big AS MATERIALIZED (
      SELECT w1, w2, count(*) AS c12 FROM fit_bg GROUP BY w1, w2),
    w1s AS MATERIALIZED (
      SELECT w1, sum(c12) AS c1, count(*) AS n1p FROM big GROUP BY w1),
    w2c AS MATERIALIZED (
      SELECT w2, count(*) AS nd FROM big GROUP BY w2),
    kn_tot AS MATERIALIZED (
      SELECT (SELECT count(*) FROM big) AS tt,
             (SELECT count(DISTINCT w1) FROM (
                SELECT w1 FROM big UNION ALL SELECT w2 FROM big) u(w1))
               AS v),
    sc_bg AS (
      SELECT x.doc_id, x.t[i] AS w1, x.t[i+1] AS w2
      FROM toks x, LATERAL (SELECT unnest(range(1, len(x.t))) AS i) ii
      WHERE x.doc_id % 2 = 1 AND len(x.t) >= 2),
    kn_doc AS MATERIALIZED (
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(CAST(round(ln(
               CASE WHEN w1s.c1 IS NULL
                 THEN (coalesce(w2c.nd, 0) + 1.0) / (kt.tt + kt.v)
                 ELSE greatest(4 * coalesce(big.c12, 0) - 3, 0)
                        / (4.0 * w1s.c1)
                      + (3.0 * w1s.n1p) / (4.0 * w1s.c1)
                        * ((coalesce(w2c.nd, 0) + 1.0) / (kt.tt + kt.v))
               END) * 1e6) AS BIGINT)) AS BIGINT) AS kn_micro
      FROM sc_bg s
      LEFT JOIN big ON s.w1 = big.w1 AND s.w2 = big.w2
      LEFT JOIN w1s ON s.w1 = w1s.w1
      LEFT JOIN w2c ON s.w2 = w2c.w2
      CROSS JOIN kn_tot kt
      GROUP BY s.doc_id),
    -- gate (all-integer), dedup keepers, stratified fold
    survivors AS MATERIALIZED (
      SELECT d.doc_id, d.source, d.lang, d.n_chars
      FROM documents d
      JOIN nb_doc nb ON d.doc_id = nb.doc_id
      JOIN kn_doc kn ON d.doc_id = kn.doc_id
      WHERE d.doc_id % 2 = 1
        AND nb.nb_micro > 0
        AND kn.kn_micro >= {_V3_KN_FLOOR} * kn.n_bigrams),
    fp AS (
      SELECT s.doc_id, s.source, s.lang, s.n_chars,
             {fingerprint_sql('x.t')} AS fp
      FROM survivors s JOIN toks x ON s.doc_id = x.doc_id),
    kept AS MATERIALIZED (
      SELECT doc_id, source, lang, n_chars
      FROM (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM fp)
      WHERE doc_id = keeper),
    folded AS (
      SELECT source, lang, n_chars,
             CAST((row_number() OVER (
                     PARTITION BY lang
                     ORDER BY md5('skfold|' || CAST(doc_id AS VARCHAR)),
                              doc_id) - 1) % 5 AS INT) AS fold
      FROM kept),
    odd_totals AS (
      SELECT source, count(*) AS odd_n FROM documents
      WHERE doc_id % 2 = 1 GROUP BY source)
    SELECT f.source, f.fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f.n_chars) AS BIGINT) AS n_chars,
           round(CAST(sum(count(*)) OVER (PARTITION BY f.source) AS DOUBLE)
                 / max(ot.odd_n), 6) AS source_retention
    FROM folded f JOIN odd_totals ot ON f.source = ot.source
    GROUP BY f.source, f.fold
"""


@register(
    "curation_pipeline_v3",
    _v3_sql(),
    "round-5 curation composite — every stage the production operator, "
    "chained lazily: (1) Naive Bayes domain gate (hashed-gram LLR + "
    "prior, integer micro-units, fit on the historical/even half), "
    "(2) Kneser-Ney perplexity floor (avg bigram logP >= -8, enforced "
    "as the INTEGER inequality kn_micro >= floor*n so no float enters "
    "the gate), (3) exact-dedup keeper selection on the survivors, "
    "(4) stratified 5-fold assignment (partitioned rank window), "
    "(5) per-(source, fold) export counts with per-source retention. "
    "One corpus tokenization feeds every stage; the fold window runs "
    "on the kept set only",
)
def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.hashing import md5_key
    from jigsaw_spark.operators.dedup import exact_dedup
    from jigsaw_spark.plans.queries_r7 import ml_nbayes_classify, text_kneser_ney

    docs = _t(spark, sf_dir, "documents")
    nb = ml_nbayes_classify(spark, sf_dir).select(
        "doc_id", F.col("score_micro").alias("nb_micro")
    )
    kn = text_kneser_ney(spark, sf_dir).select(
        "doc_id", F.col("logp_micro").alias("kn_micro"), "n_bigrams"
    )
    survivors = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .join(nb, "doc_id")
        .join(kn, "doc_id")
        .filter(
            (F.col("nb_micro") > 0)
            & (F.col("kn_micro") >= _V3_KN_FLOOR * F.col("n_bigrams"))
        )
        .select("doc_id", "text", "source", "lang", "n_chars")
    )
    kept = (
        exact_dedup(survivors, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "source", "lang", "n_chars")
    )
    w = Window.partitionBy("lang").orderBy(
        md5_key(F.col("doc_id"), seed="skfold"), "doc_id"
    )
    folded = kept.select(
        "source",
        "n_chars",
        ((F.row_number().over(w) - 1) % 5).cast("int").alias("fold"),
    )
    odd_totals = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("odd_n"))
    )
    per_fold = folded.groupBy("source", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    return (
        per_fold.join(F.broadcast(odd_totals), "source")
        .select(
            "source",
            "fold",
            "n_docs",
            "n_chars",
            F.round(
                F.sum("n_docs").over(Window.partitionBy("source")).cast(
                    "double"
                )
                / F.col("odd_n"),
                6,
            ).alias("source_retention"),
        )
    )


# ---------------------------------------------------------------------------
# ts_best_changepoint
# ---------------------------------------------------------------------------

_BCP_SQL = """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2),
    pre AS (
      SELECT event_type, day_id, y,
             row_number() OVER w AS i,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(CAST(y AS DECIMAL(38,0))) OVER w AS cs,
             sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
               OVER w AS cs2,
             sum(CAST(y AS DECIMAL(38,0)))
               OVER (PARTITION BY event_type) AS ts_,
             sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
               OVER (PARTITION BY event_type) AS ts2
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_id
                   ROWS UNBOUNDED PRECEDING)),
    cand AS (
      SELECT event_type, day_id, i, n,
             round(round(
               CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / i
               + (CAST(ts_ AS DOUBLE) - CAST(cs AS DOUBLE))
                 * (CAST(ts_ AS DOUBLE) - CAST(cs AS DOUBLE)) / (n - i)
               - CAST(ts_ AS DOUBLE) * CAST(ts_ AS DOUBLE) / n, 6), 2)
               AS gain_cents2
      FROM pre WHERE i < n),
    best AS (
      SELECT event_type, day_id, gain_cents2,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY gain_cents2 DESC, day_id) AS rn
      FROM cand)
    SELECT event_type,
           CAST(day_id AS BIGINT) AS split_day,
           round(gain_cents2 / 10000.0, 2) AS gain_dollars2
    FROM best WHERE rn = 1
"""


@register(
    "ts_best_changepoint",
    _BCP_SQL,
    "single change-point detection per event type (the binary-"
    "segmentation inner step, CUSUM's offline twin): the split day "
    "maximizing the between-segment SSE reduction gain(t) = "
    "SL^2/t + SR^2/(n-t) - S^2/n, computed from EXACT decimal(38,0) "
    "prefix sums over the per-(type,day) aggregate — every window is "
    "partitioned by type on the calendar-bounded day dim. The gain is "
    "one shared double expression double-round-snapped (6 then 2 "
    "cents^2 digits) so the argmax is engine-stable; ties break on "
    "the earlier day",
)
def ts_best_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias(
            "day_id"
        ),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("y"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    wo = (
        Window.partitionBy("event_type")
        .orderBy("day_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day_id",
        F.row_number().over(Window.partitionBy("event_type").orderBy("day_id")).alias("i"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum(d(F.col("y"))).over(wo).alias("cs"),
        F.sum(d(F.col("y"))).over(wt).alias("ts_"),
    )
    cs, ts_ = F.col("cs").cast("double"), F.col("ts_").cast("double")
    i, n = F.col("i"), F.col("n")
    gain = F.round(
        F.round(
            cs * cs / i + (ts_ - cs) * (ts_ - cs) / (n - i) - ts_ * ts_ / n,
            6,
        ),
        2,
    )
    cand = pre.filter(i < n).select(
        "event_type", "day_id", gain.alias("gain_cents2")
    )
    best = cand.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.desc("gain_cents2"), "day_id"
            )
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.col("day_id").cast("bigint").alias("split_day"),
        F.round(F.col("gain_cents2") / 10000.0, 2).alias("gain_dollars2"),
    )


# ---------------------------------------------------------------------------
# stream_sliding_topk
# ---------------------------------------------------------------------------

_STK_SQL = """
    WITH w AS (
      SELECT CAST(time_bucket(INTERVAL 6 HOUR, ts) AS TIMESTAMP) AS wstart,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT wstart, event_type, n,
             row_number() OVER (PARTITION BY wstart
                                ORDER BY n DESC, event_type) AS rank
      FROM w)
    SELECT wstart, event_type, CAST(n AS BIGINT) AS n,
           CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 3
"""


@register(
    "stream_sliding_topk",
    _STK_SQL,
    "streaming trending-now: per 6-hour tumbling window, the top-3 "
    "event types by count. The STREAM side runs one windowed count "
    "(the only stateful operator — the rank is applied to the drained "
    "complete-mode table as a batch transform, respecting the "
    "single-stateful-agg discipline); ties break on event_type so the "
    "top-3 is total. At production volumes the window state is "
    "|types| rows per open window — KB scale",
)
def stream_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_event_stream

    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    counts = stream.groupBy(
        F.window("ts", "6 hours").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    name = f"stream_topk_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    drained = spark.table(name).select(
        F.col("w.start").alias("wstart"), "event_type", "n"
    )
    r = drained.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("wstart").orderBy(F.desc("n"), "event_type")
        ),
    )
    return r.filter(F.col("rank") <= 3).select(
        "wstart",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# layout_manifest_prune
# ---------------------------------------------------------------------------

_LMP_SQL = """
    WITH keyed AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ('0x' || substr(md5('file|' || CAST(o_orderkey AS VARCHAR)),
                             1, 12))::UBIGINT % 64 AS file_id
      FROM orders),
    manifest AS MATERIALIZED (
      SELECT file_id, count(*) AS n_rows,
             min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
             min(cents) AS c_min, max(cents) AS c_max
      FROM keyed GROUP BY file_id),
    zkeyed AS (
      SELECT o_orderkey, o_custkey, cents,
             CAST(o_custkey % 256 AS BIGINT) * 256
               + CAST(cents % 256 AS BIGINT) AS zf,
             o_custkey // 200 AS file_id
      FROM keyed),
    zmanifest AS MATERIALIZED (
      SELECT file_id, count(*) AS n_rows,
             min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
             min(cents) AS c_min, max(cents) AS c_max
      FROM zkeyed GROUP BY file_id),
    preds AS (
      SELECT * FROM (VALUES
        ('custkey_100_300', 100, 300, NULL, NULL),
        ('price_50k_60k', NULL, NULL, 5000000, 6000000),
        ('both', 100, 300, 5000000, 6000000))
        p(pred, ck_lo, ck_hi, c_lo, c_hi)),
    eval_ AS (
      SELECT p.pred, lay.layout, lay.file_id, lay.n_rows,
             CASE WHEN (p.ck_lo IS NULL
                        OR (lay.ck_max >= p.ck_lo AND lay.ck_min <= p.ck_hi))
                   AND (p.c_lo IS NULL
                        OR (lay.c_max >= p.c_lo AND lay.c_min <= p.c_hi))
                  THEN 1 ELSE 0 END AS scanned
      FROM preds p CROSS JOIN (
        SELECT 'hash' AS layout, * FROM manifest
        UNION ALL
        SELECT 'clustered' AS layout, * FROM zmanifest) lay)
    SELECT pred, layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(scanned) AS BIGINT) AS files_scanned,
           CAST(sum(CASE WHEN scanned = 1 THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_scanned
    FROM eval_ GROUP BY pred, layout
"""


@register(
    "layout_manifest_prune",
    _LMP_SQL,
    "file-skipping simulation — WHY the layout queries exist: the same "
    "orders land in 64 files twice (random md5 placement vs custkey-"
    "clustered placement), a per-file min/max manifest is computed for "
    "each, and three predicates are evaluated against the manifests "
    "alone. The clustered layout prunes most files on its cluster "
    "key while random placement scans everything — the Iceberg/Delta "
    "manifest arithmetic as an auditable query. All exact integers; "
    "manifests are |files|-row dims",
)
def layout_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    keyed = orders.select(
        "o_orderkey",
        "o_custkey",
        cents.alias("cents"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("file|"), F.col("o_orderkey").cast("string")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(64),
        ).alias("file_id"),
    )

    def manifest(df):
        return df.groupBy("file_id").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("ck_min"),
            F.max("o_custkey").alias("ck_max"),
            F.min("cents").alias("c_min"),
            F.max("cents").alias("c_max"),
        )

    m_hash = manifest(keyed).withColumn("layout", F.lit("hash"))
    m_clus = manifest(
        keyed.withColumn("file_id", F.expr("o_custkey div 200"))
    ).withColumn("layout", F.lit("clustered"))
    lay = m_hash.unionByName(m_clus)
    preds = keyed.sparkSession.createDataFrame(
        [
            ("custkey_100_300", 100, 300, None, None),
            ("price_50k_60k", None, None, 5000000, 6000000),
            ("both", 100, 300, 5000000, 6000000),
        ],
        "pred string, ck_lo bigint, ck_hi bigint, c_lo bigint, c_hi bigint",
    )
    scanned = F.when(
        (
            F.col("ck_lo").isNull()
            | ((F.col("ck_max") >= F.col("ck_lo")) & (F.col("ck_min") <= F.col("ck_hi")))
        )
        & (
            F.col("c_lo").isNull()
            | ((F.col("c_max") >= F.col("c_lo")) & (F.col("c_min") <= F.col("c_hi")))
        ),
        1,
    ).otherwise(0)
    ev = preds.crossJoin(F.broadcast(lay)).withColumn("scanned", scanned)
    return ev.groupBy("pred", "layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("scanned").cast("bigint").alias("files_scanned"),
        F.sum(F.when(F.col("scanned") == 1, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
    )
