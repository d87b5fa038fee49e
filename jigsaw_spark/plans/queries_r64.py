"""Round-11 batch 4: evaluation robustness and weighted-sampling
diagnostics, plus the streaming drift monitor.

- ``ml_fold_stability``: is a metric reading reproducible across
  folds — a fixed decision stump (predict purchase iff cents > the
  global lower median) is scored on 5 md5-hash folds
  (``kfold_hash``'s pmod convention); per fold the exact accuracy,
  plus the between-fold spread (max - min) every row carries. A
  20-milli accuracy delta between model variants means nothing if the
  fold spread is 40 milli — the cross-validation noise floor next to
  ``ml_bootstrap_f1``'s resampling band (folds partition the data;
  bootstrap resamples it — the two bands answer different questions).
- ``ml_label_shift_weights``: label-shift (prior-shift) estimate
  between the frozen temporal halves (``ml_calibration_drift``'s week
  cut): per event type, train/test counts and shares, and the
  importance weight w = test_share/train_share in exact integer micro
  — the reweighting ledger a label-shift correction multiplies into
  the loss when yesterday's class mix stops matching today's.
- ``p_ess_weight_clip``: effective sample size of a weighted sample
  before and after clipping — weights = n_chars (the length-biased
  sampling a token-budget draw induces), clipped at the exact p95;
  per lang: normalized ESS = (sum w)^2 / (n * sum w^2) in milli, raw
  vs clipped, and the clipped-row count. ESS near 1000 = weights are
  harmless; ESS of 100 = 90% of the sample budget is wasted on heavy
  rows, and clipping buys it back at known bias — the degeneracy
  check run before any p_weighted_sample / DSIR draw ships.
- ``stream_psi_monitor``: streaming drift monitor — per event-time
  day, the PSI of the day's score distribution against a card FROZEN
  offline (bin edges AND expected bin shares read from the batch
  table before the stream starts; a monitor never re-fits its own
  reference). The streaming twin of ``dq_psi_drift`` and the drift
  arm next to ``stream_ece_monitor``'s calibration arm; same
  0.5/5-smoothed milli-snapped PSI as the certified
  ``p_drift_reweight``. Over a full AvailableNow drain the frozen
  card equals the batch card, so the oracle is exact.

Scale notes (100 TB): fold stability is one distinct-cents median
window (value-domain bounded) + one fold-keyed hash-agg; label shift
is one (type, half) hash-agg + two scalar dims; ESS is one scan with a
distinct-value p95 window (value-domain bounded) + a |langs| rollup in
decimal(38,0); the PSI monitor keeps (day x 10 bins) streaming state
behind a 1-day tumbling window + 2-day watermark, and the frozen card
rides the plan as literals/broadcast — never a stream-side aggregate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ml_fold_stability
# ---------------------------------------------------------------------------

_FOLD_STAB_SQL = """
    WITH s AS (
      SELECT event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    vals AS (SELECT cents, CAST(count(*) AS BIGINT) AS c
             FROM s GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vals),
    med AS MATERIALIZED (
      SELECT min(cents) AS m FROM (
        SELECT cents, sum(c) OVER (ORDER BY cents) AS cum FROM vals) t
      WHERE 2 * cum >= (SELECT n FROM tot)),
    scored AS (
      SELECT CAST(CAST(('0x' || substr(md5('foldstab|'
               || CAST(event_id AS VARCHAR)), 1, 15)) AS UBIGINT)
               % CAST(5 AS UBIGINT) AS BIGINT) AS fold,
             CASE WHEN (cents > (SELECT m FROM med)) = (y = 1)
               THEN 1 ELSE 0 END AS correct
      FROM s),
    per AS (
      SELECT fold, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(correct) AS BIGINT) AS n_correct,
             CAST(sum(correct) * 1000 // count(*) AS BIGINT)
               AS acc_milli
      FROM scored GROUP BY 1),
    spread AS (
      SELECT CAST(max(acc_milli) - min(acc_milli) AS BIGINT) AS sp
      FROM per)
    SELECT CAST(fold AS INT) AS fold, n, n_correct, acc_milli,
           (SELECT sp FROM spread) AS spread_milli
    FROM per
"""


@register(
    "ml_fold_stability",
    _FOLD_STAB_SQL,
    "cross-validation noise floor: a FIXED decision stump (purchase "
    "iff cents > the global lower median, the exact distinct-value "
    "median) scored on 5 md5-hash folds (kfold_hash's pmod "
    "convention); per fold the exact integer accuracy plus the "
    "between-fold spread on every row — a 20-milli model delta means "
    "nothing if the fold spread is 40 milli. Folds PARTITION the "
    "data, ml_bootstrap_f1 RESAMPLES it: the two bands answer "
    "different questions (data heterogeneity vs sampling noise). "
    "Shape: distinct-cents median window (value-domain bounded), one "
    "map-side fold assignment, one 5-row hash-agg + 1-row spread "
    "cross",
)
def ml_fold_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    vals = s.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    from pyspark.sql.window import Window

    cum = vals.select(
        "cents",
        F.sum("c").over(
            Window.orderBy("cents").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ).alias("cum"),
    )
    tot = vals.agg(F.sum("c").cast("bigint").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("cents").alias("m"))
    )
    fold = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("foldstab"), F.col("event_id")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(5),
    )
    scored = s.crossJoin(F.broadcast(med)).select(
        fold.alias("fold"),
        F.when(
            (F.col("cents") > F.col("m")) == (F.col("y") == 1), 1
        )
        .otherwise(0)
        .alias("correct"),
    )
    per = scored.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("correct").cast("bigint").alias("n_correct"),
        F.expr(
            "CAST(sum(correct) * 1000 div count(1) AS BIGINT)"
        ).alias("acc_milli"),
    )
    spread = per.agg(
        (F.max("acc_milli") - F.min("acc_milli"))
        .cast("bigint")
        .alias("spread_milli")
    )
    return per.crossJoin(F.broadcast(spread)).select(
        F.col("fold").cast("int").alias("fold"),
        "n",
        "n_correct",
        "acc_milli",
        "spread_milli",
    )


# ---------------------------------------------------------------------------
# ml_label_shift_weights
# ---------------------------------------------------------------------------

_LABEL_SHIFT_SQL = """
    WITH w AS (
      SELECT event_type,
             epoch_us(ts) // 604800000000 AS week
      FROM events),
    b AS MATERIALIZED (
      SELECT min(week) AS wmin, max(week) AS wmax FROM w),
    halves AS (
      SELECT event_type,
             week < ((SELECT wmin FROM b) + (SELECT wmax FROM b)) // 2
                    + 1 AS is_train
      FROM w),
    c AS (
      SELECT event_type,
             CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train,
             CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
               AS n_test
      FROM halves GROUP BY 1),
    tot AS (
      SELECT CAST(sum(n_train) AS BIGINT) AS nt,
             CAST(sum(n_test) AS BIGINT) AS ne
      FROM c)
    SELECT c.event_type, c.n_train, c.n_test,
           CAST(CASE WHEN t.nt = 0 THEN 0
             ELSE c.n_train * 1000 // t.nt END AS BIGINT)
             AS train_share_milli,
           CAST(CASE WHEN t.ne = 0 THEN 0
             ELSE c.n_test * 1000 // t.ne END AS BIGINT)
             AS test_share_milli,
           CAST(CASE WHEN c.n_train = 0 OR t.ne = 0 THEN 0
             ELSE c.n_test * t.nt * 1000000 // (c.n_train * t.ne)
             END AS BIGINT) AS weight_micro
    FROM c CROSS JOIN tot t
"""


@register(
    "ml_label_shift_weights",
    _LABEL_SHIFT_SQL,
    "label-shift (prior-shift) reweighting ledger: on "
    "ml_calibration_drift's frozen temporal week cut, per event type: "
    "train/test counts, shares, and the importance weight "
    "w = test_share / train_share as an exact integer micro ratio "
    "(n_test * N_train * 1e6 div (n_train * N_test)) — the factor a "
    "label-shift correction multiplies into the loss when yesterday's "
    "class mix stops matching today's. p_drift_reweight prices "
    "DISTRIBUTION drift inside each domain; this prices the CLASS MIX "
    "drift between halves. Shape: one (type, half) hash-agg, one "
    "2-scalar dim cross — exact integers throughout",
)
def ml_label_shift_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 604800000000").alias("week"),
    )
    b = w.agg(
        F.min("week").alias("wmin"), F.max("week").alias("wmax")
    )
    halves = w.crossJoin(F.broadcast(b)).select(
        "event_type",
        (
            F.col("week")
            < F.expr("(wmin + wmax) div 2 + 1")
        ).alias("is_train"),
    )
    c = halves.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_train"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_train"),
        F.sum(F.when(F.col("is_train"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_test"),
    )
    tot = c.agg(
        F.sum("n_train").cast("bigint").alias("nt"),
        F.sum("n_test").cast("bigint").alias("ne"),
    )
    return c.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_train",
        "n_test",
        F.expr(
            "CAST(CASE WHEN nt = 0 THEN 0"
            " ELSE n_train * 1000 div nt END AS BIGINT)"
        ).alias("train_share_milli"),
        F.expr(
            "CAST(CASE WHEN ne = 0 THEN 0"
            " ELSE n_test * 1000 div ne END AS BIGINT)"
        ).alias("test_share_milli"),
        F.expr(
            "CAST(CASE WHEN n_train = 0 OR ne = 0 THEN 0"
            " ELSE n_test * nt * 1000000 div (n_train * ne)"
            " END AS BIGINT)"
        ).alias("weight_micro"),
    )


# ---------------------------------------------------------------------------
# p_ess_weight_clip
# ---------------------------------------------------------------------------

_ESS_SQL = """
    WITH s AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w
               FROM documents),
    vals AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vals),
    p95 AS MATERIALIZED (
      SELECT min(w) AS cap FROM (
        SELECT w, sum(c) OVER (ORDER BY w) AS cum FROM vals) t
      WHERE 100 * cum >= 95 * (SELECT n FROM tot)),
    clipped AS (
      SELECT lang, w, least(w, (SELECT cap FROM p95)) AS wc
      FROM s),
    agg AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN w > wc THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped,
             CAST(sum(w) AS HUGEINT) AS sw,
             CAST(sum(w * w) AS HUGEINT) AS sw2,
             CAST(sum(wc) AS HUGEINT) AS swc,
             CAST(sum(wc * wc) AS HUGEINT) AS swc2
      FROM clipped GROUP BY 1)
    SELECT lang, n, n_clipped,
           CAST(CASE WHEN sw2 = 0 THEN 0
             ELSE sw * sw * 1000 // (n * sw2) END AS BIGINT)
             AS ess_raw_milli,
           CAST(CASE WHEN swc2 = 0 THEN 0
             ELSE swc * swc * 1000 // (n * swc2) END AS BIGINT)
             AS ess_clipped_milli
    FROM agg
"""


@register(
    "p_ess_weight_clip",
    _ESS_SQL,
    "weighted-sampling degeneracy check: effective sample size of a "
    "length-weighted draw (weights = n_chars, the bias a token-budget "
    "sample induces), raw vs clipped at the exact distinct-value p95; "
    "per lang, normalized ESS = (sum w)^2 / (n * sum w^2) in milli "
    "(decimal(38,0)/HUGEINT sums, order-independent) plus the clipped "
    "count. ESS near 1000 = weights harmless; ESS of 100 = 90% of the "
    "budget wasted on heavy rows — clipping buys it back at known "
    "bias. The gate run before any p_weighted_sample / DSIR draw "
    "ships. Shape: one scan, one distinct-value p95 window "
    "(value-domain bounded), one |langs| rollup",
)
def p_ess_weight_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    s = docs.select(
        "lang", F.col("n_chars").cast("bigint").alias("w")
    )
    vals = s.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cum = vals.select(
        "w",
        F.sum("c").over(
            Window.orderBy("w").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ).alias("cum"),
    )
    tot = vals.agg(F.sum("c").cast("bigint").alias("n"))
    p95 = (
        cum.crossJoin(F.broadcast(tot))
        .filter(100 * F.col("cum") >= 95 * F.col("n"))
        .agg(F.min("w").alias("cap"))
    )
    dec = "decimal(38,0)"
    clipped = s.crossJoin(F.broadcast(p95)).select(
        "lang",
        "w",
        F.least(F.col("w"), F.col("cap")).alias("wc"),
    )
    return (
        clipped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("w") > F.col("wc"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped"),
            F.sum(F.col("w").cast(dec)).alias("sw"),
            F.sum((F.col("w") * F.col("w")).cast(dec)).alias("sw2"),
            F.sum(F.col("wc").cast(dec)).alias("swc"),
            F.sum((F.col("wc") * F.col("wc")).cast(dec)).alias("swc2"),
        )
        .select(
            "lang",
            "n",
            "n_clipped",
            F.expr(
                "CAST(CASE WHEN sw2 = 0 THEN 0"
                " ELSE sw * sw * 1000 div (n * sw2) END AS BIGINT)"
            ).alias("ess_raw_milli"),
            F.expr(
                "CAST(CASE WHEN swc2 = 0 THEN 0"
                " ELSE swc * swc * 1000 div (n * swc2) END AS BIGINT)"
            ).alias("ess_clipped_milli"),
        )
    )


# ---------------------------------------------------------------------------
# stream_psi_monitor
# ---------------------------------------------------------------------------

_PSI_MON_SQL = """
    WITH s AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    t AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi,
             CAST(count(*) AS BIGINT) AS n
      FROM s),
    binned AS (
      SELECT day,
             least(CASE WHEN (SELECT hi - lo FROM t) = 0 THEN 5
               ELSE (cents - (SELECT lo FROM t)) * 10
                    // (SELECT hi - lo FROM t) END, 9) AS bin
      FROM s),
    expected AS MATERIALIZED (
      SELECT bin, CAST(count(*) AS BIGINT) AS e
      FROM binned GROUP BY 1),
    bins AS (SELECT unnest(range(10)) AS bin),
    actual AS (
      SELECT day, bin, CAST(count(*) AS BIGINT) AS a
      FROM binned GROUP BY 1, 2),
    days AS (SELECT DISTINCT day FROM s),
    grid AS (
      SELECT d.day, b.bin,
             coalesce(a.a, 0) AS a, coalesce(e.e, 0) AS e,
             CAST(sum(coalesce(a.a, 0)) OVER (PARTITION BY d.day)
               AS BIGINT) AS n_day
      FROM days d CROSS JOIN bins b
      LEFT JOIN actual a ON a.day = d.day AND a.bin = b.bin
      LEFT JOIN expected e ON e.bin = b.bin)
    SELECT day, CAST(max(n_day) AS BIGINT) AS n,
           CAST(round(sum(
             ((a + 0.5) / (n_day + 5.0)
              - (e + 0.5) / ((SELECT n FROM t) + 5.0))
             * ln(((a + 0.5) / (n_day + 5.0))
                  / ((e + 0.5) / ((SELECT n FROM t) + 5.0)))
           ) * 1000, 0) AS BIGINT) AS psi_milli
    FROM grid GROUP BY day
"""


@register(
    "stream_psi_monitor",
    _PSI_MON_SQL,
    "streaming drift monitor: per event-time DAY, the PSI of the "
    "day's score distribution against a card FROZEN offline — bin "
    "edges AND expected bin counts read from the batch table before "
    "the stream starts (a monitor never re-fits its own reference; "
    "over a full AvailableNow drain the frozen card equals the batch "
    "card, so the oracle is exact). The streaming twin of "
    "dq_psi_drift and the drift arm next to stream_ece_monitor's "
    "calibration arm; same 0.5/5-smoothed milli-snapped PSI as the "
    "certified p_drift_reweight. Shape: streaming state is the "
    "(day x 10 bin) calendar-bounded dim behind a 1-day tumbling "
    "window + 2-day watermark; the per-day PSI rollup runs batch-side "
    "on the drained bin table against the broadcast frozen card",
)
def stream_psi_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_event_stream

    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    [card] = ev.select(cents.alias("c")).agg(
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).collect()
    lo, hi, n_ref = card["lo"], card["hi"], card["n"]
    bin_expr = (
        "least(CASE WHEN {span} = 0 THEN 5"
        " ELSE (CAST(round(value * 100, 0) AS BIGINT) - {lo}) * 10"
        " div {span} END, 9)"
    ).format(lo=lo, span=hi - lo)
    expected_rows = (
        ev.select(F.expr(bin_expr).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e"))
        .collect()
    )
    e_by_bin = {int(r["bin"]): int(r["e"]) for r in expected_rows}

    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    scored = stream.withWatermark("ts", "2 days").select(
        F.col("ts"), F.expr(bin_expr).cast("bigint").alias("bin")
    )
    b = scored.groupBy(
        F.window("ts", "1 day").alias("w"), "bin"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("a"))
    name = f"stream_psi_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            b.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    drained = spark.table(name).select(
        F.col("w.start").alias("day"), "bin", "a"
    )
    card_df = F.broadcast(
        spark.createDataFrame(
            [(b_, e_by_bin.get(b_, 0)) for b_ in range(10)],
            "bin bigint, e bigint",
        )
    )
    days = drained.select("day").distinct()
    grid = (
        days.crossJoin(card_df)
        .join(drained, ["day", "bin"], "left")
        .select(
            "day",
            "bin",
            F.coalesce("a", F.lit(0)).alias("a"),
            "e",
        )
    )
    from pyspark.sql.window import Window

    nday = Window.partitionBy("day")
    grid = grid.withColumn(
        "n_day", F.sum("a").over(nday).cast("bigint")
    )
    return grid.groupBy("day").agg(
        F.max("n_day").cast("bigint").alias("n"),
        F.round(
            F.sum(
                (
                    (F.col("a") + 0.5) / (F.col("n_day") + 5.0)
                    - (F.col("e") + 0.5) / (float(n_ref) + 5.0)
                )
                * F.log(
                    ((F.col("a") + 0.5) / (F.col("n_day") + 5.0))
                    / ((F.col("e") + 0.5) / (float(n_ref) + 5.0))
                )
            )
            * 1000,
            0,
        )
        .cast("bigint")
        .alias("psi_milli"),
    )


# ---------------------------------------------------------------------------
# Round-11 batch 5 (same module — the window is governed by _R11_NEW in
# plans/queries; modules at/after _OVERFLOW_BOUNDARY queue behind it).
# ---------------------------------------------------------------------------

# dedup_prefix_clusters ------------------------------------------------------


def _prefix_clusters_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
    keyed AS (
      SELECT doc_id, md5(array_to_string(t[1:8], ' ')) AS pfx
      FROM toks WHERE len(t) >= 8),
    sizes AS (
      SELECT pfx, CAST(count(*) AS BIGINT) AS size
      FROM keyed GROUP BY 1)
    SELECT CAST(size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(size * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY size
"""


@register(
    "dedup_prefix_clusters",
    _prefix_clusters_sql(),
    "template detection by shared opening: docs grouped by the md5 of "
    "their FIRST 8 tokens (boilerplate headers, form letters, scraped "
    "templates share openings long before they share full "
    "fingerprints), reported as a (cluster_size, n_clusters, n_docs) "
    "histogram with singletons included. dedup_lines removes repeated "
    "LINES anywhere, dedup_exact needs the WHOLE text equal; the "
    "prefix key catches the template family in ONE hash-agg with no "
    "banding at all — the cheapest first pass of the dedup ladder. "
    "Docs under 8 tokens have no prefix key and are excluded "
    "(documented; they cannot be templates). Shape: map-only key "
    "projection -> one key hash-agg -> one size histogram agg",
)
def dedup_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_expr("text").alias("t"))
    keyed = toks.filter(F.size("t") >= 8).select(
        F.md5(F.concat_ws(" ", F.slice(F.col("t"), 1, 8))).alias("pfx")
    )
    sizes = keyed.groupBy("pfx").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    ).select(
        F.col("size").cast("bigint").alias("cluster_size"),
        "n_clusters",
        (F.col("size") * F.col("n_clusters"))
        .cast("bigint")
        .alias("n_docs"),
    )


# dedup_edge_source_mix ------------------------------------------------------


def _edge_source_mix_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    lab AS (SELECT doc_id, source FROM documents),
    el AS (
      SELECT la.source AS src_u, lb.source AS src_v
      FROM edges e
      JOIN lab la ON la.doc_id = e.u
      JOIN lab lb ON lb.doc_id = e.v)
    SELECT src_u AS source,
           CAST(count(*) AS BIGINT) AS n_edges_directed,
           CAST(sum(CASE WHEN src_u = src_v THEN 1 ELSE 0 END)
             AS BIGINT) AS n_within,
           CAST(sum(CASE WHEN src_u = src_v THEN 0 ELSE 1 END)
             AS BIGINT) AS n_cross,
           CAST(sum(CASE WHEN src_u = src_v THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS within_milli
    FROM el GROUP BY 1
"""


@register(
    "dedup_edge_source_mix",
    _edge_source_mix_sql(),
    "near-dup edge provenance per source: of the keeper-graph edges "
    "touching each source, how many stay WITHIN it vs reach across "
    "(directed counts, so every source sees all its edges). "
    "dedup_source_overlap compares sources by SHINGLE sets (could "
    "they mirror each other); this counts the near-dup edges that "
    "actually formed — a source with high cross share duplicates "
    "OTHER feeds and is the drop candidate; graph_lang_assortativity "
    "is the one-number lang twin of this per-source source view. "
    "Shape: keeper edge list joined twice to the doc->source "
    "projection, one |sources| hash-agg",
)
def dedup_edge_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_edges

    docs = _t(spark, sf_dir, "documents")
    lab = docs.select("doc_id", "source")
    edges = keeper_edges(docs, "doc_id").localCheckpoint()
    el = (
        edges.join(
            lab.select(
                F.col("doc_id").alias("u"),
                F.col("source").alias("src_u"),
            ),
            "u",
        )
        .join(
            lab.select(
                F.col("doc_id").alias("v"),
                F.col("source").alias("src_v"),
            ),
            "v",
        )
        .select("src_u", "src_v")
    )
    return el.groupBy(F.col("src_u").alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges_directed"),
        F.sum(F.when(F.col("src_u") == F.col("src_v"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_within"),
        F.sum(F.when(F.col("src_u") == F.col("src_v"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_cross"),
        F.expr(
            "CAST(sum(CASE WHEN src_u = src_v THEN 1 ELSE 0 END)"
            " * 1000 div count(1) AS BIGINT)"
        ).alias("within_milli"),
    )


# text_oov_rate --------------------------------------------------------------


def _oov_rate_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH toks AS (
      SELECT doc_id, lang, doc_id % 2 = 0 AS is_train,
             unnest({tokens_sql('text')}) AS tok
      FROM documents),
    vocab AS MATERIALIZED (
      SELECT tok FROM (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE is_train GROUP BY 1
        ORDER BY c DESC, tok LIMIT 1000) t),
    vs AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM vocab),
    test AS (
      SELECT t.lang, t.tok, v.tok IS NOT NULL AS known
      FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
      WHERE NOT t.is_train)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN known THEN 0 ELSE 1 END) AS BIGINT)
             AS n_oov,
           CAST(sum(CASE WHEN known THEN 0 ELSE 1 END) * 1000
             // count(*) AS BIGINT) AS oov_milli,
           (SELECT vocab_size FROM vs) AS vocab_size
    FROM test GROUP BY lang
"""


@register(
    "text_oov_rate",
    _oov_rate_sql(),
    "out-of-vocabulary rate against a frozen top-1000 train vocab: "
    "tokens counted on the doc_id%2 train half, the top-1000 by "
    "(count DESC, token ASC — a total order, so the LIMIT boundary "
    "cannot flake), then the held-out half's token occurrences scored "
    "per lang: total, OOV count, milli OOV rate. text_vocab_growth "
    "measures how fast vocabulary GROWS; this measures how much a "
    "FIXED vocabulary misses — the tokenizer-coverage number that "
    "decides vocab size and flags langs a vocab underserves (high "
    "OOV = fertility blow-up downstream, text_token_fertility's "
    "cause). Shape: one explode, one train-vocab hash-agg + "
    "TakeOrdered(1000), one vocab-keyed left join, one |langs| rollup",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang",
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.explode(tokens_expr("text")).alias("tok"),
    ).localCheckpoint()
    vocab = (
        toks.filter(F.col("is_train"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.desc("c"), F.col("tok"))
        .limit(1000)
        .select(F.col("tok").alias("vtok"))
    )
    vs = vocab.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size")
    )
    test = (
        toks.filter(~F.col("is_train"))
        .join(F.broadcast(vocab), toks["tok"] == F.col("vtok"), "left")
    )
    return (
        test.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("vtok").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.expr(
                "CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END)"
                " * 1000 div count(1) AS BIGINT)"
            ).alias("oov_milli"),
        )
        .crossJoin(F.broadcast(vs))
        .select(
            "lang", "n_tokens", "n_oov", "oov_milli", "vocab_size"
        )
    )
