"""Round-13 batch 2: streaming image admission, the session-timeout
sweep, sketch-width economics, and the partition-layout advisor.

- ``stream_phash_dedup``: the image twin of ``stream_lsh_dedup`` —
  arriving images (the doc_id%40!=0 side of the image universe) are
  synthesized and dHashed by the SAME map-only Arrow kernels as the
  batch path on a file-source STREAM, band-probed against the static
  corpus index (doc_id%40==0) in a stream-static join, and the
  drained candidate pairs are Hamming-verified batch-side (<= 6):
  near-dup images are blocked BEFORE ingest.
- ``ts_session_timeout_sweep``: prices the sessionization timeout
  the way dedup_band_sweep prices LSH banding — for inactivity
  thresholds {60 s, 5 min, 30 min, 2 h}: session count, singleton
  sessions, events per session, and the largest session. One lag
  pass; the islands run per (arm, user) partition.
- ``agg_cms_width_curve``: Count-Min sketch error vs width — depth
  4, widths {256, 1024, 4096} over per-user event counts: exact keys
  recovered, mean and max overestimate. The sketch-sizing table
  (bytes vs error) agg_countmin_hh's single configuration cannot
  give.
- ``layout_partition_advisor``: for candidate lineitem partition
  columns (returnflag, linestatus, ship month, suppkey): partition
  count, max-partition rows, skew vs ideal, and undersized-partition
  count — the table that says WHICH column to PARTITION BY at write
  time (month: bounded count, low skew; suppkey: file explosion).

Scale notes (100 TB): the stream probe is a band-equality join
against a broadcastable (byte_idx, byte_val) index — no pair surface
beyond band hits, and verification touches only drained candidates;
the timeout sweep's windows partition by (arm, user) — the arm dim
multiplies the exchange by 4, never serializes it; CMS cells are
|keys| x depth x |widths| AFTER the per-key hash-agg (map-side
combinable — the sketch itself is the fixed-size summary); the
advisor is one stacked scan + per-candidate hash-aggs over bounded
partition-value dims.

Reference parity: north-star extensions (streaming ingest dedup,
ops tables for watermark/session/layout tuning); no reference
counterpart — `jigsaw` has no streaming or layout surface.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

_TIMEOUTS_S = (60, 300, 1800, 7200)
_CMS_WIDTHS = (256, 1024, 4096)
_CMS_DEPTH = 4

# ---------------------------------------------------------------------------
# stream_phash_dedup
# ---------------------------------------------------------------------------


def _stream_phash_sql() -> str:
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    return f"""
    WITH {_PHASH_BYTES_CTE.strip()},
    corp AS (SELECT i, byte_idx, byte_val FROM ph_bytes
             WHERE i % 40 = 0),
    strm AS (SELECT i, byte_idx, byte_val FROM ph_bytes
             WHERE i % 40 <> 0),
    cand AS MATERIALIZED (
      SELECT DISTINCT s.i AS sid, c.i AS cid
      FROM strm s JOIN corp c ON s.byte_idx = c.byte_idx
                             AND s.byte_val = c.byte_val),
    ham AS (
      SELECT p.sid, p.cid,
             CAST(sum(bit_count(xor(s.byte_val, c.byte_val)))
               AS BIGINT) AS hamming
      FROM cand p
      JOIN strm s ON s.i = p.sid
      JOIN corp c ON c.i = p.cid AND c.byte_idx = s.byte_idx
      GROUP BY 1, 2),
    per AS (
      SELECT i AS sid,
             max(CASE WHEN h.sid IS NOT NULL THEN 1 ELSE 0 END)
               AS has_cand,
             max(CASE WHEN h.hamming <= 6 THEN 1 ELSE 0 END)
               AS blocked
      FROM (SELECT DISTINCT i FROM strm) u
      LEFT JOIN ham h ON u.i = h.sid
      GROUP BY 1)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_streamed,
           CAST(sum(p.has_cand) AS BIGINT) AS n_candidates,
           CAST(sum(p.blocked) AS BIGINT) AS n_blocked,
           CAST(count(*) - sum(p.blocked) AS BIGINT) AS n_admitted
    FROM per p JOIN documents d ON p.sid = d.doc_id
    GROUP BY d.source
"""


@register(
    "stream_phash_dedup",
    _stream_phash_sql(),
    "streaming image near-dup ADMISSION — the image twin of "
    "stream_lsh_dedup: new images (the doc_id%40!=0 arrivals, which "
    "include the synthetic twins of the %40==0 corpus) stream in as "
    "documents, are synthesized + dHashed by the SAME map-only Arrow "
    "kernels as the batch path, and probe the historical corpus "
    "index (%40==0) with a stream-static (byte_idx, byte_val) band "
    "join; the drained per-pair band-hit counts are then Hamming-"
    "verified batch-side (<= 6, the production threshold) into a "
    "per-source admission ledger. Near-dup imagery is blocked "
    "BEFORE ingest with no stream-side state beyond one drain agg. "
    "Shape: band-equality probe (broadcastable index), candidate-"
    "only verification, no pair surface beyond band hits",
)
def stream_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.multimodal.binary_ops import phash_dhash
    from jigsaw_spark.plans.queries_r6 import (
        _phash_images,
        _synth_images,
    )
    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_document_stream

    docs = _t(spark, sf_dir, "documents")
    # checkpoint ONCE: corp (the stream-static index), both verify
    # projections and the streamed universe all reference this relation
    # — uncheckpointed, each re-ran the synth+dHash kernel (4 passes)
    all_ph = phash_dhash(_phash_images(spark, sf_dir)).select(
        F.col("image_id").cast("bigint").alias("i"),
        "byte_idx",
        "byte_val",
    ).localCheckpoint()
    corp = all_ph.filter(F.col("i") % 40 == 0).select(
        F.col("i").alias("cid"),
        F.col("byte_idx").alias("cbi"),
        F.col("byte_val").alias("cbv"),
    )
    # the arriving side: a real file-source stream through the same
    # synthesis + dHash kernels, band-probing the static index
    stream_ids = (
        read_document_stream(spark, sf_dir)
        .filter(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 40 != 0)
        )
        .select("doc_id")
    )
    sph = phash_dhash(_synth_images(stream_ids)).select(
        F.col("image_id").cast("bigint").alias("sid"),
        F.col("byte_idx").alias("sbi"),
        F.col("byte_val").alias("sbv"),
    )
    hits = (
        sph.join(
            corp,
            (F.col("sbi") == F.col("cbi"))
            & (F.col("sbv") == F.col("cbv")),
        )
        .groupBy("sid", "cid")
        .agg(F.count(F.lit(1)).alias("n_hit_bands"))
    )
    name = f"stream_phash_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            hits.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    cand = spark.table(name).select("sid", "cid").localCheckpoint()
    # batch-side exact verification of the drained candidates only
    # (fresh projections with distinct names — the self-join attribute
    # dedup trap)
    sbatch = all_ph.filter(F.col("i") % 40 != 0).select(
        F.col("i").alias("sid"),
        F.col("byte_idx").alias("vbi"),
        F.col("byte_val").alias("vbv"),
    )
    corpv = all_ph.filter(F.col("i") % 40 == 0).select(
        F.col("i").alias("vcid"),
        F.col("byte_idx").alias("vci"),
        F.col("byte_val").alias("vcv"),
    )
    ham = (
        cand.join(sbatch, "sid")
        .join(
            corpv,
            (F.col("cid") == F.col("vcid"))
            & (F.col("vbi") == F.col("vci")),
        )
        .groupBy("sid", "cid")
        .agg(
            F.sum(F.bit_count(F.col("vbv").bitwiseXOR(F.col("vcv"))))
            .cast("bigint")
            .alias("hamming")
        )
    )
    # the streamed-id universe IS the synth filter (one image per
    # doc_id % 10 == 0 row; phash_dhash never drops a row)
    per = (
        docs.filter(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 40 != 0)
        )
        .select(F.col("doc_id").alias("sid"))
        .join(
            ham.groupBy("sid").agg(
                F.lit(1).alias("has_cand"),
                F.max(
                    F.when(F.col("hamming") <= 6, 1).otherwise(0)
                ).alias("blocked"),
            ),
            "sid",
            "left",
        )
        .select(
            "sid",
            F.coalesce("has_cand", F.lit(0)).alias("has_cand"),
            F.coalesce("blocked", F.lit(0)).alias("blocked"),
        )
    )
    return (
        per.join(
            docs.select(F.col("doc_id").alias("sid"), "source"), "sid"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_streamed"),
            F.sum("has_cand").cast("bigint").alias("n_candidates"),
            F.sum("blocked").cast("bigint").alias("n_blocked"),
            (F.count(F.lit(1)) - F.sum("blocked"))
            .cast("bigint")
            .alias("n_admitted"),
        )
    )


# ---------------------------------------------------------------------------
# ts_session_timeout_sweep
# ---------------------------------------------------------------------------


def _timeout_sweep_sql() -> str:
    thr = ", ".join(str(t) for t in _TIMEOUTS_S)
    return f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
    g AS MATERIALIZED (
      SELECT user_id, us, event_id,
             us - lag(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS gap_us
      FROM e),
    arms AS (SELECT unnest([{thr}]) AS timeout_s),
    flagged AS (
      SELECT a.timeout_s, g.user_id, g.us, g.event_id,
             CASE WHEN g.gap_us IS NULL
                    OR g.gap_us > CAST(a.timeout_s AS BIGINT) * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM g CROSS JOIN arms a),
    ses AS (
      SELECT timeout_s, user_id,
             sum(new_s) OVER (PARTITION BY timeout_s, user_id
                              ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    per AS MATERIALIZED (
      SELECT timeout_s, user_id, sid,
             CAST(count(*) AS BIGINT) AS n_ev
      FROM ses GROUP BY 1, 2, 3)
    SELECT CAST(timeout_s AS INT) AS timeout_s,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons,
           CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS singleton_milli,
           CAST(sum(n_ev) * 1000 // count(*) AS BIGINT)
             AS events_per_session_milli,
           CAST(max(n_ev) AS BIGINT) AS max_session_events
    FROM per GROUP BY timeout_s
"""


@register(
    "ts_session_timeout_sweep",
    _timeout_sweep_sql(),
    "sessionization-timeout economics — prices the inactivity "
    "threshold the way dedup_band_sweep prices LSH banding: for "
    "timeouts {60 s, 5 min, 30 min, 2 h}, the session count, "
    "singleton-session count and share, mean events per session "
    "(milli), and the largest session. ts_sessionize commits to the "
    "30-min convention; this is the table you read BEFORE committing "
    "— where the session count stops collapsing is the corpus's "
    "natural idle timescale (and the stream_watermark_advisor's "
    "state-size knob priced end-to-end). Shape: ONE (user, time) "
    "window pass computing every arm's running session id at once, "
    "arm fan-out AFTER the window into a map-side-combinable "
    "hash-agg — the arm dim never multiplies the sort",
)
def ts_session_timeout_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    # ONE window pass for all four arms (r14, guide §2.4): per-arm
    # session ids are running counts of that arm's session-start flags
    # over the SAME (user, time) order, so four running sums over one
    # sorted pass replace the 4x-row crossJoin + 4x-data window sort;
    # the 4x fan-out happens AFTER the window, into a hash-agg whose
    # map side compresses it
    wlag = Window.partitionBy("user_id").orderBy("us", "event_id")
    wrun = wlag.rowsBetween(Window.unboundedPreceding, 0)
    g = e.withColumn(
        "gap_us", F.col("us") - F.lag("us").over(wlag)
    )
    sids = g.select(
        "user_id",
        *[
            F.sum(
                F.when(
                    F.col("gap_us").isNull()
                    | (F.col("gap_us") > t * 1_000_000),
                    1,
                ).otherwise(0)
            )
            .over(wrun)
            .alias(f"_sid{t}")
            for t in _TIMEOUTS_S
        ],
    )
    per = (
        sids.select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).cast("int").alias("timeout_s"),
                            F.col(f"_sid{t}").alias("sid"),
                        )
                        for t in _TIMEOUTS_S
                    ]
                )
            ).alias("a"),
        )
        .select("a.timeout_s", "user_id", "a.sid")
        .groupBy("timeout_s", "user_id", "sid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ev"))
    )
    return per.groupBy("timeout_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_singletons"),
        F.expr(
            "CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000"
            " div count(*) AS BIGINT)"
        ).alias("singleton_milli"),
        F.expr(
            "CAST(sum(n_ev) * 1000 div count(*) AS BIGINT)"
        ).alias("events_per_session_milli"),
        F.max("n_ev").cast("bigint").alias("max_session_events"),
    ).select(
        F.col("timeout_s").cast("int").alias("timeout_s"),
        "n_sessions",
        "n_singletons",
        "singleton_milli",
        "events_per_session_milli",
        "max_session_events",
    )


# ---------------------------------------------------------------------------
# agg_cms_width_curve
# ---------------------------------------------------------------------------


def _cms_width_sql() -> str:
    widths = ", ".join(str(w) for w in _CMS_WIDTHS)
    return f"""
    WITH truec AS MATERIALIZED (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1),
    dims AS (
      SELECT w, j FROM (SELECT unnest([{widths}]) AS w) ws
      CROSS JOIN (SELECT unnest(range({_CMS_DEPTH})) AS j) js),
    keyed AS (
      SELECT d.w, d.j, t.user_id, t.cnt,
             CAST(CAST(('0x' || substr(md5(CAST(d.j AS VARCHAR) || '|'
               || CAST(t.user_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               % CAST(d.w AS UBIGINT) AS BIGINT) AS cell
      FROM truec t CROSS JOIN dims d),
    cells AS MATERIALIZED (
      SELECT w, j, cell, CAST(sum(cnt) AS BIGINT) AS cell_sum
      FROM keyed GROUP BY 1, 2, 3),
    est AS (
      SELECT k.w, k.user_id, k.cnt,
             CAST(min(c.cell_sum) AS BIGINT) AS est
      FROM keyed k
      JOIN cells c ON k.w = c.w AND k.j = c.j AND k.cell = c.cell
      GROUP BY 1, 2, 3)
    SELECT CAST(w AS INT) AS width,
           CAST({_CMS_DEPTH} * w AS BIGINT) AS n_cells,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN est = cnt THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(est - cnt) * 1000 // count(*) AS BIGINT)
             AS mean_over_milli,
           CAST(max(est - cnt) AS BIGINT) AS max_over
    FROM est GROUP BY w
"""


@register(
    "agg_cms_width_curve",
    _cms_width_sql(),
    "Count-Min sketch sizing curve — error vs width: depth 4 at "
    "widths {256, 1024, 4096} over per-user event counts, reporting "
    "keys recovered exactly, mean overestimate (milli), and the "
    "worst overestimate per configuration. agg_countmin_hh ships ONE "
    "configuration; this is the table that buys it — where the "
    "curve flattens is the width where extra cells stop paying (the "
    "epsilon = e/w overestimate bound made empirical). Shape: the "
    "per-key hash-agg FIRST (map-side combinable — the sketch is the "
    "fixed summary), then |keys| x depth x |widths| bounded explode "
    "for cells and estimates; no per-event fan-out",
)
def agg_cms_width_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    truec = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    dims = F.broadcast(
        spark.createDataFrame(
            [(w, j) for w in _CMS_WIDTHS for j in range(_CMS_DEPTH)],
            "w int, j int",
        )
    )
    keyed = truec.crossJoin(dims).select(
        "w",
        "j",
        "user_id",
        "cnt",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("j").cast("string"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint"),
            F.col("w").cast("bigint"),
        ).alias("cell"),
    )
    cells = keyed.groupBy("w", "j", "cell").agg(
        F.sum("cnt").cast("bigint").alias("cell_sum")
    )
    est = (
        keyed.join(cells, ["w", "j", "cell"])
        .groupBy("w", "user_id", "cnt")
        .agg(F.min("cell_sum").cast("bigint").alias("est"))
    )
    return est.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("est") == F.col("cnt"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.expr(
            "CAST(sum(est - cnt) * 1000 div count(*) AS BIGINT)"
        ).alias("mean_over_milli"),
        F.max(F.col("est") - F.col("cnt"))
        .cast("bigint")
        .alias("max_over"),
    ).select(
        F.col("w").cast("int").alias("width"),
        (F.lit(_CMS_DEPTH) * F.col("w")).cast("bigint").alias("n_cells"),
        "n_keys",
        "n_exact",
        "mean_over_milli",
        "max_over",
    )


# ---------------------------------------------------------------------------
# layout_partition_advisor
# ---------------------------------------------------------------------------

_ADVISOR_CANDS = (
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    (
        "ship_month",
        "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS STRING)",
    ),
    ("l_suppkey", "CAST(l_suppkey AS STRING)"),
)


def _partition_advisor_sql() -> str:
    sels = " UNION ALL ".join(
        f"SELECT '{name}' AS candidate, {expr} AS pval FROM lineitem"
        for name, expr in _ADVISOR_CANDS
    )
    return f"""
    WITH stacked AS ({sels}),
    parts AS MATERIALIZED (
      SELECT candidate, pval, CAST(count(*) AS BIGINT) AS n_rows
      FROM stacked GROUP BY 1, 2),
    tot AS MATERIALIZED (
      SELECT candidate,
             CAST(count(*) AS BIGINT) AS n_partitions,
             CAST(sum(n_rows) AS BIGINT) AS total_rows,
             CAST(max(n_rows) AS BIGINT) AS max_part_rows
      FROM parts GROUP BY 1)
    SELECT t.candidate,
           t.n_partitions,
           t.total_rows AS n_rows,
           t.max_part_rows,
           CAST(t.max_part_rows * t.n_partitions * 1000
             // t.total_rows AS BIGINT) AS skew_milli,
           CAST(sum(CASE WHEN p.n_rows * t.n_partitions * 2
             < t.total_rows THEN 1 ELSE 0 END) AS BIGINT)
             AS small_parts
    FROM parts p JOIN tot t ON p.candidate = t.candidate
    GROUP BY t.candidate, t.n_partitions, t.total_rows,
             t.max_part_rows
"""


@register(
    "layout_partition_advisor",
    _partition_advisor_sql(),
    "write-time PARTITION BY advisor: for candidate lineitem "
    "partition columns (returnflag, linestatus, ship month, suppkey) "
    "— partition count, max-partition rows, skew vs the ideal even "
    "split (milli; 1000 = perfectly balanced), and undersized "
    "partitions (< half the mean — the small-file problem). Reads as "
    "a decision table: 2-3 partitions under-parallelize, suppkey "
    "explodes the file count, ship month is the bounded low-skew "
    "middle — the layout_compaction_bins question asked BEFORE the "
    "write instead of after. Shape: one stacked scan (4 candidate "
    "projections of the same rows), per-candidate hash-aggs over "
    "bounded partition-value dims; window-free",
)
def layout_partition_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pairs = ", ".join(
        f"'{name}', {expr}" for name, expr in _ADVISOR_CANDS
    )
    stacked = li.select(
        F.expr(
            f"stack({len(_ADVISOR_CANDS)}, {pairs})"
        ).alias("candidate", "pval")
    )
    parts = stacked.groupBy("candidate", "pval").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).localCheckpoint()
    tot = parts.groupBy("candidate").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.sum("n_rows").cast("bigint").alias("total_rows"),
        F.max("n_rows").cast("bigint").alias("max_part_rows"),
    )
    return (
        parts.join(F.broadcast(tot), "candidate")
        .groupBy(
            "candidate", "n_partitions", "total_rows", "max_part_rows"
        )
        .agg(
            F.sum(
                F.when(
                    F.col("n_rows") * F.col("n_partitions") * 2
                    < F.col("total_rows"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("small_parts")
        )
        .select(
            "candidate",
            "n_partitions",
            F.col("total_rows").alias("n_rows"),
            "max_part_rows",
            F.expr(
                "CAST(max_part_rows * n_partitions * 1000"
                " div total_rows AS BIGINT)"
            ).alias("skew_milli"),
            "small_parts",
        )
    )
