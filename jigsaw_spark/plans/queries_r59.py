"""Round-10 batch 4: dup-rate trend, repeat-revenue split, embedding
isotropy, and the streaming calibration monitor.

- ``dq_dup_rate_trend``: exact-duplicate rate by doc_id-range decile
  (the ``text_vocab_growth`` value cut — two broadcast bounds and a
  map-side expression, never a global rank): is the later crawl
  dirtier? A rising dup share across ingestion time is the earliest
  signal that a source started recycling content — read NEXT TO
  vocab growth (a flattening type curve + a rising dup rate = the
  same disease measured two ways).
- ``rel_repeat_revenue``: monthly revenue split into FIRST-month
  (acquisition) vs returning (retention) customers, with customer
  counts and the repeat-revenue share — rel_growth_accounting
  decomposes USERS, this decomposes MONEY (a flat revenue line can
  hide acquisition collapsing while repeat revenue compensates, and
  only the split shows it).
- ``ml_embedding_isotropy``: corpus-level embedding-space isotropy —
  the mean pairwise cosine of the UNIT vectors computed WITHOUT any
  pair enumeration via the sum-vector identity: sum over pairs of
  u_i.u_j = (|S|^2 - sum |u_i|^2)/2 where S = sum of unit vectors.
  Anisotropic (high mean cosine) embedding spaces break cosine
  retrieval and dedup thresholds — this is the one-row health gate
  read before trusting any ANN/semantic-dedup threshold, next to
  dq_embedding_norms' per-vector stats.
- ``stream_ece_monitor``: streaming calibration monitor — per
  event-time DAY, the Expected Calibration Error of the stream's
  traffic against a calibration card FROZEN offline (score bounds
  from the batch table — the production constraint: a monitor never
  re-fits its own bins). The streaming twin of ml_reliability_ece
  and the monitoring arm of ml_calibration_drift: drift measures
  decay between two halves offline, the monitor watches it happen
  day by day.

Scale notes (100 TB): the dup trend is one fingerprint hash-agg +
a min-per-group join and a 10-row decile dim; repeat revenue shuffles
orders once on customer (first-month agg) and once on month (bounded
calendar dim); isotropy is one posexplode -> 64-row per-dim exact
decimal hash-agg (components are snapped to 9 decimals BEFORE the sum,
so every aggregate is order/partitioning-independent decimal
arithmetic — no float sum ever crosses a partition boundary); the
streaming monitor's state is (day x 10 bins) — calendar-bounded, and
the frozen bounds are two literals in the streaming expression, not a
stream-side aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# dq_dup_rate_trend
# ---------------------------------------------------------------------------


def _dup_trend_sql() -> str:
    from jigsaw_spark.operators.text import fingerprint_sql, tokens_sql

    return f"""
    WITH fpt AS (
      SELECT doc_id, {fingerprint_sql(tokens_sql('text'))} AS fp
      FROM documents),
    bounds AS MATERIALIZED (
      SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
    marked AS (
      SELECT doc_id,
             doc_id > min(doc_id) OVER (PARTITION BY fp) AS is_dup,
             least((doc_id - (SELECT lo FROM bounds)) * 10
               // ((SELECT hi - lo FROM bounds) + 1), 9) AS decile
      FROM fpt),
    d AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dups
      FROM marked GROUP BY 1),
    dim AS (SELECT unnest(range(10)) AS decile)
    SELECT CAST(dim.decile AS INT) AS decile,
           CAST(coalesce(d.n_docs, 0) AS BIGINT) AS n_docs,
           CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
           CAST(CASE WHEN coalesce(d.n_docs, 0) = 0 THEN 0
             ELSE d.n_dups * 1000 // d.n_docs END AS BIGINT) AS dup_milli
    FROM dim LEFT JOIN d ON dim.decile = d.decile
"""


@register(
    "dq_dup_rate_trend",
    _dup_trend_sql(),
    "exact-duplicate rate by doc_id-range decile: a doc is a dup when "
    "an earlier doc_id shares its exact_dedup fingerprint; deciles "
    "cut the doc_id VALUE range (the text_vocab_growth convention — "
    "two broadcast bounds, a map-side expression, NO global rank) — "
    "the is-the-crawl-getting-dirtier trend: a rising dup share "
    "across ingestion time is the earliest recycled-content signal, "
    "and read next to text_vocab_growth's flattening type curve it "
    "separates template pollution from vocabulary exhaustion. Empty "
    "deciles report 0 by convention. Shape: one fingerprint hash-agg "
    "with a min-per-fp window (the exact_dedup shuffle), a 1-row "
    "bounds broadcast, then a 10-row decile dim rollup",
)
def dq_dup_rate_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jigsaw_spark.operators.text import fingerprint_expr, tokens_expr

    docs = _t(spark, sf_dir, "documents")
    fpt = docs.select(
        "doc_id", fingerprint_expr(tokens_expr("text")).alias("fp")
    )
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    w = Window.partitionBy("fp")
    marked = (
        fpt.withColumn("is_dup", F.col("doc_id") > F.min("doc_id").over(w))
        .crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                "least((doc_id - lo) * 10 div (hi - lo + 1), 9)"
            ).alias("decile"),
            "is_dup",
        )
    )
    d = marked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dups"),
    )
    dim = spark.range(10).select(F.col("id").cast("bigint").alias("decile"))
    return (
        F.broadcast(dim)
        .join(d, "decile", "left")
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
            F.expr(
                "CAST(CASE WHEN coalesce(n_docs, 0) = 0 THEN 0"
                " ELSE n_dups * 1000 div n_docs END AS BIGINT)"
            ).alias("dup_milli"),
        )
    )


# ---------------------------------------------------------------------------
# rel_repeat_revenue
# ---------------------------------------------------------------------------

_REPEAT_REV_SQL = """
    WITH o AS (
      SELECT o_custkey,
             CAST(extract(year FROM o_orderdate) * 12
               + extract(month FROM o_orderdate) - 1 AS BIGINT) AS m,
             CAST(round(CAST(o_totalprice AS DECIMAL(12,2)) * 100, 0)
               AS BIGINT) AS cents
      FROM orders),
    first_m AS (
      SELECT o_custkey, min(m) AS fm FROM o GROUP BY 1),
    tagged AS (
      SELECT o.m, o.cents, o.o_custkey, o.m = f.fm AS is_new
      FROM o JOIN first_m f ON o.o_custkey = f.o_custkey)
    SELECT CAST(m AS BIGINT) AS month_idx,
           CAST(sum(CASE WHEN is_new THEN cents ELSE 0 END) AS BIGINT)
             AS new_rev_cents,
           CAST(sum(CASE WHEN is_new THEN 0 ELSE cents END) AS BIGINT)
             AS repeat_rev_cents,
           CAST(count(DISTINCT CASE WHEN is_new THEN o_custkey END)
             AS BIGINT) AS n_new_customers,
           CAST(count(DISTINCT CASE WHEN NOT is_new THEN o_custkey END)
             AS BIGINT) AS n_repeat_customers,
           CAST(sum(CASE WHEN is_new THEN 0 ELSE cents END) * 1000
             // sum(cents) AS BIGINT) AS repeat_share_milli
    FROM tagged GROUP BY 1
"""


@register(
    "rel_repeat_revenue",
    _REPEAT_REV_SQL,
    "monthly revenue split by customer age: FIRST-month (acquisition) "
    "vs returning (retention) revenue, with distinct new/repeat "
    "customer counts and the repeat-revenue share in milli — "
    "rel_growth_accounting decomposes USERS, this decomposes MONEY "
    "(a flat revenue line can hide acquisition collapsing while "
    "repeat spend compensates; the split is the chart a board "
    "actually reads). EXACT: order totals as integer cents (2-decimal "
    "source, exact by construction), one floor division for the "
    "share; months are calendar (year*12+month) so both engines cut "
    "identically with no epoch arithmetic. Shape: one customer-keyed "
    "hash-agg for first months, one fact join on the customer key, "
    "then a calendar-bounded month rollup (distinct counts ride the "
    "month shuffle)",
)
def rel_repeat_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        F.expr(
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1"
            " AS BIGINT)"
        ).alias("m"),
        F.round(F.col("o_totalprice").cast("decimal(12,2)") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    first_m = o.groupBy("o_custkey").agg(F.min("m").alias("fm"))
    tagged = o.join(first_m, "o_custkey").select(
        "m", "cents", "o_custkey", (F.col("m") == F.col("fm")).alias("is_new")
    )
    return tagged.groupBy(F.col("m").cast("bigint").alias("month_idx")).agg(
        F.sum(F.when(F.col("is_new"), F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("new_rev_cents"),
        F.sum(F.when(F.col("is_new"), 0).otherwise(F.col("cents")))
        .cast("bigint")
        .alias("repeat_rev_cents"),
        F.countDistinct(
            F.when(F.col("is_new"), F.col("o_custkey"))
        )
        .cast("bigint")
        .alias("n_new_customers"),
        F.countDistinct(
            F.when(~F.col("is_new"), F.col("o_custkey"))
        )
        .cast("bigint")
        .alias("n_repeat_customers"),
        F.expr(
            "CAST(sum(CASE WHEN is_new THEN 0 ELSE cents END) * 1000"
            " div sum(cents) AS BIGINT)"
        ).alias("repeat_share_milli"),
    )


# ---------------------------------------------------------------------------
# ml_embedding_isotropy
# ---------------------------------------------------------------------------

_ISO_SQL = """
    WITH norms AS (
      SELECT vec_id,
             sqrt(list_aggregate(
               list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))
               AS nrm
      FROM embeddings),
    idx AS (
      SELECT vec_id,
             CAST(unnest(range(1, len(embedding) + 1)) AS INT) AS i
      FROM embeddings),
    comp AS (
      SELECT ix.vec_id, ix.i,
             CAST(round(e.embedding[ix.i]::DOUBLE / n.nrm, 9)
               AS DECIMAL(12,9)) AS u
      FROM idx ix
      JOIN embeddings e ON ix.vec_id = e.vec_id
      JOIN norms n ON ix.vec_id = n.vec_id),
    dims AS (
      SELECT i, CAST(sum(u) AS DECIMAL(28,9)) AS s
      FROM comp GROUP BY 1),
    usq AS MATERIALIZED (
      SELECT CAST(sum(CAST(u AS DECIMAL(14,9)) * u) AS DECIMAL(38,18))
               AS t,
             CAST(count(DISTINCT vec_id) AS BIGINT) AS n
      FROM comp),
    ssq AS MATERIALIZED (
      SELECT CAST(sum(CAST(s AS DECIMAL(19,9)) * s) AS DECIMAL(38,18))
               AS s2,
             CAST(count(*) AS BIGINT) AS dim
      FROM dims)
    SELECT (SELECT n FROM usq) AS n_vectors,
           CAST((SELECT dim FROM ssq) AS INT) AS dim,
           round(CAST((SELECT s2 FROM ssq) AS DOUBLE), 4) AS sumvec_norm2,
           round((CAST((SELECT s2 FROM ssq) AS DOUBLE)
                  - CAST((SELECT t FROM usq) AS DOUBLE))
                 / (CAST((SELECT n FROM usq) AS DOUBLE)
                    * ((SELECT n FROM usq) - 1)), 6) AS avg_pair_cos
"""


@register(
    "ml_embedding_isotropy",
    _ISO_SQL,
    "embedding-space isotropy: mean pairwise cosine of the UNIT "
    "vectors over the whole corpus, computed with ZERO pair "
    "enumeration via the sum-vector identity — sum over i<j of "
    "u_i.u_j = (|S|^2 - sum|u_i|^2)/2 with S the component-wise sum, "
    "so the mean is (|S|^2 - t)/(n(n-1)) in two aggregates. "
    "Anisotropic spaces (mean cosine far from 0) compress cosine "
    "contrast and silently break every ANN / semantic-dedup threshold "
    "downstream — this is the one-row health gate read before "
    "trusting them, next to dq_embedding_norms' per-vector stats. "
    "EXACT: unit components are snapped to 9 decimals BEFORE any sum "
    "and every aggregate is decimal arithmetic (order/partitioning-"
    "independent; the only doubles are the final reported divisions, "
    "identical operands both engines). Shape: one norm pass (a "
    "single-row HOF, not a per-pair one), one posexplode into a "
    "64-row per-dim decimal hash-agg, two 1-row rollups",
)
def ml_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.vectors import l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    norms = emb.select(
        "vec_id",
        "embedding",
        l2_norm(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "nrm"
        ),
    )
    comp = norms.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("i", "x"),
        "nrm",
    ).select(
        "vec_id",
        "i",
        F.round(F.col("x").cast("double") / F.col("nrm"), 9)
        .cast("decimal(12,9)")
        .alias("u"),
    )
    dims = comp.groupBy("i").agg(
        F.sum("u").cast("decimal(28,9)").alias("s")
    )
    usq = comp.agg(
        F.sum(F.col("u").cast("decimal(14,9)") * F.col("u"))
        .cast("decimal(38,18)")
        .alias("t"),
        F.countDistinct("vec_id").cast("bigint").alias("n"),
    )
    ssq = dims.agg(
        F.sum(F.col("s").cast("decimal(19,9)") * F.col("s"))
        .cast("decimal(38,18)")
        .alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("dim"),
    )
    return (
        usq.crossJoin(F.broadcast(ssq))
        .select(
            F.col("n").alias("n_vectors"),
            F.col("dim").cast("int").alias("dim"),
            F.round(F.col("s2").cast("double"), 4).alias("sumvec_norm2"),
            F.round(
                (F.col("s2").cast("double") - F.col("t").cast("double"))
                / (
                    F.col("n").cast("double")
                    * (F.col("n") - 1).cast("double")
                ),
                6,
            ).alias("avg_pair_cos"),
        )
    )


# ---------------------------------------------------------------------------
# stream_ece_monitor
# ---------------------------------------------------------------------------

_ECE_MON_SQL = """
    WITH s AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    t AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi FROM s),
    p AS (
      SELECT day, y,
             CASE WHEN (SELECT hi - lo FROM t) = 0 THEN 500000
                  ELSE (cents - (SELECT lo FROM t)) * 1000000
                       // (SELECT hi - lo FROM t) END AS p_micro
      FROM s),
    b AS (
      SELECT day, least(p_micro // 100000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p_micro) AS BIGINT) AS sp,
             CAST(sum(y) AS BIGINT) AS pos
      FROM p GROUP BY 1, 2)
    SELECT day,
           CAST(sum(n) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS pos,
           CAST(sum(abs(sp - 1000000 * pos)) // sum(n) AS BIGINT)
             AS ece_micro
    FROM b GROUP BY 1
"""


@register(
    "stream_ece_monitor",
    _ECE_MON_SQL,
    "streaming calibration monitor: per event-time DAY, the Expected "
    "Calibration Error of the day's traffic against a calibration "
    "card FROZEN offline (score bounds read from the batch table "
    "before the stream starts — the production constraint: a monitor "
    "never re-fits its own bins; over a full AvailableNow drain the "
    "frozen bounds equal the batch bounds, so the oracle is exact). "
    "The monitoring arm of ml_calibration_drift: drift prices decay "
    "between two offline halves, the monitor watches it happen day by "
    "day — the alert wire for 'the probabilities stopped meaning "
    "anything'. Shape: streaming state is the (day x 10 bin) "
    "calendar-bounded dim behind a 1-day tumbling window + 2-day "
    "watermark; the per-day ECE rollup runs batch-side on the drained "
    "bin table (the per-bin terms share the 1e6*n denominator — pure "
    "integer)",
)
def stream_ece_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_event_stream

    ev = _t(spark, sf_dir, "events")
    [card] = (
        ev.select(F.round(F.col("value") * 100, 0).cast("bigint").alias("c"))
        .agg(F.min("c").alias("lo"), F.max("c").alias("hi"))
        .collect()
    )
    lo, hi = card["lo"], card["hi"]

    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    p_micro = (
        F.lit(500000)
        if hi == lo
        else F.expr(
            f"CAST((CAST(round(value * 100, 0) AS BIGINT) - {lo})"
            f" * 1000000 div {hi - lo} AS BIGINT)"
        )
    )
    scored = stream.withWatermark("ts", "2 days").select(
        F.col("ts"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        p_micro.alias("p_micro"),
    )
    b = scored.groupBy(
        F.window("ts", "1 day").alias("w"),
        F.expr("least(p_micro div 100000, 9)")
        .cast("bigint")
        .alias("bin"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_micro").alias("sp"),
        F.sum("y").alias("pos"),
    )
    name = f"stream_ece_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            b.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    drained = spark.table(name)
    return drained.groupBy(F.col("w.start").alias("day")).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("pos"),
        F.expr(
            "CAST(sum(abs(sp - 1000000 * pos)) div sum(n) AS BIGINT)"
        ).alias("ece_micro"),
    )
