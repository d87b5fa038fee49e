"""Round-9 batch 10: rich-club structure, control-chart rules, and
term burstiness.

- ``graph_rich_club``: rich-club coefficient phi(k) of the near-dup
  keeper graph at k = 1, 2, 3 — among nodes of degree > k, what share
  of their possible pairs are actually connected? The structural
  question behind hub treatment in dedup: a HIGH phi says heavy
  near-dup nodes form a dense core (template families referencing each
  other — cluster-level dedup wins); a LOW phi says hubs are centers
  of disjoint stars (hub removal wins). EXACT: over the symmetric
  edge list phi = E_directed(k) / (N_k * (N_k - 1)) is a ratio of
  integers.
- ``ts_control_rules``: Western Electric control-chart screen over the
  per-type daily series — rule 1 (a point beyond 3 sigma) and the
  run rule (8+ consecutive observations on the same side of the
  mean), the process-shift alarms SPC has used since the 1950s and
  the complement of the registry's outlier family (ts_anomaly_iqr /
  ts_hampel_outliers flag single points; the run rule catches drifts
  too small for any single-point test). EXACT: (x_t - m)^2 > 9
  sigma^2 is multiplied through by n^2 — (n*x_t - S)^2 > 9*(n*Sxx -
  S^2) — so mean and sigma never exist as floats; runs are
  gaps-islands over the day-ordered sign sequence.
- ``text_burstiness``: per-language burstiest terms by
  variance-to-mean ratio of per-document counts (Church-Gale
  burstiness) — function words spread evenly (VMR near 1), topical
  terms concentrate in few documents (VMR >> 1). The signal that
  separates keyword candidates from stopwords WITHOUT a stopword
  list, feeding the rake/tfidf family. EXACT: n^2-scaled variance
  over mean collapses to (n*S2 - C^2) * 1000 div (n*C) — zeros
  contribute nothing to S2, so only posting rows are ever touched.

Scale notes (100 TB): rich-club reuses the localCheckpoint'ed keeper
edge list (degree agg + one degree join, then a broadcast x3 k-dim
explode over edge rows); control rules pre-aggregate to day grain
FIRST (the MASE discipline) — every window partitions by event_type
over the calendar-bounded day dim; burstiness is one explode ->
(lang, tok, doc) hash-agg -> (lang, tok) posting rollup — the top-5
window runs over the vocabulary-bounded term dim, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# graph_rich_club
# ---------------------------------------------------------------------------


def _rich_club_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
    ks AS (SELECT unnest([1, 2, 3]) AS k),
    nk AS (
      -- count(deg.u), not count(*): an empty rich club must be 0, and
      -- the left join's null row would count as 1
      SELECT k.k, CAST(count(deg.u) AS BIGINT) AS n_k
      FROM ks k LEFT JOIN deg ON deg.d > k.k GROUP BY 1),
    ek AS (
      SELECT k.k, CAST(count(*) AS BIGINT) AS e_k
      FROM edges e
      JOIN deg du ON e.u = du.u
      JOIN deg dv ON e.v = dv.u
      CROSS JOIN ks k
      WHERE du.d > k.k AND dv.d > k.k
      GROUP BY 1)
    SELECT CAST(nk.k AS INT) AS k,
           CAST(nk.n_k AS BIGINT) AS n_nodes,
           CAST(coalesce(ek.e_k, 0) AS BIGINT) AS n_edges_directed,
           CAST(CASE WHEN nk.n_k <= 1 THEN 0
                ELSE coalesce(ek.e_k, 0) * 1000
                     // (nk.n_k * (nk.n_k - 1)) END AS BIGINT)
             AS phi_milli
    FROM nk LEFT JOIN ek ON nk.k = ek.k
"""


@register(
    "graph_rich_club",
    _rich_club_sql(),
    "rich-club coefficient phi(k) of the near-dup keeper graph at "
    "k = 1, 2, 3: among the N_k nodes of degree > k, the share of "
    "their N_k*(N_k-1) ordered pairs actually connected — a dense "
    "core of heavy near-dup nodes (high phi: template families "
    "referencing each other, cluster-level dedup wins) vs hubs as "
    "centers of disjoint stars (low phi: hub removal wins); the "
    "structural refinement of graph_degree_assortativity's one-number "
    "mixing summary. EXACT: over the symmetric edge list phi = "
    "E_directed(k) / (N_k*(N_k-1)) is a ratio of integers (k levels "
    "with N_k <= 1 report 0; an empty rich club still emits its row "
    "via the k-dim left join). Shape: the keeper edge list is derived "
    "once and localCheckpoint'ed, one degree agg, one two-sided "
    "degree join, then a broadcast x3 k-dim explode and a 3-row "
    "rollup",
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_edges

    docs = _t(spark, sf_dir, "documents")
    edges = keeper_edges(docs, "doc_id")
    deg = edges.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    ks = F.broadcast(
        spark.createDataFrame([(1,), (2,), (3,)], "k int")
    )
    nk = (
        ks.join(deg, deg["d"] > ks["k"], "left")
        .groupBy("k")
        .agg(F.count("u").cast("bigint").alias("n_k"))
    )
    du = deg.select(F.col("u").alias("ju"), F.col("d").alias("dx"))
    dv = deg.select(F.col("u").alias("jv"), F.col("d").alias("dy"))
    ek = (
        edges.join(du, edges["u"] == du["ju"])
        .join(dv, edges["v"] == dv["jv"])
        .crossJoin(ks)
        .filter((F.col("dx") > F.col("k")) & (F.col("dy") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_k"))
    )
    return (
        nk.join(ek, "k", "left")
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("n_k").cast("bigint").alias("n_nodes"),
            F.coalesce(F.col("e_k"), F.lit(0))
            .cast("bigint")
            .alias("n_edges_directed"),
            F.expr(
                "CAST(CASE WHEN n_k <= 1 THEN 0"
                " ELSE coalesce(e_k, 0) * 1000"
                " div (n_k * (n_k - 1)) END AS BIGINT)"
            ).alias("phi_milli"),
        )
    )


# ---------------------------------------------------------------------------
# ts_control_rules
# ---------------------------------------------------------------------------

_CONTROL_SQL = """
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    tot AS MATERIALIZED (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sxx
      FROM daily GROUP BY 1),
    u AS (
      SELECT d.event_type, d.day,
             CAST(t.n * d.cents - t.s AS HUGEINT) AS u,
             t.n, t.s, t.sxx,
             row_number() OVER (PARTITION BY d.event_type
                                ORDER BY d.day) AS rn
      FROM daily d JOIN tot t ON d.event_type = t.event_type),
    flags AS (
      SELECT event_type, day, rn,
             CASE WHEN u * u > 9 * (n * sxx - CAST(s AS HUGEINT) * s)
                  THEN 1 ELSE 0 END AS rule1,
             CASE WHEN u > 0 THEN 1 WHEN u < 0 THEN -1 ELSE 0 END AS side
      FROM u),
    islands AS (
      SELECT event_type, side,
             rn - row_number() OVER (PARTITION BY event_type, side
                                     ORDER BY rn) AS grp
      FROM flags WHERE side <> 0),
    runs AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS run_len
      FROM islands GROUP BY event_type, side, grp),
    rstats AS (
      SELECT event_type,
             CAST(max(run_len) AS BIGINT) AS longest_run,
             CAST(sum(CASE WHEN run_len >= 8 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_runs_ge8
      FROM runs GROUP BY 1),
    base AS (
      SELECT event_type,
             CAST(max(rn) AS BIGINT) AS n_days,
             CAST(sum(rule1) AS BIGINT) AS n_beyond_3sigma
      FROM flags GROUP BY 1)
    SELECT base.event_type, base.n_days, base.n_beyond_3sigma,
           CAST(coalesce(rstats.longest_run, 0) AS BIGINT) AS longest_run,
           CAST(coalesce(rstats.n_runs_ge8, 0) AS BIGINT) AS n_runs_ge8
    FROM base LEFT JOIN rstats ON base.event_type = rstats.event_type
"""


@register(
    "ts_control_rules",
    _CONTROL_SQL,
    "Western Electric control-chart screen over the per-type daily "
    "series: rule 1 — observations beyond 3 sigma of the series mean "
    "— plus the run rule — maximal runs of 8+ consecutive "
    "observations strictly on one side of the mean (longest run and "
    "how many alarm-length runs) — the process-shift alarms SPC has "
    "used since the 1950s; the registry's outlier family "
    "(ts_anomaly_iqr, ts_hampel_outliers) flags single points, while "
    "the run rule catches sustained drifts too small for any "
    "single-point test. EXACT: (x_t - m)^2 > 9 sigma^2 is multiplied "
    "through by n^2 into (n*x_t - S)^2 > 9*(n*Sxx - S^2) — mean and "
    "sigma never exist as floats; sides are exact signs of n*x_t - S "
    "(on-mean days break runs); runs are the gaps-islands row_number "
    "difference over the day-ordered sign sequence. Shape: day-grain "
    "pre-agg FIRST, per-type totals broadcast back, every window "
    "partitions by event_type over the calendar-bounded day dim",
)
def ts_control_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    dec = "decimal(38,0)"
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents").cast(dec) * F.col("cents")).alias("sxx"),
    )
    wr = Window.partitionBy("event_type").orderBy("day")
    u = (
        daily.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "day",
            (F.col("n") * F.col("cents") - F.col("s"))
            .cast(dec)
            .alias("u"),
            "n",
            "s",
            "sxx",
        )
        .withColumn("rn", F.row_number().over(wr))
    )
    flags = u.select(
        "event_type",
        "rn",
        F.expr(
            "CASE WHEN u * u >"
            " 9 * (n * sxx - CAST(s AS DECIMAL(38,0)) * s)"
            " THEN 1 ELSE 0 END"
        ).alias("rule1"),
        F.expr(
            "CASE WHEN u > 0 THEN 1 WHEN u < 0 THEN -1 ELSE 0 END"
        ).alias("side"),
    ).localCheckpoint()
    wi = Window.partitionBy("event_type", "side").orderBy("rn")
    islands = flags.filter(F.col("side") != 0).select(
        "event_type",
        "side",
        (F.col("rn") - F.row_number().over(wi)).alias("grp"),
    )
    runs = islands.groupBy("event_type", "side", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    run_stats = runs.groupBy("event_type").agg(
        F.max("run_len").cast("bigint").alias("longest_run"),
        F.sum(F.when(F.col("run_len") >= 8, 1).otherwise(0))
        .cast("bigint")
        .alias("n_runs_ge8"),
    )
    base = flags.groupBy("event_type").agg(
        F.max("rn").cast("bigint").alias("n_days"),
        F.sum("rule1").cast("bigint").alias("n_beyond_3sigma"),
    )
    return base.join(F.broadcast(run_stats), "event_type", "left").select(
        "event_type",
        "n_days",
        "n_beyond_3sigma",
        F.coalesce(F.col("longest_run"), F.lit(0))
        .cast("bigint")
        .alias("longest_run"),
        F.coalesce(F.col("n_runs_ge8"), F.lit(0))
        .cast("bigint")
        .alias("n_runs_ge8"),
    )


# ---------------------------------------------------------------------------
# text_burstiness
# ---------------------------------------------------------------------------


def _burstiness_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH nd AS MATERIALIZED (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1),
    tok AS (
      SELECT lang, doc_id, unnest({tokens_sql('text')}) AS tok
      FROM documents),
    per_doc AS (
      SELECT lang, tok, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2, 3),
    stats AS (
      SELECT lang, tok,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS total,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
      FROM per_doc GROUP BY 1, 2),
    scored AS (
      SELECT s.lang, s.tok, s.df, s.total,
             CAST((nd.n_docs * s.s2 - CAST(s.total AS HUGEINT) * s.total)
                  * 1000 // (nd.n_docs * s.total) AS BIGINT)
               AS burst_milli
      FROM stats s JOIN nd ON s.lang = nd.lang),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY lang
               ORDER BY burst_milli DESC, total DESC, tok) AS rn
      FROM scored)
    SELECT lang, CAST(rn AS INT) AS rn, tok,
           CAST(df AS BIGINT) AS df,
           CAST(total AS BIGINT) AS total,
           CAST(burst_milli AS BIGINT) AS burst_milli
    FROM ranked WHERE rn <= 5
"""


@register(
    "text_burstiness",
    _burstiness_sql(),
    "per-language top-5 burstiest terms by the variance-to-mean ratio "
    "of per-document counts (Church-Gale burstiness): function words "
    "spread evenly across documents (VMR near 1) while topical terms "
    "concentrate their occurrences in few documents (VMR >> 1) — the "
    "signal that separates keyword candidates from stopwords WITHOUT "
    "any stopword list, feeding the rake/tfidf keyphrase family and "
    "the quality gates (a corpus whose burstiest terms are markup "
    "tokens is template-polluted). EXACT: with C = total count, S2 = "
    "sum of squared per-doc counts, n = docs in the language, the "
    "n^2-scaled VMR collapses to (n*S2 - C^2) * 1000 div (n*C) — "
    "pure integers, and documents NOT containing a term contribute 0 "
    "to S2, so only posting rows are ever touched (the zeros in the "
    "variance are algebraic, not materialized). Ties: total desc, "
    "then token. Shape: one explode -> (lang, tok, doc) hash-agg -> "
    "(lang, tok) posting rollup; the top-5 window runs over the "
    "vocabulary-bounded term dim, never the corpus",
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    nd = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    per_doc = (
        docs.select(
            "lang", "doc_id", F.explode(tokens_expr("text")).alias("tok")
        )
        .groupBy("lang", "tok", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    dec = "decimal(38,0)"
    stats = per_doc.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("total"),
        F.sum(F.col("c").cast(dec) * F.col("c")).alias("s2"),
    )
    scored = stats.join(F.broadcast(nd), "lang").select(
        "lang",
        "tok",
        "df",
        "total",
        F.expr(
            "CAST((n_docs * s2 - CAST(total AS DECIMAL(38,0)) * total)"
            " * 1000 div (n_docs * total) AS BIGINT)"
        ).alias("burst_milli"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("burst_milli"), F.desc("total"), F.col("tok")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "lang",
            F.col("rn").cast("int").alias("rn"),
            "tok",
            "df",
            "total",
            "burst_milli",
        )
    )
