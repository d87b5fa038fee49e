"""Round-10 batch 3: community detection, label-noise auditing, ER
threshold tuning, shingle-size cost modeling, and drawdown.

- ``graph_label_propagation``: 2 rounds of synchronous label
  propagation over the near-dup keeper graph (votes = neighbor labels
  + own label; winner = most frequent, ties to the smallest label —
  fully deterministic) and the resulting community-size histogram.
  The cheap community detector next to the exact
  ``dedup_components``: LPA needs only local votes (no transitive
  closure), so at 100 TB it is the one that runs first; the histogram
  read against graph_component_size_hist says how much structure two
  local rounds already recover.
- ``dq_label_conflict``: exact-duplicate groups (the exact_dedup
  fingerprint) whose members DISAGREE on lang or source — identical
  bytes carrying different labels is annotation noise made visible
  (a lang classifier flapped, or two crawls tagged one page
  differently); one-row audit: multi-doc groups, conflicted groups
  per axis, docs affected, conflict rate.
- ``er_threshold_sweep``: precision/recall/F1 of the fuzzy-match
  score at five operating thresholds over the brand-blocked keeper
  pairs (score = normalized Levenshtein similarity in milli; truth =
  the family's lev <= 3 rule) — er_pairwise_f1 grades ONE operating
  point; this is the tuning curve that picks it.
- ``dedup_shingle_sweep``: the shingle-size cost model — for n in
  {3, 5, 8}: distinct shingles, posting volume, max document
  frequency, and the implied candidate-pair volume sum df*(df-1)/2
  WITHOUT enumerating a single pair — the number an engineer reads to
  pick n before launching a posting-join dedup (small n = cheap
  grams, quadratic buckets; large n = linear buckets, misses edits).
- ``ts_max_drawdown``: worst peak-to-trough decline of the daily
  revenue series (running max vs current, exact cents) with the
  trough day — the stability-of-a-metric question every ops review
  asks, computed without floats.

Scale notes (100 TB): LPA is two rounds of (edge join label) hash-aggs
plus a per-node top-1 window on the (node, label) vote dim — votes are
edge-count-bounded, never corpus-quadratic, and the keeper edge list
is the shared localCheckpoint'ed one; the label-conflict audit is one
fingerprint hash-agg; the threshold sweep reuses the C4-ordered
blocked pair table and fans it by a broadcast 5-row dim; the shingle
sweep is three per-n hash-aggs folded into one explode each (posting
stats only — the quadratic space is priced, not materialized); the
drawdown windows run over the bounded day dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# graph_label_propagation
# ---------------------------------------------------------------------------


def lpa_cte() -> str:
    """Shared 2-round LPA CTE chain (keeper edges -> l2 labels) used by
    ``graph_label_propagation`` and ``graph_community_conductance`` —
    one definition so the vote convention cannot drift."""
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""{_KEEPER_EDGES_CTE},
    nodes AS (SELECT DISTINCT u FROM edges),
    v1 AS (
      SELECT e.u, e.v AS lbl FROM edges e
      UNION ALL
      SELECT u, u AS lbl FROM nodes),
    c1 AS (
      SELECT u, lbl, count(*) AS cnt FROM v1 GROUP BY 1, 2),
    l1 AS (
      SELECT u, lbl FROM (
        SELECT u, lbl,
               row_number() OVER (PARTITION BY u
                 ORDER BY cnt DESC, lbl) AS rn
        FROM c1) t
      WHERE rn = 1),
    v2 AS (
      SELECT e.u, l.lbl FROM edges e JOIN l1 l ON e.v = l.u
      UNION ALL
      SELECT u, lbl FROM l1),
    c2 AS (
      SELECT u, lbl, count(*) AS cnt FROM v2 GROUP BY 1, 2),
    l2 AS (
      SELECT u, lbl FROM (
        SELECT u, lbl,
               row_number() OVER (PARTITION BY u
                 ORDER BY cnt DESC, lbl) AS rn
        FROM c2) t
      WHERE rn = 1)"""


def lpa_two_rounds(edges: DataFrame) -> DataFrame:
    """Spark twin of :func:`lpa_cte`: (u, lbl) after 2 synchronous LPA
    rounds (votes = neighbor labels + own, ties to the smallest)."""
    nodes = edges.select("u").distinct()

    def lpa_round(labels: DataFrame) -> DataFrame:
        votes = edges.join(
            labels.select(F.col("u").alias("v"), "lbl"), "v"
        ).select("u", "lbl").unionAll(labels.select("u", "lbl"))
        c = votes.groupBy("u", "lbl").agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy("u").orderBy(F.desc("cnt"), F.col("lbl"))
        return (
            c.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("u", "lbl")
        )

    return lpa_round(lpa_round(nodes.select("u", F.col("u").alias("lbl"))))


def _lpa_sql() -> str:
    return f"""
    WITH {lpa_cte()},
    comm AS (
      SELECT lbl, CAST(count(*) AS BIGINT) AS size
      FROM l2 GROUP BY 1)
    SELECT CAST(size AS BIGINT) AS size,
           CAST(count(*) AS BIGINT) AS n_communities,
           CAST(size * count(*) AS BIGINT) AS n_nodes
    FROM comm GROUP BY size
"""


@register(
    "graph_label_propagation",
    _lpa_sql(),
    "2-round synchronous label propagation over the near-dup keeper "
    "graph: every node starts as its own label, each round votes = "
    "neighbor labels + own label, winner = most frequent with ties to "
    "the smallest label (fully deterministic — the async/random-order "
    "variants of LPA are deliberately not used); output = the "
    "community-size histogram after round 2. The CHEAP community "
    "detector next to dedup_components' exact transitive closure: "
    "LPA needs only local votes, so it is the first pass at "
    "production scale, and this histogram read against "
    "graph_component_size_hist says how much cluster structure two "
    "local rounds already recover. Shape: two rounds of (edge join "
    "label) hash-aggs; the top-1 vote window is per node over its "
    "(node, label) vote rows — edge-count-bounded; the keeper edge "
    "list is the shared localCheckpoint'ed one",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_edges

    docs = _t(spark, sf_dir, "documents")
    edges = keeper_edges(docs, "doc_id")
    l2 = lpa_two_rounds(edges)
    comm = l2.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    return comm.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        (F.col("size") * F.count(F.lit(1))).cast("bigint").alias("n_nodes"),
    )


# ---------------------------------------------------------------------------
# dq_label_conflict
# ---------------------------------------------------------------------------


def _label_conflict_sql() -> str:
    from jigsaw_spark.operators.text import fingerprint_sql, tokens_sql

    return f"""
    WITH fpt AS (
      SELECT doc_id, lang, source,
             {fingerprint_sql(tokens_sql('text'))} AS fp
      FROM documents),
    grp AS (
      SELECT fp,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM fpt GROUP BY 1),
    multi AS (SELECT * FROM grp WHERE n_docs > 1)
    SELECT CAST(count(*) AS BIGINT) AS n_multi_groups,
           CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS n_docs_in_groups,
           CAST(coalesce(sum(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_lang_conflict_groups,
           CAST(coalesce(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END),
             0) AS BIGINT) AS n_source_conflict_groups,
           CAST(coalesce(sum(CASE WHEN n_langs > 1 THEN n_docs
             ELSE 0 END), 0) AS BIGINT) AS n_docs_lang_conflict,
           CAST(CASE WHEN count(*) = 0 THEN 0
             ELSE sum(CASE WHEN n_langs > 1 OR n_sources > 1
                      THEN 1 ELSE 0 END) * 1000 // count(*) END
             AS BIGINT) AS conflict_milli
    FROM multi
"""


@register(
    "dq_label_conflict",
    _label_conflict_sql(),
    "label-conflict audit over EXACT duplicates: groups sharing the "
    "exact_dedup normalization fingerprint whose members disagree on "
    "lang or source — byte-identical content carrying different "
    "labels is annotation noise made visible (a language classifier "
    "flapped between crawls, or two ingests tagged one page "
    "differently), and it is the cheapest label-noise probe there is "
    "because the pairs are FREE (the dedup pass already groups them; "
    "ml_confident_learning estimates noise from model scores, this "
    "measures one slice of it exactly). One-row report: multi-doc "
    "groups, per-axis conflicted groups, docs in lang-conflicted "
    "groups, any-axis conflict rate in milli. Shape: ONE fingerprint "
    "hash-agg (two distinct-counts ride the same shuffle) then a "
    "1-row rollup; no joins, no windows, no pair enumeration",
)
def dq_label_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import fingerprint_expr, tokens_expr

    docs = _t(spark, sf_dir, "documents")
    fpt = docs.select(
        "doc_id",
        "lang",
        "source",
        fingerprint_expr(tokens_expr("text")).alias("fp"),
    )
    grp = fpt.groupBy("fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    multi = grp.filter(F.col("n_docs") > 1)
    return multi.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_multi_groups"),
        F.coalesce(F.sum("n_docs"), F.lit(0))
        .cast("bigint")
        .alias("n_docs_in_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n_langs") > 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_lang_conflict_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_source_conflict_groups"),
        F.coalesce(
            F.sum(
                F.when(F.col("n_langs") > 1, F.col("n_docs")).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_docs_lang_conflict"),
        F.expr(
            "CAST(CASE WHEN count(1) = 0 THEN 0"
            " ELSE sum(CASE WHEN n_langs > 1 OR n_sources > 1"
            " THEN 1 ELSE 0 END) * 1000 div count(1) END AS BIGINT)"
        ).alias("conflict_milli"),
    )


# ---------------------------------------------------------------------------
# er_threshold_sweep
# ---------------------------------------------------------------------------

_ER_SWEEP_SQL = """
    WITH keepers AS (
      SELECT min(p_partkey) AS p_partkey, p_brand, p_name,
             split_part(p_name, ' ', 1) AS tok1
      FROM part GROUP BY p_brand, p_name),
    cand AS (
      SELECT
        CAST((greatest(length(a.p_name), length(b.p_name))
              - levenshtein(a.p_name, b.p_name)) * 1000
             // greatest(length(a.p_name), length(b.p_name)) AS BIGINT)
          AS score_milli,
        CASE WHEN levenshtein(a.p_name, b.p_name) <= 3
          THEN 1 ELSE 0 END AS truth
      FROM keepers a JOIN keepers b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
    ths AS (SELECT unnest([600, 700, 800, 900, 950]) AS thresh),
    sums AS (
      SELECT t.thresh,
             CAST(sum(CASE WHEN c.score_milli >= t.thresh AND c.truth = 1
               THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN c.score_milli >= t.thresh AND c.truth = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN c.score_milli < t.thresh AND c.truth = 1
               THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM cand c CROSS JOIN ths t
      GROUP BY 1)
    SELECT CAST(thresh AS BIGINT) AS thresh, tp, fp, fn,
           CAST(CASE WHEN tp + fp = 0 THEN 0
             ELSE tp * 1000 // (tp + fp) END AS BIGINT) AS prec_milli,
           CAST(CASE WHEN tp + fn = 0 THEN 0
             ELSE tp * 1000 // (tp + fn) END AS BIGINT) AS rec_milli,
           CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
             ELSE 2 * tp * 1000 // (2 * tp + fp + fn) END AS BIGINT)
             AS f1_milli
    FROM sums
"""


@register(
    "er_threshold_sweep",
    _ER_SWEEP_SQL,
    "fuzzy-match operating-point sweep: precision/recall/F1 at five "
    "score thresholds (600-950 milli) over the C4-ordered "
    "brand-blocked keeper pairs, score = normalized Levenshtein "
    "similarity (maxlen - lev) * 1000 div maxlen, truth = the ER "
    "family's lev <= 3 rule — er_pairwise_f1 grades the ONE shipped "
    "operating point (the tok1 blocking key); this is the tuning "
    "curve that picks a score cut, the ER twin of ml_cost_threshold's "
    "sweep. EXACT: F1 = 2tp div (2tp + fp + fn), one integer ratio "
    "per threshold, no float P or R ever computed. Shape: the blocked "
    "pair table is built once (exact identities collapse to keepers "
    "FIRST, blocks bounded by the brand vocabulary), fanned by a "
    "broadcast 5-row threshold dim, then a 5-row hash-agg",
)
def er_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    keepers = (
        part.groupBy("p_brand", "p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
        .select("p_partkey", "p_brand", "p_name")
    )
    a = keepers.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_name").alias("name_a"),
    )
    b = keepers.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("name_b"),
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    maxlen = F.greatest(F.length("name_a"), F.length("name_b"))
    cand = a.join(
        b,
        (F.col("brand_a") == F.col("brand_b"))
        & (F.col("key_a") < F.col("key_b")),
    ).select(
        F.expr(
            "CAST((greatest(length(name_a), length(name_b))"
            " - levenshtein(name_a, name_b)) * 1000"
            " div greatest(length(name_a), length(name_b)) AS BIGINT)"
        ).alias("score_milli"),
        F.when(lev <= 3, 1).otherwise(0).alias("truth"),
    )
    ths = F.broadcast(
        spark.createDataFrame(
            [(600,), (700,), (800,), (900,), (950,)], "thresh bigint"
        )
    )
    sums = cand.crossJoin(ths).groupBy("thresh").agg(
        F.sum(
            F.when(
                (F.col("score_milli") >= F.col("thresh"))
                & (F.col("truth") == 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
        F.sum(
            F.when(
                (F.col("score_milli") >= F.col("thresh"))
                & (F.col("truth") == 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fp"),
        F.sum(
            F.when(
                (F.col("score_milli") < F.col("thresh"))
                & (F.col("truth") == 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("fn"),
    )
    return sums.select(
        "thresh",
        "tp",
        "fp",
        "fn",
        F.expr(
            "CAST(CASE WHEN tp + fp = 0 THEN 0"
            " ELSE tp * 1000 div (tp + fp) END AS BIGINT)"
        ).alias("prec_milli"),
        F.expr(
            "CAST(CASE WHEN tp + fn = 0 THEN 0"
            " ELSE tp * 1000 div (tp + fn) END AS BIGINT)"
        ).alias("rec_milli"),
        F.expr(
            "CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0"
            " ELSE 2 * tp * 1000 div (2 * tp + fp + fn) END AS BIGINT)"
        ).alias("f1_milli"),
    )


# ---------------------------------------------------------------------------
# dedup_shingle_sweep
# ---------------------------------------------------------------------------


def _shingle_sweep_sql() -> str:
    from jigsaw_spark.operators.text import shingles_sql, tokens_sql

    parts = []
    for n in (3, 5, 8):
        parts.append(f"""
    df{n} AS (
      SELECT sh, CAST(count(*) AS BIGINT) AS df FROM (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest({shingles_sql('t', n)}) AS sh
          FROM toks))
      GROUP BY 1),
    s{n} AS (
      SELECT CAST({n} AS INT) AS n,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(df) AS BIGINT) AS n_postings,
             CAST(max(df) AS BIGINT) AS max_df,
             CAST(sum(df * (df - 1) // 2) AS BIGINT) AS candidate_pairs
      FROM df{n})""")
    return f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
    nd AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n FROM documents),{','.join(parts)}
    SELECT u.n, u.n_shingles, u.n_postings, u.max_df, u.candidate_pairs,
           CAST(u.candidate_pairs * 1000 // (SELECT n FROM nd) AS BIGINT)
             AS pairs_per_doc_milli
    FROM (SELECT * FROM s3 UNION ALL SELECT * FROM s5
          UNION ALL SELECT * FROM s8) u
"""


@register(
    "dedup_shingle_sweep",
    _shingle_sweep_sql(),
    "shingle-size cost model for posting-join dedup: for n in "
    "{3, 5, 8}, the distinct shingle count, posting volume, max "
    "document frequency, implied candidate-pair volume "
    "sum df*(df-1)/2, and pairs-per-doc — WITHOUT enumerating a "
    "single pair: the quadratic space is PRICED, not materialized "
    "(small n = few distinct grams with huge df buckets — quadratic "
    "blow-up; large n = near-unique grams — cheap but blind to "
    "edits). This is the number that picks n before launching "
    "dedup_ngram_jaccard / the LSH pipelines, and the df cap those "
    "operators apply is exactly a cut on this table's max_df tail. "
    "Shape: one tokenize scan feeding three per-n "
    "explode -> distinct -> df hash-aggs; output is 3 rows; no "
    "joins, no windows",
)
def dedup_shingle_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import doc_shingles
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    outs = []
    for n in (3, 5, 8):
        df_n = (
            doc_shingles(docs, "doc_id", n=n)
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        )
        outs.append(
            df_n.agg(
                F.lit(n).cast("int").alias("n"),
                F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
                F.sum("df").cast("bigint").alias("n_postings"),
                F.max("df").cast("bigint").alias("max_df"),
                F.sum(F.expr("df * (df - 1) div 2"))
                .cast("bigint")
                .alias("candidate_pairs"),
            )
        )
    u = outs[0].unionAll(outs[1]).unionAll(outs[2])
    return u.crossJoin(F.broadcast(nd)).select(
        "n",
        "n_shingles",
        "n_postings",
        "max_df",
        "candidate_pairs",
        F.expr(
            "CAST(candidate_pairs * 1000 div nd AS BIGINT)"
        ).alias("pairs_per_doc_milli"),
    )


# ---------------------------------------------------------------------------
# ts_max_drawdown
# ---------------------------------------------------------------------------

_DRAWDOWN_SQL = """
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100, 0)
               AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    run AS (
      SELECT day, cents,
             max(cents) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS peak
      FROM daily),
    dd AS (
      SELECT day, cents, peak, peak - cents AS drawdown,
             row_number() OVER (ORDER BY peak - cents DESC, day) AS rn
      FROM run)
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(peak AS BIGINT) AS peak_cents,
           CAST(cents AS BIGINT) AS trough_cents,
           CAST(drawdown AS BIGINT) AS max_drawdown_cents,
           CAST(day AS BIGINT) AS trough_day
    FROM dd WHERE rn = 1
"""


@register(
    "ts_max_drawdown",
    _DRAWDOWN_SQL,
    "worst peak-to-trough decline of the daily revenue series: "
    "running max over days vs the day's revenue, reporting the "
    "maximum gap, the peak it fell from, and the trough day (earliest "
    "on ties) — the metric-stability question every ops review asks "
    "of a daily chart (ts_control_rules flags rule violations; "
    "drawdown gives the single worst excursion with its magnitude). "
    "EXACT: daily revenue as decimal-summed integer cents "
    "(order-independent), pure integer max/compare after. Shape: one "
    "fact hash-agg to the day grain; the running-max and argmax "
    "windows run over the bounded calendar-day dim (the MASE "
    "discipline — day-grain pre-agg before any window)",
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000"
        ).alias("day")
    ).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100, 0
        )
        .cast("bigint")
        .alias("cents")
    )
    wr = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = daily.withColumn("peak", F.max("cents").over(wr))
    wd = Window.orderBy(
        F.desc(F.col("peak") - F.col("cents")), F.col("day")
    )
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        run.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .crossJoin(F.broadcast(nd))
        .select(
            "n_days",
            F.col("peak").cast("bigint").alias("peak_cents"),
            F.col("cents").cast("bigint").alias("trough_cents"),
            (F.col("peak") - F.col("cents"))
            .cast("bigint")
            .alias("max_drawdown_cents"),
            F.col("day").cast("bigint").alias("trough_day"),
        )
    )


# ---------------------------------------------------------------------------
# Round-10 batch 6 (same module — window membership is governed by
# _R10_NEW in plans/queries, not by module numbering).
# ---------------------------------------------------------------------------

# p_quota_sample -----------------------------------------------------------

_QUOTA_N = 1000

_QUOTA_SQL = f"""
    WITH strata AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_stratum
      FROM documents GROUP BY 1),
    tot AS MATERIALIZED (
      SELECT CAST(sum(n_stratum) AS BIGINT) AS n FROM strata),
    alloc AS (
      SELECT lang, n_stratum,
             CAST({_QUOTA_N} AS BIGINT) * n_stratum
               // (SELECT n FROM tot) AS base,
             (CAST({_QUOTA_N} AS BIGINT) * n_stratum)
               % (SELECT n FROM tot) AS rem
      FROM strata),
    seats AS MATERIALIZED (
      SELECT CAST({_QUOTA_N} AS BIGINT)
               - CAST(sum(base) AS BIGINT) AS extra
      FROM alloc),
    quota AS (
      SELECT lang, n_stratum,
             base + CASE WHEN row_number() OVER (
                 ORDER BY rem DESC, lang) <= (SELECT extra FROM seats)
               THEN 1 ELSE 0 END AS quota
      FROM alloc),
    ranked AS (
      SELECT d.lang, d.doc_id,
             row_number() OVER (PARTITION BY d.lang
               ORDER BY md5('quota|' || CAST(d.doc_id AS VARCHAR)),
                        d.doc_id) AS rn
      FROM documents d),
    picked AS (
      SELECT r.lang, r.doc_id
      FROM ranked r JOIN quota q ON r.lang = q.lang
      WHERE r.rn <= q.quota)
    SELECT q.lang, q.n_stratum, CAST(q.quota AS BIGINT) AS quota,
           CAST(count(p.doc_id) AS BIGINT) AS n_sampled,
           CAST(coalesce(sum(p.doc_id), 0) AS BIGINT) AS sum_doc_id
    FROM quota q LEFT JOIN picked p ON q.lang = p.lang
    GROUP BY 1, 2, 3
"""


@register(
    "p_quota_sample",
    _QUOTA_SQL,
    "proportional quota sampling with exact largest-remainder "
    "allocation: a GLOBAL budget of 1000 documents is split across "
    "language strata by floor shares plus +1 seats to the largest "
    "remainders (the Hamilton rule rel_largest_remainder applies to "
    "cents, applied to sample seats — ties remainder DESC then lang), "
    "then each stratum contributes its quota's md5-smallest documents "
    "— the budgeted mixture sampler next to p1_stratified_sample "
    "(exact-N PER group) and p_mixture_reweight (weights, not picks): "
    "quotas sum to EXACTLY the budget, which floor shares alone "
    "cannot do. A stratum smaller than its quota under-fills without "
    "redistribution (single-pass production form, reported by the "
    "n_sampled column); sum_doc_id is the determinism checksum. "
    "Shape: one lang hash-agg, a |langs|-row allocation window, "
    "per-lang md5 rank windows (the p1 stratified convention), one "
    "quota join",
)
def p_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    strata = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_stratum")
    )
    tot = strata.agg(F.sum("n_stratum").cast("bigint").alias("n"))
    alloc = strata.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_stratum",
        F.expr(f"CAST({_QUOTA_N} AS BIGINT) * n_stratum div n").alias(
            "base"
        ),
        F.expr(f"(CAST({_QUOTA_N} AS BIGINT) * n_stratum) % n").alias(
            "rem"
        ),
    )
    seats = alloc.agg(
        (F.lit(_QUOTA_N) - F.sum("base")).cast("bigint").alias("extra")
    )
    wq = Window.orderBy(F.desc("rem"), F.col("lang"))
    quota = (
        alloc.crossJoin(F.broadcast(seats))
        .withColumn("rk", F.row_number().over(wq))
        .select(
            "lang",
            "n_stratum",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)
            ).alias("quota"),
        )
    )
    wr = Window.partitionBy("lang").orderBy(
        F.md5(F.concat_ws("|", F.lit("quota"), F.col("doc_id"))),
        F.col("doc_id"),
    )
    ranked = docs.select(
        "lang", "doc_id", F.row_number().over(wr).alias("rn")
    )
    picked = ranked.join(
        F.broadcast(quota.select(F.col("lang").alias("ql"), "quota")),
        ranked["lang"] == F.col("ql"),
    ).filter(F.col("rn") <= F.col("quota"))
    return (
        quota.join(
            picked.groupBy(F.col("lang").alias("pl")).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
                F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            ),
            quota["lang"] == F.col("pl"),
            "left",
        )
        .select(
            "lang",
            "n_stratum",
            F.col("quota").cast("bigint").alias("quota"),
            F.coalesce("n_sampled", F.lit(0))
            .cast("bigint")
            .alias("n_sampled"),
            F.coalesce("sum_doc_id", F.lit(0))
            .cast("bigint")
            .alias("sum_doc_id"),
        )
    )


# ab_paired_ttest ----------------------------------------------------------

_PAIRED_T_SQL = """
    WITH s AS (
      SELECT user_id,
             epoch_us(ts) // 86400000000 AS day,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    span AS MATERIALIZED (
      SELECT (min(day) + max(day)) // 2 + 1 AS cut FROM s),
    per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN day < (SELECT cut FROM span)
               THEN cents ELSE 0 END) AS BIGINT) AS sx,
             CAST(sum(CASE WHEN day < (SELECT cut FROM span)
               THEN 1 ELSE 0 END) AS BIGINT) AS cx,
             CAST(sum(CASE WHEN day >= (SELECT cut FROM span)
               THEN cents ELSE 0 END) AS BIGINT) AS sy,
             CAST(sum(CASE WHEN day >= (SELECT cut FROM span)
               THEN 1 ELSE 0 END) AS BIGINT) AS cy
      FROM s GROUP BY 1),
    d AS (
      SELECT sy * 1000 // cy - sx * 1000 // cx AS d_milli
      FROM per_user WHERE cx > 0 AND cy > 0),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d_milli) AS HUGEINT) AS sd,
             CAST(sum(CAST(d_milli AS HUGEINT) * d_milli) AS HUGEINT)
               AS sdd
      FROM d)
    SELECT n,
           CAST(sd // n AS BIGINT) AS mean_d_milli,
           round(CASE WHEN n < 2 OR CAST(n AS HUGEINT) * sdd = sd * sd
             THEN 0.0
             ELSE (CAST(sd AS DOUBLE) / n)
                  / sqrt((CAST(sdd AS DOUBLE)
                          - CAST(sd AS DOUBLE) * sd / n)
                         / (n - 1) / n) END, 6) AS t_stat
    FROM agg
"""


@register(
    "ab_paired_ttest",
    _PAIRED_T_SQL,
    "paired t statistic of per-user mean spend, first half vs second "
    "half of the timeline (users active in BOTH halves; per-user "
    "difference of exact milli-cent means) — the WITHIN-subject test "
    "the ab_* family lacked: ab_ttest_welch compares two independent "
    "arms, ab_cuped_adjust shrinks variance with a pre-period "
    "covariate, the paired test removes between-user variance "
    "entirely, which is why before/after product changes are "
    "evaluated paired. EXACT spine: per-user sums/counts in integer "
    "cents, differences floored to milli, sums of d and d^2 in "
    "int128/decimal; only the final t divides in double (identical "
    "operands both engines, round-6 — the ab_ttest_welch float "
    "discipline); degenerate spreads report 0. Shape: one user-keyed "
    "hash-agg (both halves in ONE conditional agg), a 1-row span "
    "broadcast, a 1-row rollup",
)
def ab_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    span = s.agg(F.expr("(min(day) + max(day)) div 2 + 1").alias("cut"))
    per_user = (
        s.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("day") < F.col("cut"), F.col("cents"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("sx"),
            F.sum(F.when(F.col("day") < F.col("cut"), 1).otherwise(0))
            .cast("bigint")
            .alias("cx"),
            F.sum(
                F.when(F.col("day") >= F.col("cut"), F.col("cents"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("sy"),
            F.sum(F.when(F.col("day") >= F.col("cut"), 1).otherwise(0))
            .cast("bigint")
            .alias("cy"),
        )
    )
    dec = "decimal(38,0)"
    d = per_user.filter((F.col("cx") > 0) & (F.col("cy") > 0)).select(
        F.expr("sy * 1000 div cy - sx * 1000 div cx").alias("d_milli")
    )
    agg = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("d_milli").cast(dec)).alias("sd"),
        F.sum(F.col("d_milli").cast(dec) * F.col("d_milli")).alias("sdd"),
    )
    return agg.select(
        "n",
        F.expr("CAST(sd div n AS BIGINT)").alias("mean_d_milli"),
        F.expr(
            "round(CASE WHEN n < 2"
            " OR CAST(n AS DECIMAL(38,0)) * sdd = sd * sd THEN 0.0"
            " ELSE (CAST(sd AS DOUBLE) / n)"
            " / sqrt((CAST(sdd AS DOUBLE)"
            " - CAST(sd AS DOUBLE) * sd / n)"
            " / (n - 1) / n) END, 6)"
        ).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# Round-10 batch 7.
# ---------------------------------------------------------------------------

# graph_community_conductance ----------------------------------------------


def _conductance_sql() -> str:
    return f"""
    WITH {lpa_cte()},
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
    comm AS (
      SELECT lbl, CAST(count(*) AS BIGINT) AS size
      FROM l2 GROUP BY 1),
    top5 AS MATERIALIZED (
      SELECT lbl, size,
             CAST(row_number() OVER (ORDER BY size DESC, lbl) AS INT)
               AS rnk
      FROM comm QUALIFY rnk <= 5),
    vol_all AS MATERIALIZED (
      SELECT CAST(sum(d) AS BIGINT) AS v FROM deg),
    ec AS (
      SELECT t.lbl,
             CAST(sum(CASE WHEN lu.lbl = lv.lbl THEN 1 ELSE 0 END)
               AS BIGINT) AS internal_ends,
             CAST(sum(CASE WHEN lu.lbl <> lv.lbl THEN 1 ELSE 0 END)
               AS BIGINT) AS cut_ends
      FROM edges e
      JOIN l2 lu ON e.u = lu.u
      JOIN l2 lv ON e.v = lv.u
      JOIN top5 t ON lu.lbl = t.lbl
      GROUP BY 1),
    vol AS (
      SELECT l.lbl, CAST(sum(d.d) AS BIGINT) AS vol
      FROM l2 l JOIN deg d ON l.u = d.u
      JOIN top5 t ON l.lbl = t.lbl
      GROUP BY 1)
    SELECT t.rnk, t.lbl AS community, t.size,
           v.vol,
           CAST(coalesce(e.cut_ends, 0) AS BIGINT) AS cut_edges,
           CAST(CASE WHEN least(v.vol, (SELECT v FROM vol_all) - v.vol)
                       = 0 THEN 0
             ELSE coalesce(e.cut_ends, 0) * 1000
                  // least(v.vol, (SELECT v FROM vol_all) - v.vol) END
             AS BIGINT) AS conductance_milli
    FROM top5 t
    JOIN vol v ON t.lbl = v.lbl
    LEFT JOIN ec e ON t.lbl = e.lbl
"""


@register(
    "graph_community_conductance",
    _conductance_sql(),
    "cut conductance of the 5 largest LPA communities (the SHARED "
    "2-round lpa_cte labels, so detector and grader certify the same "
    "partition): per community — size, volume (sum of member "
    "degrees), cut edge-endpoints (directed edges leaving the "
    "community; the symmetric edge list counts each undirected cut "
    "edge once per side), and conductance = cut div min(vol, "
    "total_vol - vol) in milli — THE community-quality number "
    "(graph_label_propagation finds the partition, modularity grades "
    "it globally; conductance grades each cluster separately, and a "
    "high-conductance 'community' is a hub artifact, not a template "
    "family — exactly what decides cluster-level vs doc-level "
    "dedup). EXACT: integer degree/cut counts, one floor division; "
    "communities with zero min-volume report 0. Shape: the keeper "
    "edge list joined twice against the label map (both "
    "keeper-graph-sized), one degree agg, a 5-row top-k dim",
)
def graph_community_conductance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_edges

    docs = _t(spark, sf_dir, "documents")
    edges = keeper_edges(docs, "doc_id")
    l2 = lpa_two_rounds(edges).localCheckpoint()
    deg = edges.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    comm = l2.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    wt = Window.orderBy(F.desc("size"), F.col("lbl"))
    top5 = (
        comm.withColumn("rnk", F.row_number().over(wt).cast("int"))
        .filter(F.col("rnk") <= 5)
        .localCheckpoint()
    )
    vol_all = deg.agg(F.sum("d").cast("bigint").alias("v"))
    lu = l2.select(F.col("u").alias("eu"), F.col("lbl").alias("lu"))
    lv = l2.select(F.col("u").alias("ev"), F.col("lbl").alias("lv"))
    ec = (
        edges.join(lu, edges["u"] == lu["eu"])
        .join(lv, edges["v"] == lv["ev"])
        .join(
            F.broadcast(top5.select(F.col("lbl").alias("tl"))),
            F.col("lu") == F.col("tl"),
        )
        .groupBy(F.col("lu").alias("lbl"))
        .agg(
            F.sum(F.when(F.col("lu") != F.col("lv"), 1).otherwise(0))
            .cast("bigint")
            .alias("cut_ends")
        )
    )
    vol = (
        l2.join(deg, l2["u"] == deg["u"])
        .join(
            F.broadcast(top5.select(F.col("lbl").alias("tl"))),
            F.col("lbl") == F.col("tl"),
        )
        .groupBy("lbl")
        .agg(F.sum("d").cast("bigint").alias("vol"))
    )
    return (
        top5.join(vol, "lbl")
        .join(ec, "lbl", "left")
        .crossJoin(F.broadcast(vol_all))
        .select(
            "rnk",
            F.col("lbl").alias("community"),
            "size",
            "vol",
            F.coalesce("cut_ends", F.lit(0))
            .cast("bigint")
            .alias("cut_edges"),
            F.expr(
                "CAST(CASE WHEN least(vol, v - vol) = 0 THEN 0"
                " ELSE coalesce(cut_ends, 0) * 1000"
                " div least(vol, v - vol) END AS BIGINT)"
            ).alias("conductance_milli"),
        )
    )


# ts_weekday_anova ----------------------------------------------------------

_ANOVA_SQL = """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1),
    grp AS (
      SELECT CAST(day % 7 AS INT) AS dow,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(cents) AS HUGEINT) AS s_g,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ss_g
      FROM daily GROUP BY 1),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(s_g) AS HUGEINT) AS s,
             CAST(sum(ss_g) AS HUGEINT) AS ssq,
             sum(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                 / CAST(n_g AS DOUBLE)) AS sb
      FROM grp)
    SELECT n, CAST(k AS INT) AS k,
           round(sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 2)
             AS ssb,
           round(CAST(ssq AS DOUBLE) - sb, 2) AS ssw,
           round(CASE WHEN k < 2 OR n <= k
                      OR CAST(ssq AS DOUBLE) - sb <= 0 THEN 0.0
             ELSE ((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                   / (k - 1))
                  / ((CAST(ssq AS DOUBLE) - sb) / (n - k)) END, 6)
             AS f_stat
    FROM tot
"""


@register(
    "ts_weekday_anova",
    _ANOVA_SQL,
    "one-way ANOVA of daily revenue by weekday (epoch-day mod 7 — a "
    "fixed 7-group partition, anchor documented): between/within sum "
    "of squares and the F statistic — rel_dow_hour_matrix SHOWS the "
    "weekly pattern, ts_acf_exact correlates lag 7, this one says "
    "whether the weekday means differ MORE than daily noise explains "
    "(the significance gate before anyone ships a weekday-seasonal "
    "model; F is a variance ratio, so no sqrt appears anywhere). "
    "EXACT spine: per-group day counts, cent sums and squared sums "
    "in int128 — the only doubles are the final SSB/SSW/F divisions "
    "on identical exact operands (round-2/round-6, the ab_ttest_welch "
    "float discipline); degenerate cases report 0. Shape: day-grain "
    "pre-agg FIRST (the MASE discipline), one 7-row group hash-agg, "
    "one 1-row rollup",
)
def ts_weekday_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    dec = "decimal(38,0)"
    grp = daily.groupBy(
        F.expr("CAST(day % 7 AS INT)").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(F.col("cents").cast(dec)).alias("s_g"),
        F.sum(F.col("cents").cast(dec) * F.col("cents")).alias("ss_g"),
    )
    tot = grp.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("ssq"),
        F.sum(
            F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g").cast("double")
        ).alias("sb"),
    )
    return tot.select(
        "n",
        F.col("k").cast("int").alias("k"),
        F.expr(
            "round(sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 2)"
        ).alias("ssb"),
        F.expr("round(CAST(ssq AS DOUBLE) - sb, 2)").alias("ssw"),
        F.expr(
            "round(CASE WHEN k < 2 OR n <= k"
            " OR CAST(ssq AS DOUBLE) - sb <= 0 THEN 0.0"
            " ELSE ((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
            " / (k - 1))"
            " / ((CAST(ssq AS DOUBLE) - sb) / (n - k)) END, 6)"
        ).alias("f_stat"),
    )
