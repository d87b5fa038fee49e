"""Round-13 batch 3: cross-machinery audits — gate × dedup overlap,
leak-detector agreement, the curated budget mix, and embedding-space
split balance.

- ``curation_gate_dup_overlap``: does the quality gate preferentially
  remove DUPLICATED content? Per source, the 2×2 of v1-gate pass ×
  near-dup-cluster membership (cluster size >= 2 under the shared
  keeper machinery) with per-side dup rates — boilerplate is both
  gate-fodder and dup-fodder, and this measures how much of the gate's
  work dedup would have done anyway.
- ``dq_leak_detector_overlap``: the detector-agreement pattern
  (dedup_detector_agreement) applied to the two LEAK auditors — the
  8-gram contamination detector vs the straddling-cluster detector,
  over the same 'contam|' holdout: 2×2 cells and the Jaccard of the
  two flagged-doc sets. Low agreement is the measured case for
  running BOTH audits at 100 TB.
- ``p_curated_budget_mix``: the marginal effect of the GATE given
  dedup — dedup-survivor vs curated (survivor AND gate-pass) token
  mass per source, ONE budget (90% of the curated total) allocated by
  largest remainder both ways; alloc_shift = seats the gate moves.
  Completes the mixture family: p_token_budget_mix (raw),
  p_dedup_aware_mix (dedup | raw), this (gate | dedup).
- ``dq_split_embedding_drift``: embedding-space balance of the
  'contam|' split — the dq_embedding_drift exact-integer machinery
  pointed at train vs holdout instead of the parity halves (vec_id ==
  doc_id identity): per-dimension centroid difference as integer
  rationals, L1 numerator, worst dimension. A holdout that sits
  elsewhere in embedding space measures a different population.

Scale notes (100 TB): the gate battery is a map-only projection; dup
membership and cluster leakage ride the certified banded keeper
machinery (no new pair surface); the mixture solver is |sources|-dim
seat arithmetic over broadcast scalars with the remainder rank
partitioned by arm; the embedding drift is posexplode → ONE
(dim, side) hash-agg (map-side combinable, 64×2 cells).

Reference parity: north-star extension surface (no reference
counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register
from jigsaw_spark.plans.queries_r71 import _HOLDOUT_SQL, _holdout_col

# ---------------------------------------------------------------------------
# curation_gate_dup_overlap
# ---------------------------------------------------------------------------


def _gate_flags_sql() -> str:
    """The v1 gate battery as a (doc_id, ok) CTE fragment — the
    curation_gate_by_source flag set reduced to its pass bit."""
    from jigsaw_spark.operators.text import (
        alnum_ratio_sql,
        lang_hits_sql,
        lang_predict_sql,
        shingles_sql,
        tokens_sql,
    )

    return f"""
    gtoks AS (
      SELECT doc_id, {tokens_sql('text')} AS gt,
             {alnum_ratio_sql('text')} AS alnum
      FROM documents),
    gate AS MATERIALIZED (
      SELECT doc_id,
             NOT (len(gt) < 20)
             AND NOT (alnum < 0.5)
             AND NOT ({lang_predict_sql(
                 f"CAST({lang_hits_sql('gt', 'en')} AS INT)",
                 f"CAST({lang_hits_sql('gt', 'es')} AS INT)",
                 f"CAST({lang_hits_sql('gt', 'fr')} AS INT)",
             )} <> 'en')
             AND NOT (len(gt) >= 3 AND
               2 * (len({shingles_sql('gt', 3)})
                    - len(list_distinct({shingles_sql('gt', 3)})))
               > len({shingles_sql('gt', 3)})) AS ok
      FROM gtoks)"""


def _gate_ok_col(docs: DataFrame, *extra: str) -> DataFrame:
    """(doc_id, *extra, ok): the Spark twin of ``_gate_flags_sql``.
    ``extra`` columns ride the same projection so callers don't pay a
    doc_id self-join just to re-attach source columns."""
    from jigsaw_spark.operators.text import (
        alnum_ratio_expr,
        lang_hits_expr,
        lang_predict_expr,
        shingles_expr,
        tokens_expr,
    )

    t = tokens_expr("text")
    d = docs.select(
        "doc_id",
        *extra,
        t.alias("gt"),
        alnum_ratio_expr("text").alias("alnum"),
    )
    grams = shingles_expr("gt", 3)
    return d.select(
        "doc_id",
        *extra,
        (
            ~(F.size("gt") < 20)
            & ~(F.col("alnum") < 0.5)
            & ~(
                lang_predict_expr(
                    lang_hits_expr("gt", "en"),
                    lang_hits_expr("gt", "es"),
                    lang_hits_expr("gt", "fr"),
                )
                != "en"
            )
            & ~(
                (F.size("gt") >= 3)
                & (
                    2
                    * (F.size(grams) - F.size(F.array_distinct(grams)))
                    > F.size(grams)
                )
            )
        ).alias("ok"),
    )


def _gate_dup_overlap_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH RECURSIVE {_KEEPER_EDGES_CTE},
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach GROUP BY u),
    keeper_of AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keeper
      FROM fpt),
    clust AS (
      SELECT k.doc_id, coalesce(c.component, k.keeper) AS cluster
      FROM keeper_of k LEFT JOIN comp c ON k.keeper = c.doc_id),
    csz AS (
      SELECT cluster, CAST(count(*) AS BIGINT) AS sz
      FROM clust GROUP BY 1),
    dupf AS MATERIALIZED (
      SELECT cl.doc_id, s.sz >= 2 AS is_dup_member
      FROM clust cl JOIN csz s ON cl.cluster = s.cluster),
    {_gate_flags_sql()}
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN g.ok AND f.is_dup_member
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_dup,
           CAST(sum(CASE WHEN g.ok AND NOT f.is_dup_member
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_uniq,
           CAST(sum(CASE WHEN NOT g.ok AND f.is_dup_member
             THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_dup,
           CAST(sum(CASE WHEN NOT g.ok AND NOT f.is_dup_member
             THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_uniq,
           CAST(CASE WHEN sum(CASE WHEN NOT g.ok THEN 1 ELSE 0 END)
             = 0 THEN 0
             ELSE sum(CASE WHEN NOT g.ok AND f.is_dup_member
               THEN 1 ELSE 0 END) * 1000
               // sum(CASE WHEN NOT g.ok THEN 1 ELSE 0 END)
             END AS BIGINT) AS dup_rate_fail_milli,
           CAST(CASE WHEN sum(CASE WHEN g.ok THEN 1 ELSE 0 END) = 0
             THEN 0
             ELSE sum(CASE WHEN g.ok AND f.is_dup_member
               THEN 1 ELSE 0 END) * 1000
               // sum(CASE WHEN g.ok THEN 1 ELSE 0 END)
             END AS BIGINT) AS dup_rate_pass_milli
    FROM documents d
    JOIN gate g ON d.doc_id = g.doc_id
    JOIN dupf f ON d.doc_id = f.doc_id
    GROUP BY d.source
"""


@register(
    "curation_gate_dup_overlap",
    _gate_dup_overlap_sql(),
    "does the quality gate do dedup's work — per source, the 2×2 of "
    "v1-gate pass × near-dup-cluster membership (cluster size >= 2 "
    "over the shared keeper machinery) plus the dup rate among "
    "failures vs passes: boilerplate is both gate-fodder and "
    "dup-fodder, so dup_rate_fail far above dup_rate_pass means the "
    "gate mostly burns budget on docs dedup would remove anyway — "
    "run dedup FIRST; rates close together mean the two filters are "
    "orthogonal and both earn their pass. Shape: map-only gate "
    "projection + the certified keeper/cluster machinery + one "
    "cluster-size hash-agg; no new pair surface",
)
def curation_gate_dup_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_frames,
    )
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    # one exact-dedup pass shared by the keeper fold and the pair graph
    ded, kpairs = keeper_frames(docs, "doc_id")
    keeper_of = ded.select("doc_id", "keeper")
    comp = connected_components(
        kpairs.localCheckpoint()
    ).select(
        F.col("doc_id").alias("keeper"),
        F.col("component").alias("c0"),
    )
    clust = keeper_of.join(comp, "keeper", "left").select(
        "doc_id",
        F.coalesce("c0", F.col("keeper")).alias("cluster"),
    )
    # cluster-partitioned window count instead of groupBy + join-back:
    # `clust` (whose lineage holds the fp window AND the union-find
    # kernel) is evaluated ONCE, not once per reference (guide §2.4);
    # `source` rides the gate projection instead of a doc_id self-join
    wc = Window.partitionBy("cluster")
    dupf = clust.select(
        "doc_id", (F.count(F.lit(1)).over(wc) >= 2).alias("is_dup_member")
    )
    j = _gate_ok_col(docs, "source").join(dupf, "doc_id")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    ok, dup = F.col("ok"), F.col("is_dup_member")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        cnt(ok & dup).alias("n_pass_dup"),
        cnt(ok & ~dup).alias("n_pass_uniq"),
        cnt(~ok & dup).alias("n_fail_dup"),
        cnt(~ok & ~dup).alias("n_fail_uniq"),
        F.expr(
            "CAST(CASE WHEN sum(CASE WHEN NOT ok THEN 1 ELSE 0 END)"
            " = 0 THEN 0 ELSE sum(CASE WHEN NOT ok AND is_dup_member"
            " THEN 1 ELSE 0 END) * 1000"
            " div sum(CASE WHEN NOT ok THEN 1 ELSE 0 END) END"
            " AS BIGINT)"
        ).alias("dup_rate_fail_milli"),
        F.expr(
            "CAST(CASE WHEN sum(CASE WHEN ok THEN 1 ELSE 0 END) = 0"
            " THEN 0 ELSE sum(CASE WHEN ok AND is_dup_member"
            " THEN 1 ELSE 0 END) * 1000"
            " div sum(CASE WHEN ok THEN 1 ELSE 0 END) END AS BIGINT)"
        ).alias("dup_rate_pass_milli"),
    )


# ---------------------------------------------------------------------------
# dq_leak_detector_overlap
# ---------------------------------------------------------------------------


def _leak_overlap_sql() -> str:
    from jigsaw_spark.operators.text import shingles_sql
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    hold = _HOLDOUT_SQL.format(d="doc_id")
    return f"""
    WITH RECURSIVE {_KEEPER_EDGES_CTE},
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach GROUP BY u),
    keeper_of AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keeper
      FROM fpt),
    split AS MATERIALIZED (
      SELECT doc_id, {hold} AS is_holdout FROM documents),
    dg AS MATERIALIZED (
      SELECT DISTINCT doc_id, unnest({shingles_sql('t', 8)}) AS sh
      FROM toks),
    tsh AS (
      SELECT DISTINCT g.sh FROM dg g
      JOIN split s ON g.doc_id = s.doc_id WHERE NOT s.is_holdout),
    gramc AS MATERIALIZED (
      SELECT DISTINCT g.doc_id FROM dg g
      JOIN split s ON g.doc_id = s.doc_id
      JOIN tsh h ON g.sh = h.sh WHERE s.is_holdout),
    lab AS (
      SELECT k.doc_id, coalesce(c.component, k.keeper) AS cluster,
             s.is_holdout
      FROM keeper_of k
      LEFT JOIN comp c ON k.keeper = c.doc_id
      JOIN split s ON k.doc_id = s.doc_id),
    strad AS MATERIALIZED (
      SELECT cluster FROM lab GROUP BY cluster
      HAVING sum(CASE WHEN is_holdout THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN is_holdout THEN 0 ELSE 1 END) > 0),
    flags AS (
      SELECT l.doc_id,
             g.doc_id IS NOT NULL AS by_gram,
             st.cluster IS NOT NULL AS by_cluster
      FROM lab l
      LEFT JOIN gramc g ON l.doc_id = g.doc_id
      LEFT JOIN strad st ON l.cluster = st.cluster
      WHERE l.is_holdout)
    SELECT CAST(count(*) AS BIGINT) AS n_holdout,
           CAST(sum(CASE WHEN by_gram AND by_cluster THEN 1 ELSE 0
             END) AS BIGINT) AS n_both,
           CAST(sum(CASE WHEN by_gram AND NOT by_cluster THEN 1
             ELSE 0 END) AS BIGINT) AS n_gram_only,
           CAST(sum(CASE WHEN by_cluster AND NOT by_gram THEN 1
             ELSE 0 END) AS BIGINT) AS n_cluster_only,
           CAST(sum(CASE WHEN NOT by_gram AND NOT by_cluster THEN 1
             ELSE 0 END) AS BIGINT) AS n_neither,
           CAST(CASE WHEN sum(CASE WHEN by_gram OR by_cluster
             THEN 1 ELSE 0 END) = 0 THEN 0
             ELSE sum(CASE WHEN by_gram AND by_cluster
               THEN 1 ELSE 0 END) * 1000
               // sum(CASE WHEN by_gram OR by_cluster
                 THEN 1 ELSE 0 END) END AS BIGINT) AS jaccard_milli
    FROM flags
"""


@register(
    "dq_leak_detector_overlap",
    _leak_overlap_sql(),
    "leak-detector agreement — the dedup_detector_agreement pattern "
    "pointed at the two split auditors: over the 'contam|' holdout, "
    "docs flagged by the 8-gram contamination detector vs docs "
    "sitting in straddling duplicate clusters "
    "(dq_split_cluster_leakage's criterion), as a 2×2 plus the "
    "Jaccard of the two flagged sets. Low agreement means the "
    "detectors see DIFFERENT leakage (verbatim spans vs whole-doc "
    "near-copies) and a clean bill from one says nothing about the "
    "other — the measured case for running both at 100 TB. Shape: "
    "ONE distinct (doc, gram) relation + the certified keeper "
    "machinery, two semi-join flags, a single hash-agg row",
)
def dq_leak_detector_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_frames,
    )
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    # the holdout flag is a pure md5 expression of doc_id, so it rides
    # the gram explode inline — no split join; and the downstream
    # consumers are all set-semantics, so the per-(doc, gram) distinct
    # shuffle is subsumed by the single (sh) hash-agg below (guide
    # §2.3/§2.4: one exchange where there were four)
    grams = docs.select(
        "doc_id",
        _holdout_col().alias("is_holdout"),
        F.explode(shingles_expr(tokens_expr("text"), 8)).alias("sh"),
    )
    gramc = (
        grams.groupBy("sh")
        .agg(
            F.max(F.when(~F.col("is_holdout"), 1).otherwise(0)).alias(
                "has_train"
            ),
            F.collect_set(
                F.when(F.col("is_holdout"), F.col("doc_id"))
            ).alias("hdocs"),
        )
        .filter(F.col("has_train") == 1)
        .select(F.explode("hdocs").alias("doc_id"))
        .distinct()
        .withColumn("g", F.lit(1))
    )
    # one exact-dedup pass shared by the keeper fold and the pair graph
    ded, kpairs = keeper_frames(docs, "doc_id")
    keeper_of = ded.select("doc_id", "keeper")
    comp = connected_components(
        kpairs.localCheckpoint()
    ).select(
        F.col("doc_id").alias("keeper"),
        F.col("component").alias("c0"),
    )
    lab = keeper_of.join(comp, "keeper", "left").select(
        "doc_id",
        F.coalesce("c0", F.col("keeper")).alias("cluster"),
        _holdout_col().alias("is_holdout"),
    )
    # straddling-cluster membership via a cluster-partitioned window
    # instead of groupBy + join-back: `lab` (fp window + union-find
    # kernel in its lineage) is evaluated ONCE, not once per reference
    wcl = Window.partitionBy("cluster")
    flags = (
        lab.select(
            "doc_id",
            "is_holdout",
            (
                (
                    F.sum(
                        F.when(F.col("is_holdout"), 1).otherwise(0)
                    ).over(wcl)
                    > 0
                )
                & (
                    F.sum(
                        F.when(F.col("is_holdout"), 0).otherwise(1)
                    ).over(wcl)
                    > 0
                )
            ).alias("by_cluster"),
        )
        .filter(F.col("is_holdout"))
        .join(gramc, "doc_id", "left")
        .select(F.col("g").isNotNull().alias("by_gram"), "by_cluster")
    )

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    bg, bc = F.col("by_gram"), F.col("by_cluster")
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_holdout"),
        cnt(bg & bc).alias("n_both"),
        cnt(bg & ~bc).alias("n_gram_only"),
        cnt(bc & ~bg).alias("n_cluster_only"),
        cnt(~bg & ~bc).alias("n_neither"),
        F.expr(
            "CAST(CASE WHEN sum(CASE WHEN by_gram OR by_cluster"
            " THEN 1 ELSE 0 END) = 0 THEN 0"
            " ELSE sum(CASE WHEN by_gram AND by_cluster"
            " THEN 1 ELSE 0 END) * 1000"
            " div sum(CASE WHEN by_gram OR by_cluster"
            " THEN 1 ELSE 0 END) END AS BIGINT)"
        ).alias("jaccard_milli"),
    )


# ---------------------------------------------------------------------------
# p_curated_budget_mix
# ---------------------------------------------------------------------------


def _curated_mix_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    arms = []
    for arm, cap, total in (
        ("ded", "keeper_tokens", "kt"),
        ("cur", "curated_tokens", "ct"),
    ):
        arms.append(f"""
    base_{arm} AS MATERIALIZED (
      SELECT s.source,
             CAST(CASE WHEN t.{total} = 0 THEN 0
               ELSE b.budget * s.{cap} // t.{total} END AS BIGINT)
               AS base,
             CAST(CASE WHEN t.{total} = 0 THEN 0
               ELSE b.budget * s.{cap} % t.{total} END AS BIGINT)
               AS rem
      FROM src s CROSS JOIN b CROSS JOIN tot t),
    left_{arm} AS (
      SELECT CAST(max(b.budget) - sum(base) AS BIGINT) AS lo
      FROM base_{arm} CROSS JOIN b),
    alloc_{arm} AS (
      SELECT source,
             CAST(base + CASE WHEN row_number() OVER
               (ORDER BY rem DESC, source)
               <= (SELECT lo FROM left_{arm}) THEN 1 ELSE 0 END
               AS BIGINT) AS alloc
      FROM base_{arm})""")
    return f"""
    WITH RECURSIVE {_KEEPER_EDGES_CTE},
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach GROUP BY u),
    keep AS (
      SELECT d.doc_id, d.source, len(k.t) AS ntok
      FROM documents d
      JOIN ktoks k ON d.doc_id = k.doc_id
      LEFT JOIN comp c ON k.doc_id = c.doc_id
      WHERE coalesce(c.component, k.doc_id) = k.doc_id),
    {_gate_flags_sql()},
    src AS MATERIALIZED (
      SELECT k.source,
             CAST(sum(k.ntok) AS BIGINT) AS keeper_tokens,
             CAST(sum(CASE WHEN g.ok THEN k.ntok ELSE 0 END)
               AS BIGINT) AS curated_tokens
      FROM keep k JOIN gate g ON k.doc_id = g.doc_id
      GROUP BY 1),
    tot AS (
      SELECT CAST(sum(keeper_tokens) AS BIGINT) AS kt,
             CAST(sum(curated_tokens) AS BIGINT) AS ct
      FROM src),
    b AS (SELECT CAST(ct * 9 // 10 AS BIGINT) AS budget FROM tot),
    {','.join(arms)}
    SELECT s.source, s.keeper_tokens, s.curated_tokens,
           CAST(CASE WHEN s.keeper_tokens = 0 THEN 0
             ELSE (s.keeper_tokens - s.curated_tokens) * 1000
                  // s.keeper_tokens END AS BIGINT)
             AS gate_loss_milli,
           ad.alloc AS dedup_alloc,
           ac.alloc AS curated_alloc,
           CAST(ac.alloc - ad.alloc AS BIGINT) AS alloc_shift
    FROM src s
    JOIN alloc_ded ad ON s.source = ad.source
    JOIN alloc_cur ac ON s.source = ac.source
"""


@register(
    "p_curated_budget_mix",
    _curated_mix_sql(),
    "the marginal effect of the GATE given dedup — per source, "
    "dedup-survivor token mass vs CURATED mass (survivor AND v1-gate "
    "pass), the gate's token loss share, and ONE budget (90% of the "
    "curated total) allocated by largest remainder over both caps: "
    "alloc_shift is exactly how many seats the gate moves between "
    "sources. Completes the mixture family — p_token_budget_mix "
    "prices raw caps, p_dedup_aware_mix prices dedup against raw, "
    "this prices the gate against dedup: the last table before a "
    "training mixture is committed. Shape: one tokenize pass shared "
    "through the keeper CTE, map-only gate projection, |sources| "
    "seat arithmetic over broadcast scalars, remainder rank "
    "partitioned by arm",
)
def p_curated_budget_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_frames,
    )
    from jigsaw_spark.operators.text import tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    ntok = docs.select(
        "doc_id", "source", F.size(tokens_expr("text")).alias("ntok")
    )
    # one exact-dedup pass shared by the flags and the pair graph
    ded, kpairs = keeper_frames(docs, "doc_id")
    exact = ded.select("doc_id", "is_dup")
    comp = connected_components(
        kpairs.localCheckpoint()
    ).select("doc_id", F.col("component").alias("c0"))
    keep = exact.join(comp, "doc_id", "left").select(
        "doc_id",
        (
            ~F.col("is_dup")
            & (F.coalesce("c0", F.col("doc_id")) == F.col("doc_id"))
        ).alias("is_keeper"),
    )
    gate = _gate_ok_col(docs)
    src = (
        ntok.join(keep, "doc_id")
        .join(gate, "doc_id")
        .filter(F.col("is_keeper"))
        .groupBy("source")
        .agg(
            F.sum("ntok").cast("bigint").alias("keeper_tokens"),
            F.sum(F.when(F.col("ok"), F.col("ntok")).otherwise(0))
            .cast("bigint")
            .alias("curated_tokens"),
        )
        .localCheckpoint()
    )
    tot = src.agg(
        F.sum("keeper_tokens").cast("bigint").alias("kt"),
        F.sum("curated_tokens").cast("bigint").alias("ct"),
    )
    b = tot.select(
        F.expr("CAST(ct * 9 div 10 AS BIGINT)").alias("budget"),
        "kt",
        "ct",
    )
    withb = src.crossJoin(F.broadcast(b))

    def _arm(arm: str, cap: str, total: str) -> DataFrame:
        return withb.select(
            F.lit(arm).alias("arm"),
            "source",
            F.expr(
                f"CAST(CASE WHEN {total} = 0 THEN 0"
                f" ELSE budget * {cap} div {total} END AS BIGINT)"
            ).alias("base"),
            F.expr(
                f"CAST(CASE WHEN {total} = 0 THEN 0"
                f" ELSE budget * {cap} % {total} END AS BIGINT)"
            ).alias("rem"),
            "budget",
        )

    base = _arm("ded", "keeper_tokens", "kt").unionByName(
        _arm("cur", "curated_tokens", "ct")
    )
    lo = base.groupBy("arm").agg(
        (F.max("budget") - F.sum("base")).cast("bigint").alias("lo")
    )
    w = Window.partitionBy("arm").orderBy(
        F.desc("rem"), F.col("source")
    )
    alloc = (
        base.withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(lo), "arm")
        .select(
            "arm",
            "source",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("lo"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
    )
    seats = alloc.groupBy("source").agg(
        F.max(F.when(F.col("arm") == "ded", F.col("alloc")))
        .cast("bigint")
        .alias("dedup_alloc"),
        F.max(F.when(F.col("arm") == "cur", F.col("alloc")))
        .cast("bigint")
        .alias("curated_alloc"),
    )
    return src.join(seats, "source").select(
        "source",
        "keeper_tokens",
        "curated_tokens",
        F.expr(
            "CAST(CASE WHEN keeper_tokens = 0 THEN 0"
            " ELSE (keeper_tokens - curated_tokens) * 1000"
            " div keeper_tokens END AS BIGINT)"
        ).alias("gate_loss_milli"),
        "dedup_alloc",
        "curated_alloc",
        F.expr(
            "CAST(curated_alloc - dedup_alloc AS BIGINT)"
        ).alias("alloc_shift"),
    )


# ---------------------------------------------------------------------------
# dq_split_embedding_drift
# ---------------------------------------------------------------------------

_SPLIT_DRIFT_SQL = f"""
    WITH cells AS (
      SELECT CAST(i AS INT) AS pos,
             sum(CASE WHEN NOT ({_HOLDOUT_SQL.format(d='vec_id')})
               THEN CAST(round(embedding[CAST(i + 1 AS INT)]::DOUBLE
                          * 1000000, 0) AS BIGINT) ELSE 0 END) AS st,
             sum(CASE WHEN {_HOLDOUT_SQL.format(d='vec_id')}
               THEN CAST(round(embedding[CAST(i + 1 AS INT)]::DOUBLE
                          * 1000000, 0) AS BIGINT) ELSE 0 END) AS sh,
             sum(CASE WHEN NOT ({_HOLDOUT_SQL.format(d='vec_id')})
               THEN 1 ELSE 0 END) AS nt,
             sum(CASE WHEN {_HOLDOUT_SQL.format(d='vec_id')}
               THEN 1 ELSE 0 END) AS nh
      FROM embeddings, range(64) t(i)
      GROUP BY 1),
    diffs AS (
      SELECT pos,
             CAST(st * nh - sh * nt AS BIGINT) AS dnum,
             CAST(nt * nh AS BIGINT) AS den,
             CAST(nt AS BIGINT) AS nt, CAST(nh AS BIGINT) AS nh
      FROM cells WHERE nt > 0 AND nh > 0)
    SELECT max(nt) AS n_train,
           max(nh) AS n_holdout,
           CAST(max(den) AS BIGINT) AS den,
           CAST(sum(abs(dnum)) AS BIGINT) AS l1_drift_num,
           CAST(max(abs(dnum) * 64 + 63 - pos) // 64 AS BIGINT)
             AS max_abs_diff_num,
           CAST(63 - max(abs(dnum) * 64 + 63 - pos) % 64 AS INT)
             AS max_dim
    FROM diffs
"""


@register(
    "dq_split_embedding_drift",
    _SPLIT_DRIFT_SQL,
    "embedding-space balance of the 'contam|' split — the "
    "dq_embedding_drift exact-integer machinery pointed at train vs "
    "holdout instead of the parity halves (vec_id == doc_id "
    "identity): micro-quantized coordinates, per-dimension centroid "
    "difference as the integer rational st*nh - sh*nt over nt*nh, "
    "L1 numerator, worst dimension (argmax packed, ties -> lowest "
    "dim). dq_split_smd balances doc covariates; this balances the "
    "REPRESENTATION the model actually sees — a holdout sitting "
    "elsewhere in embedding space measures a different population "
    "no length statistic can detect. Shape: posexplode -> ONE "
    "(dim, side) hash-agg (map-side combinable, 64 x 2 cells) -> a "
    "single-row rollup",
)
def dq_split_embedding_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            _holdout_col("vec_id").alias("is_holdout"),
            F.posexplode(
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000000, 0).cast("long"),
                )
            ).alias("pos", "q"),
        )
        .groupBy("pos")
        .agg(
            F.sum(
                F.when(~F.col("is_holdout"), F.col("q")).otherwise(0)
            ).alias("st"),
            F.sum(
                F.when(F.col("is_holdout"), F.col("q")).otherwise(0)
            ).alias("sh"),
            F.sum(F.when(~F.col("is_holdout"), 1).otherwise(0)).alias(
                "nt"
            ),
            F.sum(F.when(F.col("is_holdout"), 1).otherwise(0)).alias(
                "nh"
            ),
        )
    )
    diffs = cells.filter((F.col("nt") > 0) & (F.col("nh") > 0)).select(
        "pos",
        F.expr("CAST(st * nh - sh * nt AS BIGINT)").alias("dnum"),
        F.expr("CAST(nt * nh AS BIGINT)").alias("den"),
        F.col("nt").cast("bigint").alias("nt"),
        F.col("nh").cast("bigint").alias("nh"),
    )
    return diffs.agg(
        F.max("nt").alias("n_train"),
        F.max("nh").alias("n_holdout"),
        F.max("den").cast("bigint").alias("den"),
        F.sum(F.abs(F.col("dnum"))).cast("bigint").alias(
            "l1_drift_num"
        ),
        F.expr(
            "CAST(max(abs(dnum) * 64 + 63 - pos) div 64 AS BIGINT)"
        ).alias("max_abs_diff_num"),
        F.expr(
            "CAST(63 - max(abs(dnum) * 64 + 63 - pos) % 64 AS INT)"
        ).alias("max_dim"),
    )
