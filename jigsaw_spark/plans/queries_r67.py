"""Round-12 batch 2: corroboration economics and mixture/label
diagnostics that compose this round's new primitives —

- ``graph_bridge_fragmentation``: the action twin of
  ``graph_local_bridges`` — if dedup clusters must be CORROBORATED
  (every edge closes a triangle), how do the keeper-graph components
  fragment?  Components over all edges vs over triangle-closing edges
  only, same node universe: component count, largest cluster, and the
  docs that become singletons (lose ALL corroborated evidence). The
  table that prices a corroboration requirement before adopting it.
- ``emb_label_coherence``: per ground-truth embedding label, the mean
  member-to-label-centroid cosine (the ann_ivf_balance integer
  recipe pointed at LABELS instead of learned cells), the most
  confusable OTHER label and its mean cosine, and the margin — the
  separability audit run before trusting `label` as a training
  target. Centroids are integer-micro component SUMS (cosine is
  scale-invariant, and integer sums are exact and order-independent
  where float means are not).
- ``p_dedup_aware_mix``: the mixture you should actually train on —
  per source, raw vs DEDUP-SURVIVOR token mass (exact keepers that
  are also the min of their near-dup component: the full C4 order),
  the duplicate share, and the largest-remainder proportional
  allocation of one budget computed BOTH ways; the alloc shift
  column is exactly how many seats the raw mixture hands to
  duplicated sources.
- ``ts_fano_grain_curve``: the Fano factor of ``ts_fano_factor``
  swept across {hour, day, week} count grains — overdispersion is
  timescale-dependent (Poisson at day grain can be bursty at hour
  grain), and the grain where F first exceeds Poisson locates the
  burst timescale that sizes windows and anomaly rules.

Scale notes (100 TB): fragmentation reuses the ONE adjacency-pair
join (transitivity shape) plus the size-adaptive connected-components
operator on both arms; label coherence is a posexplode hash-agg to a
|labels|x64 centroid dim broadcast back (|labels| fan-out, bounded);
the mix solver is two |sources|-row seat computations over broadcast
scalars; the grain curve is ONE scan fanned x3 by a broadcast grain
dim into (type, grain, bucket) hash-aggs — no windows over facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# graph_bridge_fragmentation
# ---------------------------------------------------------------------------


def _bridge_frag_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH RECURSIVE {_KEEPER_EDGES_CTE},
    closed AS MATERIALIZED (
      SELECT DISTINCT p.doc_a, p.doc_b
      FROM prs p
      JOIN edges e1 ON e1.u = p.doc_a
      JOIN edges e2 ON e2.u = p.doc_b AND e2.v = e1.v),
    cedges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM closed
      UNION
      SELECT doc_b AS u, doc_a AS v FROM closed),
    reach_full(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach_full r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp_full AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach_full GROUP BY u),
    reach_corr(u, v) AS (
      SELECT u, v FROM cedges
      UNION
      SELECT r.u, e.v FROM reach_corr r JOIN cedges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp_corr0 AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach_corr GROUP BY u),
    universe AS (SELECT DISTINCT u AS doc_id FROM edges),
    comp_corr AS (
      SELECT un.doc_id, coalesce(c.component, un.doc_id) AS component
      FROM universe un LEFT JOIN comp_corr0 c ON un.doc_id = c.doc_id),
    sizes AS (
      SELECT 'full' AS arm, component, CAST(count(*) AS BIGINT) AS sz
      FROM comp_full GROUP BY component
      UNION ALL
      SELECT 'corroborated' AS arm, component,
             CAST(count(*) AS BIGINT) AS sz
      FROM comp_corr GROUP BY component)
    SELECT arm,
           CAST(sum(sz) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_components,
           CAST(max(sz) AS BIGINT) AS max_size,
           CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons
    FROM sizes GROUP BY arm
"""


@register(
    "graph_bridge_fragmentation",
    _bridge_frag_sql(),
    "corroboration fragmentation — the action twin of "
    "graph_local_bridges: components of the keeper graph over ALL "
    "edges vs over TRIANGLE-CLOSING edges only (local bridges "
    "removed), same node universe. A doc with only bridge evidence "
    "becomes a singleton (n_singletons prices how much of the dup "
    "graph a corroboration requirement discards); max_size shows "
    "whether giant clusters were held together by single threads. "
    "Shape: the shared keeper pairs, ONE adjacency-pair join for "
    "triangle evidence (the transitivity shape), the size-adaptive "
    "connected-components operator run on both edge sets, two "
    "size-histogram rollups",
)
def graph_bridge_fragmentation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_pairs,
        symmetric_edges,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = keeper_pairs(docs, "doc_id").localCheckpoint()
    edges = symmetric_edges(pairs)
    e1 = edges.select(F.col("u").alias("a1"), F.col("v").alias("c1"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    closed = (
        pairs.join(e1, pairs["doc_a"] == e1["a1"])
        .join(
            e2,
            (pairs["doc_b"] == e2["b2"]) & (e1["c1"] == e2["c2"]),
        )
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint()
    )
    comp_full = connected_components(pairs)
    comp_corr0 = connected_components(closed)
    universe = edges.select(F.col("u").alias("doc_id")).distinct()
    comp_corr = universe.join(
        comp_corr0.select(
            "doc_id", F.col("component").alias("c0")
        ),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce("c0", F.col("doc_id")).alias("component"),
    )

    def _sizes(comp: DataFrame, arm: str) -> DataFrame:
        return comp.groupBy("component").agg(
            F.count(F.lit(1)).cast("bigint").alias("sz")
        ).select(F.lit(arm).alias("arm"), "sz")

    sizes = _sizes(comp_full, "full").unionByName(
        _sizes(comp_corr, "corroborated")
    )
    return sizes.groupBy("arm").agg(
        F.sum("sz").cast("bigint").alias("n_nodes"),
        F.count(F.lit(1)).cast("bigint").alias("n_components"),
        F.max("sz").cast("bigint").alias("max_size"),
        F.sum(F.when(F.col("sz") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_singletons"),
    )


# ---------------------------------------------------------------------------
# emb_label_coherence
# ---------------------------------------------------------------------------

_LABEL_COHERENCE_SQL = """
    WITH m AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             list_transform(embedding, x ->
               CAST(round(x::DOUBLE * 1000000, 0) AS BIGINT)) AS vm
      FROM embeddings),
    comp AS (
      SELECT label, generate_subscripts(vm, 1) AS d, unnest(vm) AS x
      FROM m),
    cent AS MATERIALIZED (
      SELECT label AS clabel, list(s ORDER BY d) AS cvec
      FROM (SELECT label, d, CAST(sum(x) AS DOUBLE) AS s
            FROM comp GROUP BY label, d) t
      GROUP BY label),
    cc AS MATERIALIZED (
      SELECT m.label, c.clabel,
             CAST(round(round(list_cosine_similarity(m.v, c.cvec), 9)
               * 1000000000, 0) AS BIGINT) AS nano
      FROM m CROSS JOIN cent c),
    per AS (
      SELECT label, clabel, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(nano) AS BIGINT) AS nano_sum
      FROM cc GROUP BY 1, 2),
    own AS (
      SELECT label, n,
             CAST(nano_sum // (n * 1000000) AS BIGINT)
               AS coherence_milli
      FROM per WHERE label = clabel),
    oth AS (
      SELECT label, clabel,
             CAST(nano_sum // (n * 1000000) AS BIGINT) AS o_milli,
             row_number() OVER (PARTITION BY label
               ORDER BY nano_sum // (n * 1000000) DESC, clabel) AS rk
      FROM per WHERE label <> clabel)
    SELECT CAST(o.label AS INT) AS label,
           o.n AS n_vectors,
           o.coherence_milli,
           CAST(t.clabel AS INT) AS best_other,
           t.o_milli AS best_other_milli,
           CAST(o.coherence_milli - t.o_milli AS BIGINT)
             AS margin_milli
    FROM own o JOIN oth t ON o.label = t.label AND t.rk = 1
"""


@register(
    "emb_label_coherence",
    _LABEL_COHERENCE_SQL,
    "label separability audit over the embedding space: per "
    "ground-truth label, the mean member-to-own-centroid cosine "
    "(integer nano sums, one trunc division — the ann_ivf_balance "
    "coherence recipe pointed at LABELS instead of learned IVF "
    "cells), the most confusable OTHER label with its mean cosine, "
    "and the margin. A label whose members sit closer to another "
    "label's centroid than their own cannot be learned from these "
    "embeddings — the audit run before `label` becomes a training "
    "target. Centroids are integer-micro component SUMS (cosine is "
    "scale-invariant; integer sums are exact and order-independent "
    "where float means are not — sums stay < 2^53 per shard at any "
    "realistic members-per-label; shard-and-rescale beyond). Shape: "
    "one posexplode hash-agg to a |labels|x64 centroid dim broadcast "
    "back over the corpus (|labels| fan-out), a (label, label) "
    "bounded rollup, rank window over the <=|labels| dim",
)
def emb_label_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.vectors import cosine_similarity
    from jigsaw_spark.operators.similarity import _to_double

    emb = _t(spark, sf_dir, "embeddings")
    m = emb.select(
        "vec_id",
        "label",
        _to_double("embedding").alias("v"),
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000000, 0).cast(
                "bigint"
            ),
        ).alias("vm"),
    )
    comp = m.select("label", F.posexplode("vm").alias("d", "x"))
    cent = (
        comp.groupBy("label", "d")
        .agg(F.sum("x").cast("double").alias("s"))
        .groupBy(F.col("label").alias("clabel"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("d"), F.col("s")))
                ),
                lambda st: st["s"],
            ).alias("cvec")
        )
    )
    cc = (
        m.crossJoin(F.broadcast(cent))
        .withColumn(
            "nano",
            F.round(
                F.round(cosine_similarity("v", "cvec"), 9)
                * 1000000000,
                0,
            ).cast("bigint"),
        )
        .select("label", "clabel", "nano")
    )
    per = cc.groupBy("label", "clabel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("nano").cast("bigint").alias("nano_sum"),
    )
    own = per.filter(F.col("label") == F.col("clabel")).select(
        "label",
        F.col("n").alias("n_vectors"),
        F.expr("CAST(nano_sum div (n * 1000000) AS BIGINT)").alias(
            "coherence_milli"
        ),
    )
    w = Window.partitionBy("label").orderBy(
        F.expr("nano_sum div (n * 1000000)").desc(), F.col("clabel")
    )
    oth = (
        per.filter(F.col("label") != F.col("clabel"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "label",
            F.col("clabel").cast("int").alias("best_other"),
            F.expr(
                "CAST(nano_sum div (n * 1000000) AS BIGINT)"
            ).alias("best_other_milli"),
        )
    )
    return own.join(oth, "label").select(
        F.col("label").cast("int").alias("label"),
        "n_vectors",
        "coherence_milli",
        "best_other",
        "best_other_milli",
        (F.col("coherence_milli") - F.col("best_other_milli"))
        .cast("bigint")
        .alias("margin_milli"),
    )


# ---------------------------------------------------------------------------
# p_dedup_aware_mix
# ---------------------------------------------------------------------------


def _dedup_mix_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    arms = []
    for arm, cap, total in (
        ("raw", "raw_tokens", "rt"),
        ("ded", "keeper_tokens", "kt"),
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
    -- survivor = exact keeper (in ktoks, the fp-min window of the
    -- keeper CTE) AND the min id of its near-dup component
    keep AS (
      SELECT d.doc_id, d.source, len(k.t) AS ntok,
             coalesce(c.component, k.doc_id) = k.doc_id AS is_keeper
      FROM documents d
      JOIN ktoks k ON d.doc_id = k.doc_id
      LEFT JOIN comp c ON k.doc_id = c.doc_id),
    rawt AS (
      SELECT d.doc_id, d.source, len(t.t) AS ntok
      FROM documents d JOIN toks t ON d.doc_id = t.doc_id),
    src AS MATERIALIZED (
      SELECT r.source,
             CAST(sum(r.ntok) AS BIGINT) AS raw_tokens,
             CAST(coalesce((SELECT sum(k.ntok) FROM keep k
               WHERE k.source = r.source AND k.is_keeper), 0)
               AS BIGINT) AS keeper_tokens
      FROM rawt r GROUP BY 1),
    tot AS (
      SELECT CAST(sum(raw_tokens) AS BIGINT) AS rt,
             CAST(sum(keeper_tokens) AS BIGINT) AS kt
      FROM src),
    b AS (SELECT CAST(kt * 9 // 10 AS BIGINT) AS budget FROM tot),
    {','.join(arms)}
    SELECT s.source, s.raw_tokens, s.keeper_tokens,
           CAST(CASE WHEN s.raw_tokens = 0 THEN 0
             ELSE (s.raw_tokens - s.keeper_tokens) * 1000
                  // s.raw_tokens END AS BIGINT) AS dup_share_milli,
           ar.alloc AS raw_alloc,
           ad.alloc AS dedup_alloc,
           CAST(ad.alloc - ar.alloc AS BIGINT) AS alloc_shift
    FROM src s
    JOIN alloc_raw ar ON s.source = ar.source
    JOIN alloc_ded ad ON s.source = ad.source
"""


@register(
    "p_dedup_aware_mix",
    _dedup_mix_sql(),
    "the mixture you should actually train on: per source, raw vs "
    "DEDUP-SURVIVOR token mass (a survivor is an exact keeper that is "
    "also the min id of its near-dup component — the full C4 order: "
    "exact dedup, then SimHash banding, then components) and the "
    "duplicate share, then ONE token budget (90% of the deduped "
    "total) allocated proportionally by largest remainder BOTH ways "
    "— over raw caps and over survivor caps. alloc_shift is exactly "
    "how many seats the raw mixture hands to duplicated sources: a "
    "source that is 40% copies gets 40% fewer seats once dedup "
    "informs the solver. Complements p_token_budget_mix "
    "(water-filling on raw caps) with the dedup-aware proportional "
    "base the C4/RefinedWeb recipes use. Shape: one tokenize pass, "
    "the shared keeper graph + size-adaptive components for the "
    "survivor flag, |sources|-row seat arithmetic over broadcast "
    "scalars; exact integers throughout",
)
def p_dedup_aware_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # C4-ordered survivors: exact keepers first, then the min id of
    # each near-dup component over the shared keeper graph — ONE
    # exact-dedup pass shared by the flags and the pair graph
    ded, kpairs = keeper_frames(docs, "doc_id")
    exact = ded.select("doc_id", "is_dup")
    comp = connected_components(
        kpairs.localCheckpoint()
    ).select("doc_id", F.col("component").alias("c0"))
    keep = (
        exact.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            (
                ~F.col("is_dup")
                & (
                    F.coalesce("c0", F.col("doc_id"))
                    == F.col("doc_id")
                )
            ).alias("is_keeper"),
        )
    )
    src = (
        ntok.join(keep, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("ntok").cast("bigint").alias("raw_tokens"),
            F.sum(
                F.when(F.col("is_keeper"), F.col("ntok")).otherwise(0)
            )
            .cast("bigint")
            .alias("keeper_tokens"),
        )
        .localCheckpoint()
    )
    tot = src.agg(
        F.sum("raw_tokens").cast("bigint").alias("rt"),
        F.sum("keeper_tokens").cast("bigint").alias("kt"),
    )
    b = tot.select(
        F.expr("CAST(kt * 9 div 10 AS BIGINT)").alias("budget"), "rt", "kt"
    )

    # both seat computations in ONE pass: union the two arms and run
    # the remainder-rank window PARTITIONED BY arm (bounded |sources|
    # rows per partition, and no single-partition warning), then pivot
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

    base = _arm("raw", "raw_tokens", "rt").unionByName(
        _arm("ded", "keeper_tokens", "kt")
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
        F.max(F.when(F.col("arm") == "raw", F.col("alloc")))
        .cast("bigint")
        .alias("raw_alloc"),
        F.max(F.when(F.col("arm") == "ded", F.col("alloc")))
        .cast("bigint")
        .alias("dedup_alloc"),
    )
    return (
        src.join(seats, "source")
        .select(
            "source",
            "raw_tokens",
            "keeper_tokens",
            F.expr(
                "CAST(CASE WHEN raw_tokens = 0 THEN 0"
                " ELSE (raw_tokens - keeper_tokens) * 1000"
                " div raw_tokens END AS BIGINT)"
            ).alias("dup_share_milli"),
            "raw_alloc",
            "dedup_alloc",
            (F.col("dedup_alloc") - F.col("raw_alloc"))
            .cast("bigint")
            .alias("alloc_shift"),
        )
    )


# ---------------------------------------------------------------------------
# ts_fano_grain_curve
# ---------------------------------------------------------------------------

_FANO_GRAIN_SQL = """
    WITH g AS (
      SELECT unnest(['hour', 'day', 'week']) AS grain,
             unnest([3600000000, 86400000000, 604800000000]) AS gus),
    bk AS MATERIALIZED (
      SELECT event_type, grain,
             epoch_us(ts) // gus AS bucket,
             CAST(count(*) AS BIGINT) AS x
      FROM events CROSS JOIN g
      GROUP BY 1, 2, 3)
    SELECT event_type, grain,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(x) AS BIGINT) AS n_events,
           CAST(CASE WHEN count(*) * sum(x) = 0 THEN 0
             ELSE (count(*) * sum(x * x) - sum(x) * sum(x)) * 1000
                  // (count(*) * sum(x)) END AS BIGINT) AS fano_milli
    FROM bk GROUP BY event_type, grain
"""


@register(
    "ts_fano_grain_curve",
    _FANO_GRAIN_SQL,
    "the Fano factor swept across count grains {hour, day, week} per "
    "event type — overdispersion is timescale-dependent: a process "
    "Poisson at the day grain can be bursty at the hour grain "
    "(intra-day campaigns) or at the week grain (weekly batch "
    "replays), and the grain where F first leaves ~1000 milli locates "
    "the burst timescale that sizes windows, anomaly baselines, and "
    "the stream_watermark_advisor's slack. Same exact integer "
    "(n*Q - S^2)/(n*S) milli ratio as ts_fano_factor, one row per "
    "(type, grain). Shape: ONE events scan fanned x3 by a broadcast "
    "3-row grain dim into a (type, grain, bucket) hash-agg, then a "
    "15-row moment rollup — no windows, no pairs",
)
def ts_fano_grain_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = F.broadcast(
        spark.createDataFrame(
            [
                ("hour", 3600000000),
                ("day", 86400000000),
                ("week", 604800000000),
            ],
            "grain string, gus bigint",
        )
    )
    bk = (
        ev.select("event_type", F.unix_micros("ts").alias("us"))
        .crossJoin(g)
        .groupBy(
            "event_type",
            "grain",
            F.expr("us div gus").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    return bk.groupBy("event_type", "grain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("x").cast("bigint").alias("n_events"),
        F.expr(
            "CAST(CASE WHEN count(1) * sum(x) = 0 THEN 0"
            " ELSE (count(1) * sum(x * x) - sum(x) * sum(x)) * 1000"
            " div (count(1) * sum(x)) END AS BIGINT)"
        ).alias("fano_milli"),
    )
