"""Round-12 batch 3: second-order dedup/repair economics —

- ``dq_repair_residual``: does the split repair LEAK SIDEWAYS?
  ``dq_split_repair`` plans exact-count swaps (demote contaminated
  holdout docs, promote provably-safe df=1 train docs); this EXECUTES
  the plan (md5-ordered promotion within source) and re-runs the full
  contamination count on the repaired split. Demoted docs' grams join
  the train side, so a holdout doc that was clean against the OLD
  train can be newly contaminated by a former holdout neighbor — the
  second-order effect a one-shot repair audit misses.
- ``graph_edge_support``: the support histogram of keeper edges —
  how many triangles each edge closes (support 0 = the local bridges
  of ``graph_local_bridges``; support >= k-2 is the k-truss retention
  condition). One relation generalizes the bridge/triangle split into
  the full corroboration-depth distribution.
- ``dedup_pooled_components``: pooling evidence ACROSS modalities —
  components over text keeper pairs, over banded dHash image pairs,
  and over their UNION, same accounting. ``dedup_cross_modal``
  intersects evidence per doc; this merges it per cluster: pooled
  components fuse clusters that neither modality alone connects.

Scale notes (100 TB): the repair residual is gram hash-aggs plus ONE
md5-banded rank over the promotion pool (partitioned by (source,
band), offsets over a |sources|x256 dim — no raw-fact single
partition); edge support is the one adjacency-pair join of the
transitivity family aggregated per edge then histogrammed over the
bounded support domain; pooled components reuse the size-adaptive
connected-components operator on three edge sets that are all
banded/bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# dq_repair_residual
# ---------------------------------------------------------------------------


def _repair_residual_sql() -> str:
    from jigsaw_spark.operators.text import shingles_sql, tokens_sql

    return f"""
    WITH split AS (
      SELECT doc_id, source,
             CAST(CAST(('0x' || substr(md5('contam|'
               || CAST(doc_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               % CAST(20 AS UBIGINT) AS BIGINT) = 0 AS is_holdout,
             {tokens_sql('text')} AS t
      FROM documents),
    gr AS (
      SELECT doc_id, unnest({shingles_sql('t', 8)}) AS sh
      FROM split),
    dg AS MATERIALIZED (
      SELECT DISTINCT doc_id, sh FROM gr),
    train_sh AS MATERIALIZED (
      SELECT DISTINCT g.sh
      FROM dg g JOIN split s ON g.doc_id = s.doc_id
      WHERE NOT s.is_holdout),
    contam AS MATERIALIZED (
      SELECT DISTINCT g.doc_id
      FROM dg g
      JOIN split s ON g.doc_id = s.doc_id
      JOIN train_sh h ON g.sh = h.sh
      WHERE s.is_holdout),
    gdf AS (
      SELECT sh, CAST(count(*) AS BIGINT) AS df FROM dg GROUP BY sh),
    doc_max AS (
      SELECT g.doc_id, max(d.df) AS mx
      FROM dg g JOIN gdf d ON g.sh = d.sh GROUP BY g.doc_id),
    pool AS (
      SELECT s.doc_id, s.source
      FROM split s LEFT JOIN doc_max m ON s.doc_id = m.doc_id
      WHERE NOT s.is_holdout AND coalesce(m.mx, 1) <= 1),
    quota AS MATERIALIZED (
      SELECT s.source,
             CAST(sum(CASE WHEN s.is_holdout AND c.doc_id IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_demote,
             CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pool
      FROM split s
      LEFT JOIN contam c ON s.doc_id = c.doc_id
      LEFT JOIN pool p ON s.doc_id = p.doc_id
      GROUP BY s.source),
    promoted AS MATERIALIZED (
      SELECT r.doc_id, r.source FROM (
        SELECT p.doc_id, p.source,
               row_number() OVER (PARTITION BY p.source
                 ORDER BY md5('repair|' || CAST(p.doc_id AS VARCHAR)),
                          p.doc_id) AS rk
        FROM pool p) r
      JOIN quota q ON r.source = q.source
      WHERE r.rk <= least(q.n_demote, q.n_pool)),
    -- repaired split: train' = (train - promoted) + contam,
    -- holdout' = (holdout - contam) + promoted
    nsplit AS MATERIALIZED (
      SELECT s.doc_id, s.source,
             CASE WHEN c.doc_id IS NOT NULL THEN FALSE
                  WHEN p.doc_id IS NOT NULL THEN TRUE
                  ELSE s.is_holdout END AS is_holdout
      FROM split s
      LEFT JOIN contam c ON s.doc_id = c.doc_id
      LEFT JOIN promoted p ON s.doc_id = p.doc_id),
    ntrain_sh AS MATERIALIZED (
      SELECT DISTINCT g.sh
      FROM dg g JOIN nsplit s ON g.doc_id = s.doc_id
      WHERE NOT s.is_holdout),
    ncontam AS MATERIALIZED (
      SELECT DISTINCT g.doc_id
      FROM dg g
      JOIN nsplit s ON g.doc_id = s.doc_id
      JOIN ntrain_sh h ON g.sh = h.sh
      WHERE s.is_holdout)
    SELECT s.source,
           CAST(sum(CASE WHEN s.is_holdout THEN 1 ELSE 0 END)
             AS BIGINT) AS n_holdout_before,
           CAST(sum(CASE WHEN s.is_holdout AND c.doc_id IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_before,
           CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_promoted,
           CAST(sum(CASE WHEN n.is_holdout THEN 1 ELSE 0 END)
             AS BIGINT) AS n_holdout_after,
           CAST(sum(CASE WHEN n.is_holdout AND nc.doc_id IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_contam_after,
           CAST(sum(CASE WHEN s.is_holdout AND c.doc_id IS NOT NULL
             THEN 1 ELSE 0 END)
             - sum(CASE WHEN n.is_holdout AND nc.doc_id IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS repair_gain
    FROM split s
    JOIN nsplit n ON s.doc_id = n.doc_id
    LEFT JOIN contam c ON s.doc_id = c.doc_id
    LEFT JOIN promoted p ON s.doc_id = p.doc_id
    LEFT JOIN ncontam nc ON s.doc_id = nc.doc_id
    GROUP BY s.source
"""


@register(
    "dq_repair_residual",
    _repair_residual_sql(),
    "the executed split repair, re-audited: demote every contaminated "
    "holdout doc to train, promote the md5-first least(demote, pool) "
    "provably-safe (all-gram-df=1) train docs per source into holdout, "
    "then RE-RUN the full 8-gram contamination count on the repaired "
    "split. Demoted docs' grams join the train side, so previously "
    "clean holdout docs can be NEWLY contaminated by former holdout "
    "neighbors — n_contam_after measures that sideways leak (promoted "
    "docs are clean by construction), and repair_gain is the honest "
    "net effect of the repair. Shape: the dq_split_repair gram "
    "machinery reused (ONE distinct (doc, gram) relation serves all "
    "four contamination/df consumers), the promotion rank banded by "
    "(source, md5-prefix) on the Spark side — no raw-fact single "
    "partition; oracle uses the plain per-source row_number (ranks "
    "identical by the banding proof of queries_r20)",
)
def dq_repair_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.hashing import md5_key
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    hold = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws("|", F.lit("contam"), F.col("doc_id"))
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(20),
        )
        == 0
    )
    split = docs.select("doc_id", "source", hold.alias("is_holdout"))

    def _grams(frame: DataFrame, *extra: str) -> DataFrame:
        return frame.select(
            "doc_id",
            hold.alias("h0"),
            *extra,
            F.explode(
                shingles_expr(tokens_expr("text"), 8)
            ).alias("sh"),
        )

    # ONE full corpus pass for the whole audit: the gram explode feeds
    # the (sh) hash-agg's map side directly (no intermediate
    # materialization of the exploded relation). Per gram: the distinct
    # doc posting (for df/safe), the round-0 train count and holdout
    # docs. The REPAIRED split's contamination is then derived
    # INCREMENTALLY — only grams containing a demoted/promoted doc can
    # change, and those sets are bounded by the repair volume, so the
    # second round is a broadcast-delta map-pass over g0, never a
    # second full aggregation (guide §2.4).
    g0 = (
        _grams(docs)
        .groupBy("sh")
        # ONE collect_set: the holdout flag is a pure md5 expression of
        # doc_id, so the per-gram holdout subset derives by FILTERING
        # the doc array post-agg (r14, the dq_repair_fixpoint form)
        .agg(F.collect_set("doc_id").alias("_ds"))
        .withColumn(
            "hd0",
            F.filter(
                F.col("_ds"),
                lambda d: F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws("|", F.lit("contam"), d)
                            ),
                            1,
                            12,
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                    F.lit(20),
                )
                == 0,
            ),
        )
        .withColumn("nt0", F.size("_ds") - F.size("hd0"))
        .localCheckpoint()
    )
    doc_max = (
        g0.select(
            F.size("_ds").cast("bigint").alias("df"),
            F.explode("_ds").alias("doc_id"),
        )
        .groupBy("doc_id")
        .agg(F.max("df").alias("mx"))
    )
    # lazy checkpoints (r14, guide §2.4): the repair chain is
    # sequential (contam → promoted → nsplit → final agg), so each
    # EAGER barrier was a separately scheduled near-idle job; with
    # eager=False the materialization folds into the first job that
    # needs it and later references still reuse the stored partitions
    contam = (
        g0.filter(F.col("nt0") > 0)
        .select(F.explode("hd0").alias("doc_id"))
        .distinct()
        .withColumn("c", F.lit(1))
        .localCheckpoint(eager=False)
    )
    pool = (
        split.join(doc_max, "doc_id", "left")
        .filter(
            ~F.col("is_holdout")
            & (F.coalesce("mx", F.lit(1)) <= 1)
        )
        .select("doc_id", "source")
        .localCheckpoint(eager=False)
    )
    # quota from two tiny aggregates instead of a 3-way join over the
    # full doc table (the dq_repair_fixpoint _promote form): contam
    # docs are holdout by construction, so n_demote is just their
    # per-source count; sources absent from the pool produce no ranked
    # rows, so pool-side grouping loses nothing
    ndem = (
        split.join(
            F.broadcast(contam.select("doc_id")), "doc_id", "left_semi"
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_demote"))
    )
    quota = (
        pool.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pool"))
        .join(F.broadcast(ndem), "source", "left")
        .select(
            "source",
            F.coalesce("n_demote", F.lit(0)).alias("n_demote"),
            "n_pool",
        )
    )
    # banded promotion rank: md5 hex prefix -> 256 uniform bands per
    # source; offsets over the (source, band) dim (bounded), rank
    # partitioned by (source, band) — bit-identical to the oracle's
    # per-source row_number (the queries_r20 banding proof)
    keyed = pool.withColumn(
        "_h", md5_key(F.col("doc_id"), seed="repair")
    ).withColumn("_band", F.substring("_h", 1, 2))
    bcounts = keyed.groupBy("source", "_band").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wb = (
        Window.partitionBy("source")
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = bcounts.select(
        "source",
        "_band",
        F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_off"),
    )
    wrank = Window.partitionBy("source", "_band").orderBy(
        "_h", "doc_id"
    )
    promoted = (
        keyed.join(F.broadcast(boff), ["source", "_band"])
        .withColumn("rk", F.col("_off") + F.row_number().over(wrank))
        .join(F.broadcast(quota), "source")
        .filter(F.col("rk") <= F.least("n_demote", "n_pool"))
        .select("doc_id")
        .withColumn("pr", F.lit(1))
        .localCheckpoint(eager=False)
    )
    nsplit = (
        split.join(contam, "doc_id", "left")
        .join(promoted, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.when(F.col("c").isNotNull(), F.lit(False))
            .when(F.col("pr").isNotNull(), F.lit(True))
            .otherwise(F.col("is_holdout"))
            .alias("n_holdout"),
            "is_holdout",
            F.col("c").isNotNull().alias("was_contam"),
            F.col("pr").isNotNull().alias("was_promoted"),
        )
        # single downstream consumer (the final agg) — no checkpoint;
        # its inputs are all checkpointed so the lineage stays shallow
    )
    # repaired-split contamination derived incrementally from g0: the
    # flags differ from round 0 only on the demoted (contam, holdout →
    # train) and promoted (safe train → holdout) docs, which are
    # disjoint by construction (promoted docs have every gram df ≤ 1 so
    # they can never be contaminated; demoted docs share a gram with
    # train so they can never be safe). ONE broadcast inner join of the
    # change sets into a re-scan, a tiny delta agg, then a map-pass
    # over g0 — never a second full gram aggregation.
    changed = contam.select(
        "doc_id", F.lit(True).alias("_isd")
    ).unionByName(
        promoted.select("doc_id", F.lit(False).alias("_isd"))
    )
    delta = (
        _grams(docs.join(F.broadcast(changed), "doc_id"), "_isd")
        .groupBy("sh")
        .agg(
            F.collect_set(
                F.when(F.col("_isd"), F.col("doc_id"))
            ).alias("dd"),
            F.collect_set(
                F.when(~F.col("_isd"), F.col("doc_id"))
            ).alias("pd"),
        )
    )
    upd = g0.join(F.broadcast(delta), "sh", "left").select(
        (
            F.col("nt0")
            + F.coalesce(F.size("dd"), F.lit(0))
            - F.coalesce(F.size("pd"), F.lit(0))
        ).alias("nt"),
        F.when(F.col("dd").isNull(), F.col("hd0"))
        .otherwise(F.concat(F.array_except("hd0", "dd"), F.col("pd")))
        .alias("hd"),
    )
    ncontam = (
        upd.filter((F.col("nt") > 0) & (F.size("hd") > 0))
        .select(F.explode("hd").alias("doc_id"))
        .distinct()
        .withColumn("nc", F.lit(1))
    )
    return (
        nsplit.join(ncontam, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("is_holdout"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_holdout_before"),
            F.sum(
                F.when(
                    F.col("is_holdout") & F.col("was_contam"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_contam_before"),
            F.sum(F.when(F.col("was_promoted"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_promoted"),
            F.sum(F.when(F.col("n_holdout"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_holdout_after"),
            F.sum(
                F.when(
                    F.col("n_holdout") & F.col("nc").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_contam_after"),
            (
                F.sum(
                    F.when(
                        F.col("is_holdout") & F.col("was_contam"), 1
                    ).otherwise(0)
                )
                - F.sum(
                    F.when(
                        F.col("n_holdout") & F.col("nc").isNotNull(),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("bigint")
            .alias("repair_gain"),
        )
    )


# ---------------------------------------------------------------------------
# graph_edge_support
# ---------------------------------------------------------------------------


def _edge_support_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    sup AS (
      SELECT p.doc_a, p.doc_b,
             CAST(count(DISTINCT e1.v) AS BIGINT) AS support
      FROM prs p
      JOIN edges e1 ON e1.u = p.doc_a
      JOIN edges e2 ON e2.u = p.doc_b AND e2.v = e1.v
      GROUP BY 1, 2),
    allsup AS (
      SELECT p.doc_a, p.doc_b, coalesce(s.support, 0) AS support
      FROM prs p
      LEFT JOIN sup s ON p.doc_a = s.doc_a AND p.doc_b = s.doc_b),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM prs)
    SELECT CAST(a.support AS BIGINT) AS support,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(count(*) * 1000 // t.n_edges AS BIGINT) AS share_milli
    FROM allsup a CROSS JOIN tot t
    GROUP BY a.support, t.n_edges
"""


@register(
    "graph_edge_support",
    _edge_support_sql(),
    "corroboration-depth histogram of the keeper graph: per edge, the "
    "number of triangles it closes (= common neighbors of its "
    "endpoints), rolled up to (support, n_edges, share). Support 0 is "
    "exactly graph_local_bridges' bridge set; support >= k-2 is the "
    "k-truss retention condition, so this one relation prices EVERY "
    "corroboration threshold at once where the bridge query prices "
    "only threshold 1 — the input to choosing how much corroboration "
    "dedup clusters must carry. Shape: the one adjacency-pair join of "
    "the transitivity family aggregated per edge (hash-agg, no "
    "windows), zero-filled by a left join back to the pair list, "
    "histogram over the bounded support domain",
)
def graph_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_pairs, symmetric_edges

    docs = _t(spark, sf_dir, "documents")
    pairs = keeper_pairs(docs, "doc_id").localCheckpoint()
    edges = symmetric_edges(pairs)
    e1 = edges.select(F.col("u").alias("a1"), F.col("v").alias("c1"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    sup = (
        pairs.join(e1, pairs["doc_a"] == e1["a1"])
        .join(
            e2,
            (pairs["doc_b"] == e2["b2"]) & (e1["c1"] == e2["c2"]),
        )
        .groupBy("doc_a", "doc_b")
        # edges are distinct (pairs are distinct and a < b, so the two
        # orientations cannot collide), hence each common neighbor
        # produces exactly one (doc_a, doc_b, c1) row — a plain count
        # equals the distinct count without the Expand machinery (r14)
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    allsup = pairs.join(sup, ["doc_a", "doc_b"], "left").select(
        F.coalesce("support", F.lit(0)).alias("support")
    )
    tot = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    )
    return (
        allsup.groupBy("support")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        .crossJoin(F.broadcast(tot).withColumnRenamed("n_edges", "te"))
        .select(
            F.col("support").cast("bigint").alias("support"),
            "n_edges",
            F.expr("CAST(n_edges * 1000 div te AS BIGINT)").alias(
                "share_milli"
            ),
        )
    )


# ---------------------------------------------------------------------------
# dedup_pooled_components
# ---------------------------------------------------------------------------


def _pooled_components_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    return f"""
    WITH RECURSIVE {_KEEPER_EDGES_CTE},
    {_PHASH_BYTES_CTE.strip()},
    mcand AS (
      SELECT DISTINCT x.i AS ia, y.i AS ib
      FROM ph_bytes x
      JOIN ph_bytes y ON x.byte_idx = y.byte_idx
                     AND x.byte_val = y.byte_val AND x.i < y.i),
    mpairs AS MATERIALIZED (
      SELECT ia AS doc_a, ib AS doc_b FROM (
        SELECT c.ia, c.ib,
               CAST(sum(bit_count(xor(x.byte_val, y.byte_val)))
                 AS BIGINT) AS hamming
        FROM mcand c
        JOIN ph_bytes x ON x.i = c.ia
        JOIN ph_bytes y ON y.i = c.ib AND y.byte_idx = x.byte_idx
        GROUP BY 1, 2) h
      WHERE h.hamming <= 6),
    tedges AS (SELECT u, v FROM edges),
    iedges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM mpairs
      UNION SELECT doc_b AS u, doc_a AS v FROM mpairs),
    uedges AS MATERIALIZED (
      SELECT u, v FROM tedges UNION SELECT u, v FROM iedges),
    reach_t(u, v) AS (
      SELECT u, v FROM tedges
      UNION
      SELECT r.u, e.v FROM reach_t r JOIN tedges e ON r.v = e.u
      WHERE e.v <> r.u),
    reach_i(u, v) AS (
      SELECT u, v FROM iedges
      UNION
      SELECT r.u, e.v FROM reach_i r JOIN iedges e ON r.v = e.u
      WHERE e.v <> r.u),
    reach_u(u, v) AS (
      SELECT u, v FROM uedges
      UNION
      SELECT r.u, e.v FROM reach_u r JOIN uedges e ON r.v = e.u
      WHERE e.v <> r.u),
    sizes AS (
      SELECT 'text' AS arm, least(u, min(v)) AS component,
             CAST(1 AS BIGINT) AS one
      FROM reach_t GROUP BY u
      UNION ALL
      SELECT 'image' AS arm, least(u, min(v)), CAST(1 AS BIGINT)
      FROM reach_i GROUP BY u
      UNION ALL
      SELECT 'pooled' AS arm, least(u, min(v)), CAST(1 AS BIGINT)
      FROM reach_u GROUP BY u),
    comp AS (
      SELECT arm, component, CAST(count(*) AS BIGINT) AS sz
      FROM sizes GROUP BY 1, 2)
    SELECT arm,
           CAST(sum(sz) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_components,
           CAST(max(sz) AS BIGINT) AS max_size
    FROM comp GROUP BY arm
"""


@register(
    "dedup_pooled_components",
    _pooled_components_sql(),
    "evidence pooling across modalities: connected components over "
    "text keeper pairs, over banded dHash image pairs, and over their "
    "UNION — same accounting (nodes, components, giant size) per arm. "
    "dedup_cross_modal INTERSECTS evidence per doc (corroboration); "
    "this MERGES it per cluster: a pooled component count below "
    "text+image means the modalities connect different doc groups "
    "and pooling fuses clusters neither finds alone — the recall "
    "argument for multi-modal dedup, priced exactly. Shape: two "
    "certified banded pair lists unioned, the size-adaptive "
    "connected-components operator per arm, three size rollups — "
    "never an unbanded pair enumeration",
)
def dedup_pooled_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_pairs,
    )
    from jigsaw_spark.plans.queries_r6 import mm_phash_near_dup

    docs = _t(spark, sf_dir, "documents")
    tpairs = keeper_pairs(docs, "doc_id").localCheckpoint()
    ipairs = (
        mm_phash_near_dup(spark, sf_dir)
        .select(
            F.col("img_a").cast("bigint").alias("doc_a"),
            F.col("img_b").cast("bigint").alias("doc_b"),
        )
        .localCheckpoint()
    )
    upairs = tpairs.select("doc_a", "doc_b").unionByName(
        ipairs
    ).distinct()

    def _arm(pairs: DataFrame, arm: str) -> DataFrame:
        comp = connected_components(pairs)
        return (
            comp.groupBy("component")
            .agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
            .agg(
                F.sum("sz").cast("bigint").alias("n_nodes"),
                F.count(F.lit(1)).cast("bigint").alias("n_components"),
                F.max("sz").cast("bigint").alias("max_size"),
            )
            .select(F.lit(arm).alias("arm"), "*")
        )

    return (
        _arm(tpairs, "text")
        .unionByName(_arm(ipairs, "image"))
        .unionByName(_arm(upairs, "pooled"))
    )
