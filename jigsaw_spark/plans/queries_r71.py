"""Round-13 batch 1: second-order audits over the certified dedup /
repair / phash machinery (verdict r12 #4's candidate list).

- ``dq_pooled_cluster_leakage``: the r70 cluster-leakage audit re-run
  over POOLED evidence (text keeper edges UNION banded dHash image
  edges, endpoints folded to exact keepers) next to the text-only
  arm — does pooling image evidence reveal train/holdout straddle the
  text clusters miss? The leakage twin of ``dedup_pooled_components``.
- ``dq_repair_fixpoint``: the convergence proof of the executed split
  repair — run ``dq_split_repair``'s demote+promote a SECOND round on
  the repaired split and report the contamination residual at
  iterations 0/1/2 per source. The residual audit
  (``dq_repair_residual``) showed round 1's sideways leak; this shows
  whether iterating shrinks it monotonically or oscillates.
- ``mm_phash_threshold_purity``: joins the r70 threshold sweep with
  ``mm_phash_cluster_sources``'s purity view — per Hamming threshold
  arm {0, 2, 4, 6}, the cluster count, multi-source cluster share and
  majority-source mass over the image universe: at which threshold do
  image clusters start fusing across sources?
- ``ann_recall_under_dedup``: retrieval under keeper collapse — the
  brute-force top-10 panel truth vs the top-10 over the SURVIVOR
  corpus (docs equal to their near-dup cluster id): how much recall
  dedup costs, and how much of the loss the cluster REPRESENTATIVE
  recovers (a lost neighbor's keeper ranked in the collapsed top-10).

Scale notes (100 TB): every pair source stays banded (keeper pairs,
byte-banded dHash candidates) — no all-pairs anywhere; components run
through the size-adaptive operator; the repair fixpoint reuses ONE
distinct (doc, gram) relation for all six contamination/df consumers
and promotes via the (source, md5-band) rank — no raw-fact global
window; the ANN arms scan the corpus once per arm through the Arrow
top-k kernel with a 5-row broadcast panel.

Reference parity: extends jigsaw's dedup/split surface (reference
`jigsaw/filters.py` dedup + split helpers) with the second-order
audits a 100 TB curation run needs; no reference counterpart — the
north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

_PURITY_THRESHOLDS = (0, 2, 4, 6)


def _holdout_col(doc_id="doc_id"):
    """The 'contam|' md5 5% holdout flag shared by the contamination
    family (doc-level md5 stream, 12 hex chars, mod 20). ``doc_id``
    may be a column name or a Column (e.g. a lambda element var, so
    the flag can evaluate inside array expressions)."""
    c = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    return (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit("contam"), c)),
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


_HOLDOUT_SQL = """CAST(CAST(('0x' || substr(md5('contam|'
               || CAST({d} AS VARCHAR)), 1, 12)) AS UBIGINT)
               % CAST(20 AS UBIGINT) AS BIGINT) = 0"""


# ---------------------------------------------------------------------------
# dq_pooled_cluster_leakage
# ---------------------------------------------------------------------------


def _pooled_leakage_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    hold = _HOLDOUT_SQL.format(d="k.doc_id")
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
    keeper_of AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keeper
      FROM fpt),
    -- image edge endpoints folded to their exact keepers so both arms
    -- pool evidence on the SAME node set (the keeper graph)
    ikedges AS MATERIALIZED (
      SELECT ka.keeper AS u, kb.keeper AS v
      FROM mpairs m
      JOIN keeper_of ka ON m.doc_a = ka.doc_id
      JOIN keeper_of kb ON m.doc_b = kb.doc_id
      WHERE ka.keeper <> kb.keeper
      UNION
      SELECT kb.keeper, ka.keeper
      FROM mpairs m
      JOIN keeper_of ka ON m.doc_a = ka.doc_id
      JOIN keeper_of kb ON m.doc_b = kb.doc_id
      WHERE ka.keeper <> kb.keeper),
    uedges AS MATERIALIZED (
      SELECT u, v FROM edges UNION SELECT u, v FROM ikedges),
    reach_t(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach_t r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    reach_u(u, v) AS (
      SELECT u, v FROM uedges
      UNION
      SELECT r.u, e.v FROM reach_u r JOIN uedges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp_t AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach_t GROUP BY u),
    comp_u AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach_u GROUP BY u),
    lab AS MATERIALIZED (
      SELECT 'text' AS arm, k.doc_id,
             coalesce(c.component, k.keeper) AS cluster,
             {hold} AS is_holdout
      FROM keeper_of k LEFT JOIN comp_t c ON k.keeper = c.doc_id
      UNION ALL
      SELECT 'pooled' AS arm, k.doc_id,
             coalesce(c.component, k.keeper) AS cluster,
             {hold} AS is_holdout
      FROM keeper_of k LEFT JOIN comp_u c ON k.keeper = c.doc_id),
    cl AS MATERIALIZED (
      SELECT arm, cluster,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN is_holdout THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hold,
             CAST(sum(CASE WHEN is_holdout THEN 0 ELSE 1 END)
               AS BIGINT) AS n_train
      FROM lab GROUP BY 1, 2),
    tot AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(n_hold) AS BIGINT) AS n_holdout_docs
      FROM cl GROUP BY 1)
    SELECT c.arm, t.n_clusters,
           CAST(sum(CASE WHEN c.n_hold > 0 AND c.n_train > 0
             THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
           CAST(sum(CASE WHEN c.n_hold > 0 AND c.n_train > 0
             THEN c.n_docs ELSE 0 END) AS BIGINT) AS n_docs_straddling,
           CAST(sum(CASE WHEN c.n_hold > 0 AND c.n_train > 0
             THEN c.n_hold ELSE 0 END) AS BIGINT)
             AS n_holdout_in_straddling,
           t.n_holdout_docs,
           CAST(CASE WHEN t.n_holdout_docs = 0 THEN 0
             ELSE sum(CASE WHEN c.n_hold > 0 AND c.n_train > 0
               THEN c.n_hold ELSE 0 END) * 1000 // t.n_holdout_docs
             END AS BIGINT) AS leak_milli
    FROM cl c JOIN tot t ON c.arm = t.arm
    GROUP BY c.arm, t.n_clusters, t.n_holdout_docs
"""


def _straddle_ledger(lab: DataFrame) -> DataFrame:
    """(arm, doc_id, cluster, is_holdout) -> per-arm straddle ledger;
    the r70 accounting generalized to a bounded arm dim."""
    cl = lab.groupBy("arm", "cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_holdout"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_hold"),
        F.sum(F.when(F.col("is_holdout"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_train"),
    )
    tot = cl.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("n_hold").cast("bigint").alias("n_holdout_docs"),
    )
    s = (F.col("n_hold") > 0) & (F.col("n_train") > 0)
    return (
        cl.withColumn("s", s)
        .join(F.broadcast(tot), "arm")
        .groupBy("arm", "n_clusters", "n_holdout_docs")
        .agg(
            F.sum(F.when(F.col("s"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_straddling"),
            F.sum(F.when(F.col("s"), F.col("n_docs")).otherwise(0))
            .cast("bigint")
            .alias("n_docs_straddling"),
            F.sum(F.when(F.col("s"), F.col("n_hold")).otherwise(0))
            .cast("bigint")
            .alias("n_holdout_in_straddling"),
        )
        .select(
            "arm",
            "n_clusters",
            "n_straddling",
            "n_docs_straddling",
            "n_holdout_in_straddling",
            "n_holdout_docs",
            F.expr(
                "CAST(CASE WHEN n_holdout_docs = 0 THEN 0"
                " ELSE n_holdout_in_straddling * 1000"
                " div n_holdout_docs END AS BIGINT)"
            ).alias("leak_milli"),
        )
    )


@register(
    "dq_pooled_cluster_leakage",
    _pooled_leakage_sql(),
    "cluster-level split leakage under POOLED dedup evidence: the r70 "
    "straddle audit (dq_split_cluster_leakage) run per arm — text "
    "keeper clusters vs clusters over text UNION banded dHash image "
    "edges (endpoints folded to exact keepers, so both arms pool on "
    "the keeper graph). A pooled leak_milli above the text arm is "
    "holdout content reachable from train through IMAGE near-dups "
    "alone — leakage no text detector can see, the audit twin of "
    "dedup_pooled_components' recall argument. Shape: two certified "
    "banded pair lists, keeper fold joins, size-adaptive components "
    "per arm, cluster-keyed hash-aggs over a 2-arm dim — no "
    "all-pairs, no raw-fact windows",
)
def dq_pooled_cluster_leakage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_frames,
    )
    from jigsaw_spark.plans.queries_r6 import mm_phash_near_dup

    docs = _t(spark, sf_dir, "documents")
    # one exact-dedup pass shared by the keeper fold and the pair graph
    ded, kpairs = keeper_frames(docs, "doc_id")
    # ded is already the narrow checkpointed frame (r14) — no private
    # re-checkpoint needed to keep text out of the downstream reads
    keeper_of = ded.select("doc_id", "keeper")
    tpairs = kpairs.localCheckpoint()
    ka = keeper_of.select(
        F.col("doc_id").alias("doc_a"), F.col("keeper").alias("ku")
    )
    kb = keeper_of.select(
        F.col("doc_id").alias("doc_b"), F.col("keeper").alias("kv")
    )
    ipairs = (
        mm_phash_near_dup(spark, sf_dir)
        .select(
            F.col("img_a").cast("bigint").alias("doc_a"),
            F.col("img_b").cast("bigint").alias("doc_b"),
        )
        .join(ka, "doc_a")
        .join(kb, "doc_b")
        .filter(F.col("ku") != F.col("kv"))
        .select(
            F.least("ku", "kv").alias("doc_a"),
            F.greatest("ku", "kv").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint()
    )
    upairs = (
        tpairs.select("doc_a", "doc_b")
        .unionByName(ipairs)
        .distinct()
    )

    def _lab(pairs: DataFrame, arm: str) -> DataFrame:
        comp = connected_components(pairs).select(
            F.col("doc_id").alias("keeper"),
            F.col("component").alias("c0"),
        )
        return keeper_of.join(comp, "keeper", "left").select(
            F.lit(arm).alias("arm"),
            "doc_id",
            F.coalesce("c0", F.col("keeper")).alias("cluster"),
            _holdout_col().alias("is_holdout"),
        )

    lab = _lab(tpairs, "text").unionByName(_lab(upairs, "pooled"))
    return _straddle_ledger(lab)


# ---------------------------------------------------------------------------
# dq_repair_fixpoint
# ---------------------------------------------------------------------------


def _repair_fixpoint_sql() -> str:
    from jigsaw_spark.operators.text import shingles_sql, tokens_sql

    hold = _HOLDOUT_SQL.format(d="doc_id")
    return f"""
    WITH split0 AS MATERIALIZED (
      SELECT doc_id, source, {hold} AS is_holdout,
             {tokens_sql('text')} AS t
      FROM documents),
    dg AS MATERIALIZED (
      SELECT DISTINCT doc_id, unnest({shingles_sql('t', 8)}) AS sh
      FROM split0),
    gdf AS (
      SELECT sh, CAST(count(*) AS BIGINT) AS df FROM dg GROUP BY sh),
    safe AS MATERIALIZED (
      SELECT s.doc_id, s.source
      FROM split0 s LEFT JOIN (
        SELECT g.doc_id, max(d.df) AS mx
        FROM dg g JOIN gdf d ON g.sh = d.sh GROUP BY g.doc_id) m
        ON s.doc_id = m.doc_id
      WHERE coalesce(m.mx, 1) <= 1),
    -- iteration 1
    tsh0 AS (
      SELECT DISTINCT g.sh FROM dg g
      JOIN split0 s ON g.doc_id = s.doc_id WHERE NOT s.is_holdout),
    c0 AS MATERIALIZED (
      SELECT DISTINCT g.doc_id FROM dg g
      JOIN split0 s ON g.doc_id = s.doc_id
      JOIN tsh0 h ON g.sh = h.sh WHERE s.is_holdout),
    pool1 AS (
      SELECT f.doc_id, f.source FROM safe f
      JOIN split0 s ON f.doc_id = s.doc_id WHERE NOT s.is_holdout),
    quota1 AS (
      SELECT s.source,
             CAST(sum(CASE WHEN s.is_holdout AND c.doc_id IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_demote,
             CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pool
      FROM split0 s
      LEFT JOIN c0 c ON s.doc_id = c.doc_id
      LEFT JOIN pool1 p ON s.doc_id = p.doc_id
      GROUP BY s.source),
    prom1 AS MATERIALIZED (
      SELECT r.doc_id, r.source FROM (
        SELECT p.doc_id, p.source,
               row_number() OVER (PARTITION BY p.source
                 ORDER BY md5('repair|' || CAST(p.doc_id AS VARCHAR)),
                          p.doc_id) AS rk
        FROM pool1 p) r
      JOIN quota1 q ON r.source = q.source
      WHERE r.rk <= least(q.n_demote, q.n_pool)),
    split1 AS MATERIALIZED (
      SELECT s.doc_id, s.source,
             CASE WHEN c.doc_id IS NOT NULL THEN FALSE
                  WHEN p.doc_id IS NOT NULL THEN TRUE
                  ELSE s.is_holdout END AS is_holdout
      FROM split0 s
      LEFT JOIN c0 c ON s.doc_id = c.doc_id
      LEFT JOIN prom1 p ON s.doc_id = p.doc_id),
    -- iteration 2 (same operator applied to split1)
    tsh1 AS (
      SELECT DISTINCT g.sh FROM dg g
      JOIN split1 s ON g.doc_id = s.doc_id WHERE NOT s.is_holdout),
    c1 AS MATERIALIZED (
      SELECT DISTINCT g.doc_id FROM dg g
      JOIN split1 s ON g.doc_id = s.doc_id
      JOIN tsh1 h ON g.sh = h.sh WHERE s.is_holdout),
    pool2 AS (
      SELECT f.doc_id, f.source FROM safe f
      JOIN split1 s ON f.doc_id = s.doc_id WHERE NOT s.is_holdout),
    quota2 AS (
      SELECT s.source,
             CAST(sum(CASE WHEN s.is_holdout AND c.doc_id IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_demote,
             CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pool
      FROM split1 s
      LEFT JOIN c1 c ON s.doc_id = c.doc_id
      LEFT JOIN pool2 p ON s.doc_id = p.doc_id
      GROUP BY s.source),
    prom2 AS MATERIALIZED (
      SELECT r.doc_id, r.source FROM (
        SELECT p.doc_id, p.source,
               row_number() OVER (PARTITION BY p.source
                 ORDER BY md5('repair2|' || CAST(p.doc_id AS VARCHAR)),
                          p.doc_id) AS rk
        FROM pool2 p) r
      JOIN quota2 q ON r.source = q.source
      WHERE r.rk <= least(q.n_demote, q.n_pool)),
    split2 AS MATERIALIZED (
      SELECT s.doc_id, s.source,
             CASE WHEN c.doc_id IS NOT NULL THEN FALSE
                  WHEN p.doc_id IS NOT NULL THEN TRUE
                  ELSE s.is_holdout END AS is_holdout
      FROM split1 s
      LEFT JOIN c1 c ON s.doc_id = c.doc_id
      LEFT JOIN prom2 p ON s.doc_id = p.doc_id),
    tsh2 AS (
      SELECT DISTINCT g.sh FROM dg g
      JOIN split2 s ON g.doc_id = s.doc_id WHERE NOT s.is_holdout),
    c2 AS MATERIALIZED (
      SELECT DISTINCT g.doc_id FROM dg g
      JOIN split2 s ON g.doc_id = s.doc_id
      JOIN tsh2 h ON g.sh = h.sh WHERE s.is_holdout)
    SELECT s.source,
           CAST(sum(CASE WHEN s.is_holdout AND a.doc_id IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS contam_r0,
           CAST(sum(CASE WHEN s1.is_holdout AND b.doc_id IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS contam_r1,
           CAST(sum(CASE WHEN s2.is_holdout AND c.doc_id IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS contam_r2,
           CAST(sum(CASE WHEN p1.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS promoted_r1,
           CAST(sum(CASE WHEN p2.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS promoted_r2,
           (sum(CASE WHEN s.is_holdout AND a.doc_id IS NOT NULL
             THEN 1 ELSE 0 END)
            >= sum(CASE WHEN s1.is_holdout AND b.doc_id IS NOT NULL
             THEN 1 ELSE 0 END))
           AND (sum(CASE WHEN s1.is_holdout AND b.doc_id IS NOT NULL
             THEN 1 ELSE 0 END)
            >= sum(CASE WHEN s2.is_holdout AND c.doc_id IS NOT NULL
             THEN 1 ELSE 0 END)) AS monotone
    FROM split0 s
    JOIN split1 s1 ON s.doc_id = s1.doc_id
    JOIN split2 s2 ON s.doc_id = s2.doc_id
    LEFT JOIN c0 a ON s.doc_id = a.doc_id
    LEFT JOIN c1 b ON s.doc_id = b.doc_id
    LEFT JOIN c2 c ON s.doc_id = c.doc_id
    LEFT JOIN prom1 p1 ON s.doc_id = p1.doc_id
    LEFT JOIN prom2 p2 ON s.doc_id = p2.doc_id
    GROUP BY s.source
"""


@register(
    "dq_repair_fixpoint",
    _repair_fixpoint_sql(),
    "convergence proof of the executed split repair: apply "
    "dq_split_repair's demote-contaminated + promote-provably-safe "
    "operator TWICE and report the 8-gram contamination residual at "
    "iterations 0/1/2 per source, the promotion volumes, and a "
    "monotone flag (r0 >= r1 >= r2). dq_repair_residual showed round "
    "1's sideways leak (demoted grams newly contaminate other holdout "
    "docs); this answers whether the repair loop CONVERGES — the "
    "residual shrinking monotonically is the termination argument for "
    "running repair-until-clean on a real corpus. Shape: ONE distinct "
    "(doc, gram) relation serves all six contamination/df consumers; "
    "promotions rank inside (source, md5-band) partitions on the "
    "Spark side (oracle uses the plain per-source row_number — ranks "
    "identical by the queries_r20 banding proof); each iteration is "
    "two semi-joins + one hash-agg over the gram relation",
)
def dq_repair_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    # The round-0 holdout flag is a pure md5 expression of doc_id, so it
    # rides the gram explode inline (the dq_leak_detector_overlap form);
    # later rounds' flags differ from round 0 only on the small
    # demote/promote sets, which join as BROADCAST markers — the gram
    # relation is never shuffled by doc_id (it used to be, once per
    # round), and the doc-level split tables become expressions over
    # base + markers instead of checkpointed join chains (guide §2.4,
    # §3.1; marker volume is bounded by the contamination count, which
    # is what makes the broadcast scale-safe at 100 TB).
    def _grams(frame: DataFrame, *extra: str) -> DataFrame:
        return frame.select(
            "doc_id",
            _holdout_col().alias("h0"),
            *extra,
            F.explode(
                shingles_expr(tokens_expr("text"), 8)
            ).alias("sh"),
        )

    # ONE full pass over the corpus for the whole fixpoint: the gram
    # explode feeds the (sh) hash-agg's map side directly (an
    # intermediate localCheckpoint of the 2.5M-row exploded relation
    # measured 3.4 s of pure serialization — fusing it away is the
    # win). Per gram: the distinct doc posting (for df/safe), the
    # round-0 train count and the round-0 holdout docs. Later rounds'
    # per-gram state is derived INCREMENTALLY from this relation —
    # only grams containing a changed (demoted/promoted) doc can
    # change, and those deltas are bounded by the repair volume, so
    # each round is a broadcast-delta map-pass over g0 instead of a
    # full re-aggregation (guide §2.4).
    g0 = (
        _grams(docs)
        .groupBy("sh")
        # ONE collect_set: the holdout flag is a pure md5 expression of
        # doc_id, so the per-gram holdout subset derives by FILTERING
        # the doc array post-agg — the agg buffer and its shuffle
        # partials carry one set instead of two overlapping ones (r14)
        .agg(F.collect_set("doc_id").alias("_ds"))
        .withColumn(
            "hd0", F.filter(F.col("_ds"), lambda d: _holdout_col(d))
        )
        # distinct train docs = distinct docs minus distinct holdout docs
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
    base = docs.select(
        "doc_id", "source", _holdout_col().alias("h0")
    )
    safe = (
        base.select("doc_id", "source")
        .join(doc_max, "doc_id", "left")
        .filter(F.coalesce("mx", F.lit(1)) <= 1)
        .select("doc_id", "source")
        .localCheckpoint(eager=False)
    )

    def _mark(df: DataFrame, sets: list[tuple[DataFrame, str]]) -> DataFrame:
        """LEFT-join each small (doc_id) set as a broadcast 1-marker."""
        for s, m in sets:
            df = df.join(
                F.broadcast(s.select("doc_id").withColumn(m, F.lit(1))),
                "doc_id",
                "left",
            )
        return df

    def _contam(
        demoted: DataFrame | None, promoted: DataFrame | None
    ) -> DataFrame:
        """Distinct contaminated holdout doc_ids under the round's
        flags, derived incrementally from g0: per gram, the train
        count moves by |demoted ∩ gram| − |promoted ∩ gram| and the
        holdout set loses the demoted and gains the promoted members.
        The delta relation only covers grams containing a changed doc
        (broadcast semi-join of dg against the bounded change sets),
        so each round is a map-pass over g0 plus a tiny explode —
        never a second full (sh) aggregation."""
        if demoted is None:
            return (
                g0.filter(F.col("nt0") > 0)
                .select(F.explode("hd0").alias("doc_id"))
                .distinct()
                .localCheckpoint(eager=False)
            )
        # grams of the changed docs only: ONE broadcast inner join of
        # the bounded change sets into a re-scan BEFORE the explode —
        # the join is also the filter, so the delta explode runs over
        # dozens of docs, not the corpus
        changed = demoted.select(
            "doc_id", F.lit(True).alias("_isd")
        ).unionByName(
            promoted.select("doc_id", F.lit(False).alias("_isd"))
        )
        ch = _grams(
            docs.join(F.broadcast(changed), "doc_id"), "_isd"
        )
        delta = ch.groupBy("sh").agg(
            F.collect_set(
                F.when(F.col("_isd"), F.col("doc_id"))
            ).alias("dd"),
            F.collect_set(
                F.when(~F.col("_isd"), F.col("doc_id"))
            ).alias("pd"),
        )
        upd = g0.join(F.broadcast(delta), "sh", "left").select(
            (
                F.col("nt0")
                + F.coalesce(F.size("dd"), F.lit(0))
                - F.coalesce(F.size("pd"), F.lit(0))
            ).alias("nt"),
            # dd/pd are NULL together exactly when the gram has no
            # changed doc (left-join miss) — keep hd0 untouched then
            F.when(F.col("dd").isNull(), F.col("hd0"))
            .otherwise(
                F.concat(F.array_except("hd0", "dd"), F.col("pd"))
            )
            .alias("hd"),
        )
        return (
            upd.filter((F.col("nt") > 0) & (F.size("hd") > 0))
            .select(F.explode("hd").alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=False)
        )

    def _promote(
        flags: DataFrame, contam: DataFrame, salt: str
    ) -> DataFrame:
        """md5-first promotion of least(demote, pool) safe train docs
        per source — banded rank, bit-identical to the oracle's plain
        per-source row_number (queries_r20 proof). ``flags`` carries
        (doc_id, source, h) for the round."""
        from pyspark.sql import Window

        from jigsaw_spark.functions.hashing import md5_key

        pool = safe.join(
            flags.filter(~F.col("h")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        # quota from two tiny aggregates instead of a 3-way join over
        # the full doc table: contaminated docs are holdout under the
        # round's flags by construction, so n_demote is just their
        # per-source count; sources absent from the pool produce no
        # ranked rows, so pool-side grouping loses nothing
        ndem = (
            flags.join(
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
        keyed = pool.withColumn(
            "_h", md5_key(F.col("doc_id"), seed=salt)
        ).withColumn("_band", F.substring("_h", 1, 2))
        bcounts = keyed.groupBy("source", "_band").agg(
            F.count(F.lit(1)).alias("_c")
        )
        wb = (
            Window.partitionBy("source")
            .orderBy("_band")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = bcounts.withColumn(
            "_off", F.coalesce(F.sum("_c").over(wb), F.lit(0))
        ).select("source", "_band", "_off")
        win = Window.partitionBy("source", "_band").orderBy(
            "_h", "doc_id"
        )
        ranked = (
            keyed.withColumn("_rk", F.row_number().over(win))
            .join(F.broadcast(offsets), ["source", "_band"])
            .select(
                "doc_id",
                "source",
                (F.col("_rk") + F.col("_off")).alias("rk"),
            )
        )
        return (
            ranked.join(F.broadcast(quota), "source")
            .filter(
                F.col("rk") <= F.least(F.col("n_demote"), F.col("n_pool"))
            )
            .select("doc_id", "source")
            .localCheckpoint(eager=False)
        )

    def _flags(sets: list[tuple[DataFrame, str]], h) -> DataFrame:
        return _mark(base, sets).select(
            "doc_id", "source", h.alias("h")
        )

    # The demote/promote sets are pairwise DISJOINT and non-reverting
    # by construction — promoted docs are safe (every gram df ≤ 1) and
    # so can never be contaminated/demoted; demoted docs share a gram
    # with train (df ≥ 2) and so can never be safe/promoted; demotes
    # draw from round-0 holdout, promotes from round-0 train — so the
    # cumulative change sets reproduce the sequential _apply chain.
    c0 = _contam(None, None)
    prom1 = _promote(
        base.select("doc_id", "source", F.col("h0").alias("h")),
        c0,
        "repair",
    )
    h1x = (
        F.when(F.col("_c0").isNotNull(), F.lit(False))
        .when(F.col("_p1").isNotNull(), F.lit(True))
        .otherwise(F.col("h0"))
    )
    c1 = _contam(c0, prom1)
    prom2 = _promote(
        _flags([(c0, "_c0"), (prom1, "_p1")], h1x), c1, "repair2"
    )
    c2 = _contam(
        c0.select("doc_id").unionByName(c1.select("doc_id")),
        prom1.select("doc_id").unionByName(prom2.select("doc_id")),
    )

    j = _mark(
        base,
        [
            (c0, "_c0"),
            (prom1, "_p1"),
            (c1, "_c1"),
            (prom2, "_p2"),
            (c2, "_c2"),
        ],
    )
    h1 = (
        F.when(F.col("_c0").isNotNull(), F.lit(False))
        .when(F.col("_p1").isNotNull(), F.lit(True))
        .otherwise(F.col("h0"))
    )
    h2 = (
        F.when(F.col("_c1").isNotNull(), F.lit(False))
        .when(F.col("_p2").isNotNull(), F.lit(True))
        .otherwise(h1)
    )
    agg = j.groupBy("source").agg(
        F.sum(
            F.when(F.col("h0") & F.col("_c0").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("contam_r0"),
        F.sum(F.when(h1 & F.col("_c1").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("contam_r1"),
        F.sum(F.when(h2 & F.col("_c2").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("contam_r2"),
        F.sum(F.when(F.col("_p1").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("promoted_r1"),
        F.sum(F.when(F.col("_p2").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("promoted_r2"),
    )
    return agg.select(
        "source",
        "contam_r0",
        "contam_r1",
        "contam_r2",
        "promoted_r1",
        "promoted_r2",
        (
            (F.col("contam_r0") >= F.col("contam_r1"))
            & (F.col("contam_r1") >= F.col("contam_r2"))
        ).alias("monotone"),
    )


# ---------------------------------------------------------------------------
# mm_phash_threshold_purity
# ---------------------------------------------------------------------------


def _threshold_purity_sql() -> str:
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    arms = []
    labs = []
    for t in _PURITY_THRESHOLDS:
        arms.append(f"""
    edges_{t} AS (
      SELECT ia AS u, ib AS v FROM ham WHERE hamming <= {t}
      UNION SELECT ib, ia FROM ham WHERE hamming <= {t}),
    reach_{t}(u, v) AS (
      SELECT u, v FROM edges_{t}
      UNION
      SELECT r.u, e.v FROM reach_{t} r JOIN edges_{t} e ON r.v = e.u
      WHERE e.v <> r.u),
    comp_{t} AS (
      SELECT u AS img, least(u, min(v)) AS component
      FROM reach_{t} GROUP BY u)""")
        labs.append(f"""
      SELECT {t} AS threshold,
             coalesce(c.component, un.img) AS component, d.source
      FROM universe un
      LEFT JOIN comp_{t} c ON un.img = c.img
      JOIN documents d ON un.img = d.doc_id""")
    return f"""
    WITH RECURSIVE {_PHASH_BYTES_CTE.strip()},
    mcand AS (
      SELECT DISTINCT x.i AS ia, y.i AS ib
      FROM ph_bytes x
      JOIN ph_bytes y ON x.byte_idx = y.byte_idx
                     AND x.byte_val = y.byte_val AND x.i < y.i),
    ham AS MATERIALIZED (
      SELECT c.ia, c.ib,
             CAST(sum(bit_count(xor(x.byte_val, y.byte_val)))
               AS BIGINT) AS hamming
      FROM mcand c
      JOIN ph_bytes x ON x.i = c.ia
      JOIN ph_bytes y ON y.i = c.ib AND y.byte_idx = x.byte_idx
      GROUP BY 1, 2),
    universe AS (SELECT DISTINCT i AS img FROM ph_bytes),
    {','.join(arms)},
    lab AS MATERIALIZED ({' UNION ALL '.join(labs)}),
    per_cs AS (
      SELECT threshold, component, source,
             CAST(count(*) AS BIGINT) AS c
      FROM lab GROUP BY 1, 2, 3),
    cl AS (
      SELECT threshold, component,
             CAST(sum(c) AS BIGINT) AS sz,
             CAST(count(*) AS BIGINT) AS n_sources,
             CAST(max(c) AS BIGINT) AS maj
      FROM per_cs GROUP BY 1, 2)
    SELECT CAST(threshold AS INT) AS threshold,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_multi_source,
           CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS multi_milli,
           CAST(sum(maj) * 1000 // sum(sz) AS BIGINT)
             AS majority_mass_milli
    FROM cl GROUP BY threshold
"""


@register(
    "mm_phash_threshold_purity",
    _threshold_purity_sql(),
    "the r70 threshold sweep JOINED with mm_phash_cluster_sources' "
    "purity view: per dHash Hamming threshold {0, 2, 4, 6}, the image "
    "cluster count (singletons kept), multi-source cluster count and "
    "share, and the majority-source mass — the table that prices a "
    "threshold not by pair volume (the sweep) but by what it does to "
    "cluster PURITY: the threshold where clusters start fusing across "
    "sources is where image dedup stops removing syndication and "
    "starts merging distinct assets. Shape: the banded candidate join "
    "+ hamming agg computed ONCE, per-arm size-adaptive components "
    "over the filtered pair list, one source join against the "
    "documents dim, bounded 4-row output",
)
def mm_phash_threshold_purity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import connected_components
    from jigsaw_spark.plans.queries_r6 import _phash_ham_pairs

    docs = _t(spark, sf_dir, "documents")
    # shared bucket-form prelude (ONE kernel pass — the old self-join
    # formulation ran the synth+decode kernel 4x; see mm_phash_near_dup)
    ham = _phash_ham_pairs(spark, sf_dir).localCheckpoint()
    # the id universe IS the synth filter (one image per doc_id % 10 ==
    # 0 row; phash_dhash never drops a row) — no kernel pass to list it
    universe = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("img"), "source")
        .localCheckpoint()
    )
    out = []
    for t in _PURITY_THRESHOLDS:
        pairs = ham.filter(F.col("hamming") <= t).select(
            F.col("ia").alias("doc_a"), F.col("ib").alias("doc_b")
        )
        comp = connected_components(pairs).select(
            F.col("doc_id").alias("img"),
            F.col("component").alias("c0"),
        )
        lab = universe.join(comp, "img", "left").select(
            F.coalesce("c0", F.col("img")).alias("component"),
            "source",
        )
        per_cs = lab.groupBy("component", "source").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        cl = per_cs.groupBy("component").agg(
            F.sum("c").cast("bigint").alias("sz"),
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
            F.max("c").cast("bigint").alias("maj"),
        )
        out.append(
            cl.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
                F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_multi_source"),
                F.sum("maj").cast("bigint").alias("maj_mass"),
                F.sum("sz").cast("bigint").alias("tot_mass"),
            ).select(
                F.lit(t).cast("int").alias("threshold"),
                "n_clusters",
                "n_multi_source",
                F.expr(
                    "CAST(n_multi_source * 1000 div n_clusters"
                    " AS BIGINT)"
                ).alias("multi_milli"),
                F.expr(
                    "CAST(maj_mass * 1000 div tot_mass AS BIGINT)"
                ).alias("majority_mass_milli"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------------------
# ann_recall_under_dedup
# ---------------------------------------------------------------------------


def _recall_under_dedup_sql() -> str:
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
    clust AS MATERIALIZED (
      SELECT k.doc_id, coalesce(c.component, k.keeper) AS cluster
      FROM keeper_of k LEFT JOIN comp c ON k.keeper = c.doc_id),
    surv AS MATERIALIZED (
      SELECT doc_id FROM clust WHERE doc_id = cluster),
    q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5),
    truth AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(
                   q.qv, c.embedding::DOUBLE[]), 9) DESC, c.vec_id)
                 AS rank
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id) t
      WHERE rank <= 10),
    after AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(
                   q.qv, c.embedding::DOUBLE[]), 9) DESC, c.vec_id)
                 AS rank
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        JOIN surv s ON c.vec_id = s.doc_id) t
      WHERE rank <= 10),
    tl AS (
      SELECT t.query_id, t.vec_id,
             s.doc_id IS NOT NULL AS kept, cl.cluster AS rep
      FROM truth t
      LEFT JOIN surv s ON t.vec_id = s.doc_id
      JOIN clust cl ON t.vec_id = cl.doc_id),
    rh AS (
      SELECT DISTINCT tl.query_id, tl.vec_id
      FROM tl JOIN after a
        ON a.query_id = tl.query_id AND a.vec_id = tl.rep
      WHERE NOT tl.kept)
    SELECT CAST(tl.query_id AS BIGINT) AS query_id,
           CAST(count(*) AS BIGINT) AS n_truth,
           CAST(sum(CASE WHEN tl.kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN tl.kept THEN 0 ELSE 1 END) AS BIGINT)
             AS n_lost,
           CAST(sum(CASE WHEN NOT tl.kept AND r.vec_id IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_lost_rep,
           CAST(sum(CASE WHEN tl.kept THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS recall_milli,
           CAST((sum(CASE WHEN tl.kept THEN 1 ELSE 0 END)
             + sum(CASE WHEN NOT tl.kept AND r.vec_id IS NOT NULL
               THEN 1 ELSE 0 END)) * 1000 // count(*) AS BIGINT)
             AS rep_recall_milli
    FROM tl LEFT JOIN rh r
      ON tl.query_id = r.query_id AND tl.vec_id = r.vec_id
    GROUP BY tl.query_id
"""


@register(
    "ann_recall_under_dedup",
    _recall_under_dedup_sql(),
    "retrieval under keeper collapse — does dedup hurt search: for "
    "the 5-query eval panel, the brute-force cosine top-10 over the "
    "FULL corpus (truth) vs the top-10 over the SURVIVOR corpus "
    "(docs equal to their near-dup cluster id, the p_leakage_safe_"
    "split keeper convention on the vec_id==doc_id identity). "
    "Reports per query: truth neighbors kept, lost, and lost-but-"
    "REPRESENTED (the lost neighbor's cluster keeper ranks in the "
    "collapsed top-10) — rep_recall above recall is the cluster-"
    "representative argument that keeper collapse preserves "
    "retrieval semantics even as it drops vectors. Shape: the keeper "
    "machinery's banded pairs + components, two Arrow top-k corpus "
    "scans with the 5-row broadcast panel, hash joins on the "
    "k-bounded rank tables",
)
def ann_recall_under_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_frames,
    )
    from jigsaw_spark.operators.similarity import cosine_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    # one exact-dedup pass shared by the keeper fold and the pair graph
    ded, kpairs = keeper_frames(docs, "doc_id")
    keeper_of = ded.select("doc_id", "keeper")
    comp = connected_components(
        kpairs.localCheckpoint()
    ).select(
        F.col("doc_id").alias("keeper"),
        F.col("component").alias("c0"),
    )
    clust = (
        keeper_of.join(comp, "keeper", "left")
        .select(
            "doc_id",
            F.coalesce("c0", F.col("keeper")).alias("cluster"),
        )
        .localCheckpoint()
    )
    surv = clust.filter(F.col("doc_id") == F.col("cluster")).select(
        F.col("doc_id").alias("vec_id")
    )
    panel = emb.filter(F.col("vec_id") < 5)
    truth = cosine_topk(emb, panel, k=10).select(
        "query_id", "vec_id"
    )
    after = (
        cosine_topk(emb.join(surv, "vec_id", "left_semi"), panel, k=10)
        .select(
            F.col("query_id").alias("aq"),
            F.col("vec_id").alias("av"),
        )
        .localCheckpoint()
    )
    tl = (
        truth.join(
            surv.withColumn("s", F.lit(1)), "vec_id", "left"
        )
        .join(
            clust.select(
                F.col("doc_id").alias("vec_id"),
                F.col("cluster").alias("rep"),
            ),
            "vec_id",
        )
        .select(
            "query_id",
            "vec_id",
            F.col("s").isNotNull().alias("kept"),
            "rep",
        )
    )
    rh = (
        tl.filter(~F.col("kept"))
        .join(
            after,
            (tl["query_id"] == after["aq"])
            & (tl["rep"] == after["av"]),
            "left_semi",
        )
        .select("query_id", "vec_id")
        .distinct()
        .withColumn("rhit", F.lit(1))
    )
    return (
        tl.join(rh, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_truth"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("kept"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_lost"),
            F.sum(
                F.when(
                    ~F.col("kept") & F.col("rhit").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_lost_rep"),
        )
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            "n_truth",
            "n_kept",
            "n_lost",
            "n_lost_rep",
            F.expr(
                "CAST(n_kept * 1000 div n_truth AS BIGINT)"
            ).alias("recall_milli"),
            F.expr(
                "CAST((n_kept + n_lost_rep) * 1000 div n_truth"
                " AS BIGINT)"
            ).alias("rep_recall_milli"),
        )
    )
