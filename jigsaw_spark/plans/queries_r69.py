"""Round-12 batch 4: cluster-level curation loss and the epoch
schedule —

- ``curation_cluster_extinction``: dedup clusters are CONTENT groups;
  a quality gate that drops every member of a cluster erases that
  content from the corpus entirely (extinction), while dropping some
  members of a surviving cluster only removes redundancy. Per
  near-dup cluster size: cluster count, extinct count (no member
  passes the v1 gate battery), the extinction rate, and the docs
  erased with them — the content-loss audit that doc-level keep
  rates (curation_gate_attribution) cannot see.
- ``p_epoch_schedule``: the data-constrained-scaling table — under a
  temperature-scaled mixture (alpha=0.7, the mT5/data-mixing
  standard), rare sources are upweighted until their target EXCEEDS
  their cap, i.e. they repeat for multiple epochs. Per source: the
  temperature weight (integer micro, one exp/ln libm pair), the
  largest-remainder target, the implied epochs (milli), the 4-epoch
  repetition ceiling flag (returns diminish sharply past ~4 epochs
  of repeated data), the clipped target and the surplus the ceiling
  frees for redistribution.

Scale notes (100 TB): extinction reuses the shared keeper graph +
size-adaptive components with a map-only 4-gate projection and two
hash-agg rollups (cluster, then size histogram); the epoch schedule
is a |sources|-row dim computation over broadcast scalars — the
p_token_budget_mix shape with a temperature base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# curation_cluster_extinction
# ---------------------------------------------------------------------------


def _cluster_extinction_sql() -> str:
    from jigsaw_spark.operators.text import (
        alnum_ratio_sql,
        lang_hits_sql,
        lang_predict_sql,
        shingles_sql,
    )
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
    gate AS MATERIALIZED (
      SELECT k.doc_id,
             (NOT (len(k.t) < 20)
              AND NOT ({alnum_ratio_sql('d.text')} < 0.5)
              AND NOT ({lang_predict_sql(
                  f"CAST({lang_hits_sql('k.t', 'en')} AS INT)",
                  f"CAST({lang_hits_sql('k.t', 'es')} AS INT)",
                  f"CAST({lang_hits_sql('k.t', 'fr')} AS INT)",
              )} <> 'en')
              AND NOT (len(k.t) >= 3 AND
                2 * (len({shingles_sql('k.t', 3)})
                     - len(list_distinct({shingles_sql('k.t', 3)})))
                > len({shingles_sql('k.t', 3)}))) AS pass
      FROM ktoks k JOIN documents d ON k.doc_id = d.doc_id),
    lab AS (
      SELECT g.doc_id, coalesce(c.component, g.doc_id) AS component,
             g.pass
      FROM gate g LEFT JOIN comp c ON g.doc_id = c.doc_id),
    cl AS MATERIALIZED (
      SELECT component, CAST(count(*) AS BIGINT) AS sz,
             CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass
      FROM lab GROUP BY 1)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN n_pass = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_extinct,
           CAST(sum(CASE WHEN n_pass = 0 THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS extinct_milli,
           CAST(sz * sum(CASE WHEN n_pass = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS docs_erased
    FROM cl GROUP BY sz
"""


@register(
    "curation_cluster_extinction",
    _cluster_extinction_sql(),
    "cluster-level content loss of the v1 curation battery (min 20 "
    "tokens, alnum >= 0.5, lang = 'en', Gopher repetition — the exact "
    "curation_gate_attribution predicates): dedup clusters are "
    "CONTENT groups, so a gate that fails every member of a cluster "
    "erases that content entirely (extinction) while partial drops "
    "only remove redundancy. Per cluster size over the exact-keeper "
    "universe (near-dup components, unpaired keepers singleton): "
    "cluster count, extinct count, extinction rate, docs erased. "
    "Doc-level keep rates cannot distinguish trimming a cluster from "
    "erasing it — this can. Shape: shared keeper graph + "
    "size-adaptive components, map-only 4-gate projection, two "
    "hash-agg rollups (cluster then size histogram)",
)
def curation_cluster_extinction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_frames,
    )
    from jigsaw_spark.operators.text import (
        alnum_ratio_expr,
        lang_hits_expr,
        lang_predict_expr,
        shingles_expr,
        tokens_expr,
    )

    docs = _t(spark, sf_dir, "documents")
    # one exact-dedup pass shared by the gate universe and the pair graph
    # (with_text: the gate reads keeper text downstream)
    ded, kpairs = keeper_frames(docs, "doc_id", with_text=True)
    keepers = (
        ded.filter(~F.col("is_dup"))
        .select("doc_id", "text")
        .withColumn("t", tokens_expr("text"))
    )
    grams = shingles_expr("t", 3)
    gate = keepers.select(
        "doc_id",
        (
            ~(F.size("t") < 20)
            & ~(alnum_ratio_expr("text") < 0.5)
            & ~(
                lang_predict_expr(
                    lang_hits_expr("t", "en"),
                    lang_hits_expr("t", "es"),
                    lang_hits_expr("t", "fr"),
                )
                != "en"
            )
            & ~(
                (F.size("t") >= 3)
                & (
                    2
                    * (F.size(grams) - F.size(F.array_distinct(grams)))
                    > F.size(grams)
                )
            )
        ).alias("pass"),
    )
    comp = connected_components(
        kpairs.localCheckpoint()
    ).select("doc_id", F.col("component").alias("c0"))
    lab = gate.join(comp, "doc_id", "left").select(
        F.coalesce("c0", F.col("doc_id")).alias("component"),
        "pass",
    )
    cl = lab.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
    )
    return cl.groupBy("sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum(F.when(F.col("n_pass") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_extinct"),
    ).select(
        F.col("sz").cast("bigint").alias("cluster_size"),
        "n_clusters",
        "n_extinct",
        F.expr(
            "CAST(n_extinct * 1000 div n_clusters AS BIGINT)"
        ).alias("extinct_milli"),
        (F.col("sz") * F.col("n_extinct"))
        .cast("bigint")
        .alias("docs_erased"),
    )


# ---------------------------------------------------------------------------
# p_epoch_schedule
# ---------------------------------------------------------------------------


def _epoch_schedule_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH src AS MATERIALIZED (
      SELECT source,
             CAST(sum(len({tokens_sql('text')})) AS BIGINT) AS cap
      FROM documents GROUP BY 1),
    wt AS MATERIALIZED (
      SELECT source, cap,
             CAST(CASE WHEN cap = 0 THEN 0
               ELSE round(exp(0.7 * ln(cap)), 0) * 1000000
               END AS BIGINT) AS w
      FROM src),
    tot AS (
      SELECT CAST(sum(cap) AS BIGINT) AS total,
             CAST(sum(w) AS BIGINT) AS tw
      FROM wt),
    b AS (SELECT CAST(total * 9 // 10 AS BIGINT) AS budget FROM tot),
    base AS MATERIALIZED (
      SELECT s.source, s.cap, s.w,
             CAST(CASE WHEN t.tw = 0 THEN 0
               ELSE b.budget * s.w // t.tw END AS BIGINT) AS base,
             CAST(CASE WHEN t.tw = 0 THEN 0
               ELSE b.budget * s.w % t.tw END AS BIGINT) AS rem
      FROM wt s CROSS JOIN tot t CROSS JOIN b),
    lo AS (
      SELECT CAST(max(b.budget) - sum(base) AS BIGINT) AS leftover
      FROM base CROSS JOIN b),
    tgt AS (
      SELECT source, cap, w,
             CAST(base + CASE WHEN row_number() OVER
               (ORDER BY rem DESC, source) <= (SELECT leftover FROM lo)
               THEN 1 ELSE 0 END AS BIGINT) AS target
      FROM base)
    SELECT source,
           CAST(cap AS BIGINT) AS cap_tokens,
           CAST(w AS BIGINT) AS weight_micro,
           target AS target_tokens,
           CAST(CASE WHEN cap = 0 THEN 0
             ELSE target * 1000 // cap END AS BIGINT) AS epochs_milli,
           CASE WHEN cap = 0 THEN FALSE
             ELSE target * 1000 // cap > 4000 END AS over_limit,
           CAST(least(target, 4 * cap) AS BIGINT) AS clipped_tokens,
           CAST(target - least(target, 4 * cap) AS BIGINT)
             AS surplus_tokens
    FROM tgt
"""


@register(
    "p_epoch_schedule",
    _epoch_schedule_sql(),
    "the data-constrained-scaling table: a temperature-scaled mixture "
    "(alpha=0.7 — weight = cap^0.7, integer micro via ONE exp/ln "
    "libm pair per source row, the NB/DSIR float discipline) "
    "upweights rare sources until their largest-remainder target "
    "EXCEEDS their cap, i.e. they repeat for multiple epochs. Per "
    "source: cap, weight, target, implied epochs (milli), the "
    "4-epoch repetition ceiling flag (returns from repeated data "
    "diminish sharply past ~4 epochs), the clipped target, and the "
    "surplus the ceiling frees. p_temperature_mixture draws a "
    "temperature SAMPLE; p_token_budget_mix water-fills raw caps; "
    "this prices the REPETITION a temperature mix implies — the "
    "table read before committing a mixture to a training run. "
    "Shape: one tokenize hash-agg to the |sources| dim, seat "
    "arithmetic over broadcast scalars, one rank window over the "
    "bounded dim",
)
def p_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    src = (
        docs.select(
            "source", F.size(tokens_expr("text")).alias("ntok")
        )
        .groupBy("source")
        .agg(F.sum("ntok").cast("bigint").alias("cap"))
    )
    wt = src.select(
        "source",
        "cap",
        # weight snapped to INTEGER units of cap^0.7 BEFORE the micro
        # scaling (advisor r12 #1): the raw exp(0.7*ln(cap)) differs
        # between DuckDB's libm and the JVM's Math.exp by at most one
        # ulp (~1e-12 relative); snapping on the unit grid leaves a
        # ~1e-12 flip window instead of ~1e-6 on the micro grid, so a
        # platform libm divergence cannot realistically flip the seat
        # ranks. The libm-parity assumption is thereby bounded, not
        # assumed.
        F.expr(
            "CAST(CASE WHEN cap = 0 THEN 0"
            " ELSE round(exp(0.7 * ln(cap)), 0) * 1000000"
            " END AS BIGINT)"
        ).alias("w"),
    ).localCheckpoint()
    tot = wt.agg(
        F.sum("cap").cast("bigint").alias("total"),
        F.sum("w").cast("bigint").alias("tw"),
    )
    b = tot.select(
        F.expr("CAST(total * 9 div 10 AS BIGINT)").alias("budget"),
        "tw",
    )
    base = wt.crossJoin(F.broadcast(b)).select(
        "source",
        "cap",
        "w",
        F.expr(
            "CAST(CASE WHEN tw = 0 THEN 0"
            " ELSE budget * w div tw END AS BIGINT)"
        ).alias("base"),
        F.expr(
            "CAST(CASE WHEN tw = 0 THEN 0"
            " ELSE budget * w % tw END AS BIGINT)"
        ).alias("rem"),
        "budget",
    )
    lo = base.agg(
        (F.max("budget") - F.sum("base")).cast("bigint").alias("lo")
    )
    w = Window.orderBy(F.desc("rem"), F.col("source"))
    tgt = (
        base.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(lo))
        .select(
            "source",
            "cap",
            "w",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("lo"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("target"),
        )
    )
    return tgt.select(
        "source",
        F.col("cap").cast("bigint").alias("cap_tokens"),
        F.col("w").cast("bigint").alias("weight_micro"),
        F.col("target").alias("target_tokens"),
        F.expr(
            "CAST(CASE WHEN cap = 0 THEN 0"
            " ELSE target * 1000 div cap END AS BIGINT)"
        ).alias("epochs_milli"),
        F.expr(
            "CASE WHEN cap = 0 THEN FALSE"
            " ELSE target * 1000 div cap > 4000 END"
        ).alias("over_limit"),
        F.expr("CAST(least(target, 4 * cap) AS BIGINT)").alias(
            "clipped_tokens"
        ),
        F.expr(
            "CAST(target - least(target, 4 * cap) AS BIGINT)"
        ).alias("surplus_tokens"),
    )


# ---------------------------------------------------------------------------
# curation_gate_by_source (batch 5 — appended to the in-window module;
# window membership is governed by _R12_NEW in plans/queries)
# ---------------------------------------------------------------------------


def _gate_by_source_sql() -> str:
    from jigsaw_spark.operators.text import (
        alnum_ratio_sql,
        lang_hits_sql,
        lang_predict_sql,
        shingles_sql,
        tokens_sql,
    )

    return f"""
    WITH toks AS (
      SELECT doc_id, source, {tokens_sql('text')} AS t,
             {alnum_ratio_sql('text')} AS alnum
      FROM documents),
    flags AS MATERIALIZED (
      SELECT source,
             len(t) < 20 AS f_len,
             alnum < 0.5 AS f_alnum,
             {lang_predict_sql(
                 f"CAST({lang_hits_sql('t', 'en')} AS INT)",
                 f"CAST({lang_hits_sql('t', 'es')} AS INT)",
                 f"CAST({lang_hits_sql('t', 'fr')} AS INT)",
             )} <> 'en' AS f_lang,
             len(t) >= 3 AND
               2 * (len({shingles_sql('t', 3)})
                    - len(list_distinct({shingles_sql('t', 3)})))
               > len({shingles_sql('t', 3)}) AS f_rep
      FROM toks)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN NOT f_len AND NOT f_alnum AND NOT f_lang
             AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_len,
           CAST(sum(CASE WHEN f_alnum THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_alnum,
           CAST(sum(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_lang,
           CAST(sum(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT)
             AS fail_rep,
           CAST(sum(CASE WHEN NOT f_len AND NOT f_alnum AND NOT f_lang
             AND NOT f_rep THEN 1 ELSE 0 END) * 1000 // count(*)
             AS BIGINT) AS pass_milli
    FROM flags GROUP BY source
"""


@register(
    "curation_gate_by_source",
    _gate_by_source_sql(),
    "per-source quality-gate attribution — the 'drop this source?' "
    "table: for each source, docs, battery passes, per-rule fail "
    "counts (the exact curation_gate_attribution predicates: min 20 "
    "tokens, alnum >= 0.5, lang-predict == 'en', Gopher repetition) "
    "and the milli pass rate. curation_gate_attribution says which "
    "RULE does the work corpus-wide; this says which SOURCE supplies "
    "the junk each rule removes — the two axes of the same ledger. "
    "Shape: one map-only 4-boolean projection, ONE (source) hash-agg "
    "— zero joins, zero windows",
)
def curation_gate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.text import (
        alnum_ratio_expr,
        lang_hits_expr,
        lang_predict_expr,
        shingles_expr,
        tokens_expr,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "t", tokens_expr("text")
    )
    grams = shingles_expr("t", 3)
    flags = docs.select(
        "source",
        (F.size("t") < 20).alias("f_len"),
        (alnum_ratio_expr("text") < 0.5).alias("f_alnum"),
        (
            lang_predict_expr(
                lang_hits_expr("t", "en"),
                lang_hits_expr("t", "es"),
                lang_hits_expr("t", "fr"),
            )
            != "en"
        ).alias("f_lang"),
        (
            (F.size("t") >= 3)
            & (
                2 * (F.size(grams) - F.size(F.array_distinct(grams)))
                > F.size(grams)
            )
        ).alias("f_rep"),
    )

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    f_len, f_alnum = F.col("f_len"), F.col("f_alnum")
    f_lang, f_rep = F.col("f_lang"), F.col("f_rep")
    ok = ~f_len & ~f_alnum & ~f_lang & ~f_rep
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        cnt(ok).alias("n_pass"),
        cnt(f_len).alias("fail_len"),
        cnt(f_alnum).alias("fail_alnum"),
        cnt(f_lang).alias("fail_lang"),
        cnt(f_rep).alias("fail_rep"),
        F.expr(
            "CAST(sum(CASE WHEN NOT f_len AND NOT f_alnum AND NOT"
            " f_lang AND NOT f_rep THEN 1 ELSE 0 END) * 1000"
            " div count(1) AS BIGINT)"
        ).alias("pass_milli"),
    )


# ---------------------------------------------------------------------------
# dedup_detector_agreement (batch 6)
# ---------------------------------------------------------------------------


def _detector_agreement_sql() -> str:
    from jigsaw_spark.plans.queries_llm import (
        _SHINGLES_CTE,
        _SIMHASH_CTE,
    )

    return f"""
    WITH {_SIMHASH_CTE},
    {_SHINGLES_CTE},
    mh AS (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, band),
    mhp AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig
                  AND a.doc_id < b.doc_id),
    shp AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    u AS (
      SELECT coalesce(m.doc_a, s.doc_a) AS doc_a,
             coalesce(m.doc_b, s.doc_b) AS doc_b,
             m.doc_a IS NOT NULL AS in_mh,
             s.doc_a IS NOT NULL AS in_sh
      FROM mhp m
      FULL OUTER JOIN shp s
        ON m.doc_a = s.doc_a AND m.doc_b = s.doc_b)
    SELECT CAST(sum(CASE WHEN in_mh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_minhash,
           CAST(sum(CASE WHEN in_sh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_simhash,
           CAST(sum(CASE WHEN in_mh AND in_sh THEN 1 ELSE 0 END)
             AS BIGINT) AS n_both,
           CAST(sum(CASE WHEN in_mh AND NOT in_sh THEN 1 ELSE 0 END)
             AS BIGINT) AS n_only_minhash,
           CAST(sum(CASE WHEN in_sh AND NOT in_mh THEN 1 ELSE 0 END)
             AS BIGINT) AS n_only_simhash,
           CAST(CASE WHEN count(*) = 0 THEN 0
             ELSE sum(CASE WHEN in_mh AND in_sh THEN 1 ELSE 0 END)
                  * 1000 // count(*) END AS BIGINT) AS jaccard_milli
    FROM u
"""


@register(
    "dedup_detector_agreement",
    _detector_agreement_sql(),
    "near-dup detector agreement audit: the MinHash-LSH candidate "
    "pair set (16 md5 minhashes, 4x4 banding, 3-shingles) vs the "
    "SimHash banded pair set (32-bit, Hamming <= 2) over the SAME "
    "corpus — intersection, each side's exclusive pairs, and the "
    "Jaccard of the two pair sets. Low agreement means the two "
    "detectors see DIFFERENT duplicate populations (shingle-level vs "
    "token-frequency-level similarity) and a production pipeline "
    "should pool them (dedup_pooled_components' argument, here "
    "measured on the text arm's two detectors). Shape: both pair "
    "generators are banded (never all-pairs); agreement is ONE "
    "full-outer join on the pair key + a 1-row rollup",
)
def dedup_detector_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    mhp = (
        minhash_lsh_pairs(docs, "doc_id")
        .select("doc_a", "doc_b")
        .withColumn("in_mh", F.lit(True))
    )
    shp = (
        simhash_pairs(docs, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .withColumn("in_sh", F.lit(True))
    )
    u = mhp.join(shp, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("in_mh", F.lit(False)).alias("in_mh"),
        F.coalesce("in_sh", F.lit(False)).alias("in_sh"),
    )
    return u.agg(
        F.sum(F.when(F.col("in_mh"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_minhash"),
        F.sum(F.when(F.col("in_sh"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_simhash"),
        F.sum(F.when(F.col("in_mh") & F.col("in_sh"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_both"),
        F.sum(
            F.when(F.col("in_mh") & ~F.col("in_sh"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_only_minhash"),
        F.sum(
            F.when(F.col("in_sh") & ~F.col("in_mh"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_only_simhash"),
        F.expr(
            "CAST(CASE WHEN count(1) = 0 THEN 0"
            " ELSE sum(CASE WHEN in_mh AND in_sh THEN 1 ELSE 0 END)"
            " * 1000 div count(1) END AS BIGINT)"
        ).alias("jaccard_milli"),
    )


# ---------------------------------------------------------------------------
# mm_phash_cluster_sources (batch 6)
# ---------------------------------------------------------------------------


def _phash_cluster_sources_sql() -> str:
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    return f"""
    WITH RECURSIVE {_PHASH_BYTES_CTE.strip()},
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
    iedges AS (
      SELECT doc_a AS u, doc_b AS v FROM mpairs
      UNION SELECT doc_b AS u, doc_a AS v FROM mpairs),
    reach(u, v) AS (
      SELECT u, v FROM iedges
      UNION
      SELECT r.u, e.v FROM reach r JOIN iedges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS (
      SELECT u AS img, least(u, min(v)) AS component
      FROM reach GROUP BY u),
    universe AS (SELECT DISTINCT i AS img FROM ph_bytes),
    lab AS (
      SELECT un.img, coalesce(c.component, un.img) AS component,
             d.source
      FROM universe un
      LEFT JOIN comp c ON un.img = c.img
      JOIN documents d ON un.img = d.doc_id),
    per_cs AS (
      SELECT component, source, CAST(count(*) AS BIGINT) AS c
      FROM lab GROUP BY 1, 2),
    cl AS MATERIALIZED (
      SELECT component,
             CAST(sum(c) AS BIGINT) AS sz,
             CAST(count(*) AS BIGINT) AS n_sources,
             CAST(max(c) AS BIGINT) AS maj
      FROM per_cs GROUP BY 1)
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_multi_source,
           CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS multi_milli,
           CAST(sum(maj) * 1000 // sum(sz) AS BIGINT)
             AS majority_mass_milli
    FROM cl GROUP BY sz
"""


@register(
    "mm_phash_cluster_sources",
    _phash_cluster_sources_sql(),
    "source purity of image near-dup clusters — the image twin of "
    "dedup_cluster_purity's language view: per cluster size over the "
    "image universe (dHash components at Hamming <= 6, singletons "
    "kept), how many clusters span MULTIPLE sources (syndicated "
    "imagery — the same picture served by different sources, the "
    "cross-source dedup case) and the majority-source mass share. "
    "Shape: the certified banded dHash pairs + size-adaptive "
    "components, one source join against the documents dim, two "
    "hash-agg rollups (cluster then size histogram)",
)
def mm_phash_cluster_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import connected_components
    from jigsaw_spark.plans.queries_r6 import mm_phash_near_dup

    docs = _t(spark, sf_dir, "documents")
    pairs = (
        mm_phash_near_dup(spark, sf_dir)
        .select(
            F.col("img_a").cast("bigint").alias("doc_a"),
            F.col("img_b").cast("bigint").alias("doc_b"),
        )
        .localCheckpoint()
    )
    comp = connected_components(pairs).select(
        F.col("doc_id").alias("img"), F.col("component").alias("c0")
    )
    # the id universe IS the synth filter (one image per doc_id % 10 == 0
    # row, image_id = str(doc_id); phash_dhash never drops a row) — no
    # second synth→encode→decode→dHash pass just to enumerate ids
    universe = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("img")
    )
    lab = (
        universe.join(comp, "img", "left")
        .join(
            docs.select(F.col("doc_id").alias("img"), "source"), "img"
        )
        .select(
            F.coalesce("c0", F.col("img")).alias("component"),
            "source",
        )
    )
    per_cs = lab.groupBy("component", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cl = per_cs.groupBy("component").agg(
        F.sum("c").cast("bigint").alias("sz"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.max("c").cast("bigint").alias("maj"),
    )
    return cl.groupBy("sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_multi_source"),
        F.sum("maj").cast("bigint").alias("maj_mass"),
        F.sum("sz").cast("bigint").alias("tot_mass"),
    ).select(
        F.col("sz").cast("bigint").alias("cluster_size"),
        "n_clusters",
        "n_multi_source",
        F.expr(
            "CAST(n_multi_source * 1000 div n_clusters AS BIGINT)"
        ).alias("multi_milli"),
        F.expr(
            "CAST(maj_mass * 1000 div tot_mass AS BIGINT)"
        ).alias("majority_mass_milli"),
    )
