"""Round-11 batch 2: contamination/dedup economics and the image arm
of cluster accounting.

- ``dq_contamination_ngram_curve``: contamination as a function of the
  n-gram size — ``dq_contamination`` fixes n=8 (the GPT-3 rule) and
  ``dq_decontam_skipgram`` fixes n=13 (the PaLM rule); this sweeps
  n in {4, 6, 8, 10, 13} on the SAME 'contam' md5 split and reports,
  per n, distinct holdout grams, how many collide with train, and how
  many holdout docs are touched — the sensitivity curve that justifies
  the n a decontamination pipeline standardizes on (small n
  over-flags common phrases, large n under-flags; the knee is the
  defensible setting — the dedup_shingle_sweep question asked of the
  contamination rule).
- ``text_dup_gram_mass``: corpus-level duplicate 8-gram mass per lang —
  what fraction of all 8-gram OCCURRENCES sits in grams that appear in
  >= 2 docs (cross-doc duplication) or >= 2 times anywhere (any
  repetition). ``text_repetition`` scores each doc's INTERNAL dup-gram
  fraction (the Gopher rule); this is the corpus view that prices how
  much of the token mass near-dup dedup can possibly reclaim — the
  RefinedWeb-style duplicate-mass ledger read before choosing dedup
  aggressiveness.
- ``curation_gate_attribution``: which quality gate does the work —
  for the v1 curation battery (length >= 20 tokens, alnum ratio >=
  0.5, lang-predict == 'en', plus the Gopher repetition rule stated in
  exact integers: 2*(n_grams - n_distinct) > n_grams), per rule: docs
  failing it, docs failing ONLY it (the sole-reason count — dropping
  the rule readmits exactly these), and milli shares. The
  inclusion-exclusion ledger behind curation_pipeline's end-to-end
  keep rate: a rule with zero sole-fails is redundant at this corpus.
- ``mm_phash_components``: duplicate-cluster size histogram for the
  IMAGE arm — connected components (min reachable id) over
  ``mm_phash_near_dup``'s dHash Hamming<=6 pairs, singletons included,
  reported as (cluster_size, n_clusters, n_images): the
  dedup_components/dedup_end_to_end accounting applied to the phash
  family (verdict r10 #4's image-near-dup arm extended from pairs to
  cluster economics).

Scale notes (100 TB): the n-gram curve is one tokenize with five
shingle explodes, each a distinct-gram hash-agg + one gram-keyed join
(no pair enumeration; gram count grows linearly in n's arm count); the
dup-mass ledger is one explode + one (lang, gram) hash-agg + a
lang rollup; gate attribution is a map-only projection of four
booleans + one 1-row aggregate unpivoted over a 4-row rule dim; phash
components run on the BANDED candidate pairs (pigeonhole join, never
all-pairs) and the component step uses the production
connected_components operator (single-task union-find under the edge
threshold, pointer-jumping label propagation above it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

_NS = (4, 6, 8, 10, 13)

# ---------------------------------------------------------------------------
# dq_contamination_ngram_curve
# ---------------------------------------------------------------------------


def _contam_curve_sql() -> str:
    from jigsaw_spark.operators.text import shingles_sql, tokens_sql

    arms = []
    for n in _NS:
        arms.append(
            f"""
    hold_{n} AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql('t', n)}) AS sh
      FROM toks WHERE is_holdout),
    train_{n} AS (
      SELECT DISTINCT unnest({shingles_sql('t', n)}) AS sh
      FROM toks WHERE NOT is_holdout),
    hit_{n} AS (
      SELECT h.doc_id, h.sh, t.sh IS NOT NULL AS hit
      FROM hold_{n} h LEFT JOIN train_{n} t ON h.sh = t.sh),
    row_{n} AS (
      SELECT {n} AS n,
             CAST(count(DISTINCT sh) AS BIGINT) AS n_holdout_grams,
             CAST(count(DISTINCT CASE WHEN hit THEN sh END) AS BIGINT)
               AS n_contaminated_grams,
             CAST(count(DISTINCT CASE WHEN hit THEN doc_id END)
               AS BIGINT) AS n_contaminated_docs
      FROM hit_{n})"""
        )
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT * FROM row_{n}" for n in _NS
    )
    return f"""
    WITH split AS (
      SELECT doc_id, text,
             CAST(CAST(('0x' || substr(md5('contam|'
               || CAST(doc_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               % CAST(20 AS UBIGINT) AS BIGINT) = 0 AS is_holdout
      FROM documents),
    toks AS MATERIALIZED (
      SELECT doc_id, is_holdout, {tokens_sql('text')} AS t FROM split),
    {','.join(arms)}
    SELECT CAST(n AS INT) AS n, n_holdout_grams, n_contaminated_grams,
           n_contaminated_docs,
           CAST(CASE WHEN n_holdout_grams = 0 THEN 0
             ELSE n_contaminated_grams * 1000 // n_holdout_grams
             END AS BIGINT) AS rate_milli
    FROM ({unions})
"""


@register(
    "dq_contamination_ngram_curve",
    _contam_curve_sql(),
    "contamination sensitivity curve: the 8-gram rule "
    "(dq_contamination) and the 13-gram skip rule "
    "(dq_decontam_skipgram) are two points of a curve — this sweeps "
    "n in {4,6,8,10,13} on the SAME 'contam' md5 split and reports "
    "per n: distinct holdout grams, train collisions, touched holdout "
    "docs, and the milli collision rate. Small n over-flags common "
    "phrases, large n under-flags; the knee is the defensible "
    "decontamination setting (dedup_shingle_sweep's economics applied "
    "to the contamination rule). Shape: ONE tokenize, ONE fused "
    "(n, gram) explode feeding a single (n, sh) hash-agg — no pair "
    "enumeration, arm count fixed at 5",
)
def dq_contamination_ngram_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|", F.lit("contam"), F.col("doc_id")
                            )
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
        ).alias("is_holdout"),
        tokens_expr("text").alias("t"),
    ).localCheckpoint()

    # ONE fused explode for all five arms (r14, guide §2.3/§2.4): each
    # doc emits (n, gram) pairs for every arm in a single generator, so
    # the checkpointed token relation is scanned once instead of five
    # times and ONE (n, sh) hash-agg replaces the five per-arm aggs —
    # an n-gram string determines its own n (n space-joined tokens), so
    # keying by (n, sh) is exactly the per-arm distinct-gram space
    def _arm_structs(n: int):
        # single-arg lambda: a two-arg lambda would receive the array
        # INDEX as its second argument (pyspark transform arity rule)
        return F.transform(
            shingles_expr("t", n),
            lambda s: F.struct(
                F.lit(n).cast("int").alias("n"), s.alias("sh")
            ),
        )

    gram_structs = F.flatten(
        F.array(*[_arm_structs(n) for n in _NS])
    )
    g = (
        toks.select(
            "doc_id",
            "is_holdout",
            F.explode(gram_structs).alias("g"),
        )
        .select("doc_id", "is_holdout", "g.n", "g.sh")
        .groupBy("n", "sh")
        .agg(
            F.collect_set(
                F.when(F.col("is_holdout"), F.col("doc_id"))
            ).alias("hd"),
            F.max(
                F.when(~F.col("is_holdout"), 1).otherwise(0)
            ).alias("ht"),
        )
        .localCheckpoint(eager=False)
    )
    grams = g.groupBy("n").agg(
        F.sum(F.when(F.size("hd") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_holdout_grams"),
        F.sum(
            F.when((F.size("hd") > 0) & (F.col("ht") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_contaminated_grams"),
    )
    docs_c = (
        g.filter(F.col("ht") == 1)
        .select("n", F.explode("hd").alias("d"))
        .groupBy("n")
        .agg(
            F.count_distinct("d")
            .cast("bigint")
            .alias("n_contaminated_docs")
        )
    )
    # literal arm dim so an arm with zero grams still reports a zero
    # row (the old per-arm global aggregates always emitted one row)
    ndim = spark.createDataFrame(
        [(int(n),) for n in _NS], "n int"
    )
    out = (
        ndim.join(F.broadcast(grams), "n", "left")
        .join(F.broadcast(docs_c), "n", "left")
        .select(
            "n",
            F.coalesce("n_holdout_grams", F.lit(0))
            .cast("bigint")
            .alias("n_holdout_grams"),
            F.coalesce("n_contaminated_grams", F.lit(0))
            .cast("bigint")
            .alias("n_contaminated_grams"),
            F.coalesce("n_contaminated_docs", F.lit(0))
            .cast("bigint")
            .alias("n_contaminated_docs"),
        )
    )
    return out.select(
        "n",
        "n_holdout_grams",
        "n_contaminated_grams",
        "n_contaminated_docs",
        F.expr(
            "CAST(CASE WHEN n_holdout_grams = 0 THEN 0"
            " ELSE n_contaminated_grams * 1000 div n_holdout_grams"
            " END AS BIGINT)"
        ).alias("rate_milli"),
    )


# ---------------------------------------------------------------------------
# text_dup_gram_mass
# ---------------------------------------------------------------------------


def _dup_mass_sql() -> str:
    from jigsaw_spark.operators.text import shingles_sql, tokens_sql

    return f"""
    WITH toks AS (
      SELECT doc_id, lang, {tokens_sql('text')} AS t FROM documents),
    grams AS (
      SELECT doc_id, lang, unnest({shingles_sql('t', 8)}) AS g
      FROM toks),
    per_gram AS MATERIALIZED (
      SELECT lang, g,
             CAST(count(*) AS BIGINT) AS c,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS d
      FROM grams GROUP BY 1, 2)
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS total_gram_occ,
           CAST(coalesce(sum(CASE WHEN d >= 2 THEN c END), 0) AS BIGINT)
             AS crossdoc_mass,
           CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT)
             AS repeated_mass,
           CAST(coalesce(sum(CASE WHEN d >= 2 THEN c END), 0) * 1000
             // sum(c) AS BIGINT) AS crossdoc_milli,
           CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) * 1000
             // sum(c) AS BIGINT) AS repeated_milli
    FROM per_gram GROUP BY lang
"""


@register(
    "text_dup_gram_mass",
    _dup_mass_sql(),
    "corpus-level duplicate 8-gram mass per lang: fraction of all "
    "8-gram OCCURRENCES in grams seen in >= 2 docs (cross-doc "
    "duplication — the mass near-dup dedup can possibly reclaim) and "
    "in grams seen >= 2 times anywhere (any repetition, within-doc "
    "included). text_repetition scores each doc's INTERNAL dup-gram "
    "fraction (the per-doc Gopher rule); this is the corpus ledger "
    "(the RefinedWeb duplicate-mass view) that prices dedup "
    "aggressiveness before any pair is enumerated. Shape: one explode "
    "-> one (lang, gram) hash-agg -> a |langs|-row rollup; exact "
    "integer masses",
)
def text_dup_gram_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(shingles_expr(tokens_expr("text"), 8)).alias("g"),
    )
    # the distinct-doc count is only ever tested against >= 2, and
    # d >= 2 ⟺ min(doc_id) != max(doc_id) — min/max are plain partial
    # aggregates, so this drops the count_distinct Expand machinery
    # (2x the rows through the (lang, g) exchange) outright (r14,
    # guide §2.3)
    per_gram = grams.groupBy("lang", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        (F.min("doc_id") != F.max("doc_id")).alias("x"),
    )
    return per_gram.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("total_gram_occ"),
        F.coalesce(F.sum(F.when(F.col("x"), F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("crossdoc_mass"),
        F.coalesce(F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("repeated_mass"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN x THEN c END), 0) * 1000"
            " div sum(c) AS BIGINT)"
        ).alias("crossdoc_milli"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) * 1000"
            " div sum(c) AS BIGINT)"
        ).alias("repeated_milli"),
    )


# ---------------------------------------------------------------------------
# curation_gate_attribution
# ---------------------------------------------------------------------------


def _gate_attr_sql() -> str:
    from jigsaw_spark.operators.text import (
        alnum_ratio_sql,
        lang_hits_sql,
        lang_predict_sql,
        shingles_sql,
        tokens_sql,
    )

    return f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS t,
             {alnum_ratio_sql('text')} AS alnum
      FROM documents),
    flags AS MATERIALIZED (
      SELECT doc_id,
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
      FROM toks),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_len,
             CAST(sum(CASE WHEN f_alnum THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_alnum,
             CAST(sum(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_lang,
             CAST(sum(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT)
               AS fail_rep,
             CAST(sum(CASE WHEN f_len AND NOT f_alnum AND NOT f_lang
               AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS sole_len,
             CAST(sum(CASE WHEN f_alnum AND NOT f_len AND NOT f_lang
               AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS sole_alnum,
             CAST(sum(CASE WHEN f_lang AND NOT f_len AND NOT f_alnum
               AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS sole_lang,
             CAST(sum(CASE WHEN f_rep AND NOT f_len AND NOT f_alnum
               AND NOT f_lang THEN 1 ELSE 0 END) AS BIGINT) AS sole_rep,
             CAST(sum(CASE WHEN NOT f_len AND NOT f_alnum AND NOT f_lang
               AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM flags)
    SELECT r.rule, a.n_docs, a.n_pass,
           CASE r.rule WHEN 'min_tokens' THEN a.fail_len
                       WHEN 'alnum_ratio' THEN a.fail_alnum
                       WHEN 'lang_en' THEN a.fail_lang
                       ELSE a.fail_rep END AS n_fail,
           CASE r.rule WHEN 'min_tokens' THEN a.sole_len
                       WHEN 'alnum_ratio' THEN a.sole_alnum
                       WHEN 'lang_en' THEN a.sole_lang
                       ELSE a.sole_rep END AS n_sole_fail,
           CAST((CASE r.rule WHEN 'min_tokens' THEN a.fail_len
                             WHEN 'alnum_ratio' THEN a.fail_alnum
                             WHEN 'lang_en' THEN a.fail_lang
                             ELSE a.fail_rep END) * 1000 // a.n_docs
             AS BIGINT) AS fail_milli
    FROM agg a
    CROSS JOIN (SELECT unnest(['min_tokens', 'alnum_ratio', 'lang_en',
                               'repetition']) AS rule) r
"""


@register(
    "curation_gate_attribution",
    _gate_attr_sql(),
    "which quality gate does the work: for the v1 curation battery "
    "(min 20 tokens, alnum ratio >= 0.5, lang-predict == 'en') plus "
    "the Gopher repetition rule in exact integer form "
    "(2*(n_grams - n_distinct) > n_grams — text_repetition's 0.5 "
    "threshold without a float), per rule: docs failing it, docs "
    "failing ONLY it (dropping the rule readmits exactly these — a "
    "zero sole-fail rule is redundant at this corpus), the shared "
    "pass count, and the milli fail share. The inclusion-exclusion "
    "ledger behind curation_pipeline's end-to-end keep rate. Shape: "
    "map-only 4-boolean projection -> ONE 1-row aggregate -> a 4-row "
    "rule dim cross — zero shuffles beyond the scalar agg",
)
def curation_gate_attribution(
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
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        cnt(f_len).alias("fail_len"),
        cnt(f_alnum).alias("fail_alnum"),
        cnt(f_lang).alias("fail_lang"),
        cnt(f_rep).alias("fail_rep"),
        cnt(f_len & ~f_alnum & ~f_lang & ~f_rep).alias("sole_len"),
        cnt(f_alnum & ~f_len & ~f_lang & ~f_rep).alias("sole_alnum"),
        cnt(f_lang & ~f_len & ~f_alnum & ~f_rep).alias("sole_lang"),
        cnt(f_rep & ~f_len & ~f_alnum & ~f_lang).alias("sole_rep"),
        cnt(~f_len & ~f_alnum & ~f_lang & ~f_rep).alias("n_pass"),
    )
    rules = F.broadcast(
        spark.createDataFrame(
            [("min_tokens",), ("alnum_ratio",), ("lang_en",),
             ("repetition",)],
            "rule string",
        )
    )
    pick = (
        "CASE rule WHEN 'min_tokens' THEN {p}_len"
        " WHEN 'alnum_ratio' THEN {p}_alnum"
        " WHEN 'lang_en' THEN {p}_lang ELSE {p}_rep END"
    )
    return agg.crossJoin(rules).select(
        "rule",
        "n_docs",
        "n_pass",
        F.expr(pick.format(p="fail")).alias("n_fail"),
        F.expr(pick.format(p="sole")).alias("n_sole_fail"),
        F.expr(
            f"CAST(({pick.format(p='fail')}) * 1000 div n_docs"
            " AS BIGINT)"
        ).alias("fail_milli"),
    )


# ---------------------------------------------------------------------------
# mm_phash_components
# ---------------------------------------------------------------------------


def _phash_components_sql() -> str:
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    return f"""
    WITH RECURSIVE {_PHASH_BYTES_CTE},
    cand AS (
      SELECT DISTINCT x.i AS ia, y.i AS ib
      FROM ph_bytes x
      JOIN ph_bytes y ON x.byte_idx = y.byte_idx
                     AND x.byte_val = y.byte_val AND x.i < y.i),
    ham AS (
      SELECT c.ia, c.ib
      FROM cand c
      JOIN ph_bytes x ON x.i = c.ia
      JOIN ph_bytes y ON y.i = c.ib AND y.byte_idx = x.byte_idx
      GROUP BY 1, 2
      HAVING CAST(sum(bit_count(xor(x.byte_val, y.byte_val))) AS BIGINT)
             <= 6),
    edges AS (
      SELECT ia AS u, ib AS v FROM ham
      UNION SELECT ib AS u, ia AS v FROM ham),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS (
      SELECT u AS img, least(u, min(v)) AS component
      FROM reach GROUP BY u),
    universe AS (SELECT DISTINCT i AS img FROM ph_bytes),
    labeled AS (
      SELECT un.img, coalesce(c.component, un.img) AS component
      FROM universe un LEFT JOIN comp c ON un.img = c.img),
    sizes AS (
      SELECT component, CAST(count(*) AS BIGINT) AS size
      FROM labeled GROUP BY 1)
    SELECT CAST(size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(size * count(*) AS BIGINT) AS n_images
    FROM sizes GROUP BY size
"""


@register(
    "mm_phash_components",
    _phash_components_sql(),
    "image duplicate-cluster economics: connected components (min "
    "reachable id) over mm_phash_near_dup's dHash Hamming<=6 banded "
    "pairs, singletons included, as a (cluster_size, n_clusters, "
    "n_images) histogram — dedup_components/dedup_end_to_end's "
    "accounting applied to the IMAGE arm (verdict r10 #4: the phash "
    "band join has been first-class since r6; this adds the cluster "
    "ledger a dedup pass acts on — keepers = n_clusters, dropped = "
    "n_images - n_clusters). Shape: pigeonhole (byte_idx, byte_val) "
    "band join (never all-pairs) -> exact Hamming verify -> the "
    "production connected_components operator (single-task union-find "
    "under the edge threshold, pointer-jumping label propagation "
    "above) -> two tiny hash-aggs",
)
def mm_phash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import connected_components
    from jigsaw_spark.plans.queries_r6 import mm_phash_near_dup

    pairs = mm_phash_near_dup(spark, sf_dir).select(
        F.col("img_a").cast("bigint").alias("doc_a"),
        F.col("img_b").cast("bigint").alias("doc_b"),
    )
    comp = connected_components(pairs)
    # the id universe IS the synth filter: _synth_images emits exactly
    # one image per filtered doc row (image_id = str(doc_id)) and
    # phash_dhash never drops a row, so re-running the
    # synth→encode→decode→dHash kernel just to enumerate ids is a full
    # second pass over the image corpus for a projection of its input
    universe = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").cast("bigint").alias("img"))
    )
    labeled = (
        universe.join(
            comp.select(
                F.col("doc_id").alias("img"), F.col("component")
            ),
            "img",
            "left",
        )
        .select(
            "img",
            F.coalesce("component", F.col("img")).alias("component"),
        )
    )
    sizes = labeled.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
    ).select(
        F.col("size").cast("bigint").alias("cluster_size"),
        "n_clusters",
        (F.col("size") * F.col("n_clusters"))
        .cast("bigint")
        .alias("n_images"),
    )


# ---------------------------------------------------------------------------
# Round-11 batch 7 (same module — the window is governed by _R11_NEW in
# plans/queries; modules at/after _OVERFLOW_BOUNDARY queue behind it).
# ---------------------------------------------------------------------------

# dq_contamination_bias ------------------------------------------------------


def _contam_bias_sql() -> str:
    from jigsaw_spark.operators.text import (
        alnum_ratio_sql,
        lang_hits_sql,
        lang_predict_sql,
        shingles_sql,
        tokens_sql,
    )

    return f"""
    WITH split AS (
      SELECT doc_id, text, n_chars,
             CAST(CAST(('0x' || substr(md5('contam|'
               || CAST(doc_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               % CAST(20 AS UBIGINT) AS BIGINT) = 0 AS is_holdout
      FROM documents),
    toks AS (
      SELECT doc_id, n_chars, is_holdout, {tokens_sql('text')} AS t,
             {alnum_ratio_sql('text')} AS alnum
      FROM split),
    sh AS (
      SELECT doc_id, is_holdout, unnest({shingles_sql('t', 8)}) AS sh
      FROM toks),
    train_sh AS MATERIALIZED (
      SELECT DISTINCT sh FROM sh WHERE NOT is_holdout),
    hit_docs AS MATERIALIZED (
      SELECT DISTINCT h.doc_id
      FROM sh h JOIN train_sh t ON h.sh = t.sh
      WHERE h.is_holdout),
    flags AS (
      SELECT tk.doc_id, tk.n_chars,
             hd.doc_id IS NOT NULL AS is_contaminated,
             (len(tk.t) >= 20 AND tk.alnum >= 0.5 AND
              {lang_predict_sql(
                  f"CAST({lang_hits_sql('tk.t', 'en')} AS INT)",
                  f"CAST({lang_hits_sql('tk.t', 'es')} AS INT)",
                  f"CAST({lang_hits_sql('tk.t', 'fr')} AS INT)",
              )} = 'en') AS passes
      FROM toks tk LEFT JOIN hit_docs hd ON tk.doc_id = hd.doc_id
      WHERE tk.is_holdout),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_hold FROM flags)
    SELECT f.is_contaminated,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * 1000 // (SELECT n_hold FROM tot) AS BIGINT)
             AS share_milli,
           CAST(sum(CASE WHEN f.passes THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           CAST(sum(CASE WHEN f.passes THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS pass_milli,
           CAST(sum(f.n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(f.n_chars) // count(*) AS BIGINT) AS mean_chars
    FROM flags f GROUP BY 1
"""


@register(
    "dq_contamination_bias",
    _contam_bias_sql(),
    "is the leak RANDOM or SELECTIVE: holdout docs split by the "
    "dq_contamination flag (>= 1 train 8-gram collision, same "
    "'contam' md5 split), per group: count, share, v1-gate pass rate, "
    "and mean length — if contaminated docs pass quality gates at a "
    "different rate or run longer than clean ones, the contamination "
    "is correlated with exactly the docs an eval keeps, and the "
    "measured metric inherits the bias (the reason decontamination "
    "is a correctness issue, not hygiene). Shape: the certified "
    "contamination join reduced to a per-doc flag (distinct "
    "doc-level semi-join), one 2-row group rollup",
)
def dq_contamination_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import (
        alnum_ratio_expr,
        lang_hits_expr,
        lang_predict_expr,
        shingles_expr,
        tokens_expr,
    )
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    split = docs.select(
        "doc_id",
        "text",
        "n_chars",
        (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|", F.lit("contam"), F.col("doc_id")
                            )
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
        ).alias("is_holdout"),
    )
    toks = split.select(
        "doc_id",
        "n_chars",
        "is_holdout",
        tokens_expr("text").alias("t"),
        alnum_ratio_expr("text").alias("alnum"),
    ).localCheckpoint()
    sh = toks.select(
        "doc_id",
        "is_holdout",
        F.explode(shingles_expr("t", 8)).alias("sh"),
    )
    train_sh = sh.filter(~F.col("is_holdout")).select("sh").distinct()
    hit_docs = (
        sh.filter(F.col("is_holdout"))
        .join(train_sh.select(F.col("sh").alias("tsh")),
              F.col("sh") == F.col("tsh"))
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    flags = (
        toks.filter(F.col("is_holdout"))
        .join(hit_docs, "doc_id", "left")
        .select(
            "n_chars",
            F.coalesce("hit", F.lit(False)).alias("is_contaminated"),
            (
                (F.size("t") >= 20)
                & (F.col("alnum") >= 0.5)
                & (
                    lang_predict_expr(
                        lang_hits_expr("t", "en"),
                        lang_hits_expr("t", "es"),
                        lang_hits_expr("t", "fr"),
                    )
                    == "en"
                )
            ).alias("passes"),
        )
    )
    tot = flags.agg(F.count(F.lit(1)).cast("bigint").alias("n_hold"))
    return (
        flags.groupBy("is_contaminated")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("passes"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pass"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "is_contaminated",
            "n_docs",
            F.expr("CAST(n_docs * 1000 div n_hold AS BIGINT)").alias(
                "share_milli"
            ),
            "n_pass",
            F.expr(
                "CAST(n_pass * 1000 div n_docs AS BIGINT)"
            ).alias("pass_milli"),
            "sum_chars",
            F.expr("CAST(sum_chars div n_docs AS BIGINT)").alias(
                "mean_chars"
            ),
        )
    )


# ann_nprobe_tradeoff --------------------------------------------------------

_NPROBES = (1, 2, 4)


def _nprobe_tradeoff_sql() -> str:
    arms = []
    for np_ in _NPROBES:
        arms.append(f"""
    probes_{np_} AS (
      SELECT query_id, cell FROM probes_all WHERE rn <= {np_}),
    cand_{np_} AS (
      SELECT p.query_id, a.vec_id
      FROM probes_{np_} p JOIN assign a ON a.cell = p.cell
      WHERE a.vec_id <> p.query_id),
    scored_{np_} AS (
      SELECT query_id, vec_id, rank FROM (
        SELECT c.query_id, c.vec_id,
               row_number() OVER (PARTITION BY c.query_id
                 ORDER BY round(list_cosine_similarity(
                   q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 9)
                 DESC, c.vec_id) AS rank
        FROM cand_{np_} c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings e ON e.vec_id = c.vec_id) t
      WHERE rank <= 10),
    row_{np_} AS (
      SELECT {np_} AS nprobe,
             (SELECT CAST(count(*) AS BIGINT) FROM cand_{np_})
               AS n_scored,
             (SELECT CAST(count(*) AS BIGINT)
              FROM truth t JOIN scored_{np_} s
                ON t.query_id = s.query_id AND t.vec_id = s.vec_id)
               AS hits)""")
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT * FROM row_{np_}" for np_ in _NPROBES
    )
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id < 8),
    assign AS MATERIALIZED (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(
                   e.embedding::DOUBLE[], c.cvec), 9) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
    probes_all AS MATERIALIZED (
      SELECT query_id, cell, rn FROM (
        SELECT q.vec_id AS query_id, c.cid AS cell,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                   q.embedding::DOUBLE[], c.cvec), 9) DESC, c.cid) AS rn
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < 5) t),
    truth AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                   q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 9)
                 DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 5) t
      WHERE rank <= 10),
    brute AS (
      SELECT CAST(5 * (count(*) - 1) AS BIGINT) AS n_brute
      FROM embeddings),
    {','.join(arms)}
    SELECT CAST(r.nprobe AS INT) AS nprobe,
           r.n_scored, r.hits,
           CAST(r.hits * 1000 // 50 AS BIGINT) AS recall_milli,
           CAST(r.n_scored * 1000 // b.n_brute AS BIGINT)
             AS scan_share_milli
    FROM ({unions}) r CROSS JOIN brute b
"""


@register(
    "ann_nprobe_tradeoff",
    _nprobe_tradeoff_sql(),
    "the IVF Pareto table: for nprobe in {{1,2,4}}, candidates SCORED "
    "(the exact scan-cost ledger — distance computations the index "
    "pays) and recall@10 vs the brute truth over the 5-query panel, "
    "plus the scan share vs brute-force's 5*(N-1). ann_recall_curve "
    "fixes nprobe=2 and sweeps k; ann_codec_recall sweeps the codec; "
    "this sweeps the PROBE axis with quality AND cost in one relation "
    "— the table an index tuner actually reads (recall per scanned "
    "candidate). Shape: ONE shared assignment + probe ranking, three "
    "cell-restricted candidate joins (never the full corpus per arm), "
    "k-bounded rank tables",
)
def ann_nprobe_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import cosine_topk, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    panel = emb.filter(F.col("vec_id") < 5)
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    truth = cosine_topk(emb, panel, k=10).select(
        "query_id", F.col("vec_id").alias("tvec")
    )
    n_brute = emb.agg(
        (F.lit(5) * (F.count(F.lit(1)) - 1))
        .cast("bigint")
        .alias("n_brute")
    )
    from pyspark.sql.window import Window

    from jigsaw_spark.operators.similarity import _ivf_scored_candidates

    # probe lists nest: ONE prelude at max nprobe with probe_rank
    # carried; each arm is a filter (guide §2.4 — one corpus assignment
    # kernel + cell join instead of one per arm)
    scored_all = _ivf_scored_candidates(
        emb,
        panel,
        centroids,
        max(_NPROBES),
        "vec_id",
        "embedding",
        keep_probe_rank=True,
    ).localCheckpoint()
    # single-window form (r14, guide §2.4): per-arm top-10 rank = a
    # running count of arm members over the ONE total order
    # (round(cos,9) desc, vec_id) — identical to row_number over the
    # filtered arm because candidates are unique per (query, vec) —
    # so one window pass + one aggregate replace the 3 per-arm
    # windows, 3 truth joins and 6 count jobs
    wopen = (
        Window.partitionBy("query_id")
        .orderBy(F.round("cos", 9).desc(), F.col("vec_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tmark = F.broadcast(
        truth.select(
            "query_id",
            F.col("tvec").alias("vec_id"),
            F.lit(1).alias("_t"),
        )
    )
    ranked = scored_all.select(
        "query_id",
        "vec_id",
        "probe_rank",
        *[
            F.sum(F.when(F.col("probe_rank") <= np_, 1).otherwise(0))
            .over(wopen)
            .alias(f"rn{np_}")
            for np_ in _NPROBES
        ],
    )
    row = ranked.join(tmark, ["query_id", "vec_id"], "left").agg(
        *[
            F.sum(F.when(F.col("probe_rank") <= np_, 1).otherwise(0))
            .cast("bigint")
            .alias(f"ns{np_}")
            for np_ in _NPROBES
        ],
        *[
            F.sum(
                F.when(
                    (F.col("probe_rank") <= np_)
                    & (F.col(f"rn{np_}") <= 10)
                    & F.col("_t").isNotNull(),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"h{np_}")
            for np_ in _NPROBES
        ],
    )
    out = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(np_).cast("int").alias("nprobe"),
                        F.col(f"ns{np_}").alias("n_scored"),
                        F.col(f"h{np_}").alias("hits"),
                    )
                    for np_ in _NPROBES
                ]
            )
        ).alias("r")
    ).select("r.nprobe", "r.n_scored", "r.hits")
    return out.crossJoin(F.broadcast(n_brute)).select(
        "nprobe",
        "n_scored",
        "hits",
        F.expr("CAST(hits * 1000 div 50 AS BIGINT)").alias(
            "recall_milli"
        ),
        F.expr(
            "CAST(n_scored * 1000 div n_brute AS BIGINT)"
        ).alias("scan_share_milli"),
    )


# dedup_band_sweep -----------------------------------------------------------

_BAND_CFGS = ((2, 8), (4, 4), (8, 2))  # (bands, rows_per_band), b*r = 16


def _band_sweep_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _SHINGLES_CTE, _TOKS_CTE

    arms = []
    for b, r in _BAND_CFGS:
        thr = round(1000 * (1.0 / b) ** (1.0 / r))
        arms.append(f"""
    bands_{b} AS (
      SELECT doc_id, seed // {r} AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, band),
    pairs_{b} AS (
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
      FROM bands_{b} a
      JOIN bands_{b} b2 ON a.band = b2.band AND a.sig = b2.sig
                        AND a.doc_id < b2.doc_id),
    row_{b} AS (
      SELECT {b} AS bands, {r} AS rows_per_band,
             CAST({thr} AS BIGINT) AS threshold_milli,
             (SELECT CAST(count(*) AS BIGINT) FROM pairs_{b})
               AS n_candidate_pairs)""")
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT * FROM row_{b}" for b, _ in _BAND_CFGS
    )
    return f"""
    WITH {_TOKS_CTE}, {_SHINGLES_CTE},
    mh AS MATERIALIZED (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    {','.join(arms)}
    SELECT CAST(bands AS INT) AS bands,
           CAST(rows_per_band AS INT) AS rows_per_band,
           threshold_milli, n_candidate_pairs
    FROM ({unions})
"""


@register(
    "dedup_band_sweep",
    _band_sweep_sql(),
    "LSH band-configuration economics: over the SAME 16 md5-seeded "
    "minhashes (dedup_minhash_lsh's signatures — the 4x4 row "
    "reproduces its certified pair count), candidate pair counts for "
    "(bands, rows) in {{2x8, 4x4, 8x2}} next to each config's "
    "S-curve threshold s* = (1/b)^(1/r) (inlined as an exact literal, "
    "computed once at plan build): 8x2 fires at ~354 milli Jaccard "
    "(recall-heavy, most candidates), 2x8 at ~917 (precision-heavy, "
    "fewest) — the tuning table that prices recall against candidate "
    "volume BEFORE any exact verification runs. dedup_shingle_sweep "
    "sweeps the shingle axis; this sweeps the banding axis. Shape: "
    "ONE signature hash-agg shared by three banded bucket joins — "
    "never all-pairs",
)
def dedup_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents").localCheckpoint()
    arms = []
    for b, r in _BAND_CFGS:
        thr = round(1000 * (1.0 / b) ** (1.0 / r))
        n = minhash_lsh_pairs(
            docs, "doc_id", num_hashes=16, bands=b
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs")
        )
        arms.append(
            n.select(
                F.lit(b).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                F.lit(thr).cast("bigint").alias("threshold_milli"),
                "n_candidate_pairs",
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out
