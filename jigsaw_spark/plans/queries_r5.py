"""Round-5 operators: exact-substring window dedup, containment pairs,
ANN recall self-evaluation, model calibration, mixture reweighting.

Reference parity: these extend the same training-data-pipeline surface as
queries_llm/queries_r4 (the reference's dataset-construction mandate,
jigsaw/dataset.py) with the next operators a 100 TB curation pipeline
reaches for:

- ``dedup_substr_windows``: ExactSubstr-style duplication stats (Lee et
  al. 2022) at token-window granularity — the span-level complement to
  line dedup (dedup_lines) and doc dedup (minhash).
- ``dedup_containment``: overlap-coefficient pairs — asymmetric near-dup
  (excerpt/quote containment) that Jaccard structurally misses.
- ``ann_ivf_recall``: recall@10 of the IVF scale path against the exact
  brute-force baseline — the tuning loop for (ncells, nprobe), same
  self-evaluation family as dedup_lsh_recall.
- ``ml_calibration_bins``: reliability-diagram bins for a fixed linear
  scorer over embeddings — the model-ops check downstream of
  ml_logreg; all bin stats are exact-integer derived.
- ``p_mixture_reweight``: per-language resampling weights to hit a
  target mixture — the deterministic ledger feeding weighted sampling
  (p1_stratified/p_temperature_mixture run on its output at scale).

Float discipline (see PLANS.md float-determinism audit): scores that feed
bins/ranks snap through round(·,9) before any boundary decision; every
reported double is either a ratio of exact integers or a round of an
identically-derived value on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register
from jigsaw_spark.plans.queries_llm import (
    _BANDED_PAIR_CTES,
    _SHINGLES_CTE,
    _TOKS_CTE,
)
from jigsaw_spark.operators.text import tokens_sql

_W = 8  # substring window length (tokens)


@register(
    "dedup_substr_windows",
    f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS ws FROM documents
    ),
    wins AS (
      SELECT DISTINCT doc_id, array_to_string(ws[i+1:i+{_W}], ' ') AS w
      FROM toks, LATERAL (
        SELECT unnest(range(0, len(ws) - {_W} + 1)) AS i) t
      WHERE len(ws) >= {_W}
    ),
    dup AS (
      SELECT w, 1 AS is_dup FROM wins GROUP BY w HAVING count(*) >= 2
    )
    SELECT doc_id,
           count(*) AS n_windows,
           CAST(sum(coalesce(is_dup, 0)) AS BIGINT) AS n_dup_windows,
           round(sum(coalesce(is_dup, 0)) / CAST(count(*) AS DOUBLE), 4)
             AS dup_ratio
    FROM wins LEFT JOIN dup USING (w)
    GROUP BY doc_id
    """,
    "ExactSubstr-style window dedup stats (Lee et al. 2022 analog): one "
    "sliding-window explode -> distinct (doc, md5-fingerprint) -> ONE "
    "fp-keyed hash agg -> fp join back (exchange reuse) -> doc agg; "
    "windows shuffle as fingerprints, dup set never collected; outputs "
    "are integer counts + integer-ratio doubles (engine-stable)",
)
def dedup_substr_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import substring_window_stats

    docs = _t(spark, sf_dir, "documents")
    return substring_window_stats(docs, "doc_id", "text", window=_W)


@register(
    "dedup_containment",
    f"""
    WITH {_BANDED_PAIR_CTES}
    SELECT doc_a, doc_b,
           round(inter / CAST(least(sa.sz, sb.sz) AS DOUBLE), 4) AS overlap
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter / CAST(least(sa.sz, sb.sz) AS DOUBLE) >= 0.8
    """,
    "overlap-coefficient near-dup pairs |A∩B|/min(|A|,|B|): the "
    "asymmetric containment Jaccard misses (excerpt inside a long doc). "
    "C4-ordered (r6 scale-safe default): exact-dedup keepers -> "
    "MinHash-LSH candidates -> exact intersection ONLY per candidate "
    "pair — the capped-posting self-join (cap²/2 pairs per hot shingle, "
    "9.9x at the x10 probe) never runs; score = ratio of exact integers",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import banded_pair_scores

    docs = _t(spark, sf_dir, "documents")
    return banded_pair_scores(
        docs, "doc_id", threshold=0.8, measure="containment"
    )


_IVF_COS_R5 = "round(list_cosine_similarity({a}.embedding::DOUBLE[], {b}.cvec), 9)"
_COS_R5 = (
    "list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[])"
)


@register(
    "ann_ivf_recall",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id < 8
    ), assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_IVF_COS_R5.format(a='e', b='c')} DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c) t
      WHERE rn = 1
    ), probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cid AS cell,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_IVF_COS_R5.format(a='q', b='c')} DESC, c.cid) AS rn
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < 5) t
      WHERE rn <= 2
    ), ivf AS (
      SELECT query_id, vec_id FROM (
        SELECT p.query_id, a.vec_id,
               row_number() OVER (PARTITION BY p.query_id
                 ORDER BY round({_COS_R5}, 9) DESC, a.vec_id) AS rank
        FROM probes p
        JOIN assign a ON a.cell = p.cell
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings e ON e.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id) t
      WHERE rank <= 10
    ), brute AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round({_COS_R5}, 9) DESC, e.vec_id) AS rank
        FROM embeddings q JOIN embeddings e ON q.vec_id <> e.vec_id
        WHERE q.vec_id < 5) t
      WHERE rank <= 10
    )
    SELECT b.query_id,
           CAST(count(i.vec_id) AS BIGINT) AS n_hit,
           round(count(i.vec_id) / 10.0, 4) AS recall_at_10
    FROM brute b
    LEFT JOIN ivf i ON b.query_id = i.query_id AND b.vec_id = i.vec_id
    GROUP BY b.query_id
    """,
    "ANN self-evaluation: recall@10 of the IVF scale path (8 cells, "
    "nprobe=2) against exact brute-force cosine — the (ncells, nprobe) "
    "tuning loop, same family as dedup_lsh_recall; both sides reuse the "
    "production operators, recall is a ratio of exact integers",
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import cosine_topk, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    queries = emb.filter(F.col("vec_id") < 5)
    brute = cosine_topk(emb, queries, k=10).select("query_id", "vec_id")
    ivf = ivf_topk(emb, queries, centroids, k=10, nprobe=2).select(
        "query_id", F.col("vec_id").alias("ivf_id")
    )
    joined = brute.join(
        ivf,
        (brute["query_id"] == ivf["query_id"])
        & (brute["vec_id"] == ivf["ivf_id"]),
        "left",
    ).select(brute["query_id"], "ivf_id")
    return joined.groupBy("query_id").agg(
        F.count("ivf_id").alias("n_hit"),
        F.round(F.count("ivf_id") / 10.0, 4).alias("recall_at_10"),
    )


# fixed linear scorer: exact rational weights, deterministic on both
# engines (products/sums run in identical array order)
_CAL_DIMS = 64
_CAL_W = [((i * 7) % 13 - 6) / 10.0 for i in range(_CAL_DIMS)]


@register(
    "ml_calibration_bins",
    f"""
    WITH w AS (SELECT {_CAL_W} ::DOUBLE[] AS wv),
    scored AS (
      SELECT CASE WHEN label >= 2 THEN 1 ELSE 0 END AS y,
             1.0 / (1.0 + exp(-list_sum(list_transform(
               range(1, {_CAL_DIMS} + 1),
               i -> embedding[i]::DOUBLE * wv[i])))) AS p
      FROM embeddings CROSS JOIN w),
    binned AS (
      SELECT y,
             CAST(least(floor(round(p, 9) * 10), 9) AS BIGINT) AS bin,
             CAST(round(round(p, 9) * 1000000) AS BIGINT) AS p_micro
      FROM scored)
    SELECT bin,
           count(*) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           round(sum(p_micro) / (1000000.0 * count(*)), 4) AS mean_p,
           round(sum(y) / CAST(count(*) AS DOUBLE), 4) AS frac_pos
    FROM binned GROUP BY bin
    """,
    "reliability-diagram calibration bins for a fixed linear scorer "
    "over embeddings (the model-ops check downstream of ml_logreg): "
    "sigmoid score snapped via round(.,9) before binning AND before "
    "micro-unit conversion, so bin membership and mean_p are exact-"
    "integer derived — no float boundary can move a row between bins; "
    "one map-only projection + ONE 10-row hash agg",
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    wv = F.array(*[F.lit(x) for x in _CAL_W])
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            wv,
            lambda x, w: x * w,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    p = F.round(1.0 / (1.0 + F.exp(-dot)), 9)
    scored = emb.select(
        (F.col("label") >= 2).cast("int").alias("y"),
        F.least(F.floor(p * 10), F.lit(9)).cast("bigint").alias("bin"),
        F.round(p * 1000000).cast("bigint").alias("p_micro"),
    )
    return scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.round(
            F.sum("p_micro") / (F.lit(1000000.0) * F.count(F.lit(1))), 4
        ).alias("mean_p"),
        F.round(
            F.sum("y") / F.count(F.lit(1)).cast("double"), 4
        ).alias("frac_pos"),
    )


@register(
    "p_mixture_reweight",
    """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT sum(n) AS total, count(*) AS n_langs FROM c)
    SELECT lang,
           n AS n_docs,
           round(n / CAST(total AS DOUBLE), 6) AS share,
           round(total / (CAST(n_langs AS DOUBLE) * n), 6) AS weight,
           round(total / CAST(n_langs AS DOUBLE), 2) AS target_docs
    FROM c CROSS JOIN tot
    ORDER BY lang
    """,
    "mixture-reweighting ledger: per-language resampling weight to hit "
    "a uniform target mix (weight = target_share/current_share) — the "
    "deterministic input to weighted sampling at scale; ONE lang-keyed "
    "hash agg + a 1-row total broadcast, every column a ratio of exact "
    "integers",
)
def p_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            F.round(F.col("n") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
            F.round(
                F.col("total")
                / (F.col("n_langs").cast("double") * F.col("n")),
                6,
            ).alias("weight"),
            F.round(
                F.col("total") / F.col("n_langs").cast("double"), 2
            ).alias("target_docs"),
        )
        .orderBy("lang")
    )


@register(
    "text_ngram_diversity",
    f"""
    WITH toks AS (
      SELECT doc_id, source, {tokens_sql('text')} AS t FROM documents
    ),
    tri AS (
      SELECT source,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      FROM toks WHERE len(t) >= 3
    )
    SELECT source,
           count(*) AS n_trigrams,
           count(DISTINCT g) AS n_distinct,
           round(count(DISTINCT g) / CAST(count(*) AS DOUBLE), 4)
             AS diversity
    FROM tri GROUP BY source ORDER BY source
    """,
    "corpus diversity per source: distinct-trigram ratio (low = "
    "templated/boilerplate-heavy slice, the self-BLEU-style diversity "
    "proxy). Plan shape (the text_entropy shape): tokens materialized "
    "BEFORE the explode (a composed tokenize+shingle generator child "
    "would re-evaluate per output row — SCALE.md §9.1, measured 65x), "
    "then TWO map-side-combinable hash aggs instead of an Expand-based "
    "count_distinct (measured 15s -> ~2s at sf0.1); all counts exact "
    "integers",
)
def text_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("source", tokens_expr("text").alias("_t"))
    tri = toks.select(
        "source", F.explode(shingles_expr("_t", 3)).alias("g")
    )
    per_gram = tri.groupBy("source", "g").agg(F.count(F.lit(1)).alias("_c"))
    return (
        per_gram.groupBy("source")
        .agg(
            F.sum("_c").alias("n_trigrams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(
                F.count(F.lit(1)) / F.sum("_c").cast("double"), 4
            ).alias("diversity"),
        )
        .orderBy("source")
    )


_ZIPF_TOP = 500


@register(
    "text_zipf_slope",
    f"""
    WITH toks AS (
      SELECT {tokens_sql('text')} AS t FROM documents
    ),
    freq AS (
      SELECT tok, count(*) AS f
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
      FROM freq
    ),
    pts AS (
      SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM ranked WHERE r <= {_ZIPF_TOP}
    )
    SELECT count(*) AS n_terms,
           round(
             (count(*) * sum(x * y) - sum(x) * sum(y))
             / CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE),
             6) AS zipf_slope
    FROM pts
    """,
    "Zipf-law slope of the term-frequency distribution (log-log OLS "
    "over the top-500 terms; natural text sits near -1, templated or "
    "synthetic slices drift): term hash-agg -> distributed TakeOrdered "
    "(orderBy+limit, never a global single-partition window over the "
    "full vocabulary) -> rank window on the 500 survivors -> OLS from "
    "EXACT sums (log coords snapped to integer micro-units, sums "
    "combined in decimal(38,0) — n*sum(xy) exceeds int64 at realistic "
    "corpus sizes; DuckDB's sum() is HUGEINT-exact already), so the "
    "slope is bit-identical across engines at any scale",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens_expr("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # TakeOrderedAndProject bounds the sort to per-partition top-500 +
    # a 500-row merge; the rank window then runs on 500 rows, not |vocab|
    top = freq.orderBy(F.desc("f"), "tok").limit(_ZIPF_TOP)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("f"), "tok"))
    )
    pts = ranked.select(
        F.round(F.log(F.col("r").cast("double")) * 1000000)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * 1000000)
        .cast("bigint")
        .alias("y"),
    )
    # OLS in decimal(38,0): n*sum(xy) and sum(x)*sum(y) exceed int64
    # once avg term freq passes ~1200 (ln(f)*1e6 micro-units) — Spark
    # bigint would wrap silently while DuckDB's sum() is already
    # HUGEINT-exact, so the sums are combined in decimal on this side
    # to stay bit-identical at any corpus size.
    n = F.count(F.lit(1))
    nd = n.cast("decimal(38,0)")
    sx = F.sum("x").cast("decimal(38,0)")
    sy = F.sum("y").cast("decimal(38,0)")
    sxy = F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)")
    sxx = F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)")
    return pts.agg(
        n.alias("n_terms"),
        F.round(
            (nd * sxy - sx * sy).cast("double")
            / (nd * sxx - sx * sx).cast("double"),
            6,
        ).alias("zipf_slope"),
    )


@register(
    "dedup_impact_ledger",
    None,  # filled below: reuses fingerprint_sql adjacent to the operator
    "before/after dedup ledger per source (the dataset-card number a "
    "curation run reports): exact-dedup keeper assignment -> per-source "
    "kept/dropped doc and char counts + retention — ONE fp window + ONE "
    "source-keyed agg, all outputs exact integers or integer ratios",
)
def dedup_impact_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    d = exact_dedup(docs, "doc_id")
    kept = (~F.col("is_dup")).cast("long")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.sum(kept * F.col("n_chars")).alias("chars_kept"),
            F.round(
                F.sum(kept) / F.count(F.lit(1)).cast("double"), 4
            ).alias("retention"),
        )
        .orderBy("source")
    )


def _install_dedup_impact_oracle() -> None:
    from jigsaw_spark.operators.text import fingerprint_sql
    from jigsaw_spark.plans.queries import QUERIES

    QUERIES["dedup_impact_ledger"].oracle = f"""
    WITH {_TOKS_CTE},
    fp AS (
      SELECT d.doc_id, d.source, d.n_chars, {fingerprint_sql('t')} AS fp
      FROM toks JOIN documents d USING (doc_id)),
    marked AS (
      SELECT source, n_chars,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY fp)
                  THEN 1 ELSE 0 END AS kept
      FROM fp)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(kept * n_chars) AS BIGINT) AS chars_kept,
           round(sum(kept) / CAST(count(*) AS DOUBLE), 4) AS retention
    FROM marked GROUP BY source ORDER BY source
    """


_install_dedup_impact_oracle()
