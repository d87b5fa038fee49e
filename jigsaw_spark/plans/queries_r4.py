"""Round-4 surface: corpus-global line dedup, SQ8 vector compression, and
distributed BPE tokenizer training.

- **Line-level dedup** (`dedup_lines`): C4's repeated-line rule — drop
  every (trimmed) line occurring in >= 2 distinct documents, reassemble
  the survivors in order. Exact oracle.
- **SQ8 scalar quantization** (`ann_sq8`): per-dimension [min,max] →
  8-bit codes + order-independent max reconstruction error. Exact oracle.
- **BPE trainer** (`text_bpe_train`): iterative most-frequent-pair
  merging over the weighted word table (Sennrich et al. 2016) — the
  merge-table result is checked rows-only here and bit-for-bit against a
  pure-Python reference in tests/test_bpe_train.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.operators.text import tokens_expr, tokens_sql
from jigsaw_spark.plans.queries import _t, register

_LINE_W = 5  # words per synthetic line (the corpus has no raw newlines)

# Build the identical pseudo-lined text on both engines: tokens chunked
# into 5-word lines joined by \n. DuckDB list slices are 1-based inclusive.
_PRE_SQL = f"""
    w AS (
      SELECT doc_id, {tokens_sql("text")} AS ws FROM documents
    ), pre AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 1 THEN
               array_to_string(
                 list_transform(
                   range(0, CAST(ceil(len(ws) / {_LINE_W}.0) AS INT)),
                   i -> array_to_string(ws[(i*{_LINE_W}+1):(i*{_LINE_W}+{_LINE_W})], ' ')),
                 chr(10))
             ELSE '' END AS ltext
      FROM w
    )"""


def _pre_lines(docs: DataFrame) -> DataFrame:
    ws = tokens_expr("text")
    nl = F.ceil(F.size(ws) / F.lit(float(_LINE_W))).cast("int")
    ltext = F.when(
        F.size(ws) >= 1,
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), nl - 1),
                lambda i: F.array_join(
                    F.slice(ws, i * _LINE_W + 1, _LINE_W), " "
                ),
            ),
            "\n",
        ),
    ).otherwise(F.lit(""))
    return docs.select("doc_id", ltext.alias("ltext"))


@register(
    "dedup_lines",
    f"""
    WITH {_PRE_SQL},
    lines AS (
      SELECT doc_id,
             generate_subscripts(string_split(ltext, chr(10)), 1) AS idx,
             unnest(string_split(ltext, chr(10))) AS line
      FROM pre
    ), dup AS (
      SELECT fp FROM (
        SELECT DISTINCT doc_id, md5(trim(line)) AS fp FROM lines) t
      GROUP BY fp HAVING count(*) >= 2
    )
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY idx) AS clean_text,
           count(*) AS n_lines_kept
    FROM lines
    WHERE md5(trim(line)) NOT IN (SELECT fp FROM dup)
    GROUP BY doc_id
    """,
    "C4 repeated-line dedup: posexplode -> ONE fp hash-agg (two-phase "
    "distinct-doc count) -> left-anti on fp (exchange reuse) -> ONE "
    "doc-keyed reassembly agg; nothing quadratic, dup set never collected",
)
def dedup_lines_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import dedup_lines

    docs = _t(spark, sf_dir, "documents")
    return dedup_lines(_pre_lines(docs), "doc_id", "ltext", "\n", min_docs=2)


@register(
    "ann_sq8",
    """
    WITH dims AS (
      SELECT generate_subscripts(embedding, 1) AS d,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    ), st AS (
      SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM (
        SELECT d, min(x) AS mn, max(x) AS mx FROM dims GROUP BY d) t
    )
    SELECT vec_id,
           array_to_string(list_transform(range(1, len(embedding) + 1), i ->
             CAST(round(
               CASE WHEN mxs[i] > mns[i]
                    THEN round((embedding[i]::DOUBLE - mns[i])
                               / (mxs[i] - mns[i]), 9)
                    ELSE 0.0 END * 255, 0) AS INT)), ',') AS codes_csv,
           round(list_max(list_transform(range(1, len(embedding) + 1), i ->
             abs(mns[i]
                 + CAST(round(
                     CASE WHEN mxs[i] > mns[i]
                          THEN round((embedding[i]::DOUBLE - mns[i])
                                     / (mxs[i] - mns[i]), 9)
                          ELSE 0.0 END * 255, 0) AS INT) / 255.0
                   * (mxs[i] - mns[i])
                 - embedding[i]::DOUBLE))), 9) AS max_abs_err
    FROM embeddings CROSS JOIN st
    """,
    "SQ8 scalar quantization: ONE dim-keyed hash agg (64 rows, map-side "
    "combinable) collected KB-scale, then a map-only JVM transform — the "
    "corpus never shuffles; error metric is max (order-independent). "
    "Codes emitted as a CSV string: the driver's pandas canonicalizer "
    "cannot sort array-typed columns (r2 ERR), so no array column ever "
    "reaches the result surface.",
)
def ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import sq8_quantize

    return sq8_quantize(_t(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.array_join(F.col("codes"), ",").alias("codes_csv"),
        "max_abs_err",
    )


@register(
    "text_bpe_train",
    None,  # iterative argmax sequence is not SQL-expressible; bit-exact
    # parity vs a pure-Python reference in tests/test_bpe_train.py
    "distributed BPE training: corpus collapsed ONCE to a weighted vocab "
    "table; per merge round a map-side pair explode + ONE hash agg + "
    "top-1 TakeOrdered + JVM fold rewrite; lineage checkpoint every 5",
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges, _vocab = bpe_train(docs, "text", n_merges=10)
    return merges


def _mmr_stage_sql(i: int, lam: float = 0.7) -> str:
    """Stage i (1-based) of the unrolled greedy MMR oracle: score every
    not-yet-picked vector against picks p1..p(i-1), take the argmax."""
    if i == 1:
        return (
            f"s1 AS (SELECT vec_id, v, rel, round({lam}*rel, 9) AS mmr FROM rel),\n"
            "    p1 AS (SELECT * FROM s1 ORDER BY mmr DESC, vec_id LIMIT 1)"
        )
    sims = ", ".join(
        f"round(list_cosine_similarity(r.v, p{j}.v), 9)" for j in range(1, i)
    )
    joins = " ".join(f"CROSS JOIN p{j}" for j in range(1, i))
    excl = " AND ".join(f"r.vec_id <> p{j}.vec_id" for j in range(1, i))
    maxs = f"greatest({sims})" if i > 2 else sims
    return (
        f"s{i} AS (SELECT r.vec_id, r.v, r.rel,\n"
        f"      round({lam}*r.rel - {round(1-lam, 9)}*{maxs}, 9) AS mmr\n"
        f"      FROM rel r {joins} WHERE {excl}),\n"
        f"    p{i} AS (SELECT * FROM s{i} ORDER BY mmr DESC, vec_id LIMIT 1)"
    )


_MMR_K = 5
_MMR_STAGES = ",\n    ".join(_mmr_stage_sql(i) for i in range(1, _MMR_K + 1))
_MMR_UNION = "\n      UNION ALL ".join(
    f"SELECT {i - 1} AS rank, vec_id, rel AS relevance, mmr AS mmr_score FROM p{i}"
    for i in range(1, _MMR_K + 1)
)


@register(
    "ann_mmr_select",
    f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM c WHERE vec_id = 0),
    rel AS (SELECT vec_id, v,
                   round(list_cosine_similarity(v, qv), 9) AS rel
            FROM c CROSS JOIN q),
    {_MMR_STAGES}
    {_MMR_UNION}
    """,
    "greedy MMR diverse top-k: k rounds of ONE corpus scan + top-1 "
    "TakeOrdered; the selected set rides as a KB literal array, the "
    "corpus never shuffles and nothing but 1 row/round is collected. "
    "Oracle = the same greedy argmax unrolled to k CTE stages.",
)
def ann_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import mmr_select

    emb = _t(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    return mmr_select(emb, qv, k=_MMR_K, lam=0.7)


@register(
    "text_bpe_encode",
    None,  # merge-table application is iterative; bit-exact parity vs the
    # pure-Python reference + train/encode agreement in tests
    "BPE encode at corpus scale: merges ride the task closure (KB), ONE "
    "map-only Arrow kernel with a per-batch word cache (vocab-not-corpus "
    "work), zero shuffle. Registered form emits SCALARS only (the array "
    "column stays in the bpe_encode API for callers; array-typed output "
    "cells are a driver ERR class — r5 red, PLANS.md ban).",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges_df, _ = bpe_train(docs, "text", n_merges=10)
    merges = [
        (r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()
    ]
    enc = bpe_encode(docs, merges, "doc_id", "text")
    return enc.select(
        "doc_id",
        F.concat_ws("▁", "pieces").alias("pieces_str"),
        "n_pieces",
    )


@register(
    "text_entropy",
    f"""
    WITH ch AS (
      SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
                                           i -> text[i])) AS ch
      FROM documents
    ), counts AS (
      SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_chars,
           round(round(ln(CAST(sum(c) AS DOUBLE))
                 - sum(CAST(c AS DOUBLE) * ln(c)) / CAST(sum(c) AS DOUBLE),
                 9), 4) AS entropy_nats,
           count(*) AS n_distinct_chars
    FROM counts GROUP BY doc_id
    """,
    "char-level Shannon entropy (gibberish/OCR-garbage signal) in the "
    "algebraic one-pass form H = ln n - (sum c ln c)/n: one explode + two "
    "map-side-combinable hash aggs, no window, no per-doc state; "
    "double-round (9 then 4 digits) on BOTH sides snaps libm/sum-order "
    "noise before the coarse round (r2 flake fix)",
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"), "doc_id")


@register(
    "fn_udtf_lateral",
    f"""
    WITH w AS (
      SELECT doc_id, {tokens_sql("text")} AS ws FROM documents
    )
    SELECT doc_id, i AS chunk_idx,
           array_to_string(ws[(i*8+1):(i*8+8)], ' ') AS chunk,
           len(ws[(i*8+1):(i*8+8)]) AS n_tokens
    FROM w, LATERAL (
      SELECT unnest(range(0, CAST(ceil(len(ws) / 8.0) AS INT))) AS i) t
    WHERE len(ws) >= 1
    """,
    "Spark 4 Python UDTF surface (arrow-optimized) via lateralJoin: one "
    "row per 8-token window. API-surface query — the expression-only "
    "chunker (text_chunk) is the production path; this pins the UDTF "
    "execution path to the same semantics",
)
def fn_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.udtfs import ChunkText

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.lateralJoin(
        ChunkText(F.col("text").outer(), F.lit(8).outer())
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


# DEREGISTERED (r6, verdict #6): float-GD twin whose trainer
# (operators/ml.logreg_train) is numpy-parity-tested in
# tests/test_r4_ops.py; as a registered query it could only produce a
# permanent `no_oracle` err row. Kept as a library entry point.
def ml_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.ml import logreg_train

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "y", (F.col("label") >= 2).cast("int")
    )
    w, b, history = logreg_train(
        emb, "y", "embedding", n_iters=5, lr=0.5, l2=0.01
    )
    rows = [(-1, float(b))] + [(d, float(x)) for d, x in enumerate(w)]
    return spark.createDataFrame(rows, "dim int, weight double")


@register(
    "ml_hash_features",
    None,  # filled below after import to keep the SQL twin adjacent
    "feature hashing (hashing trick): md5-stream index+sign per "
    "col=value token, pure map-side JVM transform — no vocabulary "
    "table, no shuffle, unbounded categorical domains. The ±1-sum "
    "vector is emitted as an int CSV string (values are exact signed "
    "counts): the driver's pandas canonicalizer cannot sort array "
    "columns (r2 ERR).",
)
def ml_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.ml import hash_features

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return hash_features(docs, ["lang", "source"], dims=16).select(
        "doc_id",
        F.array_join(
            F.transform(F.col("features"), lambda x: x.cast("int")), ","
        ).alias("features_csv"),
    )


def _install_hash_features_oracle() -> None:
    from jigsaw_spark.operators.ml import hash_features_sql
    from jigsaw_spark.plans.queries import QUERIES

    QUERIES["ml_hash_features"].oracle = f"""
    SELECT doc_id,
           array_to_string(
             list_transform({hash_features_sql(['lang', 'source'], dims=16)},
                            x -> x::INT),
             ',') AS features_csv
    FROM documents
    """


_install_hash_features_oracle()


from jigsaw_spark.plans.queries_llm import _SHINGLES_CTE, _TOKS_CTE  # noqa: E402


@register(
    "dedup_lsh_recall",
    f"""
    WITH {_TOKS_CTE}, {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
    mh AS (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, band),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig
                  AND a.doc_id < b.doc_id),
    joined AS (
      SELECT coalesce(t.in_t, 0) AS in_t, coalesce(c.in_c, 0) AS in_c
      FROM (SELECT doc_a, doc_b, 1 AS in_t FROM truth) t
      FULL OUTER JOIN (SELECT doc_a, doc_b, 1 AS in_c FROM cand) c
      USING (doc_a, doc_b))
    SELECT CAST(sum(in_t) AS BIGINT) AS n_truth,
           CAST(sum(in_c) AS BIGINT) AS n_cand,
           CAST(sum(in_t * in_c) AS BIGINT) AS n_hit,
           round(CAST(sum(in_t * in_c) AS DOUBLE)
                 / nullif(sum(in_t), 0), 4) AS recall,
           round(CAST(sum(in_t * in_c) AS DOUBLE)
                 / nullif(sum(in_c), 0), 4) AS precision
    FROM joined
    """,
    "self-evaluating dedup: MinHash-LSH candidate recall/precision "
    "against exact trigram-Jaccard>=0.5 ground truth — the tuning query "
    "for (num_hashes, bands) at scale; both sides are the production "
    "operators, joined full-outer and counted in one agg",
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    # max_posting caps the exact-truth inverted-index self-join — without
    # it the truth side is quadratic on boilerplate shingles. 1000 never
    # binds at sf0.01 (500 docs — SQL twin stays the uncapped form,
    # asserted equal in tests/test_r4_ops.py), and at 100 TB this tuning
    # query runs on a sample anyway; the cap makes it safe to point at
    # the full corpus by mistake.
    truth = ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.5, max_posting=1000
    ).select("doc_a", "doc_b", F.lit(1).alias("in_t"))
    cand = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4).select(
        "doc_a", "doc_b", F.lit(1).alias("in_c")
    )
    joined = truth.join(cand, ["doc_a", "doc_b"], "full").select(
        F.coalesce("in_t", F.lit(0)).alias("in_t"),
        F.coalesce("in_c", F.lit(0)).alias("in_c"),
    )
    hit = F.sum(F.col("in_t") * F.col("in_c"))
    return joined.agg(
        F.sum("in_t").cast("bigint").alias("n_truth"),
        F.sum("in_c").cast("bigint").alias("n_cand"),
        hit.cast("bigint").alias("n_hit"),
        F.round(
            hit.cast("double") / F.nullif(F.sum("in_t"), F.lit(0)), 4
        ).alias("recall"),
        F.round(
            hit.cast("double") / F.nullif(F.sum("in_c"), F.lit(0)), 4
        ).alias("precision"),
    )


@register(
    "dedup_incremental",
    f"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string({tokens_sql('text')}, ' ')) AS fp
      FROM documents),
    corpus AS (SELECT DISTINCT fp FROM fp WHERE source <> 'src0')
    SELECT f.doc_id, f.fp,
           c.fp IS NULL AS is_new
    FROM fp f LEFT JOIN corpus c USING (fp)
    WHERE f.source = 'src0'
    """,
    "incremental crawl dedup (F8 at corpus granularity): the new batch "
    "anti-checks its normalization fingerprints against the existing "
    "corpus — one fp hash-agg + one fp-keyed join, the daily-ingest "
    "shape; the corpus side never rescans payloads",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import fingerprint_expr, tokens_expr

    docs = _t(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "source", fingerprint_expr(tokens_expr("text")).alias("fp")
    )
    corpus = fp.filter(F.col("source") != "src0").select("fp").distinct()
    new = fp.filter(F.col("source") == "src0")
    return new.join(
        corpus.withColumn("_hit", F.lit(1)), "fp", "left"
    ).select("doc_id", "fp", F.col("_hit").isNull().alias("is_new"))


_CMS_HASH = (
    "('0x' || substr(md5(concat_ws('|', 'cms', "
    "concat_ws('|', d, term))), 1, 12))::UBIGINT % 256"
)


@register(
    "agg_countmin_hh",
    f"""
    WITH {_TOKS_CTE},
    tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
    exact AS (SELECT term, count(*) AS exact_n FROM tok GROUP BY term),
    top AS (SELECT term, exact_n FROM exact
            ORDER BY exact_n DESC, term LIMIT 10),
    depths AS (SELECT unnest(range(4)) AS d),
    cms AS (
      SELECT d, {_CMS_HASH} AS cell, count(*) AS n
      FROM tok CROSS JOIN depths GROUP BY d, cell),
    est AS (
      SELECT term, min(n) AS est_n
      FROM (SELECT t.term, c.n
            FROM (SELECT term, d, {_CMS_HASH} AS cell
                  FROM top CROSS JOIN depths) t
            JOIN cms c ON c.d = t.d AND c.cell = t.cell)
      GROUP BY term)
    SELECT top.term, top.exact_n, est.est_n,
           est.est_n - top.exact_n AS overestimate
    FROM top JOIN est USING (term)
    """,
    "Count-Min sketch heavy hitters: the sketch is ONE map-side-"
    "combinable hash agg into depth x width = 1024 cells (fixed-size "
    "summary, mergeable by cell-wise add — the frequency analog of "
    "HLL); estimates = min over depths, overestimate bound checked "
    "against exact counts",
)
def agg_countmin_hh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.aggregates import (
        countmin_estimate,
        countmin_table,
    )
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_expr("text")).alias("term"))
    # ONE corpus explode: the sketch is built from the per-term exact
    # counts (cell count = Σ term counts — identical by construction),
    # so the md5 cell hash runs once per distinct term instead of once
    # per instance, and the corpus is never exploded a second time
    exact = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("exact_n")
    ).localCheckpoint()
    top = exact.orderBy(F.desc("exact_n"), "term").limit(10)
    cms = countmin_table(exact, weight="exact_n")
    est = countmin_estimate(top.select("term"), cms)
    return top.join(est, "term").select(
        "term",
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overestimate"),
    )


_EQUIDEPTH_FRACS = [i / 8 for i in range(1, 8)]


@register(
    "agg_equidepth",
    f"""
    WITH b AS (
      SELECT list_transform(
               quantile_cont(o_totalprice, {_EQUIDEPTH_FRACS}),
               v -> round(v, 4)) AS q
      FROM orders),
    r AS (
      SELECT o_totalprice AS x,
             1 + len(list_filter(q, v -> x >= v)) AS bucket
      FROM orders CROSS JOIN b)
    SELECT bucket, count(*) AS n,
           min(x) AS lo, max(x) AS hi,
           CAST(round(sum(CAST(x AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM r GROUP BY bucket
    """,
    "equi-depth histogram the scale-correct way: ONE exact-percentile "
    "agg yields 7 boundaries (KB collect), then a map-side bucket "
    "assignment + ONE hash agg — no global sort, no ntile window over "
    "the whole table (the naive formulation that serializes at 100 TB)",
)
def agg_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries import dec2

    orders = _t(spark, sf_dir, "orders")
    bnds = orders.agg(
        F.percentile("o_totalprice", _EQUIDEPTH_FRACS).alias("q")
    ).collect()[0]["q"]
    bl = [round(float(v), 4) for v in bnds]
    bucket = (
        F.lit(1)
        + sum(
            (F.col("o_totalprice") >= F.lit(v)).cast("int") for v in bl
        )
    ).alias("bucket")
    return (
        orders.select(F.col("o_totalprice").alias("x"), bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
            F.round(F.sum(dec2("x", 18)), 2).cast("double").alias("total"),
        )
    )


@register(
    "graph_triangles_total",
    f"""
    WITH {_TOKS_CTE}, {_SHINGLES_CTE},
    mh AS (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, band),
    e AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig
                  AND a.doc_id < b.doc_id)
    SELECT (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*)
            FROM e e1 JOIN e e2 ON e2.u = e1.v
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
           ) AS n_triangles
    """,
    "GLOBAL triangle count over the near-dup candidate graph (cluster-"
    "density signal; the per-node counts are graph_triangles in the r10 "
    "batch — this name was shadowed by it from r5 until the r6 "
    "duplicate-registration guard surfaced the collision): oriented "
    "edges (u<v) so each triangle joins exactly once "
    "— the standard degree-bounded triple join; at 100 TB the edge list "
    "is the LSH output, orders smaller than the corpus",
)
def graph_triangles_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    e = (
        minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint()
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .count()
    )
    return spark.createDataFrame(
        [(e.count(), tri)], "n_edges long, n_triangles long"
    )


def _dq_rules():
    from jigsaw_spark.operators.dq import Rule

    return [
        Rule("not_null", "o_custkey"),
        Rule("in_range", "o_totalprice", lo=0.0, hi=600000.0),
        Rule("accepted_values", "o_orderstatus", values=("O", "F", "P")),
        Rule("matches", "o_orderpriority", pattern="^[1-5]-"),
        Rule("unique", "o_orderkey"),
        # thresholded rule: most orders are terminal (O/F); P is rare
        Rule("accepted_values", "o_orderstatus", values=("O", "F"),
             min_fraction=0.8),
    ]


@register(
    "dq_expectations",
    None,  # installed below from the operator's adjacent SQL renderer
    "deequ-lite expectations: six rules (not-null, range, accepted "
    "values, regex, uniqueness, thresholded not-null) compiled into ONE "
    "scan — shared hash-agg buffer + count-distinct in the same pass; "
    "output is |rules| rows, lazily planned",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dq import dq_check

    return dq_check(_t(spark, sf_dir, "orders"), _dq_rules())


def _install_dq_oracle() -> None:
    from jigsaw_spark.operators.dq import dq_oracle_sql
    from jigsaw_spark.plans.queries import QUERIES

    QUERIES["dq_expectations"].oracle = dq_oracle_sql("orders", _dq_rules())


_install_dq_oracle()


@register(
    "rel_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey,
             md5(concat(
                 CASE WHEN o_orderstatus IS NULL THEN 'N'
                      ELSE 'V' || length(o_orderstatus) || ':'
                           || o_orderstatus END,
                 CASE WHEN o_totalprice IS NULL THEN 'N'
                      ELSE 'V' || length(CAST(o_totalprice AS VARCHAR))
                           || ':' || CAST(o_totalprice AS VARCHAR) END
             )) AS _oh
      FROM orders),
    new AS (
      SELECT o_orderkey,
             md5(concat(
                 CASE WHEN s IS NULL THEN 'N'
                      ELSE 'V' || length(s) || ':' || s END,
                 CASE WHEN o_totalprice IS NULL THEN 'N'
                      ELSE 'V' || length(CAST(o_totalprice AS VARCHAR))
                           || ':' || CAST(o_totalprice AS VARCHAR) END
             )) AS _nh
      FROM (SELECT o_orderkey, o_totalprice,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'F'
                        ELSE o_orderstatus END AS s
            FROM orders WHERE o_orderkey % 11 <> 0))
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o._oh IS NULL THEN 'added'
                WHEN n._nh IS NULL THEN 'removed'
                WHEN o._oh <> n._nh THEN 'changed' END AS change
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    WHERE CASE WHEN o._oh IS NULL THEN 'added'
               WHEN n._nh IS NULL THEN 'removed'
               WHEN o._oh <> n._nh THEN 'changed' END IS NOT NULL
    """,
    "snapshot diff (CDC derivation without a log): full-outer on the "
    "key + md5 row-hash change detection — wide-row comparison collapses "
    "to one string equality; unchanged rows (the 100 TB majority) are "
    "never materialized. New snapshot simulated deterministically: "
    "orderkey%7 status flip, orderkey%11 deletions",
)
def rel_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.joins import snapshot_diff

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("F")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    return snapshot_diff(orders, new, ["o_orderkey"])


@register(
    "rel_scd2_intervals",
    """
    WITH runs AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run
      FROM runs),
    collapsed AS (
      SELECT user_id, run,
             min_by(event_type, ts) AS state,
             min(ts) AS valid_from
      FROM numbered GROUP BY user_id, run)
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to
    FROM collapsed
    """,
    "SCD2 history from a change log: consecutive identical states "
    "collapse into one validity interval (lag-change running sum -> run "
    "groupBy -> lead); ONE key shuffle shared by both windows",
)
def rel_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.joins import scd2_intervals

    events = _t(spark, sf_dir, "events")
    return scd2_intervals(events, "user_id", "event_type", tiebreak_col="event_id")


@register(
    "agg_mad_outliers",
    """
    WITH c AS (
      SELECT o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS pc
      FROM orders),
    med AS (
      SELECT CAST(2 * quantile_cont(pc, 0.5) AS BIGINT) AS med2 FROM c),
    dev AS (
      SELECT o_orderstatus, abs(2 * pc - med2) AS adev_h
      FROM c CROSS JOIN med),
    mad AS (
      SELECT CAST(2 * quantile_cont(adev_h, 0.5) AS BIGINT) AS mad2 FROM dev)
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CASE WHEN 20000 * adev_h > 44478 * mad2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev CROSS JOIN mad
    GROUP BY o_orderstatus
    """,
    "robust outlier flagging via median/MAD (the skew-proof z-score): "
    "two exact-percentile aggs, each a 1-row broadcast back into the "
    "scan — never a sort, never a collect of the data column. The whole "
    "chain runs in exact half-cent integers (prices are cent-valued; "
    "median/MAD midpoints are exact half-cents, so 2x them is integral) "
    "and the 3*1.4826 threshold compares scaled integers "
    "(20000*adev_h > 44478*mad2) — no float boundary can flip a count "
    "between engines (r2 hash-flake fix)",
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("pc"),
    )
    med = orders.agg(
        (2 * F.percentile("pc", F.lit(0.5))).cast("bigint").alias("med2")
    )
    dev = orders.crossJoin(F.broadcast(med)).select(
        "o_orderstatus",
        F.abs(2 * F.col("pc") - F.col("med2")).alias("adev_h"),
    )
    mad = dev.agg(
        (2 * F.percentile("adev_h", F.lit(0.5))).cast("bigint").alias("mad2")
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (20000 * F.col("adev_h") > 44478 * F.col("mad2")).cast("long")
            ).alias("n_outliers"),
        )
    )


_EWM_ALPHA = 0.3
_EWM_WIN = 20


@register(
    "ts_ewma",
    f"""
    WITH arrs AS (
      SELECT user_id, ts, event_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN {_EWM_WIN - 1} PRECEDING
                               AND CURRENT ROW) AS w
      FROM events)
    SELECT user_id, event_id,
           round(
             list_sum(list_transform(list_reverse(w),
                      (x, i) -> x * power({1 - _EWM_ALPHA}, i - 1)))
             / list_sum(list_transform(list_reverse(w),
                      (x, i) -> power({1 - _EWM_ALPHA}, i - 1))),
             6) AS ewma
    FROM arrs
    """,
    "window-truncated exponentially-weighted mean (pandas ewm "
    "adjust=True semantics over a 20-row frame): the collected frame is "
    "bounded, so per-row state is O(window) not O(history) — the "
    "scale-safe EWMA form; ONE key shuffle",
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWM_WIN - 1), 0)
    )
    arr = F.reverse(F.collect_list("value").over(w))
    decay = F.transform(
        arr, lambda x, i: F.pow(F.lit(1 - _EWM_ALPHA), i.cast("double"))
    )
    num = F.aggregate(
        F.zip_with(arr, decay, lambda x, d: x * d),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = F.aggregate(decay, F.lit(0.0), lambda a, x: a + x)
    return events.select(
        "user_id", "event_id", F.round(num / den, 6).alias("ewma")
    )


@register(
    "curation_pipeline_v2",
    f"""
    WITH {_PRE_SQL},
    lines AS (
      SELECT doc_id,
             generate_subscripts(string_split(ltext, chr(10)), 1) AS idx,
             unnest(string_split(ltext, chr(10))) AS line
      FROM pre
    ), dup AS (
      SELECT fp FROM (
        SELECT DISTINCT doc_id, md5(trim(line)) AS fp FROM lines) t
      GROUP BY fp HAVING count(*) >= 2
    ), cleaned AS (
      SELECT doc_id,
             string_agg(line, chr(10) ORDER BY idx) AS clean_text
      FROM lines
      WHERE md5(trim(line)) NOT IN (SELECT fp FROM dup)
      GROUP BY doc_id
    ), ch AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(clean_text) + 1),
                                   i -> clean_text[i])) AS ch
      FROM cleaned
    ), counts AS (
      SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch
    ), ent AS (
      SELECT doc_id,
             round(ln(CAST(sum(c) AS DOUBLE))
                   - sum(CAST(c AS DOUBLE) * ln(c)) / CAST(sum(c) AS DOUBLE),
                   4) AS entropy
      FROM counts GROUP BY doc_id
    )
    SELECT d.source,
           count(*) AS n_docs_kept,
           round(avg(e.entropy), 3) AS avg_entropy
    FROM ent e JOIN documents d USING (doc_id)
    WHERE e.entropy > 2.0
    GROUP BY d.source
    """,
    "round-4 curation composite: line-level dedup -> char-entropy gate "
    "-> per-source retention report; every stage is the production "
    "operator, chained lazily — dedup's fp agg, entropy's two aggs, a "
    "doc_id-keyed join back to source",
)
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import dedup_lines
    from jigsaw_spark.operators.text import char_entropy

    docs = _t(spark, sf_dir, "documents")
    cleaned = dedup_lines(_pre_lines(docs), "doc_id", "ltext", "\n", 2)
    ent = char_entropy(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    ).select("doc_id", F.col("entropy_nats").alias("entropy"))
    kept = ent.filter(F.col("entropy") > 2.0)
    return (
        # the (doc_id, source) side is corpus-sized — shuffle join on the
        # key, NOT a broadcast (AQE may still choose one at small SF)
        kept.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.round(F.avg("entropy"), 3).alias("avg_entropy"),
        )
    )


_IV_SPAN_US = 300_000_000  # each event opens a 5-minute activity interval


@register(
    "ts_interval_union",
    f"""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s, epoch_us(ts) + {_IV_SPAN_US} AS e
      FROM events),
    flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) >= s
                  THEN 0 ELSE 1 END AS new_grp
      FROM iv),
    grouped AS (
      SELECT user_id, s, e,
             sum(new_grp) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS grp
      FROM flagged),
    merged AS (
      SELECT user_id, grp, min(s) AS ms, max(e) AS me
      FROM grouped GROUP BY user_id, grp)
    SELECT user_id,
           count(*) AS n_intervals,
           CAST(sum(me - ms) AS BIGINT) AS active_us
    FROM merged GROUP BY user_id
    """,
    "interval-union (merged activity time): the distributed sweep-line "
    "— running-max-end flags island starts, running sum numbers them, "
    "ONE key shuffle shared by both windows and the merge agg; exact "
    "integer-microsecond arithmetic. Both windows order by the same "
    "total key (s, event_id): ordering the running sum by (s, e) was "
    "ambiguous on tied starts (e is s + a constant), so a tied row "
    "could attach to the wrong island depending on partitioning "
    "(advisor finding, r2)",
)
def ts_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_IV_SPAN_US)).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(F.max("e").over(w_prev) >= F.col("s"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_grp"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = flagged.withColumn("grp", F.sum("new_grp").over(w_run))
    merged = grouped.groupBy("user_id", "grp").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("me") - F.col("ms")).cast("bigint").alias("active_us"),
    )


@register(
    "sql_scripting_threshold",
    """
    WITH t AS (
      SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total
      FROM orders),
    b AS (
      SELECT CAST(ceil(o_totalprice / 50000) AS BIGINT) * 50000 AS bi,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
      FROM orders GROUP BY 1),
    c AS (
      SELECT bi, sum(s) OVER (ORDER BY bi) AS cum FROM b)
    SELECT bi AS threshold, round(cum / total, 6) AS cum_frac
    FROM c CROSS JOIN t
    WHERE cum >= 0.5 * total
    ORDER BY bi LIMIT 1
    """,
    "Spark 4 SQL scripting (BEGIN/DECLARE/WHILE): iterative revenue-"
    "median threshold search — each round is one pushdown-filtered agg "
    "scan; the oracle solves the same fixpoint in closed form "
    "(bucketed cumulative sum), proving the loop's answer",
)
def sql_scripting_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    try:
        spark.conf.set("spark.sql.scripting.enabled", "true")
    except Exception:
        pass
    return spark.sql(
        """
        BEGIN
          DECLARE total DOUBLE;
          DECLARE cum DOUBLE = 0.0;
          DECLARE t BIGINT = 0;
          SET total = (
            SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            FROM orders);
          WHILE cum < 0.5 * total DO
            SET t = t + 50000;
            SET cum = (
              SELECT coalesce(
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
                0.0)
              FROM orders WHERE o_totalprice <= t);
          END WHILE;
          SELECT t AS threshold, round(cum / total, 6) AS cum_frac;
        END
        """
    )


@register(
    "p_group_split",
    f"""
    SELECT doc_id, source,
           CASE WHEN ('0x' || substr(md5(concat_ws('|', 'gsplit-42',
                        CAST(source AS VARCHAR))), 1, 12))::UBIGINT
                     % 1000 < 200
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
    "group-integrity split (GroupShuffleSplit): the md5 stream keys on "
    "the GROUP (source), so every doc of a group lands in the same "
    "split — no leakage between train and test; map-only, "
    "partition-independent, ~20% of groups to test",
)
def p_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.hashing import md5_key

    docs = _t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(md5_key("source", seed="gsplit-42"), 1, 12), 16, 10)
        .cast("bigint"),
        F.lit(1000),
    )
    return docs.select(
        "doc_id",
        "source",
        F.when(bucket < 200, F.lit("test")).otherwise(F.lit("train")).alias(
            "split"
        ),
    )


@register(
    "mine_assoc_pairs",
    """
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    sup AS (SELECT event_type, count(*) AS s FROM b GROUP BY event_type),
    pair AS (
      SELECT a.event_type AS lhs, c.event_type AS rhs, count(*) AS s_ab
      FROM b a JOIN b c ON a.user_id = c.user_id
                       AND a.event_type < c.event_type
      GROUP BY 1, 2)
    SELECT lhs, rhs, s_ab,
           round(CAST(s_ab AS DOUBLE) / n_users, 6) AS support,
           round(CAST(s_ab AS DOUBLE) / sa.s, 6) AS confidence,
           round(CAST(s_ab AS DOUBLE) * n_users / (sa.s * sb.s), 6) AS lift
    FROM pair
    JOIN sup sa ON sa.event_type = lhs
    JOIN sup sb ON sb.event_type = rhs
    CROSS JOIN n
    """,
    "market-basket pair mining (frequent itemsets k=2): baskets = "
    "distinct (user, type) — ONE dedup agg, a basket-keyed self-join "
    "bounded by basket size (|types| small), support/confidence/lift "
    "from broadcast 1-row total + item-support dims",
)
def mine_assoc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    b = events.select("user_id", "event_type").distinct()
    n_users = b.select("user_id").distinct().count()
    sup = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("s"))
    a, c = b.alias("a"), b.alias("c")
    pair = (
        a.join(
            c,
            (F.col("a.user_id") == F.col("c.user_id"))
            & (F.col("a.event_type") < F.col("c.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("lhs"),
            F.col("c.event_type").alias("rhs"),
        )
        .agg(F.count(F.lit(1)).alias("s_ab"))
    )
    sa = F.broadcast(sup.select(F.col("event_type").alias("lhs"), F.col("s").alias("sa")))
    sb = F.broadcast(sup.select(F.col("event_type").alias("rhs"), F.col("s").alias("sb")))
    return (
        pair.join(sa, "lhs")
        .join(sb, "rhs")
        .select(
            "lhs",
            "rhs",
            "s_ab",
            F.round(F.col("s_ab").cast("double") / n_users, 6).alias("support"),
            F.round(F.col("s_ab").cast("double") / F.col("sa"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("s_ab").cast("double") * n_users
                / (F.col("sa") * F.col("sb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "agg_gini",
    """
    WITH x AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT v, row_number() OVER (ORDER BY v, o_custkey) AS i FROM x),
    t AS (SELECT count(*) AS n, sum(v) AS tot FROM r)
    SELECT round(2.0 * sum(i * v) / (n * tot) - (n + 1.0) / n, 6) AS gini,
           CAST(n AS BIGINT) AS n_customers
    FROM r CROSS JOIN t GROUP BY n, tot
    """,
    "Gini coefficient of per-customer revenue (concentration/inequality "
    "report): exact-decimal per-key sums, then ONE global rank over the "
    "customer AGGREGATE (not the fact table) + one agg. The 1-partition "
    "window is the documented small-aggregate choice; past ~5M keys the "
    "swap is samples._ranked's distributed zipWithIndex arm "
    "(range-partition + per-partition offsets)",
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jigsaw_spark.plans.queries import dec2

    orders = _t(spark, sf_dir, "orders")
    x = orders.groupBy("o_custkey").agg(
        F.sum(dec2("o_totalprice", 18)).cast("double").alias("v")
    )
    r = x.withColumn(
        "i", F.row_number().over(Window.orderBy("v", "o_custkey"))
    )
    t = r.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("tot")
    )
    return (
        r.crossJoin(F.broadcast(t))
        .groupBy("n", "tot")
        .agg(
            F.round(
                2.0 * F.sum(F.col("i") * F.col("v")) / (F.col("n") * F.col("tot"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
            F.col("n").cast("bigint").alias("n_customers"),
        )
        .select("gini", "n_customers")
    )


@register(
    "text_bigram_logprob",
    f"""
    WITH {_TOKS_CTE},
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS bigram,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1
      FROM toks WHERE len(t) >= 2),
    cb AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY bigram),
    cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY w1),
    v AS (SELECT count(DISTINCT w) AS v
          FROM (SELECT unnest(t) AS w FROM toks) q),
    scored AS (
      SELECT g.doc_id,
             -ln((cb.cb + 0.5) / (cu.cu + 0.5 * v.v)) AS nll
      FROM bg g JOIN cb USING (bigram) JOIN cu USING (w1) CROSS JOIN v)
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(nll), 4) AS neg_logprob
    FROM scored GROUP BY doc_id
    """,
    "corpus bigram LM with add-0.5 smoothing: one bigram explode feeds "
    "BOTH the LM aggregation and the scoring join (same key, exchange "
    "reuse); vocabulary size is a 1-row broadcast; per-doc mean -ln p — "
    "the next-order KenLM-lite curation signal above text_unigram_logprob",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_expr("text").alias("t")).filter(
        F.size("t") >= 2
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.concat_ws(
                        " ", F.element_at("t", i), F.element_at("t", i + F.lit(1))
                    ).alias("bigram"),
                    F.element_at("t", i).alias("w1"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.bigram", "p.w1")
    cb = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    cu = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    v = (
        docs.select(F.explode(tokens_expr("text")).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    nll = -F.log(
        (F.col("cb") + 0.5) / (F.col("cu") + 0.5 * F.col("v"))
    )
    return (
        bg.join(cb, "bigram")
        .join(cu, "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 4).alias("neg_logprob"),
        )
    )


@register(
    "fn_collation",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           count(DISTINCT lower(o_orderstatus)) AS n_status_ci,
           min(lower(o_orderstatus)) AS first_status_ci
    FROM orders
    GROUP BY o_orderpriority
    """,
    "Spark 4 collation surface: UTF8_LCASE comparison/grouping — "
    "case-insensitive distinct and min push into the collated column "
    "(no lower() wrapper on the engine side; the oracle replays with "
    "lower() which is value-equivalent for ASCII data)",
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    ci = F.collate(F.col("o_orderstatus"), "UTF8_LCASE")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(ci).alias("n_status_ci"),
        F.lower(F.min(ci)).cast("string").alias("first_status_ci"),
    )


_CUSUM_K = 3.0


@register(
    "ts_cusum_changepoints",
    """
    WITH c0 AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS vi
      FROM events),
    stats AS (
      SELECT count(*) AS n, sum(vi) AS t,
             sum(CAST(vi AS HUGEINT) * vi) AS q
      FROM c0),
    c AS (
      SELECT user_id, n, t, q,
             n * sum(vi) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)
             - count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) * t AS d
      FROM c0 CROSS JOIN stats)
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CASE WHEN CAST(d AS HUGEINT) * d
                              > 90 * (n * q - CAST(t AS HUGEINT) * t)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
           round(max(abs(d)) / (100.0 * max(n)), 4) AS max_dev
    FROM c GROUP BY user_id
    """,
    "CUSUM drift detection per user: running deviation sum in ONE "
    "key-partitioned window, alarms where |cusum| exceeds "
    "k*sigma*sqrt(n_window). Entirely in exact integer cents: with "
    "D_k = n*S_k - k*T (S_k running sum, T/n/Q global sums), "
    "cusum_k = D_k/(100n) and the alarm test |cusum|>3*sd*sqrt(10) "
    "is exactly D_k^2 > 90*(n*Q - T^2) — integer comparison, no float "
    "boundary can flip between engines (r2 hash-flake fix); D_k itself "
    "AND the squares are formed in decimal(38,0)/HUGEINT so neither the "
    "running term n*S_k nor D_k^2 can wrap int64 at scale",
)
def ts_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("vi"),
    )
    stats = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vi").alias("t"),
        F.sum(F.col("vi").cast("decimal(19,0)") * F.col("vi")).alias("q"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # d = n*S_k - k*T formed in decimal(38,0): n*S_k alone exceeds int64
    # at scale (n ~ 1e9 rows x cent sums ~ 1e11 wraps silently in
    # non-ANSI Spark while DuckDB's window sum is HUGEINT-exact) —
    # mirror of the q/v decimal handling below.
    c = events.crossJoin(F.broadcast(stats)).select(
        "user_id",
        "n",
        (
            F.col("n").cast("decimal(38,0)")
            * F.sum("vi").over(w).cast("decimal(38,0)")
            - F.count(F.lit(1)).over(w).cast("decimal(38,0)")
            * F.col("t").cast("decimal(38,0)")
        ).alias("d"),
        (
            F.col("n").cast("decimal(19,0)") * F.col("q")
            - F.col("t").cast("decimal(19,0)") * F.col("t")
        ).alias("v"),
    )
    alarm = F.col("d") * F.col("d") > F.lit(90).cast("decimal(19,0)") * F.col(
        "v"
    )
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(alarm.cast("long")).alias("n_alarms"),
        F.round(
            F.max(F.abs("d")) / (F.lit(100.0) * F.max("n")), 4
        ).alias("max_dev"),
    )


# DEREGISTERED (r6, verdict #6): float twin of the driver-green
# `graph_pagerank_exact` (17/20-damping integer fixpoint with an exact
# DuckDB oracle); numpy bit-parity stays in tests/test_r4_ops.py.
# Kept as a library entry point.
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs
    from jigsaw_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    edges = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return pagerank(edges, n_iters=10).orderBy(F.desc("rank"), "node").limit(50)


@register(
    "dq_psi_drift",
    """
    WITH old AS (
      SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS b
      FROM orders WHERE o_orderkey % 2 = 0),
    new AS (
      SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS b
      FROM orders WHERE o_orderkey % 2 = 1),
    po AS (SELECT b, count(*) AS c FROM old GROUP BY b),
    pn AS (SELECT b, count(*) AS c FROM new GROUP BY b),
    no_ AS (SELECT sum(c) AS n FROM po),
    nn AS (SELECT sum(c) AS n FROM pn),
    j AS (
      SELECT coalesce(po.b, pn.b) AS b,
             (coalesce(po.c, 0) + 0.5) / (no_.n + 0.5) AS p,
             (coalesce(pn.c, 0) + 0.5) / (nn.n + 0.5) AS q
      FROM po FULL OUTER JOIN pn USING (b) CROSS JOIN no_ CROSS JOIN nn)
    SELECT round(sum((p - q) * ln(p / q)), 6) AS psi,
           count(*) AS n_buckets
    FROM j
    """,
    "population-stability-index drift between two snapshots (even/odd "
    "key halves as the deterministic split): two bucket hash-aggs, a "
    "bucket-keyed full-outer join (buckets are bounded — KB), additive-"
    "smoothed so empty buckets never divide by zero; the model-ops "
    "drift gate",
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("b")

    def hist(pred):
        return (
            orders.filter(pred)
            .select(b)
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    po = hist(F.col("o_orderkey") % 2 == 0)
    pn = hist(F.col("o_orderkey") % 2 == 1)
    no = po.agg(F.sum("c").alias("n_old"))
    nn = pn.agg(F.sum("c").alias("n_new"))
    j = (
        po.withColumnRenamed("c", "c_old")
        .join(pn.withColumnRenamed("c", "c_new"), "b", "full")
        .crossJoin(F.broadcast(no))
        .crossJoin(F.broadcast(nn))
        .select(
            (
                (F.coalesce("c_old", F.lit(0)) + 0.5)
                / (F.col("n_old") + 0.5)
            ).alias("p"),
            (
                (F.coalesce("c_new", F.lit(0)) + 0.5)
                / (F.col("n_new") + 0.5)
            ).alias("q"),
        )
    )
    return j.agg(
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
            6,
        ).alias("psi"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


_RAKE_STOPS = ("a", "the", "of", "and", "to", "in")
_RAKE_STOPS_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPS)


@register(
    "text_rake_keyphrase",
    f"""
    WITH {_TOKS_CTE},
    pos AS (
      SELECT doc_id, generate_subscripts(t, 1) AS p, unnest(t) AS w
      FROM toks),
    flagged AS (
      SELECT doc_id, p, w,
             CASE WHEN w IN ({_RAKE_STOPS_SQL}) THEN 1 ELSE 0 END AS stop
      FROM pos),
    runs AS (
      SELECT doc_id, p, w, stop,
             sum(stop) OVER (PARTITION BY doc_id ORDER BY p) AS run
      FROM flagged),
    pw AS (
      SELECT doc_id, run, w, p,
             count(*) OVER (PARTITION BY doc_id, run) AS plen
      FROM runs WHERE stop = 0),
    stats AS (
      SELECT w, count(*) AS freq, sum(plen) AS deg FROM pw GROUP BY w),
    scored AS (
      SELECT pw.doc_id, pw.run,
             string_agg(pw.w, ' ' ORDER BY pw.p) AS phrase,
             round(sum(CAST(s.deg AS DOUBLE) / s.freq), 6) AS score
      FROM pw JOIN stats s USING (w)
      GROUP BY pw.doc_id, pw.run),
    ranked AS (
      SELECT doc_id, phrase, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, phrase) AS rn
      FROM scored)
    SELECT doc_id, phrase, score FROM ranked WHERE rn = 1
    """,
    "RAKE-lite keyphrase extraction: stopword islands (running-sum run "
    "ids) -> phrase table, word degree/frequency stats in ONE agg, "
    "phrase score = sum(deg/freq), top phrase per doc — explode + three "
    "hash aggs + one word-keyed join, nothing quadratic",
)
def text_rake_keyphrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(tokens_expr("text")).alias("p0", "w")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    flagged = pos.withColumn(
        "stop", F.col("w").isin(list(_RAKE_STOPS)).cast("int")
    )
    w_run = Window.partitionBy("doc_id").orderBy("p")
    runs = flagged.withColumn("run", F.sum("stop").over(w_run))
    pw = runs.filter(F.col("stop") == 0).withColumn(
        "plen",
        F.count(F.lit(1)).over(Window.partitionBy("doc_id", "run")),
    )
    stats = pw.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    scored = (
        pw.join(stats, "w")
        .groupBy("doc_id", "run")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.round(
                F.sum(F.col("deg").cast("double") / F.col("freq")), 6
            ).alias("score"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("phrase")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select("doc_id", "phrase", "score")
    )


# DEREGISTERED (r6, verdict #6): float twin of the driver-green
# `ml_pca_pc1_exact` (n²-scaled integer covariance power method with an
# exact DuckDB oracle); numpy eigendecomposition parity stays in
# tests/test_r4_ops.py. Kept as a library entry point.
def ml_pca_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.ml import power_iteration_pc1

    # deterministic 10% subset: the leading direction of a large cloud is
    # stable under subsampling (the standard sketch for PCA at scale),
    # and the query's job is the operator's plan shape, not a full fit
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    v, lam = power_iteration_pc1(emb, n_iters=6)
    rows = [(-1, float(lam))] + [(d, float(x)) for d, x in enumerate(v)]
    return spark.createDataFrame(rows, "dim int, component double")


@register(
    "agg_moments_34",
    """
    WITH m AS (
      SELECT avg(value) AS m1,
             avg(value * value) AS m2,
             avg(value * value * value) AS m3,
             avg(value * value * value * value) AS m4,
             count(*) AS n
      FROM events)
    SELECT CAST(n AS BIGINT) AS n,
           round(m2 - m1 * m1, 6) AS variance,
           round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
                 / pow(m2 - m1 * m1, 1.5), 6) AS skewness_g1,
           round((m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * pow(m1, 4))
                 / pow(m2 - m1 * m1, 2) - 3, 6) AS excess_kurtosis_g2
    FROM m
    """,
    "3rd/4th standardized moments from raw power sums — ONE hash agg, "
    "map-side combinable, the SAME closed-form on both engines (Spark's "
    "skewness() and DuckDB's use different population/sample "
    "conventions; deriving from raw moments sidesteps the mismatch)",
)
def agg_moments_34(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    v = F.col("value")
    m = events.agg(
        F.avg(v).alias("m1"),
        F.avg(v * v).alias("m2"),
        F.avg(v * v * v).alias("m3"),
        F.avg(v * v * v * v).alias("m4"),
        F.count(F.lit(1)).alias("n"),
    )
    var = F.col("m2") - F.col("m1") * F.col("m1")
    skew = (
        F.col("m3")
        - 3 * F.col("m1") * F.col("m2")
        + 2 * F.col("m1") * F.col("m1") * F.col("m1")
    ) / F.pow(var, 1.5)
    kurt = (
        F.col("m4")
        - 4 * F.col("m1") * F.col("m3")
        + 6 * F.col("m1") * F.col("m1") * F.col("m2")
        - 3 * F.pow(F.col("m1"), 4)
    ) / F.pow(var, 2) - 3
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(var, 6).alias("variance"),
        F.round(skew, 6).alias("skewness_g1"),
        F.round(kurt, 6).alias("excess_kurtosis_g2"),
    )


@register(
    "text_compression_ratio",
    None,  # zlib output length is library-deterministic but not
    # SQL-expressible; parity vs local zlib in tests/test_r4_ops.py
    "zlib compression-ratio redundancy probe (Gopher-adjacent quality "
    "signal): mapInArrow kernel, RecordBatch-direct, zero shuffle",
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import compression_ratio

    return compression_ratio(_t(spark, sf_dir, "documents"), "doc_id")


# Poisson(1) inverse-CDF ladder (cumulative probabilities, full double
# precision so both engines compare against identical literals)
_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
]
_BOOT_B = 16


def _pois_case_sql(u: str) -> str:
    parts = [
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    ]
    return "CASE " + " ".join(parts) + " ELSE 7 END"


@register(
    "agg_bootstrap_means",
    f"""
    WITH dig AS (
      SELECT o_totalprice,
             md5(concat_ws('|', 'boot', CAST(o_orderkey AS VARCHAR))) AS h
      FROM orders),
    rep AS (
      SELECT o_totalprice, h, unnest(range({_BOOT_B})) AS b FROM dig),
    w AS (
      SELECT b, o_totalprice,
             {_pois_case_sql(
                 "(('0x' || substr(h, CAST(2*b+1 AS INT), 2))::INT"
                 " / 256.0)")}
               AS wt
      FROM rep)
    SELECT b,
           round(CAST(sum(wt * CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) / sum(wt), 4) AS boot_mean,
           CAST(sum(wt) AS BIGINT) AS n_drawn
    FROM w GROUP BY b
    """,
    "deterministic Poisson bootstrap (the resampling-at-scale trick: "
    "Poisson(1) weights approximate multinomial resampling without "
    "coordination): weights come from the md5 stream so every replica "
    "is reproducible and oracle-checkable; replica means use exact-"
    "decimal weighted sums (order-independent). 16 replicas (one 2-hex "
    "digest slice each — ONE md5 per row), computed FLAT: 16x2 agg "
    "expressions in ONE global hash agg (rows never explode; each "
    "partition emits one 32-value partial), then stack() reshapes the "
    "single result row to 16 — the oracle replays the naive x16 "
    "expansion the flat form avoids",
)
def agg_bootstrap_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.hashing import md5_key
    from jigsaw_spark.plans.queries import dec2

    orders = _t(spark, sf_dir, "orders")
    # ONE md5 per row; each replica reads its own 2-hex slice of the
    # digest (256 quantization levels are plenty for the CDF ladder and
    # cut the hash work x20)
    base = orders.select(
        dec2("o_totalprice", 18).alias("p"),
        md5_key(
            F.concat_ws("|", F.lit("boot"), F.col("o_orderkey").cast("string"))
        ).alias("h"),
    )
    # byte -> Poisson weight as ONE shared 256-entry literal LUT: the
    # same function of the digest byte as the oracle's CDF CASE ladder
    # (wt = min k with byte/256 < CDF[k], else 7), but 32 array lookups
    # codegen far smaller than 32 eight-branch CASE chains
    lut = F.array(
        *[
            F.lit(
                next(
                    (k for k, c in enumerate(_POIS_CDF) if byte / 256.0 < c),
                    7,
                )
            )
            for byte in range(256)
        ]
    )
    aggs = []
    for b in range(_BOOT_B):
        byte = F.conv(F.substring(F.col("h"), 2 * b + 1, 2), 16, 10).cast(
            "int"
        )
        wt = F.element_at(lut, byte + 1)
        aggs.append(F.sum(wt * F.col("p")).alias(f"s{b}"))
        aggs.append(F.sum(wt).alias(f"n{b}"))
    row = base.agg(*aggs)
    pairs = ", ".join(f"{b}, s{b}, n{b}" for b in range(_BOOT_B))
    return row.selectExpr(
        f"stack({_BOOT_B}, {pairs}) AS (b, s, n)"
    ).select(
        F.col("b"),
        F.round(F.col("s").cast("double") / F.col("n"), 4).alias("boot_mean"),
        F.col("n").cast("bigint").alias("n_drawn"),
    )


@register(
    "agg_weighted_percentile",
    """
    WITH expanded AS (
      SELECT l_returnflag, l_extendedprice,
             unnest(range(CAST(l_quantity AS BIGINT))) AS i
      FROM lineitem)
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS wmedian,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS wp90
    FROM expanded GROUP BY l_returnflag
    """,
    "frequency-weighted percentiles: Spark's percentile(col, p, freq) "
    "computes the weighted quantile IN ONE AGG without materializing "
    "the expansion — the oracle replays by actually exploding each row "
    "l_quantity times (the naive form that multiplies the data ~25x; "
    "exactly what the frequency parameter avoids at 100 TB)",
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    freq = F.col("l_quantity").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.percentile("l_extendedprice", F.lit(0.5), freq), 4
        ).alias("wmedian"),
        F.round(
            F.percentile("l_extendedprice", F.lit(0.9), freq), 4
        ).alias("wp90"),
    )


@register(
    "rel_attribution_last_touch",
    """
    WITH t AS (
      SELECT user_id, event_id, ts, event_type, value,
             max(CASE WHEN event_type = 'click' THEN event_id END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click
      FROM events)
    SELECT last_click AS click_event,
           count(*) AS n_purchases,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM t
    WHERE event_type = 'purchase' AND last_click IS NOT NULL
    GROUP BY last_click
    """,
    "last-touch attribution: each purchase credits the most recent "
    "preceding click — ONE key-partitioned running-max window (no self-"
    "join, no as-of shuffle pair), then a hash agg on the credited "
    "click; revenue in exact integer cents",
)
def rel_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = events.withColumn(
        "last_click",
        F.max(
            F.when(F.col("event_type") == "click", F.col("event_id"))
        ).over(w),
    )
    return (
        t.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click").isNotNull()
        )
        .groupBy(F.col("last_click").alias("click_event"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).alias("revenue_cents"),
        )
    )


@register(
    "ab_cuped_adjust",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN ts <  TIMESTAMP '2024-01-04'
                           THEN CAST(round(value*100,0) AS BIGINT)
                           ELSE 0 END) AS DOUBLE) / 100 AS x,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-04'
                           THEN CAST(round(value*100,0) AS BIGINT)
                           ELSE 0 END) AS DOUBLE) / 100 AS y,
             user_id % 2 AS arm
      FROM events GROUP BY user_id),
    theta AS (
      SELECT covar_pop(x, y) / var_pop(x) AS th, avg(x) AS mx
      FROM per_user)
    SELECT arm,
           count(*) AS n_users,
           round(avg(y), 4) AS mean_y,
           round(avg(y - th * (x - mx)), 4) AS mean_y_cuped,
           round(1 - var_pop(y - th * (x - mx)) / var_pop(y), 4)
             AS var_reduction
    FROM per_user CROSS JOIN theta
    GROUP BY arm
    """,
    "CUPED variance reduction (A/B-testing staple): pre-period covariate "
    "x per user, theta = cov(x,y)/var(x) as a 1-row broadcast, adjusted "
    "metric y - theta(x - mean_x) — per-user sums in exact cents, two "
    "aggs + one broadcast; reports the realized variance reduction",
)
def ab_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    cutoff = F.lit("2024-01-04").cast("timestamp")
    per_user = events.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0)).cast(
                "double"
            )
            / 100
        ).alias("x"),
        (
            F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0)).cast(
                "double"
            )
            / 100
        ).alias("y"),
    ).withColumn("arm", F.col("user_id") % 2)
    theta = per_user.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("th"),
        F.avg("x").alias("mx"),
    )
    adj = F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))
    return (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("y"), 4).alias("mean_y"),
            F.round(F.avg(adj), 4).alias("mean_y_cuped"),
            F.round(
                1 - F.var_pop(adj) / F.var_pop("y"), 4
            ).alias("var_reduction"),
        )
    )


@register(
    "fn_url_suite",
    """
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' ||
             CAST(doc_id AS VARCHAR) || '?lang=' || lang || '#frag' AS url
      FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, 'lang=([^&#]*)', 1) AS lang_param
    FROM u
    """,
    "URL parsing surface: Spark's parse_url (PROTOCOL/HOST/PATH/QUERY + "
    "keyed QUERY extraction) over deterministically synthesized URLs; "
    "the oracle replays with anchored regexes — map-only projection",
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("#frag"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "text_jsd_drift",
    f"""
    WITH {_TOKS_CTE},
    tok AS (
      SELECT doc_id % 2 AS half, unnest(t) AS w FROM toks),
    c AS (SELECT half, w, count(*) AS c FROM tok GROUP BY half, w),
    n AS (SELECT half, sum(c) AS n FROM c GROUP BY half),
    p AS (
      SELECT w,
             max(CASE WHEN half = 0 THEN CAST(c AS DOUBLE)/n END) AS p0,
             max(CASE WHEN half = 1 THEN CAST(c AS DOUBLE)/n END) AS p1
      FROM c JOIN n USING (half) GROUP BY w),
    f AS (
      SELECT coalesce(p0, 0.0) AS p0, coalesce(p1, 0.0) AS p1,
             (coalesce(p0, 0.0) + coalesce(p1, 0.0)) / 2 AS m
      FROM p)
    SELECT round(sum(CASE WHEN p0 > 0 THEN 0.5 * p0 * ln(p0 / m)
                          ELSE 0 END)
               + sum(CASE WHEN p1 > 0 THEN 0.5 * p1 * ln(p1 / m)
                          ELSE 0 END), 6) AS jsd_nats,
           count(*) AS vocab
    FROM f
    """,
    "Jensen-Shannon divergence between the token distributions of two "
    "corpus halves (text drift — PSI's distributional analog): one "
    "explode + vocab-keyed aggs pivoted to (p0, p1) rows, vocab-bounded "
    "work; exact zero-handling (missing terms contribute only from the "
    "present side)",
)
def text_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(tokens_expr("text")).alias("w"),
    )
    c = tok.groupBy("half", "w").agg(F.count(F.lit(1)).alias("c"))
    n = c.groupBy("half").agg(F.sum("c").alias("n"))
    p = (
        c.join(F.broadcast(n), "half")
        .groupBy("w")
        .agg(
            F.max(
                F.when(F.col("half") == 0, F.col("c").cast("double") / F.col("n"))
            ).alias("p0"),
            F.max(
                F.when(F.col("half") == 1, F.col("c").cast("double") / F.col("n"))
            ).alias("p1"),
        )
    )
    f = p.select(
        F.coalesce("p0", F.lit(0.0)).alias("p0"),
        F.coalesce("p1", F.lit(0.0)).alias("p1"),
        ((F.coalesce("p0", F.lit(0.0)) + F.coalesce("p1", F.lit(0.0))) / 2).alias("m"),
    )
    term0 = F.when(F.col("p0") > 0, 0.5 * F.col("p0") * F.log(F.col("p0") / F.col("m"))).otherwise(0.0)
    term1 = F.when(F.col("p1") > 0, 0.5 * F.col("p1") * F.log(F.col("p1") / F.col("m"))).otherwise(0.0)
    return f.agg(
        F.round(F.sum(term0) + F.sum(term1), 6).alias("jsd_nats"),
        F.count(F.lit(1)).alias("vocab"),
    )


@register(
    "dedup_minhash_jaccard_est",
    f"""
    WITH {_TOKS_CTE}, {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    truth AS (
      SELECT doc_a, doc_b,
             CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS j
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE inter / (sa.sz + sb.sz - inter) >= 0.3),
    mh AS (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    est AS (
      SELECT t.doc_a, t.doc_b,
             CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE)
               / 16 AS j_est
      FROM truth t
      JOIN mh a ON a.doc_id = t.doc_a
      JOIN mh b ON b.doc_id = t.doc_b AND b.seed = a.seed
      GROUP BY 1, 2)
    SELECT t.doc_a, t.doc_b,
           round(t.j, 4) AS jaccard,
           round(e.j_est, 4) AS minhash_est,
           round(abs(round(e.j_est, 4) - round(t.j, 4)), 4) AS abs_err
    FROM truth t JOIN est e USING (doc_a, doc_b)
    """,
    "sketch-accuracy evaluation: MinHash agreement fraction (16 seeded "
    "hashes) vs exact trigram Jaccard on every pair with true J >= 0.3 "
    "— the per-pair estimator error the LSH banding math builds on. "
    "The signature comparison is anchored on the candidate pair list "
    "(|pairs| x 16 rows — a bare seed-keyed self-join would be "
    "all-pairs); the truth side is the bounded inverted-index join",
)
def dedup_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_vector, ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    # capped truth side (see dedup_lsh_recall): never binds at sf0.01 so
    # the SQL twin stays the uncapped form; bounds the inverted-index
    # self-join on boilerplate shingles at scale
    # NOTE: deliberately NOT localCheckpoint'ed — truth feeds two
    # consumers, but Spark's ReusedExchange already shares the heavy
    # shingle-join stages between them; forcing materialization was
    # measured SLOWER (4.4s -> 6.7s in-bench at sf0.1)
    truth = ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.3, max_posting=1000
    ).select("doc_a", "doc_b", (F.col("jaccard")).alias("j_exact"))
    # signature as ONE array row per doc (the map-only minhash_vector
    # kernel; mhs[s] == the relational minhash_signatures' per-seed min
    # by construction): the seed-explode form shuffled |docs| x 16 rows
    # into a (doc, seed) hash-agg and the estimate needed a 16x-row
    # double join + pair hash-agg — here each pair joins two array rows
    # and the agreement count folds inline
    vec = minhash_vector(docs, "doc_id", num_hashes=16)
    agree = F.aggregate(
        F.zip_with(
            F.col("mh_a"),
            F.col("mh_b"),
            lambda u, v: (u == v).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    # estimate ONLY on the candidate pairs: a bare signature self-join
    # is all-pairs (measured 47s at sf0.1, quadratic at scale) —
    # anchoring on the truth pair list bounds the work to |pairs| rows
    est = (
        truth.select("doc_a", "doc_b")
        .join(
            vec.select(
                F.col("doc_id").alias("doc_a"), F.col("mhs").alias("mh_a")
            ),
            "doc_a",
        )
        .join(
            vec.select(
                F.col("doc_id").alias("doc_b"), F.col("mhs").alias("mh_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / 16).alias("j_est"),
        )
    )
    return truth.join(est, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        F.round(F.col("j_exact"), 4).alias("jaccard"),
        F.round("j_est", 4).alias("minhash_est"),
        F.round(
            F.abs(F.round("j_est", 4) - F.round("j_exact", 4)), 4
        ).alias("abs_err"),
    )


@register(
    "agg_winsorized_mean",
    """
    WITH q AS (
      SELECT round(quantile_cont(o_totalprice, 0.01), 4) AS lo,
             round(quantile_cont(o_totalprice, 0.99), 4) AS hi
      FROM orders)
    SELECT o_orderstatus,
           count(*) AS n,
           round(avg(o_totalprice), 4) AS mean_raw,
           round(avg(CASE WHEN o_totalprice < lo THEN lo
                          WHEN o_totalprice > hi THEN hi
                          ELSE o_totalprice END), 4) AS mean_winsorized,
           CAST(sum(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM orders CROSS JOIN q
    GROUP BY o_orderstatus
    """,
    "winsorized mean (p01/p99 clipping): ONE exact-percentile agg "
    "broadcasts two bounds, then one conditional agg — the outlier-"
    "robust mean without sorting or dropping rows",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    q = orders.agg(
        F.round(F.percentile("o_totalprice", F.lit(0.01)), 4).alias("lo"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("hi"),
    )
    x = F.col("o_totalprice")
    clipped = (
        F.when(x < F.col("lo"), F.col("lo"))
        .when(x > F.col("hi"), F.col("hi"))
        .otherwise(x)
    )
    return (
        orders.crossJoin(F.broadcast(q))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(x), 4).alias("mean_raw"),
            F.round(F.avg(clipped), 4).alias("mean_winsorized"),
            F.sum(
                ((x < F.col("lo")) | (x > F.col("hi"))).cast("long")
            ).alias("n_clipped"),
        )
    )


@register(
    "ts_seasonal_naive_mape",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY user_id, date_trunc('hour', ts)),
    j AS (
      SELECT a.user_id, a.h, a.cents AS actual, b.cents AS predicted
      FROM hourly a
      JOIN hourly b ON b.user_id = a.user_id
                   AND b.h = a.h - INTERVAL 24 HOURS)
    SELECT user_id,
           count(*) AS n_hours,
           round(avg(abs(actual - predicted)
                     / CAST(actual AS DOUBLE)), 6) AS mape
    FROM j WHERE actual <> 0
    GROUP BY user_id
    """,
    "seasonal-naive forecast error (predict this hour = same hour "
    "yesterday): hourly exact-cent rollup, ONE self-join on the shifted "
    "key (equi-join, not a window over 24h of rows), per-user MAPE — "
    "the baseline every forecasting pipeline must beat",
)
def ts_seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents")
    )
    a = hourly.alias("a")
    b = hourly.select(
        F.col("user_id"),
        (F.col("h") + F.expr("INTERVAL 24 HOURS")).alias("h"),
        F.col("cents").alias("predicted"),
    ).alias("b")
    j = a.join(b, ["user_id", "h"]).select(
        "user_id", F.col("cents").alias("actual"), "predicted"
    )
    return (
        j.filter(F.col("actual") != 0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.round(
                F.avg(
                    F.abs(F.col("actual") - F.col("predicted"))
                    / F.col("actual").cast("double")
                ),
                6,
            ).alias("mape"),
        )
    )


@register(
    "text_langid_confusion",
    f"""
    WITH {_TOKS_CTE.replace("SELECT doc_id,", "SELECT doc_id, lang,")},
    hits AS (
      SELECT doc_id, lang,
             CAST({{en}} AS INT) AS en_hits,
             CAST({{es}} AS INT) AS es_hits,
             CAST({{fr}} AS INT) AS fr_hits
      FROM toks)
    SELECT lang AS actual,
           {{pred}} AS predicted,
           count(*) AS n
    FROM hits GROUP BY lang, 2
    """,
    "language-ID self-evaluation: the heuristic's predictions cross-"
    "tabulated against the ground-truth lang column (confusion matrix) "
    "— one projection + one hash agg; the operator-quality report every "
    "curation heuristic should ship with",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import (
        lang_hits_expr,
        lang_predict_expr,
        tokens_expr,
    )

    docs = _t(spark, sf_dir, "documents").withColumn("t", tokens_expr("text"))
    hits = docs.select(
        "lang",
        lang_hits_expr("t", "en").alias("en_hits"),
        lang_hits_expr("t", "es").alias("es_hits"),
        lang_hits_expr("t", "fr").alias("fr_hits"),
    )
    return (
        hits.select(
            F.col("lang").alias("actual"),
            lang_predict_expr(
                F.col("en_hits"), F.col("es_hits"), F.col("fr_hits")
            ).alias("predicted"),
        )
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _install_langid_confusion_oracle() -> None:
    from jigsaw_spark.operators.text import lang_hits_sql, lang_predict_sql
    from jigsaw_spark.plans.queries import QUERIES

    spec = QUERIES["text_langid_confusion"]
    spec.oracle = spec.oracle.format(
        en=lang_hits_sql("t", "en"),
        es=lang_hits_sql("t", "es"),
        fr=lang_hits_sql("t", "fr"),
        pred=lang_predict_sql("en_hits", "es_hits", "fr_hits"),
    )


_install_langid_confusion_oracle()


@register(
    "w10_share_of_total",
    """
    WITH per_status AS (
      SELECT o_orderstatus,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY o_orderstatus)
    SELECT o_orderstatus,
           round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (), 6) AS share,
           round(revenue / max(revenue) OVER (), 6) AS vs_top
    FROM per_status
    """,
    "share-of-total report (RATIO_TO_REPORT): exact-decimal group sums, "
    "then empty-frame window aggregates over the tiny aggregate — the "
    "window runs over |groups| rows, never the fact table",
)
def w10_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jigsaw_spark.plans.queries import dec2

    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderstatus").agg(
        F.sum(dec2("o_totalprice", 18)).cast("double").alias("revenue")
    )
    w = Window.partitionBy()
    return per.select(
        "o_orderstatus",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share"),
        F.round(F.col("revenue") / F.max("revenue").over(w), 6).alias("vs_top"),
    )
