"""LLM-data-pipeline queries: dedup, similarity search, text analysis.

Same registry pattern as plans/queries.py — every operator exercised on the
driver's `documents` / `embeddings` tables with an adjacent DuckDB oracle.
Imported by plans/queries.py for the side effect of registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from jigsaw_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    srp_buckets,
    srp_planes,
    srp_signature_sql,
)
from jigsaw_spark.operators.text import (
    alnum_ratio_expr,
    alnum_ratio_sql,
    bpeish_tokens_expr,
    bpeish_tokens_sql,
    avg_token_len_expr,
    avg_token_len_sql,
    fingerprint_expr,
    fingerprint_sql,
    lang_hits_expr,
    lang_hits_sql,
    lang_predict_expr,
    lang_predict_sql,
    stopword_ratio_expr,
    stopword_ratio_sql,
    tokens_expr,
    tokens_sql,
)
from jigsaw_spark.plans.queries import register, _t

_TOKS_CTE = f"toks AS (SELECT doc_id, {tokens_sql('text')} AS t FROM documents)"

_SHINGLES_CTE = (
    "sh AS (SELECT DISTINCT doc_id, "
    "unnest(list_transform(range(1, len(t) - 1), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle "
    "FROM toks WHERE len(t) >= 3)"
)

# Shared oracle CTE chain for the C4-ordered pair scorers
# (operators/dedup.banded_pair_scores): exact-dedup keepers → shingles over
# keepers only → 16 md5-seeded minhashes → 4 bands × 4 rows → LSH candidate
# pairs → exact per-candidate intersections. AS MATERIALIZED on every
# multi-referenced CTE — DuckDB inlines them otherwise and re-evaluates the
# whole upstream chain per reference (the r4 pagerank-oracle lesson).
_BANDED_PAIR_CTES = f"""{_TOKS_CTE},
    fpt AS (SELECT doc_id, t, {fingerprint_sql('t')} AS fp FROM toks),
    keep AS MATERIALIZED (
      SELECT doc_id, t FROM (
        SELECT doc_id, t,
               doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_keeper
        FROM fpt) k
      WHERE is_keeper),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM keep WHERE len(t) >= 3),
    mh AS (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    bands AS MATERIALIZED (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, band),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig
                  AND a.doc_id < b.doc_id),
    sizes AS MATERIALIZED (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS MATERIALIZED (
      SELECT c.doc_a, c.doc_b, count(*) AS inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2)"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_tokens",
    f"""
    WITH {_TOKS_CTE}
    SELECT d.doc_id,
           CAST(length(d.text) AS INT) AS n_chars,
           CAST(len(t.t) AS INT)       AS n_tokens,
           CAST(len(list_distinct(t.t)) AS INT) AS n_unique_tokens
    FROM documents d JOIN toks t ON d.doc_id = t.doc_id
    """,
    "token counting: chars, whitespace/punct tokens, distinct tokens",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = tokens_expr("text")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
    )


@register(
    "text_quality",
    f"""
    WITH {_TOKS_CTE}
    SELECT d.doc_id,
           round({avg_token_len_sql('t.t')}, 4)  AS avg_token_len,
           round({stopword_ratio_sql('t.t')}, 4) AS stopword_ratio,
           round({alnum_ratio_sql('d.text')}, 4) AS alnum_ratio
    FROM documents d JOIN toks t ON d.doc_id = t.doc_id
    """,
    "quality scoring: token length / stopword / punctuation ratios",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn("t", tokens_expr("text"))
    return docs.select(
        "doc_id",
        F.round(avg_token_len_expr("t"), 4).alias("avg_token_len"),
        F.round(stopword_ratio_expr("t"), 4).alias("stopword_ratio"),
        F.round(alnum_ratio_expr("text"), 4).alias("alnum_ratio"),
    )


@register(
    "text_langid",
    f"""
    WITH {_TOKS_CTE},
    hits AS (
      SELECT doc_id,
             CAST({lang_hits_sql('t', 'en')} AS INT) AS en_hits,
             CAST({lang_hits_sql('t', 'es')} AS INT) AS es_hits,
             CAST({lang_hits_sql('t', 'fr')} AS INT) AS fr_hits
      FROM toks)
    SELECT doc_id, {lang_predict_sql('en_hits', 'es_hits', 'fr_hits')} AS pred_lang,
           en_hits, es_hits, fr_hits
    FROM hits
    """,
    "language-ID n-gram/marker heuristic with deterministic argmax",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn("t", tokens_expr("text"))
    hits = docs.select(
        "doc_id",
        lang_hits_expr("t", "en").alias("en_hits"),
        lang_hits_expr("t", "es").alias("es_hits"),
        lang_hits_expr("t", "fr").alias("fr_hits"),
    )
    return hits.select(
        "doc_id",
        lang_predict_expr(
            F.col("en_hits"), F.col("es_hits"), F.col("fr_hits")
        ).alias("pred_lang"),
        "en_hits",
        "es_hits",
        "fr_hits",
    )


@register(
    "text_bpeish_tokens",
    f"""
    SELECT doc_id,
           CAST(len({bpeish_tokens_sql('text')}) AS INT) AS n_bpeish
    FROM documents
    """,
    "BPE-style pre-tokenizer piece count (LLM token-budget proxy)",
)
def text_bpeish_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(bpeish_tokens_expr("text")).alias("n_bpeish")
    )


@register(
    "text_fingerprint",
    f"""
    WITH {_TOKS_CTE}
    SELECT doc_id, {fingerprint_sql('t')} AS fp FROM toks
    """,
    "document fingerprint: md5 over the normalized token stream",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", fingerprint_expr(tokens_expr("text")).alias("fp")
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    f"""
    WITH {_TOKS_CTE},
    fp AS (SELECT doc_id, {fingerprint_sql('t')} AS fp FROM toks)
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY fp) AS keeper,
           doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
    FROM fp
    """,
    "exact dedup: canonical-keeper assignment by normalization fingerprint",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id").select("doc_id", "keeper", "is_dup")


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_BANDED_PAIR_CTES}
    SELECT doc_a, doc_b,
           round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.8
    """,
    "near-dup pairs by exact trigram-set Jaccard >= 0.8, C4-ordered "
    "(r6 scale-safe default): exact-dedup keepers -> MinHash-LSH "
    "candidates -> exact intersection ONLY per candidate pair. The "
    "posting-list self-join (quadratic in posting density — 18.6x at "
    "the x10 probe) never runs; work is linear in candidates. The "
    "uncapped exact operator (ngram_jaccard_pairs) stays in the "
    "library for sampled tuning runs.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import banded_pair_scores

    docs = _t(spark, sf_dir, "documents")
    return banded_pair_scores(docs, "doc_id", threshold=0.8, measure="jaccard")


@register(
    "dedup_minhash_lsh",
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
      FROM mh GROUP BY doc_id, band)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    """,
    "MinHash-LSH candidates: 16 md5-seeded minhashes, 4 bands x 4 rows",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4)


_SIMHASH_CTE = f"""
    {_TOKS_CTE},
    tok_counts AS (
      SELECT doc_id, tok, count(*) AS cnt, md5(tok) AS h
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, tok),
    scored AS (
      SELECT doc_id, j,
             sum(cnt * (2 * (CAST(floor(
               (strpos('0123456789abcdef', substr(h, CAST(j // 4 + 1 AS INT), 1)) - 1)
               / power(2, 3 - (j % 4))) AS BIGINT) % 2) - 1)) AS score
      FROM tok_counts CROSS JOIN (SELECT unnest(range(32)) AS j) bj
      GROUP BY doc_id, j),
    sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN score > 0 THEN CAST(power(2, j) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM scored GROUP BY doc_id)
"""

# SimHash signatures over EXACT-DEDUP KEEPERS only — the C4-ordered twin of
# _SIMHASH_CTE for pair-graph consumers (graph_modularity): byte-identical
# copies collapse to their keeper before pairing, so duplication cannot
# densify the pair graph into cliques (the r5 ×10-probe failure mode).
_SIMHASH_KEEPER_CTE = f"""
    {_TOKS_CTE},
    fpt AS (SELECT doc_id, t, {fingerprint_sql('t')} AS fp FROM toks),
    ktoks AS MATERIALIZED (
      SELECT doc_id, t FROM (
        SELECT doc_id, t,
               doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_keeper
        FROM fpt) k
      WHERE is_keeper),
    tok_counts AS (
      SELECT doc_id, tok, count(*) AS cnt, md5(tok) AS h
      FROM (SELECT doc_id, unnest(t) AS tok FROM ktoks)
      GROUP BY doc_id, tok),
    scored AS (
      SELECT doc_id, j,
             sum(cnt * (2 * (CAST(floor(
               (strpos('0123456789abcdef', substr(h, CAST(j // 4 + 1 AS INT), 1)) - 1)
               / power(2, 3 - (j % 4))) AS BIGINT) % 2) - 1)) AS score
      FROM tok_counts CROSS JOIN (SELECT unnest(range(32)) AS j) bj
      GROUP BY doc_id, j),
    sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN score > 0 THEN CAST(power(2, j) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM scored GROUP BY doc_id)
"""


# DuckDB twin of operators/dedup.keeper_edges (advisor r9 #1): the
# keeper-graph pair list + symmetric edge list shared by the
# queries_r48/r50/r51/r53 graph family. Single definition so the keeper
# convention (exact dedup -> SimHash Hamming <= 2) cannot drift.
_KEEPER_EDGES_CTE = f"""{_SIMHASH_KEEPER_CTE},
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM prs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM prs)"""


@register(
    "dedup_simhash",
    f"""
    WITH {_SIMHASH_CTE}
    SELECT doc_id, simhash FROM sig
    """,
    "SimHash 32-bit signatures: token-frequency-weighted bit majority",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return simhash(docs, "doc_id").select("doc_id", "simhash")


@register(
    "dedup_simhash_pairs",
    f"""
    WITH {_SIMHASH_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
    "SimHash near-dup pairs: Hamming distance <= 2",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", max_hamming=2)


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------

_COS = (
    "list_cosine_similarity({a}.embedding::DOUBLE[], {b}.embedding::DOUBLE[])"
)


@register(
    "emb_cosine_near_dup",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS.format(a='a', b='b')}, 4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round({_COS.format(a='a', b='b')}, 9) >= 0.4
    """,
    "embedding-cosine near-dup pairs (>= 0.4)",
)
def emb_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb, 0.4)


@register(
    "ann_cosine_topk",
    f"""
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round({_COS.format(a='q', b='c')}, 4) AS cosine,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round({_COS.format(a='q', b='c')}, 9) DESC, c.vec_id
             ) AS INT) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5) t
    WHERE rank <= 10
    """,
    "brute-force cosine top-10 per query vector (exact ANN baseline)",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, k=10)


@register(
    "ann_ivf_assign",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT e.vec_id, c.cid,
             round(list_cosine_similarity(e.embedding::DOUBLE[],
                                          c.cvec::DOUBLE[]), 9) AS cos
      FROM embeddings e CROSS JOIN cent c
    )
    SELECT vec_id, cid AS cell FROM (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid) AS rn
      FROM scored) t
    WHERE rn = 1
    """,
    "IVF coarse quantizer: nearest-centroid cell assignment (broadcast "
    "codebook, map-only matmul) — the ANN scale path's partitioner",
)
def ann_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import ivf_assign

    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    return ivf_assign(emb, centroids)


@register(
    "dedup_components",
    f"""
    WITH RECURSIVE {_SIMHASH_CTE},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u)
    SELECT u AS doc_id, least(u, min(v)) AS component
    FROM reach GROUP BY u
    """,
    "duplicate clusters: connected components (min reachable id) over "
    "SimHash near-dup pairs — pairwise evidence → keeper groups; Spark "
    "side is iterative min-label propagation, oracle is a recursive CTE",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import connected_components

    docs = _t(spark, sf_dir, "documents")
    pairs = simhash_pairs(docs, "doc_id", max_hamming=2)
    return connected_components(pairs)


@register(
    "curation_pipeline",
    f"""
    WITH {_TOKS_CTE},
    scored AS (
      SELECT d.doc_id, d.source, d.n_chars, t.t,
             {alnum_ratio_sql('d.text')} AS alnum,
             CAST({lang_hits_sql('t.t', 'en')} AS INT) AS en_hits,
             CAST({lang_hits_sql('t.t', 'es')} AS INT) AS es_hits,
             CAST({lang_hits_sql('t.t', 'fr')} AS INT) AS fr_hits
      FROM documents d JOIN toks t ON d.doc_id = t.doc_id),
    kept AS (
      SELECT doc_id, source, n_chars, t FROM scored
      WHERE len(t) >= 20 AND alnum >= 0.5
        AND {lang_predict_sql('en_hits', 'es_hits', 'fr_hits')} = 'en'),
    fp AS (SELECT doc_id, source, n_chars, {fingerprint_sql('t')} AS fp FROM kept),
    keepers AS (
      SELECT * FROM (
        SELECT doc_id, source, n_chars,
               min(doc_id) OVER (PARTITION BY fp) AS keeper
        FROM fp) t
      WHERE doc_id = keeper)
    SELECT source, count(*) AS n_docs,
           round(avg(n_chars), 2) AS avg_chars
    FROM keepers GROUP BY source
    """,
    "end-to-end corpus curation: quality gates (length, alnum ratio) → "
    "language filter → exact-dedup keeper selection → per-source stats; "
    "every stage is a pushdown-friendly projection/filter + one window",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import (
        alnum_ratio_expr,
        lang_hits_expr,
        lang_predict_expr,
    )

    docs = _t(spark, sf_dir, "documents").withColumn("t", tokens_expr("text"))
    scored = docs.select(
        "doc_id",
        "source",
        "n_chars",
        "t",
        alnum_ratio_expr("text").alias("alnum"),
        lang_hits_expr("t", "en").alias("en_hits"),
        lang_hits_expr("t", "es").alias("es_hits"),
        lang_hits_expr("t", "fr").alias("fr_hits"),
    )
    kept = scored.filter(
        (F.size("t") >= 20)
        & (F.col("alnum") >= 0.5)
        & (
            lang_predict_expr(
                F.col("en_hits"), F.col("es_hits"), F.col("fr_hits")
            )
            == "en"
        )
    )
    from pyspark.sql.window import Window

    fp = kept.withColumn("fp", fingerprint_expr("t"))
    keepers = fp.withColumn(
        "keeper", F.min("doc_id").over(Window.partitionBy("fp"))
    ).filter(F.col("doc_id") == F.col("keeper"))
    return keepers.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


_IVF_COS = "round(list_cosine_similarity({a}.embedding::DOUBLE[], {b}.cvec), 9)"


@register(
    "ann_ivf_topk",
    f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id < 8
    ), assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_IVF_COS.format(a='e', b='c')} DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c) t
      WHERE rn = 1
    ), probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cid AS cell,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_IVF_COS.format(a='q', b='c')} DESC, c.cid) AS rn
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < 5) t
      WHERE rn <= 2
    ), scored AS (
      SELECT p.query_id, a.vec_id,
             {_COS.format(a='q', b='e')} AS cos
      FROM probes p
      JOIN assign a ON a.cell = p.cell
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings e ON e.vec_id = a.vec_id
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, round(cos, 4) AS cosine, rank FROM (
      SELECT query_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY round(cos, 9) DESC, vec_id) AS INT) AS rank
      FROM scored) t
    WHERE rank <= 10
    """,
    "IVF search: nprobe=2 cell probe + exact top-10 within probed cells "
    "(the ANN scale path end-to-end: codebook broadcast, map-only "
    "assignment, cell-local candidate join)",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, centroids, k=10, nprobe=2)


@register(
    "text_tfidf",
    f"""
    WITH {_TOKS_CTE},
    terms AS (
      SELECT doc_id, tok AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, tok),
    docfreq AS (SELECT term, count(*) AS df FROM terms GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term,
             t.tf * (ln((1 + n.n_docs) / (1 + d.df)) + 1) AS score
      FROM terms t JOIN docfreq d ON t.term = d.term CROSS JOIN n)
    SELECT doc_id, term, round(score, 4) AS tfidf, rank FROM (
      SELECT doc_id, term, score,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY round(score, 9) DESC, term) AS INT) AS rank
      FROM scored) t
    WHERE rank <= 3
    """,
    "top-3 TF-IDF terms per document (smooth idf; per-doc relevance "
    "profile for corpus curation)",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", top_n=3)


_SRP_PLANES = srp_planes(16, 64)


@register(
    "ann_srp_buckets",
    f"""
    SELECT vec_id,
           {srp_signature_sql('embedding::DOUBLE[]', _SRP_PLANES)} AS sig
    FROM embeddings
    """,
    "SRP-LSH 16-bit bucket signatures (the ANN scale path)",
)
def ann_srp_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return srp_buckets(emb, num_planes=16)


@register(
    "text_chunk",
    f"""
    WITH {_TOKS_CTE}
    SELECT doc_id,
           CAST(i // 48 AS INT) AS chunk_idx,
           CAST(len(list_slice(t, i + 1, least(i + 64, len(t)))) AS INT) AS n_chunk_tokens,
           array_to_string(list_slice(t, i + 1, least(i + 64, len(t))), ' ') AS chunk_text
    FROM (SELECT doc_id, t, unnest(range(0, len(t), 48)) AS i
          FROM toks WHERE len(t) >= 1) u
    """,
    "document chunking: overlapping 64-token windows, stride 48 — narrow "
    "sequence+slice fan-out, the context-window prep for embedding/training",
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", chunk_size=64, overlap=16)


@register(
    "text_pack",
    """
    WITH sized AS (
      SELECT doc_id, source, n_chars,
             CAST(coalesce(sum(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS pack_offset
      FROM documents)
    SELECT doc_id, source, n_chars, pack_offset,
           CAST(pack_offset // 4096 AS INT) AS pack_bin
    FROM sized
    """,
    "sequence packing: concat-then-chop layout into 4096-char bins, scoped "
    "per source (each scope packs independently — the parallel path)",
)
def text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import pack_sequences

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return pack_sequences(
        docs, ["doc_id"], "n_chars", budget=4096, partition_cols=["source"]
    )


_BOILER = (
    "standard legal disclaimer all rights reserved reproduction prohibited "
    "without express written consent of the publisher"
)


@register(
    "dedup_lsh_capped",
    f"""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN '{_BOILER}' ELSE text END AS text
      FROM documents),
    toks AS (SELECT doc_id, {tokens_sql('text')} AS t FROM src),
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
    sized AS (SELECT band, sig, count(*) AS n FROM bands GROUP BY band, sig),
    small AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      JOIN sized s ON s.band = a.band AND s.sig = a.sig
      WHERE s.n <= 10),
    chains AS (
      SELECT lag(a.doc_id) OVER (
               PARTITION BY a.band, a.sig ORDER BY a.doc_id) AS doc_a,
             a.doc_id AS doc_b
      FROM bands a JOIN sized s ON s.band = a.band AND s.sig = a.sig
      WHERE s.n > 10)
    SELECT DISTINCT doc_a, doc_b FROM (
      SELECT doc_a, doc_b FROM small
      UNION ALL
      SELECT doc_a, doc_b FROM chains WHERE doc_a IS NOT NULL)
    """,
    "MinHash-LSH with the skew cap EXERCISED: 20% of the corpus is forced "
    "to one boilerplate text, collapsing to a single signature per band "
    "(the 100 TB templated-page hazard). Buckets > 10 emit a sorted-id "
    "chain (linear fan-out, components-equivalent) instead of quadratic "
    "all-pairs; buckets <= 10 keep exact all-pairs. Oracle replays both "
    "regimes relationally (lag window = the chain).",
)
def dedup_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.lit(_BOILER)).otherwise(
            F.col("text")
        ),
    )
    return minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4, max_bucket=10)


@register(
    "text_unigram_logprob",
    f"""
    WITH {_TOKS_CTE},
    tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
    lm AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
    total AS (SELECT sum(cnt) AS total FROM lm)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(-ln(CAST(cnt AS DOUBLE) / total)), 4) AS neg_logprob
    FROM tok JOIN lm USING (term) CROSS JOIN total
    GROUP BY doc_id
    """,
    "corpus-unigram LM scoring (KenLM-lite curation signal): one explode + "
    "vocab agg builds the LM, 1-row total broadcast, token→prob join, "
    "per-doc mean −ln p — outlier docs (OCR garbage/wrong language) score "
    "high. LM table scales with vocab, never corpus",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents"), "doc_id")


_BM25_TERMS = ["spark", "window", "vector"]


@register(
    "text_bm25_topk",
    f"""
    WITH {_TOKS_CTE},
    tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
    doclen AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term IN ('spark', 'window', 'vector')
           GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT doc_id,
             round(sum(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * 2.2
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
      FROM tf JOIN dfreq USING (term)
      JOIN doclen USING (doc_id) CROSS JOIN stats
      GROUP BY doc_id)
    SELECT doc_id, bm25 FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    "BM25 top-k lexical retrieval over the corpus (k1=1.2, b=0.75): "
    "query-term filter prunes postings before any agg (inverted-index "
    "discipline), doc-length + corpus stats are 1-row broadcasts, top-k "
    "is TakeOrdered — no global sort",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), "doc_id", _BM25_TERMS, k=20
    )


_IVFPQ_ORACLE = """
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id < 8),
    q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5),
    assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(
                            e.embedding::DOUBLE[], c.cvec), 9) DESC,
                          c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
    ordered AS (
      SELECT embedding::DOUBLE[] AS sv,
             row_number() OVER (
               ORDER BY md5(concat_ws('|', 'pq-train', CAST(vec_id AS VARCHAR))),
                        vec_id) - 1 AS sidx
      FROM embeddings),
    seeds AS (SELECT * FROM ordered WHERE sidx < 16),
    codes AS (
      SELECT vec_id, j, sidx AS code FROM (
        SELECT e.vec_id, s.sidx, js.j,
               row_number() OVER (PARTITION BY e.vec_id, js.j ORDER BY
                 round(list_sum(list_transform(range(16), d ->
                   (e.embedding[js.j*16 + d + 1]::DOUBLE - s.sv[js.j*16 + d + 1])
                   * (e.embedding[js.j*16 + d + 1]::DOUBLE
                      - s.sv[js.j*16 + d + 1]))), 9),
                 s.sidx) AS rn
        FROM embeddings e CROSS JOIN seeds s
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js) t
      WHERE rn = 1),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, c.cid AS cell,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 9) DESC,
                          c.cid) AS rn
        FROM q CROSS JOIN cent c) t WHERE rn <= 2),
    cand AS (
      SELECT p.query_id, a.vec_id FROM probes p JOIN assign a ON a.cell = p.cell),
    dist AS (
      SELECT c.query_id, c.vec_id,
             round(sum(list_sum(list_transform(range(16), d ->
               (q.qv[k.j*16 + d + 1] - s.sv[k.j*16 + d + 1])
               * (q.qv[k.j*16 + d + 1] - s.sv[k.j*16 + d + 1])))), 9) AS d2
      FROM cand c
      JOIN q USING (query_id)
      JOIN codes k ON k.vec_id = c.vec_id
      JOIN seeds s ON s.sidx = k.code
      GROUP BY c.query_id, c.vec_id)
    SELECT query_id, vec_id, round(d2, 4) AS adc_d2, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY d2, vec_id) AS rn
          FROM dist) t
    WHERE rn <= 10
"""


@register(
    "ann_ivfpq_topk",
    _IVFPQ_ORACLE,
    "IVF-PQ ANN search (the 100 TB composition): coarse-quantize + PQ-"
    "encode the corpus in map-only kernels, score ONLY probed cells' "
    "4-byte codes via per-query ADC lookup tables (floats never read at "
    "query time; 64x memory reduction at m=4/k=16). The oracle re-derives "
    "cells, md5-ordered sub-codebooks, probe lists AND the ADC distances "
    "relationally — the full approximate pipeline is value-checked, "
    "approximation included",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import ivfpq_topk
    from jigsaw_spark.session import widen

    emb = widen(_t(spark, sf_dir, "embeddings"))
    seed_rows = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    )
    centroids = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in seed_rows]
    queries = centroids[:5]
    return ivfpq_topk(emb, queries, centroids, k=10, nprobe=2)


@register(
    "dedup_end_to_end",
    f"""
    WITH RECURSIVE {_TOKS_CTE}, {_SHINGLES_CTE},
    mh AS (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, band),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b AS u, doc_a AS v FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach GROUP BY u),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
    SELECT count(*) AS n_docs,
           count(CASE WHEN doc_id = component THEN 1 END) AS n_keepers,
           count(CASE WHEN doc_id <> component THEN 1 END) AS n_dropped
    FROM labeled
    """,
    "end-to-end near-dedup: MinHash-LSH candidate pairs → connected "
    "components (min-reachable-id clusters) → keeper = component "
    "representative → corpus survival stats. The full pipeline a 100 TB "
    "curation run executes: signature kernel (map-only) → ONE bucket "
    "shuffle → size-adaptive CC → broadcast-joined labels; oracle replays "
    "LSH + a recursive-CTE closure",
)
def dedup_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import connected_components

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4)
    comp = connected_components(pairs)
    labeled = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
    return labeled.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("doc_id") == F.col("component"), 1)).alias(
            "n_keepers"
        ),
        F.count(F.when(F.col("doc_id") != F.col("component"), 1)).alias(
            "n_dropped"
        ),
    )
