"""Round-11 batch 1 (verdict r10 #4): the named north-star candidates —
per-source contamination attribution, the token-budget mixture solver,
and the ANN quantization-loss curve — plus the IVF balance report the
codec curve reads against. (The verdict's fourth candidate, phash
Hamming-band image near-dup, has been first-class since r6:
``mm_phash_near_dup`` in plans/queries_r6.py is exactly the banded
pigeonhole join; this batch extends the image arm elsewhere.)

- ``dq_contamination_by_source``: WHICH train source leaks into the
  holdout — ``dq_contamination`` (plans/queries_r41.py) reports how
  contaminated each holdout doc is; this is the actionable inverse:
  per train source, how many distinct holdout 8-grams it covers, how
  many it is the SOLE leaker of (the shingles that disappear if the
  source is dropped — the decontamination decision variable), and how
  many holdout docs it touches. Same 'contam|' md5 5% split, so the
  two reports describe one experiment.
- ``p_token_budget_mix``: the token-budget mixture solver — allocate a
  90% global token budget across sources under the uniform-mix policy
  (``p_mixture_reweight``'s target, in TOKENS not docs), capped by
  each source's actual token supply, with exact integer water-filling:
  sources below the water level are capped at capacity and their
  deficit redistributes to token-rich sources; the integer remainder
  is settled largest-remainder style (``p_quota_sample``'s seat rule —
  here all remainders tie, so seats go in source order). The capped
  test is a cross-multiplication (cap * remaining_sources <=
  remaining_budget), so no division happens before the final quotient.
- ``ann_codec_recall``: the quantization-loss curve (verdict r10 #4) —
  recall@{1,5,10} of SQ8 and PQ (m=4, k=16) asymmetric search against
  the brute-force cosine truth over the 5-query panel: raw query vs
  RECONSTRUCTED corpus (standard ADC evaluation), both arms ranked by
  the certified (round-9 DESC, id) tie order. ``ann_recall_curve``
  prices the IVF *probe* approximation; this prices the *codec*
  approximation — together they decompose end-to-end IVF-PQ loss.
- ``ann_ivf_balance``: per-cell IVF load report — size, corpus share,
  load vs uniform (1000 = balanced), and cell coherence (mean round-9
  member-to-centroid cosine as an exact integer nano sum // n): the
  hot-cell/skew diagnostic read before trusting any nprobe setting,
  and the operational twin of ``agg_skew_salted_distinct``'s salting
  decision for the ANN family.

Scale notes (100 TB): contamination attribution adds one (source,
shingle) hash-agg and a shingle-keyed equi-join to the certified
``dq_contamination`` shape — still no pair enumeration; the budget
solver is one source-keyed hash-agg followed by windows over a
|sources|-row relation (bounded dim); the codec curve scans the corpus
once per codec with map-only reconstruction (codebooks/stats ride the
closure) and reuses the Arrow ``cosine_topk`` kernel, so each arm is
linear in the corpus; the balance report is one map-only assignment
plus a |cells|-row hash-agg."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# dq_contamination_by_source
# ---------------------------------------------------------------------------


def _contam_by_source_sql() -> str:
    from jigsaw_spark.operators.text import shingles_sql, tokens_sql

    return f"""
    WITH split AS (
      SELECT doc_id, source, text,
             CAST(CAST(('0x' || substr(md5('contam|'
               || CAST(doc_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               % CAST(20 AS UBIGINT) AS BIGINT) = 0 AS is_holdout
      FROM documents),
    toks AS (
      SELECT doc_id, source, is_holdout, {tokens_sql('text')} AS t
      FROM split),
    sh AS (
      SELECT doc_id, source, is_holdout, unnest({shingles_sql('t', 8)}) AS sh
      FROM toks),
    hold_sh AS MATERIALIZED (
      SELECT DISTINCT sh FROM sh WHERE is_holdout),
    hold_doc_sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, sh FROM sh WHERE is_holdout),
    nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hold FROM hold_sh),
    train_src AS MATERIALIZED (
      SELECT DISTINCT source, sh FROM sh WHERE NOT is_holdout),
    hits AS MATERIALIZED (
      SELECT t.source, t.sh
      FROM train_src t JOIN hold_sh h ON t.sh = h.sh),
    multi AS (
      SELECT sh, CAST(count(*) AS BIGINT) AS ns FROM hits GROUP BY 1),
    per_sh AS (
      SELECT h.source,
             CAST(count(*) AS BIGINT) AS n_hit,
             CAST(sum(CASE WHEN m.ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sole
      FROM hits h JOIN multi m ON h.sh = m.sh GROUP BY 1),
    touched AS (
      SELECT h.source, CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs
      FROM hits h JOIN hold_doc_sh d ON h.sh = d.sh GROUP BY 1),
    srcs AS (SELECT DISTINCT source FROM split WHERE NOT is_holdout)
    SELECT s.source,
           CAST(coalesce(p.n_hit, 0) AS BIGINT) AS n_hit_shingles,
           CAST(coalesce(p.n_sole, 0) AS BIGINT) AS n_sole_shingles,
           CAST(coalesce(tc.n_docs, 0) AS BIGINT) AS n_holdout_docs,
           CAST(CASE WHEN (SELECT n_hold FROM nh) = 0 THEN 0
             ELSE coalesce(p.n_hit, 0) * 1000 // (SELECT n_hold FROM nh)
             END AS BIGINT) AS hit_share_milli
    FROM srcs s
    LEFT JOIN per_sh p ON s.source = p.source
    LEFT JOIN touched tc ON s.source = tc.source
"""


@register(
    "dq_contamination_by_source",
    _contam_by_source_sql(),
    "per-source contamination attribution (verdict r10 #4): which train "
    "SOURCE leaks into the holdout — dq_contamination scores each "
    "holdout doc, this inverts it: per train source, distinct holdout "
    "8-grams covered, SOLE-leaker grams (the ones that vanish if the "
    "source is dropped — the decontamination decision variable), "
    "holdout docs touched, and the milli share of all contaminated "
    "holdout grams. Same 'contam|' md5 5% split as dq_contamination, "
    "so both reports describe one experiment. Shape: the certified "
    "contamination join with the train side keyed (source, shingle) — "
    "hash-aggs plus one shingle-keyed equi-join, no pair enumeration; "
    "the sole-leaker count is a gram-keyed count join, not a window",
)
def dq_contamination_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    split = docs.select(
        "doc_id",
        "source",
        "text",
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
    # checkpoint the TOKENIZED rows, not the 8-gram explode: the explode
    # is ~|tokens| rows (x8 text volume) and materializing it at 100 TB
    # is a storage cliff — the three consumers below re-derive it from
    # the (much smaller) token arrays instead, the dq_contamination
    # discipline
    toks = split.select(
        "doc_id",
        "source",
        "is_holdout",
        tokens_expr("text").alias("t"),
    ).localCheckpoint()
    sh = toks.select(
        "doc_id",
        "source",
        "is_holdout",
        F.explode(shingles_expr("t", 8)).alias("sh"),
    )
    hold_sh = (
        sh.filter(F.col("is_holdout")).select("sh").distinct()
    ).localCheckpoint()
    hold_doc_sh = (
        sh.filter(F.col("is_holdout")).select("doc_id", "sh").distinct()
    )
    nh = hold_sh.agg(F.count(F.lit(1)).cast("bigint").alias("n_hold"))
    train_src = (
        sh.filter(~F.col("is_holdout")).select("source", "sh").distinct()
    )
    hits = train_src.join(hold_sh, "sh").localCheckpoint()
    multi = hits.groupBy("sh").agg(
        F.count(F.lit(1)).cast("bigint").alias("ns")
    )
    per_sh = (
        hits.join(multi, "sh")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hit"),
            F.sum(F.when(F.col("ns") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sole"),
        )
    )
    touched = (
        hits.select("source", "sh")
        .join(hold_doc_sh, "sh")
        .select("source", "doc_id")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    srcs = (
        split.filter(~F.col("is_holdout")).select("source").distinct()
    )
    return (
        srcs.join(per_sh, "source", "left")
        .join(touched, "source", "left")
        .crossJoin(F.broadcast(nh))
        .select(
            "source",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias(
                "n_hit_shingles"
            ),
            F.coalesce("n_sole", F.lit(0)).cast("bigint").alias(
                "n_sole_shingles"
            ),
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias(
                "n_holdout_docs"
            ),
            F.expr(
                "CAST(CASE WHEN n_hold = 0 THEN 0"
                " ELSE coalesce(n_hit, 0) * 1000 div n_hold END AS BIGINT)"
            ).alias("hit_share_milli"),
        )
    )


# ---------------------------------------------------------------------------
# p_token_budget_mix
# ---------------------------------------------------------------------------


def _token_budget_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH src AS MATERIALIZED (
      SELECT source, CAST(sum(len({tokens_sql('text')})) AS BIGINT) AS cap
      FROM documents GROUP BY 1),
    tot AS (
      SELECT CAST(sum(cap) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS s
      FROM src),
    b AS (SELECT total * 9 // 10 AS budget, s FROM tot),
    ord AS (
      SELECT source, cap,
             row_number() OVER (ORDER BY cap, source) AS j,
             CAST(coalesce(sum(cap) OVER (ORDER BY cap, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS pexcl
      FROM src),
    flags AS MATERIALIZED (
      SELECT o.source, o.cap, o.j, b.budget, b.s,
             (o.cap * (b.s - o.j + 1) <= b.budget - o.pexcl) AS capped
      FROM ord o CROSS JOIN b),
    kstat AS (
      SELECT CAST(coalesce(sum(CASE WHEN capped THEN 1 END), 0)
               AS BIGINT) AS kk,
             CAST(coalesce(sum(CASE WHEN capped THEN cap END), 0)
               AS BIGINT) AS pk
      FROM flags),
    unc AS (
      SELECT source, row_number() OVER (ORDER BY source) AS ru
      FROM flags WHERE NOT capped)
    SELECT f.source,
           CAST(f.cap AS BIGINT) AS cap_tokens,
           CAST(CASE WHEN f.capped THEN f.cap
             ELSE (f.budget - k.pk) // (f.s - k.kk)
                  + CASE WHEN u.ru <= (f.budget - k.pk) % (f.s - k.kk)
                    THEN 1 ELSE 0 END
             END AS BIGINT) AS alloc_tokens,
           f.capped,
           CAST(CASE WHEN f.cap = 0 THEN 0
             ELSE (CASE WHEN f.capped THEN f.cap
                   ELSE (f.budget - k.pk) // (f.s - k.kk)
                        + CASE WHEN u.ru <= (f.budget - k.pk)
                                           % (f.s - k.kk)
                          THEN 1 ELSE 0 END END) * 1000 // f.cap
             END AS BIGINT) AS fill_milli
    FROM flags f
    CROSS JOIN kstat k
    LEFT JOIN unc u ON f.source = u.source
"""


@register(
    "p_token_budget_mix",
    _token_budget_sql(),
    "token-budget mixture solver (verdict r10 #4): allocate a 90% "
    "global TOKEN budget across sources under the uniform-mix target "
    "(p_mixture_reweight's policy in tokens, not docs), capped by each "
    "source's actual token supply, via exact integer water-filling — "
    "below-level sources are capped at capacity (sorted by capacity, "
    "cappedness is prefix-closed, proven by cross-multiplication: "
    "cap * remaining_sources <= remaining_budget, so no division "
    "happens before the final quotient) and the surplus redistributes "
    "to token-rich sources with the integer remainder settled in "
    "source order (p_quota_sample's largest-remainder seats — all "
    "remainders tie here). sum(alloc) == budget and alloc <= cap by "
    "construction. Shape: one source-keyed hash-agg, then windows "
    "over a |sources|-row bounded dim",
)
def p_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(tokens_expr("text"))).cast("bigint").alias("cap")
    )
    tot = src.agg(
        F.sum("cap").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("s"),
    ).select(
        F.expr("total * 9 div 10").alias("budget"), "s"
    )
    w = Window.orderBy("cap", "source")
    ord_ = src.select(
        "source",
        "cap",
        F.row_number().over(w).alias("j"),
        F.coalesce(
            F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("pexcl"),
    )
    flags = ord_.crossJoin(F.broadcast(tot)).select(
        "source",
        "cap",
        "j",
        "budget",
        "s",
        (
            F.col("cap") * (F.col("s") - F.col("j") + 1)
            <= F.col("budget") - F.col("pexcl")
        ).alias("capped"),
    )
    kstat = flags.agg(
        F.coalesce(F.sum(F.when(F.col("capped"), 1)), F.lit(0))
        .cast("bigint")
        .alias("kk"),
        F.coalesce(F.sum(F.when(F.col("capped"), F.col("cap"))), F.lit(0))
        .cast("bigint")
        .alias("pk"),
    )
    unc = (
        flags.filter(~F.col("capped"))
        .select(
            "source",
            F.row_number().over(Window.orderBy("source")).alias("ru"),
        )
    )
    alloc_expr = (
        "CASE WHEN capped THEN cap"
        " ELSE (budget - pk) div (s - kk)"
        "      + CASE WHEN ru <= (budget - pk) % (s - kk)"
        "        THEN 1 ELSE 0 END END"
    )
    return (
        flags.crossJoin(F.broadcast(kstat))
        .join(unc, "source", "left")
        .select(
            "source",
            F.col("cap").cast("bigint").alias("cap_tokens"),
            F.expr(f"CAST(({alloc_expr}) AS BIGINT)").alias(
                "alloc_tokens"
            ),
            "capped",
            F.expr(
                "CAST(CASE WHEN cap = 0 THEN 0"
                f" ELSE ({alloc_expr}) * 1000 div cap END AS BIGINT)"
            ).alias("fill_milli"),
        )
    )


# ---------------------------------------------------------------------------
# ann_codec_recall
# ---------------------------------------------------------------------------

_CODEC_RECALL_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5),
    truth AS MATERIALIZED (
      SELECT query_id, vec_id, rank FROM (
        SELECT q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(
                   q.qv, c.embedding::DOUBLE[]), 9) DESC, c.vec_id)
                 AS rank
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id) t
      WHERE rank <= 10),
    dims AS (
      SELECT generate_subscripts(embedding, 1) AS d,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings),
    st AS (
      SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
      FROM (SELECT d, min(x) AS mn, max(x) AS mx FROM dims GROUP BY d) t),
    sq8r AS (
      SELECT vec_id,
             list_transform(range(1, len(embedding) + 1), i ->
               mns[i] + CAST(round(
                 CASE WHEN mxs[i] > mns[i]
                      THEN round((embedding[i]::DOUBLE - mns[i])
                                 / (mxs[i] - mns[i]), 9)
                      ELSE 0.0 END * 255, 0) AS INT) / 255.0
                 * (mxs[i] - mns[i])) AS rv
      FROM embeddings CROSS JOIN st),
    sq8t AS (
      SELECT query_id, vec_id, rank FROM (
        SELECT q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.qv, c.rv), 9)
                   DESC, c.vec_id) AS rank
        FROM q JOIN sq8r c ON c.vec_id <> q.query_id) t
      WHERE rank <= 10),
    ordered AS (
      SELECT embedding::DOUBLE[] AS sv,
             row_number() OVER (
               ORDER BY md5(concat_ws('|', 'pq-train',
                                      CAST(vec_id AS VARCHAR))),
                        vec_id) - 1 AS sidx
      FROM embeddings),
    seeds AS (SELECT * FROM ordered WHERE sidx < 16),
    codes AS (
      SELECT vec_id, j, sidx AS code FROM (
        SELECT e.vec_id, s.sidx, js.j,
               row_number() OVER (PARTITION BY e.vec_id, js.j ORDER BY
                 round(list_sum(list_transform(range(16), d ->
                   (e.embedding[js.j*16 + d + 1]::DOUBLE
                    - s.sv[js.j*16 + d + 1])
                   * (e.embedding[js.j*16 + d + 1]::DOUBLE
                      - s.sv[js.j*16 + d + 1]))), 9),
                 s.sidx) AS rn
        FROM embeddings e CROSS JOIN seeds s
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) js) t
      WHERE rn = 1),
    pqr AS (
      SELECT c.vec_id,
             flatten(list(list_transform(range(16), d ->
               s.sv[c.j*16 + d + 1]) ORDER BY c.j)) AS rv
      FROM codes c JOIN seeds s ON s.sidx = c.code
      GROUP BY c.vec_id),
    pqt AS (
      SELECT query_id, vec_id, rank FROM (
        SELECT q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.qv, c.rv), 9)
                   DESC, c.vec_id) AS rank
        FROM q JOIN pqr c ON c.vec_id <> q.query_id) t
      WHERE rank <= 10),
    kdim AS (SELECT unnest([1, 5, 10]) AS k),
    arms AS (
      SELECT 'sq8' AS codec, query_id, vec_id, rank FROM sq8t
      UNION ALL
      SELECT 'pq' AS codec, query_id, vec_id, rank FROM pqt),
    hits AS (
      SELECT a.codec, kd.k, CAST(count(*) AS BIGINT) AS hits
      FROM truth t
      JOIN arms a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
      CROSS JOIN kdim kd
      WHERE t.rank <= kd.k AND a.rank <= kd.k
      GROUP BY 1, 2),
    grid AS (
      SELECT codec, k
      FROM (SELECT unnest(['sq8', 'pq']) AS codec) c CROSS JOIN kdim)
    SELECT g.codec, CAST(g.k AS INT) AS k,
           CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           CAST(coalesce(h.hits, 0) * 1000 // (g.k * 5) AS BIGINT)
             AS recall_milli
    FROM grid g LEFT JOIN hits h ON g.codec = h.codec AND g.k = h.k
"""


@register(
    "ann_codec_recall",
    _CODEC_RECALL_SQL,
    "ANN quantization-loss curve (verdict r10 #4): recall@{1,5,10} of "
    "SQ8 and PQ (m=4, k=16) asymmetric search — raw query against the "
    "RECONSTRUCTED corpus, the standard ADC evaluation — vs the "
    "brute-force cosine truth over the 5-query panel, every arm ranked "
    "by the certified (round-9 DESC, id) tie order. ann_recall_curve "
    "prices the IVF probe approximation; this prices the CODEC "
    "approximation, so the two decompose end-to-end IVF-PQ loss into "
    "its parts. Shape: each codec arm is one map-only reconstruction "
    "(SQ8 stats / PQ codebooks ride the closure) feeding the Arrow "
    "cosine_topk kernel — linear in the corpus per arm; the recall "
    "join is k-bounded rank tables only",
)
def ann_codec_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import (
        cosine_topk,
        pq_encode,
        sq8_quantize,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # 5-row panel: materialize once — each cosine_topk call collects its
    # panel eagerly, so an uncheckpointed filter re-scans the parquet 3x
    panel = emb.filter(F.col("vec_id") < 5).localCheckpoint()
    truth = cosine_topk(emb, panel, k=10).select(
        "query_id",
        F.col("vec_id").alias("tvec"),
        F.col("rank").alias("t_rank"),
    )

    # SQ8 arm: codes -> reconstruction (same stats collect as the codec)
    stats = (
        emb.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "d", "x"
            )
        )
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("d")
        .collect()
    )
    mns = F.array(*[F.lit(r["mn"]) for r in stats])
    mxs = F.array(*[F.lit(r["mx"]) for r in stats])

    def _recon(c, i):
        mn, mx = F.element_at(mns, i + 1), F.element_at(mxs, i + 1)
        return mn + c.cast("double") / 255 * (mx - mn)

    # pass the stats rows through: sq8_quantize would otherwise re-run
    # the identical posexplode + (d) agg + collect over the full corpus
    sq8_corpus = sq8_quantize(emb, stats=stats).select(
        "vec_id", F.transform(F.col("codes"), _recon).alias("embedding")
    )

    # PQ arm: codes + literal codebooks -> reconstruction
    codes_df, books = pq_encode(emb, m=4, k=16)
    book_lits = [
        F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in b])
        for b in books
    ]
    recon = F.flatten(
        F.array(
            *[
                F.element_at(
                    book_lits[j], F.element_at(F.col("codes"), j + 1) + 1
                )
                for j in range(4)
            ]
        )
    )
    pq_corpus = codes_df.select("vec_id", recon.alias("embedding"))

    kdim = F.broadcast(
        spark.createDataFrame([(1,), (5,), (10,)], "k int")
    )
    cdim = F.broadcast(
        spark.createDataFrame([("sq8",), ("pq",)], "codec string")
    )

    def arm(codec: str, corpus: DataFrame) -> DataFrame:
        return cosine_topk(corpus, panel, k=10).select(
            F.lit(codec).alias("codec"),
            F.col("query_id").alias("aq"),
            F.col("vec_id").alias("avec"),
            F.col("rank").alias("a_rank"),
        )

    arms = arm("sq8", sq8_corpus).unionByName(arm("pq", pq_corpus))
    hits = (
        truth.join(
            arms,
            (F.col("query_id") == F.col("aq"))
            & (F.col("tvec") == F.col("avec")),
        )
        .crossJoin(kdim)
        .filter(
            (F.col("t_rank") <= F.col("k"))
            & (F.col("a_rank") <= F.col("k"))
        )
        .groupBy("codec", "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    grid = cdim.crossJoin(kdim)
    return grid.join(hits, ["codec", "k"], "left").select(
        "codec",
        F.col("k").cast("int").alias("k"),
        F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
        F.expr(
            "CAST(coalesce(hits, 0) * 1000 div (k * 5) AS BIGINT)"
        ).alias("recall_milli"),
    )


# ---------------------------------------------------------------------------
# ann_ivf_balance
# ---------------------------------------------------------------------------

_IVF_BALANCE_SQL = """
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id < 8),
    assign AS (
      SELECT vec_id, cell, cos FROM (
        SELECT e.vec_id, c.cid AS cell,
               round(list_cosine_similarity(
                 e.embedding::DOUBLE[], c.cvec), 9) AS cos,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(
                   e.embedding::DOUBLE[], c.cvec), 9) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c) t
      WHERE rn = 1),
    per AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(cos * 1000000000, 0) AS BIGINT))
               AS BIGINT) AS cos_nano_sum
      FROM assign GROUP BY 1),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS total,
             CAST((SELECT count(*) FROM cent) AS BIGINT) AS ncells
      FROM embeddings)
    SELECT c.cid AS cell,
           CAST(coalesce(p.n, 0) AS BIGINT) AS n_vectors,
           CAST(coalesce(p.n, 0) * 1000 // t.total AS BIGINT)
             AS share_milli,
           CAST(coalesce(p.n, 0) * t.ncells * 1000 // t.total AS BIGINT)
             AS load_milli,
           CAST(CASE WHEN coalesce(p.n, 0) = 0 THEN 0
             ELSE p.cos_nano_sum // (p.n * 1000000) END AS BIGINT)
             AS coherence_milli
    FROM cent c LEFT JOIN per p ON c.cid = p.cell CROSS JOIN tot t
"""


@register(
    "ann_ivf_balance",
    _IVF_BALANCE_SQL,
    "IVF cell load report: per cell, member count, corpus share, load "
    "vs uniform (1000 = perfectly balanced; a hot cell reads >1000 and "
    "is the partition a skewed nprobe search serializes on) and cell "
    "coherence — mean round-9 member-to-centroid cosine as an exact "
    "integer (nano-scaled sum // n, so the mean is order- and "
    "partition-independent). ann_ivf_assign emits the assignment; this "
    "is the operational skew+quality summary read before trusting any "
    "nprobe setting — the ANN twin of agg_skew_salted_distinct's "
    "salting decision. Shape: map-only assignment (codebook in the "
    "closure), one |cells|-row hash-agg, broadcast dims",
)
def ann_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.vectors import cosine_similarity
    from jigsaw_spark.operators.similarity import ivf_assign

    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    )
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in cent_rows
    ]
    cent = F.broadcast(
        spark.createDataFrame(
            [(c, v) for c, v in centroids],
            "cell bigint, cvec array<double>",
        )
    )
    assigned = (
        ivf_assign(emb, centroids)
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .join(cent, "cell")
        .select(
            "cell",
            F.round(
                cosine_similarity(
                    F.col("embedding").cast("array<double>"),
                    F.col("cvec"),
                ),
                9,
            ).alias("cos"),
        )
    )
    per = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("cos") * 1000000000, 0).cast("bigint"))
        .cast("bigint")
        .alias("cos_nano_sum"),
    )
    tot = emb.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.lit(len(centroids)).cast("bigint").alias("ncells"),
    )
    cells = F.broadcast(
        spark.createDataFrame([(c,) for c, _ in centroids], "cell bigint")
    )
    return (
        cells.join(per, "cell", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "cell",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_vectors"),
            F.expr(
                "CAST(coalesce(n, 0) * 1000 div total AS BIGINT)"
            ).alias("share_milli"),
            F.expr(
                "CAST(coalesce(n, 0) * ncells * 1000 div total"
                " AS BIGINT)"
            ).alias("load_milli"),
            F.expr(
                "CAST(CASE WHEN coalesce(n, 0) = 0 THEN 0"
                " ELSE cos_nano_sum div (n * 1000000) END AS BIGINT)"
            ).alias("coherence_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Round-11 batch 8 (same module — the window is governed by _R11_NEW in
# plans/queries; modules at/after _OVERFLOW_BOUNDARY queue behind it).
# ---------------------------------------------------------------------------

# dq_dedup_bias --------------------------------------------------------------


def _dedup_bias_sql() -> str:
    from jigsaw_spark.operators.text import (
        alnum_ratio_sql,
        lang_hits_sql,
        lang_predict_sql,
        tokens_sql,
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
    labeled AS (
      SELECT d.doc_id, d.n_chars, d.text,
             coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
    flags AS (
      SELECT doc_id <> component AS is_dropped, n_chars,
             (len({tokens_sql('text')}) >= 20
              AND {alnum_ratio_sql('text')} >= 0.5 AND
              {lang_predict_sql(
                  f"CAST({lang_hits_sql(tokens_sql('text'), 'en')} AS INT)",
                  f"CAST({lang_hits_sql(tokens_sql('text'), 'es')} AS INT)",
                  f"CAST({lang_hits_sql(tokens_sql('text'), 'fr')} AS INT)",
              )} = 'en') AS passes
      FROM labeled),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM flags)
    SELECT f.is_dropped,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) * 1000 // (SELECT n_all FROM tot) AS BIGINT)
             AS share_milli,
           CAST(sum(CASE WHEN f.passes THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           CAST(sum(CASE WHEN f.passes THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS pass_milli,
           CAST(sum(f.n_chars) // count(*) AS BIGINT) AS mean_chars
    FROM flags f GROUP BY 1
"""


@register(
    "dq_dedup_bias",
    _dedup_bias_sql(),
    "does min-id keeper selection throw away quality: every doc "
    "labeled by its near-dup component (keeper graph -> min reachable "
    "id; singletons keep themselves), then survivors vs dropped "
    "compared on the v1 gate pass rate and mean length. Exact dedup "
    "drops BYTE-IDENTICAL copies (no bias possible); NEAR-dup keepers "
    "are chosen by id, so a systematic pass-rate gap between kept and "
    "dropped is dedup-induced selection bias — the measurement that "
    "justifies dedup_exact_keep_best's keep-the-best policy at the "
    "near-dup tier. Shape: the shared keeper graph -> the production "
    "components shape -> one map-side gate projection -> a 2-row "
    "rollup",
)
def dq_dedup_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_pairs,
    )
    from jigsaw_spark.operators.text import (
        alnum_ratio_expr,
        lang_hits_expr,
        lang_predict_expr,
        tokens_expr,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = keeper_pairs(docs, "doc_id").localCheckpoint()
    comp = connected_components(pairs)
    labeled = docs.join(comp, "doc_id", "left").select(
        "n_chars",
        "text",
        (
            F.col("doc_id")
            != F.coalesce("component", F.col("doc_id"))
        ).alias("is_dropped"),
    )
    t = tokens_expr("text")
    flags = labeled.select(
        "is_dropped",
        "n_chars",
        (
            (F.size(t) >= 20)
            & (alnum_ratio_expr("text") >= 0.5)
            & (
                lang_predict_expr(
                    lang_hits_expr(t, "en"),
                    lang_hits_expr(t, "es"),
                    lang_hits_expr(t, "fr"),
                )
                == "en"
            )
        ).alias("passes"),
    )
    tot = flags.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    return (
        flags.groupBy("is_dropped")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("passes"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pass"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "is_dropped",
            "n_docs",
            F.expr("CAST(n_docs * 1000 div n_all AS BIGINT)").alias(
                "share_milli"
            ),
            "n_pass",
            F.expr("CAST(n_pass * 1000 div n_docs AS BIGINT)").alias(
                "pass_milli"
            ),
            F.expr("CAST(sum_chars div n_docs AS BIGINT)").alias(
                "mean_chars"
            ),
        )
    )


# dq_split_smd ---------------------------------------------------------------


def _split_smd_sql() -> str:
    from jigsaw_spark.operators.text import alnum_ratio_sql, tokens_sql

    return f"""
    WITH split AS (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) AS c_chars,
             CAST(len({tokens_sql('text')}) AS BIGINT) AS c_tokens,
             CAST(round({alnum_ratio_sql('text')} * 1000, 0) AS BIGINT)
               AS c_alnum,
             CAST(CAST(('0x' || substr(md5('contam|'
               || CAST(doc_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               % CAST(20 AS UBIGINT) AS BIGINT) = 0 AS is_holdout
      FROM documents),
    long AS (
      SELECT is_holdout, 'n_chars' AS covariate, c_chars AS x FROM split
      UNION ALL
      SELECT is_holdout, 'n_tokens', c_tokens FROM split
      UNION ALL
      SELECT is_holdout, 'alnum_milli', c_alnum FROM split),
    m AS (
      SELECT covariate,
             CAST(sum(CASE WHEN is_holdout THEN 0 ELSE 1 END)
               AS BIGINT) AS n_tr,
             CAST(sum(CASE WHEN is_holdout THEN 1 ELSE 0 END)
               AS BIGINT) AS n_ho,
             CAST(sum(CASE WHEN is_holdout THEN 0 ELSE x END)
               AS HUGEINT) AS s_tr,
             CAST(sum(CASE WHEN is_holdout THEN x ELSE 0 END)
               AS HUGEINT) AS s_ho,
             CAST(sum(CASE WHEN is_holdout THEN 0 ELSE x * x END)
               AS HUGEINT) AS q_tr,
             CAST(sum(CASE WHEN is_holdout THEN x * x ELSE 0 END)
               AS HUGEINT) AS q_ho
      FROM long GROUP BY 1)
    SELECT covariate, n_tr, n_ho,
           CAST(s_tr // n_tr AS BIGINT) AS mean_train,
           CAST(s_ho // n_ho AS BIGINT) AS mean_holdout,
           CAST(round(CASE
             WHEN (CAST(n_tr AS DOUBLE) * q_tr - CAST(s_tr * s_tr AS DOUBLE))
                  / (CAST(n_tr AS DOUBLE) * n_tr)
                + (CAST(n_ho AS DOUBLE) * q_ho - CAST(s_ho * s_ho AS DOUBLE))
                  / (CAST(n_ho AS DOUBLE) * n_ho) = 0 THEN 0
             ELSE abs(CAST(s_tr AS DOUBLE) / n_tr
                      - CAST(s_ho AS DOUBLE) / n_ho)
                  / sqrt((
                    (CAST(n_tr AS DOUBLE) * q_tr
                     - CAST(s_tr * s_tr AS DOUBLE))
                    / (CAST(n_tr AS DOUBLE) * n_tr)
                  + (CAST(n_ho AS DOUBLE) * q_ho
                     - CAST(s_ho * s_ho AS DOUBLE))
                    / (CAST(n_ho AS DOUBLE) * n_ho)) / 2.0)
             END * 1000, 0) AS BIGINT) AS smd_milli
    FROM m
"""


@register(
    "dq_split_smd",
    _split_smd_sql(),
    "holdout-balance audit: standardized mean difference of each doc "
    "covariate (n_chars, token count, milli alnum ratio) between the "
    "'contam' md5 train/holdout split — |mean_tr - mean_ho| / "
    "sqrt((var_tr + var_ho)/2), the covariate-balance statistic "
    "(SMD > 100 milli is the standard imbalance flag): a 5% holdout "
    "that is longer or cleaner than train measures a different "
    "population and every eval on it inherits the tilt. All moments "
    "are exact integer/HUGEINT sums; the only floats are the final "
    "variance ratio and ONE IEEE sqrt (the Welch precedent), "
    "milli-snapped on both engines. Shape: one scan into a 3-arm "
    "union, one (covariate)-keyed moment hash-agg — 3 rows out",
)
def dq_split_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import alnum_ratio_expr, tokens_expr

    docs = _t(spark, sf_dir, "documents")
    split = docs.select(
        F.col("n_chars").cast("bigint").alias("c_chars"),
        F.size(tokens_expr("text")).cast("bigint").alias("c_tokens"),
        F.round(alnum_ratio_expr("text") * 1000, 0)
        .cast("bigint")
        .alias("c_alnum"),
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
    ).localCheckpoint()

    def arm(name: str, col: str) -> DataFrame:
        return split.select(
            "is_holdout",
            F.lit(name).alias("covariate"),
            F.col(col).alias("x"),
        )

    long = (
        arm("n_chars", "c_chars")
        .unionByName(arm("n_tokens", "c_tokens"))
        .unionByName(arm("alnum_milli", "c_alnum"))
    )
    dec = "decimal(38,0)"
    m = long.groupBy("covariate").agg(
        F.sum(F.when(F.col("is_holdout"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_tr"),
        F.sum(F.when(F.col("is_holdout"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_ho"),
        F.sum(
            F.when(F.col("is_holdout"), F.lit(0)).otherwise(F.col("x"))
            .cast(dec)
        ).alias("s_tr"),
        F.sum(
            F.when(F.col("is_holdout"), F.col("x")).otherwise(F.lit(0))
            .cast(dec)
        ).alias("s_ho"),
        F.sum(
            F.when(F.col("is_holdout"), F.lit(0))
            .otherwise(F.col("x") * F.col("x"))
            .cast(dec)
        ).alias("q_tr"),
        F.sum(
            F.when(F.col("is_holdout"), F.col("x") * F.col("x"))
            .otherwise(F.lit(0))
            .cast(dec)
        ).alias("q_ho"),
    )
    var_expr = (
        "(CAST(n_tr AS DOUBLE) * q_tr - CAST(s_tr * s_tr AS DOUBLE))"
        " / (CAST(n_tr AS DOUBLE) * n_tr)"
        " + (CAST(n_ho AS DOUBLE) * q_ho - CAST(s_ho * s_ho AS DOUBLE))"
        " / (CAST(n_ho AS DOUBLE) * n_ho)"
    )
    return m.select(
        "covariate",
        "n_tr",
        "n_ho",
        F.expr("CAST(s_tr div n_tr AS BIGINT)").alias("mean_train"),
        F.expr("CAST(s_ho div n_ho AS BIGINT)").alias("mean_holdout"),
        F.expr(
            f"CAST(round(CASE WHEN {var_expr} = 0 THEN 0"
            " ELSE abs(CAST(s_tr AS DOUBLE) / n_tr"
            " - CAST(s_ho AS DOUBLE) / n_ho)"
            f" / sqrt(({var_expr}) / 2.0) END * 1000, 0) AS BIGINT)"
        ).alias("smd_milli"),
    )
