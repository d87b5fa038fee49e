"""Round-12 batch 1: the verdict-r11 #4 composites — cross-modal dedup
evidence, contamination-aware split repair, the consolidated ANN
recall-vs-cost frontier, and the burstiness-aware watermark advisor.

- ``dedup_cross_modal``: which image-bearing documents carry BOTH text
  near-dup evidence (keeper-graph pair membership) and image near-dup
  evidence (banded dHash pair membership) — the 2x2 corroboration
  table that decides whether a dedup decision can be made on one
  modality alone. Composes the shared keeper machinery with the phash
  pair machinery; no new pair enumeration.
- ``dq_split_repair``: the remediation twin of
  ``dq_contamination_by_source`` — per source, how many contaminated
  holdout docs must be demoted to train, how many globally-unique
  (at the 8-gram grain) train docs are available to promote in their
  place, and the residual that cannot be repaired within the source.
  Exact-count swaps preserve both split size and source mix.
- ``ann_pareto_frontier``: the consolidated index-tuning table —
  recall@10 AND scan cost per (codec, nprobe) over one shared IVF
  candidate generation, merging ``ann_nprobe_tradeoff`` (probe axis)
  and ``ann_codec_recall`` (codec axis) into the single Pareto
  relation a tuner reads: does quantization loss compound with probe
  loss, and what does a recall point cost in scanned candidates.
- ``stream_watermark_advisor``: recommend a per-event-type IDLE
  TIMEOUT from measured arrival behavior — exact p99 inter-arrival
  gap (second grain) bumped to the next minute, doubled when the
  day-count Fano factor says arrivals are bursty (> 2x Poisson) —
  with the exact count of observed gaps that would still fire the
  timeout. The fixture stream is perfectly event-time ordered
  (stream_lateness_audit certifies zero lateness), so the idle-source
  question is the watermark decision the data can actually inform;
  composes ``ts_fano_factor``'s overdispersion with the gap
  distribution.

Scale notes (100 TB): cross-modal is two membership semi-joins against
already-banded pair lists plus a 4-row grid; split repair is gram
hash-aggs and one gram-keyed equi-join (df computed once, never pair
enumeration); the frontier shares ONE cell-restricted candidate join
per nprobe across codecs (broadcast codebooks/stats, corpus never
shuffled); the advisor is a type-partitioned running-max window, a
quantized (type, second) dim, and |types|-row rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# dedup_cross_modal
# ---------------------------------------------------------------------------


def _cross_modal_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    {_PHASH_BYTES_CTE.strip().rstrip()},
    tdocs AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM prs
        UNION ALL SELECT doc_b AS doc_id FROM prs)),
    mcand AS (
      SELECT DISTINCT x.i AS ia, y.i AS ib
      FROM ph_bytes x
      JOIN ph_bytes y ON x.byte_idx = y.byte_idx
                     AND x.byte_val = y.byte_val AND x.i < y.i),
    mham AS (
      SELECT c.ia, c.ib,
             CAST(sum(bit_count(xor(x.byte_val, y.byte_val))) AS BIGINT)
               AS hamming
      FROM mcand c
      JOIN ph_bytes x ON x.i = c.ia
      JOIN ph_bytes y ON y.i = c.ib AND y.byte_idx = x.byte_idx
      GROUP BY 1, 2),
    idocs AS (
      SELECT DISTINCT doc_id FROM (
        SELECT ia AS doc_id FROM mham WHERE hamming <= 6
        UNION ALL SELECT ib AS doc_id FROM mham WHERE hamming <= 6)),
    universe AS (SELECT DISTINCT i AS doc_id FROM ph_bytes),
    flags AS (
      SELECT u.doc_id,
             CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS text_dup,
             CASE WHEN m.doc_id IS NULL THEN 0 ELSE 1 END AS image_dup
      FROM universe u
      LEFT JOIN tdocs t ON u.doc_id = t.doc_id
      LEFT JOIN idocs m ON u.doc_id = m.doc_id),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_images FROM universe),
    cells AS (
      SELECT text_dup, image_dup, CAST(count(*) AS BIGINT) AS n_docs
      FROM flags GROUP BY 1, 2),
    grid AS (
      SELECT a.text_dup, b.image_dup
      FROM (SELECT unnest([0, 1]) AS text_dup) a
      CROSS JOIN (SELECT unnest([0, 1]) AS image_dup) b)
    SELECT CAST(g.text_dup AS INT) AS text_dup,
           CAST(g.image_dup AS INT) AS image_dup,
           CAST(coalesce(c.n_docs, 0) AS BIGINT) AS n_docs,
           CAST(CASE WHEN t.n_images = 0 THEN 0
             ELSE coalesce(c.n_docs, 0) * 1000 // t.n_images
             END AS BIGINT) AS share_milli
    FROM grid g
    LEFT JOIN cells c
      ON g.text_dup = c.text_dup AND g.image_dup = c.image_dup
    CROSS JOIN tot t
"""


@register(
    "dedup_cross_modal",
    _cross_modal_sql(),
    "cross-modal dedup corroboration (verdict r11 #4): over the "
    "image-bearing documents, the 2x2 table of text near-dup evidence "
    "(keeper-graph pair membership — the shared SimHash-banded keeper "
    "machinery) x image near-dup evidence (banded dHash pair "
    "membership at Hamming <= 6). The (1,1) cell is the corroborated "
    "set a dedup pipeline can act on with confidence; the off-diagonal "
    "cells are single-modality evidence that needs the other arm "
    "checked before deletion. Shape: two membership semi-joins against "
    "already-banded pair lists, a 4-row zero-filled grid — composes "
    "certified machinery, enumerates nothing new",
)
def dedup_cross_modal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_pairs
    from jigsaw_spark.plans.queries_r6 import mm_phash_near_dup

    docs = _t(spark, sf_dir, "documents")
    tp = keeper_pairs(docs, "doc_id").localCheckpoint()
    tdocs = (
        tp.select(F.col("doc_a").alias("doc_id"))
        .union(tp.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("t", F.lit(1))
    )
    ip = mm_phash_near_dup(spark, sf_dir).localCheckpoint()
    idocs = (
        ip.select(F.col("img_a").cast("bigint").alias("doc_id"))
        .union(ip.select(F.col("img_b").cast("bigint").alias("doc_id")))
        .distinct()
        .withColumn("m", F.lit(1))
    )
    # the id universe IS the synth filter (one image per doc_id % 10 == 0
    # row, image_id = str(doc_id); phash_dhash never drops a row) — no
    # second synth→encode→decode→dHash pass just to enumerate ids
    universe = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("doc_id")
    )
    flags = (
        universe.join(tdocs, "doc_id", "left")
        .join(idocs, "doc_id", "left")
        .select(
            F.coalesce("t", F.lit(0)).alias("text_dup"),
            F.coalesce("m", F.lit(0)).alias("image_dup"),
        )
    )
    tot = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images")
    )
    cells = flags.groupBy("text_dup", "image_dup").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    two = spark.range(0, 2).select(F.col("id").cast("int"))
    grid = two.select(F.col("id").alias("text_dup")).crossJoin(
        two.select(F.col("id").alias("image_dup"))
    )
    return (
        grid.join(cells, ["text_dup", "image_dup"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("text_dup").cast("int").alias("text_dup"),
            F.col("image_dup").cast("int").alias("image_dup"),
            F.coalesce("n_docs", F.lit(0))
            .cast("bigint")
            .alias("n_docs"),
            F.expr(
                "CAST(CASE WHEN n_images = 0 THEN 0"
                " ELSE coalesce(n_docs, 0) * 1000 div n_images"
                " END AS BIGINT)"
            ).alias("share_milli"),
        )
    )


# ---------------------------------------------------------------------------
# dq_split_repair
# ---------------------------------------------------------------------------


def _split_repair_sql() -> str:
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
    contam AS (
      SELECT DISTINCT g.doc_id
      FROM dg g
      JOIN split s ON g.doc_id = s.doc_id
      JOIN train_sh h ON g.sh = h.sh
      WHERE s.is_holdout),
    gdf AS MATERIALIZED (
      SELECT sh, CAST(count(*) AS BIGINT) AS df FROM dg GROUP BY sh),
    doc_max AS (
      SELECT g.doc_id, max(d.df) AS mx
      FROM dg g JOIN gdf d ON g.sh = d.sh GROUP BY g.doc_id),
    pool AS (
      SELECT s.doc_id, s.source
      FROM split s LEFT JOIN doc_max m ON s.doc_id = m.doc_id
      WHERE NOT s.is_holdout AND coalesce(m.mx, 1) <= 1),
    per_src AS (
      SELECT s.source,
             CAST(sum(CASE WHEN s.is_holdout THEN 1 ELSE 0 END)
               AS BIGINT) AS n_holdout,
             CAST(sum(CASE WHEN s.is_holdout AND c.doc_id IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
             CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pool
      FROM split s
      LEFT JOIN contam c ON s.doc_id = c.doc_id
      LEFT JOIN pool p ON s.doc_id = p.doc_id
      GROUP BY s.source)
    SELECT source, n_holdout, n_contaminated, n_pool,
           CAST(least(n_contaminated, n_pool) AS BIGINT) AS n_promote,
           CAST(n_contaminated - least(n_contaminated, n_pool)
             AS BIGINT) AS n_residual,
           CAST(n_holdout - n_contaminated
             + least(n_contaminated, n_pool) AS BIGINT)
             AS post_holdout
    FROM per_src
"""


@register(
    "dq_split_repair",
    _split_repair_sql(),
    "contamination-aware split repair (verdict r11 #4) — the "
    "remediation twin of dq_contamination_by_source, same 'contam|' "
    "md5 5% holdout: per source, the contaminated holdout docs that "
    "must be DEMOTED to train (any shared 8-gram with the train side), "
    "the swap pool of PROMOTABLE train docs (every 8-gram has "
    "corpus-wide document frequency 1 — such a doc can neither be "
    "contaminated nor contaminate, so promotion is provably safe; "
    "gram-less docs are vacuously safe), the exact-count swap "
    "(least(demote, pool) — within-source so the holdout's source mix "
    "survives the repair), the unrepairable residual, and the "
    "post-repair holdout size. Shape: one distinct (doc, gram) "
    "relation serves the contamination semi-join AND the df hash-agg; "
    "no windows, no pair enumeration",
)
def dq_split_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    split = docs.select(
        "doc_id",
        "source",
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
    # one (sh) hash-agg over raw gram instances (set semantics subsume
    # the distinct), train-presence via the pure-expression holdout
    # flag on the doc array, then one (doc) agg carrying BOTH the
    # contamination flag and the max posting df — no split joins, no
    # semi-join chain, no gram-keyed self-join (guide §2.3/§2.4)
    holdout_of = lambda d: (  # noqa: E731 — the certified flag, per element
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit("contam"), d)), 1, 12
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(20),
        )
        == 0
    )
    per_doc = (
        split.select(
            "doc_id", F.explode(shingles_expr("t", 8)).alias("sh")
        )
        .groupBy("sh")
        .agg(F.collect_set("doc_id").alias("_ds"))
        .select(
            F.size("_ds").cast("bigint").alias("df"),
            F.exists("_ds", lambda d: ~holdout_of(d)).alias("_ht"),
            F.explode("_ds").alias("doc_id"),
        )
        .groupBy("doc_id")
        .agg(
            F.max("df").alias("mx"),
            F.max(F.when(F.col("_ht"), 1).otherwise(0)).alias("_anyt"),
        )
    )
    flags = split.select("doc_id", "source", "is_holdout").join(
        per_doc, "doc_id", "left"
    )
    return flags.groupBy("source").agg(
        F.sum(F.when(F.col("is_holdout"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_holdout"),
        F.sum(
            F.when(
                F.col("is_holdout") & (F.col("_anyt") == 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_contaminated"),
        F.sum(
            F.when(
                ~F.col("is_holdout")
                & (F.coalesce(F.col("mx"), F.lit(1)) <= 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_pool"),
    ).select(
        "source",
        "n_holdout",
        "n_contaminated",
        "n_pool",
        F.least("n_contaminated", "n_pool")
        .cast("bigint")
        .alias("n_promote"),
        (
            F.col("n_contaminated")
            - F.least("n_contaminated", "n_pool")
        )
        .cast("bigint")
        .alias("n_residual"),
        (
            F.col("n_holdout")
            - F.col("n_contaminated")
            + F.least("n_contaminated", "n_pool")
        )
        .cast("bigint")
        .alias("post_holdout"),
    )


# ---------------------------------------------------------------------------
# ann_pareto_frontier
# ---------------------------------------------------------------------------

_FRONTIER_NPROBES = (1, 2, 4)


def _pareto_frontier_sql() -> str:
    arms = []
    rows = []
    for np_ in _FRONTIER_NPROBES:
        arms.append(f"""
    probes_{np_} AS (
      SELECT query_id, cell FROM probes_all WHERE rn <= {np_}),
    cand_{np_} AS MATERIALIZED (
      SELECT p.query_id, a.vec_id
      FROM probes_{np_} p JOIN assign a ON a.cell = p.cell
      WHERE a.vec_id <> p.query_id),
    nsc_{np_} AS (
      SELECT CAST(count(*) AS BIGINT) AS n_scored FROM cand_{np_})""")
        for codec, corpus in (("raw", "rawr"), ("sq8", "sq8r")):
            arms.append(f"""
    top_{codec}_{np_} AS (
      SELECT query_id, vec_id FROM (
        SELECT c.query_id, c.vec_id,
               row_number() OVER (PARTITION BY c.query_id
                 ORDER BY round(list_cosine_similarity(q.qv, e.rv), 9)
                 DESC, c.vec_id) AS rank
        FROM cand_{np_} c
        JOIN q ON q.query_id = c.query_id
        JOIN {corpus} e ON e.vec_id = c.vec_id) t
      WHERE rank <= 10)""")
            rows.append(f"""
      SELECT '{codec}' AS codec, {np_} AS nprobe,
             (SELECT n_scored FROM nsc_{np_}) AS n_scored,
             (SELECT CAST(count(*) AS BIGINT)
              FROM truth t JOIN top_{codec}_{np_} s
                ON t.query_id = s.query_id AND t.vec_id = s.vec_id)
               AS hits""")
    unions = "\n      UNION ALL\n      ".join(rows)
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id < 8),
    q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5),
    assign AS MATERIALIZED (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(
                   e.embedding::DOUBLE[], c.cvec), 9) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
    probes_all AS MATERIALIZED (
      SELECT query_id, cell, rn FROM (
        SELECT q.query_id, c.cid AS cell,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.qv, c.cvec), 9)
                 DESC, c.cid) AS rn
        FROM q CROSS JOIN cent c) t),
    truth AS MATERIALIZED (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(
                   q.qv, c.embedding::DOUBLE[]), 9) DESC, c.vec_id)
                 AS rank
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id) t
      WHERE rank <= 10),
    rawr AS (
      SELECT vec_id, embedding::DOUBLE[] AS rv FROM embeddings),
    dims AS (
      SELECT generate_subscripts(embedding, 1) AS d,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings),
    st AS (
      SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
      FROM (SELECT d, min(x) AS mn, max(x) AS mx FROM dims GROUP BY d) t),
    sq8r AS MATERIALIZED (
      SELECT vec_id,
             list_transform(range(1, len(embedding) + 1), i ->
               mns[i] + CAST(round(
                 CASE WHEN mxs[i] > mns[i]
                      THEN round((embedding[i]::DOUBLE - mns[i])
                                 / (mxs[i] - mns[i]), 9)
                      ELSE 0.0 END * 255, 0) AS INT) / 255.0
                 * (mxs[i] - mns[i])) AS rv
      FROM embeddings CROSS JOIN st),
    brute AS (
      SELECT CAST(5 * (count(*) - 1) AS BIGINT) AS n_brute
      FROM embeddings),
    trc AS (
      SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
    {','.join(arms)}
    SELECT r.codec, CAST(r.nprobe AS INT) AS nprobe,
           r.n_scored, r.hits,
           CAST(r.hits * 1000 // t.n_truth AS BIGINT) AS recall_milli,
           CAST(r.n_scored * 1000 // b.n_brute AS BIGINT)
             AS scan_share_milli,
           CAST(CASE WHEN r.n_scored = 0 THEN 0
             ELSE (r.hits * 1000 // t.n_truth) * 1000
                  // (r.n_scored * 1000 // b.n_brute) END AS BIGINT)
             AS recall_per_scan_milli
    FROM ({unions}) r CROSS JOIN brute b CROSS JOIN trc t
"""


@register(
    "ann_pareto_frontier",
    _pareto_frontier_sql(),
    "the consolidated ANN tuning frontier (verdict r11 #4): recall@10 "
    "AND scan cost per (codec, nprobe) in ONE relation — "
    "ann_nprobe_tradeoff sweeps the probe axis at raw precision, "
    "ann_codec_recall sweeps the codec at full scan; this crosses "
    "them, answering whether quantization loss COMPOUNDS with probe "
    "loss and what a recall point costs in scanned candidates "
    "(recall_per_scan is the Pareto sort key). Asymmetric ADC: raw "
    "query against the codec-reconstructed corpus, candidates from "
    "the RAW coarse assignment (indexes assign on raw at build time). "
    "Shape: ONE shared assignment + probe ranking, one cell-restricted "
    "candidate join per nprobe SHARED by both codecs, k-bounded rank "
    "tables; codebooks/stats ride broadcast closures",
)
def ann_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.vectors import cosine_similarity
    from jigsaw_spark.operators.similarity import (
        _ivf_scored_candidates,
        _to_double,
        cosine_topk,
        sq8_quantize,
    )

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
    # recall denominator derived from the truth relation itself, not a
    # hardcoded 5x10 (advisor r12 #3): if the panel or corpus ever
    # shrinks below k+1 vectors, recall stays exact on both engines
    n_truth = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth")
    )

    # SQ8 reconstruction (the ann_codec_recall recipe: 64-row stats
    # collect -> map-only JVM transform, corpus never shuffled)
    stats = (
        emb.select(
            F.posexplode(
                F.col("embedding").cast("array<double>")
            ).alias("d", "x")
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

    sq8r = sq8_quantize(emb).select(
        "vec_id", F.transform(F.col("codes"), _recon).alias("rv")
    )
    rawr = emb.select("vec_id", _to_double("embedding").alias("rv"))

    # probe lists nest (nprobe n = probe_rank <= n of ONE ranking), so
    # the corpus-side assignment kernel and the cell join run ONCE at
    # max nprobe with probe_rank carried; per-nprobe candidate sets are
    # filters, and each codec rescoring joins the corpus once instead
    # of once per nprobe (guide §2.4: 3 preludes + 6 joins → 1 + 2)
    scored_all = _ivf_scored_candidates(
        emb,
        panel,
        centroids,
        max(_FRONTIER_NPROBES),
        "vec_id",
        "embedding",
        keep_probe_rank=True,
    ).localCheckpoint()
    # single-window form (r14, guide §2.4): the per-arm top-10 rank is
    # a RUNNING COUNT of arm members over the one total order
    # (round(cos,9) desc, vec_id) — identical to row_number over the
    # filtered arm because candidate rows are unique per (query, vec)
    # — so ONE window pass per codec replaces the 3 per-arm windows,
    # the truth membership rides as a broadcast-join marker instead of
    # 3 semi-join count jobs, and the 6 hit counts + 3 n_scored counts
    # fold into one aggregate per codec + one over the candidate list
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
    n_scored_row = scored_all.agg(
        *[
            F.sum(
                F.when(F.col("probe_rank") <= np_, 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"ns{np_}")
            for np_ in _FRONTIER_NPROBES
        ]
    )
    per_codec = []
    for codec, corpus in (("raw", rawr), ("sq8", sq8r)):
        rescored = (
            scored_all.select("query_id", "qv", "vec_id", "probe_rank")
            .join(corpus, "vec_id")
            .withColumn("cos", cosine_similarity("qv", "rv"))
            .select("query_id", "vec_id", "probe_rank", "cos")
        )
        ranked = rescored.select(
            "query_id",
            "vec_id",
            "probe_rank",
            *[
                F.sum(
                    F.when(F.col("probe_rank") <= np_, 1).otherwise(0)
                )
                .over(wopen)
                .alias(f"rn{np_}")
                for np_ in _FRONTIER_NPROBES
            ],
        )
        hits_row = ranked.join(tmark, ["query_id", "vec_id"], "left").agg(
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
                for np_ in _FRONTIER_NPROBES
            ]
        )
        per_codec.append(
            hits_row.crossJoin(F.broadcast(n_scored_row)).select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(codec).alias("codec"),
                                F.lit(np_).cast("int").alias("nprobe"),
                                F.col(f"ns{np_}").alias("n_scored"),
                                F.col(f"h{np_}").alias("hits"),
                            )
                            for np_ in _FRONTIER_NPROBES
                        ]
                    )
                ).alias("r")
            ).select("r.codec", "r.nprobe", "r.n_scored", "r.hits")
        )
    out = per_codec[0].unionByName(per_codec[1])
    return (
        out.crossJoin(F.broadcast(n_brute))
        .crossJoin(F.broadcast(n_truth))
        .select(
            "codec",
            "nprobe",
            "n_scored",
            "hits",
            F.expr("CAST(hits * 1000 div n_truth AS BIGINT)").alias(
                "recall_milli"
            ),
            F.expr(
                "CAST(n_scored * 1000 div n_brute AS BIGINT)"
            ).alias("scan_share_milli"),
            F.expr(
                "CAST(CASE WHEN n_scored = 0 THEN 0"
                " ELSE (hits * 1000 div n_truth) * 1000"
                " div (n_scored * 1000 div n_brute) END AS BIGINT)"
            ).alias("recall_per_scan_milli"),
        )
    )


# ---------------------------------------------------------------------------
# stream_watermark_advisor
# ---------------------------------------------------------------------------

_WM_SQL = """
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS x, event_id FROM events),
    gaps AS (
      SELECT event_type,
             x - lag(x) OVER (PARTITION BY event_type
                              ORDER BY x, event_id) AS gap_us
      FROM e),
    gsec AS (
      SELECT event_type,
             (gap_us + 999999) // 1000000 AS gap_s
      FROM gaps WHERE gap_us IS NOT NULL),
    dim AS MATERIALIZED (
      SELECT event_type, gap_s, CAST(count(*) AS BIGINT) AS c
      FROM gsec GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS n_gaps
      FROM dim GROUP BY 1),
    cum AS (
      SELECT event_type, gap_s,
             sum(c) OVER (PARTITION BY event_type ORDER BY gap_s
                          ROWS UNBOUNDED PRECEDING) AS cc
      FROM dim),
    p99 AS (
      SELECT c.event_type,
             CAST(min(c.gap_s) AS BIGINT) AS p99_gap_s
      FROM cum c JOIN tot t ON c.event_type = t.event_type
      WHERE c.cc >= (99 * t.n_gaps + 99) // 100
      GROUP BY 1),
    daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS dx
      FROM events GROUP BY 1, 2),
    fano AS (
      SELECT event_type,
             CAST(CASE WHEN count(*) * sum(dx) = 0 THEN 0
               ELSE (count(*) * sum(dx * dx) - sum(dx) * sum(dx)) * 1000
                    // (count(*) * sum(dx)) END AS BIGINT) AS fano_milli
      FROM daily GROUP BY 1),
    rec AS (
      SELECT p.event_type, t.n_gaps, f.fano_milli, p.p99_gap_s,
             CAST(CASE WHEN f.fano_milli > 2000 THEN 2 ELSE 1 END
               * (((p.p99_gap_s + 59) // 60) * 60) AS BIGINT)
               AS idle_timeout_s
      FROM p99 p
      JOIN tot t ON p.event_type = t.event_type
      JOIN fano f ON p.event_type = f.event_type),
    beyond AS (
      SELECT r.event_type,
             CAST(coalesce(sum(CASE WHEN d.gap_s > r.idle_timeout_s
               THEN d.c ELSE 0 END), 0) AS BIGINT) AS n_beyond
      FROM rec r JOIN dim d ON r.event_type = d.event_type
      GROUP BY 1)
    SELECT r.event_type, r.n_gaps, r.fano_milli, r.p99_gap_s,
           r.idle_timeout_s, b.n_beyond,
           CAST(CASE WHEN r.n_gaps = 0 THEN 0
             ELSE b.n_beyond * 1000 // r.n_gaps END AS BIGINT)
             AS beyond_milli
    FROM rec r JOIN beyond b ON r.event_type = b.event_type
"""


@register(
    "stream_watermark_advisor",
    _WM_SQL,
    "burstiness-aware idle-timeout advisor per event type (verdict r11 "
    "#4): the fixture's event stream is perfectly event-time ordered "
    "(stream_lateness_audit certifies all-zero lateness), so the "
    "watermark decision that REMAINS is the idle-source one — how long "
    "may a source stay silent before the pipeline advances time past "
    "it (Flink's withIdleness / Spark's stateful-timeout sizing). "
    "Exact p99 inter-arrival gap (ceil'd to second grain so the "
    "quantile dim is value-domain bounded), bumped to the next minute, "
    "DOUBLED when the day-count Fano factor says arrivals are bursty "
    "(> 2x Poisson's 1000 milli — a bursty process produces longer "
    "genuine silences than its p99 calm-period gap), plus the exact "
    "count and milli share of observed gaps that would STILL fire the "
    "recommended timeout (the premature-close incidents). Composes "
    "ts_fano_factor's overdispersion with the gap distribution into "
    "the timeout both exist to inform. Shape: one type-partitioned lag "
    "window, a quantized (type, second) dim with a dim-bounded "
    "cumulative window, |types|-row rollups",
)
def stream_watermark_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type", F.unix_micros("ts").alias("x"), "event_id"
    )
    # lag ordered by (ts, event_id), not event_id alone (advisor r12
    # #2): the fixture is certified zero-lateness so the two orders
    # coincide today, but event-time order is the semantic contract —
    # on an out-of-order fixture gaps stay non-negative by construction
    wlag = Window.partitionBy("event_type").orderBy("x", "event_id")
    gaps = e.select(
        "event_type",
        (F.col("x") - F.lag("x").over(wlag)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    gsec = gaps.select(
        "event_type",
        F.expr(
            "CAST((gap_us + 999999) div 1000000 AS BIGINT)"
        ).alias("gap_s"),
    )
    dim = gsec.groupBy("event_type", "gap_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = dim.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_gaps")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dim.select(
        "event_type", "gap_s", F.sum("c").over(wcum).alias("cc")
    )
    p99 = (
        cum.join(tot, "event_type")
        .filter(
            F.col("cc") >= F.expr("(99 * n_gaps + 99) div 100")
        )
        .groupBy("event_type")
        .agg(F.min("gap_s").cast("bigint").alias("p99_gap_s"))
    )
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("dx"))
    fano = daily.groupBy("event_type").agg(
        F.expr(
            "CAST(CASE WHEN count(1) * sum(dx) = 0 THEN 0"
            " ELSE (count(1) * sum(dx * dx) - sum(dx) * sum(dx)) * 1000"
            " div (count(1) * sum(dx)) END AS BIGINT)"
        ).alias("fano_milli")
    )
    rec = (
        p99.join(tot, "event_type")
        .join(fano, "event_type")
        .select(
            "event_type",
            "n_gaps",
            "fano_milli",
            "p99_gap_s",
            F.expr(
                "CAST(CASE WHEN fano_milli > 2000 THEN 2 ELSE 1 END"
                " * (((p99_gap_s + 59) div 60) * 60) AS BIGINT)"
            ).alias("idle_timeout_s"),
        )
    )
    beyond = (
        rec.select("event_type", "idle_timeout_s")
        .join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("gap_s") > F.col("idle_timeout_s"),
                        F.col("c"),
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_beyond")
        )
    )
    return rec.join(beyond, "event_type").select(
        "event_type",
        "n_gaps",
        "fano_milli",
        "p99_gap_s",
        "idle_timeout_s",
        "n_beyond",
        F.expr(
            "CAST(CASE WHEN n_gaps = 0 THEN 0"
            " ELSE n_beyond * 1000 div n_gaps END AS BIGINT)"
        ).alias("beyond_milli"),
    )
