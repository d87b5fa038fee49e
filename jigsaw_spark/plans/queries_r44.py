"""Round-9 batch 4: streaming contamination, biased (node2vec) walks,
and skip-gram pair extraction — completing the graph-embedding data-prep
story and keeping the streaming surface growing.

- ``stream_contamination``: the streaming twin of ``dq_contamination``
  — documents arrive as a file-source stream, holdout docs' 8-gram
  shingle OCCURRENCES are left-joined against the static train shingle
  set, and per-doc counts are maintained incrementally (complete-mode
  state = one row per holdout doc). Occurrence counts (not per-doc
  distinct) are the streaming-friendly metric: distinct-per-doc would
  need a second stateful op, and two chained stateful aggs without a
  watermark trip Spark's correctness check (the stream_dsir_score
  lesson); the batch oracle uses the same occurrence semantics.
- ``graph_node2vec_walk``: 3-step BIASED random walks (node2vec,
  Grover & Leskovec 2016) over the near-dup keeper graph with p=2,
  q=1/2 — x2-scaled integer edge weights 1 (return to the previous
  node), 2 (stay in the previous node's neighborhood), 4 (explore
  outward); the step draws from the keyed md5 stream via cumulative
  weights over the sorted neighbor list, so the walk distribution is
  the node2vec alpha up to integer scaling AND every step is exactly
  replayable on both engines. ``graph_random_walk`` is the uniform
  special case; the bias needs the PREVIOUS node, which is exactly
  the extra state this query threads through each step.
- ``graph_walk_skipgrams``: (center, context) skip-gram pairs with
  window 2 extracted from the certified ``graph_random_walk`` corpus
  — the final hop of the DeepWalk data prep: walks are only useful as
  the pair table a word2vec-style trainer actually consumes.

Scale notes (100 TB): streaming contamination holds one counter row
per holdout doc (bounded by the holdout, not the corpus) and the train
set is a static side loaded once; node2vec costs one adjacency join
per step plus one LEFT join for the previous node's neighborhood — the
weight/selection arithmetic is per-row list math inside codegen (no
explode, no window); skipgrams explode 5 positions per walk and
self-join on the walk key — output bounded by walks x 8 pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# stream_contamination
# ---------------------------------------------------------------------------


def _stream_contamination_sql() -> str:
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
      SELECT DISTINCT sh FROM sh WHERE NOT is_holdout)
    SELECT h.doc_id,
           CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(t.sh) AS BIGINT) AS n_hit_occ,
           CAST(count(t.sh) * 1000 // count(*) AS BIGINT)
             AS contam_occ_milli
    FROM sh h LEFT JOIN train_sh t ON h.sh = t.sh
    WHERE h.is_holdout
    GROUP BY 1
"""


@register(
    "stream_contamination",
    _stream_contamination_sql(),
    "streaming twin of dq_contamination: documents arrive as a "
    "file-source stream, holdout docs' 8-gram shingle OCCURRENCES "
    "left-join the static train shingle set, per-doc counters "
    "maintained incrementally and drained with AvailableNow — the "
    "decontamination audit running as eval docs land rather than as a "
    "batch sweep. Occurrence (not per-doc-distinct) counts are the "
    "streaming-native metric: distinct would need a second stateful "
    "op and two chained stateful aggs without a watermark trip the "
    "correctness check (the stream_dsir_score lesson); docs with zero "
    "shingles (< 8 tokens) produce no stream rows and are out of "
    "scope by definition. State: one counter row per holdout doc, "
    "bounded by the holdout size, never the corpus",
)
def stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_document_stream

    is_holdout = (
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

    from jigsaw_spark.session import widen

    # static side: the train shingle set, computed in batch once —
    # widened BEFORE the 8-gram explode (the single-dense-file
    # one-partition trap; the stream side only carries the 5% holdout
    # and stays cheap without it)
    # materialized BEFORE the stream starts: inside the drain the plan
    # would execute under the streaming confs (AQE off, state-sized
    # shuffle partitions — 8-way on a 32-core box), so the full-corpus
    # explode+distinct ran 4× underparallelized; batch-side it runs at
    # session parallelism with AQE and the drain joins materialized
    # blocks (guide §2.4; static side of a stream-static join is
    # re-planned per micro-batch, so this also pins it to one execution)
    train_sh = (
        widen(_t(spark, sf_dir, "documents"))
        .filter(~is_holdout)
        .select(
            F.explode(shingles_expr(tokens_expr("text"), 8)).alias("tsh")
        )
        .distinct()
        .localCheckpoint()
    )

    stream = read_document_stream(spark, sf_dir)
    hold_occ = (
        stream.filter(is_holdout)
        .select(
            "doc_id",
            F.explode(shingles_expr(tokens_expr("text"), 8)).alias("sh"),
        )
    )
    joined = hold_occ.join(
        train_sh, hold_occ["sh"] == train_sh["tsh"], "left"
    )
    agg = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.count("tsh").alias("n_hit_occ"),
    )
    name = f"stream_contam_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "doc_id",
        F.col("n_occ").cast("bigint").alias("n_occ"),
        F.col("n_hit_occ").cast("bigint").alias("n_hit_occ"),
        F.expr("CAST(n_hit_occ * 1000 div n_occ AS BIGINT)").alias(
            "contam_occ_milli"
        ),
    )


# ---------------------------------------------------------------------------
# graph_node2vec_walk
# ---------------------------------------------------------------------------


def _node2vec_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _SIMHASH_KEEPER_CTE

    return f"""
    WITH RECURSIVE {_SIMHASH_KEEPER_CTE},
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    eset AS (
      SELECT doc_a AS u, doc_b AS v FROM prs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM prs),
    adj AS MATERIALIZED (
      SELECT u, list(v ORDER BY v) AS nbrs FROM eset GROUP BY u),
    walk(s, start, prev, node, path) AS (
      SELECT 0, u, CAST(NULL AS BIGINT), u, CAST(u AS VARCHAR) FROM adj
      UNION ALL
      SELECT s + 1, start, node, nxt,
             path || '->' || CAST(nxt AS VARCHAR)
      FROM (
        SELECT s, start, node, path,
               cn[CAST(list_min(list_filter(
                 generate_series(1, len(cn)),
                 i -> list_sum(ws[1:i]) > r)) AS INT)] AS nxt
        FROM (
          SELECT q1.*,
                 CAST(h % CAST(list_sum(ws) AS BIGINT) AS BIGINT) AS r
          FROM (
            SELECT w.s, w.start, w.node, w.path, c.nbrs AS cn,
                   list_transform(c.nbrs, x ->
                     CASE WHEN w.prev IS NULL THEN 1
                          WHEN x = w.prev THEN 1
                          WHEN list_contains(p.nbrs, x) THEN 2
                          ELSE 4 END) AS ws,
                   CAST(CAST(('0x' || substr(md5(
                     'n2v|' || CAST(w.start AS VARCHAR)
                     || '|' || CAST(w.s AS VARCHAR)
                     || '|' || CAST(coalesce(w.prev, -1) AS VARCHAR)
                     || '|' || CAST(w.node AS VARCHAR)), 1, 12))
                     AS UBIGINT) AS BIGINT) AS h
            FROM walk w
            JOIN adj c ON c.u = w.node
            LEFT JOIN adj p ON p.u = w.prev
            WHERE w.s < 3) q1) q2) stepped)
    SELECT CAST(start AS BIGINT) AS start,
           CAST(node AS BIGINT) AS final_node,
           path
    FROM walk WHERE s = 3
"""


@register(
    "graph_node2vec_walk",
    _node2vec_sql(),
    "3-step BIASED random walks (node2vec, Grover & Leskovec 2016) "
    "from every node of the near-dup keeper graph, p=2 / q=1/2 as "
    "x2-scaled integer weights: 1 to return to the previous node, 2 to "
    "stay in its neighborhood, 4 to explore outward — the second-order "
    "walk that interpolates BFS/DFS and feeds node2vec embeddings; "
    "graph_random_walk is the uniform special case (and step 0, with "
    "no previous node, uses unit weights — the identical rule). Each "
    "step draws from the keyed md5 stream via cumulative weights over "
    "the SORTED neighbor list, so the distribution is the node2vec "
    "alpha up to scaling and every step replays exactly on both "
    "engines. Shape: adjacency is one hash-agg localCheckpoint'ed "
    "once; per step ONE adjacency join for candidates + ONE left join "
    "for the previous node's neighborhood (the second-order state); "
    "weight/selection arithmetic is per-row list math inside codegen "
    "— no explode, no window, frontier-sized shuffles only",
)
def graph_node2vec_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    pairs = simhash_pairs(keepers, "doc_id", max_hamming=2).select(
        "doc_a", "doc_b"
    )
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    adj = (
        edges.groupBy("u")
        .agg(F.sort_array(F.collect_set("v")).alias("nbrs"))
        .localCheckpoint()
    )
    walk = adj.select(
        F.col("u").alias("start"),
        F.lit(None).cast("long").alias("prev"),
        F.col("u").alias("node"),
        F.col("u").cast("string").alias("path"),
    )
    for s in range(3):
        # fresh aliases each round (the graph_random_walk ambiguity rule)
        c = adj.select(
            F.col("u").alias(f"_cu{s}"), F.col("nbrs").alias(f"_cn{s}")
        )
        p = adj.select(
            F.col("u").alias(f"_pu{s}"), F.col("nbrs").alias(f"_pn{s}")
        )
        stepped = walk.join(c, walk["node"] == c[f"_cu{s}"]).join(
            p, walk["prev"] == p[f"_pu{s}"], "left"
        )
        # materialize the weight list and the drawn residue as columns
        # BEFORE the selection expression: inlining `ws` twice inside
        # the filter lambda made codegen re-derive the transform per
        # candidate index (an O(deg^2) expression tree per step)
        ws = (
            f"transform(_cn{s}, x -> CASE WHEN prev IS NULL THEN 1L"
            f" WHEN x = prev THEN 1L"
            f" WHEN array_contains(_pn{s}, x) THEN 2L ELSE 4L END)"
        )
        h = (
            "CAST(conv(substring(md5(concat_ws('|', 'n2v',"
            f" CAST(start AS STRING), '{s}',"
            " CAST(coalesce(prev, -1) AS STRING),"
            " CAST(node AS STRING))), 1, 12), 16, 10) AS BIGINT)"
        )
        staged = stepped.withColumn("_ws", F.expr(ws)).withColumn(
            "_r",
            F.expr(f"pmod({h}, aggregate(_ws, 0L, (a, x) -> a + x))"),
        )
        nxt = (
            f"element_at(_cn{s}, CAST(array_min(filter("
            f"sequence(1, size(_cn{s})),"
            " i -> aggregate(slice(_ws, 1, i), 0L, (a, x) -> a + x)"
            " > _r)) AS INT))"
        )
        walk = staged.select(
            "start",
            F.expr(nxt).alias("_nxt"),
            F.col("node").alias("_newprev"),
            F.concat(
                F.col("path"), F.lit("->"), F.expr(nxt).cast("string")
            ).alias("path"),
        ).select(
            "start",
            F.col("_newprev").alias("prev"),
            F.col("_nxt").alias("node"),
            "path",
        )
    return walk.select(
        F.col("start").cast("bigint").alias("start"),
        F.col("node").cast("bigint").alias("final_node"),
        "path",
    )


# ---------------------------------------------------------------------------
# graph_walk_skipgrams
# ---------------------------------------------------------------------------


def _skipgrams_sql() -> str:
    from jigsaw_spark.plans.queries_r40 import _walk_with_clause

    return (
        _walk_with_clause()
        + """
    , wtoks AS (
      SELECT start, string_split(path, '->') AS tl
      FROM walk WHERE s = 4),
    pos AS (
      SELECT start, i, CAST(tl[CAST(i AS INT)] AS BIGINT) AS tok
      FROM wtoks, LATERAL (SELECT unnest(generate_series(1, len(tl))) AS i) _)
    SELECT a.tok AS center, b.tok AS context,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pos a JOIN pos b
      ON a.start = b.start AND a.i <> b.i AND abs(a.i - b.i) <= 2
    GROUP BY 1, 2
"""
    )


@register(
    "graph_walk_skipgrams",
    _skipgrams_sql(),
    "(center, context) skip-gram pairs with window 2 extracted from "
    "the graph_random_walk corpus — the final hop of DeepWalk-style "
    "graph-embedding data prep: the walk table is only useful as the "
    "pair table a word2vec-style trainer consumes, and this is that "
    "table (pair frequencies included; both directions emitted, the "
    "standard symmetric context). Revisits in a walk legitimately "
    "yield self-cooccurrence and repeated pairs — that IS the walk "
    "distribution. Shape: one posexplode of the 5 walk positions, one "
    "self-join on the walk key (start — one walk per node), one pair "
    "hash-agg; output bounded by walks x 8 window pairs",
)
def graph_walk_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries_r40 import graph_random_walk

    walks = graph_random_walk(spark, sf_dir)
    pos = walks.select(
        "start",
        F.posexplode(F.split("path", "->")).alias("i", "tok"),
    ).select("start", "i", F.col("tok").cast("bigint").alias("tok"))
    a = pos.select(
        F.col("start").alias("sa"), F.col("i").alias("ia"),
        F.col("tok").alias("center"),
    )
    b = pos.select(
        F.col("start").alias("sb"), F.col("i").alias("ib"),
        F.col("tok").alias("context"),
    )
    return (
        a.join(
            b,
            (F.col("sa") == F.col("sb"))
            & (F.col("ia") != F.col("ib"))
            & (F.abs(F.col("ia") - F.col("ib")) <= 2),
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
