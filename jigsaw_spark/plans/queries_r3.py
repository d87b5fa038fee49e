"""Round-3 surface: semantic dedup, corpus boilerplate, table profiling,
native recursive CTE, and stream-static enrichment.

Five more first-class operators, each oracle-backed:

- **SemDeDup** (`dedup_semantic`): embedding-space near-dup removal with
  pairwise cosine restricted to k-means cells (Abbas et al. 2023) — the
  modern curation step between exact dedup and MinHash text dedup.
- **Boilerplate coverage** (`text_boilerplate`): corpus-frequent n-gram
  fraction per document — the n-gram generalization of C4's
  repeated-line rule.
- **Table profiler** (`profile_table`): one-scan per-column
  rows/nulls/distinct/min/max — the lake-table `DESCRIBE STATISTICS`
  primitive.
- **Recursive CTE** (`rel_recursive_rollup`): Spark 4.1's native
  `WITH RECURSIVE` (UNION ALL form) exercising the iterative-union
  execution path on a unique-parent hierarchy walk.
- **Stream-static enrichment** (`stream_static_join`): broadcast
  dimension join inside a stream (zero join state) → windowed rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.operators.text import shingles_sql, tokens_sql
from jigsaw_spark.plans.queries import _t, register

# DuckDB replay of `similarity.ivf_assign` over the deterministic k=8
# codebook (vec_id < 8) — same CTE the ann_ivf_assign oracle uses.
_CELLS_CTE = """
    cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT e.vec_id, c.cid,
             round(list_cosine_similarity(e.embedding::DOUBLE[],
                                          c.cvec::DOUBLE[]), 9) AS cos
      FROM embeddings e CROSS JOIN cent c
    ), cells AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid) AS rn
        FROM scored) t
      WHERE rn = 1
    )"""


@register(
    "dedup_semantic",
    f"""
    WITH {_CELLS_CTE},
    dup AS (
      SELECT b.vec_id, min(a.vec_id) AS dup_of
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                         eb.embedding::DOUBLE[]), 9) >= 0.4
      GROUP BY b.vec_id)
    SELECT c.vec_id, c.cell, d.dup_of,
           d.dup_of IS NOT NULL AS is_dup
    FROM cells c LEFT JOIN dup d ON c.vec_id = d.vec_id
    """,
    "SemDeDup: k-means-cell-restricted cosine near-dup marking (keep "
    "min-key per pair) — map-only cell assignment, ONE cell-keyed "
    "shuffle, JVM cosine, hash-agg survivorship",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    return semantic_dedup(emb, centroids, threshold=0.4)


@register(
    "text_boilerplate",
    f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql("text")} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, list_distinct({shingles_sql("t", 3)}) AS g
      FROM toks WHERE len(t) >= 3
    ),
    ex AS (SELECT doc_id, unnest(g) AS gram FROM grams),
    boiler AS (
      SELECT gram FROM ex GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 3),
    hits AS (
      SELECT doc_id, count(*) AS n_boiler
      FROM ex JOIN boiler USING (gram) GROUP BY doc_id)
    SELECT g.doc_id, len(g.g) AS n_grams,
           coalesce(h.n_boiler, 0) AS n_boiler,
           round(coalesce(h.n_boiler, 0)::DOUBLE / len(g.g), 6)
             AS boiler_frac,
           round(coalesce(h.n_boiler, 0)::DOUBLE / len(g.g), 6) > 0.5
             AS is_boiler
    FROM grams g LEFT JOIN hits h ON g.doc_id = h.doc_id
    """,
    "corpus-boilerplate coverage: fraction of each doc's distinct 3-grams "
    "appearing in >= 3 docs (C4 repeated-line rule at n-gram granularity) "
    "— distinct grams fold into the scan, one explode, two hash aggs",
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import boilerplate_coverage

    docs = _t(spark, sf_dir, "documents")
    return boilerplate_coverage(docs, "doc_id", "text", n=3, min_docs=3)


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@register(
    "profile_table",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_val,
           CAST(max({c}) AS VARCHAR) AS max_val
    FROM orders"""
        for c in _PROFILE_COLS
    ),
    "one-scan table profiler: per-column rows/nulls/exact-distinct/"
    "min/max in a single fused hash aggregate (Expand for the "
    "multi-distinct; approx_count_distinct is the no-Expand scale path), "
    "long-form via literal-array explode",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.aggregates import profile_columns

    orders = _t(spark, sf_dir, "orders")
    return profile_columns(orders, list(_PROFILE_COLS))


@register(
    "rel_recursive_rollup",
    """
    WITH RECURSIVE climb(root, price) AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) FROM orders
      UNION ALL
      SELECT root // 10, price FROM climb WHERE root >= 10
    )
    SELECT CAST(root AS INT) AS root_digit, count(*) AS n_orders,
           CAST(round(sum(price), 2) AS DOUBLE) AS total_price
    FROM climb WHERE root < 10 GROUP BY root
    """,
    "native WITH RECURSIVE (Spark 4.1 iterative UnionLoop): unique-parent "
    "decimal-trie walk — each level is a narrow map (no join, no shuffle "
    "per iteration), terminal rows aggregate once; exact decimal money "
    "sums keep the rollup order-independent. The BOM/org-chart recursion "
    "shape; UNION ALL form (Spark does not yet support cycle-safe UNION "
    "DISTINCT recursion — acyclic unique-parent graphs terminate without "
    "it).",
)
def rel_recursive_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    o = os.path.join(sf_dir, "orders.parquet")
    return spark.sql(
        f"""
        WITH RECURSIVE climb(root, price) AS (
          SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2))
          FROM parquet.`{o}`
          UNION ALL
          SELECT root DIV 10, price FROM climb WHERE root >= 10
        )
        SELECT CAST(root AS INT) AS root_digit, count(*) AS n_orders,
               CAST(round(sum(price), 2) AS DOUBLE) AS total_price
        FROM climb WHERE root < 10 GROUP BY root
        """
    )


# event_type → reporting category: the enrichment dimension a streaming
# pipeline would broadcast (KB-scale even at production cardinalities).
_EVENT_DIM = (
    ("view", "engagement"),
    ("click", "engagement"),
    ("purchase", "conversion"),
    ("signup", "conversion"),
    ("error", "ops"),
)

_DIM_CASE = (
    "CASE event_type "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _EVENT_DIM)
    + " END"
)


@register(
    "stream_static_join",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           {_DIM_CASE} AS category,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "stream-static enrichment: broadcast dimension join inside the stream "
    "(zero join state — each micro-batch joins the static snapshot) → "
    "watermarked 1-hour tumbling rollup per category; AvailableNow drain "
    "== the batch answer",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import (
        enriched_event_counts,
        read_event_stream,
    )

    import uuid

    dim = spark.createDataFrame(list(_EVENT_DIM), "event_type string, category string")
    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    agg = enriched_event_counts(stream, dim)
    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "text_topgram_coverage",
    f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql("text")} AS t FROM documents
    ),
    g AS (
      SELECT doc_id, unnest({shingles_sql("t", 2)}) AS gram
      FROM toks WHERE len(t) >= 2
    ),
    cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
    top AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt,
             CAST(sum(c) AS BIGINT) AS n_grams
      FROM cnt GROUP BY doc_id)
    SELECT doc_id, n_grams, top_cnt,
           round(top_cnt::DOUBLE / n_grams, 6) AS top_frac,
           round(top_cnt::DOUBLE / n_grams, 6) > 0.2 AS is_repetitive
    FROM top
    """,
    "Gopher top-n-gram coverage rule: fraction of a doc's 2-grams claimed "
    "by its single most frequent 2-gram (complements the duplicate-3-gram "
    "fraction in text_repetition) — one explode, two hash aggregates, "
    "counts only (tie-free: the top gram's identity never surfaces)",
)
def text_topgram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    # Generate barrier (explode of 1-elem array) keeps the regex tokenizer
    # out of the interpreted shingle lambda — same hazard/fix as
    # text.boilerplate_coverage
    toks = docs.select(
        F.col("doc_id"), F.explode(F.array(tokens_expr("text"))).alias("_t")
    ).where(F.size("_t") >= 2)
    g = toks.select(
        "doc_id", F.explode(shingles_expr("_t", 2)).alias("gram")
    )
    cnt = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    top = cnt.groupBy("doc_id").agg(
        F.max("c").alias("top_cnt"), F.sum("c").alias("n_grams")
    )
    frac = F.round(F.col("top_cnt") / F.col("n_grams"), 6)
    return top.select(
        "doc_id",
        "n_grams",
        "top_cnt",
        frac.alias("top_frac"),
        (frac > F.lit(0.2)).alias("is_repetitive"),
    )


@register(
    "ts_ohlc",
    """
    WITH o AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT user_id, bucket,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           min(value) AS low, max(value) AS high,
           count(*) AS n
    FROM o GROUP BY user_id, bucket
    """,
    "time-series downsampling to OHLC candles (per user per hour): "
    "open/close via min_by/max_by over the (ts, event_id) total order — "
    "ONE hash aggregate, no window, no sort (the oracle's two-window "
    "row_number formulation is the plan this one avoids)",
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.min_by("value", okey).alias("open"),
        F.max_by("value", okey).alias("close"),
        F.min("value").alias("low"),
        F.max("value").alias("high"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_mode",
    """
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      FROM orders GROUP BY o_orderstatus, o_orderpriority)
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(cnt AS BIGINT) AS mode_count
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderstatus
        ORDER BY cnt DESC, o_orderpriority) AS rn
      FROM c) t
    WHERE rn = 1
    """,
    "statistical mode per group with a DETERMINISTIC tie-break (highest "
    "count, then smallest value — Spark's built-in `mode` is "
    "tie-arbitrary): two cascaded hash aggregates via max_by on a "
    "(count, reversed-value) comparator, no window, no sort",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    c = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # min_by on (−count, value): highest count wins, ties break to the
    # lexicographically smallest value — both orderings natural in one
    # struct comparator (max_by would need a reversed string rank)
    best = c.groupBy("o_orderstatus").agg(
        F.min_by(
            F.struct(
                F.col("o_orderpriority").alias("mode_priority"),
                F.col("cnt").alias("mode_count"),
            ),
            F.struct((-F.col("cnt")).alias("nc"), F.col("o_orderpriority")),
        ).alias("b")
    )
    return best.select(
        "o_orderstatus", "b.mode_priority", "b.mode_count"
    )


@register(
    "j5_asof_forward_tol",
    """
    WITH v AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
    ), p AS (
      SELECT user_id, ts, max(event_id) AS p_event
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT v.event_id, v.user_id,
           CASE WHEN p.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.ts) <= 1800000000
                THEN p.p_event END AS next_purchase,
           CASE WHEN p.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.ts) <= 1800000000
                THEN epoch_us(p.ts) - epoch_us(v.ts) END AS wait_us
    FROM v ASOF LEFT JOIN p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
    "forward as-of join with tolerance (pandas merge_asof direction= "
    "'forward'): earliest purchase at-or-after each view per user, match "
    "nulled beyond 30 min — union-tag + forward running window, one "
    "shuffle; oracle is DuckDB ASOF (<=) with a post-join tolerance gate",
)
def j5_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.joins import asof_join

    events = _t(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event"))
    )
    out = asof_join(
        views,
        purchases,
        on=["user_id"],
        ts="ts",
        right_prefix="r_",
        direction="forward",
        tolerance_us=1_800_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("r_p_event").alias("next_purchase"),
        (F.unix_micros("r_ts") - F.unix_micros("ts")).alias("wait_us"),
    )


@register(
    "w9_distinct_window",
    """
    SELECT event_id, user_id,
           count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS kinds_so_far
    FROM events
    """,
    "running DISTINCT count over a window: Spark has no DISTINCT window "
    "aggregates, so the engine form is size(collect_set() OVER w) — "
    "set-dedup inside the frame, one shuffle + partition sort (state is "
    "the distinct-value set, bounded by event_type cardinality, not frame "
    "length); oracle uses DuckDB's native count(DISTINCT) OVER",
)
def w9_distinct_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("long")  # match the oracle's BIGINT count
        .alias("kinds_so_far"),
    )


@register(
    "fn_variant",
    """
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k,
           CAST(CAST(props->>'$.k' AS INT) % 7 AS INT) AS k_mod,
           CASE WHEN CAST(props->>'$.k' AS INT) >= 50
                THEN 'hi' ELSE 'lo' END AS band,
           CAST(props->>'$.absent' AS INT) AS absent
    FROM events
    """,
    "Spark 4 VARIANT path for semi-structured data: parse_json once into "
    "a typed variant column, then try_variant_get extractions (binary "
    "variant encoding decoded per access — vs fn_json's per-extraction "
    "string re-parse of get_json_object; one parse amortizes across N "
    "accesses, the semi-structured scale win). Missing paths yield NULL "
    "(try_ contract).",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "int")
    return v.select(
        "event_id",
        k.alias("k"),
        (k % 7).cast("int").alias("k_mod"),
        F.when(k >= 50, F.lit("hi")).otherwise(F.lit("lo")).alias("band"),
        F.try_variant_get("v", "$.absent", "int").alias("absent"),
    )


@register(
    "fn_hashes",
    """
    SELECT o_orderkey,
           md5(o_orderpriority) AS h_md5,
           sha256(o_orderpriority) AS h_sha256,
           md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus)
             AS h_composite
    FROM orders
    """,
    "cryptographic digest surface (md5 / sha-256 / composite-key "
    "fingerprint): the content-hash primitives the dedup family and "
    "md5-keyed determinism (P8) build on, evaluated JVM-side inside "
    "whole-stage codegen",
)
def fn_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.md5("o_orderpriority").alias("h_md5"),
        F.sha2("o_orderpriority", 256).alias("h_sha256"),
        F.md5(
            F.concat_ws("|", F.col("o_orderkey").cast("string"), "o_orderstatus")
        ).alias("h_composite"),
    )


def _hash_dim_sql(k: int) -> str:
    # 12 hex chars = 48 bits; /2^48 is an exact power-of-two division, so
    # the [-1,1) projection is bit-identical across engines
    return (
        f"((('0x' || substr(md5('rag|{k}|' || chunk_text), 1, 12))::UBIGINT"
        f" / 281474976710656.0) * 2 - 1)"
    )


@register(
    "rag_pipeline",
    f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql("text")} AS t FROM documents
    ),
    ch AS (
      SELECT doc_id, CAST(i // 32 AS INT) AS chunk_idx,
             array_to_string(list_slice(t, i + 1, least(i + 32, len(t))), ' ')
               AS chunk_text
      FROM (SELECT doc_id, t, unnest(range(0, len(t), 32)) AS i
            FROM toks WHERE len(t) >= 1) u
    ),
    e AS (
      SELECT doc_id * 1000 + chunk_idx AS vec_id,
             [{", ".join(_hash_dim_sql(k) for k in range(8))}] AS embedding
      FROM ch
    )
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_cosine_similarity(q.embedding, c.embedding), 4)
               AS cosine,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(q.embedding,
                                                     c.embedding), 9) DESC,
                        c.vec_id
             ) AS INT) AS rank
      FROM e q JOIN e c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 2000) t
    WHERE rank <= 3
    """,
    "end-to-end RAG corpus build: overlapping-window chunking → "
    "deterministic 8-dim hash embedding (md5 streams, exact 2^-48 "
    "projection — the SQL-replayable stand-in for a model encoder) → "
    "brute-force cosine top-3 retrieval for the first two docs' chunks. "
    "Every stage JVM-side; the embed step is the map-only pattern a real "
    "encoder UDF slots into (similarity.ivf_topk is the indexed scale "
    "path over the same vectors)",
)
def rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import cosine_topk
    from jigsaw_spark.operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "doc_id", chunk_size=32, overlap=0)
    dims = [
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit("rag"), F.lit(str(k)), "chunk_text"
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**12))
            * 2
            - 1
        )
        for k in range(8)
    ]
    emb = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("vec_id"),
        F.array(*dims).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 2000)
    return cosine_topk(emb, queries, k=3)
