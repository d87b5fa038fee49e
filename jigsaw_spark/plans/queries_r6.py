"""Round-6 operators: DSIR importance resampling, batch sessionization,
incremental rollup maintenance, Z-order layout keys, streaming LSH dedup.

Reference parity: the reference's dataset-construction mandate
(jigsaw/dataset.py, jigsaw/write_dataset.py) is a batch selection +
export pipeline; these extend the same training-data surface with the
next operators a 100 TB curation deployment reaches for:

- ``curation_dsir_weights`` / ``p_dsir_resample``: Data Selection via
  Importance Resampling (Xie et al. 2023) — score raw docs by hashed
  n-gram similarity to a target corpus, then seeded Gumbel-top-k
  resampling. The published scalable alternative to training a quality
  classifier per target domain.
- ``ts_sessionize``: gap-based batch sessionization — the batch twin of
  ``stream_stateful_sessions`` (same 30-min gap semantics), the
  canonical event-log preprocessing step.
- ``agg_incremental_merge``: algebraic aggregate-state maintenance —
  merge per-batch partial states instead of recomputing the corpus
  rollup (the incremental-materialized-view pattern; at 100 TB the
  nightly batch touches GBs, not the full corpus).
- ``layout_zorder``: Morton (Z-order) interleaving of two dimension
  keys into one clustering key — the lakehouse data-layout technique
  that makes multi-dimensional min/max file skipping work.
- ``stream_lsh_dedup``: streaming near-dup ADMISSION — new documents
  arrive as a stream, MinHash band signatures are computed in the same
  map-only Arrow kernel as the batch path, and a stream-static anti-join
  against the historical bucket index drops near-dups before ingest.

Float discipline (PLANS.md audit): DSIR log-ratios snap to integer
micro-units per BUCKET (one libm call each, identical derivation both
engines) so per-doc weights are exact integer sums; session/rollup
outputs are exact integers or timestamps; the z-order key is pure bit
arithmetic from one shared SQL expression string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.operators.text import tokens_sql
from jigsaw_spark.plans.queries import _t, register

_DSIR_B = 4096  # hashed-feature buckets


# DuckDB twin of the Spark-side gram->bucket pipeline (unigrams + word
# bigrams, md5-hashed into _DSIR_B buckets). Shared by both DSIR queries.
_DSIR_CTE = f"""
    toks AS (
      SELECT doc_id, CAST(lang = 'en' AS INT) AS is_target,
             {tokens_sql('text')} AS t
      FROM documents),
    grams AS (
      SELECT doc_id, is_target, unnest(t) AS gram FROM toks
      UNION ALL
      SELECT doc_id, is_target, t[i] || ' ' || t[i+1] AS gram
      FROM toks, LATERAL (
        SELECT unnest(range(1, len(t))) AS i) ii
      WHERE len(t) >= 2),
    bucketed AS (
      SELECT doc_id, is_target,
             ('0x' || substr(md5(gram), 1, 12))::UBIGINT % {_DSIR_B} AS bucket
      FROM grams),
    per_doc AS (
      SELECT doc_id, bucket, count(*) AS c, max(is_target) AS is_target
      FROM bucketed GROUP BY doc_id, bucket),
    dist AS (
      SELECT bucket,
             sum(CASE WHEN is_target = 1 THEN c ELSE 0 END) AS tgt,
             sum(c) AS raw
      FROM per_doc GROUP BY bucket),
    tot AS (SELECT sum(tgt) AS T, sum(raw) AS R FROM dist),
    ratio AS (
      SELECT bucket,
             CAST(round((ln(CAST(tgt + 1 AS DOUBLE) / (T + {_DSIR_B}))
                       - ln(CAST(raw + 1 AS DOUBLE) / (R + {_DSIR_B})))
                        * 1e6) AS BIGINT) AS r_micro
      FROM dist CROSS JOIN tot),
    weights AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_grams,
             CAST(sum(c * r_micro) AS BIGINT) AS logw_micro
      FROM per_doc JOIN ratio USING (bucket)
      GROUP BY doc_id)
"""


@register(
    "curation_dsir_weights",
    f"""
    WITH {_DSIR_CTE}
    SELECT doc_id, n_grams, logw_micro,
           round(logw_micro / 1e6, 6) AS logw
    FROM weights
    """,
    "DSIR importance weights (Xie et al. 2023): hashed unigram+bigram "
    "bucket counts, target(lang=en)-vs-raw Laplace-smoothed log-ratio "
    "per bucket snapped to integer micro-units (one libm call per "
    "bucket, never per doc), per-doc weight an EXACT integer sum. ONE "
    "gram explode + (doc,bucket) hash agg; the bucket distribution "
    "aggregates from the SAME partials into a 4096-row broadcast dim — "
    "no second corpus scan, no self-join, linear at any scale",
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.samples import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    w = dsir_weights(docs, "doc_id", F.col("lang") == "en", buckets=_DSIR_B)
    return w.select(
        "doc_id",
        "n_grams",
        "logw_micro",
        F.round(F.col("logw_micro") / 1e6, 6).alias("logw"),
    )


_DSIR_K = 100


@register(
    "p_dsir_resample",
    f"""
    WITH {_DSIR_CTE},
    keyed AS (
      SELECT doc_id, logw_micro,
             logw_micro + CAST(round(-ln(-ln(
               (('0x' || substr(md5('dsir-resample|' || CAST(doc_id AS VARCHAR)), 1, 12))::UBIGINT + 1)
               / (281474976710656.0 + 1))) * 1e6) AS BIGINT) AS key_micro
      FROM weights)
    SELECT CAST(row_number() OVER (ORDER BY key_micro DESC, doc_id) AS INT)
             AS rank,
           doc_id, logw_micro, key_micro
    FROM keyed
    ORDER BY key_micro DESC, doc_id LIMIT {_DSIR_K}
    """,
    "DSIR resampling step: Gumbel-top-k over the importance weights "
    "(equivalent to sampling w/o replacement proportional to w) — the "
    "Gumbel noise is md5-seeded per doc and snapped to the same integer "
    "micro-units as the weight, so selection and ranking are exact "
    "integer comparisons. TakeOrdered (orderBy+limit) keeps the top-k "
    "distributed — per-partition partial top-100 + driver merge of "
    "100*n_partitions rows; the rank window runs on 100 survivors only",
)
def p_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jigsaw_spark.operators.samples import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    w = dsir_weights(docs, "doc_id", F.col("lang") == "en", buckets=_DSIR_B)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsir-resample|"), F.col("doc_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / (281474976710656.0 + 1)  # (0,1] from 48 md5 bits
    gumbel_micro = F.round(-F.log(-F.log(u)) * 1e6).cast("bigint")
    keyed = w.select(
        "doc_id",
        "logw_micro",
        (F.col("logw_micro") + gumbel_micro).alias("key_micro"),
    )
    top = keyed.orderBy(F.desc("key_micro"), "doc_id").limit(_DSIR_K)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("key_micro"), "doc_id"))
        .cast("int")
        .alias("rank"),
        "doc_id",
        "logw_micro",
        "key_micro",
    )


_GAP_MIN = 30


@register(
    "ts_sessionize",
    f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS es
      FROM events),
    flagged AS (
      SELECT user_id, event_id, event_type, ts, es,
             CASE WHEN lag(es) OVER w IS NULL
                       OR es - lag(es) OVER w > {_GAP_MIN * 60}
                  THEN 1 ELSE 0 END AS new_sess
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, event_id, event_type, es,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS INT) AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           count(*) AS n_events,
           CAST(max(es) - min(es) AS BIGINT) AS duration_sec,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM sess GROUP BY user_id, session_id
    """,
    "gap-based batch sessionization (30-min inactivity boundary, the "
    "batch twin of stream_stateful_sessions): lag-flag + running-sum "
    "island numbering in two windows sharing ONE (user) Exchange+Sort, "
    "then a (user,session) hash agg. Gap tests on floor-second epochs — "
    "exact integer comparisons on both engines",
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.aggregates import sessionize

    events = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    s = sessionize(
        events, "user_id", "ts", gap_minutes=_GAP_MIN, tiebreak_col="event_id"
    )
    es = F.col("ts").cast("long")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(es) - F.min(es)).cast("bigint").alias("duration_sec"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("n_purchases"),
    )


@register(
    "agg_incremental_merge",
    """
    WITH a AS (
      SELECT user_id, count(*) AS n,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents,
             min(ts) AS first_ts, max(ts) AS last_ts
      FROM events WHERE event_id % 3 <> 0 GROUP BY user_id),
    b AS (
      SELECT user_id, count(*) AS n,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents,
             min(ts) AS first_ts, max(ts) AS last_ts
      FROM events WHERE event_id % 3 = 0 GROUP BY user_id)
    SELECT coalesce(a.user_id, b.user_id) AS user_id,
           CAST(coalesce(a.n, 0) + coalesce(b.n, 0) AS BIGINT) AS n_events,
           CAST(coalesce(a.cents, 0) + coalesce(b.cents, 0) AS BIGINT)
             AS value_cents,
           least(coalesce(a.first_ts, b.first_ts),
                 coalesce(b.first_ts, a.first_ts)) AS first_ts,
           greatest(coalesce(a.last_ts, b.last_ts),
                    coalesce(b.last_ts, a.last_ts)) AS last_ts
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    "incremental aggregate-state maintenance (the materialized-view "
    "pattern): per-batch algebraic partials (count/sum/min/max) merged "
    "by a full-outer combine instead of recomputing the corpus rollup — "
    "at 100 TB the nightly increment touches the new batch only; both "
    "partials here pre-aggregate BEFORE the join so the outer join "
    "shuffles key-state rows, never raw events. Equal by construction "
    "to the single-pass aggregate (the oracle shows the merge form; the "
    "algebraic-merge law makes them identical)",
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")

    def partial(pred: Column) -> DataFrame:
        return (
            events.filter(pred)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(cents).alias("cents"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
            )
        )

    a = partial(F.col("event_id") % 3 != 0)
    b = partial(F.col("event_id") % 3 == 0)
    ab = a.alias("a").join(
        b.alias("b"), F.col("a.user_id") == F.col("b.user_id"), "full_outer"
    )
    return ab.select(
        F.coalesce("a.user_id", "b.user_id").alias("user_id"),
        (
            F.coalesce("a.n", F.lit(0)) + F.coalesce("b.n", F.lit(0))
        ).cast("bigint").alias("n_events"),
        (
            F.coalesce("a.cents", F.lit(0)) + F.coalesce("b.cents", F.lit(0))
        ).cast("bigint").alias("value_cents"),
        F.least(
            F.coalesce("a.first_ts", "b.first_ts"),
            F.coalesce("b.first_ts", "a.first_ts"),
        ).alias("first_ts"),
        F.greatest(
            F.coalesce("a.last_ts", "b.last_ts"),
            F.coalesce("b.last_ts", "a.last_ts"),
        ).alias("last_ts"),
    )


def _morton_sql(x: str, y: str, nbits: int = 16) -> str:
    """Bit-interleave SQL shared verbatim by Spark and DuckDB: even bits
    from ``x``, odd bits from ``y`` — one pure-integer expression, no
    engine-specific functions."""
    terms = []
    for i in range(nbits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


@register(
    "layout_zorder",
    f"""
    WITH keys AS (
      SELECT o_orderkey,
             CAST(o_custkey % 65536 AS BIGINT) AS xk,
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) % 65536 AS BIGINT)
               AS yk
      FROM orders),
    z AS (
      SELECT o_orderkey, {_morton_sql('xk', 'yk')} AS zkey FROM keys)
    SELECT CAST(zkey >> 22 AS BIGINT) AS file_bucket,
           count(*) AS n_rows,
           CAST(min(zkey) AS BIGINT) AS zmin,
           CAST(max(zkey) AS BIGINT) AS zmax
    FROM z GROUP BY 1
    """,
    "Z-order (Morton) clustering key over (custkey, price-cents): bit "
    "interleaving from ONE SQL expression string shared verbatim by "
    "both engines — the lakehouse layout technique that makes min/max "
    "file skipping prune on BOTH dimensions after a repartitionByRange "
    "on zkey. Emits the per-file-bucket row counts + zkey extents (the "
    "skipping index a writer would persist); pure integer bit math, "
    "map-only + one hash agg",
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("bigint").alias("xk"),
        (F.round(F.col("o_totalprice") * 100).cast("bigint") % 65536)
        .cast("bigint")
        .alias("yk"),
    )
    z = orders.select(
        "o_orderkey", F.expr(_morton_sql("xk", "yk")).alias("zkey")
    )
    return z.groupBy(
        F.shiftright("zkey", 22).cast("bigint").alias("file_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("zkey").cast("bigint").alias("zmin"),
        F.max("zkey").cast("bigint").alias("zmax"),
    )


@register(
    "stream_lsh_dedup",
    f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3),
    mh AS (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    bands AS MATERIALIZED (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, band),
    idx AS (
      SELECT DISTINCT band, sig FROM bands WHERE doc_id % 2 = 0),
    hits AS (
      SELECT b.doc_id, count(*) AS n_hit_bands
      FROM bands b JOIN idx USING (band, sig)
      WHERE b.doc_id % 2 = 1
      GROUP BY b.doc_id)
    SELECT d.source,
           count(*) AS n_streamed,
           CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_blocked,
           CAST(sum(CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_admitted
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 2 = 1
    GROUP BY d.source
    """,
    "streaming near-dup ADMISSION: new documents arrive as a file-source "
    "stream, MinHash band signatures run in the SAME map-only Arrow "
    "kernel as the batch path (minhash_band_sigs on a streaming frame), "
    "and a stream-static semi-join probes the historical bucket index "
    "(built from the even-doc 'corpus so far', broadcast at this size) — "
    "near-dups are flagged BEFORE ingest, per-batch, with no stream-side "
    "state beyond the drain agg. The admission ledger per source is "
    "assembled batch-side from the drained hit table",
)
def stream_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from jigsaw_spark.operators.dedup import minhash_band_sigs
    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_document_stream

    docs = _t(spark, sf_dir, "documents")
    # materialized BEFORE the stream starts: the historical index (a
    # Python minhash kernel pass over half the corpus) would otherwise
    # execute inside the drain under the streaming confs (AQE off,
    # state-sized shuffle partitions) and be re-planned per micro-batch
    index = (
        minhash_band_sigs(docs.filter(F.col("doc_id") % 2 == 0), "doc_id")
        .select("band", "sig")
        .distinct()
        .localCheckpoint()
    )
    stream = read_document_stream(spark, sf_dir).filter(
        F.col("doc_id") % 2 == 1
    )
    hits = (
        minhash_band_sigs(stream, "doc_id")
        .join(index, ["band", "sig"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_bands"))
    )
    name = f"stream_lsh_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            hits.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    blocked = spark.table(name)
    new_docs = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source"
    )
    return (
        new_docs.join(blocked, "doc_id", "left_outer")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_streamed"),
            F.sum(F.col("n_hit_bands").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_blocked"),
            F.sum(F.col("n_hit_bands").isNull().cast("int"))
            .cast("bigint")
            .alias("n_admitted"),
        )
    )


_KANON = 5


@register(
    "privacy_kanon_release",
    f"""
    WITH cells AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2),
    marked AS (
      SELECT *, n >= {_KANON} AS released FROM cells)
    SELECT CASE WHEN released THEN o_orderstatus ELSE '*' END AS o_orderstatus,
           CASE WHEN released THEN o_orderpriority ELSE '*' END
             AS o_orderpriority,
           CAST(sum(n) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS n_cells_merged
    FROM marked GROUP BY 1, 2
    """,
    "k-anonymity release (k=5): quasi-identifier cells smaller than k "
    "collapse into ONE suppressed '*' cell instead of leaking small "
    "groups — the aggregate-publishing privacy gate. Two hash aggs (the "
    "second over the cell table, which is |distinct QI combos| rows, "
    "never corpus-sized); all outputs exact integers",
)
def privacy_kanon_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cells = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    released = F.col("n") >= _KANON
    star = lambda c: F.when(released, F.col(c)).otherwise(F.lit("*"))  # noqa: E731
    return (
        cells.select(
            star("o_orderstatus").alias("o_orderstatus"),
            star("o_orderpriority").alias("o_orderpriority"),
            "n",
            "cents",
        )
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells_merged"),
        )
    )


@register(
    "text_token_fertility",
    rf"""
    WITH t AS (
      SELECT lang,
             len({tokens_sql('text')}) AS n_words,
             len(regexp_extract_all(lower(text), '''[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+')) AS n_pieces
      FROM documents)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
           round(sum(n_pieces) / CAST(sum(n_words) AS DOUBLE), 4)
             AS fertility
    FROM t WHERE n_words > 0 GROUP BY lang
    """,
    "tokenizer fertility per language (BPE-ish pieces per whitespace "
    "word): the per-language token-budget/equity diagnostic every "
    "multilingual corpus report carries — high fertility means the "
    "tokenizer fragments that language. Map-only piece counting + one "
    "tiny hash agg; fertility is a ratio of exact integer sums",
)
def text_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import bpeish_tokens_expr, tokens_expr

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.size(tokens_expr("text")).alias("n_words"),
        F.size(bpeish_tokens_expr("text")).alias("n_pieces"),
    )
    return (
        docs.filter(F.col("n_words") > 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.round(
                F.sum("n_pieces") / F.sum("n_words").cast("double"), 4
            ).alias("fertility"),
        )
    )


_HOLDOUT_TS = "2024-01-24 00:00:00"


@register(
    "p_temporal_holdout",
    f"""
    WITH split AS (
      SELECT user_id, event_id,
             CASE WHEN ts < TIMESTAMP '{_HOLDOUT_TS}' THEN 'train'
                  ELSE 'test' END AS split
      FROM events),
    users AS (
      SELECT user_id,
             max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
             max(CASE WHEN split = 'test'  THEN 1 ELSE 0 END) AS in_test
      FROM split GROUP BY user_id)
    SELECT s.split,
           count(*) AS n_events,
           count(DISTINCT s.user_id) AS n_users,
           CAST(sum(CASE WHEN u.in_train = 1 AND u.in_test = 1
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_events_leaky_users
    FROM split s JOIN users u ON s.user_id = u.user_id
    GROUP BY s.split
    """,
    "temporal train/test holdout with LEAKAGE accounting: split at a "
    "cutoff timestamp (never random — random splits leak future events "
    "into training), plus the count of events belonging to users that "
    "straddle the boundary (the group-leakage surface a user-level "
    "model must handle). One (user) agg joined back on the same key — "
    "exchange reused, no second corpus shuffle",
)
def p_temporal_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    split = events.select(
        "user_id",
        "event_id",
        F.when(
            F.col("ts") < F.lit(_HOLDOUT_TS).cast("timestamp"), "train"
        )
        .otherwise("test")
        .alias("split"),
    )
    users = split.groupBy("user_id").agg(
        F.max((F.col("split") == "train").cast("int")).alias("in_train"),
        F.max((F.col("split") == "test").cast("int")).alias("in_test"),
    )
    return (
        split.join(users, "user_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(
                ((F.col("in_train") == 1) & (F.col("in_test") == 1)).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_events_leaky_users"),
        )
    )


_PR_SCALE = 10**15
_PR_ITERS = 10


def _pagerank_exact_sql() -> str:
    """Unroll the integer PageRank fixpoint to _PR_ITERS CTE stages over
    the minhash-LSH candidate graph — an ITERATIVE algorithm with an
    exact SQL oracle, possible only because every iteration step is
    integer floor arithmetic (see operators.graph.pagerank_exact)."""
    from jigsaw_spark.operators.text import tokens_sql

    head = f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3),
    mh AS (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    bands AS MATERIALIZED (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, band),
    pairs AS (
      SELECT DISTINCT x_a.doc_id AS a, x_b.doc_id AS b
      FROM bands x_a
      JOIN bands x_b ON x_a.band = x_b.band AND x_a.sig = x_b.sig
                    AND x_a.doc_id < x_b.doc_id),
    pr_edges AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b AS src, a AS dst FROM pairs),
    pr_nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM pr_edges),
    pr_deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM pr_edges GROUP BY src),
    pr_consts AS MATERIALIZED (
      SELECT count(*) AS n,
             {_PR_SCALE} // count(*) AS r_init,
             (3 * {_PR_SCALE}) // (20 * count(*)) AS base
      FROM pr_nodes),
    r0 AS (
      SELECT node, r_init AS r FROM pr_nodes CROSS JOIN pr_consts)"""
    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(f"""
    c{i} AS MATERIALIZED (
      SELECT e.dst AS node, sum((17 * p.r) // (20 * d.deg)) AS c
      FROM r{i - 1} p
      JOIN pr_deg d ON p.node = d.src
      JOIN pr_edges e ON p.node = e.src
      GROUP BY e.dst),
    r{i} AS MATERIALIZED (
      SELECT n.node, cc.base + coalesce(c{i}.c, 0) AS r
      FROM pr_nodes n
      CROSS JOIN pr_consts cc
      LEFT JOIN c{i} ON n.node = c{i}.node)""")
    tail = f"""
    SELECT CAST(row_number() OVER (ORDER BY r DESC, node) AS INT) AS pos,
           node, CAST(r AS BIGINT) AS rank_micro
    FROM r{_PR_ITERS}
    ORDER BY r DESC, node LIMIT 50"""
    return head + "," + ",".join(iters) + tail


@register(
    "graph_pagerank_exact",
    _pagerank_exact_sql(),
    "PageRank over the near-dup candidate graph with the fixpoint "
    "DEFINED in integer micro-units (17/20 damping, floor division, "
    "scale 1e15): the iteration trajectory is bit-identical across "
    "engines/partitionings/retries, which upgrades the iterative "
    "message-passing class from rows-only to EXACT-oracle (the float "
    "variant stays as the classic form). Per round ONE src-keyed join "
    "(exchange reused) + ONE dst-keyed agg; lineage checkpointed",
)
def graph_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jigsaw_spark.operators.dedup import minhash_lsh_pairs
    from jigsaw_spark.operators.graph import pagerank_exact

    docs = _t(spark, sf_dir, "documents")
    edges = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    pr = pagerank_exact(edges, n_iters=_PR_ITERS, scale=_PR_SCALE)
    top = pr.orderBy(F.desc("rank_micro"), "node").limit(50)
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("rank_micro"), "node"))
        .cast("int")
        .alias("pos"),
        "node",
        "rank_micro",
    )


@register(
    "stream_session_window",
    """
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), g AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM g GROUP BY user_id, sid
    """,
    "STREAMING native session_window: the state-store session-merge path "
    "(distinct from both the batch session_window agg [w4] and the "
    "applyInPandasWithState sessionizer) — sessions merge incrementally "
    "in the streaming state store, complete-mode AvailableNow drain "
    "equals the batch island formulation. Exact decimal value sums, "
    "same 30-min gap as every session operator in the engine",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from jigsaw_spark.plans.queries import dec2, dsum
    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_event_stream

    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    agg = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec2("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n",
            "total_value",
        )
    )
    name = f"stream_sw_{uuid.uuid4().hex[:8]}"
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


_PCA_D = 64
_PCA_ITERS = 10


def _pca_exact_sql() -> str:
    """Replay the integer PC1 power iteration as SQL: covariance from one
    scan, then _PCA_ITERS unrolled CTE stages over the d-squared matrix.
    Every step is truncated-integer arithmetic, so this reproduces the
    operator's Python-int fixpoint bit-for-bit."""
    head = f"""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, d,
             CAST(round(embedding[d + 1]::DOUBLE * 1000000) AS BIGINT) AS xq
      FROM embeddings, LATERAL (SELECT unnest(range({_PCA_D})) AS d) dd),
    nn AS (SELECT count(*) AS n FROM embeddings),
    sv AS (SELECT d, sum(xq) AS s FROM ex GROUP BY d),
    pv AS MATERIALIZED (
      SELECT a.d AS i, b.d AS j, sum(CAST(a.xq AS HUGEINT) * b.xq) AS p
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY 1, 2),
    cm AS MATERIALIZED (
      SELECT i, j,
             CASE WHEN cp >= 0 THEN cp // (n * n)
                  ELSE -((-cp) // (n * n)) END AS c
      FROM (SELECT p.i, p.j,
                   CAST(nn.n AS HUGEINT) * p.p
                     - CAST(sa.s AS HUGEINT) * sb.s AS cp,
                   nn.n AS n
            FROM pv p
            JOIN sv sa ON p.i = sa.d
            JOIN sv sb ON p.j = sb.d
            CROSS JOIN nn)),
    v0 AS (SELECT unnest(range({_PCA_D})) AS j,
                  CAST(1000000 AS HUGEINT) AS v)"""
    iters = []
    for k in range(1, _PCA_ITERS + 1):
        iters.append(f"""
    w{k} AS MATERIALIZED (
      SELECT c.i AS j, sum(c.c * v.v) AS w
      FROM cm c JOIN v{k - 1} v ON c.j = v.j GROUP BY c.i),
    m{k} AS MATERIALIZED (SELECT greatest(max(abs(w)), 1) AS m FROM w{k}),
    v{k} AS MATERIALIZED (
      SELECT j, CASE WHEN w >= 0 THEN (w * 1000000) // m
                     ELSE -(((-w) * 1000000) // m) END AS v
      FROM w{k} CROSS JOIN m{k})""")
    tail = f"""
    , vk AS (SELECT v AS kv FROM v{_PCA_ITERS}
             ORDER BY abs(v) DESC, j LIMIT 1)
    SELECT CAST(f.j AS INT) AS dim,
           CAST(CASE WHEN vk.kv < 0 THEN -f.v ELSE f.v END AS BIGINT)
             AS pc1_micro
    FROM v{_PCA_ITERS} f CROSS JOIN vk"""
    return head + "," + ",".join(iters) + tail


@register(
    "ml_pca_pc1_exact",
    _pca_exact_sql(),
    "leading principal component with the power iteration DEFINED in "
    "truncated-integer arithmetic (micro-unit coordinates, n^2-scaled "
    "integer covariance, per-round max-component renormalization by "
    "truncated division): the fixpoint trajectory is bit-identical "
    "across engines — the second iterative algorithm upgraded from "
    "rows-only to EXACT-oracle (after graph_pagerank_exact). Scale win "
    "over the float variant: ONE corpus scan total (not one per "
    "iteration); the d^2 covariance is KB-scale driver metadata (the "
    "codebook pattern) and the O(d^2 x iters) fixpoint runs on exact "
    "Python ints",
)
def ml_pca_pc1_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.ml import pca_pc1_exact

    emb = _t(spark, sf_dir, "embeddings")
    rows = pca_pc1_exact(emb, "embedding", n_iters=_PCA_ITERS)
    return spark.createDataFrame(rows, "dim int, pc1_micro long")


_KM_K = 8
_KM_ITERS = 5


def _kmeans_exact_sql() -> str:
    """Replay the exact-integer Lloyd trajectory as SQL: md5-ordered
    seeds, then _KM_ITERS unrolled (assign -> update) CTE stage pairs.
    MATERIALIZED throughout — DuckDB would otherwise re-inline the whole
    upstream chain at every stage."""
    head = f"""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, d,
             CAST(round(embedding[d + 1]::DOUBLE * 1000000) AS BIGINT) AS xq
      FROM embeddings, LATERAL (SELECT unnest(range(64)) AS d) dd),
    seeds AS MATERIALIZED (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY md5(concat_ws('|', 'kmeans-exact-init',
                                      CAST(vec_id AS VARCHAR))), vec_id)
               - 1 AS cid
      FROM embeddings),
    c0 AS MATERIALIZED (
      SELECT s.cid, e.d, e.xq AS cq
      FROM seeds s JOIN ex e USING (vec_id) WHERE s.cid < {_KM_K})"""
    iters = []
    for t in range(1, _KM_ITERS + 1):
        iters.append(f"""
    dist{t} AS MATERIALIZED (
      SELECT e.vec_id, c.cid,
             sum((e.xq - c.cq) * (e.xq - c.cq)) AS dist
      FROM ex e JOIN c{t - 1} c ON e.d = c.d
      GROUP BY 1, 2),
    asg{t} AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM dist{t}) WHERE rn = 1),
    agg{t} AS MATERIALIZED (
      SELECT a.cid, e.d, sum(e.xq) AS s, count(*) AS n
      FROM asg{t} a JOIN ex e USING (vec_id)
      GROUP BY 1, 2),
    c{t} AS MATERIALIZED (
      SELECT p.cid, p.d,
             CASE WHEN g.n IS NULL THEN p.cq
                  WHEN g.s >= 0 THEN g.s // g.n
                  ELSE -((-g.s) // g.n) END AS cq
      FROM c{t - 1} p
      LEFT JOIN agg{t} g ON p.cid = g.cid AND p.d = g.d)""")
    tail = f"""
    , sizes AS MATERIALIZED (
      SELECT cid, count(*) AS n FROM asg{_KM_ITERS} GROUP BY cid)
    SELECT c.cid, CAST(c.d AS INT) AS dim,
           CAST(c.cq AS BIGINT) AS c_micro,
           CAST(coalesce(z.n, 0) AS BIGINT) AS cluster_n
    FROM c{_KM_ITERS} c LEFT JOIN sizes z USING (cid)"""
    return head + "," + ",".join(iters) + tail


@register(
    "ml_kmeans_exact",
    _kmeans_exact_sql(),
    "Euclidean Lloyd k-means (k=8, 5 rounds) with the whole trajectory "
    "in exact integer arithmetic: micro-unit coordinates, integer "
    "squared-distance argmin with (dist, cid) tie-break, truncated-"
    "division centroid updates — bit-identical assignments/codebook "
    "across engines and partitionings (the float kmeans_lloyd is only "
    "fixed-partitioning-stable), replayed by 5 unrolled SQL stage "
    "pairs. The third iterative algorithm upgraded to EXACT-oracle. "
    "Quantized corpus localCheckpoints once; per round a map-only "
    "Arrow argmin kernel (codebook in the task closure, JVM plan "
    "identical across rounds -> one codegen compile) + ONE (cid,dim) "
    "agg",
)
def ml_kmeans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import kmeans_lloyd_exact

    emb = _t(spark, sf_dir, "embeddings")
    _assigned, triples, sizes = kmeans_lloyd_exact(
        emb, k=_KM_K, iters=_KM_ITERS
    )
    rows = [
        (cid, d, cq, sizes.get(cid, 0)) for cid, d, cq in triples
    ]
    return spark.createDataFrame(
        rows, "cid int, dim int, c_micro long, cluster_n long"
    )


_KMV_K = 64


@register(
    "agg_kmv_intersect",
    f"""
    WITH toks AS (
      SELECT DISTINCT source, unnest({tokens_sql('text')}) AS tok
      FROM documents),
    hashed AS (
      SELECT DISTINCT source,
             CAST(('0x' || substr(md5(tok), 1, 12))::UBIGINT AS BIGINT) AS h
      FROM toks),
    kmv AS MATERIALIZED (
      SELECT source, h FROM (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM hashed) WHERE rn <= {_KMV_K}),
    kstat AS MATERIALIZED (
      SELECT source, max(h) AS kth FROM kmv GROUP BY source),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             least(a.kth, b.kth) AS tau
      FROM kstat a JOIN kstat b ON a.source < b.source),
    uni AS (
      SELECT p.src_a, p.src_b, p.tau, k.h,
             max(CASE WHEN k.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN k.source = p.src_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p
      JOIN kmv k ON (k.source = p.src_a OR k.source = p.src_b)
                 AND k.h <= p.tau
      GROUP BY 1, 2, 3, 4)
    SELECT src_a, src_b, CAST(tau AS BIGINT) AS tau,
           count(*) AS n_union_tau,
           CAST(sum(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_common,
           round(sum(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS est_jaccard
    FROM uni GROUP BY src_a, src_b, tau
    """,
    "KMV (k-minimum-values) theta-style sketches with SET-INTERSECTION "
    "estimates — the capability HLL lacks: per source keep the 64 "
    "smallest md5 token hashes (ONE corpus pass, sketch is KB and "
    "DETERMINISTIC — k smallest is a well-defined set, so unlike "
    "probabilistic sketches the estimate has an exact oracle); pairwise "
    "Jaccard estimated below the combined threshold tau = min(kth_a, "
    "kth_b). All pair work runs on the k-row sketches, never the "
    "corpus — 190 source pairs x 128 rows at any corpus size",
)
def agg_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    hashed = (
        docs.select("source", F.explode(tokens_expr("text")).alias("tok"))
        .distinct()
        .select(
            "source",
            F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("h")
    # the sketch is KB-scale (<= 64 rows x |sources|) but its lineage is
    # the full tokenize + double-distinct + window chain; uncheckpointed
    # it re-ran for kstat (whose self-join doubles it again) AND the uni
    # join — 4 corpus passes for one sketch. Materialize it once.
    kmv = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("source", "h")
        .localCheckpoint()
    )
    kstat = kmv.groupBy("source").agg(F.max("h").alias("kth"))
    a, b = kstat.alias("a"), kstat.alias("b")
    pairs = a.join(b, F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.least("a.kth", "b.kth").alias("tau"),
    )
    uni = (
        F.broadcast(pairs)
        .join(
            kmv,
            (
                (F.col("source") == F.col("src_a"))
                | (F.col("source") == F.col("src_b"))
            )
            & (F.col("h") <= F.col("tau")),
        )
        .groupBy("src_a", "src_b", "tau", "h")
        .agg(
            F.max((F.col("source") == F.col("src_a")).cast("int")).alias(
                "in_a"
            ),
            F.max((F.col("source") == F.col("src_b")).cast("int")).alias(
                "in_b"
            ),
        )
    )
    both = (F.col("in_a") + F.col("in_b") == 2).cast("int")
    return uni.groupBy("src_a", "src_b", "tau").agg(
        F.count(F.lit(1)).alias("n_union_tau"),
        F.sum(both).cast("bigint").alias("n_common"),
        F.round(F.sum(both) / F.count(F.lit(1)).cast("double"), 6).alias(
            "est_jaccard"
        ),
    )


# Shared DuckDB replay of the deterministic pHash fixture: 16x16 gray
# gradient PNGs parameterized by doc_id (twin docs at %40==20 reuse their
# %40==0 sibling's parameters with a +40 top-band perturbation), nearest-
# resized to 9x8 (src = dst * 16 // dim), dHash bytes. Pure integer
# arithmetic end to end — the whole encode->decode->luma->resize->hash
# kernel chain is value-checked.
_PHASH_BYTES_CTE = """
    d AS (SELECT doc_id AS i FROM documents WHERE doc_id % 10 = 0),
    par AS (
      SELECT i,
        CASE WHEN i % 20 = 0 THEN 17 + 3 * ((i // 40) % 97)
             ELSE 17 + 3 * (i % 101) END AS a,
        CASE WHEN i % 20 = 0 THEN 31 + 5 * ((i // 40) % 89)
             ELSE 31 + 5 * (i % 103) END AS b,
        CASE WHEN i % 20 = 0 THEN 11 + 7 * ((i // 40) % 83)
             ELSE 11 + 7 * (i % 107) END AS c,
        (i % 40 = 20) AS twin
      FROM d),
    pix AS MATERIALIZED (
      SELECT i, y, x,
             CASE WHEN twin AND y < 2
                  THEN ((a * ((x * 16) // 9) + b * (2 * y)
                         + c * ((((x * 16) // 9) * 2 * y) % 7)) % 256
                        + 40) % 256
                  ELSE (a * ((x * 16) // 9) + b * (2 * y)
                        + c * ((((x * 16) // 9) * 2 * y) % 7)) % 256 END AS v
      FROM par,
           LATERAL (SELECT unnest(range(8)) AS y) yy,
           LATERAL (SELECT unnest(range(9)) AS x) xx),
    ph_bytes AS MATERIALIZED (
      SELECT p.i, p.y AS byte_idx,
             CAST(sum(CASE WHEN p.v < q.v THEN 1 << p.x ELSE 0 END) AS INT)
               AS byte_val
      FROM pix p
      JOIN pix q ON q.i = p.i AND q.y = p.y AND q.x = p.x + 1
      WHERE p.x < 8
      GROUP BY p.i, p.y)
"""


def _synth_images(docs: DataFrame) -> DataFrame:
    """Apply the deterministic image-synthesis kernel to a frame of
    doc_ids — extracted from ``_phash_images`` (r13) so the SAME
    map-only Arrow kernel runs on batch AND streaming frames
    (``stream_phash_dedup`` synthesizes its arriving images with this
    exact function; semantics unchanged, pure code motion)."""

    def synth(batches):
        import numpy as np
        import pandas as pd

        from jigsaw_spark.multimodal.png_codec import encode_png

        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 20 == 0:
                    seed = i // 40
                    a, b, c = (
                        17 + 3 * (seed % 97),
                        31 + 5 * (seed % 89),
                        11 + 7 * (seed % 83),
                    )
                    twin = i % 40 == 20
                else:
                    a, b, c = (
                        17 + 3 * (i % 101),
                        31 + 5 * (i % 103),
                        11 + 7 * (i % 107),
                    )
                    twin = False
                y16, x16 = np.mgrid[0:16, 0:16]
                v = (a * x16 + b * y16 + c * ((x16 * y16) % 7)) % 256
                if twin:
                    v[:4, :] = (v[:4, :] + 40) % 256
                rgb = np.repeat(
                    v[:, :, None].astype(np.uint8), 3, axis=2
                )
                ids.append(str(i))
                blobs.append(encode_png(rgb))
            yield pd.DataFrame({"image_id": ids, "content": blobs})

    return docs.mapInPandas(synth, "image_id string, content binary")


def _phash_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16x16 gradient PNGs (real pure-Python encode) —
    the python twin of _PHASH_BYTES_CTE's `par`/`pix` arithmetic."""
    from jigsaw_spark.session import widen

    return _synth_images(
        widen(
            _t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0)
            .select("doc_id")
        )
    )


def _phash_ham_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every banded dHash candidate pair (shares ≥1 full hash byte of 8)
    with its EXACT Hamming distance: (ia bigint, ib bigint, hamming
    bigint), ia < ib, distinct — the shared prelude of the phash family
    (near-dup ≤6 filter, threshold sweep/purity arms). ONE kernel pass."""
    from jigsaw_spark.multimodal.binary_ops import phash_dhash

    return _ham_pairs_from_bytes(
        phash_dhash(_phash_images(spark, sf_dir)), "image_id"
    )


def _ham_pairs_from_bytes(
    ph: DataFrame, id_col: str, with_byte_match: bool = False
) -> DataFrame:
    """Bucket form over a long-form ``(id, byte_idx, byte_val)`` hash
    relation: the 8 hash bytes pack into one array per image, each byte
    is an LSH band key, candidate pairs explode bucket-locally and the
    Hamming distance folds over the carried arrays (no join back to the
    hashes). Multi-bucket duplicates are identical rows, removed by the
    distinct. Exact for any Hamming threshold ≤7 (pigeonhole). Pair
    order is by the LONG cast of ``id_col``.

    ``with_byte_match=True`` additionally emits ``meq`` — the per-pair
    byte-equality mask (array<boolean>, one per hash byte) — from which
    ANY coarser banding's candidate membership derives as a pure
    expression (a pair collides on a w-byte band iff all w of that
    band's bytes are equal), the mm_phash_band_sweep r14 shape."""
    h64 = ph.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("byte_idx", "byte_val"))),
            lambda s: s["byte_val"],
        ).alias("harr")
    )
    banded = h64.select(
        F.col(id_col).cast("long").alias("_iid"),
        "harr",
        F.posexplode("harr").alias("byte_idx", "byte_val"),
    )
    buckets = (
        banded.groupBy("byte_idx", "byte_val")
        .agg(F.collect_list(F.struct("_iid", "harr")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("a.harr"),
            F.col("b.harr"),
            lambda u, v: F.bit_count(u.bitwiseXOR(v)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    cols = [
        F.col("a._iid").alias("ia"),
        F.col("b._iid").alias("ib"),
        hamming.cast("bigint").alias("hamming"),
    ]
    if with_byte_match:
        cols.append(
            F.zip_with(
                F.col("a.harr"),
                F.col("b.harr"),
                lambda u, v: u == v,
            ).alias("meq")
        )
    return (
        buckets.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a._iid") < F.col("b._iid"))
        .select(*cols)
        .distinct()
    )


@register(
    "mm_image_phash",
    f"""
    WITH {_PHASH_BYTES_CTE}
    SELECT CAST(i AS VARCHAR) AS image_id, CAST(byte_idx AS INT) AS byte_idx,
           byte_val
    FROM ph_bytes
    """,
    "perceptual image hash (dHash) over REAL PNG pixels: decode -> "
    "integer luma -> 9x8 nearest resize -> adjacent-pixel comparison "
    "bits, emitted as 8 one-byte LSH bands per image (long form — a "
    "64-bit hash would overflow signed BIGINT and arrays are banned by "
    "the canon). Every step is integer arithmetic, so the oracle "
    "replays the full encode->decode->hash chain exactly. Map-only "
    "Arrow kernel, ~8 rows per image",
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.multimodal.binary_ops import phash_dhash

    return phash_dhash(_phash_images(spark, sf_dir))


@register(
    "mm_phash_near_dup",
    f"""
    WITH {_PHASH_BYTES_CTE},
    cand AS (
      SELECT DISTINCT x.i AS ia, y.i AS ib
      FROM ph_bytes x
      JOIN ph_bytes y ON x.byte_idx = y.byte_idx
                     AND x.byte_val = y.byte_val AND x.i < y.i),
    ham AS (
      SELECT c.ia, c.ib,
             CAST(sum(bit_count(xor(x.byte_val, y.byte_val))) AS BIGINT)
               AS hamming
      FROM cand c
      JOIN ph_bytes x ON x.i = c.ia
      JOIN ph_bytes y ON y.i = c.ib AND y.byte_idx = x.byte_idx
      GROUP BY 1, 2)
    SELECT CAST(ia AS VARCHAR) AS img_a, CAST(ib AS VARCHAR) AS img_b,
           hamming
    FROM ham WHERE hamming <= 6
    """,
    "image near-dup via dHash Hamming banding: candidates must share one "
    "FULL hash byte (pigeonhole: 8 bands, so any pair within Hamming 6 "
    "shares at least two) — a (byte_idx, byte_val) equi-join replaces "
    "the all-pairs scan, then the exact Hamming distance verifies "
    "candidates. The image analog of MinHash-LSH: linear banding join "
    "+ per-candidate verify, no quadratic surface at any corpus size",
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bucket form (the minhash_lsh_pairs shape, r13 optimization): the
    # self-join formulation evaluated the synth+decode Python pipeline
    # once per join side and twice more re-attaching bytes for the
    # Hamming verify — Spark cannot dedupe identical PythonUDF subplans
    # (measured ~4x the kernel cost). _phash_ham_pairs runs the kernel
    # ONCE; image_id strings are str(doc_id), so the bigint→string cast
    # reproduces them exactly.
    return (
        _phash_ham_pairs(spark, sf_dir)
        .filter(F.col("hamming") <= 6)
        .select(
            F.col("ia").cast("string").alias("img_a"),
            F.col("ib").cast("string").alias("img_b"),
            "hamming",
        )
    )


@register(
    "stream_dsir_score",
    f"""
    WITH toks AS (
      SELECT doc_id, CAST(lang = 'en' AS INT) AS is_target,
             {tokens_sql('text')} AS t
      FROM documents WHERE doc_id % 2 = 0),
    grams AS (
      SELECT doc_id, is_target, unnest(t) AS gram FROM toks
      UNION ALL
      SELECT doc_id, is_target, t[i] || ' ' || t[i+1] AS gram
      FROM toks, LATERAL (
        SELECT unnest(range(1, len(t))) AS i) ii
      WHERE len(t) >= 2),
    bucketed AS (
      SELECT doc_id, is_target,
             ('0x' || substr(md5(gram), 1, 12))::UBIGINT % {_DSIR_B} AS bucket
      FROM grams),
    dist AS (
      SELECT bucket,
             sum(CASE WHEN is_target = 1 THEN 1 ELSE 0 END) AS tgt,
             count(*) AS raw
      FROM bucketed GROUP BY bucket),
    tot AS (SELECT sum(tgt) AS T, sum(raw) AS R FROM dist),
    ratio AS MATERIALIZED (
      SELECT bucket,
             CAST(round((ln(CAST(tgt + 1 AS DOUBLE) / (T + {_DSIR_B}))
                       - ln(CAST(raw + 1 AS DOUBLE) / (R + {_DSIR_B})))
                        * 1e6) AS BIGINT) AS r_micro
      FROM dist CROSS JOIN tot),
    stream_toks AS (
      SELECT doc_id, {tokens_sql('text')} AS t
      FROM documents WHERE doc_id % 2 = 1),
    stream_grams AS (
      SELECT doc_id, unnest(t) AS gram FROM stream_toks
      UNION ALL
      SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
      FROM stream_toks, LATERAL (
        SELECT unnest(range(1, len(t))) AS i) ii
      WHERE len(t) >= 2),
    sb AS (
      SELECT doc_id,
             ('0x' || substr(md5(gram), 1, 12))::UBIGINT % {_DSIR_B} AS bucket
      FROM stream_grams)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(coalesce(r.r_micro, 0)) AS BIGINT) AS logw_micro
    FROM sb s LEFT JOIN ratio r USING (bucket)
    GROUP BY s.doc_id
    """,
    "fit-offline / score-online DSIR: the bucket log-ratio dim is FIT on "
    "the historical corpus (even docs) as a batch job, then new "
    "documents arriving as a stream are scored by a stream-static "
    "BROADCAST join against that 4096-row dim + one stateful per-doc "
    "agg (complete-mode AvailableNow drain) — the deployment shape for "
    "continuous curation: the expensive global fit is periodic, "
    "admission scoring is per-batch with KB state. Exact integer "
    "weights as in the batch operator. OOV convention: buckets never "
    "seen at fit time contribute log-ratio 0 (coalesce on the left "
    "join), NOT the Laplace-smoothed ln((R+B)/(T+B)) a full DSIR "
    "formulation would assign — neutral-on-novel is the admission-"
    "scoring convention here (the oracle mirrors it), so stream scores "
    "are comparable to batch dsir_weights only on docs whose buckets "
    "all appeared at fit time",
)
def stream_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from jigsaw_spark.operators.samples import (
        dsir_doc_buckets,
        dsir_gram_buckets,
        dsir_ratio_from_dist,
    )
    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_document_stream

    docs = _t(spark, sf_dir, "documents")
    # FIT (batch): the shared bucket pipeline on the historical half,
    # reduced to the broadcastable 4096-row ratio dim
    hist_buckets = dsir_doc_buckets(
        docs.filter(F.col("doc_id") % 2 == 0),
        "doc_id",
        buckets=_DSIR_B,
        target_pred=F.col("lang") == "en",
    )
    dist = hist_buckets.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("_is_target") == 1, F.col("c")).otherwise(0)
        ).alias("tgt"),
        F.sum("c").alias("raw"),
    )
    # materialized BEFORE the stream starts: inside the drain the fit
    # pipeline would execute under the streaming confs (AQE off,
    # state-sized shuffle partitions), underparallelizing the full
    # historical gram pass; batch-side it runs at session parallelism
    # and the drain broadcast-joins a materialized 4096-row dim
    ratio = dsir_ratio_from_dist(dist, _DSIR_B).localCheckpoint()

    # SCORE (stream): the SAME bucket pipeline on the arriving docs,
    # broadcast-joined to the static dim, per-doc agg drained
    # complete/AvailableNow
    stream = read_document_stream(spark, sf_dir).filter(
        F.col("doc_id") % 2 == 1
    )
    # gram-level (no pre-agg): keeps the per-doc aggregate the ONLY
    # stateful operator in the streaming query
    sbuckets = dsir_gram_buckets(stream, "doc_id", buckets=_DSIR_B)
    scored = (
        sbuckets.join(F.broadcast(ratio), "bucket", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce("r_micro", F.lit(0)))
            .cast("bigint")
            .alias("logw_micro"),
        )
    )
    name = f"stream_dsir_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            scored.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


_KC_K = 8


def _kcenter_sql() -> str:
    """Replay the greedy k-center trajectory: md5-seeded start, then
    k-1 unrolled stages of the incremental least(mind, dist-to-new)
    recurrence with explicit already-selected exclusion."""
    head = f"""
    WITH ex AS MATERIALIZED (
      SELECT vec_id, d,
             CAST(round(embedding[d + 1]::DOUBLE * 1000000) AS BIGINT) AS xq
      FROM embeddings, LATERAL (SELECT unnest(range(64)) AS d) dd),
    p0 AS MATERIALIZED (
      SELECT vec_id FROM (
        SELECT vec_id,
               row_number() OVER (
                 ORDER BY md5(concat_ws('|', 'kcenter',
                                        CAST(vec_id AS VARCHAR))), vec_id)
                 AS rn
        FROM embeddings) WHERE rn = 1),
    sel0 AS MATERIALIZED (SELECT vec_id FROM p0),
    m0 AS MATERIALIZED (
      SELECT e.vec_id, sum((e.xq - s.xq) * (e.xq - s.xq)) AS mind
      FROM ex e
      JOIN (SELECT e2.d, e2.xq FROM ex e2 JOIN p0 USING (vec_id)) s
        ON e.d = s.d
      GROUP BY e.vec_id)"""
    stages = []
    for t in range(1, _KC_K):
        stages.append(f"""
    p{t} AS MATERIALIZED (
      SELECT vec_id, mind FROM m{t - 1}
      WHERE vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
      ORDER BY mind DESC, vec_id LIMIT 1),
    sel{t} AS MATERIALIZED (
      SELECT vec_id FROM sel{t - 1}
      UNION ALL SELECT vec_id FROM p{t}),
    dd{t} AS MATERIALIZED (
      SELECT e.vec_id, sum((e.xq - c.xq) * (e.xq - c.xq)) AS dist
      FROM ex e
      JOIN (SELECT e2.d, e2.xq FROM ex e2
            JOIN p{t} ON e2.vec_id = p{t}.vec_id) c
        ON e.d = c.d
      GROUP BY e.vec_id),
    m{t} AS MATERIALIZED (
      SELECT m.vec_id, least(m.mind, d.dist) AS mind
      FROM m{t - 1} m JOIN dd{t} d ON m.vec_id = d.vec_id)""")
    unions = ["SELECT 0 AS round, vec_id, CAST(0 AS BIGINT) AS dist2 FROM p0"]
    for t in range(1, _KC_K):
        unions.append(
            f"SELECT {t} AS round, vec_id, CAST(mind AS BIGINT) AS dist2"
            f" FROM p{t}"
        )
    return head + "," + ",".join(stages) + "\n    " + "\n    UNION ALL ".join(
        unions
    )


@register(
    "p_kcenter_coreset",
    _kcenter_sql(),
    "greedy k-center coreset (farthest-point traversal, the classic "
    "2-approx diverse-subset selector for curation): exact integer "
    "squared distances + md5-seeded start + lowest-id tie-break make "
    "the selection trajectory bit-identical across engines — the "
    "FOURTH iterative algorithm with a replayable SQL oracle. Per "
    "round: selected coords ride as literal arrays, the min-distance "
    "pass is MAP-ONLY + distributed TakeOrdered(1); k corpus scans "
    "total, no joins, no lineage growth",
)
def p_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.samples import kcenter_coreset

    emb = _t(spark, sf_dir, "embeddings")
    rows = kcenter_coreset(emb, k=_KC_K)
    return spark.createDataFrame(rows, "round int, vec_id long, dist2 long")


@register(
    "agg_bitmap_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT user_id) AS n_users_bitmap
    FROM events GROUP BY event_type
    """,
    "Spark 4 bitmap aggregate surface (bitmap_bucket_number / "
    "bitmap_construct_agg / bitmap_count): EXACT distinct counting via "
    "fixed-size per-bucket bitmaps — the scale path for exact "
    "count-distinct: the (key, bucket) pre-agg spreads hot keys across "
    "reducers (each bucket covers 32768 ids) and the merge is a "
    "byte-OR, mergeable across partitions/batches like a sketch but "
    "with NO approximation. Emitted next to plain count(DISTINCT) — "
    "the oracle checks both paths agree exactly",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    bitmap = (
        events.groupBy(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("_bucket"),
        )
        .agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(user_id))"
            ).alias("_bm")
        )
        .groupBy("event_type")
        .agg(F.expr("sum(bitmap_count(_bm))").cast("bigint").alias(
            "n_users_bitmap"
        ))
    )
    return exact.join(bitmap, "event_type")


@register(
    "ab_ttest_welch",
    """
    WITH assigned AS (
      SELECT CASE WHEN ('0x' || substr(md5('ab-arm|' || CAST(user_id AS VARCHAR)), 1, 12))::UBIGINT % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS arm,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    stats AS (
      SELECT arm, count(*) AS n,
             sum(cents) AS s,
             sum(CAST(cents AS HUGEINT) * cents) AS q
      FROM assigned GROUP BY arm),
    wide AS (
      SELECT max(CASE WHEN arm = 'control' THEN n END) AS n1,
             max(CASE WHEN arm = 'control' THEN s END) AS s1,
             max(CASE WHEN arm = 'control' THEN q END) AS q1,
             max(CASE WHEN arm = 'treatment' THEN n END) AS n2,
             max(CASE WHEN arm = 'treatment' THEN s END) AS s2,
             max(CASE WHEN arm = 'treatment' THEN q END) AS q2
      FROM stats)
    SELECT CAST(n1 AS BIGINT) AS n_control,
           CAST(n2 AS BIGINT) AS n_treatment,
           round(s1 / (100.0 * n1), 4) AS mean_control,
           round(s2 / (100.0 * n2), 4) AS mean_treatment,
           round((s2 / (100.0 * n2)) - (s1 / (100.0 * n1)), 4) AS lift,
           round(
             ((s2 / (100.0 * n2)) - (s1 / (100.0 * n1)))
             / sqrt(
                 ((q1 - CAST(s1 AS HUGEINT) * s1 / CAST(n1 AS DOUBLE))
                  / (n1 - 1.0)) / 10000.0 / n1
                 + ((q2 - CAST(s2 AS HUGEINT) * s2 / CAST(n2 AS DOUBLE))
                    / (n2 - 1.0)) / 10000.0 / n2
               ),
             4) AS t_welch
    FROM wide
    """,
    "Welch two-sample t statistic over an md5-hash-assigned A/B split "
    "(the deterministic arm assignment every hash-bucketed experiment "
    "uses): ONE conditional agg carries exact integer cent sums and "
    "HUGEINT/decimal squared sums, so means/variances derive from "
    "exact integers and the final t is one identically-ordered double "
    "expression on both engines. Completes the experimentation family "
    "next to ab_cuped_adjust",
)
def ab_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arm = F.when(
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ab-arm|"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(2),
        )
        == 0,
        "control",
    ).otherwise("treatment")
    cents = F.round(F.col("value") * 100).cast("bigint")
    assigned = events.select(arm.alias("arm"), cents.alias("cents"))
    stats = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents")).alias(
            "q"
        ),
    )
    w = stats.agg(
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == "control", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == "control", F.col("q"))).alias("q1"),
        F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("arm") == "treatment", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("arm") == "treatment", F.col("q"))).alias("q2"),
    )
    m1 = F.col("s1") / (100.0 * F.col("n1"))
    m2 = F.col("s2") / (100.0 * F.col("n2"))
    v1 = (
        (
            F.col("q1")
            - F.col("s1").cast("decimal(19,0)") * F.col("s1")
            / F.col("n1").cast("double")
        )
        / (F.col("n1") - 1.0)
    ) / 10000.0
    v2 = (
        (
            F.col("q2")
            - F.col("s2").cast("decimal(19,0)") * F.col("s2")
            / F.col("n2").cast("double")
        )
        / (F.col("n2") - 1.0)
    ) / 10000.0
    return w.select(
        F.col("n1").cast("bigint").alias("n_control"),
        F.col("n2").cast("bigint").alias("n_treatment"),
        F.round(m1, 4).alias("mean_control"),
        F.round(m2, 4).alias("mean_treatment"),
        F.round(m2 - m1, 4).alias("lift"),
        F.round(
            (m2 - m1)
            / F.sqrt(v1 / F.col("n1") + v2 / F.col("n2")),
            4,
        ).alias("t_welch"),
    )
