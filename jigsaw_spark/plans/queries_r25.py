"""Round-6 batch 2: sequence pattern matching, source-level overlap,
zone-map skipping, code/PII curation scans, embedding QA, weighted
percentiles, and the v4 curation pipeline —

- ``rel_event_pattern_match``: MATCH_RECOGNIZE-style sequence detection
  — per-user event streams rendered to an ordered initials string, the
  funnel pattern counted by regexp; the sessionized path analysis
  SQL:2016 row-pattern matching covers.
- ``dedup_source_overlap``: source-level trigram Jaccard matrix — which
  SOURCES mirror each other (the crawl-dedup planning view, pairs are
  |sources|² not |docs|²).
- ``layout_skipping_report``: zone-map (min/max) skip ratios for the
  SAME predicate under a Z-ordered vs an id-ordered layout — the
  measurement that justifies layout_zorder.
- ``text_code_detect``: code-vs-prose heuristic (code-punctuation
  density) — the curation gate that routes documents to a code or
  prose pipeline.
- ``text_pii_scan``: regex PII census (emails / IPv4s / phone shapes)
  per source — the scrub-before-train audit.
- ``dq_embedding_norms``: exact integer median/MAD outlier census over
  quantized squared embedding norms — the embedding-table health check
  (collapsed or exploded vectors poison ANN and dedup).
- ``agg_weighted_median``: exact weighted nearest-rank percentiles
  (quantity-weighted price) via the value-grouped cumulative idiom.
- ``curation_pipeline_v4``: repetition + novelty + length gates composed
  into per-source keep decisions — the round-6 signals assembled into
  one decision query.

Float discipline: NO doubles in this module (integer micro/milli ratios
by floor division; money in cents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# rel_event_pattern_match
# ---------------------------------------------------------------------------

_SEQ_SQL = """
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), event_id) AS seq
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS n_events,
           CAST(length(regexp_extract_all(seq, 'vcp')) AS BIGINT) AS n_vcp,
           CAST(length(regexp_extract_all(seq, 'vp')) AS BIGINT) AS n_vp,
           CAST(CASE WHEN length(regexp_extract_all(seq, 'vcp')) > 0
                     THEN 1 ELSE 0 END AS INT) AS has_funnel
    FROM seqs
"""


@register(
    "rel_event_pattern_match",
    _SEQ_SQL,
    "MATCH_RECOGNIZE-style sequence detection: each user's event stream "
    "collapses to an initials string in (ts, event_id) total order "
    "(v=view c=click p=purchase ...), and the funnel patterns 'vcp' / "
    "'vp' are counted by non-overlapping regexp scan — identical "
    "left-to-right semantics in Java regex and RE2. Shape: ONE "
    "user-keyed sort_array(collect_list) agg (no window), then "
    "map-only pattern counts; per-user sequences are bounded by "
    "session length at corpus scale, never by corpus size",
)
def rel_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("t"),
                F.col("event_id").alias("eid"),
                F.substring("event_type", 1, 1).alias("i"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("s")), lambda x: x["i"]
                ),
                "",
            ).alias("seq")
        )
    )
    n_vcp = F.expr("regexp_count(seq, 'vcp')").cast("bigint")
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        n_vcp.alias("n_vcp"),
        F.expr("regexp_count(seq, 'vp')").cast("bigint").alias("n_vp"),
        F.when(n_vcp > 0, 1).otherwise(0).cast("int").alias("has_funnel"),
    )


# ---------------------------------------------------------------------------
# dedup_source_overlap
# ---------------------------------------------------------------------------


def _source_overlap_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH toks AS (
      SELECT source, {tokens_sql('text')} AS t FROM documents),
    ssh AS MATERIALIZED (
      SELECT DISTINCT source,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3),
    sizes AS (SELECT source, count(*) AS sz FROM ssh GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
      FROM ssh a JOIN ssh b
        ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b,
           CAST(sa.sz AS BIGINT) AS sz_a,
           CAST(sb.sz AS BIGINT) AS sz_b,
           CAST(i.inter AS BIGINT) AS n_shared,
           CAST(i.inter * 1000000 // (sa.sz + sb.sz - i.inter) AS BIGINT)
             AS jaccard_micro
    FROM inter i
    JOIN sizes sa ON i.src_a = sa.source
    JOIN sizes sb ON i.src_b = sb.source
"""


@register(
    "dedup_source_overlap",
    _source_overlap_sql(),
    "source-level trigram Jaccard matrix: which SOURCES mirror each "
    "other — the crawl-planning view that decides which feeds to drop "
    "wholesale before any doc-level dedup runs. The pair space is "
    "|sources|² (a handful), NOT |docs|²: shingles aggregate to the "
    "(source, shingle) distinct relation first, so each shingle's "
    "posting list is bounded by the source count. Integer micro "
    "Jaccard of exact counts",
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr

    # spread before the explode (single-file read = one partition)
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # bucket form (r14, guide §2.3/§2.4): ONE (shingle) hash-agg with a
    # per-shingle source SET replaces the old distinct shuffle +
    # checkpoint + two join-side shuffles of the full (source, shingle)
    # relation — collect_set dedups (source, shingle) exactly like the
    # old .distinct(), pair enumeration is bucket-local over the
    # bounded |sources| set, and sizes explode the same buckets
    ssh = docs.select(
        "source",
        F.explode(shingles_expr(tokens_expr("text"))).alias("shingle"),
    )
    buckets = ssh.groupBy("shingle").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    sizes = (
        buckets.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    combos = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + F.lit(2), F.size(F.col("ss"))),
                lambda y: F.struct(
                    x.alias("src_a"), y.alias("src_b")
                ),
            ),
        )
    )
    inter = (
        buckets.filter(F.size("ss") >= 2)
        .select(F.explode(combos).alias("p"))
        .select(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sza"))
    sz_b = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("szb"))
    return (
        inter.join(F.broadcast(sz_a), "src_a")
        .join(F.broadcast(sz_b), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("sza").cast("bigint").alias("sz_a"),
            F.col("szb").cast("bigint").alias("sz_b"),
            F.col("inter").cast("bigint").alias("n_shared"),
            F.expr(
                "CAST(inter * 1000000 div (sza + szb - inter) AS BIGINT)"
            ).alias("jaccard_micro"),
        )
    )


# ---------------------------------------------------------------------------
# layout_skipping_report
# ---------------------------------------------------------------------------

def _skipping_sql() -> str:
    from jigsaw_spark.plans.queries_r6 import _morton_sql

    # dims normalize to the full 16-bit Morton domain by their observed
    # maxima (data-dependent but deterministic): without this, a small
    # custkey domain leaves the x bit-planes all-zero and the interleave
    # degenerates to a price sort. Predicate = the [0.4, 0.5) band of
    # the custkey domain, same fixed fractions at every sf.
    return f"""
    WITH mx AS (
      SELECT max(o_custkey) AS mck,
             max(CAST(round(o_totalprice * 100) AS BIGINT)) AS mc
      FROM orders),
    keys AS (
      SELECT o_orderkey, o_custkey,
             o_custkey * 65535 // mx.mck AS xk,
             CAST(round(o_totalprice * 100) AS BIGINT) * 65535 // mx.mc AS yk
      FROM orders, mx),
    z AS (
      SELECT o_orderkey, o_custkey,
             {_morton_sql('xk', 'yk')} AS zkey
      FROM keys),
    blocks AS (
      SELECT 'zorder' AS layout, zkey >> 27 AS block,
             min(o_custkey) AS lo, max(o_custkey) AS hi, count(*) AS n_rows
      FROM z GROUP BY 2
      UNION ALL
      SELECT 'id_order' AS layout,
             k.o_orderkey * 32 // (SELECT max(o_orderkey) + 1 FROM orders)
               AS block,
             min(k.o_custkey) AS lo, max(k.o_custkey) AS hi,
             count(*) AS n_rows
      FROM keys k GROUP BY 2),
    pred AS (
      SELECT 2 * mck // 5 AS plo, mck // 2 AS phi FROM mx)
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(CASE WHEN hi < plo OR lo >= phi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_skippable,
           CAST(sum(CASE WHEN hi < plo OR lo >= phi THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_skipped,
           CAST(sum(CASE WHEN hi < plo OR lo >= phi THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS skip_ratio_micro
    FROM blocks, pred GROUP BY layout
"""


@register(
    "layout_skipping_report",
    _skipping_sql(),
    "zone-map skipping report: for the custkey band predicate "
    "[0.4, 0.5) of the key domain, how many min/max blocks a reader "
    "skips under the Z-ordered layout (32 blocks = top 5 interleaved "
    "bits) vs the insertion (id-ordered) layout (32 equal id ranges) — "
    "the measurement that justifies paying the z-order write cost "
    "(data-skipping indexes in Delta/Iceberg read exactly these "
    "per-file extents). Dims normalize to the 16-bit Morton domain by "
    "their maxima so the interleave is meaningful at any sf; "
    "skippability is pure integer interval logic, ONE hash agg per "
    "layout to the 32-block dim",
)
def layout_skipping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries_r6 import _morton_sql

    orders = _t(spark, sf_dir, "orders")
    mx = orders.agg(
        F.max("o_custkey").alias("mck"),
        F.max(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "mc"
        ),
        F.max("o_orderkey").alias("mok"),
    ).collect()[0]
    mck, mc, mok = int(mx["mck"]), int(mx["mc"]), int(mx["mok"])
    keys = orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr(f"o_custkey * 65535 div {mck}").alias("xk"),
        F.expr(
            f"CAST(round(o_totalprice * 100) AS BIGINT) * 65535 div {mc}"
        ).alias("yk"),
    )
    zb = (
        keys.select(
            "o_custkey",
            F.shiftright(F.expr(_morton_sql("xk", "yk")), 27).alias("block"),
        )
        .groupBy("block")
        .agg(
            F.min("o_custkey").alias("lo"),
            F.max("o_custkey").alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(F.lit("zorder").alias("layout"), "lo", "hi", "n_rows")
    )
    ib = (
        keys.select(
            F.expr(f"o_orderkey * 32 div {mok + 1}").alias("block"),
            "o_custkey",
        )
        .groupBy("block")
        .agg(
            F.min("o_custkey").alias("lo"),
            F.max("o_custkey").alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(F.lit("id_order").alias("layout"), "lo", "hi", "n_rows")
    )
    blocks = zb.unionByName(ib)
    plo, phi = 2 * mck // 5, mck // 2
    skippable = F.when(
        (F.col("hi") < plo) | (F.col("lo") >= phi), 1
    ).otherwise(0)
    return blocks.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(skippable).cast("bigint").alias("n_skippable"),
        F.sum(F.when(skippable == 1, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_skipped"),
        F.expr(
            f"CAST(sum(CASE WHEN hi < {plo} OR lo >= {phi} "
            "THEN 1 ELSE 0 END) * 1000000 div count(*) AS BIGINT)"
        ).alias("skip_ratio_micro"),
    )


# ---------------------------------------------------------------------------
# text_code_detect
# ---------------------------------------------------------------------------

_CODE_CHARS = "{}();=[]<>"


def _char_count_sql(col: str, ch: str) -> str:
    esc = ch.replace("'", "''")
    return f"(length({col}) - length(replace({col}, '{esc}', '')))"


_CODE_SQL = f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST({' + '.join(_char_count_sql('text', c) for c in _CODE_CHARS)}
                AS BIGINT) AS code_chars,
           CAST(({' + '.join(_char_count_sql('text', c) for c in _CODE_CHARS)})
                * 1000000 // length(text) AS BIGINT) AS code_micro,
           CAST(CASE WHEN ({' + '.join(_char_count_sql('text', c) for c in _CODE_CHARS)})
                          * 1000000 // length(text) >= 20000
                     THEN 1 ELSE 0 END AS INT) AS is_codey
    FROM documents WHERE length(text) > 0
"""


@register(
    "text_code_detect",
    _CODE_SQL,
    "code-vs-prose router: density of code punctuation "
    f"({_CODE_CHARS!r}) per character in integer micro-units, flagged "
    "at 2% — the gate that routes documents to a code pipeline "
    "(different tokenizer, different dedup granularity) vs the prose "
    "path. Pure map-side length/replace arithmetic (no regex, no "
    "explode) — the cheapest possible corpus scan, and the count "
    "expressions are shared verbatim with the oracle",
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    total = sum(
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(c))))
        for c in _CODE_CHARS
    )
    micro = F.expr(
        f"CAST(({' + '.join(_char_count_sql('text', c) for c in _CODE_CHARS)})"
        " * 1000000 div length(text) AS BIGINT)"
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        total.cast("bigint").alias("code_chars"),
        micro.alias("code_micro"),
        F.when(micro >= 20000, 1).otherwise(0).cast("int").alias("is_codey"),
    )


# ---------------------------------------------------------------------------
# text_pii_scan
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"

_PII_SQL = f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(regexp_extract_all(text, '{_PII_EMAIL}')))
                AS BIGINT) AS n_emails,
           CAST(sum(length(regexp_extract_all(text, '{_PII_IPV4}')))
                AS BIGINT) AS n_ipv4,
           CAST(sum(length(regexp_extract_all(text, '{_PII_PHONE}')))
                AS BIGINT) AS n_phones,
           CAST(sum(CASE WHEN length(regexp_extract_all(text, '{_PII_EMAIL}'))
                          + length(regexp_extract_all(text, '{_PII_IPV4}'))
                          + length(regexp_extract_all(text, '{_PII_PHONE}')) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
    FROM documents GROUP BY source
"""


@register(
    "text_pii_scan",
    _PII_SQL,
    "PII census per source (emails / IPv4 shapes / phone shapes by "
    "non-overlapping regexp count): the scrub-before-train audit every "
    "compliance review asks for, aggregated to the source dim so the "
    "report stays tiny at any corpus size. The patterns use only the "
    "regex subset with identical semantics in Java regex and RE2 "
    "(character classes, bounded repetition, \\b). Map-side counts + "
    "ONE source-keyed hash agg",
)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    em = F.regexp_count("text", F.lit(_PII_EMAIL))
    ip = F.regexp_count("text", F.lit(_PII_IPV4))
    ph = F.regexp_count("text", F.lit(_PII_PHONE))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(em).cast("bigint").alias("n_emails"),
        F.sum(ip).cast("bigint").alias("n_ipv4"),
        F.sum(ph).cast("bigint").alias("n_phones"),
        F.sum(F.when(em + ip + ph > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_pii"),
    )


# ---------------------------------------------------------------------------
# dq_embedding_norms
# ---------------------------------------------------------------------------

_NORM_SQL = """
    WITH q AS (
      SELECT vec_id, label,
             CAST(list_sum(list_transform(embedding::DOUBLE[],
                    x -> CAST(round(x * 1000) AS BIGINT)
                         * CAST(round(x * 1000) AS BIGINT))) AS BIGINT) AS sq
      FROM embeddings),
    g AS (SELECT label, sq, count(*) AS c FROM q GROUP BY 1, 2),
    cum AS (
      SELECT label, sq,
             sum(c) OVER (PARTITION BY label ORDER BY sq) AS cc,
             sum(c) OVER (PARTITION BY label) AS n
      FROM g),
    med AS (
      SELECT label, CAST(max(n) AS BIGINT) AS n,
             CAST(min(CASE WHEN cc >= (n + 1) // 2 THEN sq END) AS BIGINT)
               AS med_sq
      FROM cum GROUP BY label),
    dev AS (
      SELECT q.label, abs(q.sq - m.med_sq) AS ad
      FROM q JOIN med m ON q.label = m.label),
    dg AS (SELECT label, ad, count(*) AS c FROM dev GROUP BY 1, 2),
    dcum AS (
      SELECT label, ad,
             sum(c) OVER (PARTITION BY label ORDER BY ad) AS cc,
             sum(c) OVER (PARTITION BY label) AS n
      FROM dg),
    mad AS (
      SELECT label,
             CAST(min(CASE WHEN cc >= (n + 1) // 2 THEN ad END) AS BIGINT)
               AS mad_sq
      FROM dcum GROUP BY label)
    SELECT m.label,
           m.n,
           m.med_sq,
           mad.mad_sq,
           (SELECT CAST(count(*) AS BIGINT) FROM q
            WHERE q.label = m.label
              AND abs(q.sq - m.med_sq) > 5 * mad.mad_sq) AS n_outliers
    FROM med m JOIN mad ON m.label = mad.label
"""


@register(
    "dq_embedding_norms",
    _NORM_SQL,
    "embedding-table health check: exact integer median + MAD of "
    "QUANTIZED SQUARED norms (milli-unit coordinates — no sqrt, no "
    "libm anywhere) per label, flagging vectors > 5 MADs from the "
    "median — collapsed (near-zero) or exploded vectors poison cosine "
    "dedup and ANN recall before any model sees them. Shape: one "
    "map-only quantized fold, the nearest-rank percentile idiom twice "
    "(label-partitioned windows over the distinct-value dim), one "
    "outlier count join — every number is an exact integer",
)
def dq_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.round(x * 1000).cast("long"),
    )
    sq = F.aggregate(
        qv, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    q = emb.select("vec_id", "label", sq.alias("sq"))

    def _median(df: DataFrame, val: str, out: str) -> DataFrame:
        g = df.groupBy("label", val).agg(F.count(F.lit(1)).alias("c"))
        w = (
            Window.partitionBy("label")
            .orderBy(val)
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        cum = g.select(
            "label",
            F.col(val),
            F.sum("c").over(w).alias("cc"),
            F.sum("c").over(Window.partitionBy("label")).alias("n"),
        )
        return cum.groupBy("label").agg(
            F.max("n").cast("bigint").alias("n"),
            F.min(
                F.when(F.col("cc") >= F.expr("(n + 1) div 2"), F.col(val))
            )
            .cast("bigint")
            .alias(out),
        )

    med = _median(q, "sq", "med_sq")
    dev = q.join(F.broadcast(med.select("label", "med_sq")), "label").select(
        "label", F.abs(F.col("sq") - F.col("med_sq")).alias("ad")
    )
    mad = _median(dev, "ad", "mad_sq").select("label", "mad_sq")
    stats = med.join(F.broadcast(mad), "label")
    outliers = (
        q.join(F.broadcast(stats.select("label", "med_sq", "mad_sq")), "label")
        .filter(
            F.abs(F.col("sq") - F.col("med_sq")) > 5 * F.col("mad_sq")
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("no"))
    )
    return stats.join(outliers, "label", "left_outer").select(
        "label",
        "n",
        "med_sq",
        "mad_sq",
        F.coalesce("no", F.lit(0)).cast("bigint").alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# agg_weighted_median
# ---------------------------------------------------------------------------

_WMED_SQL = """
    WITH g AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
             CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2),
    cum AS (
      SELECT flag, cents,
             sum(w) OVER (PARTITION BY flag ORDER BY cents) AS cw,
             sum(w) OVER (PARTITION BY flag) AS tw
      FROM g)
    SELECT flag AS l_returnflag,
           CAST(max(tw) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN cw >= (25 * tw + 99) // 100 THEN cents END)
                AS BIGINT) AS wp25_cents,
           CAST(min(CASE WHEN cw >= (50 * tw + 99) // 100 THEN cents END)
                AS BIGINT) AS wp50_cents,
           CAST(min(CASE WHEN cw >= (75 * tw + 99) // 100 THEN cents END)
                AS BIGINT) AS wp75_cents
    FROM cum GROUP BY flag
"""


@register(
    "agg_weighted_median",
    _WMED_SQL,
    "exact WEIGHTED nearest-rank percentiles (quantity-weighted price "
    "p25/p50/p75 per return flag): the value at cumulative weight >= "
    "ceil(p*W/100) — the estimator every weighted-sampling pipeline "
    "(SoftDeDup, DSIR) needs to summarize its reweighted distribution "
    "without materializing resampled rows. Same value-grouped "
    "cumulative shape as agg_percentile_exact, weights summed instead "
    "of counted; pure integer selection",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
    ).agg(F.sum(F.round("l_quantity", 0).cast("bigint")).alias("w"))
    w = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cum = g.select(
        "flag",
        "cents",
        F.sum("w").over(w).alias("cw"),
        F.sum("w").over(Window.partitionBy("flag")).alias("tw"),
    )

    def pick(p: int):
        return (
            F.min(
                F.when(
                    F.col("cw") >= F.expr(f"({p} * tw + 99) div 100"),
                    F.col("cents"),
                )
            )
            .cast("bigint")
            .alias(f"wp{p}_cents")
        )

    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.max("tw").cast("bigint").alias("total_weight"),
        pick(25),
        pick(50),
        pick(75),
    )


# ---------------------------------------------------------------------------
# curation_pipeline_v4
# ---------------------------------------------------------------------------

_V4_REP_MAX = 500_000  # repetition_micro below this
_V4_NOV_MIN = 200_000  # novelty_micro at or above this
_V4_LEN_MIN = 200  # n_chars at or above this


def _pipeline_v4_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH toks AS (SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3),
    firsts AS (SELECT shingle, min(doc_id) AS fd FROM sh GROUP BY shingle),
    nov AS MATERIALIZED (
      SELECT s.doc_id,
             sum(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END) * 1000000
               // count(*) AS novelty_micro
      FROM sh s JOIN firsts f ON s.shingle = f.shingle
      GROUP BY s.doc_id),
    shn AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks WHERE len(t) >= 3),
    cnt AS (SELECT doc_id, shingle, count(*) AS c FROM shn GROUP BY 1, 2),
    rep AS MATERIALIZED (
      SELECT doc_id, max(c) * 1000000 // sum(c) AS repetition_micro
      FROM cnt GROUP BY doc_id),
    decided AS (
      SELECT d.doc_id, d.source,
             CASE WHEN r.repetition_micro < {_V4_REP_MAX}
                   AND n.novelty_micro >= {_V4_NOV_MIN}
                   AND d.n_chars >= {_V4_LEN_MIN}
                  THEN 1 ELSE 0 END AS kept,
             n.novelty_micro
      FROM documents d
      JOIN rep r ON d.doc_id = r.doc_id
      JOIN nov n ON d.doc_id = n.doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(kept) * 1000000 // count(*) AS BIGINT) AS keep_micro,
           CAST(CASE WHEN sum(kept) > 0
                     THEN sum(CASE WHEN kept = 1 THEN novelty_micro
                                   ELSE 0 END) // sum(kept)
                     ELSE -1 END AS BIGINT) AS kept_novelty_micro
    FROM decided GROUP BY source
"""


@register(
    "curation_pipeline_v4",
    _pipeline_v4_sql(),
    "curation pipeline v4: the round-6 signals composed into per-source "
    "keep decisions — keep iff repetition_micro < 0.5e6 (no degenerate "
    "loops) AND novelty_micro >= 0.2e6 (not a restatement of earlier "
    "corpus) AND n_chars >= 200; report keep rates and mean kept "
    "novelty per source. Docs too short to shingle are dropped by "
    "construction (no trigram evidence = no keep decision), matching "
    "the oracle's join semantics. One shingle explode feeds BOTH "
    "signals; integer micro ratios throughout",
)
def curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import shingles_expr, tokens_expr

    docs = _t(spark, sf_dir, "documents")
    # BOTH signals come from one shingle explode: the per-(doc, shingle)
    # occurrence counts serve repetition directly AND collapse to the
    # distinct relation novelty needs — localCheckpoint materializes the
    # counts once instead of re-running the explode per signal (the
    # naive compose-two-registered-queries form measured 11.4s at sf0.1;
    # this one ~3s, same results)
    cnt = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.explode(shingles_expr(tokens_expr("text"))).alias("shingle"),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    rep = cnt.groupBy("doc_id").agg(
        F.expr("CAST(max(c) * 1000000 div sum(c) AS BIGINT)").alias(
            "repetition_micro"
        )
    )
    firsts = cnt.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    nov = (
        cnt.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
                " * 1000000 div count(*) AS BIGINT)"
            ).alias("novelty_micro")
        )
    )
    decided = (
        docs.select("doc_id", "source", "n_chars")
        .join(rep, "doc_id")
        .join(nov, "doc_id")
        .select(
            "source",
            "novelty_micro",
            F.when(
                (F.col("repetition_micro") < _V4_REP_MAX)
                & (F.col("novelty_micro") >= _V4_NOV_MIN)
                & (F.col("n_chars") >= _V4_LEN_MIN),
                1,
            )
            .otherwise(0)
            .alias("kept"),
        )
    )
    return decided.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.expr("CAST(sum(kept) * 1000000 div count(*) AS BIGINT)").alias(
            "keep_micro"
        ),
        F.expr(
            "CAST(CASE WHEN sum(kept) > 0 THEN "
            "sum(CASE WHEN kept = 1 THEN novelty_micro ELSE 0 END) "
            "div sum(kept) ELSE -1 END AS BIGINT)"
        ).alias("kept_novelty_micro"),
    )
