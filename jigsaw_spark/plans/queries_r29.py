"""Round-8 batch 2: isotonic calibration, differential privacy, sparse
TF-IDF kNN, time-bounded funnels, bipartite projection, and the
nearest-neighbor resize roundtrip —

- ``ml_isotonic_decile``: isotonic (PAV) calibration of the decile
  score/outcome bins, EXACT: the pool-adjacent-violators solution is
  computed via the closed minimax formula iso(i) = max_{j<=i}
  min_{k>=i} rate(j..k) over exact integer interval sums — no float
  ever orders a comparison, and since min/max commute with floor the
  y*1e12 div n scaled-integer form yields exactly
  floor(isotonic * 1e6) at any scale.
- ``privacy_dp_counts``: epsilon=1 Laplace mechanism over per-type
  counts with a SEEDED uniform from the md5 stream — the DP release
  twin of privacy_kanon_release; noise is pre-rounded to integer
  micro-units so the release is reproducible and oracle-exact.
- ``text_tfidf_knn``: top-3 nearest documents per document under
  TF-IDF cosine over the discriminative (df<=100) vocabulary — the
  sparse similarity join behind related-docs / semantic-dedup
  candidate generation, with integer milli-idf weights and exact
  cross-multiplied cosine ordering.
- ``rel_funnel_windowed``: view -> click-within-7d -> purchase-
  within-7d-of-click funnel (each stage's FIRST qualifying event must
  fall inside the window anchored at the previous stage) — the
  time-bounded variant of ``rel_funnel_conversion``.
- ``graph_bipartite_project``: user-user co-engagement projection of
  the user x (event_type, day) bipartite graph, restricted to
  discriminative contexts (2..50 users) — top-20 edges by shared
  contexts.
- ``mm_resize_nn``: synthesized color masks -> REAL decode ->
  nearest-neighbor 2x downsample (24x32 -> 12x16) -> class pixel
  counts, with a closed-form oracle (the NN index map floor(j*2) makes
  the resized rectangle extents exact integer arithmetic) — the
  resize member of the multimodal kernel family, k6_deeplab_export's
  roundtrip discipline applied to scaling.

Scale notes (100 TB): isotonic runs entirely on the 10-row decile dim
(the decile assignment reuses the cumulative-dim rank); TF-IDF kNN is
the capped-posting bucket-pair idiom (no all-pairs; the df cap bounds
per-term fan-out and the only windows partition by doc); the windowed
funnel is user-keyed joins; the bipartite projection caps context size
(oversized contexts are non-discriminative by construction — the same
exact-when-not-binding cap semantics as LSH buckets/postings); DP and
resize are map-only + one agg.

Float discipline: everything is exact integers except the two libm
sites — the Laplace ln (integer-derived argument, pre-rounded to micro
BEFORE any addition) and idf (integer-derived argument, pre-rounded to
milli before entering any weight product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

_DAY_US = 86_400_000_000
_WEEK_US = 7 * _DAY_US

# ---------------------------------------------------------------------------
# ml_isotonic_decile
# ---------------------------------------------------------------------------

_ISO_SQL = """
    WITH s AS (
      SELECT event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events),
    t AS MATERIALIZED (SELECT count(*) AS n FROM s),
    r AS (
      SELECT pos,
             (row_number() OVER (ORDER BY cents DESC, event_id) - 1)
               * 10 // (SELECT n FROM t) AS decile
      FROM s),
    bins AS MATERIALIZED (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS npos
      FROM r GROUP BY decile),
    iv AS MATERIALIZED (
      SELECT j.decile AS jd, k.decile AS kd,
             CAST(sum(m.npos) * 1000000000000 // sum(m.n) AS BIGINT)
               AS r12
      FROM bins j
      JOIN bins k ON j.decile <= k.decile
      JOIN bins m ON m.decile BETWEEN j.decile AND k.decile
      GROUP BY 1, 2),
    mins AS (
      SELECT b.decile AS decile, iv.jd, min(iv.r12) AS minr
      FROM bins b
      JOIN iv ON iv.jd <= b.decile AND iv.kd >= b.decile
      GROUP BY 1, 2),
    iso AS (SELECT decile, max(minr) AS iso_r12 FROM mins GROUP BY 1)
    SELECT CAST(b.decile AS INT) AS decile,
           b.n, b.npos,
           CAST(b.npos * 1000000 // b.n AS BIGINT) AS raw_rate_micro,
           CAST(iso.iso_r12 // 1000000 AS BIGINT) AS iso_rate_micro
    FROM bins b JOIN iso ON b.decile = iso.decile
"""


@register(
    "ml_isotonic_decile",
    _ISO_SQL,
    "isotonic (PAV) calibration of the decile bins (score = value "
    "cents desc, outcome = purchase): the pool-adjacent-violators fit "
    "computed EXACTLY via the closed minimax form iso(i) = max_{j<=i} "
    "min_{k>=i} rate(j..k) — interval rates enter as the scaled "
    "integers y*1e12 div n, and because min/max commute with floor "
    "(min of floors IS the floor of the min), the result is exactly "
    "floor(isotonic_value * 1e6) with no precision caveat at any "
    "scale (npos*1e12 needs DECIMAL(38,0) past ~9e6 positives per "
    "bin), so the monotone fit is bit-identical on both engines with "
    "NO iterative pooling loop anywhere. "
    "ml_calibration_bins shows raw miscalibration; this is the "
    "monotone-regression repair every calibrated scorer ships. Shape: "
    "decile assignment reuses the cumulative-dim rank (windows over "
    "the distinct-cents dim); everything after is joins/aggs over the "
    "10-row bin dim (<=1000 interval rows) — constant in data size",
)
def ml_isotonic_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries_r27 import _exact_rank

    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "pos"
        ),
    )
    tot = s.agg(F.count(F.lit(1)).alias("n"))
    r = (
        _exact_rank(s, "cents", "event_id", desc=True)
        .crossJoin(F.broadcast(tot))
        .select("pos", F.expr("(_rn - 1) * 10 div n").alias("decile"))
    )
    bins = r.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("npos"),
    )
    j = bins.select(F.col("decile").alias("jd"))
    k = bins.select(F.col("decile").alias("kd"))
    m = bins.select(
        F.col("decile").alias("md"), F.col("n").alias("mn"),
        F.col("npos").alias("mp"),
    )
    iv = (
        j.join(F.broadcast(k), F.col("jd") <= F.col("kd"))
        .join(
            F.broadcast(m),
            (F.col("md") >= F.col("jd")) & (F.col("md") <= F.col("kd")),
        )
        .groupBy("jd", "kd")
        .agg(
            F.expr(
                "CAST(sum(mp) * 1000000000000 div sum(mn) AS BIGINT)"
            ).alias("r12")
        )
    )
    mins = (
        bins.select(F.col("decile"))
        .join(
            F.broadcast(iv),
            (F.col("jd") <= F.col("decile"))
            & (F.col("kd") >= F.col("decile")),
        )
        .groupBy("decile", "jd")
        .agg(F.min("r12").alias("minr"))
    )
    iso = mins.groupBy("decile").agg(F.max("minr").alias("iso_r12"))
    return bins.join(iso, "decile").select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "npos",
        F.expr("CAST(npos * 1000000 div n AS BIGINT)").alias(
            "raw_rate_micro"
        ),
        F.expr("CAST(iso_r12 div 1000000 AS BIGINT)").alias(
            "iso_rate_micro"
        ),
    )


# ---------------------------------------------------------------------------
# privacy_dp_counts
# ---------------------------------------------------------------------------

_TWO48 = 281474976710656  # 2^48

_DP_SQL = f"""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    u AS (
      SELECT event_type, n,
             -- UBIGINT -> BIGINT before any signed arithmetic (DuckDB
             -- unsigned ops underflow); the 48-bit value fits BIGINT
             2 * CAST(CAST(('0x' || substr(
                   md5(concat_ws('|', 'dp-eps1', event_type)), 1, 12))
                   AS UBIGINT) AS BIGINT) + 1 - {_TWO48} AS s
      FROM g)
    SELECT event_type, n,
           CAST(round(CASE WHEN s < 0 THEN 1.0 ELSE -1.0 END
                 * ln(CAST({_TWO48} - abs(s) AS DOUBLE) / {_TWO48}.0)
                 * 1000000.0, 0) AS BIGINT) AS noise_micro,
           CAST(n * 1000000 + round(CASE WHEN s < 0 THEN 1.0 ELSE -1.0 END
                 * ln(CAST({_TWO48} - abs(s) AS DOUBLE) / {_TWO48}.0)
                 * 1000000.0, 0) AS BIGINT) AS noisy_micro
    FROM u
"""


@register(
    "privacy_dp_counts",
    _DP_SQL,
    "epsilon=1 differentially-private count release per event type "
    "(Laplace mechanism, sensitivity 1): the uniform draw comes from "
    "the md5 stream (seed 'dp-eps1', 48-bit mantissa, +1 offset so u "
    "is never exactly 0 or 1/2), noise = -sgn(u-1/2) * ln(1-2|u-1/2|) "
    "with the ln argument an exact integer ratio — identical doubles "
    "on both engines — PRE-ROUNDED to integer micro-units before any "
    "addition, so the release is bit-reproducible across engines, "
    "partitionings, and retries (a DP release must be computed once "
    "and pinned; a nondeterministic noise source can be averaged "
    "away). Sign via CASE, not signum (Spark signum returns DOUBLE, "
    "DuckDB sign INT). Shape: one hash-agg + a map over |event types|",
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    u = g.select(
        "event_type",
        "n",
        (
            2
            * F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit("dp-eps1"), "event_type")),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            + 1
            - F.lit(_TWO48)
        ).alias("s"),
    )
    noise = F.round(
        F.when(F.col("s") < 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(
            (F.lit(_TWO48) - F.abs("s")).cast("double") / F.lit(float(_TWO48))
        )
        * 1000000.0,
        0,
    ).cast("bigint")
    return u.select(
        "event_type",
        "n",
        noise.alias("noise_micro"),
        (F.col("n") * 1000000 + noise).cast("bigint").alias("noisy_micro"),
    )


# ---------------------------------------------------------------------------
# text_tfidf_knn
# ---------------------------------------------------------------------------


def _tfidf_knn_sql() -> str:
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
    df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df
      FROM tf GROUP BY 1),
    kept AS MATERIALIZED (
      SELECT tf.doc_id, tf.term,
             tf.tf * CAST(round(ln(
               (CAST((SELECT n FROM nd) AS DOUBLE) + 1.0)
               / (CAST(df.df AS DOUBLE) + 1.0)) * 1000, 0) AS BIGINT)
               AS w
      FROM tf JOIN df ON tf.term = df.term
      WHERE df.df <= 100),
    norm AS MATERIALIZED (
      SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2
      FROM kept GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(sum(a.w * b.w) AS BIGINT) AS dot
      FROM kept a JOIN kept b
        ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    sym AS (
      SELECT doc_a AS doc_id, doc_b AS neighbor_id, dot FROM dots
      UNION ALL
      SELECT doc_b AS doc_id, doc_a AS neighbor_id, dot FROM dots),
    scored AS (
      SELECT b.doc_id, b.neighbor_id, b.dot,
             CAST(CAST(b.dot AS HUGEINT) * b.dot * 1000000
                  // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT)
               AS cos2_micro
      FROM sym b
      JOIN norm na ON b.doc_id = na.doc_id
      JOIN norm nb ON b.neighbor_id = nb.doc_id),
    ranked AS (
      SELECT doc_id, neighbor_id, dot, cos2_micro,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY cos2_micro DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT doc_id, neighbor_id, dot, cos2_micro, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
"""


@register(
    "text_tfidf_knn",
    _tfidf_knn_sql(),
    "top-3 nearest documents per document under TF-IDF cosine over the "
    "DISCRIMINATIVE vocabulary (terms with df <= 100 — ultra-common "
    "terms carry no similarity signal and are exactly the quadratic "
    "posting lists; the cap is the metric's definition, not an "
    "approximation of an uncapped one): idf pre-rounded to integer "
    "milli-units (identical ln args both engines), weights/dots/norms "
    "all exact integers, neighbors ordered by the exact cross-"
    "multiplied squared cosine dot^2*1e6 div (na*nb) in HUGEINT/"
    "DECIMAL(38,0) — no float sqrt or division anywhere. The sparse "
    "similarity join behind related-docs and semantic-dedup candidate "
    "generation. Shape: explode -> (doc,term) hash-agg -> df-capped "
    "posting join (never all-pairs; per-term fan-out <= cap^2) -> "
    "pair hash-agg -> doc-partitioned top-3 window",
)
def text_tfidf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(tokens_expr("text")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    nd = docs.agg(F.countDistinct("doc_id").alias("n"))
    df = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    kept = (
        tf.join(df.filter(F.col("df") <= 100), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.round(
                    F.log(
                        (F.col("n").cast("double") + 1.0)
                        / (F.col("df").cast("double") + 1.0)
                    )
                    * 1000,
                    0,
                ).cast("bigint")
            ).alias("w"),
        )
        # localCheckpoint: four consumers (norm, both posting-join
        # sides, and their re-expansions) otherwise re-derive the
        # explode -> tf -> df lineage each — 18 scans / 35 shuffles in
        # the r9 plan audit for what is logically 1 scan (the
        # graph_random_walk lesson applied to the TF-IDF family)
        .localCheckpoint()
    )
    norm = kept.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("n2")
    )
    a = kept.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    b = kept.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("bigint").alias("dot"))
    )
    both = dots.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("neighbor_id"),
        "dot",
    ).unionByName(
        dots.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("neighbor_id"),
            "dot",
        )
    )
    na = norm.select(
        F.col("doc_id"), F.col("n2").alias("na2")
    )
    nb = norm.select(
        F.col("doc_id").alias("neighbor_id"), F.col("n2").alias("nb2")
    )
    scored = (
        both.join(na, "doc_id")
        .join(nb, "neighbor_id")
        .select(
            "doc_id",
            "neighbor_id",
            "dot",
            F.expr(
                "CAST(CAST(dot AS DECIMAL(38,0)) * dot * 1000000"
                " div (CAST(na2 AS DECIMAL(38,0)) * nb2) AS BIGINT)"
            ).alias("cos2_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("cos2_micro"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "neighbor_id", "dot", "cos2_micro", "rnk")
    )


# ---------------------------------------------------------------------------
# rel_funnel_windowed
# ---------------------------------------------------------------------------

_FUNNEL_W_SQL = f"""
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS vus
      FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS cus
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND epoch_us(e.ts) >= v.vus
        AND epoch_us(e.ts) <= v.vus + {_WEEK_US}
      GROUP BY 1),
    p AS (
      SELECT e.user_id
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) >= c.cus
        AND epoch_us(e.ts) <= c.cus + {_WEEK_US}
      GROUP BY 1),
    n AS (
      SELECT 1 AS step, 'view' AS stage,
             CAST(count(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT 2, 'click_7d', CAST(count(*) AS BIGINT) FROM c
      UNION ALL
      SELECT 3, 'purchase_7d', CAST(count(*) AS BIGINT) FROM p)
    SELECT CAST(step AS INT) AS step, stage, n_users,
           CAST(CASE WHEN step = 1 THEN 1000000
                WHEN lag(n_users) OVER (ORDER BY step) = 0 THEN 0
                ELSE n_users * 1000000
                     // lag(n_users) OVER (ORDER BY step) END AS BIGINT)
             AS conv_from_prev_micro
    FROM n
"""


@register(
    "rel_funnel_windowed",
    _FUNNEL_W_SQL,
    "time-bounded funnel: first view -> first click WITHIN 7 DAYS of "
    "that view -> first purchase WITHIN 7 DAYS of that click; "
    "per-stage user counts + step conversion in exact integer "
    "micro-units — the windowed variant of rel_funnel_conversion "
    "(unbounded funnels overcount: a click a year later is not "
    "conversion). Each stage anchors its window at the PREVIOUS "
    "stage's first qualifying timestamp, so the chain is the standard "
    "product-analytics 'conversion window' semantics. Shape: three "
    "user-keyed hash-aggs/joins (no windows over facts; the 3-row "
    "stage frame is the only global window). Positive-epoch domain",
)
def rel_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("vus"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("us") >= F.col("vus"))
            & (F.col("us") <= F.col("vus") + F.lit(_WEEK_US))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("cus"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("us") >= F.col("cus"))
            & (F.col("us") <= F.col("cus") + F.lit(_WEEK_US))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_"))
    )

    def _n(frame: DataFrame, step: int, stage: str) -> DataFrame:
        return frame.agg(
            F.lit(step).alias("step"),
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )

    n = (
        _n(v, 1, "view")
        .unionByName(_n(c, 2, "click_7d"))
        .unionByName(_n(p, 3, "purchase_7d"))
    )
    w = Window.orderBy("step")  # 3 rows by construction
    return n.select(
        F.col("step").cast("int").alias("step"),
        "stage",
        "n_users",
        F.when(F.col("step") == 1, F.lit(1000000).cast("bigint"))
        .when(F.lag("n_users").over(w) == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr(
                "CAST(n_users * 1000000 div lag(n_users)"
                " OVER (ORDER BY step) AS BIGINT)"
            )
        )
        .alias("conv_from_prev_micro"),
    )


# ---------------------------------------------------------------------------
# graph_bipartite_project
# ---------------------------------------------------------------------------

_BIPROJ_SQL = """
    WITH ctx AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day, user_id
      FROM events GROUP BY 1, 2, 3),
    sized AS (
      SELECT event_type, day, user_id,
             count(*) OVER (PARTITION BY event_type, day) AS sz
      FROM ctx),
    pairs AS (
      SELECT a.user_id AS u, b.user_id AS v, count(*) AS w
      FROM sized a JOIN sized b
        ON a.event_type = b.event_type AND a.day = b.day
       AND a.user_id < b.user_id
      WHERE a.sz BETWEEN 2 AND 50
      GROUP BY 1, 2)
    SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
           CAST(w AS BIGINT) AS shared_contexts
    FROM pairs
    ORDER BY w DESC, u, v
    LIMIT 20
"""


@register(
    "graph_bipartite_project",
    _BIPROJ_SQL,
    "user-user co-engagement: project the user x (event_type, day) "
    "bipartite graph onto users, edge weight = number of shared "
    "DISCRIMINATIVE contexts (2..50 users; a context half the corpus "
    "touched carries no affinity signal and is exactly the quadratic "
    "bucket — the same exact-when-not-binding cap semantics as LSH "
    "buckets and posting lists), top-20 edges by (weight, u, v). The "
    "candidate-generation primitive behind co-visitation recommenders. "
    "Shape: one distinct hash-agg -> per-context sorted-id array -> "
    "bucket-local pair explode (the minhash bucket idiom — one "
    "exchange, never an all-pairs join) -> pair hash-agg -> "
    "TakeOrdered top-20 (no global sort)",
)
def graph_bipartite_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ctx = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            "user_id",
        )
        .groupBy("event_type", "day", "user_id")
        .agg(F.lit(1).alias("_"))
    )
    buckets = ctx.groupBy("event_type", "day").agg(
        F.sort_array(F.collect_list("user_id")).alias("us")
    )
    kept = buckets.filter(
        (F.size("us") >= 2) & (F.size("us") <= 50)
    )
    pairs = kept.select(
        F.explode(
            F.expr(
                "flatten(transform(us, (x, i) ->"
                " transform(slice(us, i + 2, size(us)),"
                " y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    agg = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("shared_contexts")
    )
    return (
        agg.orderBy(F.desc("shared_contexts"), "u", "v")
        .limit(20)
        .select(
            F.col("u").cast("bigint").alias("u"),
            F.col("v").cast("bigint").alias("v"),
            "shared_contexts",
        )
    )


# ---------------------------------------------------------------------------
# mm_resize_nn
# ---------------------------------------------------------------------------

_RESIZE_SQL = """
    SELECT CAST(doc_id AS VARCHAR) AS image_id,
           CAST(12 AS BIGINT) AS height,
           CAST(16 AS BIGINT) AS width,
           CAST(((1 + doc_id % 5 + 3 + doc_id % 3 - 1) // 2
                 - (1 + doc_id % 5 + 1) // 2 + 1)
              * ((1 + doc_id % 11 + 3 + doc_id % 3 - 1) // 2
                 - (1 + doc_id % 11 + 1) // 2 + 1) AS BIGINT) AS car_px,
           CAST(((12 + doc_id % 7 + 3 + doc_id % 2 - 1) // 2
                 - (12 + doc_id % 7 + 1) // 2 + 1)
              * ((17 + doc_id % 9 + 3 + doc_id % 4 - 1) // 2
                 - (17 + doc_id % 9 + 1) // 2 + 1) AS BIGINT) AS ped_px
    FROM documents WHERE doc_id % 20 = 0
"""


@register(
    "mm_resize_nn",
    _RESIZE_SQL,
    "nearest-neighbor 2x downsample roundtrip: the k6 synthesis "
    "rectangles (color PNG, 24x32) are decoded, NN-resized to 12x16 "
    "(dest pixel (j,i) reads source (2j,2i) — floor(j*src/dst) with "
    "an exact factor of 2), and the per-class pixel counts of the "
    "result are emitted. The oracle computes the resized rectangle "
    "extents in closed form: dest rows hitting [y0, y0+h) are "
    "ceil(y0/2) .. floor((y0+h-1)/2), an exact integer count — so "
    "decode, the index map, and the count must all be right for the "
    "hash to match. The resize member of the multimodal kernel "
    "family (decode/phash/mask ops); frame-sampling for video uses "
    "the same index-map shape on the time axis. Map-only Arrow "
    "kernel, zero shuffle",
)
def mm_resize_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.session import widen

    docs = widen(
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id")
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from jigsaw_spark.multimodal.png_codec import decode_png, encode_png

        for pdf in batches:
            out = {"image_id": [], "height": [], "width": [],
                   "car_px": [], "ped_px": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                # the k6 synthesis geometry (queries_mm.k6_deeplab_export)
                arr = np.zeros((24, 32, 3), dtype=np.uint8)
                x0, y0 = 1 + i % 11, 1 + i % 5
                arr[y0 : y0 + 3 + i % 3, x0 : x0 + 3 + i % 3] = (64, 0, 128)
                x1, y1 = 17 + i % 9, 12 + i % 7
                arr[y1 : y1 + 3 + i % 2, x1 : x1 + 3 + i % 4] = (0, 64, 64)
                dec = decode_png(encode_png(arr))  # real codec roundtrip
                small = dec[::2, ::2]  # NN with exact factor 2
                car = int(
                    np.count_nonzero(
                        (small == (64, 0, 128)).all(axis=2)
                    )
                )
                ped = int(
                    np.count_nonzero((small == (0, 64, 64)).all(axis=2))
                )
                out["image_id"].append(str(i))
                out["height"].append(small.shape[0])
                out["width"].append(small.shape[1])
                out["car_px"].append(car)
                out["ped_px"].append(ped)
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kernel,
        "image_id string, height bigint, width bigint, "
        "car_px bigint, ped_px bigint",
    )
