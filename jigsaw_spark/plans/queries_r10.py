"""Round-5 batch 4: graph analytics over the dedup candidate graph,
market-basket co-occurrence, autocorrelation, and systematic sampling —

- ``graph_triangles``: per-node triangle counts over the MinHash-LSH
  candidate graph — the clustering-coefficient numerator, the standard
  "is this dedup cluster a clique or a chain?" diagnostic.
- ``graph_neighbor_jaccard``: neighbor-set Jaccard for every candidate
  pair — the classic link-prediction / edge-confirmation score that
  separates true duplicate clusters (shared neighborhoods) from
  accidental LSH collisions (disjoint neighborhoods).
- ``rel_item_cooccurrence``: market-basket pair counts with lift — the
  association-mining co-occurrence matrix (basket = order, item =
  part), the input to item-item recommenders.
- ``ts_autocorr``: lag-1..3 autocorrelation of the per-type daily
  series, with the quantized-anchor integer geometry (mean snapped to
  an integer via floor division) so numerator and denominator are
  exact integer sums.
- ``p_systematic_sample``: deterministic 1-in-7 systematic sample per
  stratum (md5-keyed order, partitioned window) — the QA-draw
  companion to the exact-N and Bernoulli samplers.

Float discipline: the only doubles are final ratios of exact integer
sums through one shared round-snapped expression (``ts_autocorr``);
everything else is integer end-to-end (floor-division micro-units).

Reference parity: extends the candidate-graph diagnostics the
reference's dedup tooling implies (jigsaw has no graph module; these
are north-star additions for training-data curation at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.functions.hashing import md5_key, md5_key_sql
from jigsaw_spark.plans.queries import _t, register
from jigsaw_spark.plans.queries_r7 import _lsh_edges_cte

# ---------------------------------------------------------------------------
# graph_triangles
# ---------------------------------------------------------------------------

_TRI_SQL = f"""
    WITH {_lsh_edges_cte()},
    tri AS (
      SELECT p1.a AS a, p1.b AS b, p2.b AS c
      FROM pairs p1
      JOIN pairs p2 ON p2.a = p1.b
      JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b),
    verts AS (SELECT unnest([a, b, c]) AS node FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS n_tri
    FROM verts GROUP BY node
"""


@register(
    "graph_triangles",
    _TRI_SQL,
    "per-node triangle counts over the MinHash-LSH candidate graph — "
    "the clustering-coefficient numerator that tells a dedup cluster "
    "apart from a chain of borderline collisions. Enumeration uses the "
    "CANONICAL orientation (a<b<c on the deduped pair list), so each "
    "triangle is built exactly once from two pair-joins keyed on the "
    "shared vertex; per-node counts come from one explode of the 3 "
    "corners + hash agg. At scale the orientation bounds the join "
    "fan-out by per-node candidate degree (LSH band caps), the "
    "standard compact-forward scheme; all integer",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    p = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    ab_bc = (
        p.alias("p1")
        .join(p.alias("p2"), F.col("p1.b") == F.col("p2.a"))
        .select(
            F.col("p1.a").alias("a"),
            F.col("p1.b").alias("b"),
            F.col("p2.b").alias("c"),
        )
    )
    p3 = p.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = ab_bc.join(
        p3,
        (ab_bc["a"] == p3["ta"]) & (ab_bc["c"] == p3["tc"]),
        "left_semi",
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )


# ---------------------------------------------------------------------------
# graph_neighbor_jaccard
# ---------------------------------------------------------------------------

_NJ_SQL = f"""
    WITH {_lsh_edges_cte()},
    deg AS MATERIALIZED (
      SELECT src, count(*) AS d FROM edges GROUP BY src),
    com AS MATERIALIZED (
      SELECT p.a, p.b, count(*) AS c
      FROM pairs p
      JOIN edges ea ON ea.src = p.a
      JOIN edges eb ON eb.src = p.b AND eb.dst = ea.dst
      GROUP BY p.a, p.b)
    SELECT p.a AS doc_a, p.b AS doc_b,
           CAST(coalesce(c.c, 0) AS BIGINT) AS n_common,
           CAST(da.d AS BIGINT) AS deg_a,
           CAST(db.d AS BIGINT) AS deg_b,
           CAST((1000000 * coalesce(c.c, 0))
                // (da.d + db.d - coalesce(c.c, 0)) AS BIGINT)
             AS jaccard_micro
    FROM pairs p
    JOIN deg da ON da.src = p.a
    JOIN deg db ON db.src = p.b
    LEFT JOIN com c ON c.a = p.a AND c.b = p.b
"""


@register(
    "graph_neighbor_jaccard",
    _NJ_SQL,
    "neighbor-set Jaccard for every LSH candidate pair — the link-"
    "prediction score that confirms dedup edges: true duplicate "
    "clusters share neighborhoods, accidental collisions don't. "
    "Common-neighbor counting is ANCHORED on the candidate pair list "
    "(never an all-pairs neighborhood cross), expanded through two "
    "node-keyed edge joins bounded by candidate degree; degrees are "
    "one hash agg broadcast back. Jaccard is the exact integer "
    "floor-division micro-unit 1e6*|common| div (da+db-|common|) — "
    "denominator >= 1 because every pair is itself an edge",
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ea = edges.select(F.col("src").alias("a"), F.col("dst").alias("na"))
    eb = edges.select(F.col("src").alias("bb"), F.col("dst").alias("nb"))
    com = (
        pairs.join(ea, "a")
        .join(
            eb,
            (F.col("b") == F.col("bb")) & (F.col("na") == F.col("nb")),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = (
        pairs.join(
            deg.select(F.col("src").alias("a"), F.col("d").alias("deg_a")), "a"
        )
        .join(
            deg.select(F.col("src").alias("b"), F.col("d").alias("deg_b")), "b"
        )
        .join(com, ["a", "b"], "left_outer")
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("n_common"),
            F.col("deg_a").cast("bigint").alias("deg_a"),
            F.col("deg_b").cast("bigint").alias("deg_b"),
            F.expr(
                "CAST((1000000 * coalesce(c, 0))"
                " div (deg_a + deg_b - coalesce(c, 0)) AS BIGINT)"
            ).alias("jaccard_micro"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# rel_item_cooccurrence
# ---------------------------------------------------------------------------

_COOC_SQL = """
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n AS (SELECT count(DISTINCT ok) AS n_baskets FROM b),
    ic AS MATERIALIZED (
      SELECT pk, count(*) AS c FROM b GROUP BY pk),
    pc AS (
      SELECT b1.pk AS p1, b2.pk AS p2, count(*) AS c12
      FROM b b1 JOIN b b2 ON b1.ok = b2.ok AND b1.pk < b2.pk
      GROUP BY b1.pk, b2.pk)
    SELECT pc.p1, pc.p2,
           CAST(pc.c12 AS BIGINT) AS c12,
           CAST(i1.c AS BIGINT) AS c1,
           CAST(i2.c AS BIGINT) AS c2,
           CAST((CAST(pc.c12 AS BIGINT) * n.n_baskets * 1000000)
                // (i1.c * i2.c) AS BIGINT) AS lift_micro
    FROM pc
    JOIN ic i1 ON i1.pk = pc.p1
    JOIN ic i2 ON i2.pk = pc.p2
    CROSS JOIN n
    WHERE pc.c12 >= 2
"""


@register(
    "rel_item_cooccurrence",
    _COOC_SQL,
    "market-basket co-occurrence with lift (basket = order, item = "
    "part): pair counts from ONE basket self-join keyed on the order "
    "(per-basket fan-out is C(items,2), bounded by basket size — never "
    "an item-item cross), item supports from one hash agg, lift as the "
    "exact integer floor-division micro-unit c12*N*1e6 div (c1*c2). "
    "The min-support gate (c12 >= 2) is applied post-agg, the standard "
    "a-priori prune point; the basket-count scalar is a 1-row "
    "broadcast. This is the item-item recommender / association-rule "
    "input matrix",
)
def rel_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n = b.agg(F.countDistinct("ok").alias("n_baskets"))
    ic = b.groupBy("pk").agg(F.count(F.lit(1)).alias("c"))
    b2 = b.select(F.col("ok"), F.col("pk").alias("pk2"))
    pc = (
        b.join(b2, "ok")
        .filter(F.col("pk") < F.col("pk2"))
        .groupBy(F.col("pk").alias("p1"), F.col("pk2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= 2)
    )
    return (
        pc.join(
            F.broadcast(ic.select(F.col("pk").alias("p1"), F.col("c").alias("c1"))),
            "p1",
        )
        .join(
            F.broadcast(ic.select(F.col("pk").alias("p2"), F.col("c").alias("c2"))),
            "p2",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            F.col("c12").cast("bigint").alias("c12"),
            F.col("c1").cast("bigint").alias("c1"),
            F.col("c2").cast("bigint").alias("c2"),
            F.expr(
                "CAST((CAST(c12 AS BIGINT) * n_baskets * 1000000)"
                " div (c1 * c2) AS BIGINT)"
            ).alias("lift_micro"),
        )
    )


# ---------------------------------------------------------------------------
# ts_autocorr
# ---------------------------------------------------------------------------

_ACF_SQL = """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id,
             CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                  // 100 AS BIGINT) AS yd
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(yd) AS BIGINT) // count(*) AS mq
      FROM daily GROUP BY 1),
    d AS (
      SELECT daily.event_type, day_id, yd - mq AS dv
      FROM daily JOIN m USING (event_type)),
    lagged AS MATERIALIZED (
      SELECT event_type, dv,
             lag(dv, 1) OVER w AS d1,
             lag(dv, 2) OVER w AS d2,
             lag(dv, 3) OVER w AS d3
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day_id)),
    den AS (
      SELECT event_type, CAST(sum(dv * dv) AS BIGINT) AS sdd
      FROM lagged GROUP BY 1),
    nums AS (
      SELECT event_type, 1 AS k, CAST(coalesce(sum(dv * d1), 0) AS BIGINT)
               AS num, CAST(count(d1) AS BIGINT) AS n_pairs
      FROM lagged GROUP BY 1
      UNION ALL
      SELECT event_type, 2, CAST(coalesce(sum(dv * d2), 0) AS BIGINT),
             CAST(count(d2) AS BIGINT)
      FROM lagged GROUP BY 1
      UNION ALL
      SELECT event_type, 3, CAST(coalesce(sum(dv * d3), 0) AS BIGINT),
             CAST(count(d3) AS BIGINT)
      FROM lagged GROUP BY 1)
    SELECT n.event_type, CAST(n.k AS INT) AS k, n.n_pairs,
           CASE WHEN n.n_pairs > 0 AND den.sdd > 0
                THEN round(round(CAST(n.num AS DOUBLE) / den.sdd, 9), 6)
                ELSE CAST(0.0 AS DOUBLE) END AS acf
    FROM nums n JOIN den USING (event_type)
"""


@register(
    "ts_autocorr",
    _ACF_SQL,
    "lag-1..3 autocorrelation of the per-type daily total series — the "
    "seasonality/momentum screen run before any forecasting model. "
    "Exactness via the QUANTIZED-ANCHOR discipline: the series mean is "
    "snapped to an integer with floor division, deviations are exact "
    "integers, and numerator (sum dv*lag(dv,k)) and denominator (sum "
    "dv^2) are exact integer sums — daily totals are quantized to "
    "whole dollars so dv^2 sums stay below 2^53 through ~sf100 (the "
    "HUGEINT->double 1-ulp zone). The one double is the final ratio, "
    "one shared round-snapped expression; constant series (sdd=0) "
    "emit 0. All windows partition on event_type over the calendar-"
    "bounded day dim",
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias(
            "day_id"
        ),
    ).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)"
            " div 100 AS BIGINT)"
        ).alias("yd")
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(yd) AS BIGINT) div count(*)").alias("mq"),
    )
    d = daily.join(F.broadcast(m), "event_type").select(
        "event_type", "day_id", (F.col("yd") - F.col("mq")).alias("dv")
    )
    w = Window.partitionBy("event_type").orderBy("day_id")
    lagged = d.select(
        "event_type",
        "dv",
        F.lag("dv", 1).over(w).alias("d1"),
        F.lag("dv", 2).over(w).alias("d2"),
        F.lag("dv", 3).over(w).alias("d3"),
    )
    den = lagged.groupBy("event_type").agg(
        F.sum(F.col("dv") * F.col("dv")).cast("bigint").alias("sdd")
    )
    parts = []
    for k in (1, 2, 3):
        dk = F.col(f"d{k}")
        parts.append(
            lagged.groupBy("event_type").agg(
                F.lit(k).cast("int").alias("k"),
                F.coalesce(F.sum(F.col("dv") * dk), F.lit(0))
                .cast("bigint")
                .alias("num"),
                F.count(dk).cast("bigint").alias("n_pairs"),
            )
        )
    nums = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return nums.join(F.broadcast(den), "event_type").select(
        "event_type",
        "k",
        "n_pairs",
        F.when(
            (F.col("n_pairs") > 0) & (F.col("sdd") > 0),
            F.round(
                F.round(F.col("num").cast("double") / F.col("sdd"), 9), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("acf"),
    )


# ---------------------------------------------------------------------------
# p_systematic_sample
# ---------------------------------------------------------------------------

_SYS_SQL = f"""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {md5_key_sql(['doc_id'], seed='syssamp')}, doc_id)
               AS rn
      FROM documents)
    SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(rn AS BIGINT) AS rn
    FROM r WHERE (rn - 1) % 7 = 0
"""


@register(
    "p_systematic_sample",
    _SYS_SQL,
    "deterministic 1-in-7 systematic sample per stratum: rows ordered "
    "by the md5 key stream (seed 'syssamp', doc_id tiebreaker) within "
    "each source, every 7th row kept — the QA-draw / eval-holdout "
    "sampler whose rate is EXACT per stratum (ceil(n/7), vs the "
    "Bernoulli sampler's binomial jitter) and whose membership is "
    "reproducible on any cluster. The window partitions on source, so "
    "no global total order exists at scale",
)
def p_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        md5_key(F.col("doc_id"), seed="syssamp"), "doc_id"
    )
    return (
        docs.select(
            "source",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter((F.col("rn") - 1) % 7 == 0)
    )
