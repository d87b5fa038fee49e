"""Round-9 batch 2: calibration diagnostics, link prediction, fuzzy
entity matching, and network-address analytics.

- ``ml_reliability_ece``: the reliability diagram + Expected
  Calibration Error over the synthetic min-max score model shared with
  ``ml_brier_log_loss`` — 10 confidence-decile bins, each reporting
  mean confidence vs observed accuracy, plus the global ECE. Brier
  answers "how wrong", ECE answers "can you trust the probabilities" —
  the standard pre-deployment calibration gate. Exact: ECE's
  per-bin |avg_conf - acc| * n_b terms share the common denominator
  1e6 * n, so ece_micro = sum_b |sum_p_micro - 1e6*pos_b| div n is
  pure integer arithmetic — no float ever appears.
- ``graph_adamic_adar``: Adamic-Adar link prediction over the near-dup
  keeper graph (the graph_modularity edge set): for every non-adjacent
  two-hop pair, score = sum over common neighbors v of 1/ln(deg v) —
  the classic "friends you should know" / related-docs-you-haven't-
  linked signal. Per-neighbor weights are pre-rounded to integer
  nano-units (identical integer ln args on both engines — the r8
  exactness pattern), so the sum is exact at any scale.
- ``er_fuzzy_match``: blocked fuzzy entity matching over part names —
  blocking key = (brand, first name token), candidate pairs within a
  block scored by Levenshtein distance, matches at distance <= 3 with
  an integer milli similarity. The ER workhorse: blocking turns the
  quadratic all-pairs into bounded block-local comparisons, exactly
  the recall/cost tradeoff production ER systems tune.
- ``fn_ip_cidr``: IPv4 synthesis -> dotted-quad formatting -> parse
  round-trip -> CIDR rollup: per /16 network, address counts, distinct
  hosts, distinct /24 subnets, and the aton min/max — the network-log
  analytics member of the scalar-function family (addresses derived
  from the md5 stream so both engines see identical traffic).

Scale notes (100 TB): ECE is one fact-scan hash-agg into 10 bins (the
global window runs over those 10 bounded rows only); Adamic-Adar's
two-hop join is frontier-sized on the keeper graph (bounded by near-dup
density, not corpus size) and the edge list is localCheckpoint'ed once
so degree/two-hop/anti-join all reuse it; fuzzy matching shuffles on
the blocking key once — per-block pair counts are capped by block size,
the tuning knob every ER deployment exposes; the CIDR rollup is a
two-level hash-agg on the /16 prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ml_reliability_ece
# ---------------------------------------------------------------------------

_ECE_SQL = """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    t AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi,
             CAST(count(*) AS BIGINT) AS n
      FROM s),
    p AS (
      SELECT y,
             CASE WHEN (SELECT hi - lo FROM t) = 0 THEN 500000
                  ELSE (cents - (SELECT lo FROM t)) * 1000000
                       // (SELECT hi - lo FROM t) END AS p_micro
      FROM s),
    b AS (
      SELECT least(p_micro // 100000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(p_micro) AS BIGINT) AS sum_p_micro,
             CAST(sum(y) AS BIGINT) AS pos
      FROM p GROUP BY 1)
    SELECT CAST(bin AS INT) AS bin, n_b, sum_p_micro, pos,
           CAST(sum_p_micro // n_b AS BIGINT) AS conf_micro,
           CAST(pos * 1000000 // n_b AS BIGINT) AS acc_micro,
           CAST(abs(sum_p_micro - 1000000 * pos) AS BIGINT) AS gap_abs,
           CAST(sum(abs(sum_p_micro - 1000000 * pos)) OVER ()
                // (SELECT n FROM t) AS BIGINT) AS ece_micro
    FROM b
"""


@register(
    "ml_reliability_ece",
    _ECE_SQL,
    "reliability diagram + Expected Calibration Error over the "
    "min-max score model shared with ml_brier_log_loss: 10 "
    "confidence-decile bins each reporting mean predicted confidence "
    "vs observed accuracy, plus the global ECE — Brier answers 'how "
    "wrong', ECE answers 'can the probabilities be trusted', the "
    "standard pre-deployment calibration gate. EXACT: the per-bin "
    "|avg_conf - acc| * n_b terms share the common denominator "
    "1e6 * n, so ece_micro = sum_b |sum_p_micro - 1e6*pos_b| div n "
    "is pure integer arithmetic end-to-end. Shape: one fact-scan "
    "hash-agg into <= 10 bins; the unpartitioned window runs over "
    "those 10 bounded rows only (bin count is a constant of the "
    "metric, not of the data)",
)
def ml_reliability_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    t = s.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    p = s.crossJoin(F.broadcast(t)).select(
        "y",
        "n",
        F.expr(
            "CASE WHEN hi - lo = 0 THEN 500000"
            " ELSE (cents - lo) * 1000000 div (hi - lo) END"
        ).alias("p_micro"),
    )
    b = p.groupBy(
        F.least(F.expr("p_micro div 100000"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("p_micro").cast("bigint").alias("sum_p_micro"),
        F.sum("y").cast("bigint").alias("pos"),
        F.first("n").alias("n"),
    )
    w = Window.partitionBy()
    return b.select(
        F.col("bin").cast("int").alias("bin"),
        "n_b",
        "sum_p_micro",
        "pos",
        F.expr("CAST(sum_p_micro div n_b AS BIGINT)").alias("conf_micro"),
        F.expr("CAST(pos * 1000000 div n_b AS BIGINT)").alias("acc_micro"),
        F.abs(F.col("sum_p_micro") - 1000000 * F.col("pos"))
        .cast("bigint")
        .alias("gap_abs"),
        F.sum(F.abs(F.col("sum_p_micro") - 1000000 * F.col("pos")))
        .over(w)
        .cast("bigint")
        .alias("_gap_total"),
        F.col("n"),
    ).select(
        "bin",
        "n_b",
        "sum_p_micro",
        "pos",
        "conf_micro",
        "acc_micro",
        "gap_abs",
        F.expr("CAST(_gap_total div n AS BIGINT)").alias("ece_micro"),
    )


# ---------------------------------------------------------------------------
# graph_adamic_adar
# ---------------------------------------------------------------------------


def _adamic_adar_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _SIMHASH_KEEPER_CTE

    return f"""
    WITH {_SIMHASH_KEEPER_CTE},
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM prs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM prs),
    wt AS MATERIALIZED (
      -- deg-1 nodes can never be a common neighbor of a distinct pair
      -- (being one implies degree >= 2); filter BEFORE dividing so
      -- ln(1) = 0 never reaches the division on either engine
      SELECT u,
             CAST(round(1000000000.0
               / ln(CAST(count(*) AS DOUBLE)), 0) AS BIGINT) AS w_nano
      FROM edges GROUP BY u HAVING count(*) >= 2),
    twohop AS (
      SELECT e1.u AS a, e2.v AS b, e1.v AS mid
      FROM edges e1 JOIN edges e2 ON e1.v = e2.u AND e1.u < e2.v),
    cand AS (
      SELECT t.a, t.b, t.mid
      FROM twohop t LEFT JOIN edges e ON e.u = t.a AND e.v = t.b
      WHERE e.u IS NULL)
    SELECT cand.a AS doc_a, cand.b AS doc_b,
           CAST(count(*) AS BIGINT) AS n_common,
           CAST(sum(wt.w_nano) AS BIGINT) AS aa_nano
    FROM cand JOIN wt ON wt.u = cand.mid
    GROUP BY 1, 2
"""


@register(
    "graph_adamic_adar",
    _adamic_adar_sql(),
    "Adamic-Adar link prediction over the near-dup keeper graph "
    "(SimHash hamming <= 2 over exact-dedup keepers — the "
    "graph_modularity edge set): every NON-adjacent two-hop pair "
    "scored by sum over common neighbors v of 1/ln(deg v) — rare "
    "shared neighbors say more than hubs, the classic 'docs that "
    "should be linked' / related-items signal feeding candidate "
    "generation. Any common neighbor of a distinct pair has degree "
    ">= 2 by construction, so ln is never zero. EXACT: per-neighbor "
    "weights pre-rounded to integer nano-units (identical integer ln "
    "args on both engines), summed as integers. Shape: the edge list "
    "is derived once and localCheckpoint'ed (degree, both two-hop "
    "sides, and the adjacency anti-join all reuse it — the "
    "graph_random_walk lesson); the two-hop join is frontier-sized on "
    "the keeper graph, bounded by near-dup density, never corpus "
    "all-pairs",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(
            pairs.select(
                F.col("doc_b").alias("u"), F.col("doc_a").alias("v")
            )
        )
        .localCheckpoint()
    )
    # deg-1 nodes can never be a common neighbor of a distinct pair;
    # filter BEFORE the division so ln(1) = 0 never reaches it (ANSI
    # mode evaluates eagerly even for rows a later join would drop)
    wt = (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .filter(F.col("deg") >= 2)
        .select(
            "u",
            F.round(
                F.lit(1000000000.0) / F.log(F.col("deg").cast("double")), 0
            )
            .cast("bigint")
            .alias("w_nano"),
        )
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("mid"))
    e2 = edges.select(F.col("u").alias("mid2"), F.col("v").alias("b"))
    twohop = e1.join(e2, F.col("mid") == F.col("mid2")).filter(
        F.col("a") < F.col("b")
    )
    adj = edges.select(F.col("u").alias("ea"), F.col("v").alias("eb"))
    cand = twohop.join(
        adj,
        (F.col("a") == F.col("ea")) & (F.col("b") == F.col("eb")),
        "left_anti",
    )
    return (
        cand.join(wt, cand["mid"] == wt["u"])
        .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("w_nano").cast("bigint").alias("aa_nano"),
        )
    )


# ---------------------------------------------------------------------------
# er_fuzzy_match
# ---------------------------------------------------------------------------

_FUZZY_SQL = """
    WITH keepers AS (
      -- C4 discipline: exact-identity dedup BEFORE pair enumeration.
      -- Identical (brand, name) rows are the same entity trivially —
      -- the exact-match stage of an ER pipeline resolves them with a
      -- hash-agg; only DISTINCT names reach the quadratic fuzzy stage
      SELECT min(p_partkey) AS p_partkey, p_brand, p_name,
             split_part(p_name, ' ', 1) AS tok1
      FROM part GROUP BY p_brand, p_name)
    SELECT a.p_brand,
           a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
           CAST((greatest(length(a.p_name), length(b.p_name))
                 - levenshtein(a.p_name, b.p_name)) * 1000
                // greatest(length(a.p_name), length(b.p_name))
             AS BIGINT) AS sim_milli
    FROM keepers a JOIN keepers b
      ON a.p_brand = b.p_brand AND a.tok1 = b.tok1
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


@register(
    "er_fuzzy_match",
    _FUZZY_SQL,
    "blocked fuzzy entity matching over part names, C4-ORDERED: exact "
    "(brand, name) identities collapse to a min-key keeper in a "
    "hash-agg FIRST (the exact-match stage of every ER pipeline — and "
    "the discipline that keeps duplication free at scale), then only "
    "DISTINCT names reach the quadratic stage: blocking key = (brand, "
    "first name token), candidate pairs within a block scored by "
    "Levenshtein, matched at distance <= 3 with an integer milli "
    "similarity — the ER workhorse that feeds er_survivorship's merge "
    "step. Blocking is THE scale decision: it turns corpus all-pairs "
    "into block-local comparisons whose cost is sum of block-size^2 — "
    "the recall/cost knob er_blocking_stats measures (pairs differing "
    "in their first token are deliberately out of this key's scope). "
    "Shape: one dedup hash-agg, one shuffle on the blocking key, "
    "per-block pair enumeration, JVM-codegen levenshtein — no UDF",
)
def er_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    blocked = part.groupBy("p_brand", "p_name").agg(
        F.min("p_partkey").alias("p_partkey")
    ).select(
        "p_partkey",
        "p_brand",
        "p_name",
        F.expr("split_part(p_name, ' ', 1)").alias("tok1"),
    )
    a = blocked.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_name").alias("name_a"),
        F.col("tok1").alias("tok1_a"),
    )
    b = blocked.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("name_b"),
        F.col("tok1").alias("tok1_b"),
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    maxlen = F.greatest(F.length("name_a"), F.length("name_b"))
    return (
        a.join(
            b,
            (F.col("brand_a") == F.col("brand_b"))
            & (F.col("tok1_a") == F.col("tok1_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .filter(lev <= 3)
        .select(
            F.col("brand_a").alias("p_brand"),
            "key_a",
            "key_b",
            "name_a",
            "name_b",
            lev.cast("bigint").alias("lev"),
            F.expr(
                "CAST((greatest(length(name_a), length(name_b))"
                " - levenshtein(name_a, name_b)) * 1000"
                " div greatest(length(name_a), length(name_b))"
                " AS BIGINT)"
            ).alias("sim_milli"),
        )
    )


# ---------------------------------------------------------------------------
# fn_ip_cidr
# ---------------------------------------------------------------------------

_IP_SQL = """
    WITH h AS (
      SELECT c_custkey,
             CAST(CAST(('0x' || substr(md5('ip|'
               || CAST(c_custkey AS VARCHAR)), 1, 12)) AS UBIGINT)
               AS BIGINT) AS hv
      FROM customer),
    ips AS (
      SELECT c_custkey,
             '10.' || CAST(hv % 16 AS VARCHAR)
                   || '.' || CAST((hv // 256) % 256 AS VARCHAR)
                   || '.' || CAST((hv // 65536) % 256 AS VARCHAR) AS ip
      FROM h),
    parsed AS (
      SELECT c_custkey, ip,
             CAST(split_part(ip, '.', 1) AS BIGINT) AS o1,
             CAST(split_part(ip, '.', 2) AS BIGINT) AS o2,
             CAST(split_part(ip, '.', 3) AS BIGINT) AS o3,
             CAST(split_part(ip, '.', 4) AS BIGINT) AS o4
      FROM ips),
    aton AS (
      SELECT c_custkey, ip, o2, o3,
             ((o1 * 256 + o2) * 256 + o3) * 256 + o4 AS addr
      FROM parsed)
    SELECT '10.' || CAST(o2 AS VARCHAR) || '.0.0/16' AS cidr16,
           CAST(count(*) AS BIGINT) AS n_ips,
           CAST(count(DISTINCT addr) AS BIGINT) AS n_uniq,
           CAST(count(DISTINCT o3) AS BIGINT) AS n_subnets24,
           CAST(min(addr) AS BIGINT) AS min_aton,
           CAST(max(addr) AS BIGINT) AS max_aton
    FROM aton GROUP BY 1
"""


@register(
    "fn_ip_cidr",
    _IP_SQL,
    "network-address analytics: synthesize an IPv4 per customer from "
    "the md5 stream (identical traffic on both engines — the universal "
    "sampler discipline), format the dotted quad, PARSE it back via "
    "split_part, convert to the 32-bit integer form (inet_aton), and "
    "roll up per /16 network: address count, distinct hosts, distinct "
    "/24 subnets, aton min/max — the scalar-function family member "
    "for network-log pipelines (fn_url_parse's sibling). The parse "
    "round-trip is the point: string -> octets -> integer must be "
    "lossless and engine-identical. Shape: map-only synthesis + one "
    "two-level hash-agg on the /16 prefix (16 groups); count(DISTINCT) "
    "expands to the standard two-phase partial agg",
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    h = cust.select(
        "c_custkey",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("ip|"), F.col("c_custkey").cast("string"))
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("hv"),
    )
    ips = h.select(
        "c_custkey",
        F.concat(
            F.lit("10."),
            (F.col("hv") % 16).cast("string"),
            F.lit("."),
            F.expr("(hv div 256) % 256").cast("string"),
            F.lit("."),
            F.expr("(hv div 65536) % 256").cast("string"),
        ).alias("ip"),
    )
    parsed = ips.select(
        "c_custkey",
        "ip",
        F.expr("CAST(split_part(ip, '.', 1) AS BIGINT)").alias("o1"),
        F.expr("CAST(split_part(ip, '.', 2) AS BIGINT)").alias("o2"),
        F.expr("CAST(split_part(ip, '.', 3) AS BIGINT)").alias("o3"),
        F.expr("CAST(split_part(ip, '.', 4) AS BIGINT)").alias("o4"),
    )
    aton = parsed.select(
        "o2",
        "o3",
        (
            ((F.col("o1") * 256 + F.col("o2")) * 256 + F.col("o3")) * 256
            + F.col("o4")
        ).alias("addr"),
    )
    return aton.groupBy(
        F.concat(
            F.lit("10."), F.col("o2").cast("string"), F.lit(".0.0/16")
        ).alias("cidr16")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ips"),
        F.countDistinct("addr").cast("bigint").alias("n_uniq"),
        F.countDistinct("o3").cast("bigint").alias("n_subnets24"),
        F.min("addr").cast("bigint").alias("min_aton"),
        F.max("addr").cast("bigint").alias("max_aton"),
    )
