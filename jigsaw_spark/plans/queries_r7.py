"""Round-5 operators: evaluation, governance, and layout primitives a
production curation/analytics deployment reaches for next —

- ``ml_auc_exact``: exact ROC AUC from the group-by-score contingency
  form (no global rank over the corpus — the prefix walk runs on the
  distinct-score AGGREGATE), rank-sum/Mann-Whitney semantics with the
  standard half-credit for ties, all in exact integer arithmetic.
- ``ml_best_split``: exact best binary split of a numeric feature
  (decision-stump / tree-node finder) by weighted Gini impurity over
  the distinct-value aggregate — the inner loop of any distributed
  tree learner.
- ``privacy_ldiversity``: l-diversity audit per quasi-identifier group
  — the companion check to ``privacy_kanon_release`` (k bounds group
  size, l bounds sensitive-value diversity inside the group).
- ``dq_benford``: Benford first-significant-digit conformance with
  per-digit chi-square contributions — the classic fraud/corruption
  screen for value columns; digits extracted via exact integer cents,
  never libm log10 of the value.
- ``graph_two_hop``: friends-of-friends counts (distinct 2-hop
  neighborhood size, direct neighbors and self excluded) over the
  near-dup candidate graph.
- ``j8_bloom_prune``: explicit Bloom-filter semi-join pruning — the
  runtime-filter pattern Spark's InjectRuntimeFilter applies to
  shuffle joins, built by hand because ``bloom_filter_agg`` is not in
  the public function registry: k seeded xxhash64 positions per build
  key (engine-internal by construction — the exact semi-join after the
  prune kills false positives for ANY hash family), a KB bitmap
  collected once and shipped as a literal array, a MAP-ONLY bit-test
  prune on the probe side, then the exact semi-join (so results are
  exact and the oracle is the plain semi-join).

Float discipline: every statistic derives from exact integer counts or
exact decimal sums through one shared expression shape, rounded once on
both engines; libm enters only via the per-digit Benford expectation
(snapped to micro-units per DIGIT, 9 values, never per row).

Reference parity: extends the evaluation/quality surface around the
reference's dataset builder (jigsaw/dataset.py) the same way the r3/r4
batches did; no reference analog exists for these — they are the
north-star additions the build mandate lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, dec2, register

# ---------------------------------------------------------------------------
# ml_auc_exact
# ---------------------------------------------------------------------------

_AUC_SQL = """
    WITH s AS (
      SELECT n_chars AS score,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS c0
      FROM documents GROUP BY n_chars),
    p AS (
      SELECT c1, c0,
             coalesce(sum(c0) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS c0_below
      FROM s),
    t AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n_pos,
             CAST(sum(c0) AS BIGINT) AS n_neg,
             sum(CAST(2 * c0_below * c1 + c0 * c1 AS DECIMAL(38,0)))
               AS num
      FROM p)
    SELECT n_pos, n_neg,
           round(CAST(num AS DOUBLE)
                 / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)),
                 6) AS auc
    FROM t
"""


@register(
    "ml_auc_exact",
    _AUC_SQL,
    "exact ROC AUC (Mann-Whitney with half-credit ties) of score "
    "n_chars against label lang='en' — computed on the GROUP-BY-SCORE "
    "contingency table, so the only ordered walk is a prefix sum over "
    "the distinct-score aggregate (bounded by the value domain, never "
    "the corpus): corpus -> ONE hash agg -> |scores|-row window -> ONE "
    "final agg; numerator carried in decimal(38,0) so 1e9-row classes "
    "cannot wrap int64",
)
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy(F.col("n_chars").alias("score")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("c0"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    p = s.select(
        "c1",
        "c0",
        F.coalesce(F.sum("c0").over(w), F.lit(0)).alias("c0_below"),
    )
    t = p.agg(
        F.sum("c1").cast("bigint").alias("n_pos"),
        F.sum("c0").cast("bigint").alias("n_neg"),
        F.sum(
            (2 * F.col("c0_below") * F.col("c1") + F.col("c0") * F.col("c1"))
            .cast("decimal(38,0)")
        ).alias("num"),
    )
    return t.select(
        "n_pos",
        "n_neg",
        F.round(
            F.col("num").cast("double")
            / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# ml_best_split
# ---------------------------------------------------------------------------

_SPLIT_SQL = """
    WITH v AS (
      SELECT p_size AS x,
             sum(CASE WHEN p_retailprice > 1500 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN p_retailprice > 1500 THEN 0 ELSE 1 END) AS c0
      FROM part GROUP BY p_size),
    pre AS (
      SELECT x,
             sum(c1) OVER (ORDER BY x) AS l1,
             sum(c0) OVER (ORDER BY x) AS l0,
             sum(c1) OVER () AS t1,
             sum(c0) OVER () AS t0
      FROM v),
    cand AS (
      SELECT x AS threshold, l0, l1, (t0 - l0) AS r0, (t1 - l1) AS r1,
             round(round(
               (CAST((l0 + l1) * (l0 + l1) - l0 * l0 - l1 * l1 AS DOUBLE)
                  / (l0 + l1)
                + CAST((t0 - l0 + t1 - l1) * (t0 - l0 + t1 - l1)
                       - (t0 - l0) * (t0 - l0) - (t1 - l1) * (t1 - l1)
                       AS DOUBLE)
                  / (t0 - l0 + t1 - l1))
               / (t0 + t1), 9), 6) AS gini
      FROM pre
      WHERE (t0 - l0) + (t1 - l1) > 0),
    best AS (
      SELECT threshold, gini,
             CAST(l0 AS BIGINT) AS left_neg, CAST(l1 AS BIGINT) AS left_pos,
             CAST(r0 AS BIGINT) AS right_neg, CAST(r1 AS BIGINT) AS right_pos,
             row_number() OVER (ORDER BY gini, threshold) AS rn
      FROM cand)
    SELECT CAST(threshold AS INT) AS threshold, gini,
           left_neg, left_pos, right_neg, right_pos
    FROM best WHERE rn = 1
"""


@register(
    "ml_best_split",
    _SPLIT_SQL,
    "exact best binary split (decision stump): weighted Gini impurity "
    "of 'p_size <= t' against label p_retailprice>1500, evaluated for "
    "every candidate threshold via prefix sums over the DISTINCT-VALUE "
    "aggregate (|domain| rows, never the fact table) — the inner loop "
    "of a distributed tree learner. Impurity computed from exact "
    "integer counts through one shared expression, double-round "
    "snapped (9 then 6) so the argmin is engine-stable; ties break on "
    "the smaller threshold",
)
def ml_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    v = part.groupBy(F.col("p_size").alias("x")).agg(
        F.sum(F.when(F.col("p_retailprice") > 1500, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("p_retailprice") > 1500, 0).otherwise(1)).alias("c0"),
    )
    wo = Window.orderBy("x")
    wt = Window.partitionBy()
    pre = v.select(
        "x",
        F.sum("c1").over(wo).alias("l1"),
        F.sum("c0").over(wo).alias("l0"),
        F.sum("c1").over(wt).alias("t1"),
        F.sum("c0").over(wt).alias("t0"),
    )
    l0, l1 = F.col("l0"), F.col("l1")
    r0, r1 = F.col("t0") - l0, F.col("t1") - l1
    gini = F.round(
        F.round(
            (
                ((l0 + l1) * (l0 + l1) - l0 * l0 - l1 * l1).cast("double")
                / (l0 + l1)
                + ((r0 + r1) * (r0 + r1) - r0 * r0 - r1 * r1).cast("double")
                / (r0 + r1)
            )
            / (F.col("t0") + F.col("t1")),
            9,
        ),
        6,
    )
    cand = pre.filter(r0 + r1 > 0).select(
        F.col("x").alias("threshold"),
        l0.alias("l0"),
        l1.alias("l1"),
        r0.alias("r0"),
        r1.alias("r1"),
        gini.alias("gini"),
    )
    best = cand.withColumn(
        "rn", F.row_number().over(Window.orderBy("gini", "threshold"))
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("threshold").cast("int").alias("threshold"),
        "gini",
        F.col("l0").cast("bigint").alias("left_neg"),
        F.col("l1").cast("bigint").alias("left_pos"),
        F.col("r0").cast("bigint").alias("right_neg"),
        F.col("r1").cast("bigint").alias("right_pos"),
    )


# ---------------------------------------------------------------------------
# privacy_ldiversity
# ---------------------------------------------------------------------------

_LDIV_SQL = """
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_n,
           CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                AS BIGINT) AS l,
           count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 3
             AS diverse
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
"""


@register(
    "privacy_ldiversity",
    _LDIV_SQL,
    "l-diversity audit (Machanavajjhala et al.): per quasi-identifier "
    "group (nation, segment), the count of DISTINCT sensitive values "
    "(acctbal kilo-bucket) and the l>=3 release flag — the companion "
    "gate to privacy_kanon_release (k bounds re-identification, l "
    "bounds attribute disclosure). ONE hash agg with a distinct "
    "sub-agg; exact integers end-to-end",
)
def privacy_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_n"),
        F.count_distinct(sens).cast("bigint").alias("l"),
        (F.count_distinct(sens) >= 3).alias("diverse"),
    )


# ---------------------------------------------------------------------------
# dq_benford
# ---------------------------------------------------------------------------

_BENFORD_SQL = """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0),
    obs AS (SELECT digit, count(*) AS n_d FROM d GROUP BY digit),
    tot AS (SELECT sum(n_d) AS n FROM obs),
    exp AS (
      SELECT unnest(range(1, 10)) AS digit),
    j AS (
      SELECT e.digit,
             coalesce(o.n_d, 0) AS observed,
             CAST(round(log10(1.0 + 1.0 / e.digit) * 1e6) AS BIGINT)
               AS p_micro,
             t.n
      FROM exp e LEFT JOIN obs o ON e.digit = o.digit CROSS JOIN tot t)
    SELECT digit, CAST(observed AS BIGINT) AS observed,
           round(n * p_micro / 1e6, 4) AS expected,
           round(round(
             (observed - n * p_micro / 1e6) * (observed - n * p_micro / 1e6)
             / (n * p_micro / 1e6), 9), 6) AS chi2_term
    FROM j ORDER BY digit
"""


@register(
    "dq_benford",
    _BENFORD_SQL,
    "Benford's-law first-significant-digit screen on order amounts "
    "(the classic fabricated-data detector): digit extracted from the "
    "EXACT integer cents (never libm log10 of the value), per-digit "
    "chi-square contribution against p_d = log10(1+1/d) snapped to "
    "micro-units per DIGIT (9 libm calls total, identical both "
    "engines). Corpus -> ONE hash agg; everything after runs on 9 rows",
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        1,
        1,
    ).cast("int")
    obs = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_d"))
    )
    tot = obs.agg(F.sum("n_d").alias("n"))
    exp = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    p_micro = F.round(F.log10(1.0 + 1.0 / F.col("digit")) * 1e6).cast("bigint")
    j = (
        exp.join(obs, "digit", "left_outer")
        .select(
            "digit",
            F.coalesce("n_d", F.lit(0)).alias("observed"),
            p_micro.alias("p_micro"),
        )
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("n") * F.col("p_micro") / 1e6
    return j.select(
        "digit",
        F.col("observed").cast("bigint").alias("observed"),
        F.round(e, 4).alias("expected"),
        F.round(
            F.round((F.col("observed") - e) * (F.col("observed") - e) / e, 9), 6
        ).alias("chi2_term"),
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# graph_two_hop — shared LSH candidate graph (same CTE text the pagerank
# oracle uses, kept in sync with operators/dedup.minhash_lsh_pairs)
# ---------------------------------------------------------------------------


def _lsh_edges_cte() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    toks AS (
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
    edges AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b AS src, a AS dst FROM pairs)"""


_TWO_HOP_SQL = f"""
    WITH {_lsh_edges_cte()},
    two AS (
      SELECT DISTINCT e1.src AS node, e2.dst AS hop2
      FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
      WHERE e2.dst <> e1.src),
    fof AS (
      SELECT t.node, t.hop2 FROM two t
      LEFT JOIN edges d ON t.node = d.src AND t.hop2 = d.dst
      WHERE d.src IS NULL)
    SELECT node, CAST(count(*) AS BIGINT) AS n_two_hop
    FROM fof GROUP BY node
"""


@register(
    "graph_two_hop",
    _TWO_HOP_SQL,
    "friends-of-friends: distinct 2-hop neighborhood size per node "
    "(self and direct neighbors excluded) over the MinHash-LSH "
    "candidate graph — the transitive-exposure metric for dedup "
    "cluster growth. ONE edge self-join keyed on the shared node + "
    "anti-join against direct edges; both shuffles on node keys, "
    "candidate edges bounded by the capped LSH banding",
)
def graph_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).distinct()
    e2 = edges.select(
        F.col("src").alias("mid"), F.col("dst").alias("hop2")
    )
    two = (
        edges.join(e2, edges["dst"] == e2["mid"])
        .filter(F.col("hop2") != F.col("src"))
        .select("src", "hop2")
        .distinct()
    )
    fof = two.join(
        edges.select(F.col("src").alias("d_src"), F.col("dst").alias("d_dst")),
        (two["src"] == F.col("d_src")) & (two["hop2"] == F.col("d_dst")),
        "left_anti",
    )
    return fof.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_two_hop")
    )


# ---------------------------------------------------------------------------
# j8_bloom_prune
# ---------------------------------------------------------------------------

_BLOOM_M = 8192  # bits
_BLOOM_K = 3  # hash functions


_BLOOM_SQL = """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(3,2))
                             - CAST(l_discount AS DECIMAL(3,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_acctbal > 9000
    GROUP BY n_name
"""


@register(
    "j8_bloom_prune",
    _BLOOM_SQL,
    "Bloom-filter semi-join pruning (the runtime-filter pattern "
    "InjectRuntimeFilter applies to shuffle joins, built explicitly "
    "because bloom_filter_agg is not in the public registry): k=3 "
    "seeded xxhash64 positions per build-side key (suppliers with "
    "acctbal>9000; the hash family is engine-internal — the exact "
    "semi-join after the prune kills false positives), "
    "the m=8192-bit bitmap collected ONCE as KB driver metadata and "
    "shipped as a literal long[128] array, probe side pruned by a "
    "MAP-ONLY 3-bit test BEFORE the shuffle, then the exact semi-join "
    "kills false positives — the oracle is the plain join, proving "
    "prune transparency. At 100 TB the bit test drops most of the "
    "fact scan before any exchange",
)
def j8_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    nation = _t(spark, sf_dir, "nation")

    def positions(key):
        # k seeded xxhash64 positions: the hash family is Spark-internal
        # — the exact join below kills false positives, so results are
        # unchanged by construction for ANY family — and xxhash64 is a
        # codegen'd long-to-long hash, ~10× cheaper per probe-side row
        # than the md5+hex-conv form it replaces (r13; guide §4.1
        # "built-ins first"). Probe cost is what matters: this runs on
        # every fact row BEFORE the exchange.
        return [
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(_BLOOM_M))
            for i in range(_BLOOM_K)
        ]

    # build: distinct bit positions of the (filtered) build side — a few
    # hundred rows collected as KB driver metadata, like a codebook
    pos_rows = (
        sup.select(
            F.explode(F.array(*positions(F.col("s_suppkey")))).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (_BLOOM_M // 64)
    for r in pos_rows:
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed int64 literals
    lits = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    arr_sql = "array(" + ",".join(f"{w}L" for w in lits) + ")"

    # map-only prune: forall over the row's k positions, each a word
    # lookup + shift in the literal bitmap (shiftright needs column
    # shift amounts, so the test lives in a SQL lambda)
    pruned = (
        li.withColumn("_bp", F.array(*positions(F.col("l_suppkey"))))
        .filter(
            F.expr(
                f"forall(_bp, p -> (shiftright(element_at({arr_sql},"
                " cast(p / 64 as int) + 1), cast(p % 64 as int))"
                " & 1) = 1)"
            )
        )
        .drop("_bp")
    )

    from jigsaw_spark.plans.queries import rev_col

    joined = (
        pruned.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            pruned["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.sum(rev_col()), 2).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# ts_decompose_ma
# ---------------------------------------------------------------------------

_DECOMP_SQL = """
    WITH daily AS (
      SELECT event_type,
             strftime(ts, '%Y-%m-%d') AS day,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2, 3),
    tr AS (
      SELECT event_type, day, day_id, cents,
             sum(cents) OVER w AS t7,
             count(*) OVER w AS n7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day_id
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
      SELECT event_type, day, day_id, cents,
             t7, 7 * cents - t7 AS d7,
             CAST(extract(dow FROM CAST(day AS DATE)) AS INT) AS dow
      FROM tr WHERE n7 = 7),
    seas AS (
      SELECT event_type, dow,
             sum(d7) AS sd7, count(*) AS nd
      FROM det GROUP BY 1, 2)
    SELECT d.event_type, d.day,
           round(d.cents / 100.0, 2) AS value,
           round(d.t7 / 700.0, 4) AS trend,
           round(s.sd7 / (700.0 * s.nd), 4) AS seasonal,
           round(round(d.cents / 100.0, 2) - round(d.t7 / 700.0, 4)
                 - round(s.sd7 / (700.0 * s.nd), 4), 4) AS residual
    FROM det d JOIN seas s ON d.event_type = s.event_type AND d.dow = s.dow
"""


@register(
    "ts_decompose_ma",
    _DECOMP_SQL,
    "classical seasonal decomposition (trend = centered 7-day moving "
    "average, seasonal = day-of-week mean of the detrended series, "
    "residual = remainder) per event type — the moving-average STL "
    "ancestor every monitoring stack ships. All intermediate state is "
    "exact integer cents (detrended series scaled x7 so it stays "
    "integer); the corpus collapses to the per-(type,day) aggregate in "
    "ONE hash agg, every window after runs partitioned by type on the "
    "bounded day dim",
)
def ts_decompose_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias(
            "day_id"
        ),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_id")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(w).alias("t7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    ).filter(F.col("n7") == 7)
    det = tr.withColumn("d7", 7 * F.col("cents") - F.col("t7")).withColumn(
        "dow", (F.dayofweek(F.to_date("day")) - 1).cast("int")
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.sum("d7").alias("sd7"), F.count(F.lit(1)).alias("nd")
    )
    value = F.round(F.col("cents") / 100.0, 2)
    trend = F.round(F.col("t7") / 700.0, 4)
    seasonal = F.round(F.col("sd7") / (700.0 * F.col("nd")), 4)
    return det.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        "day",
        value.alias("value"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        F.round(value - trend - seasonal, 4).alias("residual"),
    )


# ---------------------------------------------------------------------------
# ts_lttb_fixed
# ---------------------------------------------------------------------------

_LTTB_K = 50

_LTTB_SQL = f"""
    WITH pts0 AS (
      SELECT event_id, ts, epoch_us(ts) AS xa,
             CAST(round(value * 100, 0) AS BIGINT) AS y
      FROM events WHERE event_type = 'click'),
    bounds AS (SELECT min(xa) AS x0, max(xa) AS x1 FROM pts0),
    bk AS (
      SELECT p.event_id, p.ts, (p.xa - b.x0) // 1000000 AS x, p.y,
             CAST(((p.xa - b.x0) * {_LTTB_K}) // (b.x1 - b.x0 + 1) AS BIGINT)
               AS bucket
      FROM pts0 p CROSS JOIN bounds b),
    st AS (
      SELECT bucket, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy
      FROM bk GROUP BY bucket),
    anchors AS (
      SELECT bucket,
             lag(sx)  OVER (ORDER BY bucket)
               // lag(n)  OVER (ORDER BY bucket) AS px,
             lag(sy)  OVER (ORDER BY bucket)
               // lag(n)  OVER (ORDER BY bucket) AS py,
             lead(sx) OVER (ORDER BY bucket)
               // lead(n) OVER (ORDER BY bucket) AS nx,
             lead(sy) OVER (ORDER BY bucket)
               // lead(n) OVER (ORDER BY bucket) AS ny
      FROM st),
    scored AS (
      SELECT b.bucket, b.event_id, b.ts, b.y,
             CASE
               WHEN a.px IS NULL OR a.nx IS NULL THEN NULL
               ELSE CAST(abs((a.px - a.nx) * (b.y - a.py)
                             - (a.px - b.x) * (a.ny - a.py)) AS BIGINT)
             END AS area2,
             row_number() OVER (
               PARTITION BY b.bucket
               ORDER BY
                 CASE WHEN a.px IS NULL THEN b.x
                      WHEN a.nx IS NULL THEN -b.x
                      ELSE NULL END ASC NULLS LAST,
                 CASE WHEN a.px IS NOT NULL AND a.nx IS NOT NULL
                      THEN abs((a.px - a.nx) * (b.y - a.py)
                               - (a.px - b.x) * (a.ny - a.py))
                      ELSE NULL END DESC NULLS LAST,
                 b.ts, b.event_id) AS rn
      FROM bk b JOIN anchors a ON b.bucket = a.bucket)
    SELECT CAST(bucket AS INT) AS bucket, event_id,
           CAST(ts AS TIMESTAMP) AS ts,
           round(y / 100.0, 2) AS value, area2
    FROM scored WHERE rn = 1
"""


@register(
    "ts_lttb_fixed",
    _LTTB_SQL,
    "LTTB downsampling (largest-triangle-three-buckets, fixed-anchor "
    "variant: anchors are the NEIGHBOR-BUCKET mean points instead of "
    "the previously selected point, which removes the sequential "
    "dependency and makes the pick per bucket independent = fully "
    "parallel): 50 time-range buckets, per bucket the point with the "
    "max triangle area vs the neighbor anchors survives (first/last "
    "bucket keep the first/last point, per the LTTB contract). Anchor "
    "means are QUANTIZED to integer (second, cent) coordinates via "
    "floor division, so the doubled triangle area is an EXACT int64 "
    "bounded by the value domain (~1e12), not the corpus size — no "
    "float enters the selection; ties break on (ts, event_id). "
    "Corpus -> ONE hash agg for bucket stats (50 rows), "
    "anchors via lag/lead on that dim, ONE broadcast join back, ONE "
    "partitioned top-1 window — the dashboard-downsample shape that "
    "holds at any scale",
)
def ts_lttb_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    pts = ev.select(
        "event_id",
        "ts",
        F.unix_micros("ts").alias("xa"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
    )
    bounds = pts.agg(F.min("xa").alias("x0"), F.max("xa").alias("x1"))
    # x re-based to micros-since-start: per-bucket sums then stay below
    # 2^53, where int->double conversion is exact on every engine (the
    # absolute-epoch form diverged: DuckDB's HUGEINT sum rounds to
    # double differently above 2^53). Areas are translation-invariant,
    # so the re-base changes nothing semantically. Bucket assignment is
    # INTEGER division on both sides (double-divide-then-cast can flip
    # a boundary row).
    bk = pts.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "ts",
        F.expr("(xa - x0) div 1000000").alias("x"),
        "y",
        F.expr(
            f"((xa - x0) * {_LTTB_K}) div (x1 - x0 + 1)"
        ).alias("bucket"),
    )
    st = bk.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    wo = Window.orderBy("bucket")
    # anchors quantized by floor division (all sums non-negative, so
    # Spark's truncating `div` == DuckDB's flooring `//`)
    anchors = st.select(
        "bucket",
        F.expr("lag(sx) over (order by bucket) div lag(n) over (order by bucket)").alias("px"),
        F.expr("lag(sy) over (order by bucket) div lag(n) over (order by bucket)").alias("py"),
        F.expr("lead(sx) over (order by bucket) div lead(n) over (order by bucket)").alias("nx"),
        F.expr("lead(sy) over (order by bucket) div lead(n) over (order by bucket)").alias("ny"),
    )
    j = bk.join(F.broadcast(anchors), "bucket")
    area_raw = F.abs(
        (F.col("px") - F.col("nx")) * (F.col("y") - F.col("py"))
        - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
    )
    area = F.when(
        F.col("px").isNull() | F.col("nx").isNull(), F.lit(None)
    ).otherwise(area_raw.cast("bigint"))
    first_key = F.when(F.col("px").isNull(), F.col("x")).when(
        F.col("nx").isNull(), -F.col("x")
    )
    wsel = Window.partitionBy("bucket").orderBy(
        first_key.asc_nulls_last(),
        F.when(
            F.col("px").isNotNull() & F.col("nx").isNotNull(), area_raw
        ).desc_nulls_last(),
        "ts",
        "event_id",
    )
    scored = j.select(
        "bucket",
        "event_id",
        "ts",
        "y",
        area.alias("area2"),
        F.row_number().over(wsel).alias("rn"),
    )
    return scored.filter(F.col("rn") == 1).select(
        F.col("bucket").cast("int").alias("bucket"),
        "event_id",
        "ts",
        F.round(F.col("y") / 100.0, 2).alias("value"),
        "area2",
    )


# ---------------------------------------------------------------------------
# text_kneser_ney — fit on even doc_ids, score odd doc_ids
# ---------------------------------------------------------------------------

_KN_SQL_HEAD = None  # built below with tokens_sql


def _kn_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
    fit_bg AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) ii
      WHERE doc_id % 2 = 0 AND len(t) >= 2),
    big AS MATERIALIZED (
      SELECT w1, w2, count(*) AS c12 FROM fit_bg GROUP BY w1, w2),
    w1s AS MATERIALIZED (
      SELECT w1, sum(c12) AS c1, count(*) AS n1p FROM big GROUP BY w1),
    w2c AS MATERIALIZED (
      SELECT w2, count(*) AS nd FROM big GROUP BY w2),
    tot AS MATERIALIZED (
      SELECT (SELECT count(*) FROM big) AS tt,
             (SELECT count(DISTINCT w1) FROM (
                SELECT w1 FROM big UNION ALL SELECT w2 FROM big) u(w1))
               AS v),
    sc_bg AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) ii
      WHERE doc_id % 2 = 1 AND len(t) >= 2),
    scored AS (
      SELECT s.doc_id,
             CAST(round(ln(
               CASE WHEN w1s.c1 IS NULL
                 THEN (coalesce(w2c.nd, 0) + 1.0) / (tot.tt + tot.v)
                 ELSE greatest(4 * coalesce(big.c12, 0) - 3, 0)
                        / (4.0 * w1s.c1)
                      + (3.0 * w1s.n1p) / (4.0 * w1s.c1)
                        * ((coalesce(w2c.nd, 0) + 1.0) / (tot.tt + tot.v))
               END) * 1e6) AS BIGINT) AS lp_micro
      FROM sc_bg s
      LEFT JOIN big ON s.w1 = big.w1 AND s.w2 = big.w2
      LEFT JOIN w1s ON s.w1 = w1s.w1
      LEFT JOIN w2c ON s.w2 = w2c.w2
      CROSS JOIN tot)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(lp_micro) AS BIGINT) AS logp_micro,
           round(CAST(sum(lp_micro) AS DOUBLE) / count(*) / 1e6, 6)
             AS avg_logp
    FROM scored GROUP BY doc_id
    """


@register(
    "text_kneser_ney",
    _kn_sql(),
    "Kneser-Ney smoothed bigram LM (d=3/4, the published discount; "
    "+1-smoothed continuation so every probability is positive): FIT "
    "on even docs, SCORE odd docs — P(w2|w1) = max(c12-d,0)/c1 + "
    "d*N1+(w1,.)/c1 * Pcont(w2), Pcont = (N1+(.,w2)+1)/(T+V); unseen "
    "history backs off to Pcont alone. The discount is the exact "
    "rational 3/4 (4*c12-3 integer clamp), so P is one shared double "
    "expression from exact integer counts; ln snaps to micro-units "
    "per BIGRAM (the DSIR per-bucket discipline), per-doc scores are "
    "exact integer sums. Shape: gram explode -> three hash joins "
    "keyed on w1/(w1,w2)/w2 against vocabulary-bounded stat dims + "
    "one 1-row totals broadcast — linear at any corpus scale",
)
def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_expr("text").alias("t")).filter(
        F.size("t") >= 2
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i - 1] AS w1, t[i] AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    fit = bigrams.filter(F.col("doc_id") % 2 == 0)
    big = fit.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    w1s = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    w2c = big.groupBy("w2").agg(F.count(F.lit(1)).alias("nd"))
    tot = big.agg(F.count(F.lit(1)).alias("tt")).crossJoin(
        big.select("w1")
        .union(big.select("w2"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("v"))
    )
    sc = bigrams.filter(F.col("doc_id") % 2 == 1)
    pcont = (F.coalesce("nd", F.lit(0)) + 1.0) / (F.col("tt") + F.col("v"))
    p = F.when(
        F.col("c1").isNull(), pcont
    ).otherwise(
        F.greatest(4 * F.coalesce("c12", F.lit(0)) - 3, F.lit(0))
        / (4.0 * F.col("c1"))
        + (3.0 * F.col("n1p")) / (4.0 * F.col("c1")) * pcont
    )
    scored = (
        sc.join(big, ["w1", "w2"], "left_outer")
        .join(w1s, "w1", "left_outer")
        .join(w2c, "w2", "left_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(p) * 1e6).cast("bigint").alias("lp_micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("lp_micro").cast("bigint").alias("logp_micro"),
        F.round(
            F.sum("lp_micro").cast("double") / F.count(F.lit(1)) / 1e6, 6
        ).alias("avg_logp"),
    )


# ---------------------------------------------------------------------------
# stream_cdc_upsert
# ---------------------------------------------------------------------------

_CDC_SQL = """
    WITH r AS (
      SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id,
           CAST(ts AS TIMESTAMP) AS last_ts,
           event_id AS last_event_id,
           event_type AS last_type,
           round(value, 2) AS last_value
    FROM r WHERE rn = 1
"""


@register(
    "stream_cdc_upsert",
    _CDC_SQL,
    "CDC compaction / streaming upsert: a change stream keyed on "
    "user_id collapses to last-write-wins current state (the "
    "Delta-MERGE-from-CDC pattern) — the streaming agg is ONE "
    "max(struct(ts, event_id, payload...)) per key, whose lexicographic "
    "order IS the (version, tie-break) order, so state per key is one "
    "struct regardless of change volume; complete-mode AvailableNow "
    "drain equals the batch row_number()=1 formulation the oracle runs",
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_event_stream

    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    latest = stream.groupBy("user_id").agg(
        F.max(
            F.struct("ts", "event_id", "event_type", "value")
        ).alias("last")
    )
    out = latest.select(
        "user_id",
        F.col("last.ts").alias("last_ts"),
        F.col("last.event_id").alias("last_event_id"),
        F.col("last.event_type").alias("last_type"),
        F.round(F.col("last.value"), 2).alias("last_value"),
    )
    name = f"stream_cdc_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            out.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# ml_nbayes_classify — fit on even doc_ids, classify odd doc_ids
# ---------------------------------------------------------------------------

_NB_B = 4096


def _nb_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH toks AS (
      SELECT doc_id, CAST(lang = 'en' AS INT) AS is_en,
             {tokens_sql('text')} AS t
      FROM documents),
    grams AS (
      SELECT doc_id, is_en, unnest(t) AS gram FROM toks
      UNION ALL
      SELECT doc_id, is_en, t[i] || ' ' || t[i+1] AS gram
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) ii
      WHERE len(t) >= 2),
    bucketed AS (
      SELECT doc_id, is_en,
             ('0x' || substr(md5(gram), 1, 12))::UBIGINT % {_NB_B} AS bucket
      FROM grams),
    fit AS MATERIALIZED (
      SELECT bucket,
             sum(CASE WHEN is_en = 1 THEN 1 ELSE 0 END) AS ce,
             sum(CASE WHEN is_en = 1 THEN 0 ELSE 1 END) AS co
      FROM bucketed WHERE doc_id % 2 = 0 GROUP BY bucket),
    tot AS MATERIALIZED (
      SELECT sum(ce) AS te, sum(co) AS tco,
             (SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              FROM documents WHERE doc_id % 2 = 0) AS ne,
             (SELECT sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
              FROM documents WHERE doc_id % 2 = 0) AS no
      FROM fit),
    llr AS MATERIALIZED (
      SELECT f.bucket,
             CAST(round((ln((f.ce + 1.0) / (t.te + {_NB_B}))
                       - ln((f.co + 1.0) / (t.tco + {_NB_B}))) * 1e6)
                  AS BIGINT) AS llr_micro
      FROM fit f CROSS JOIN tot t),
    sc AS (
      SELECT doc_id, bucket FROM bucketed WHERE doc_id % 2 = 1),
    per_doc AS (
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(coalesce(l.llr_micro, 0)) AS BIGINT) AS feat_micro
      FROM sc s LEFT JOIN llr l ON s.bucket = l.bucket
      GROUP BY s.doc_id)
    SELECT p.doc_id, p.n_grams,
           CAST(p.feat_micro
                + CAST(round((ln(t.ne + 1.0) - ln(t.no + 1.0)) * 1e6)
                       AS BIGINT) AS BIGINT) AS score_micro,
           CASE WHEN p.feat_micro
                     + CAST(round((ln(t.ne + 1.0) - ln(t.no + 1.0)) * 1e6)
                            AS BIGINT) > 0
                THEN 'en' ELSE 'other' END AS pred
    FROM per_doc p CROSS JOIN tot t
    """


@register(
    "ml_nbayes_classify",
    _nb_sql(),
    "multinomial Naive Bayes (the classic quality/domain classifier "
    "for data curation): FIT class-conditional hashed-gram likelihoods "
    "+ priors on even docs, CLASSIFY odd docs by log-likelihood-ratio "
    "sign. Per-bucket LLR and the prior snap to integer micro-units "
    "(one libm pair per BUCKET / one for the prior — the DSIR "
    "discipline), so per-doc scores are exact integer sums and the "
    "argmax is an integer sign test. Shape: ONE gram explode + hash "
    "agg to fit the 4096-row dim, broadcast-joined back — no second "
    "corpus scan, linear at any scale; OOV buckets contribute 0",
)
def ml_nbayes_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.samples import dsir_gram_buckets

    docs = _t(spark, sf_dir, "documents")
    # materialized ONCE: the fit half and the scoring half both consume
    # the gram-bucket explode, and their different downstream keys mean
    # no exchange is shared — uncheckpointed, the full explode ran twice
    # (r13; the rows are narrow (doc_id, bucket, is_en) ints, so the
    # checkpoint is cheap relative to a second corpus tokenize+explode)
    buckets = dsir_gram_buckets(docs, "doc_id", buckets=_NB_B).join(
        docs.select(
            "doc_id", (F.col("lang") == "en").cast("int").alias("is_en")
        ),
        "doc_id",
    ).localCheckpoint()
    fit = buckets.filter(F.col("doc_id") % 2 == 0).groupBy("bucket").agg(
        F.sum(F.when(F.col("is_en") == 1, 1).otherwise(0)).alias("ce"),
        F.sum(F.when(F.col("is_en") == 1, 0).otherwise(1)).alias("co"),
    )
    priors = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ne"),
            F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("no"),
        )
    )
    tot = fit.agg(
        F.sum("ce").alias("te"), F.sum("co").alias("tco")
    ).crossJoin(priors)
    llr = fit.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            (
                F.log((F.col("ce") + 1.0) / (F.col("te") + _NB_B))
                - F.log((F.col("co") + 1.0) / (F.col("tco") + _NB_B))
            )
            * 1e6
        )
        .cast("bigint")
        .alias("llr_micro"),
    )
    per_doc = (
        buckets.filter(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(llr), "bucket", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce("llr_micro", F.lit(0)))
            .cast("bigint")
            .alias("feat_micro"),
        )
    )
    prior_micro = (
        F.round((F.log(F.col("ne") + 1.0) - F.log(F.col("no") + 1.0)) * 1e6)
        .cast("bigint")
    )
    return per_doc.crossJoin(F.broadcast(priors)).select(
        "doc_id",
        "n_grams",
        (F.col("feat_micro") + prior_micro).cast("bigint").alias("score_micro"),
        F.when(F.col("feat_micro") + prior_micro > 0, "en")
        .otherwise("other")
        .alias("pred"),
    )


# ---------------------------------------------------------------------------
# ts_holt_exact
# ---------------------------------------------------------------------------

# truncated-toward-zero halving — Spark div and duckdb 1.0 integer //
# both truncate toward zero (verified r9; Python // floors), so the CASE
# guard is an explicit spelling kept for engine-version robustness — the
# tdiv discipline from the exact-iterative quartet (see operators/ml._tdiv)
_TDIV2 = "(CASE WHEN {x} >= 0 THEN ({x}) // 2 ELSE -((-({x})) // 2) END)"

_HOLT_SQL = f"""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT event_type,
             strftime(ts, '%Y-%m-%d') AS day,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY strftime(ts, '%Y-%m-%d')) AS i,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS y
      FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
    h AS (
      SELECT event_type, i, day, y, y AS l, CAST(0 AS BIGINT) AS b
      FROM daily WHERE i = 1
      UNION ALL
      SELECT d.event_type, d.i, d.day, d.y,
             {_TDIV2.format(x='d.y + h.l + h.b')} AS l,
             {_TDIV2.format(
                 x=_TDIV2.format(x='d.y + h.l + h.b') + ' - h.l + h.b'
             )} AS b
      FROM h JOIN daily d
        ON d.event_type = h.event_type AND d.i = h.i + 1)
    SELECT event_type, day,
           CAST(y AS BIGINT) AS value_cents,
           CAST(l AS BIGINT) AS level_cents,
           CAST(b AS BIGINT) AS trend_cents,
           CAST(l + b AS BIGINT) AS forecast_cents
    FROM h
"""


@register(
    "ts_holt_exact",
    _HOLT_SQL,
    "Holt double exponential smoothing (alpha=beta=1/2) per event type "
    "with the WHOLE trajectory in exact integer cents: l_t = "
    "tdiv(y_t + l + b, 2), b_t = tdiv(l_t - l + b, 2), forecast = l+b "
    "— truncated division keeps every state integer, so the recursion "
    "is bit-identical across engines/partitionings. The Spark side is "
    "the per-group SEQUENTIAL-RECURSION pattern: ONE hash agg to the "
    "per-(type,day) series, then applyInPandas runs the recursion per "
    "type in Python ints (group state = one (l,b) pair; series length "
    "is bounded by the calendar, not the corpus); the oracle replays "
    "it as a recursive CTE — the first stateful Arrow kernel in the "
    "repo with an EXACT SQL oracle",
)
def ts_holt_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("y")
    )

    def holt(pdf):
        import pandas as pd

        def tdiv2(x: int) -> int:
            return x // 2 if x >= 0 else -((-x) // 2)

        pdf = pdf.sort_values("day")
        out = []
        l = b = 0
        first = True
        for r in pdf.itertuples(index=False):
            y = int(r.y)  # Python ints: no wrap at any magnitude
            if first:
                l, b, first = y, 0, False
            else:
                nl = tdiv2(y + l + b)
                b = tdiv2(nl - l + b)
                l = nl
            out.append((r.event_type, r.day, y, l, b, l + b))
        return pd.DataFrame(
            out,
            columns=[
                "event_type",
                "day",
                "value_cents",
                "level_cents",
                "trend_cents",
                "forecast_cents",
            ],
        )

    return daily.groupBy("event_type").applyInPandas(
        holt,
        "event_type string, day string, value_cents long, "
        "level_cents long, trend_cents long, forecast_cents long",
    )
