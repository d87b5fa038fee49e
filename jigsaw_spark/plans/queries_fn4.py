"""Statistics aggregates, math/bitwise scalar suite, cogrouped-pandas
operator, and iterative k-means training.

- `agg_stats_suite`: the bivariate statistics family (corr / covar /
  regr_*) — single hash aggregate, all six statistics share one pass.
- `fn_math_bitwise`: transcendental + bitwise scalar surface, pinned
  against DuckDB (xor spells differently; semantics identical).
- `cogroup_fill_ratio`: `applyInPandas` over COGROUPED frames — the API
  surface for per-key merges too custom for a join (here verified against
  the equivalent join+agg SQL so the kernel itself is oracle-checked).
- `ml_kmeans`: Lloyd-trained IVF codebook (operators/similarity.kmeans_
  lloyd) — iterative, not SQL-expressible; rows-only driver check plus a
  numpy-parity unit test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, dec2, dsum, register


@register(
    "agg_stats_suite",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)        AS r,
           round(covar_pop(l_quantity, l_extendedprice), 4)   AS cov_p,
           round(covar_samp(l_quantity, l_extendedprice), 4)  AS cov_s,
           round(regr_slope(l_extendedprice, l_quantity), 4)  AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
           round(regr_r2(l_extendedprice, l_quantity), 6)     AS r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "bivariate statistics suite: corr/covar_pop/covar_samp/regr_slope/"
    "regr_intercept/regr_r2 fused into one hash aggregate (one shuffle, "
    "map-side partials for every moment)",
)
def agg_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr(q, p), 6).alias("r"),
            F.round(F.covar_pop(q, p), 4).alias("cov_p"),
            F.round(F.covar_samp(q, p), 4).alias("cov_s"),
            F.round(F.regr_slope(p, q), 4).alias("slope"),
            F.round(F.regr_intercept(p, q), 4).alias("icept"),
            F.round(F.regr_r2(p, q), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "fn_math_bitwise",
    """
    SELECT o_orderkey,
           o_orderkey & 255                   AS low_bits,
           o_orderkey | 4096                  AS with_flag,
           xor(o_orderkey, 21845)             AS xored,
           o_orderkey << 2                    AS shifted_l,
           o_orderkey >> 3                    AS shifted_r,
           round(exp(o_totalprice / 500000.0), 6)  AS e_scaled,
           round(pow(o_totalprice, 0.5), 4)   AS sqrt_price,
           round(log10(o_totalprice + 1.0), 6) AS log10_price,
           round(log2(CAST(o_orderkey + 2 AS DOUBLE)), 6) AS log2_key,
           CAST(sign(o_totalprice - 100000.0) AS INT) AS above_100k,
           CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_kbin,
           abs(o_custkey - 750)               AS dist_mid
    FROM orders
    """,
    "math + bitwise scalar surface: &,|,xor,shifts and exp/pow/log10/"
    "log2/sign/floor/abs — whole-stage-codegen projection, zero shuffle",
)
def fn_math_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    key, price = F.col("o_orderkey"), F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        key.bitwiseAND(F.lit(255)).alias("low_bits"),
        key.bitwiseOR(F.lit(4096)).alias("with_flag"),
        key.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(key, 2).alias("shifted_l"),
        F.shiftright(key, 3).alias("shifted_r"),
        F.round(F.exp(price / 500000.0), 6).alias("e_scaled"),
        F.round(F.pow(price, 0.5), 4).alias("sqrt_price"),
        F.round(F.log10(price + 1.0), 6).alias("log10_price"),
        F.round(F.log2((key + 2).cast("double")), 6).alias("log2_key"),
        # int cast on both sides: Spark signum is DOUBLE (-1.0) but DuckDB
        # sign is INT (-1) — full-precision canon renders them differently
        F.signum(price - 100000.0).cast("int").alias("above_100k"),
        F.floor(price / 1000.0).cast("bigint").alias("price_kbin"),
        F.abs(F.col("o_custkey") - 750).alias("dist_mid"),
    )


@register(
    "cogroup_fill_ratio",
    """
    SELECT o.o_orderkey,
           count(l.l_orderkey) AS n_lines,
           round(coalesce(sum(l.l_extendedprice * (1 - l.l_discount)), 0.0)
                 / max(o.o_totalprice), 6) AS fill_ratio
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 200 = 0
    GROUP BY o.o_orderkey
    """,
    "applyInPandas over COGROUPED frames: per-order custom merge of the "
    "orders and lineitem groups in one Arrow-batched kernel — the API "
    "surface for per-key logic a join can't express; this instance is "
    "deliberately join-expressible so the kernel is oracle-verified",
)
def cogroup_fill_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 200 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    # prune the fact side BEFORE the cogroup: the %200 predicate is cheap on
    # lineitem directly (same arithmetic), so only surviving groups reach
    # the Python kernel. Without this, every lineitem group pays an Arrow
    # batch + kernel call just to emit nothing — per-key pandas overhead is
    # the cost model here, so cogroup keys must be pre-pruned at scale.
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 200 == 0)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )

    def merge(o: pd.DataFrame, l: pd.DataFrame) -> pd.DataFrame:
        if o.empty:  # lineitem group with no surviving order row
            return pd.DataFrame(
                columns=["o_orderkey", "n_lines", "fill_ratio"]
            ).astype({"o_orderkey": "int64", "n_lines": "int64", "fill_ratio": "float64"})
        rev = float((l["l_extendedprice"] * (1.0 - l["l_discount"])).sum())
        return pd.DataFrame(
            {
                "o_orderkey": [int(o["o_orderkey"].iloc[0])],
                "n_lines": [int(len(l))],
                "fill_ratio": [round(rev / float(o["o_totalprice"].iloc[0]), 6)],
            }
        )

    return (
        orders.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            merge, "o_orderkey long, n_lines long, fill_ratio double"
        )
    )


# DEREGISTERED (r6, verdict #6): float-centroid twin of the driver-green
# `ml_kmeans_exact` (integer-quantized Lloyd, exact DuckDB oracle). The
# float demo could only ever produce a permanent `no_oracle` err row in
# the correctness gate, and the capability it exercises (kmeans_lloyd,
# operators/similarity.py) is covered by the exact variant + unit tests.
# Kept as a library entry point for API callers.
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.vectors import l2_norm
    from jigsaw_spark.operators.similarity import kmeans_lloyd

    emb = _t(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans_lloyd(emb, k=8, iters=3)
    cent_df = spark.createDataFrame(
        [(c, v) for c, v in centroids], "cell long, centroid array<double>"
    )
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    return (
        sizes.join(cent_df, "cell")
        .select("cell", "n", F.round(l2_norm("centroid"), 6).alias("c_norm"))
        .orderBy("cell")
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus) AS g_status,
           grouping(o_orderpriority) AS g_priority,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    "arbitrary GROUPING SETS (beyond rollup/cube) with grouping() markers "
    "— one Expand + one hash aggregate, each set shares the same shuffle",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    o = os.path.join(sf_dir, "orders.parquet")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        FROM parquet.`{o}`
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
        """
    )


@register(
    "ts_locf",
    """
    SELECT event_id, user_id,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_locf
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
          FROM events)
    """,
    "last-observation-carried-forward: ignore-nulls last_value over an "
    "explicit running frame — the sensor/telemetry gap-fill pattern; one "
    "shuffle on the partition key",
)
def ts_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last(v, ignorenulls=True).over(w), 4).alias("v_locf"),
    )


@register(
    "agg_bool_suite",
    """
    SELECT l_returnflag,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
           bool_and(l_quantity >= 1)         AS all_positive,
           bool_or(l_tax > 0.07)             AS any_high_tax,
           CAST(count(*) - count_if(l_discount > 0.05) AS BIGINT) AS n_rest
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "boolean aggregate family: count_if / bool_and (every) / bool_or "
    "(any) — fused into one hash aggregate",
)
def agg_bool_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_discount") > 0.05
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(disc).alias("n_discounted"),
            F.every(F.col("l_quantity") >= 1).alias("all_positive"),
            F.some(F.col("l_tax") > 0.07).alias("any_high_tax"),
            (F.count(F.lit(1)) - F.count_if(disc)).alias("n_rest"),
        )
        .orderBy("l_returnflag")
    )


_PQ_ORACLE = """
    WITH ordered AS (
      SELECT embedding::DOUBLE[] AS sv,
             row_number() OVER (
               ORDER BY md5(concat_ws('|', 'pq-train', CAST(vec_id AS VARCHAR))),
                        vec_id) - 1 AS sidx
      FROM embeddings),
    seeds AS (SELECT * FROM ordered WHERE sidx < 16),
    codes AS (
      SELECT e.vec_id, s.sidx, js.j,
             round(list_sum(list_transform(range(16), d ->
               (e.embedding[js.j*16 + d + 1]::DOUBLE - s.sv[js.j*16 + d + 1])
               * (e.embedding[js.j*16 + d + 1]::DOUBLE - s.sv[js.j*16 + d + 1]))),
               9) AS d2
      FROM embeddings e
      CROSS JOIN seeds s CROSS JOIN (SELECT unnest([0, 1]) AS j) js),
    assign AS (
      SELECT vec_id, j, sidx AS code FROM (
        SELECT vec_id, j, sidx,
               row_number() OVER (PARTITION BY vec_id, j
                                  ORDER BY d2, sidx) AS rn
        FROM codes) t
      WHERE rn = 1)
    SELECT CAST(a0.code AS INT) AS c0, count(*) AS n,
           round(avg(a1.code), 4) AS mean_c1
    FROM (SELECT vec_id, code FROM assign WHERE j = 0) a0
    JOIN (SELECT vec_id, code FROM assign WHERE j = 1) a1 USING (vec_id)
    GROUP BY 1 ORDER BY 1
"""


@register(
    "ann_pq_codes",
    _PQ_ORACLE,  # codebook-trained encoding — rows-only; numpy parity in tests
    "Product quantization over the embeddings table (m=4 subspaces, k=16 "
    "codes): each float vector compresses to 4 small ints via map-only "
    "Arrow encoding with driver-held codebooks. Output: per-(first-code) "
    "cell sizes + mean second code. The oracle re-derives the md5-ordered "
    "sub-codebooks and the round-9 argmin assignment relationally — full "
    "value check of the PQ encoder.",
)
def ann_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import pq_encode
    from jigsaw_spark.session import widen

    emb = widen(_t(spark, sf_dir, "embeddings"))
    codes, _books = pq_encode(emb, m=4, k=16)
    return (
        codes.select(
            F.col("codes")[0].alias("c0"),
            F.col("codes")[1].alias("c1"),
        )
        .groupBy("c0")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("c1"), 4).alias("mean_c1"))
        .orderBy("c0")
    )


@register(
    "agg_string_agg",
    """
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "ordered string aggregation (LISTAGG): collect_set → sort_array → "
    "array_join gives a deterministic csv per group — same result as the "
    "oracle's ORDER BY string_agg, one hash aggregate",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "ts_interp",
    """
    WITH marked AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'error' THEN NULL
                  ELSE round(value, 4) END AS v
      FROM events
    ), bounds AS (
      SELECT event_id, user_id, ts, v,
             last_value(v IGNORE NULLS) OVER w_back  AS v_prev,
             epoch_us(ts) - last_value(CASE WHEN v IS NOT NULL
                 THEN epoch_us(ts) END IGNORE NULLS) OVER w_back AS dt_prev,
             first_value(v IGNORE NULLS) OVER w_fwd  AS v_next,
             first_value(CASE WHEN v IS NOT NULL
                 THEN epoch_us(ts) END IGNORE NULLS) OVER w_fwd
               - epoch_us(ts) AS dt_next
      FROM marked
      WINDOW w_back AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_fwd AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN v_prev IS NOT NULL AND v_next IS NOT NULL THEN
               v_prev + (v_next - v_prev)
                 * dt_prev / nullif(dt_prev + dt_next, 0)
             ELSE coalesce(v_prev, v_next) END, 4) AS v_interp
    FROM bounds
    """,
    "linear time-interpolation of gaps: previous/next observations + "
    "event-time distances from two ignore-nulls window passes over one "
    "partition shuffle; boundary gaps fall back to nearest observation",
)
def ts_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.round(F.col("value"), 4)
    )
    us = F.unix_micros(F.col("ts"))
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = ev.select("event_id", "user_id", "ts", v.alias("v"))
    t_obs = F.when(F.col("v").isNotNull(), us)
    bounds = marked.select(
        "event_id",
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("v_prev"),
        (us - F.last(t_obs, ignorenulls=True).over(w_back)).alias("dt_prev"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("v_next"),
        (F.first(t_obs, ignorenulls=True).over(w_fwd) - us).alias("dt_next"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("v_prev").isNotNull() & F.col("v_next").isNotNull(),
            F.col("v_prev")
            + (F.col("v_next") - F.col("v_prev"))
            * F.col("dt_prev")
            / F.nullif(F.col("dt_prev") + F.col("dt_next"), F.lit(0)),
        )
        .otherwise(F.coalesce("v_prev", "v_next"))
    )
    return bounds.select(
        "event_id", "user_id", F.round(interp, 4).alias("v_interp")
    )


@register(
    "agg_hll_mergeable",
    """
    WITH per_type AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_users
      FROM events GROUP BY event_type
    )
    SELECT event_type, exact_users FROM per_type ORDER BY event_type
    """,
    "mergeable HLL sketches (DataSketches): per-type user sketches built "
    "with hll_sketch_agg, re-merged with hll_union_agg for the global "
    "estimate — the pre-aggregated-rollup architecture where partial "
    "sketches are stored and unioned instead of rescanning raw data. The "
    "oracle checks the EXACT distinct counts; the query asserts the "
    "estimates land within HLL error of exact (verified in-query, "
    "emitting the exact counts so the hash gate stays precise).",
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    checked = sketches.select(
        "event_type",
        "exact_users",
        F.hll_sketch_estimate("sk").alias("est"),
    ).withColumn(
        "within_err",
        (F.abs(F.col("est") - F.col("exact_users"))
         <= F.greatest(F.col("exact_users") * 0.05, F.lit(5.0))),
    )
    # the merge leg: union the per-type sketches into ONE global sketch
    # (this is what stored rollups do instead of rescanning raw data) and
    # check its estimate against the exact global distinct count
    global_check = (
        sketches.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("g_est")
        )
        .crossJoin(ev.agg(F.count_distinct("user_id").alias("g_exact")))
        .select(
            (
                F.abs(F.col("g_est") - F.col("g_exact"))
                <= F.greatest(F.col("g_exact") * 0.05, F.lit(5.0))
            ).alias("g_ok")
        )
    )
    # keep the hash gate exact: emit exact counts, but FAIL the query (row
    # count drops, driver flags it) if any per-type estimate or the merged
    # global estimate strays outside HLL error
    return (
        checked.filter(F.col("within_err"))
        .crossJoin(F.broadcast(global_check))
        .filter(F.col("g_ok"))
        .select("event_type", "exact_users")
        .orderBy("event_type")
    )


@register(
    "fn_maps",
    """
    SELECT o_orderkey,
           2 AS n_entries,
           'priority,status' AS sorted_keys,
           o_orderpriority || '|' || o_orderstatus AS packed_vals,
           CASE WHEN o_orderstatus = 'F' THEN 'status=F' ELSE 'none' END
             AS filtered_entry,
           upper(o_orderstatus) AS status_upper
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
    "map-function surface (map construction, map_keys/map_values sorted "
    "projection, map_filter, transform_values) flattened to scalar "
    "columns the oracle rebuilds directly — the map column itself never "
    "leaves the plan, so no engine-specific map rendering is compared",
)
def fn_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    filtered = F.map_filter(m, lambda k, v: (k == F.lit("status")) & (v == F.lit("F")))
    return o.select(
        "o_orderkey",
        F.size(m).alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("sorted_keys"),
        F.array_join(
            F.transform(
                F.array_sort(F.map_keys(m)), lambda k: F.element_at(m, k)
            ),
            "|",
        ).alias("packed_vals"),
        F.coalesce(
            F.try_element_at(
                F.transform(
                    F.map_entries(filtered),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"]),
                ),
                F.lit(1),
            ),
            F.lit("none"),
        ).alias("filtered_entry"),
        F.element_at(
            F.transform_values(m, lambda k, v: F.upper(v)), F.lit("status")
        ).alias("status_upper"),
    )


@register(
    "fn_structs",
    """
    WITH s AS (
      SELECT o_orderkey,
             o_orderstatus AS st, o_orderpriority AS pri,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey % 100 = 0)
    SELECT o_orderkey,
           st AS status_field,
           st || '#' || pri AS packed,
           CASE WHEN (st, pri) = ('F', '1-URGENT') THEN 1 ELSE 0 END
             AS is_urgent_f,
           CAST((st, pri) < ('O', '3-MEDIUM') AS INT) AS below_pivot
    FROM s
    """,
    "struct surface: named_struct construction, field access, struct "
    "equality and lexicographic ordering comparison — flattened to "
    "scalars; DuckDB compares ROW values with the same field-order "
    "lexicographic semantics",
)
def fn_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    st = F.struct(
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").alias("pri"),
    )
    pivot = F.struct(F.lit("O").alias("st"), F.lit("3-MEDIUM").alias("pri"))
    return o.select(
        "o_orderkey",
        st.getField("st").alias("status_field"),
        F.concat(st["st"], F.lit("#"), st["pri"]).alias("packed"),
        F.when(
            st == F.struct(F.lit("F").alias("st"), F.lit("1-URGENT").alias("pri")),
            1,
        )
        .otherwise(0)
        .alias("is_urgent_f"),
        (st < pivot).cast("int").alias("below_pivot"),
    )


@register(
    "fn_try_errors",
    """
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INT) AS bad_int,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 7)
           END AS safe_div,
           TRY_CAST('1997-13-40' AS DATE) IS NULL AS bad_date_null,
           COALESCE(TRY_CAST(o_orderstatus AS INT), -1) AS status_or_default
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
    "error-tolerant scalar surface: try_cast on unparseable strings/"
    "dates → NULL (not job failure — the 100 TB dirty-data contract), "
    "try_divide zero → NULL, COALESCE defaulting. DuckDB TRY_CAST has "
    "identical null-on-failure semantics; the division is double-IEEE on "
    "identical operands",
)
def fn_try_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("bad_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 7).alias(
            "safe_div"
        ),
        F.try_to_timestamp(F.lit("1997-13-40")).cast("date").isNull().alias(
            "bad_date_null"
        ),
        F.coalesce(
            F.col("o_orderstatus").try_cast("int"), F.lit(-1)
        ).alias("status_or_default"),
    )
