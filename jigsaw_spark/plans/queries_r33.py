"""Round-8 batch 6: dynamic time warping and golden-record
survivorship —

- ``ts_dtw_exact``: dynamic-time-warping distance between the daily
  'view' and 'purchase' cents series, EXACT integer DP — the elastic
  similarity measure rigid pointwise metrics (ts_cross_corr, ewma
  deltas) cannot give when two series trace the same shape out of
  phase. The DP recurrence carries an in-row dependency, so the
  oracle replays it by ANTI-DIAGONALS (diagonal d depends only on
  d-1 and d-2 — every cell of a diagonal is independent), a
  recursive CTE carrying two BIGINT-list diagonals; the Spark side
  runs the same DP as a numpy kernel over the two collected
  calendar-bounded series inside one mapInPandas task.
- ``er_survivorship``: entity-resolution survivorship (golden-record
  merge): synthetic duplicate customer records with conflicting /
  missing fields are merged per entity by field-level rules — most
  recent non-null wins per field, ties by source priority — the MDM
  step after dedup decides WHICH rows are the same entity and the
  curation pipeline must decide WHAT the merged row says.

Scale notes (100 TB): DTW inputs are calendar-bounded series (the day
dim), assembled by one hash-agg each — the O(n^2) DP runs on the
KB-scale dim inside a single Arrow task, never on facts; at larger n
use a Sakoe-Chiba band (documented, not needed at the day grain).
Survivorship is per-entity max_by hash-aggs — one shuffle on the
entity key, the same shape as dedup keeper election.

Float discipline: all exact integers / strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

_INF = 1 << 60

# ---------------------------------------------------------------------------
# ts_dtw_exact
# ---------------------------------------------------------------------------

_DTW_SQL = f"""
    WITH RECURSIVE
    sa AS (
      SELECT list(cents ORDER BY day) AS a FROM (
        SELECT epoch_us(ts) // 86400000000 AS day,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
        FROM events WHERE event_type = 'view' GROUP BY 1)),
    sb AS (
      SELECT list(cents ORDER BY day) AS b FROM (
        SELECT epoch_us(ts) // 86400000000 AS day,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)),
    dims AS MATERIALIZED (
      SELECT len(a) AS m, len(b) AS n, a, b FROM sa, sb),
    -- anti-diagonal DP over the PADDED (m+1)x(n+1) grid: diag d holds
    -- D(i, d-i) for i in [greatest(0, d-n), least(m, d)], ordered by i.
    -- D(0,0)=0; D(i,0)=D(0,j)=INF (i,j>=1); else
    -- D(i,j) = |a_i - b_j| + min(D(i-1,j), D(i,j-1), D(i-1,j-1)),
    -- with the first two parents on diag d-1 and the third on d-2 --
    -- every cell of a diagonal is independent of its siblings.
    dp(d, prev2, prev) AS (
      SELECT 0, CAST(NULL AS BIGINT[]), [CAST(0 AS BIGINT)]
      FROM dims
      UNION ALL
      SELECT d + 1, prev,
        list_transform(
          generate_series(greatest(0, d + 1 - n), least(m, d + 1)),
          i -> CASE
            WHEN i = 0 OR d + 1 - i = 0 THEN CAST({_INF} AS BIGINT)
            ELSE abs(a[i] - b[d + 1 - i])
              + least(
                  CASE WHEN i - 1 >= greatest(0, d - n)
                            AND i - 1 <= least(m, d)
                       THEN prev[i - 1 - greatest(0, d - n) + 1]
                       ELSE CAST({_INF} AS BIGINT) END,
                  CASE WHEN i >= greatest(0, d - n)
                            AND i <= least(m, d)
                       THEN prev[i - greatest(0, d - n) + 1]
                       ELSE CAST({_INF} AS BIGINT) END,
                  CASE WHEN d >= 1 AND i - 1 >= greatest(0, d - 1 - n)
                            AND i - 1 <= least(m, d - 1)
                       THEN prev2[i - 1 - greatest(0, d - 1 - n) + 1]
                       ELSE CAST({_INF} AS BIGINT) END) END)
      FROM dp, dims WHERE d < m + n
    )
    SELECT CAST(m AS BIGINT) AS n_a,
           CAST(n AS BIGINT) AS n_b,
           -- the final diagonal d = m+n holds the single cell (m, n)
           CAST((SELECT prev[1] FROM dp, dims WHERE d = m + n) AS BIGINT)
             AS dtw_cents
    FROM dims
"""


@register(
    "ts_dtw_exact",
    _DTW_SQL,
    "dynamic-time-warping distance between the daily 'view' and "
    "'purchase' cents series, exact integer DP (|a_i - b_j| costs, "
    "min over insert/delete/match) — the elastic similarity measure "
    "for out-of-phase shape matching that pointwise metrics "
    "(ts_cross_corr at fixed lags) cannot express. The oracle replays "
    "the DP by ANTI-DIAGONALS (each diagonal depends only on the "
    "previous two, so every cell is independent — the in-row "
    "dependency of the classic row sweep disappears), a recursive CTE "
    "carrying two BIGINT-list diagonals for m+n-1 steps; the Spark "
    "side computes the identical DP in one numpy kernel over the two "
    "collected series. Inputs are CALENDAR-BOUNDED day dims (one "
    "hash-agg each) — the O(m*n) table lives on the KB-scale dim "
    "inside a single Arrow task, never on facts; at larger n apply a "
    "Sakoe-Chiba band. Unreachable cells carry a 2^60 sentinel "
    "(never overflows: costs add at most ~1e9 per step)",
)
def ts_dtw_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def series(et: str, name: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == et)
            .groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day"))
            .agg(
                F.sum(
                    F.round(F.col("value") * 100, 0).cast("bigint")
                ).alias("cents")
            )
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(day, cents)))"
                    ", x -> x.cents)"
                ).alias(name)
            )
        )

    one = series("view", "a").crossJoin(F.broadcast(series("purchase", "b")))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"n_a": [], "n_b": [], "dtw_cents": []}
            for _, row in pdf.iterrows():
                a = np.asarray(row["a"], dtype=np.int64)
                b = np.asarray(row["b"], dtype=np.int64)
                m, n = len(a), len(b)
                inf = 1 << 60
                prev = np.full(n + 1, inf, dtype=np.int64)
                prev[0] = 0
                for i in range(1, m + 1):
                    cur = np.full(n + 1, inf, dtype=np.int64)
                    costs = np.abs(a[i - 1] - b)
                    for j in range(1, n + 1):
                        cur[j] = costs[j - 1] + min(
                            prev[j], cur[j - 1], prev[j - 1]
                        )
                    prev = cur
                out["n_a"].append(m)
                out["n_b"].append(n)
                out["dtw_cents"].append(int(prev[n]))
            yield pd.DataFrame(out)

    return one.mapInPandas(
        kernel, "n_a bigint, n_b bigint, dtw_cents bigint"
    )


# ---------------------------------------------------------------------------
# er_survivorship
# ---------------------------------------------------------------------------

_SURV_SQL = """
    WITH recs AS (
      -- two conflicting record versions per customer entity: v1 is a
      -- later partial update (balance missing for 1-in-3, name cased
      -- differently, segment only on v0)
      SELECT c_custkey AS entity, 0 AS version, c_custkey % 5 AS rec_ts,
             c_name AS name,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
             c_mktsegment AS segment
      FROM customer
      UNION ALL
      SELECT c_custkey, 1, c_custkey % 5 + 1,
             upper(c_name),
             CASE WHEN c_custkey % 3 = 0 THEN NULL
                  ELSE CAST(round(c_acctbal * 100, 0) AS BIGINT) + 1000 END,
             CAST(NULL AS VARCHAR)
      FROM customer),
    golden AS (
      SELECT entity,
             arg_max(name, CASE WHEN name IS NOT NULL
                           THEN rec_ts * 10 + version END) AS name,
             arg_max(bal_cents, CASE WHEN bal_cents IS NOT NULL
                                THEN rec_ts * 10 + version END)
               AS bal_cents,
             arg_max(segment, CASE WHEN segment IS NOT NULL
                              THEN rec_ts * 10 + version END) AS segment,
             count(*) AS n_records
      FROM recs GROUP BY entity)
    SELECT CAST(entity AS BIGINT) AS entity,
           name,
           CAST(bal_cents AS BIGINT) AS bal_cents,
           segment,
           CAST(n_records AS BIGINT) AS n_records
    FROM golden WHERE entity % 10 = 0
"""


@register(
    "er_survivorship",
    _SURV_SQL,
    "entity-resolution survivorship (golden-record merge): two "
    "conflicting record versions per customer (the later one a "
    "partial update — missing balance for a third of entities, "
    "re-cased name, no segment) merge per entity with the standard "
    "field-level rule: MOST RECENT NON-NULL WINS, ties broken by "
    "version priority — max_by over the key (rec_ts * 10 + version) "
    "NULLED OUT when the field is null, because max_by/arg_max skip "
    "rows whose ordering key is NULL on both engines (the same-named "
    "ignore-null contract, asserted by the oracle match). The MDM "
    "step after dedup: components decide WHICH rows are one entity; "
    "survivorship decides WHAT the merged row says. Shape: one "
    "entity-keyed hash-agg (the dedup keeper-election shape); "
    "field-level lineage would add one arg_max per field",
)
def er_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    v0 = c.select(
        F.col("c_custkey").alias("entity"),
        F.lit(0).alias("version"),
        (F.col("c_custkey") % 5).alias("rec_ts"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias(
            "bal_cents"
        ),
        F.col("c_mktsegment").alias("segment"),
    )
    v1 = c.select(
        F.col("c_custkey").alias("entity"),
        F.lit(1).alias("version"),
        (F.col("c_custkey") % 5 + 1).alias("rec_ts"),
        F.upper(F.col("c_name")).alias("name"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.lit(None).cast("bigint")
        )
        .otherwise(
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint") + 1000
        )
        .alias("bal_cents"),
        F.lit(None).cast("string").alias("segment"),
    )
    recs = v0.unionByName(v1)

    def pick(field: str):
        return F.expr(
            f"max_by({field}, CASE WHEN {field} IS NOT NULL"
            " THEN rec_ts * 10 + version END)"
        ).alias(field)

    golden = recs.groupBy("entity").agg(
        pick("name"),
        pick("bal_cents"),
        pick("segment"),
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
    )
    return golden.filter(F.col("entity") % 10 == 0).select(
        F.col("entity").cast("bigint").alias("entity"),
        "name",
        F.col("bal_cents").cast("bigint").alias("bal_cents"),
        "segment",
        "n_records",
    )
