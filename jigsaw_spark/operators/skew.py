"""Skew-mitigation operators: salted aggregation, two-phase distinct.

At 100 TB a handful of hot keys (a viral document, a default tag, an
'untagged' bucket) can pin one reducer while the rest of the cluster idles.
Spark's map-side partial aggregation already absorbs most groupBy skew, and
AQE splits skewed JOIN partitions — but two shapes still need explicit
handling:

  - aggregations whose partial state is large (collect_list/collect_set) or
    that are forced through a single phase: salt the key, partially
    aggregate on (key, salt), then merge — `salted_agg`.
  - COUNT(DISTINCT x) on hot keys: Spark plans an Expand + two-phase agg,
    shuffling every (key, x) pair to the key's reducer. The two-phase form
    first dedupes on (key, x) — a shuffle whose key INCLUDES x, so hot keys
    spread across reducers — then counts per key: `count_distinct_twophase`.

Both produce bit-identical results to the naive form (all merged aggregates
here are algebraic), so the oracle SQL is the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# partial-aggregate kind -> merge function over partial results
_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage algebraic aggregation over a salted key.

    ``aggs``: {out_name: (kind, column)} with kind in count/sum/min/max.
    Stage 1 groups on (key, salt) — num_salts reducers share each hot key —
    stage 2 merges the tiny partial table on the key alone. The salt is a
    deterministic row hash (xxhash64 over all columns), so re-execution
    under AQE/speculation is stable; for algebraic aggregates the salt
    value never affects the result."""
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts)
    ).alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*group_cols, "_salt").agg(
        *[
            getattr(F, kind)(col).alias(name)
            for name, (kind, col) in aggs.items()
        ]
    )
    return partial.groupBy(*group_cols).agg(
        *[
            _MERGE[kind](F.col(name)).alias(name)
            for name, (kind, _col) in aggs.items()
        ]
    )


def count_distinct_twophase(
    df: DataFrame, group_cols: list[str], value_col: str, out_name: str = "n_distinct"
) -> DataFrame:
    """Exact distinct count, skew-spread: dedupe on (key, value) first —
    that shuffle partitions by BOTH columns, so a hot key fans out — then
    count per key."""
    return (
        df.select(*group_cols, value_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(out_name))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Manual skew-join: replicate the (small-ish) right side across
    ``num_salts`` salt values and salt the left side deterministically, so
    a hot join key spreads over num_salts reducers instead of pinning one.

    AQE's skew-join split (enabled in the session) handles most cases at
    runtime by splitting oversized partitions; this explicit form is for
    the shapes AQE can't rewrite — a skewed key feeding a downstream
    stateful op, or when the optimizer's size estimates miss the skew
    (e.g. post-UDF cardinality). Cost model: right side is materialized
    num_salts times — use only when |right| * num_salts ≪ |left|'s hot-key
    mass; a broadcast join is strictly better whenever right fits the
    broadcast threshold.

    Results are bit-identical to the plain equi-join (salts match by
    construction), so the oracle is the plain JOIN."""
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(num_salts)])
    ).alias("_salt")
    replicated = right.select("*", salts)
    salted_left = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts)),
    )
    return (
        salted_left.join(replicated, on=[on, "_salt"], how=how).drop("_salt")
    )
