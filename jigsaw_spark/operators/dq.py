"""Declarative data-quality expectations (deequ-lite).

Lake-table QA as a single-pass operator: every rule compiles to a
conditional aggregate over ONE scan — not-null, range, accepted-values
and regex rules share the same hash-agg buffer; uniqueness adds an exact
count-distinct (Expand) in the same pass. The result is one row per
rule: (rule, column, fraction, threshold, passed) — lazily planned, so
it composes into pipelines and the DuckDB oracle replays it exactly.

At 100 TB: one scan, map-side partials, output rows = |rules| — the
check costs what one aggregate query costs, never |rules| scans.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    kind: str  # not_null | in_range | accepted_values | matches | unique
    col: str
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    values: tuple[str, ...] | None = None
    min_fraction: float = 1.0

    @property
    def name(self) -> str:
        return f"{self.kind}({self.col})"


def _rule_hits(r: Rule):
    c = F.col(r.col)
    if r.kind == "not_null":
        return F.sum(c.isNotNull().cast("long"))
    if r.kind == "in_range":
        ok = c.isNotNull() & (c >= F.lit(r.lo)) & (c <= F.lit(r.hi))
        return F.sum(ok.cast("long"))
    if r.kind == "accepted_values":
        return F.sum((c.isin(list(r.values))).cast("long"))
    if r.kind == "matches":
        return F.sum(c.rlike(r.pattern).cast("long"))
    if r.kind == "unique":
        return F.count_distinct(c)
    raise ValueError(f"unknown rule kind {r.kind!r}")


def dq_check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One row per rule. ``fraction`` = hits/rows (for `unique`:
    distinct/rows), rounded to 6; ``passed`` = fraction >= threshold."""
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        _rule_hits(r).alias(f"_r{i}") for i, r in enumerate(rules)
    ]
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.lit(r.col).alias("column"),
            F.round(F.col(f"_r{i}") / F.col("_n"), 6).alias("fraction"),
            F.lit(float(r.min_fraction)).alias("threshold"),
            (
                F.round(F.col(f"_r{i}") / F.col("_n"), 6)
                >= F.lit(float(r.min_fraction))
            ).alias("passed"),
        )
        for i, r in enumerate(rules)
    ]
    return row.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def rule_sql(r: Rule, idx: int) -> str:
    """DuckDB rendering of one rule's hit count — kept adjacent so the
    expression and oracle can never drift."""
    c = r.col
    if r.kind == "not_null":
        body = f"sum(CASE WHEN {c} IS NOT NULL THEN 1 ELSE 0 END)"
    elif r.kind == "in_range":
        body = (
            f"sum(CASE WHEN {c} IS NOT NULL AND {c} >= {r.lo} "
            f"AND {c} <= {r.hi} THEN 1 ELSE 0 END)"
        )
    elif r.kind == "accepted_values":
        vals = ", ".join(f"'{v}'" for v in r.values)
        body = f"sum(CASE WHEN {c} IN ({vals}) THEN 1 ELSE 0 END)"
    elif r.kind == "matches":
        body = f"sum(CASE WHEN regexp_matches({c}, '{r.pattern}') THEN 1 ELSE 0 END)"
    elif r.kind == "unique":
        body = f"count(DISTINCT {c})"
    else:
        raise ValueError(r.kind)
    return f"{body} AS _r{idx}"


def dq_oracle_sql(table: str, rules: list[Rule]) -> str:
    cols = ", ".join(rule_sql(r, i) for i, r in enumerate(rules))
    rows = " UNION ALL ".join(
        f"SELECT '{r.name}' AS rule, '{r.col}' AS column, "
        f"round(_r{i} / _n, 6) AS fraction, "
        f"CAST({float(r.min_fraction)} AS DOUBLE) AS threshold, "
        f"round(_r{i} / _n, 6) >= {float(r.min_fraction)} AS passed FROM a"
        for i, r in enumerate(rules)
    )
    return f"WITH a AS (SELECT count(*) AS _n, {cols} FROM {table}) {rows}"
