"""Tag-predicate filtering — the reference's core "query engine".

Reference semantics (SURVEY §2.2):
  - and_filter: keep rows having ALL of the requested tags
    (jigsaw/model_utils/filters.py:60-83)
  - or_filter: keep rows having ANY of the requested tags
    (jigsaw/model_utils/filters.py:86-112); the reference's concat+dedup
    dance is unnecessary under relational filtering
  - chained filter groups: a pipeline of AND/OR steps per named set, each
    narrowing the previous subset, with per-stage cardinalities recorded
    (jigsaw/model_utils/filters.py:158-229)
  - untagged default: rows with no tags get the synthetic tag 'untagged'
    (jigsaw/model_utils/filters.py:50-52)

Design: tags live as ``array<string>`` (the pivoted boolean wide table of
the reference does not survive a data-dependent schema at scale); predicates
are ``array_contains`` / ``arrays_overlap``, which Catalyst evaluates inside
whole-stage codegen and — for parquet sources — benefits from row-group
statistics. Unknown-tag references raise (reference quirk kept, as an
explicit validation step instead of a KeyError mid-query).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNTAGGED = "untagged"


def with_default_tag(df: DataFrame, tags_col: str = "tags", default: str = UNTAGGED) -> DataFrame:
    """NULL/empty tag arrays become ``[default]`` (filters.py:50-52)."""
    c = F.col(tags_col)
    return df.withColumn(
        tags_col,
        F.when(c.isNull() | (F.size(c) == 0), F.array(F.lit(default))).otherwise(c),
    )


def _validate(df: DataFrame, tags: list[str], tags_col: str, validate: bool) -> None:
    """Reference raises KeyError on a tag absent from the corpus
    (filters.py:71-74 via pandas column indexing). Opt-in here because the
    check costs a scan; callers validating a user-facing spec should pass
    ``validate=True`` once up front."""
    if not validate:
        return
    known = {
        r[0]
        for r in df.select(F.explode(tags_col).alias("t")).distinct().collect()
    }
    missing = [t for t in tags if t not in known]
    if missing:
        raise KeyError(f"unknown tag(s): {missing}")


def _scalar_tag_pred(tags: list[str], tag_cols: list[str], conjunctive: bool) -> Column:
    """Tag predicate over scalar attribute columns: "row has tag t" ⇔ some
    tag column equals t. Semantically identical to array_contains over
    array(*tag_cols), but expressed as plain column comparisons, which
    Catalyst pushes into the parquet scan (array_contains over a derived
    array blocks pushdown — audited by tools/explain_audit.py)."""
    from operator import or_

    per_tag = [
        reduce(or_, (F.col(c) == F.lit(t) for c in tag_cols)) for t in tags
    ]
    return reduce(and_ if conjunctive else or_, per_tag)


def and_filter(
    df: DataFrame,
    tags: list[str],
    tags_col: str = "tags",
    validate: bool = False,
    tag_cols: list[str] | None = None,
) -> DataFrame:
    """Keep rows having ALL of ``tags`` (F1).

    Two physical forms, same semantics: with ``tag_cols`` the tags live in
    scalar attribute columns and the predicate pushes down to the scan
    (the 100 TB fast path); otherwise the ``tags_col`` array is tested with
    array_contains (the faithful tag-matrix form — parquet cannot push
    array predicates, so this filters post-scan inside codegen)."""
    if not tags:
        return df
    if tag_cols:
        return df.filter(_scalar_tag_pred(tags, tag_cols, conjunctive=True))
    _validate(df, tags, tags_col, validate)
    pred: Column = reduce(and_, (F.array_contains(tags_col, t) for t in tags))
    return df.filter(pred)


def or_filter(
    df: DataFrame,
    tags: list[str],
    tags_col: str = "tags",
    validate: bool = False,
    tag_cols: list[str] | None = None,
) -> DataFrame:
    """Keep rows having ANY of ``tags`` (F2). One ``arrays_overlap``
    instead of the reference's per-tag select + concat + keep-first dedup —
    relational filters never duplicate rows. ``tag_cols`` selects the
    pushable scalar form (see and_filter)."""
    if not tags:
        return df.limit(0)
    if tag_cols:
        return df.filter(_scalar_tag_pred(tags, tag_cols, conjunctive=False))
    _validate(df, tags, tags_col, validate)
    return df.filter(F.arrays_overlap(tags_col, F.array(*[F.lit(t) for t in tags])))


def tag_pivot(df: DataFrame, key: str, tags_col: str = "tags") -> DataFrame:
    """The reference's boolean tag matrix as a DERIVED view: one boolean
    column per observed tag (jigsaw/model_utils/filters.py:40-58). The
    array stays the source of truth — a data-dependent wide schema can't be
    the primary representation at 100 TB (SURVEY §1.3) — but the pivot is
    handy for small interactive slices and keeps S9 parity inspectable.
    Involves a distinct-tags collect to fix the column set (two jobs)."""
    exploded = df.select(F.col(key), F.explode(tags_col).alias("tag"))
    return (
        exploded.groupBy(key)
        .pivot("tag")
        .agg(F.count(F.lit(1)) > 0)
        .na.fill(False)
    )


@dataclass
class FilterStep:
    """One AND/OR step in a chain (filters.py:191-202)."""

    type: str  # 'and' | 'or'
    tags: list[str]


@dataclass
class FilterGroup:
    """A named set built by sequential narrowing (filters.py:158-229)."""

    name: str
    steps: list[FilterStep] = field(default_factory=list)
    sample_n: int | None = None  # exact-N sample applied after the chain (P1)


def apply_filter_chain(
    df: DataFrame, steps: list[FilterStep], tags_col: str = "tags"
) -> DataFrame:
    """Sequential narrowing; Catalyst folds the chain into one conjunctive
    scan predicate, so 'chained' costs nothing extra at execution time."""
    out = df
    for step in steps:
        if step.type == "and":
            out = and_filter(out, step.tags, tags_col)
        elif step.type == "or":
            out = or_filter(out, step.tags, tags_col)
        else:
            raise ValueError(f"unknown filter type {step.type!r}")
    return out


def apply_filter_groups(
    df: DataFrame,
    groups: list[FilterGroup],
    key_cols: list[str],
    tags_col: str = "tags",
    collect_counts: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Run every group's chain (and optional exact-N sample), union the named
    sets deduplicated on the key (J3), and return (result, lineage).

    Lineage mirrors the reference's filter_metadata shape
    (filters.py:193-222): per group name, its steps, and — when
    ``collect_counts`` — the per-stage cardinalities. A chain's stage
    counts are the counts of CUMULATIVE predicates (stage i ⇔ steps 1..i
    all hold), so every stage of a group is counted in ONE aggregate pass
    over the source — not one ``.count()`` action (= one full scan at
    100 TB) per stage, which is what a literal port of the reference's
    per-step ``len(df)`` logging would cost. The post-sample count needs
    no job at all: exact-N sampling yields ``min(n, stage_count)`` rows by
    construction. Off by default so planning stays fully lazy.
    """
    from jigsaw_spark.operators.joins import union_distinct
    from jigsaw_spark.operators.samples import exact_sample

    sets: list[DataFrame] = []
    lineage: list[dict] = []
    for g in groups:
        sub = df
        steps_meta = []
        cum_preds: list[Column] = []
        acc: Column | None = None
        for step in g.steps:
            sub = apply_filter_chain(sub, [step], tags_col)
            steps_meta.append({"type": step.type, "tags": list(step.tags)})
            if collect_counts:
                p = _step_predicate(step, tags_col)
                acc = p if acc is None else acc & p
                cum_preds.append(acc)
        counts: list[int] = []
        if collect_counts:
            if cum_preds:
                row = df.agg(
                    *[
                        F.sum(c.cast("long")).alias(f"_c{i}")
                        for i, c in enumerate(cum_preds)
                    ]
                ).first()
                counts = [int(row[f"_c{i}"] or 0) for i in range(len(cum_preds))]
            else:
                counts = [df.count()]
            for meta, c in zip(steps_meta, counts):
                meta["count"] = c
        if g.sample_n is not None:
            sub = exact_sample(sub, g.sample_n, key_cols)
        entry = {"name": g.name, "filters": steps_meta}
        if collect_counts:
            last = counts[-1]
            entry["number_included"] = (
                min(g.sample_n, last) if g.sample_n is not None else last
            )
        lineage.append(entry)
        sets.append(sub)
    merged = union_distinct(sets, key_cols)
    return merged, lineage


def _step_predicate(step: "FilterStep", tags_col: str) -> Column:
    """The step's row predicate as a Column — the counting twin of
    apply_filter_chain (kept adjacent: both must agree on semantics,
    including the empty-tags edge: AND of nothing = keep, OR of nothing =
    drop, matching and_filter/or_filter)."""
    if step.type == "and":
        if not step.tags:
            return F.lit(True)
        return reduce(and_, (F.array_contains(tags_col, t) for t in step.tags))
    if step.type == "or":
        if not step.tags:
            return F.lit(False)
        return F.arrays_overlap(
            tags_col, F.array(*[F.lit(t) for t in step.tags])
        )
    raise ValueError(f"unknown filter step type: {step.type!r}")
