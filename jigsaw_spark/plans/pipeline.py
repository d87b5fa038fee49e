"""Declarative pipeline spec → DataFrame plan.

The reference's interactive CLI (jigsaw/cli.py:33-143) is a dialog that
incrementally builds exactly this structure — filter groups, per-group
sample counts, transforms, split params — and records it as lineage
(filters.py:193-247, transforms.py:177-185, write_dataset.py:241-277).
The engine makes the spec the API: one dataclass in, one lazily-planned
DataFrame out, lineage dict alongside. Catalyst sees the whole pipeline as
a single logical plan, so filters fold into scans and nothing materializes
until the caller acts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame

from jigsaw_spark.operators.filters import FilterGroup, apply_filter_groups
from jigsaw_spark.operators.samples import kfold_assign, split_data
from jigsaw_spark.operators.transforms import Transform, recode_column, transforms_lineage


@dataclass
class PipelineSpec:
    """The jigsaw pipeline, declaratively (SURVEY §3.1 stages 4-7)."""

    name: str
    key_cols: list[str]
    groups: list[FilterGroup] = field(default_factory=list)
    transforms: list[Transform] = field(default_factory=list)
    recode_cols: list[str] = field(default_factory=list)
    test_fraction: float = 0.2
    num_folds: int | None = None
    created_by: str = "jigsaw_spark"
    comments: str = ""
    training_type: str = ""


@dataclass
class PipelineResult:
    selected: DataFrame
    test: DataFrame | None
    dev: DataFrame | None
    lineage: dict


def run_pipeline(
    df: DataFrame, spec: PipelineSpec, collect_counts: bool = False
) -> PipelineResult:
    """Filter groups → union-distinct → transforms → split; returns frames
    plus a lineage manifest matching the reference's metadata.json schema
    (write_dataset.py:241-277, FIXTURES.md §7)."""
    selected, groups_meta = apply_filter_groups(
        df, spec.groups, spec.key_cols, collect_counts=collect_counts
    )
    for col in spec.recode_cols:
        selected = recode_column(selected, col, spec.transforms)
    test = dev = None
    if spec.test_fraction:
        test, dev = split_data(selected, spec.key_cols, spec.test_fraction)
    if spec.num_folds:
        selected = kfold_assign(selected, spec.num_folds, spec.key_cols)
    lineage = {
        "name": spec.name,
        "date_created": datetime.now(timezone.utc).isoformat(),
        "created_by": spec.created_by,
        "comments": spec.comments,
        "training_type": spec.training_type,
        "filters": {"groups": groups_meta},
        "transforms": transforms_lineage(spec.transforms),
    }
    return PipelineResult(selected=selected, test=test, dev=dev, lineage=lineage)
