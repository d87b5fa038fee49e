from jigsaw_spark.operators.filters import (
    and_filter,
    apply_filter_groups,
    or_filter,
    with_default_tag,
)
from jigsaw_spark.operators.samples import (
    approx_split,
    exact_sample,
    kfold_assign,
    kfold_hash,
    shard_assign,
    split_data,
)
from jigsaw_spark.operators.joins import (
    construct,
    semi_join,
    anti_join,
    union_distinct,
)
from jigsaw_spark.operators.aggregates import (
    dense_label_map,
    distinct_labels,
    extent_merge,
    moments,
)
from jigsaw_spark.operators.transforms import Transform, recode_column

__all__ = [
    "and_filter",
    "or_filter",
    "with_default_tag",
    "apply_filter_groups",
    "exact_sample",
    "split_data",
    "approx_split",
    "kfold_assign",
    "kfold_hash",
    "shard_assign",
    "construct",
    "semi_join",
    "anti_join",
    "union_distinct",
    "distinct_labels",
    "dense_label_map",
    "moments",
    "extent_merge",
    "Transform",
    "recode_column",
]
