"""Join-shaped operators.

Reference semantics (SURVEY §2.3):
  - J1 file-convention equi-join: image ⋈ mask ⋈ labels ⋈ meta on image_id
    (jigsaw/model_utils/base/mask.py:83-101, jigsaw/data_interface.py:68-112)
  - J2 left-semi join: keep files whose id ∈ selected ids
    (jigsaw/model_utils/filters.py:258-262; io_utils.py:278-355)
  - J3 union-distinct "join_sets": concat + dedupe by image_id keep-first
    (jigsaw/model_utils/filters.py:115-144)
  - J4 broadcast dimension join: label→int registry applied at export
    (jigsaw/model_utils/types.py:24-26)

Scale: the construct join shuffles both fact sides on the key unless one is
broadcast-able; dims are hinted broadcast. Semi/anti joins against a small
id set broadcast automatically under AQE.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join(df: DataFrame, keys: DataFrame, on: list[str] | str) -> DataFrame:
    """EXISTS — J2. Catalyst broadcasts ``keys`` when small."""
    return df.join(keys, on=on, how="left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: list[str] | str) -> DataFrame:
    """NOT EXISTS — the skip-existing incremental pattern (F8,
    io_utils.py:89,150): new = incoming anti-join already-ingested."""
    return df.join(keys, on=on, how="left_anti")


def union_distinct(dfs: list[DataFrame], key_cols: list[str]) -> DataFrame:
    """J3: union by name (missing columns null-filled) then dedupe on the
    key. The reference keeps the *first* occurrence; rows for the same key
    are identical in its corpus, so keep-any is equivalent — documented
    deviation (SURVEY §2.3 J3)."""
    if not dfs:
        raise ValueError("union_distinct of zero DataFrames")
    unioned = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )
    return unioned.dropDuplicates(key_cols)


def construct(
    sources: dict[str, DataFrame],
    on: str | list[str] = "image_id",
    how: str = "inner",
    broadcast: set[str] | None = None,
) -> DataFrame:
    """J1: assemble the wide example row by equi-joining every source on the
    key. ``broadcast`` names sources to hint broadcast (label palettes,
    registries — the J4 pattern)."""
    broadcast = broadcast or set()
    items = list(sources.items())
    if not items:
        raise ValueError("construct of zero sources")
    name0, out = items[0]
    if name0 in broadcast:
        out = F.broadcast(out)
    for name, df in items[1:]:
        rhs = F.broadcast(df) if name in broadcast else df
        out = out.join(rhs, on=on, how=how)
    return out
