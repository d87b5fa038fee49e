"""Label transforms: rename / merge as functional recodes.

Reference semantics (SURVEY §2, T):
  - Transform(transform_type ∈ {rename, merge}, original, new)
    (jigsaw/model_utils/types.py:28-54)
  - rename: one label → new name; merge: several labels → one new label,
    bbox extents merged (A5, jigsaw/models/bbox/model.py:231-246), mask
    pixels recolored (pandas-UDF path, multimodal module)
  - transforms apply *in order* over the current label universe
    (jigsaw/model_utils/transforms.py:43-93)

The reference mutates files in place; the engine recodes columns
functionally (SURVEY §7.3.6). The recode compiles to a CASE chain —
constant-folded by Catalyst, zero-cost at scan time, and trivially
expressible in the SQL oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Transform:
    """Op-as-data, mirroring jigsaw/model_utils/types.py:28-54."""

    transform_type: str  # 'rename' | 'merge'
    original: str | list[str]
    new: str

    def originals(self) -> list[str]:
        return [self.original] if isinstance(self.original, str) else list(self.original)


def recode_expr(col: Column | str, transforms: list[Transform]) -> Column:
    """Fold the ordered transform list into one CASE expression. Later
    transforms see the output of earlier ones (the reference applies them
    sequentially), which a naive single CASE would not honor — so we chain:
    each transform rewrites the running expression."""
    expr = F.col(col) if isinstance(col, str) else col
    for t in transforms:
        originals = t.originals()
        expr = F.when(expr.isin(originals), F.lit(t.new)).otherwise(expr)
    return expr


def recode_column(
    df: DataFrame, col: str, transforms: list[Transform]
) -> DataFrame:
    return df.withColumn(col, recode_expr(col, transforms))


def recode_sql(col: str, transforms: list[Transform]) -> str:
    """The DuckDB/ANSI rendering of :func:`recode_expr` (kept adjacent so
    engine and oracle can't drift). Produces nested CASEs in application
    order."""
    expr = col
    for t in transforms:
        in_list = ", ".join(f"'{o}'" for o in t.originals())
        expr = f"(CASE WHEN {expr} IN ({in_list}) THEN '{t.new}' ELSE {expr} END)"
    return expr


def transforms_lineage(transforms: list[Transform]) -> list[dict]:
    """Lineage records matching the reference's metadata.json shape
    (jigsaw/model_utils/transforms.py:177-185)."""
    return [
        {"type": t.transform_type, "original": t.original, "new": t.new}
        for t in transforms
    ]


def match_colors_with_tolerance(
    pixels: DataFrame,
    palette: DataFrame,
    tol: int = 2,
    color_cols: tuple[str, str, str] = ("r", "g", "b"),
) -> DataFrame:
    """Label pixels/regions by nearest palette color within a ±tol band per
    channel — the instance-mask color matching step, with reference quirk
    #2 fixed (the tolerance list typo `[-2 -1, 0, 1, 2]` evaluates to
    [-3,0,1,2]; jigsaw/models/instance_mask/model.py:87 — intended ±2).

    Relational form: a broadcast range join of observed colors against the
    tiny palette (label_colors child table), one interval predicate per
    channel — no Python, no pixel loops; works the same whether `pixels`
    holds per-pixel rows or per-region aggregated colors. Ambiguous colors
    matching several palette entries keep every match (caller disambiguates
    or tightens tol)."""
    r, g, b = color_cols
    pal = palette.select(
        F.col("label"),
        F.col(r).alias("_pr"),
        F.col(g).alias("_pg"),
        F.col(b).alias("_pb"),
    )
    cond = (
        (F.col(r) >= F.col("_pr") - tol)
        & (F.col(r) <= F.col("_pr") + tol)
        & (F.col(g) >= F.col("_pg") - tol)
        & (F.col(g) <= F.col("_pg") + tol)
        & (F.col(b) >= F.col("_pb") - tol)
        & (F.col(b) <= F.col("_pb") + tol)
    )
    return pixels.join(F.broadcast(pal), cond, "left").drop("_pr", "_pg", "_pb")
