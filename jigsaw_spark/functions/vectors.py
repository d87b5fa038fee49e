"""Vector math over ``array<float>`` embedding columns — pure column
expressions (JVM-side, codegen'd), no UDFs in the hot path.

``F.zip_with`` + ``F.aggregate`` evaluate left-to-right inside whole-stage
codegen, so the floating-point reduction order is sequential and matches the
DuckDB oracle's ``list_*`` sequential semantics (both are summed in index
order); results are rounded before hash comparison regardless.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL-safe only insofar as inputs are non-null
    non-empty (guaranteed for the embeddings table)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
