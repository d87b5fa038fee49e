"""Embedding similarity search: brute-force cosine top-k + SRP-LSH buckets.

Training-data-pipeline extensions (BASELINE.json north star) over an
``array<float>`` embedding column.

  - Brute force: broadcast the (small) query set against the corpus, cosine
    via zip_with/aggregate (JVM codegen, no UDF), window top-k per query.
    At 100 TB this is the exact-recall baseline; the scan is
    embarrassingly parallel and the only shuffle is the per-query top-k
    (tiny: k rows per partition per query after partial TakeOrdered).
  - SRP-LSH (signed random projections): 16 fixed hyperplanes -> 16-bit
    signature -> equal-signature bucket join. Hyperplanes are derived from
    md5 in *Python* at import time and inlined as literals into BOTH the
    Spark plan and the oracle SQL, so the pseudo-randomness is reproducible
    everywhere and costs nothing at runtime. The scale path: signatures
    partition the corpus so candidate generation is a bucket-local join
    instead of a cross join (same shape as an IVF coarse quantizer).

Ordering caveat: ranks are taken over cosine rounded to 9 decimals with the
candidate id as tiebreaker, so float reassociation noise (~1e-16) between
engines cannot flip the top-k boundary.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.functions.vectors import cosine_similarity


def _to_double(col) -> F.Column:
    return F.transform(F.col(col) if isinstance(col, str) else col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours per query vector (self-match excluded)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), _to_double(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", cosine_similarity("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("cos", 9).desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("cos", 4).alias("cosine"),
            F.col("rn").alias("rank"),
        )
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold. Oracle-checkable exact
    form; at scale, pre-bucket by SRP signature and join per bucket."""
    a = df.select(F.col(id_col).alias("id_a"), _to_double(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), _to_double(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity("va", "vb"))
        .filter(F.round("cos", 9) >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cosine"))
    )


# -- SRP-LSH -----------------------------------------------------------------


def srp_planes(num_planes: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): component (i, d)
    = (int(md5('srp|i|d')[:8], 16) % 10000) / 5000 - 1. Computed once in
    Python; inlined as literals in both engines."""
    planes = []
    for i in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"srp|{i}|{d}".encode()).hexdigest()
            row.append((int(h[:8], 16) % 10000) / 5000.0 - 1.0)
        planes.append(row)
    return planes


def srp_signature_expr(vec_col, planes: list[list[float]]) -> F.Column:
    """Signature = Σ_i 2^i · [round(v·pᵢ, 6) > 0]."""
    v = _to_double(vec_col)
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, p, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        bit = (F.round(dot, 6) > 0).cast("bigint")
        sig = sig + bit * F.lit(1 << i).cast("bigint")
    return sig


def srp_signature_sql(vec_sql: str, planes: list[list[float]]) -> str:
    """DuckDB rendering of :func:`srp_signature_expr` with the same inlined
    plane literals."""
    terms = []
    for i, plane in enumerate(planes):
        lits = ", ".join(repr(x) for x in plane)
        terms.append(
            f"(CASE WHEN round(list_dot_product({vec_sql}, [{lits}]), 6) > 0 "
            f"THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        )
    return "(" + " + ".join(terms) + ")"


def srp_buckets(
    df: DataFrame,
    num_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, signature): the LSH bucketing relation — group/join on
    `sig` to get candidate sets."""
    planes = srp_planes(num_planes, dim=64)
    return df.select(
        F.col(id_col), srp_signature_expr(vec_col, planes).alias("sig")
    )
