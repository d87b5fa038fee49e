"""Graph operators over edge lists (the near-dup graph's analytics side).

Connected components live in dedup.py (duplicate clustering); this module
adds PageRank — the canonical iterative message-passing workload, here for
ranking documents inside near-dup clusters (highest-rank = most-linked
canonical candidate).

Scale shape per iteration: ONE join (ranks ⋈ edges on src — both sides
hash-partitioned on the same key, so the exchange is reused across
rounds) + ONE dst-keyed agg; ranks are |V| rows, edges |E|. Lineage is
truncated every few rounds (localCheckpoint — the iterative-DataFrame
requirement, same as dedup's CC and the BPE trainer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iters: int = 10,
    undirected: bool = True,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Power-iteration PageRank. ``undirected=True`` mirrors every edge.

    Dangling nodes (out-degree 0 — impossible when undirected) keep the
    teleport share only. Returns (node, rank); ranks sum to ~1.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for it in range(n_iters):
        contribs = (
            ranks.select(F.col("node").alias("src"), "rank")
            .join(deg, "src")
            .join(e, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks
