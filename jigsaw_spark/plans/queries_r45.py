"""Round-9 batch 5: split-leakage auditing, small-cell suppression, and
the ANN quality curve.

- ``dq_split_user_leakage``: the audit for a NAIVE temporal split —
  events are cut at the 80% point of the day span (train <= cut <
  eval) and the query reports how many eval-side users also appear in
  train, plus the share of eval events those seen users contribute.
  This is the measurement that motivates p_leakage_safe_split /
  p_group_kfold: a user-level model evaluated on users it trained on
  reports inflated metrics, and this number is how much of the eval
  set is compromised.
- ``privacy_small_cell``: small-cell suppression release — (event_type,
  day) cells with fewer than k=5 rows are withheld; per event type the
  release reports kept/suppressed cells and row shares. The
  tabular-release sibling of privacy_kanon_release (suppress the cell
  instead of generalizing the key), the rule census bureaus and health
  agencies apply before publishing counts.
- ``ann_recall_curve``: recall@{1,5,10} of the IVF (nprobe=2) search
  against the brute-force cosine truth, per query — THE ANN quality
  metric: the entire point of an approximate index is trading recall
  for scan cost, and this curve is how that trade is tuned. Both
  sides reuse the certified rank rules (cosine rounded to 9 with id
  tiebreak), so hits and recall are exact integers.

Scale notes (100 TB): the leakage audit is two distinct hash-aggs and
a semi-join on user_id (never a pair join); suppression is one
cell-grain hash-agg + a per-type rollup; the recall curve joins two
k-bounded rank tables (5 queries x 10 rows each) — the expensive part
is the candidate generation already probed under ann_ivf_topk /
ann_cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# dq_split_user_leakage
# ---------------------------------------------------------------------------

_LEAKAGE_SQL = """
    WITH days AS (
      SELECT user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events),
    cut AS MATERIALIZED (
      SELECT min(day) + (max(day) - min(day)) * 8 // 10 AS cut_day
      FROM days),
    train_u AS MATERIALIZED (
      SELECT DISTINCT user_id FROM days
      WHERE day <= (SELECT cut_day FROM cut)),
    eval_rows AS (
      SELECT d.user_id,
             CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS seen
      FROM days d LEFT JOIN train_u t ON d.user_id = t.user_id
      WHERE d.day > (SELECT cut_day FROM cut)),
    eval_u AS (
      SELECT user_id, max(seen) AS seen, count(*) AS n_ev
      FROM eval_rows GROUP BY 1)
    SELECT CAST((SELECT cut_day FROM cut) AS BIGINT) AS cut_day,
           CAST((SELECT count(*) FROM train_u) AS BIGINT) AS train_users,
           CAST(count(*) AS BIGINT) AS eval_users,
           CAST(sum(seen) AS BIGINT) AS leaked_users,
           CAST(sum(seen) * 1000 // count(*) AS BIGINT)
             AS leaked_user_milli,
           CAST(sum(n_ev) AS BIGINT) AS eval_events,
           CAST(sum(seen * n_ev) AS BIGINT) AS leaked_events,
           CAST(sum(seen * n_ev) * 1000 // sum(n_ev) AS BIGINT)
             AS leaked_event_milli
    FROM eval_u
"""


@register(
    "dq_split_user_leakage",
    _LEAKAGE_SQL,
    "audit of a NAIVE temporal split: cut the day span at its 80% "
    "point (train <= cut < eval) and report how many eval users also "
    "appear in train plus the share of eval events those seen users "
    "contribute — the measurement that motivates the group-aware "
    "splitters (p_leakage_safe_split, p_group_kfold): a user-level "
    "model evaluated on its own training users reports inflated "
    "metrics, and this is how much of the eval set is compromised. "
    "The cut is domain-based (min + span*8 div 10), exact integers "
    "throughout. Shape: one day-grain projection, two DISTINCT "
    "hash-aggs, one user-keyed left join — never a pair join; at "
    "100 TB this is two shuffles on user_id",
)
def dq_split_user_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    )
    cut = days.agg(
        (
            F.min("day") + F.expr("(max(day) - min(day)) * 8 div 10")
        ).alias("cut_day")
    )
    with_cut = days.crossJoin(F.broadcast(cut))
    train_u = (
        with_cut.filter(F.col("day") <= F.col("cut_day"))
        .select("user_id")
        .distinct()
    )
    n_train = train_u.agg(
        F.count(F.lit(1)).cast("bigint").alias("train_users")
    )
    eval_rows = with_cut.filter(F.col("day") > F.col("cut_day")).join(
        train_u.select(F.col("user_id").alias("tu")),
        F.col("user_id") == F.col("tu"),
        "left",
    )
    eval_u = eval_rows.groupBy("user_id").agg(
        F.max(
            F.when(F.col("tu").isNotNull(), 1).otherwise(0)
        ).alias("seen"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return (
        eval_u.agg(
            F.count(F.lit(1)).cast("bigint").alias("eval_users"),
            F.sum("seen").cast("bigint").alias("leaked_users"),
            F.expr(
                "CAST(sum(seen) * 1000 div count(*) AS BIGINT)"
            ).alias("leaked_user_milli"),
            F.sum("n_ev").cast("bigint").alias("eval_events"),
            F.sum(F.col("seen") * F.col("n_ev"))
            .cast("bigint")
            .alias("leaked_events"),
            F.expr(
                "CAST(sum(seen * n_ev) * 1000 div sum(n_ev) AS BIGINT)"
            ).alias("leaked_event_milli"),
        )
        .crossJoin(F.broadcast(cut))
        .crossJoin(F.broadcast(n_train))
        .select(
            F.col("cut_day").cast("bigint").alias("cut_day"),
            "train_users",
            "eval_users",
            "leaked_users",
            "leaked_user_milli",
            "eval_events",
            "leaked_events",
            "leaked_event_milli",
        )
    )


# ---------------------------------------------------------------------------
# privacy_small_cell
# ---------------------------------------------------------------------------

_SMALL_CELL_SQL = """
    WITH cells AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS suppressed_cells,
           CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT)
             AS suppressed_rows,
           CAST(sum(CASE WHEN c >= 5 THEN c ELSE 0 END) AS BIGINT)
             AS released_rows,
           CAST(sum(CASE WHEN c >= 5 THEN c ELSE 0 END) * 1000
                // sum(c) AS BIGINT) AS released_milli
    FROM cells GROUP BY 1
"""


@register(
    "privacy_small_cell",
    _SMALL_CELL_SQL,
    "small-cell suppression release: (event_type, day) cells with "
    "fewer than k=5 rows are withheld; per type the release reports "
    "kept/suppressed cells and row shares — the tabular-release "
    "sibling of privacy_kanon_release (suppress the cell instead of "
    "generalizing the key), the pre-publication rule for census/"
    "health count tables, and the quick audit of how much data a "
    "given k withholds. Shape: one cell-grain hash-agg + a per-type "
    "rollup — two shuffles, nothing row-level ever leaves the first "
    "agg",
)
def privacy_small_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return cells.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.when(F.col("c") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("suppressed_cells"),
        F.sum(F.when(F.col("c") < 5, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("suppressed_rows"),
        F.sum(F.when(F.col("c") >= 5, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("released_rows"),
        F.expr(
            "CAST(sum(CASE WHEN c >= 5 THEN c ELSE 0 END) * 1000"
            " div sum(c) AS BIGINT)"
        ).alias("released_milli"),
    )


# ---------------------------------------------------------------------------
# ann_recall_curve
# ---------------------------------------------------------------------------

_RECALL_SQL = """
    WITH cent AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings WHERE vec_id < 8),
    assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round(list_cosine_similarity(
                   e.embedding::DOUBLE[], c.cvec), 9) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c) t
      WHERE rn = 1),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cid AS cell,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                   q.embedding::DOUBLE[], c.cvec), 9) DESC, c.cid) AS rn
        FROM embeddings q CROSS JOIN cent c
        WHERE q.vec_id < 5) t
      WHERE rn <= 2),
    ivf AS (
      SELECT query_id, vec_id, rank FROM (
        SELECT p.query_id, a.vec_id,
               CAST(row_number() OVER (PARTITION BY p.query_id
                 ORDER BY round(list_cosine_similarity(
                   q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 9)
                 DESC, a.vec_id) AS INT) AS rank
        FROM probes p
        JOIN assign a ON a.cell = p.cell
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings e ON e.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id) t
      WHERE rank <= 10),
    bf AS (
      SELECT query_id, vec_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               CAST(row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                   q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 9)
                 DESC, c.vec_id) AS INT) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 5) t
      WHERE rank <= 10),
    kdim AS (SELECT unnest([1, 5, 10]) AS k),
    qk AS (
      SELECT DISTINCT b.query_id, kdim.k FROM bf b CROSS JOIN kdim),
    hits AS (
      SELECT b.query_id, kd.k, CAST(count(*) AS BIGINT) AS hits
      FROM bf b
      JOIN ivf i ON b.query_id = i.query_id AND b.vec_id = i.vec_id
      CROSS JOIN kdim kd
      WHERE b.rank <= kd.k AND i.rank <= kd.k
      GROUP BY 1, 2)
    SELECT qk.query_id, CAST(qk.k AS INT) AS k,
           CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           CAST(coalesce(h.hits, 0) * 1000 // qk.k AS BIGINT)
             AS recall_milli
    FROM qk LEFT JOIN hits h
      ON qk.query_id = h.query_id AND qk.k = h.k
"""


@register(
    "ann_recall_curve",
    _RECALL_SQL,
    "recall@{1,5,10} of the IVF nprobe=2 search against the "
    "brute-force cosine truth, per query — THE ANN quality metric: an "
    "approximate index trades recall for scan cost, and this curve is "
    "how nprobe / cell count get tuned before anyone trusts the index "
    "(pairs ann_cosine_topk, the truth, with ann_ivf_topk, the scale "
    "path). Both sides reuse the certified rank rules (cosine rounded "
    "to 9, id tiebreak), so hits and recall_milli are exact integers. "
    "Shape: joins two k-bounded rank tables (queries x 10 rows each); "
    "the candidate generation cost lives in the probed ann_* plans, "
    "not here",
)
def ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.similarity import cosine_topk, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    bf = cosine_topk(emb, queries, k=10).select(
        "query_id", F.col("vec_id").alias("bvec"), F.col("rank").alias("bf_rank")
    )
    ivf = ivf_topk(emb, queries, centroids, k=10, nprobe=2).select(
        F.col("query_id").alias("iq"),
        F.col("vec_id").alias("ivec"),
        F.col("rank").alias("ivf_rank"),
    )
    kdim = F.broadcast(
        spark.createDataFrame([(1,), (5,), (10,)], "k int")
    )
    qk = bf.select("query_id").distinct().crossJoin(kdim)
    hits = (
        bf.join(
            ivf,
            (F.col("query_id") == F.col("iq"))
            & (F.col("bvec") == F.col("ivec")),
        )
        .crossJoin(kdim)
        .filter(
            (F.col("bf_rank") <= F.col("k"))
            & (F.col("ivf_rank") <= F.col("k"))
        )
        .groupBy("query_id", "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    return qk.join(hits, ["query_id", "k"], "left").select(
        "query_id",
        F.col("k").cast("int").alias("k"),
        F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"),
        F.expr(
            "CAST(coalesce(hits, 0) * 1000 div k AS BIGINT)"
        ).alias("recall_milli"),
    )
