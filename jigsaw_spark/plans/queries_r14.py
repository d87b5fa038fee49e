"""Round-5 batch 8: graph statistics, robust trends, clickstream
transitions, and anomaly screening —

- ``graph_assortativity``: degree assortativity of the LSH candidate
  graph — the Pearson correlation of endpoint degrees over the edge
  list, the hub-to-hub vs hub-to-leaf mixing diagnostic; moments are
  exact integers via the quantized-anchor discipline.
- ``graph_modularity``: Newman modularity of the SimHash duplicate
  clustering — Q emitted as the exact integer rational
  (sum_c 4*m*e_c - d_c^2) / 4m^2, the standard "is this clustering
  better than chance" score for dedup cluster quality.
- ``ts_theil_sen``: the Theil-Sen robust trend — the median of all
  pairwise slopes of the per-type daily series; slopes stay exact
  (dy, dx) integer pairs, the median is a nearest-rank selection
  ordered by the (engine-identical) IEEE quotient with an integer
  tie-break, and the reported slope is a truncated-division
  milli-unit.
- ``rel_markov_transitions``: first-order Markov transition matrix of
  event types within 30-minute sessions — the clickstream model
  behind next-action prediction and funnel simulation; probabilities
  are floor-division micro-units.
- ``ts_anomaly_iqr``: Tukey-fence anomaly flags on per-type daily
  totals — days outside [p25 - 1.5*IQR, p75 + 1.5*IQR], with the
  fences DOUBLED so 1.5x stays integral; composes the nearest-rank
  quartile machinery into the standard ops anomaly screen.

Float discipline: the only doubles are the assortativity coefficient
(one shared round-snapped ratio of exact integer sums; IEEE sqrt is
correctly rounded in both engines, the ab_ttest_welch precedent) and
the Theil-Sen ORDERING quotient (exact ints < 2^53 divided once —
bit-identical in both engines; never emitted). Everything emitted is
integer except those two audited ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register
from jigsaw_spark.plans.queries_r7 import _lsh_edges_cte

# ---------------------------------------------------------------------------
# graph_assortativity
# ---------------------------------------------------------------------------

_ASSORT_SQL = f"""
    WITH {_lsh_edges_cte()},
    deg AS MATERIALIZED (
      SELECT src, count(*) AS d FROM edges GROUP BY src),
    ed AS (
      SELECT da.d AS x, db.d AS y
      FROM edges e
      JOIN deg da ON e.src = da.src
      JOIN deg db ON e.dst = db.src),
    anchors AS (
      SELECT count(*) AS ne,
             CAST(sum(x) AS BIGINT) // count(*) AS mx,
             CAST(sum(y) AS BIGINT) // count(*) AS my
      FROM ed),
    m AS (
      SELECT a.ne, a.mx, a.my,
             CAST(sum((x - mx) * (y - my)) AS BIGINT) AS sxy,
             CAST(sum((x - mx) * (x - mx)) AS BIGINT) AS sxx,
             CAST(sum((y - my) * (y - my)) AS BIGINT) AS syy
      FROM ed CROSS JOIN anchors a
      GROUP BY a.ne, a.mx, a.my)
    SELECT CAST(ne AS BIGINT) AS n_edges,
           CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
           CAST(syy AS BIGINT) AS syy,
           CASE WHEN sxx > 0 AND syy > 0
                THEN round(round(
                       CAST(sxy AS DOUBLE)
                       / (sqrt(CAST(sxx AS DOUBLE))
                          * sqrt(CAST(syy AS DOUBLE))), 9), 6)
                ELSE CAST(0.0 AS DOUBLE) END AS assortativity
    FROM m
"""


@register(
    "graph_assortativity",
    _ASSORT_SQL,
    "degree assortativity of the LSH candidate graph: Pearson "
    "correlation of endpoint degrees over the (symmetric) edge list — "
    "positive = hubs attach to hubs (clique-like dup clusters), "
    "negative = hub-and-spoke collisions. Anchor means snap to "
    "integers by floor division so every moment is an exact integer "
    "sum; the coefficient is ONE shared expression (IEEE sqrt is "
    "correctly rounded in both engines — the Welch-t precedent), "
    "round-snapped 9-then-6. Shape: one degree agg joined twice into "
    "the edge list, one moment agg — all candidate-edge sized",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = (
        edges.join(deg.select(F.col("src"), F.col("d").alias("x")), "src")
        .join(
            deg.select(
                F.col("src").alias("dst"), F.col("d").alias("y")
            ),
            "dst",
        )
        .select("x", "y")
    )
    anchors = ed.agg(
        F.count(F.lit(1)).alias("ne"),
        F.expr("CAST(sum(x) AS BIGINT) div count(*)").alias("mx"),
        F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("my"),
    )
    m = (
        ed.crossJoin(F.broadcast(anchors))
        .groupBy("ne", "mx", "my")
        .agg(
            F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")))
            .cast("bigint")
            .alias("sxy"),
            F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")))
            .cast("bigint")
            .alias("sxx"),
            F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")))
            .cast("bigint")
            .alias("syy"),
        )
    )
    return m.select(
        F.col("ne").cast("bigint").alias("n_edges"),
        F.col("sxy").cast("bigint").alias("sxy"),
        F.col("sxx").cast("bigint").alias("sxx"),
        F.col("syy").cast("bigint").alias("syy"),
        F.when(
            (F.col("sxx") > 0) & (F.col("syy") > 0),
            F.round(
                F.round(
                    F.col("sxy").cast("double")
                    / (
                        F.sqrt(F.col("sxx").cast("double"))
                        * F.sqrt(F.col("syy").cast("double"))
                    ),
                    9,
                ),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# graph_modularity
# ---------------------------------------------------------------------------


def _modularity_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _SIMHASH_KEEPER_CTE

    return f"""
    WITH RECURSIVE {_SIMHASH_KEEPER_CTE},
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS MATERIALIZED (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach GROUP BY u),
    mm AS (SELECT count(*) AS m FROM pairs),
    intra AS (
      SELECT ca.component, count(*) AS ec
      FROM pairs p
      JOIN comp ca ON p.doc_a = ca.doc_id
      JOIN comp cb ON p.doc_b = cb.doc_id
      WHERE ca.component = cb.component
      GROUP BY ca.component),
    degs AS (
      SELECT c.component, sum(d.deg) AS dc
      FROM (SELECT u, count(*) AS deg FROM edges GROUP BY u) d
      JOIN comp c ON d.u = c.doc_id
      GROUP BY c.component),
    q AS (
      SELECT CAST(sum(4 * mm.m * coalesce(i.ec, 0) - d.dc * d.dc)
                  AS BIGINT) AS q_num,
             CAST(4 * any_value(mm.m) * any_value(mm.m) AS BIGINT) AS q_den
      FROM degs d
      LEFT JOIN intra i ON d.component = i.component
      CROSS JOIN mm)
    SELECT q_num, q_den,
           CASE WHEN q_den > 0
                THEN round(round(CAST(q_num AS DOUBLE) / q_den, 9), 6)
                ELSE CAST(0.0 AS DOUBLE) END AS modularity
    FROM q
"""


@register(
    "graph_modularity",
    _modularity_sql(),
    "Newman modularity of the SimHash duplicate clustering: Q = "
    "sum_c [e_c/m - (d_c/2m)^2], emitted as the EXACT integer "
    "rational (sum 4*m*e_c - d_c^2) / 4m^2 plus the snapped quotient "
    "— the 'is this dedup clustering better than chance' quality "
    "score. Composes the connected-components operator (Spark: "
    "min-label propagation; oracle: recursive CTE) with two "
    "component-keyed aggs over the pair/edge dims; everything after "
    "the SimHash pass is candidate-edge sized. The graph is built "
    "over EXACT-DEDUP KEEPERS (r6 scale fix, both sides): byte-"
    "identical copies carry no clustering-quality signal but turn "
    "every dup group into a x|copies|² edge clique (the 11x probe); "
    "collapsing them first keeps the pair graph duplication-proof",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        simhash_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    # the pair relation feeds comp, both edge directions, mm and intra —
    # uncheckpointed, the exact-dedup + simhash kernel lineage evaluated
    # 6x (the _before plan shows 14 Python kernel nodes); materialize the
    # candidate pairs once, and comp once (it feeds intra AND degs)
    pairs = (
        simhash_pairs(keepers, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    comp = connected_components(pairs).select(
        F.col("doc_id"), F.col("component")
    ).localCheckpoint()
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).union(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    mm = pairs.agg(F.count(F.lit(1)).alias("m"))
    intra = (
        pairs.join(
            comp.select(
                F.col("doc_id").alias("doc_a"),
                F.col("component").alias("comp_a"),
            ),
            "doc_a",
        )
        .join(
            comp.select(
                F.col("doc_id").alias("doc_b"),
                F.col("component").alias("comp_b"),
            ),
            "doc_b",
        )
        .filter(F.col("comp_a") == F.col("comp_b"))
        .groupBy(F.col("comp_a").alias("component"))
        .agg(F.count(F.lit(1)).alias("ec"))
    )
    degs = (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).alias("deg"))
        .join(comp.select(F.col("doc_id").alias("u"), "component"), "u")
        .groupBy("component")
        .agg(F.sum("deg").alias("dc"))
    )
    q = (
        degs.join(F.broadcast(intra), "component", "left_outer")
        .crossJoin(F.broadcast(mm))
        .agg(
            F.sum(
                4 * F.col("m") * F.coalesce("ec", F.lit(0))
                - F.col("dc") * F.col("dc")
            )
            .cast("bigint")
            .alias("q_num"),
            (4 * F.first("m") * F.first("m")).cast("bigint").alias("q_den"),
        )
    )
    return q.select(
        "q_num",
        "q_den",
        F.when(
            F.col("q_den") > 0,
            F.round(
                F.round(F.col("q_num").cast("double") / F.col("q_den"), 9), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("modularity"),
    )


# ---------------------------------------------------------------------------
# ts_theil_sen
# ---------------------------------------------------------------------------

_TDIV = "CASE WHEN {x} >= 0 THEN {x} // {d} ELSE -((-({x})) // {d}) END"

_THEIL_SQL = f"""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id,
             CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                  // 100 AS BIGINT) AS yd
      FROM events GROUP BY 1, 2),
    prs AS (
      SELECT a.event_type,
             b.yd - a.yd AS dy, b.day_id - a.day_id AS dx,
             a.day_id AS di, b.day_id AS dj
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day_id < b.day_id),
    ranked AS (
      SELECT event_type, dy, dx,
             count(*) OVER (PARTITION BY event_type) AS np,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(dy AS DOUBLE) / dx, dy, dx, di, dj) AS rn
      FROM prs)
    SELECT event_type,
           CAST(np AS BIGINT) AS n_pairs,
           CAST(dy AS BIGINT) AS slope_dy,
           CAST(dx AS BIGINT) AS slope_dx,
           CAST({_TDIV.format(x='1000 * dy', d='dx')} AS BIGINT)
             AS slope_milli
    FROM ranked WHERE rn = (np + 1) // 2
"""


@register(
    "ts_theil_sen",
    _THEIL_SQL,
    "Theil-Sen robust trend per event type: the median of all "
    "pairwise slopes of the daily-dollars series — outlier-proof "
    "where OLS is not. Slopes remain EXACT integer (dy, dx) pairs; "
    "the median is a nearest-rank selection ordered by the IEEE "
    "quotient dy/dx (exact ints < 2^53 divided once — bit-identical "
    "across engines, used only for ORDERING) with a total integer "
    "tie-break, and the reported slope is the truncated-division "
    "milli-unit. The pair join is per-type over the calendar-bounded "
    "day dim (|days|^2 pairs per type, never fact rows)",
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias(
            "day_id"
        ),
    ).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)"
            " div 100 AS BIGINT)"
        ).alias("yd")
    )
    a = daily.select(
        "event_type", F.col("day_id").alias("di"), F.col("yd").alias("yi")
    )
    b = daily.select(
        "event_type", F.col("day_id").alias("dj"), F.col("yd").alias("yj")
    )
    prs = (
        a.join(b, "event_type")
        .filter(F.col("di") < F.col("dj"))
        .select(
            "event_type",
            (F.col("yj") - F.col("yi")).alias("dy"),
            (F.col("dj") - F.col("di")).alias("dx"),
            "di",
            "dj",
        )
    )
    ranked = prs.select(
        "event_type",
        "dy",
        "dx",
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("np"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.col("dy").cast("double") / F.col("dx"),
                "dy",
                "dx",
                "di",
                "dj",
            )
        )
        .alias("rn"),
    )
    return ranked.filter(F.col("rn") == F.expr("(np + 1) div 2")).select(
        "event_type",
        F.col("np").cast("bigint").alias("n_pairs"),
        F.col("dy").cast("bigint").alias("slope_dy"),
        F.col("dx").cast("bigint").alias("slope_dx"),
        F.expr("CAST((1000 * dy) div dx AS BIGINT)").alias("slope_milli"),
    )


# ---------------------------------------------------------------------------
# rel_markov_transitions
# ---------------------------------------------------------------------------

_MARKOV_SQL = """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS x, event_id
      FROM events),
    hops AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER w AS to_type,
             lead(x) OVER w - x AS gap_us
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY x, event_id)),
    t AS (
      SELECT from_type, to_type, count(*) AS n
      FROM hops
      WHERE to_type IS NOT NULL AND gap_us < 1800000000
      GROUP BY 1, 2),
    f AS (SELECT from_type, sum(n) AS nf FROM t GROUP BY 1)
    SELECT t.from_type, t.to_type,
           CAST(t.n AS BIGINT) AS n,
           CAST(t.n * 1000000 // f.nf AS BIGINT) AS p_micro
    FROM t JOIN f ON t.from_type = f.from_type
"""


@register(
    "rel_markov_transitions",
    _MARKOV_SQL,
    "first-order Markov transition matrix of event types within "
    "30-minute sessions — consecutive same-user events closer than "
    "the session gap become (from -> to) transitions, row-normalized "
    "to floor-division micro-probabilities; the clickstream model "
    "behind next-action prediction and funnel simulation. Shape: ONE "
    "user-partitioned lead window (total order on ts+event_id), one "
    "|types|^2 hash agg, one broadcast row-total join — the fact "
    "table is scanned once",
)
def rel_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("x"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("x", "event_id")
    hops = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
        (F.lead("x").over(w) - F.col("x")).alias("gap_us"),
    )
    t = (
        hops.filter(
            F.col("to_type").isNotNull() & (F.col("gap_us") < 1800000000)
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    f = t.groupBy("from_type").agg(F.sum("n").alias("nf"))
    return t.join(F.broadcast(f), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(n * 1000000 div nf AS BIGINT)").alias("p_micro"),
    )


# ---------------------------------------------------------------------------
# ts_anomaly_iqr
# ---------------------------------------------------------------------------

_IQR_SQL = """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    g AS (
      SELECT event_type, y, count(*) AS c FROM daily GROUP BY 1, 2),
    cum AS (
      SELECT event_type, y,
             sum(c) OVER (PARTITION BY event_type ORDER BY y) AS cc,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM g),
    quart AS MATERIALIZED (
      SELECT event_type,
             min(CASE WHEN cc >= (25 * n + 99) // 100 THEN y END) AS p25,
             min(CASE WHEN cc >= (75 * n + 99) // 100 THEN y END) AS p75
      FROM cum GROUP BY event_type)
    SELECT d.event_type, CAST(d.day_id AS BIGINT) AS day_id,
           CAST(d.y AS BIGINT) AS y_cents,
           CAST(3 * q.p25 - q.p75 AS BIGINT) AS lo2_watch,
           CAST(3 * q.p75 - q.p25 AS BIGINT) AS hi2_watch,
           CAST(CASE WHEN 2 * d.y < 3 * q.p25 - q.p75 THEN -1 ELSE 1
                END AS INT) AS direction,
           CAST(CASE WHEN 2 * d.y < 5 * q.p25 - 3 * q.p75
                       OR 2 * d.y > 5 * q.p75 - 3 * q.p25
                     THEN 2 ELSE 1 END AS INT) AS severity
    FROM daily d JOIN quart q ON d.event_type = q.event_type
    WHERE 2 * d.y < 3 * q.p25 - q.p75
       OR 2 * d.y > 3 * q.p75 - q.p25
"""


@register(
    "ts_anomaly_iqr",
    _IQR_SQL,
    "two-level Tukey-fence anomaly screen on per-type daily totals "
    "with nearest-rank quartiles: severity 1 (watch) outside the "
    "0.5*IQR inner fence, severity 2 (alert) outside the standard "
    "1.5*IQR outer fence; all fences are DOUBLED (2y vs 3*p25-p75 / "
    "5*p25-3*p75) so the half-integer multipliers stay integral — no "
    "float enters any comparison. Composes the exact-percentile "
    "machinery into the standard ops outlier report. Shape: quartiles "
    "from the distinct-value cumulative dim (partitioned windows), "
    "one broadcast join back to the daily dim; one fact scan",
)
def ts_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias(
            "day_id"
        ),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("y"))
    g = daily.groupBy("event_type", "y").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("y")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cum = g.select(
        "event_type",
        "y",
        F.sum("c").over(w).alias("cc"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    quart = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cc") >= F.expr("(25 * n + 99) div 100"), F.col("y"))
        ).alias("p25"),
        F.min(
            F.when(F.col("cc") >= F.expr("(75 * n + 99) div 100"), F.col("y"))
        ).alias("p75"),
    )
    lo2w = 3 * F.col("p25") - F.col("p75")
    hi2w = 3 * F.col("p75") - F.col("p25")
    lo2a = 5 * F.col("p25") - 3 * F.col("p75")
    hi2a = 5 * F.col("p75") - 3 * F.col("p25")
    return (
        daily.join(F.broadcast(quart), "event_type")
        .filter((2 * F.col("y") < lo2w) | (2 * F.col("y") > hi2w))
        .select(
            "event_type",
            F.col("day_id").cast("bigint").alias("day_id"),
            F.col("y").cast("bigint").alias("y_cents"),
            lo2w.cast("bigint").alias("lo2_watch"),
            hi2w.cast("bigint").alias("hi2_watch"),
            F.when(2 * F.col("y") < lo2w, -1)
            .otherwise(1)
            .cast("int")
            .alias("direction"),
            F.when(
                (2 * F.col("y") < lo2a) | (2 * F.col("y") > hi2a), 2
            )
            .otherwise(1)
            .cast("int")
            .alias("severity"),
        )
    )
