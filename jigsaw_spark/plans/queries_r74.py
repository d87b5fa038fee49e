"""Round-13 batch 4: sketch/banding sizing curves and the component
depth profile — the tables that price the 100 TB knobs themselves.

- ``dedup_signature_size_sweep``: MinHash signature-SIZE economics —
  {8, 16, 32} hashes at fixed 4-hash rows ({2, 4, 8} bands): candidate
  pairs admitted and the estimate-vs-exact Jaccard error over them.
  dedup_band_sweep prices the (bands, rows) split of ONE signature;
  this prices the signature length itself — bytes per doc vs
  estimation error, the storage knob of a planetary dedup index.
- ``mm_phash_band_sweep``: dHash banding granularity — the same
  64-bit hash banded as 8×8, 4×16, 2×32 bits: candidates, verified
  pairs (Hamming <= 6), recall vs the complete 8-band pair set and
  precision. Wider bands cut the candidate join's shuffle volume;
  the table shows what recall that buys away (pigeonhole: 4 bands
  only guarantee Hamming <= 3, 2 bands <= 1).
- ``agg_kmv_precision_curve``: k-minimum-values sketch error vs k —
  {16, 64, 256} minima per event type, estimate (k-1)·2^48 // h_k as
  an exact integer rational on the md5 48-bit hash domain. The
  engine-replayable sizing curve the DataSketches-backed
  agg_hll_mergeable cannot give (its estimates are
  implementation-defined; this one is bit-identical on both engines).
- ``graph_component_depth``: the convergence profile of the
  component machinery — per arm (text keepers / banded dHash image /
  pooled), the distribution of each node's hop distance to its
  component min (multi-source BFS from the mins, 8 relaxations, 9 =
  beyond-cap bucket). Max depth bounds the pointer-jumping /
  label-propagation supersteps a 1000-executor components job pays.

Scale notes (100 TB): every sweep computes its base relation ONCE
(shingle postings, hash bytes, distinct-hash ranks) and varies only
the bounded config dim; candidates stay band-equality joins; the BFS
relaxations are src-keyed edge joins + min-aggs, never a collected
frontier.

Reference parity: north-star extension surface (no reference
counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

_SIG_SIZES = (8, 16, 32)
_KMV_KS = (16, 64, 256)
_PHASH_BANDS = (8, 4, 2)
_DEPTH_CAP = 8

# ---------------------------------------------------------------------------
# dedup_signature_size_sweep
# ---------------------------------------------------------------------------


def _sig_size_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _SHINGLES_CTE, _TOKS_CTE

    cfg = []
    for np_ in _SIG_SIZES:
        cfg.append(f"""
    mh_{np_} AS MATERIALIZED (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range({np_})) AS seed) s
      GROUP BY doc_id, seed),
    bands_{np_} AS (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh_{np_} GROUP BY doc_id, band),
    cand_{np_} AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands_{np_} a
      JOIN bands_{np_} b ON a.band = b.band AND a.sig = b.sig
                        AND a.doc_id < b.doc_id),
    est_{np_} AS (
      SELECT c.doc_a, c.doc_b,
             CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) * 1000
               // {np_} AS BIGINT) AS est_milli
      FROM cand_{np_} c
      JOIN mh_{np_} x ON x.doc_id = c.doc_a
      JOIN mh_{np_} y ON y.doc_id = c.doc_b AND y.seed = x.seed
      GROUP BY 1, 2)""")
    rows = " UNION ALL ".join(
        f"""SELECT {np_} AS num_perm,
             CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(coalesce(sum(abs(e.est_milli - j.jac_milli)), 0)
               // greatest(count(*), 1) AS BIGINT)
               AS mean_abs_err_milli,
             CAST(coalesce(max(abs(e.est_milli - j.jac_milli)), 0)
               AS BIGINT) AS max_abs_err_milli
      FROM est_{np_} e
      JOIN jac j ON e.doc_a = j.doc_a AND e.doc_b = j.doc_b"""
        for np_ in _SIG_SIZES
    )
    cands = " UNION ".join(
        f"SELECT doc_a, doc_b FROM cand_{np_}" for np_ in _SIG_SIZES
    )
    return f"""
    WITH {_TOKS_CTE},
    {_SHINGLES_CTE},
    ssz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
            FROM sh GROUP BY 1),
    {','.join(cfg)},
    allc AS MATERIALIZED ({cands}),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS i
      FROM allc c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2),
    jac AS MATERIALIZED (
      SELECT c.doc_a, c.doc_b,
             CAST(coalesce(i.i, 0) * 1000
               // (za.sz + zb.sz - coalesce(i.i, 0)) AS BIGINT)
               AS jac_milli
      FROM allc c
      JOIN ssz za ON c.doc_a = za.doc_id
      JOIN ssz zb ON c.doc_b = zb.doc_id
      LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b)
    SELECT CAST(num_perm AS INT) AS num_perm,
           n_candidates, mean_abs_err_milli, max_abs_err_milli
    FROM ({rows})
"""


@register(
    "dedup_signature_size_sweep",
    _sig_size_sql(),
    "MinHash signature-SIZE economics: {8, 16, 32} md5 minhashes at "
    "fixed 4-hash rows ({2, 4, 8} bands) over the same 3-shingle "
    "postings — candidate pairs admitted per size and the "
    "estimate-vs-exact Jaccard error over those candidates (exact "
    "from the shingle postings, both in milli). dedup_band_sweep "
    "prices how ONE 16-hash signature is split; this prices the "
    "signature length itself — at 100 TB the signature IS the dedup "
    "index's storage bill (bytes/doc), and the error curve says "
    "what shrinking it costs. Shape: ONE shingle-posting relation "
    "feeds every config; per config a seed explode bounded by "
    "num_perm, band-equality candidates, and an exact-jaccard join "
    "computed ONCE over the union of candidate sets",
)
def dedup_signature_size_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every config's minhash signature is a PREFIX of the 32-seed one
    (mh[s] depends only on seed s), and config np's band b is the 4-seed
    slice [4b, 4b+4) — i.e. band b of the 8-band split of the 32-vector.
    So ONE kernel pass + ONE (band, sig) bucket shuffle serves all three
    configs: pair p is a config-np candidate iff its minimal shared band
    index < np/4 (cand_8 ⊆ cand_16 ⊆ cand_32 = the union the exact-
    jaccard join needs), and the per-config Jaccard estimate is an
    equality fold over the carried signature prefixes — no per-config
    explode/agg relations, no seed-level joins."""
    from jigsaw_spark.operators.dedup import doc_shingles, minhash_vector

    docs = _t(spark, sf_dir, "documents")
    sh = doc_shingles(docs, "doc_id").localCheckpoint()
    ssz = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    max_perm = max(_SIG_SIZES)
    vec = minhash_vector(docs, "doc_id", num_hashes=max_perm).localCheckpoint()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.array_join(F.slice("mhs", b * 4 + 1, 4), ",").alias("sig"),
            )
            for b in range(max_perm // 4)
        ]
    )
    banded = vec.select(
        F.col("doc_id"), F.explode(band_structs).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    buckets = (
        banded.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    # (doc_a, doc_b, mb): candidate pairs with their minimal shared band
    minband = (
        buckets.select(F.col("band"), F.explode("ids").alias("doc_a"), "ids")
        .select("band", "doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.min("band").alias("mb"))
        # single consumer (ests) — no barrier needed (r14)
    )
    ests = (
        minband.join(
            vec.select(F.col("doc_id").alias("doc_a"), F.col("mhs").alias("va")),
            "doc_a",
        )
        .join(
            vec.select(F.col("doc_id").alias("doc_b"), F.col("mhs").alias("vb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "mb",
            *[
                F.expr(
                    f"CAST(size(filter(zip_with(slice(va, 1, {np_}),"
                    f" slice(vb, 1, {np_}), (x, y) -> x = y), v -> v))"
                    f" * 1000 div {np_} AS BIGINT)"
                ).alias(f"est_{np_}")
                for np_ in _SIG_SIZES
            ],
        )
        # lazy: materializes inside the first consuming job, reused by
        # the final scored join (r14, guide §2.4)
        .localCheckpoint(eager=False)
    )
    allc = ests.select("doc_a", "doc_b")
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingle").alias("sh2"),
    )
    inter = (
        allc.join(sa, "doc_a")
        .join(
            sb,
            (allc["doc_b"] == sb["doc_b"])
            & (F.col("shingle") == F.col("sh2")),
        )
        .groupBy("doc_a", allc["doc_b"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    jac = (
        allc.join(inter, ["doc_a", "doc_b"], "left")
        .join(
            ssz.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("za")),
            "doc_a",
        )
        .join(
            ssz.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("zb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST(coalesce(i, 0) * 1000"
                " div (za + zb - coalesce(i, 0)) AS BIGINT)"
            ).alias("jac_milli"),
        )
        .localCheckpoint(eager=False)
    )
    scored = ests.join(jac, ["doc_a", "doc_b"])
    out = []
    for np_ in _SIG_SIZES:
        joined = scored.filter(F.col("mb") < np_ // 4)
        out.append(
            joined.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
                F.expr(
                    f"CAST(coalesce(sum(abs(est_{np_} - jac_milli)), 0)"
                    " div greatest(count(1), 1) AS BIGINT)"
                ).alias("mean_abs_err_milli"),
                F.expr(
                    f"CAST(coalesce(max(abs(est_{np_} - jac_milli)), 0)"
                    " AS BIGINT)"
                ).alias("max_abs_err_milli"),
            ).select(
                F.lit(np_).cast("int").alias("num_perm"),
                "n_candidates",
                "mean_abs_err_milli",
                "max_abs_err_milli",
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------------------
# mm_phash_band_sweep
# ---------------------------------------------------------------------------


def _phash_band_sweep_sql() -> str:
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    cfg = []
    for nb in _PHASH_BANDS:
        w = 8 // nb  # bytes per band
        cfg.append(f"""
    sig_{nb} AS (
      SELECT i, byte_idx // {w} AS band,
             CAST(sum(byte_val
               * power(256, {w - 1} - byte_idx % {w})) AS BIGINT)
               AS bval
      FROM ph_bytes GROUP BY 1, 2),
    cand_{nb} AS MATERIALIZED (
      SELECT DISTINCT a.i AS ia, b.i AS ib
      FROM sig_{nb} a
      JOIN sig_{nb} b ON a.band = b.band AND a.bval = b.bval
                     AND a.i < b.i),
    row_{nb} AS (
      SELECT {nb} AS n_bands,
             (SELECT CAST(count(*) AS BIGINT) FROM cand_{nb})
               AS n_candidates,
             (SELECT CAST(count(*) AS BIGINT)
              FROM cand_{nb} c JOIN ham h
                ON c.ia = h.ia AND c.ib = h.ib
              WHERE h.hamming <= 6) AS n_verified)""")
    rows = " UNION ALL ".join(
        f"SELECT * FROM row_{nb}" for nb in _PHASH_BANDS
    )
    return f"""
    WITH {_PHASH_BYTES_CTE.strip()},
    mcand AS (
      SELECT DISTINCT x.i AS ia, y.i AS ib
      FROM ph_bytes x
      JOIN ph_bytes y ON x.byte_idx = y.byte_idx
                     AND x.byte_val = y.byte_val AND x.i < y.i),
    ham AS MATERIALIZED (
      SELECT c.ia, c.ib,
             CAST(sum(bit_count(xor(x.byte_val, y.byte_val)))
               AS BIGINT) AS hamming
      FROM mcand c
      JOIN ph_bytes x ON x.i = c.ia
      JOIN ph_bytes y ON y.i = c.ib AND y.byte_idx = x.byte_idx
      GROUP BY 1, 2),
    truep AS (
      SELECT CAST(count(*) AS BIGINT) AS n_true FROM ham
      WHERE hamming <= 6),
    {','.join(cfg)}
    SELECT CAST(r.n_bands AS INT) AS n_bands,
           r.n_candidates,
           r.n_verified,
           CAST(CASE WHEN t.n_true = 0 THEN 0
             ELSE r.n_verified * 1000 // t.n_true END AS BIGINT)
             AS recall_milli,
           CAST(CASE WHEN r.n_candidates = 0 THEN 0
             ELSE r.n_verified * 1000 // r.n_candidates END AS BIGINT)
             AS precision_milli
    FROM ({rows}) r CROSS JOIN truep t
"""


@register(
    "mm_phash_band_sweep",
    _phash_band_sweep_sql(),
    "dHash banding granularity — the same 64-bit hash banded three "
    "ways (8 bands x 8 bits, 4 x 16, 2 x 32): candidate pairs from "
    "the band-equality join, Hamming-verified (<= 6) pairs among "
    "them, recall vs the complete 8-band pair set, and precision. "
    "The image twin of dedup_band_sweep's S-curve table: wider "
    "bands shrink the candidate shuffle (the 100 TB cost) but the "
    "pigeonhole guarantee decays — 4 bands only guarantee Hamming "
    "<= 3, 2 bands <= 1 — and the measured recall column prices "
    "exactly that. Shape: hash bytes computed ONCE, one bucket "
    "shuffle for the complete 8-band pair set, every coarser arm's "
    "membership a pure expression over the per-pair byte-equality "
    "mask (nested candidate sets), ONE aggregate; bounded 3-row "
    "output",
)
def mm_phash_band_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.multimodal.binary_ops import phash_dhash
    from jigsaw_spark.plans.queries_r6 import (
        _ham_pairs_from_bytes,
        _phash_images,
    )

    ph = phash_dhash(_phash_images(spark, sf_dir)).select(
        F.col("image_id").cast("bigint").alias("i"),
        "byte_idx",
        "byte_val",
    )
    # ONE relation serves every arm (r14): coarser bandings' candidate
    # sets NEST inside the 8-band set (a pair agreeing on a w-byte band
    # agrees on each of its bytes), so per-arm membership is a pure
    # expression over the per-pair byte-equality mask — no per-arm sig
    # agg, bucket shuffle, candidate checkpoint or semi-join. The whole
    # sweep is one kernel pass + one bucket shuffle + ONE aggregate.
    ham = _ham_pairs_from_bytes(ph, "i", with_byte_match=True)

    def _in_band(nb: int):
        w = 8 // nb
        m = None
        for g in range(nb):
            band_ok = F.forall(
                F.slice(F.col("meq"), g * w + 1, w), lambda x: x
            )
            m = band_ok if m is None else (m | band_ok)
        return m

    row = ham.agg(
        F.sum(F.when(F.col("hamming") <= 6, 1).otherwise(0))
        .cast("bigint")
        .alias("n_true"),
        *[
            agg
            for nb in _PHASH_BANDS
            for agg in (
                F.sum(F.when(_in_band(nb), 1).otherwise(0))
                .cast("bigint")
                .alias(f"c{nb}"),
                F.sum(
                    F.when(
                        _in_band(nb) & (F.col("hamming") <= 6), 1
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias(f"v{nb}"),
            )
        ],
    )
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(nb).cast("int").alias("n_bands"),
                        F.col(f"c{nb}").alias("n_candidates"),
                        F.col(f"v{nb}").alias("n_verified"),
                        F.when(
                            F.col("n_true") == 0, F.lit(0).cast("bigint")
                        )
                        .otherwise(
                            F.expr(f"v{nb} * 1000 div n_true")
                        )
                        .alias("recall_milli"),
                        F.when(
                            F.col(f"c{nb}") == 0, F.lit(0).cast("bigint")
                        )
                        .otherwise(
                            F.expr(f"v{nb} * 1000 div c{nb}")
                        )
                        .alias("precision_milli"),
                    )
                    for nb in _PHASH_BANDS
                ]
            )
        ).alias("r")
    ).select(
        "r.n_bands",
        "r.n_candidates",
        "r.n_verified",
        "r.recall_milli",
        "r.precision_milli",
    )


# ---------------------------------------------------------------------------
# agg_kmv_precision_curve
# ---------------------------------------------------------------------------

_KMV_DOMAIN = 1 << 48


def _kmv_curve_sql() -> str:
    ks = ", ".join(str(k) for k in _KMV_KS)
    return f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events),
    hashed AS MATERIALIZED (
      SELECT event_type, user_id,
             CAST(CAST(('0x' || substr(md5('kmv|'
               || CAST(user_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               AS BIGINT) AS h
      FROM du),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY h, user_id) AS rk
      FROM hashed),
    exact AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS exact_users
      FROM du GROUP BY 1),
    ks AS (SELECT unnest([{ks}]) AS k),
    est AS (
      SELECT e.event_type, k.k, e.exact_users,
             CAST(CASE WHEN e.exact_users < k.k THEN e.exact_users
               ELSE (k.k - 1) * {_KMV_DOMAIN}
                    // (SELECT r.h FROM ranked r
                        WHERE r.event_type = e.event_type
                          AND r.rk = k.k)
               END AS BIGINT) AS est_users
      FROM exact e CROSS JOIN ks k)
    SELECT event_type, CAST(k AS INT) AS k, exact_users, est_users,
           CAST(abs(est_users - exact_users) AS BIGINT) AS abs_err,
           CAST(abs(est_users - exact_users) * 1000 // exact_users
             AS BIGINT) AS err_milli
    FROM est
"""


@register(
    "agg_kmv_precision_curve",
    _kmv_curve_sql(),
    "KMV sketch sizing curve — distinct-count error vs k: per event "
    "type, the k-minimum-values estimate (k-1)·2^48 // h_(k) on the "
    "md5 48-bit hash domain for k in {16, 64, 256}, next to the "
    "exact count and milli error; below k distinct keys the sketch "
    "IS exact. The engine-replayable counterpart of "
    "agg_hll_mergeable's sizing question: DataSketches estimates are "
    "implementation-defined, this rational is bit-identical on both "
    "engines, so the error CURVE itself is certified. Shape: one "
    "distinct hash-agg, a rank window per |types| partition, a "
    "3-row k dim; the sketch state is k minima per type — the "
    "mergeable fixed-size summary",
)
def agg_kmv_precision_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    du = events.select("event_type", "user_id").distinct()
    hashed = du.select(
        "event_type",
        "user_id",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("kmv"), F.col("user_id").cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h", "user_id")
    ranked = hashed.withColumn("rk", F.row_number().over(w))
    exact = du.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_users")
    )
    ks = F.broadcast(
        spark.createDataFrame([(k,) for k in _KMV_KS], "k int")
    )
    kth = (
        ranked.join(ks, ranked["rk"] == ks["k"])
        .select("event_type", "k", F.col("h").alias("hk"))
    )
    est = (
        exact.crossJoin(ks)
        .join(kth, ["event_type", "k"], "left")
        .select(
            "event_type",
            "k",
            "exact_users",
            F.when(
                F.col("exact_users") < F.col("k"),
                F.col("exact_users"),
            )
            .otherwise(
                F.expr(
                    f"CAST((k - 1) * CAST({_KMV_DOMAIN} AS BIGINT)"
                    " div hk AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("est_users"),
        )
    )
    return est.select(
        "event_type",
        F.col("k").cast("int").alias("k"),
        "exact_users",
        "est_users",
        F.abs(F.col("est_users") - F.col("exact_users"))
        .cast("bigint")
        .alias("abs_err"),
        F.expr(
            "CAST(abs(est_users - exact_users) * 1000"
            " div exact_users AS BIGINT)"
        ).alias("err_milli"),
    )


# ---------------------------------------------------------------------------
# graph_component_depth
# ---------------------------------------------------------------------------


def _component_depth_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    arms = []
    for arm, etab in (
        ("text", "tedges"),
        ("image", "iedges"),
        ("pooled", "uedges"),
    ):
        stages = [f"""
    reach_{arm}(u, v) AS (
      SELECT u, v FROM {etab}
      UNION
      SELECT r.u, e.v FROM reach_{arm} r
      JOIN {etab} e ON r.v = e.u WHERE e.v <> r.u),
    mins_{arm} AS (
      SELECT u AS node, least(u, min(v)) AS component
      FROM reach_{arm} GROUP BY u),
    d0_{arm} AS (
      SELECT DISTINCT component AS node, 0 AS dist FROM mins_{arm})"""]
        for t in range(1, _DEPTH_CAP + 1):
            stages.append(f"""
    d{t}_{arm} AS MATERIALIZED (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{t - 1}_{arm}
        UNION ALL
        SELECT e.v AS node, p.dist + 1 AS dist
        FROM d{t - 1}_{arm} p JOIN {etab} e ON p.node = e.u) s
      GROUP BY node)""")
        stages.append(f"""
    lab_{arm} AS (
      SELECT '{arm}' AS arm,
             coalesce(d.dist, {_DEPTH_CAP + 1}) AS depth
      FROM mins_{arm} m
      LEFT JOIN d{_DEPTH_CAP}_{arm} d ON m.node = d.node)""")
        arms.append(",".join(stages))
    return f"""
    WITH RECURSIVE {_KEEPER_EDGES_CTE},
    {_PHASH_BYTES_CTE.strip()},
    mcand AS (
      SELECT DISTINCT x.i AS ia, y.i AS ib
      FROM ph_bytes x
      JOIN ph_bytes y ON x.byte_idx = y.byte_idx
                     AND x.byte_val = y.byte_val AND x.i < y.i),
    mpairs AS MATERIALIZED (
      SELECT ia AS doc_a, ib AS doc_b FROM (
        SELECT c.ia, c.ib,
               CAST(sum(bit_count(xor(x.byte_val, y.byte_val)))
                 AS BIGINT) AS hamming
        FROM mcand c
        JOIN ph_bytes x ON x.i = c.ia
        JOIN ph_bytes y ON y.i = c.ib AND y.byte_idx = x.byte_idx
        GROUP BY 1, 2) h
      WHERE h.hamming <= 6),
    tedges AS (SELECT u, v FROM edges),
    iedges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM mpairs
      UNION SELECT doc_b AS u, doc_a AS v FROM mpairs),
    uedges AS MATERIALIZED (
      SELECT u, v FROM tedges UNION SELECT u, v FROM iedges),
    {','.join(arms)},
    allarms AS (
      SELECT * FROM lab_text
      UNION ALL SELECT * FROM lab_image
      UNION ALL SELECT * FROM lab_pooled)
    SELECT arm, CAST(depth AS INT) AS depth,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM allarms GROUP BY 1, 2
"""


@register(
    "graph_component_depth",
    _component_depth_sql(),
    "convergence profile of the components machinery — per arm "
    "(text keeper edges / banded dHash image edges / their union, "
    "the dedup_pooled_components arms), the distribution of each "
    "graph node's hop distance to its component min: multi-source "
    f"BFS from the mins, {_DEPTH_CAP} relaxations, "
    f"{_DEPTH_CAP + 1} = beyond-cap bucket. Max depth bounds the "
    "pointer-jumping / label-propagation supersteps a distributed "
    "components job pays (each superstep is one full edge shuffle "
    "at 100 TB), and a growing pooled-arm depth means pooling "
    "builds CHAINS, not stars — exactly when transitive near-dup "
    "collapse starts over-merging. Shape: the two certified banded "
    "pair lists, per-arm src-keyed edge joins + min-aggs per "
    "relaxation (frontier never collected), a (arm, depth) "
    "hash-agg; bounded output",
)
def graph_component_depth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import component_depths, keeper_pairs
    from jigsaw_spark.plans.queries_r6 import mm_phash_near_dup

    docs = _t(spark, sf_dir, "documents")
    tpairs = keeper_pairs(docs, "doc_id").localCheckpoint()
    ipairs = (
        mm_phash_near_dup(spark, sf_dir)
        .select(
            F.col("img_a").cast("bigint").alias("doc_a"),
            F.col("img_b").cast("bigint").alias("doc_b"),
        )
        .localCheckpoint()
    )
    upairs = (
        tpairs.select("doc_a", "doc_b")
        .unionByName(ipairs)
        .distinct()
    )
    out = []
    for arm, pairs in (
        ("text", tpairs.select("doc_a", "doc_b")),
        ("image", ipairs),
        ("pooled", upairs),
    ):
        lab = component_depths(pairs, cap=_DEPTH_CAP)
        out.append(
            lab.groupBy("depth").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_nodes")
            ).select(
                F.lit(arm).alias("arm"),
                F.col("depth").cast("int").alias("depth"),
                "n_nodes",
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res
