"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Training-data-pipeline extensions (BASELINE.json north star). All variants
are compositions of built-in DataFrame ops — shuffles are on content-derived
keys (fingerprint / shingle / band signature / simhash band), which is the
standard distributed-dedup shape:

  - exact: one hash-aggregate on the normalization fingerprint.
  - n-gram Jaccard: shingle inverted index self-join → pair intersection
    counts. Scale note: at 100 TB, drop shingles whose posting list exceeds
    a cap (ultra-common shingles contribute no discrimination but quadratic
    join blowup); the cap is a parameter here, exact mode = no cap.
  - MinHash-LSH: k seeded min-hashes per doc → b bands of r rows → bucket
    join on (band, signature). Pseudo-random hash family = md5(seed|shingle)
    (portable, partition-independent; see functions/hashing.py rationale).
  - SimHash: 32-bit signature from per-token md5 nibbles, token-frequency
    weighted bit majority; near-dup = Hamming(sig_a, sig_b) <= threshold.

Every operator is expressible in ANSI SQL with identical md5-derived
randomness, so each has an exact DuckDB oracle (plans/queries_llm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jigsaw_spark.operators.text import fingerprint_expr, shingles_expr, tokens_expr


def exact_dedup(df: DataFrame, key: str, text: str = "text") -> DataFrame:
    """Assign every row its canonical keeper: min(key) over rows sharing the
    normalization fingerprint. `is_dup` marks rows to drop."""
    from pyspark.sql.window import Window

    fp = fingerprint_expr(tokens_expr(text))
    w = Window.partitionBy("fp")
    return (
        df.withColumn("fp", fp)
        .withColumn("keeper", F.min(key).over(w))
        .withColumn("is_dup", F.col(key) != F.col("keeper"))
    )


def doc_shingles(df: DataFrame, key: str, text: str = "text", n: int = 3) -> DataFrame:
    """(key, shingle) distinct pairs — the inverted-index relation."""
    toks = tokens_expr(text)
    return (
        df.select(F.col(key), toks.alias("_t"))
        .filter(F.size("_t") >= n)
        .select(F.col(key), F.explode(shingles_expr("_t", n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    key: str,
    text: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int | None = None,
) -> DataFrame:
    """Pairs (a < b) with trigram-set Jaccard >= threshold.

    ``max_posting``: scale knob — shingles appearing in more than this many
    docs are dropped before the self-join (None = exact)."""
    sh = doc_shingles(df, key, text, n)
    if max_posting is not None:
        rare = (
            sh.groupBy("shingle")
            .count()
            .filter(F.col("count") <= max_posting)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy(key).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(key).alias("doc_a"), "shingle")
    b = sh.select(F.col(key).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(key).alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(key).alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, key: str, text: str = "text", num_hashes: int = 16, n: int = 3
) -> DataFrame:
    """(key, seed, minhash) — min over md5(seed|shingle) per seed. The md5
    hex string ordering IS the 128-bit value ordering, so `min(string)` is a
    valid min-hash and is identical in every engine."""
    sh = doc_shingles(df, key, text, n)
    seeds = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed")
    h = F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle")))
    return (
        sh.select(F.col(key), "shingle", seeds)
        .groupBy(key, "seed")
        .agg(F.min(h).alias("mh"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    key: str,
    text: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on all rows of >=1 band.
    bands * rows_per_band = num_hashes. Collision prob ≈ 1-(1-j^r)^b."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, key, text, num_hashes, n)
    band_sig = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seed", "mh"))), lambda s: s["mh"]
        ),
        ",",
    )
    banded = (
        sigs.withColumn("band", F.floor(F.col("seed") / rows_per_band).cast("int"))
        .groupBy(key, "band")
        .agg(band_sig.alias("sig"))
    )
    a = banded.select(F.col(key).alias("doc_a"), "band", "sig")
    b = banded.select(F.col(key).alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _simhash_contribution(tok_md5, cnt, j):
    """±cnt contribution of one (token, bit-position) pair.

    nibble = value of hex digit j//4 of md5(token); bit = bit (3 - j%4) of
    that nibble. Spark extracts the nibble with conv(hex,16,10); the DuckDB
    oracle uses strpos('0123456789abcdef', ch)-1 — different functions,
    identical integer results (queries_llm.py keeps the SQL adjacent)."""
    nibble = F.conv(
        tok_md5.substr((F.floor(j / 4) + 1).cast("int"), F.lit(1)), 16, 10
    ).cast("int")
    bit = (F.floor(nibble / F.pow(F.lit(2.0), 3 - (j % 4))) % 2).cast("int")
    return cnt * (2 * bit - 1)


def simhash(df: DataFrame, key: str, text: str = "text", num_bits: int = 32) -> DataFrame:
    """(key, simhash): token-frequency-weighted bit-majority signature.

    Portable formulation (md5 nibble arithmetic) so the oracle matches
    bit-for-bit. Scale note: the bit explosion (x num_bits) is the
    SQL-expressible form; a production fast path would do the same in a
    vectorized pandas UDF with numpy bit ops — same output, fewer rows.
    """
    toks = (
        df.select(F.col(key), F.explode(tokens_expr(text)).alias("tok"))
        .groupBy(key, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.md5(F.col("tok")))
    )
    bits = toks.select(
        F.col(key),
        "cnt",
        "h",
        F.explode(F.array(*[F.lit(j) for j in range(num_bits)])).alias("j"),
    )
    scored = bits.withColumn(
        "contrib", _simhash_contribution(F.col("h"), F.col("cnt"), F.col("j"))
    )
    maj = (
        scored.groupBy(key, "j")
        .agg(F.sum("contrib").alias("score"))
        .withColumn("bit", (F.col("score") > 0).cast("int"))
    )
    weight = F.pow(F.lit(2.0), F.col("j")).cast("bigint")
    return maj.groupBy(key).agg(F.sum(F.col("bit") * weight).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    key: str,
    text: str = "text",
    max_hamming: int = 2,
    num_bits: int = 32,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. The all-pairs join here
    is the oracle-checkable form; the scale path buckets signatures into
    (num_bits/max_hamming)-bit bands first (pigeonhole: any pair within
    max_hamming agrees exactly on >=1 band) and joins per band."""
    sigs = simhash(df, key, text, num_bits)
    a = sigs.select(F.col(key).alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = sigs.select(F.col(key).alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
