"""Unit tests for dedup / similarity / text operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jigsaw_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from jigsaw_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    srp_buckets,
    srp_planes,
)
from jigsaw_spark.operators.text import tokens_expr


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "The quick  brown fox jumps over the lazy dog!"),  # exact dup of 1 (normalized)
        (4, "completely different words entirely here nothing shared with others"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_tokens_normalization(spark):
    df = spark.createDataFrame([("A b,C  1!",)], "text string")
    got = df.select(tokens_expr("text").alias("t")).first().t
    assert got == ["a", "b", "c", "1"]


def test_exact_dedup_finds_normalized_dup(docs):
    out = exact_dedup(docs, "doc_id").select("doc_id", "keeper", "is_dup").collect()
    got = {r.doc_id: (r.keeper, r.is_dup) for r in out}
    assert got[1] == (1, False)
    assert got[3] == (1, True)  # normalizes to same fingerprint as doc 1
    assert got[2] == (2, False)
    assert got[4] == (4, False)


def test_ngram_jaccard_near_dup(docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", threshold=0.5).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert (1, 3) in got and got[(1, 3)] == 1.0  # exact normalized dup
    assert (1, 2) in got  # near-dup
    assert all(p != (1, 4) and p != (2, 4) and p != (3, 4) for p in got)


def test_ngram_jaccard_max_posting_cap(docs):
    # with an aggressive cap the join still runs and returns a subset
    capped = ngram_jaccard_pairs(docs, "doc_id", threshold=0.5, max_posting=2)
    full = ngram_jaccard_pairs(docs, "doc_id", threshold=0.5)
    assert capped.count() <= full.count()


def test_minhash_lsh_finds_exact_dup(docs):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs, "doc_id").collect()}
    assert (1, 3) in pairs  # identical shingle sets always collide
    assert not any(4 in p for p in pairs)


def test_simhash_identical_for_normalized_dup(docs):
    sigs = {r.doc_id: r.simhash for r in simhash(docs, "doc_id").collect()}
    assert sigs[1] == sigs[3]
    assert 0 <= sigs[1] < 2**32
    assert sigs[1] != sigs[4]


def test_simhash_pairs_hamming(docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(docs, "doc_id", max_hamming=5).collect()}
    assert pairs.get((1, 3)) == 0


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_cosine_topk_ranks(vecs):
    out = cosine_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=2).collect()
    ranked = sorted(((r.rank, r.vec_id, r.cosine) for r in out))
    assert ranked[0][1] == 1  # nearest neighbour of 0 is 1
    assert ranked[0][2] > 0.99
    assert len(out) == 2 and all(r.vec_id != 0 for r in out)


def test_cosine_near_dup_threshold(vecs):
    pairs = {(r.id_a, r.id_b) for r in cosine_near_dup_pairs(vecs, 0.9).collect()}
    assert pairs == {(0, 1)}


def test_srp_buckets_deterministic_and_close_vectors_collide(spark):
    import random

    random.seed(7)
    base = [random.uniform(-1, 1) for _ in range(64)]
    near = [x + 0.001 for x in base]
    far = [random.uniform(-1, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "vec_id int, embedding array<float>"
    )
    sigs = {r.vec_id: r.sig for r in srp_buckets(df, num_planes=16).collect()}
    sigs2 = {r.vec_id: r.sig for r in srp_buckets(df, num_planes=16).collect()}
    assert sigs == sigs2  # deterministic
    assert sigs[0] == sigs[1]  # near-identical vectors share the bucket
    assert 0 <= sigs[0] < 2**16


def test_srp_planes_are_stable():
    p1 = srp_planes(2, 4)
    p2 = srp_planes(2, 4)
    assert p1 == p2
    assert all(-1.0 <= x < 1.0 for row in p1 for x in row)
