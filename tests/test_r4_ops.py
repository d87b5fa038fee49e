"""Round-4 operators: line-level dedup, SQ8 quantization, BPE training.

The oracle gate (tools/verify_oracle.py) value-checks `dedup_lines` and
`ann_sq8` against DuckDB at sf0.01; these tests pin the invariants and, for
the non-SQL-expressible BPE trainer, bit-exact parity with a pure-Python
reference implementation.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_lines_drops_cross_doc_repeats(spark):
    from jigsaw_spark.operators.dedup import dedup_lines

    df = _docs(
        spark,
        [
            (1, "unique one\nSHARED LINE\ntail one"),
            (2, "unique two\nSHARED LINE"),
            (3, "  SHARED LINE  \nonly in three"),  # trim-normalized match
            (4, "SOLO LINE\nSOLO LINE"),  # intra-doc repeat: kept (1 doc)
        ],
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"])
        for r in dedup_lines(df, "doc_id", "text").collect()
    }
    assert out[1] == ("unique one\ntail one", 2)
    assert out[2] == ("unique two", 1)
    assert out[3] == ("only in three", 1)
    # intra-document repetition is not cross-corpus boilerplate
    assert out[4] == ("SOLO LINE\nSOLO LINE", 2)


def test_dedup_lines_doc_fully_boilerplate_vanishes(spark):
    from jigsaw_spark.operators.dedup import dedup_lines

    df = _docs(spark, [(1, "same"), (2, "same"), (3, "other")])
    got = dedup_lines(df, "doc_id", "text").collect()
    assert {r["doc_id"] for r in got} == {3}


def test_sq8_codes_bounds_and_error(spark):
    from jigsaw_spark.operators.similarity import sq8_quantize

    emb = spark.createDataFrame(
        [(i, [float(i), -1.0 + 0.25 * i, 7.0]) for i in range(9)],
        "vec_id long, embedding array<float>",
    )
    rows = sq8_quantize(emb).collect()
    assert len(rows) == 9
    for r in rows:
        assert all(0 <= c <= 255 for c in r["codes"])
        # constant dimension (7.0) must quantize to code 0 with zero error
        assert r["codes"][2] == 0
    # max reconstruction error bounded by half a quantization step per dim:
    # the widest range is 8.0 (dim 0) -> step 8/255
    assert all(r["max_abs_err"] <= 8.0 / 255 / 2 + 1e-9 for r in rows)
    # extremes hit the code range exactly
    by_id = {r["vec_id"]: r["codes"] for r in rows}
    assert by_id[0][0] == 0 and by_id[8][0] == 255


def _bpe_reference(word_counts, n_merges, min_count=2):
    """Pure-Python BPE with the same (freq DESC, left, right) tiebreak and
    greedy left-to-right non-overlapping merge."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, toks in vocab.items():
            c = word_counts[w]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((rank, a, b, n))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_pure_python(spark):
    from jigsaw_spark.operators.text import bpe_train

    texts = [
        "the cat sat on the mat",
        "the cats chatter on the matter",
        "that cat that sat",
        "scatter the chatter",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges_df, vocab_df = bpe_train(df, "text", n_merges=12)

    counts: dict[str, int] = {}
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    ref_merges, ref_vocab = _bpe_reference(counts, 12)

    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in merges_df.orderBy("rank").collect()
    ]
    assert got == ref_merges
    got_vocab = {r["w"]: list(r["toks"]) for r in vocab_df.collect()}
    assert got_vocab == ref_vocab


def test_bpe_fold_merges_left_to_right_non_overlapping(spark):
    from jigsaw_spark.operators.text import bpe_train

    # "aaaa" with top pair (a,a) must become [aa, aa], not [aa, a, a] or a
    # re-merged [aaaa] — the greedy non-overlapping contract.
    df = spark.createDataFrame([("aaaa aaaa aaa",)], "text string")
    merges_df, vocab_df = bpe_train(df, "text", n_merges=1)
    m = merges_df.collect()
    assert [(r["left"], r["right"]) for r in m] == [("a", "a")]
    toks = {r["w"]: list(r["toks"]) for r in vocab_df.collect()}
    assert toks["aaaa"] == ["aa", "aa"]
    assert toks["aaa"] == ["aa", "a"]


def test_bpe_encode_matches_training_vocab(spark):
    from jigsaw_spark.operators.text import bpe_encode, bpe_train

    texts = [
        "the cat sat on the mat",
        "the cats chatter on the matter",
        "that cat that sat",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_df, vocab_df = bpe_train(df, "text", n_merges=8)
    merges = [
        (r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()
    ]
    vocab = {r["w"]: list(r["toks"]) for r in vocab_df.collect()}

    enc = {
        r["doc_id"]: (list(r["pieces"]), r["n_pieces"])
        for r in bpe_encode(df, merges, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        expect = [
            p
            for w in re.split(r"[^a-z0-9]+", t.lower())
            if w
            for p in vocab[w]
        ]
        assert enc[i] == (expect, len(expect))

    # unseen word still encodes deterministically from chars + merges
    df2 = spark.createDataFrame([(9, "thematic")], "doc_id long, text string")
    got = bpe_encode(df2, merges, "doc_id", "text").collect()[0]
    assert "".join(got["pieces"]) == "thematic"


def test_mmr_select_matches_numpy_greedy(spark):
    import numpy as np

    from jigsaw_spark.operators.similarity import mmr_select

    rng = np.random.default_rng(7)
    M = rng.normal(size=(40, 8))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    # float32 storage: replay what Spark reads
    M32 = np.array(
        [[np.float32(x) for x in row] for row in M], dtype=np.float64
    )
    q = M32[0]
    lam, k = 0.7, 6

    def cos(a, b):
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 9
        )

    rels = {i: cos(M32[i], q) for i in range(40)}
    picked, ref = [], []
    for rank in range(k):
        best = None
        for i in range(40):
            if i in picked:
                continue
            ms = max((cos(M32[i], M32[j]) for j in picked), default=0.0)
            score = round(lam * rels[i] - round(1 - lam, 9) * ms, 9)
            cand = (-score, i)
            if best is None or cand < best:
                best = cand
        i = best[1]
        picked.append(i)
        ref.append((rank, i, rels[i], -best[0]))

    got = [
        (r["rank"], r["vec_id"], r["relevance"], r["mmr_score"])
        for r in mmr_select(
            emb, [float(x) for x in q], k=k, lam=lam
        ).orderBy("rank").collect()
    ]
    assert got == ref


def test_char_entropy_known_values(spark):
    import math

    from jigsaw_spark.operators.text import char_entropy

    df = _docs(spark, [(1, "aaaa"), (2, "abab"), (3, "abcd")])
    got = {
        r["doc_id"]: (r["n_chars"], r["entropy_nats"], r["n_distinct_chars"])
        for r in char_entropy(df, "doc_id").collect()
    }
    assert got[1] == (4, 0.0, 1)
    assert got[2] == (4, round(math.log(2), 4), 2)
    assert got[3] == (4, round(math.log(4), 4), 4)


def test_udtf_chunker_matches_expression_chunker(spark):
    from jigsaw_spark.functions.udtfs import ChunkText

    df = _docs(
        spark,
        [(1, "one two three four five six seven eight nine"), (2, "x")],
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk"], r["n_tokens"])
        for r in df.lateralJoin(
            ChunkText(F.col("text").outer(), F.lit(4).outer())
        ).collect()
    )
    assert got == [
        (1, 0, "one two three four", 4),
        (1, 1, "five six seven eight", 4),
        (1, 2, "nine", 1),
        (2, 0, "x", 1),
    ]


def test_udtf_sql_lateral_registered(spark):
    from jigsaw_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = _docs(spark, [(7, "a b c")])
    df.createOrReplaceTempView("_udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, c.chunk, c.n_tokens FROM _udtf_docs d, "
        "LATERAL chunk_text(d.text, 2) c"
    ).collect()
    assert sorted((r[0], r[1], r[2]) for r in rows) == [
        (7, "a b", 2),
        (7, "c", 1),
    ]


def test_tws_user_stats_gated_on_protobuf(spark, tmp_path):
    """transformWithState needs the protobuf runtime (Spark's Python
    state-server protocol). With it absent the operator must fail fast
    with a clear NotImplementedError; with it present, the AvailableNow
    drain must equal the batch groupBy."""
    import pytest

    from jigsaw_spark.streaming.stateful import run_tws_user_stats

    try:
        import google.protobuf  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False

    events = spark.createDataFrame(
        [
            (1, "click", 1.25),
            (1, "view", 2.50),
            (1, "click", 0.25),
            (2, "error", 10.00),
        ],
        "user_id long, event_type string, value double",
    )
    src = str(tmp_path / "events")
    events.write.parquet(src)

    if not have_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            run_tws_user_stats(
                spark, src, str(tmp_path / "ckpt"), glob="*.parquet"
            )
        return

    _d, updates = run_tws_user_stats(
        spark, src, str(tmp_path / "ckpt"), glob="*.parquet"
    )
    final = {
        r["user_id"]: (r["n_events"], r["total_cents"], r["n_types"])
        for r in updates.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_cents").alias("total_cents"),
            F.max("n_types").alias("n_types"),
        )
        .collect()
    }
    assert final[1] == (3, 400, 2)
    assert final[2] == (1, 1000, 1)


def test_logreg_train_matches_numpy_and_separates(spark):
    import numpy as np

    from jigsaw_spark.operators.ml import (
        _numpy_logreg,
        logreg_score,
        logreg_train,
    )

    rng = np.random.default_rng(11)
    n, d = 200, 6
    X = rng.normal(size=(n, d))
    true_w = np.array([2.0, -1.5, 0.0, 0.5, 0.0, 1.0])
    y = (X @ true_w + 0.3 * rng.normal(size=n) > 0).astype(int)

    df = spark.createDataFrame(
        [(int(y[i]), [float(v) for v in X[i]]) for i in range(n)],
        "y int, embedding array<float>",
    )
    w, b, hist = logreg_train(df, "y", n_iters=12, lr=0.5, l2=0.01)

    X32 = np.array([[np.float32(v) for v in row] for row in X])
    rw, rb, rhist = _numpy_logreg(X32.astype(np.float64), y.astype(float),
                                  n_iters=12, lr=0.5, l2=0.01)
    assert np.allclose(w, rw, atol=1e-9)
    assert abs(b - rb) < 1e-9
    assert np.allclose(
        [loss for _, loss in hist], [loss for _, loss in rhist], atol=1e-9
    )
    # loss monotonically decreasing on this easy problem
    losses = [loss for _, loss in hist]
    assert all(a >= b_ for a, b_ in zip(losses, losses[1:]))

    scored = logreg_score(df, w, b).select("y", "prob").collect()
    acc = sum(
        (r["prob"] >= 0.5) == bool(r["y"]) for r in scored
    ) / len(scored)
    assert acc > 0.85


def test_jsonl_roundtrip_and_corrupt_capture(spark, tmp_path):
    from jigsaw_spark.sources.jsonl import read_jsonl, write_jsonl

    df = _docs(
        spark,
        [(1, 'plain'), (2, 'quotes " and \\ backslash'), (3, "unicode é")],
    )
    out = str(tmp_path / "corpus")
    write_jsonl(df, out, n_shards=2)

    good, corrupt = read_jsonl(spark, out, "doc_id long, text string")
    assert corrupt.count() == 0
    got = {r["doc_id"]: r["text"] for r in good.collect()}
    assert got == {
        1: "plain",
        2: 'quotes " and \\ backslash',
        3: "unicode é",
    }
    import glob

    assert len(glob.glob(out + "/part-*")) == 2

    # inject a broken line: it must land in the corrupt side, not vanish
    broken = str(tmp_path / "broken")
    import os

    os.makedirs(broken)
    with open(broken + "/a.jsonl", "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("{not json at all\n")
        f.write('{"doc_id": 2, "text": "also ok"}\n')
    good2, corrupt2 = read_jsonl(spark, broken, "doc_id long, text string")
    assert good2.count() == 2
    bad = corrupt2.collect()
    assert len(bad) == 1 and bad[0]["raw_line"].startswith("{not json")


def test_hash_features_deterministic_and_trainable(spark):
    import numpy as np

    from jigsaw_spark.operators.ml import hash_features, logreg_train

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", f"s{i % 3}", i % 2) for i in range(60)],
        "id long, lang string, source string, y int",
    )
    # dims=32: at dims<=16 "lang=en" and "lang=fr" genuinely collide into
    # the same (index, sign) under the md5 stream — the hashing trick's
    # documented failure mode, pinned below
    feats = hash_features(df, ["lang", "source"], dims=32)
    rows = feats.collect()
    # exactly two non-zero entries of magnitude 1 unless both tokens
    # collide into one dimension (then +-2 or 0)
    for r in rows:
        assert sum(abs(x) for x in r["features"]) in (0.0, 2.0)
    # identical inputs hash identically
    a = [r["features"] for r in rows if r["id"] == 1][0]
    b = [r["features"] for r in rows if r["id"] == 7][0]
    assert a == b
    # the hashed features linearly separate the label they encode
    w, bias, hist = logreg_train(feats, "y", "features", n_iters=15, lr=1.0)
    assert hist[-1][1] < 0.2  # separable: well below ln 2 and falling
    assert not np.isnan(w).any()

    # collision case: at dims=8 the two lang tokens land on the same
    # (index, sign), so lang carries zero signal and training plateaus at
    # ln 2 — the known hashing-trick trade-off, verified not a code bug
    feats8 = hash_features(df, ["lang"], dims=8)
    import math

    _w8, _b8, hist8 = logreg_train(feats8, "y", "features", n_iters=5, lr=1.0)
    assert abs(hist8[-1][1] - math.log(2)) < 1e-6


def test_countmin_overestimates_only_and_merges(spark):
    from jigsaw_spark.operators.aggregates import (
        countmin_estimate,
        countmin_table,
    )

    toks = spark.createDataFrame(
        [(w,) for w in ["a"] * 50 + ["b"] * 30 + list("cdefghij") * 2],
        "term string",
    )
    cms = countmin_table(toks, depth=4, width=64)
    # fixed-size summary: at most depth x width rows
    assert cms.count() <= 4 * 64
    cand = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("zz_unseen",)], "term string"
    )
    est = {r["term"]: r["est_n"] for r in countmin_estimate(cand, cms, width=64).collect()}
    # CMS never underestimates, and unseen terms can only collide upward
    assert est["a"] >= 50 and est["b"] >= 30 and est["c"] >= 2
    assert est["zz_unseen"] >= 0

    # mergeability: sketch(A) + sketch(B) cell-wise == sketch(A union B)
    from pyspark.sql import functions as F

    half1 = spark.createDataFrame([(w,) for w in ["a"] * 25 + ["b"] * 30], "term string")
    half2 = spark.createDataFrame([(w,) for w in ["a"] * 25 + list("cdefghij") * 2], "term string")
    merged = (
        countmin_table(half1, depth=4, width=64)
        .unionByName(countmin_table(half2, depth=4, width=64))
        .groupBy("d", "cell")
        .agg(F.sum("n").alias("n"))
    )
    whole = countmin_table(toks, depth=4, width=64)
    assert (
        merged.exceptAll(whole).count() == 0
        and whole.exceptAll(merged).count() == 0
    )


def test_upload_tfrecords_via_hadoop_fs(spark, tmp_path):
    """The TFRecord sink's lifecycle-upload stage: local shards move to a
    Hadoop-FS destination (file:// here; s3a:// on a cluster with
    hadoop-aws) and survive a byte-identical re-read."""
    from jigsaw_spark.sources.tfrecord import upload_tfrecords, write_tfrecords

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "id long, text string"
    ).repartition(3)
    local = str(tmp_path / "local")
    write_tfrecords(df, local, basename="data")

    dest = "file://" + str(tmp_path / "lake" / "ds1")
    n = upload_tfrecords(spark, local, dest, basename="data")
    import glob
    import os

    dest_dir = str(tmp_path / "lake" / "ds1")
    shards = sorted(glob.glob(dest_dir + "/data-*.record"))
    assert n == len(shards) + 1  # + .numexamples sidecar
    with open(dest_dir + "/data.numexamples") as f:
        assert f.read() == "20"
    for s in shards:
        local_twin = os.path.join(local, os.path.basename(s))
        with open(s, "rb") as a, open(local_twin, "rb") as b:
            assert a.read() == b.read()
    # and Spark's tfrecord DataSource reads the uploaded copy
    from jigsaw_spark.sources.tfrecord_source import register_tfrecord_source

    register_tfrecord_source(spark)
    back = spark.read.format("tfrecord").schema("id long, text string").load(
        dest_dir
    )
    assert back.count() == 20


def test_synthetic_stream_datasource_deterministic(spark, tmp_path):
    """Spark 4 Python streaming DataSource: two AvailableNow drains from
    offset 0 produce identical batches (pure-function-of-offset contract),
    and a windowed agg over the stream equals the batch answer."""
    from jigsaw_spark.sources.synthetic_stream import (
        _row,
        register_synthetic_stream,
    )

    register_synthetic_stream(spark)

    def drain(tag):
        out = str(tmp_path / f"out_{tag}")
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 50)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    a = drain("a")
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in drain("b").collect())
    assert rows_a == rows_b and len(rows_a) == 50
    assert rows_a[0] == _row(0)

    got = {
        r["event_type"]: r["n"]
        for r in a.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    import collections

    want = collections.Counter(_row(i)[3] for i in range(50))
    assert got == dict(want)


def test_dq_check_rules_and_single_scan(spark):
    from jigsaw_spark.operators.dq import Rule, dq_check

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (3, None, 500.0), (3, "a", None)],
        "id long, cat string, x double",
    )
    rules = [
        Rule("not_null", "cat", min_fraction=0.7),
        Rule("in_range", "x", lo=0.0, hi=100.0, min_fraction=0.5),
        Rule("accepted_values", "cat", values=("a", "b")),
        Rule("unique", "id"),
        Rule("matches", "cat", pattern="^[ab]$", min_fraction=0.7),
    ]
    out = {r["rule"]: r for r in dq_check(df, rules).collect()}
    assert out["not_null(cat)"]["passed"] and out["not_null(cat)"]["fraction"] == 0.75
    assert out["in_range(x)"]["fraction"] == 0.5 and out["in_range(x)"]["passed"]
    assert out["accepted_values(cat)"]["fraction"] == 0.75
    assert not out["accepted_values(cat)"]["passed"]  # threshold 1.0
    assert out["unique(id)"]["fraction"] == 0.75 and not out["unique(id)"]["passed"]
    assert out["matches(cat)"]["passed"]

    # the whole check is ONE aggregate over one scan (plus the Expand the
    # exact count-distinct needs) — no per-rule jobs
    plan = dq_check(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_round4_ops_empty_input_total(spark):
    """Every round-4 operator must be TOTAL on empty input — no
    sequence/element_at/first() crashes (the reorder-safety class the
    shingles guard documents)."""
    from jigsaw_spark.operators.dedup import dedup_lines
    from jigsaw_spark.operators.dq import Rule, dq_check
    from jigsaw_spark.operators.joins import scd2_intervals, snapshot_diff
    from jigsaw_spark.operators.ml import hash_features
    from jigsaw_spark.operators.similarity import sq8_quantize
    from jigsaw_spark.operators.text import bpe_encode, char_entropy

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_lines(empty_docs, "doc_id", "text").count() == 0
    assert char_entropy(empty_docs, "doc_id").count() == 0
    assert bpe_encode(empty_docs, [("a", "b")], "doc_id").count() == 0

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert sq8_quantize(empty_emb).count() == 0

    cat = spark.createDataFrame([], "id long, c string")
    assert hash_features(cat, ["c"], dims=4).count() == 0

    ev = spark.createDataFrame([], "user_id long, state string, ts timestamp")
    assert scd2_intervals(ev, "user_id", "state").count() == 0

    assert (
        snapshot_diff(
            spark.createDataFrame([], "k long, v string"),
            spark.createDataFrame([], "k long, v string"),
            ["k"],
        ).count()
        == 0
    )

    # dq over an empty table: fractions are NULL (0/0) -> passed is NULL,
    # never a crash; rules still emit one row each
    out = dq_check(
        spark.createDataFrame([], "x long"), [Rule("not_null", "x")]
    ).collect()
    assert len(out) == 1 and out[0]["fraction"] is None


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from jigsaw_spark.operators.graph import pagerank

    # two triangles bridged by one edge + a pendant
    E = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, n_iters=20, undirected=True).collect()
    }

    # numpy reference: same undirected expansion, same iteration
    und = set()
    for a, b in E:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({x for e in und for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in und:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(20):
        c = np.zeros(n)
        for a, b in und:
            c[idx[b]] += r[idx[a]] / deg[idx[a]]
        r = (1 - 0.85) / n + 0.85 * c
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9
    # ranks form a distribution and the bridge node outranks the pendant
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got[5] > got[6]


def test_pagerank_directed_conserves_dangling_mass(spark):
    import numpy as np

    from jigsaw_spark.operators.graph import pagerank

    # node 3 is a sink (out-degree 0): its mass must be redistributed,
    # not dropped (advisor finding, r2)
    E = [(0, 1), (1, 2), (2, 0), (2, 3)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, n_iters=20, undirected=False).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # numpy reference with uniform dangling redistribution
    nodes = sorted({x for e in E for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in E:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(20):
        c = np.zeros(n)
        dm = 0.0
        for i in range(n):
            if deg[i] == 0:
                dm += r[i]
        for a, b in E:
            c[idx[b]] += r[idx[a]] / deg[idx[a]]
        r = (1 - 0.85) / n + 0.85 * (c + dm / n)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9


def test_map_in_arrow_fingerprint_matches_expression(spark):
    from jigsaw_spark.functions.udtfs import fingerprint_arrow
    from jigsaw_spark.operators.text import fingerprint_expr, tokens_expr

    df = _docs(
        spark,
        [(1, "The CAT sat"), (2, "dog,  dog!  dog"), (3, "a-b-c 123")],
    )
    toks = df.select("doc_id", tokens_expr("text").alias("toks"))
    via_arrow = {
        r["doc_id"]: r["fp"]
        for r in fingerprint_arrow(toks, "doc_id").collect()
    }
    via_expr = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", fingerprint_expr(tokens_expr("text")).alias("fp")
        ).collect()
    }
    assert via_arrow == via_expr


def test_power_iteration_pc1_matches_numpy(spark):
    import numpy as np

    from jigsaw_spark.operators.ml import power_iteration_pc1

    rng = np.random.default_rng(5)
    # anisotropic cloud: dominant direction along a known vector
    d0 = np.array([3.0, 1.0, 0.0, -1.0])
    X = rng.normal(size=(300, 4)) + rng.normal(size=(300, 1)) * d0
    df = spark.createDataFrame(
        [( [float(x) for x in row],) for row in X],
        "embedding array<double>",
    )
    v, lam = power_iteration_pc1(df, n_iters=30)

    C = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(C)
    pc = evecs[:, -1]
    if pc[np.argmax(np.abs(pc))] < 0:
        pc = -pc
    assert np.allclose(v, pc, atol=1e-4)
    assert abs(lam - evals[-1]) / evals[-1] < 1e-4


def test_compression_ratio_matches_local_zlib(spark):
    import zlib

    from jigsaw_spark.operators.text import compression_ratio

    texts = {
        1: "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # highly compressible
        2: "the quick brown fox jumps over the lazy dog",
        3: "",
    }
    df = _docs(spark, list(texts.items()))
    got = {
        r["doc_id"]: (r["raw_bytes"], r["compressed_bytes"], r["ratio"])
        for r in compression_ratio(df, "doc_id").collect()
    }
    for k, t in texts.items():
        raw = t.encode()
        comp = zlib.compress(raw, 6)
        want_ratio = round(len(comp) / len(raw), 6) if raw else None
        assert got[k] == (len(raw), len(comp), want_ratio)
    # repetitive text compresses far better than natural text
    assert got[1][2] < got[2][2]


def test_ngram_jaccard_cap_noop_when_not_binding(spark):
    """The truth-side cap in the LSH evaluation queries (max_posting=1000)
    must be a no-op on the sf0.01 corpus (500 docs — no posting list can
    exceed it), so the uncapped DuckDB oracle stays exact; and when the
    cap DOES bind, pairs supported only by over-cap shingles disappear."""
    from jigsaw_spark.operators.dedup import ngram_jaccard_pairs

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    uncapped = set(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, "doc_id", threshold=0.5).collect()
    )
    capped = set(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", threshold=0.5, max_posting=1000
        ).collect()
    )
    assert uncapped == capped and len(capped) > 0

    # a binding cap: two docs share ONLY a boilerplate shingle that
    # appears in >2 docs — capping at 2 removes the pair
    rows = [(i, "common boiler plate words here") for i in range(5)]
    rows += [(10, "alpha beta gamma delta"), (11, "alpha beta gamma delta")]
    df = _docs(spark, rows)
    loose = ngram_jaccard_pairs(df, "doc_id", threshold=0.9).collect()
    tight = ngram_jaccard_pairs(
        df, "doc_id", threshold=0.9, max_posting=2
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in loose} > {
        (r["doc_a"], r["doc_b"]) for r in tight
    }
    assert {(r["doc_a"], r["doc_b"]) for r in tight} == {(10, 11)}


def test_substring_window_stats_flags_cross_doc_spans(spark):
    from jigsaw_spark.operators.dedup import substring_window_stats

    shared = "one two three four five six seven eight"  # exactly 8 tokens
    df = _docs(
        spark,
        [
            (1, shared + " unique tail here alpha beta gamma delta"),
            (2, "prefix words for doc two " + shared),
            (3, "completely different text with no overlap at all keeps"),
        ],
    )
    out = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ratio"])
        for r in substring_window_stats(df, "doc_id", "text", window=8).collect()
    }
    # the shared 8-token run appears verbatim in docs 1 and 2
    assert out[1][1] >= 1 and out[2][1] >= 1
    assert out[3][1] == 0 and out[3][2] == 0.0
    # intra-doc-only windows are not duplicates; ratios in [0, 1]
    for n, nd, ratio in out.values():
        assert 0 <= nd <= n and 0.0 <= ratio <= 1.0


def test_containment_pairs_catches_asymmetric_excerpt(spark):
    from jigsaw_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long = (
        short
        + " plus a very long continuation that keeps going with many more"
        " words so the jaccard similarity of the pair drops well below"
        " any sensible duplicate threshold while containment stays one"
    )
    df = _docs(spark, [(1, short), (2, long), (3, "totally unrelated words")])
    cont = {
        (r["doc_a"], r["doc_b"]): r["overlap"]
        for r in containment_pairs(df, "doc_id", threshold=0.8).collect()
    }
    # every trigram of the short doc is inside the long one
    assert cont[(1, 2)] == 1.0
    # Jaccard at the same threshold misses the excerpt pair
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", threshold=0.8).collect()
    }
    assert (1, 2) not in jac


def test_snapshot_diff_null_vs_sentinel_and_boundary_aliasing(spark):
    """NULL→'\\x00' edits and separator-shifting edits must be detected.

    The r2 row-hash used a '\\x00' NULL sentinel and a '\\x1f' column
    separator: a genuine '\\x00' string hashed identically to NULL, and
    values containing '\\x1f' could alias a column boundary (advisor
    finding, r3). The length-prefixed token serialization is injective,
    so both edit classes now surface as 'changed'.
    """
    from jigsaw_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, "x"), (2, "a\x1f", "b"), (3, "same", "same")],
        "k int, c1 string, c2 string",
    )
    new = spark.createDataFrame(
        [(1, "\x00", "x"), (2, "a", "\x1fb"), (3, "same", "same")],
        "k int, c1 string, c2 string",
    )
    out = {
        r["k"]: r["change"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert out == {1: "changed", 2: "changed"}
