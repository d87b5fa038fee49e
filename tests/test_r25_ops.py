"""Round-6 batch 2: semantic replays (pattern counts, source Jaccard,
skip logic, code/PII scans, norm outliers, weighted percentiles, v4
pipeline law)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_event_pattern_match_replays_regex(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    per_user = defaultdict(list)
    for r in rows:
        t = int(r["ts"].timestamp() * 1_000_000)
        per_user[r["user_id"]].append((t, r["event_id"], r["event_type"][0]))
    got = {
        r["user_id"]: (r["n_events"], r["n_vcp"], r["n_vp"], r["has_funnel"])
        for r in entrymod.queries()["rel_event_pattern_match"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per_user)
    for u, evs in per_user.items():
        seq = "".join(i for _, _, i in sorted(evs))
        n_vcp = len(re.findall("vcp", seq))
        n_vp = len(re.findall("vp", seq))
        assert got[u] == (len(seq), n_vcp, n_vp, int(n_vcp > 0)), u


def test_source_overlap_replays_jaccard(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.text import shingles_expr, tokens_expr

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = defaultdict(set)
    for r in docs.select(
        "source", F.explode(shingles_expr(tokens_expr("text"))).alias("s")
    ).collect():
        sh[r["source"]].add(r["s"])
    got = {
        (r["src_a"], r["src_b"]): (
            r["sz_a"],
            r["sz_b"],
            r["n_shared"],
            r["jaccard_micro"],
        )
        for r in entrymod.queries()["dedup_source_overlap"](
            spark, SF
        ).collect()
    }
    srcs = sorted(sh)
    want_pairs = {
        (a, b)
        for i, a in enumerate(srcs)
        for b in srcs[i + 1 :]
        if sh[a] & sh[b]
    }
    assert set(got) == want_pairs
    for (a, b), (sa, sb, inter, jm) in got.items():
        i = len(sh[a] & sh[b])
        assert (sa, sb, inter) == (len(sh[a]), len(sh[b]), i)
        assert jm == i * 1_000_000 // (len(sh[a]) + len(sh[b]) - i)


def test_skipping_report_zorder_beats_id_order(spark):
    out = {
        r["layout"]: r
        for r in entrymod.queries()["layout_skipping_report"](
            spark, SF
        ).collect()
    }
    assert set(out) == {"zorder", "id_order"}
    for r in out.values():
        assert 0 <= r["n_skippable"] <= r["n_blocks"]
        assert r["skip_ratio_micro"] == (
            r["n_skippable"] * 1_000_000 // r["n_blocks"]
        )
    # the point of z-ordering: the clustered layout skips a strictly
    # higher fraction of blocks for the custkey range predicate
    assert (
        out["zorder"]["skip_ratio_micro"]
        > out["id_order"]["skip_ratio_micro"]
    )


def test_code_detect_replays_char_counts(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
        if len(r["text"]) > 0
    }
    got = {
        r["doc_id"]: (r["n_chars"], r["code_chars"], r["code_micro"], r["is_codey"])
        for r in entrymod.queries()["text_code_detect"](spark, SF).collect()
    }
    assert set(got) == set(docs)
    for d, text in docs.items():
        cc = sum(text.count(c) for c in "{}();=[]<>")
        micro = cc * 1_000_000 // len(text)
        assert got[d] == (len(text), cc, micro, int(micro >= 20000)), d


def test_code_detect_flags_synthetic_code(spark):
    from pyspark.sql import functions as F

    code = "def f(x): return {'a': x[0], 'b': (x[1] <= 2)};"
    prose = "a perfectly ordinary sentence about nothing in particular"
    cc_code = sum(code.count(c) for c in "{}();=[]<>")
    assert cc_code * 1_000_000 // len(code) >= 20000
    assert sum(prose.count(c) for c in "{}();=[]<>") == 0


def test_pii_scan_replays_regex(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ipv4 = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
    phone = re.compile(r"\b\d{3}[- ]\d{3}[- ]\d{4}\b")
    want = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in docs:
        e = len(email.findall(r["text"]))
        i = len(ipv4.findall(r["text"]))
        p = len(phone.findall(r["text"]))
        w = want[r["source"]]
        w[0] += 1
        w[1] += e
        w[2] += i
        w[3] += p
        w[4] += int(e + i + p > 0)
    got = {
        r["source"]: [
            r["n_docs"],
            r["n_emails"],
            r["n_ipv4"],
            r["n_phones"],
            r["docs_with_pii"],
        ]
        for r in entrymod.queries()["text_pii_scan"](spark, SF).collect()
    }
    assert got == dict(want)


def test_pii_regexes_match_known_strings():
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ipv4 = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
    phone = re.compile(r"\b\d{3}[- ]\d{3}[- ]\d{4}\b")
    s = "mail a.user+tag@example.co.uk from 10.0.0.1 or call 555-123-4567"
    assert email.findall(s) == ["a.user+tag@example.co.uk"]
    assert ipv4.findall(s) == ["10.0.0.1"]
    assert phone.findall(s) == ["555-123-4567"]


def test_embedding_norm_outliers_replay(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    per_label = defaultdict(list)
    for r in emb:
        sq = sum(int(round(x * 1000)) ** 2 for x in r["embedding"])
        per_label[r["label"]].append(sq)

    def lower_median(vals):
        vals = sorted(vals)
        n = len(vals)
        # nearest-rank at ceil(n/2) over the value-grouped cumulative
        return vals[(n + 1) // 2 - 1]

    got = {
        r["label"]: (r["n"], r["med_sq"], r["mad_sq"], r["n_outliers"])
        for r in entrymod.queries()["dq_embedding_norms"](spark, SF).collect()
    }
    assert set(got) == set(per_label)
    for lab, sqs in per_label.items():
        med = lower_median(sqs)
        mad = lower_median([abs(s - med) for s in sqs])
        n_out = sum(1 for s in sqs if abs(s - med) > 5 * mad)
        assert got[lab] == (len(sqs), med, mad, n_out), lab


def test_weighted_median_replay(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    per_flag = defaultdict(Counter)
    for r in li:
        cents = int(round(r["l_extendedprice"] * 100))
        per_flag[r["l_returnflag"]][cents] += int(round(r["l_quantity"]))
    got = {
        r["l_returnflag"]: (
            r["total_weight"],
            r["wp25_cents"],
            r["wp50_cents"],
            r["wp75_cents"],
        )
        for r in entrymod.queries()["agg_weighted_median"](
            spark, SF
        ).collect()
    }
    for flag, wc in per_flag.items():
        tw = sum(wc.values())

        def pick(p):
            target = (p * tw + 99) // 100
            cum = 0
            for cents in sorted(wc):
                cum += wc[cents]
                if cum >= target:
                    return cents
            raise AssertionError

        assert got[flag] == (tw, pick(25), pick(50), pick(75)), flag


def test_pipeline_v4_composes_signals(spark):
    nov = {
        r["doc_id"]: r["novelty_micro"]
        for r in entrymod.queries()["text_ngram_novelty"](spark, SF).collect()
    }
    rep = {
        r["doc_id"]: r["repetition_micro"]
        for r in entrymod.queries()["text_repetition_score"](
            spark, SF
        ).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    want = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        d = r["doc_id"]
        if d not in nov or d not in rep:
            continue  # too short to shingle — no keep decision
        kept = int(
            rep[d] < 500_000 and nov[d] >= 200_000 and r["n_chars"] >= 200
        )
        w = want[r["source"]]
        w[0] += 1
        w[1] += kept
        w[2] += nov[d] if kept else 0
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_kept"],
            r["keep_micro"],
            r["kept_novelty_micro"],
        )
        for r in entrymod.queries()["curation_pipeline_v4"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(want)
    for src, (n, k, novsum) in want.items():
        exp_nov = novsum // k if k > 0 else -1
        assert got[src] == (n, k, k * 1_000_000 // n, exp_nov), src
