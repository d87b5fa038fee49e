"""Round-9 batch 1: python replays / invariants for rerank, contamination,
sequence packing, and the bottom-k quantile sketch."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _shingles(toks: list[str], n: int = 8) -> list[str]:
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_rerank_cross_invariants(spark):
    rows = entrymod.queries()["text_rerank_cross"](spark, SF).collect()
    assert rows
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    for doc_id, cand in by_doc.items():
        n = len(cand)
        assert n <= 5
        # both rank columns are permutations of 1..n over the same set
        assert sorted(r["rnk_retrieval"] for r in cand) == list(
            range(1, n + 1)
        )
        assert sorted(r["rnk_rerank"] for r in cand) == list(range(1, n + 1))
        # rank deltas telescope to zero inside a candidate set
        assert sum(r["rank_delta"] for r in cand) == 0
        for r in cand:
            assert r["rank_delta"] == r["rnk_retrieval"] - r["rnk_rerank"]
            assert 0 <= r["jacc_micro"] <= 10**6
            assert 0 <= r["cos2_micro"] <= 10**6
        # the rerank order follows jacc_micro desc with neighbor tiebreak
        by_rerank = sorted(cand, key=lambda r: r["rnk_rerank"])
        keys = [(-r["jacc_micro"], r["neighbor_id"]) for r in by_rerank]
        assert keys == sorted(keys)


def test_rerank_candidates_superset_of_tfidf_knn(spark):
    """Stage-1 retrieval is the text_tfidf_knn scorer, so its certified
    top-3 must be exactly the rerank input's rnk_retrieval 1..3."""
    knn = entrymod.queries()["text_tfidf_knn"](spark, SF).collect()
    rer = entrymod.queries()["text_rerank_cross"](spark, SF).collect()
    knn_set = {(r["doc_id"], r["neighbor_id"], r["rnk"]) for r in knn}
    rer_top3 = {
        (r["doc_id"], r["neighbor_id"], r["rnk_retrieval"])
        for r in rer
        if r["rnk_retrieval"] <= 3
    }
    assert knn_set == rer_top3


def test_contamination_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    train_sh: set[str] = set()
    holdout = {}
    for r in docs:
        is_holdout = _h48(f"contam|{r['doc_id']}") % 20 == 0
        sh = set(_shingles(_tokens(r["text"])))
        if is_holdout:
            holdout[r["doc_id"]] = sh
        else:
            train_sh |= sh
    got = {
        r["doc_id"]: (
            r["n_shingles"],
            r["n_contaminated"],
            r["contam_milli"],
        )
        for r in entrymod.queries()["dq_contamination"](spark, SF).collect()
    }
    assert set(got) == set(holdout)
    for doc_id, sh in holdout.items():
        hits = len(sh & train_sh)
        milli = hits * 1000 // len(sh) if sh else 0
        assert got[doc_id] == (len(sh), hits, milli)


def test_seq_packing_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    budget, shards = 512, 8
    groups = defaultdict(list)
    for r in docs:
        n_tok = len(_tokens(r["text"]))
        if n_tok == 0:
            continue
        pri = _h48(f"pack|{r['doc_id']}")
        groups[(r["lang"], pri % shards)].append((pri, r["doc_id"], n_tok))
    per_lang = defaultdict(
        lambda: {
            "n_docs": 0,
            "tokens": 0,
            "n_bins": 0,
            "crossers": 0,
            "max_bin_docs": 0,
        }
    )
    for (lang, _), items in groups.items():
        items.sort()
        cum = 0
        bin_docs = defaultdict(int)
        end_max = 0
        for pri, doc_id, n_tok in items:
            start = cum // budget
            cum += n_tok
            end = (cum - 1) // budget
            bin_docs[start] += 1
            end_max = max(end_max, end)
            agg = per_lang[lang]
            agg["n_docs"] += 1
            agg["tokens"] += n_tok
            agg["crossers"] += 1 if end > start else 0
        agg = per_lang[lang]
        agg["n_bins"] += end_max + 1
        agg["max_bin_docs"] = max(agg["max_bin_docs"], max(bin_docs.values()))
    got = {
        r["lang"]: r
        for r in entrymod.queries()["text_seq_packing"](spark, SF).collect()
    }
    assert set(got) == set(per_lang)
    for lang, agg in per_lang.items():
        g = got[lang]
        assert g["n_docs"] == agg["n_docs"]
        assert g["total_tokens"] == agg["tokens"]
        assert g["n_bins"] == agg["n_bins"]
        assert g["crossers"] == agg["crossers"]
        assert g["max_bin_docs"] == agg["max_bin_docs"]
        assert g["fill_milli"] == agg["tokens"] * 1000 // (
            agg["n_bins"] * budget
        )


def test_quantile_bottomk_replays(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type = defaultdict(list)
    for r in rows:
        cents = round(r["value"] * 100)
        by_type[r["event_type"]].append(
            (_h48(f"qsk|{r['event_id']}"), r["event_id"], cents)
        )
    got = {
        (r["event_type"], r["p"]): (
            r["est_cents"],
            r["exact_cents"],
            r["abs_err_cents"],
        )
        for r in entrymod.queries()["agg_quantile_bottomk"](
            spark, SF
        ).collect()
    }
    for et, items in by_type.items():
        sample = sorted(items)[:128]
        s_sorted = sorted((c, eid) for _, eid, c in sample)
        f_sorted = sorted((c, eid) for _, eid, c in items)
        for p in (25, 50, 75, 90, 99):
            est = s_sorted[(len(s_sorted) - 1) * p // 100][0]
            exact = f_sorted[(len(f_sorted) - 1) * p // 100][0]
            assert got[(et, p)] == (est, exact, abs(est - exact))
    # the sketch is a sample: median error should be small but the row
    # count contract is exact — 5 percentiles per type
    n_types = len(by_type)
    assert len(got) == 5 * n_types
