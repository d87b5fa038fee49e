"""Round-11 batch 2 replays: contamination n-gram curve, duplicate
gram mass, curation gate attribution, phash cluster histogram."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _grams(toks: list[str], n: int) -> list[str]:
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _is_holdout(doc_id: int) -> bool:
    h = hashlib.md5(f"contam|{doc_id}".encode()).hexdigest()[:12]
    return int(h, 16) % 20 == 0


def test_contamination_ngram_curve_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {
        r["n"]: r
        for r in entrymod.queries()["dq_contamination_ngram_curve"](
            spark, SF
        ).collect()
    }
    assert set(got) == {4, 6, 8, 10, 13}
    prev_rate = None
    for n in (4, 6, 8, 10, 13):
        hold = defaultdict(set)  # gram -> holdout docs
        train = set()
        for r in docs:
            gs = _grams(_tokens(r["text"]), n)
            if _is_holdout(r["doc_id"]):
                for g in gs:
                    hold[g].add(r["doc_id"])
            else:
                train.update(gs)
        contaminated = {g for g in hold if g in train}
        docs_touched = set().union(
            *(hold[g] for g in contaminated)
        ) if contaminated else set()
        g = got[n]
        assert g["n_holdout_grams"] == len(hold)
        assert g["n_contaminated_grams"] == len(contaminated)
        assert g["n_contaminated_docs"] == len(docs_touched)
        expect = (
            0 if not hold else len(contaminated) * 1000 // len(hold)
        )
        assert g["rate_milli"] == expect
        # contaminated GRAM SETS shrink with n in spirit but the rate
        # denominators shrink too, so only sanity-bound the rate
        assert 0 <= g["rate_milli"] <= 1000
        prev_rate = g["rate_milli"]


def test_dup_gram_mass_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per = defaultdict(lambda: defaultdict(lambda: [0, set()]))
    for r in docs:
        for g in _grams(_tokens(r["text"]), 8):
            e = per[r["lang"]][g]
            e[0] += 1
            e[1].add(r["doc_id"])
    got = {
        r["lang"]: r
        for r in entrymod.queries()["text_dup_gram_mass"](
            spark, SF
        ).collect()
    }
    langs_with_grams = {
        lang for lang, gs in per.items() if gs
    }
    assert set(got) == langs_with_grams
    for lang in langs_with_grams:
        total = sum(c for c, _ in per[lang].values())
        cross = sum(
            c for c, ds in per[lang].values() if len(ds) >= 2
        )
        rep = sum(c for c, _ in per[lang].values() if c >= 2)
        g = got[lang]
        assert g["total_gram_occ"] == total
        assert g["crossdoc_mass"] == cross
        assert g["repeated_mass"] == rep
        assert g["crossdoc_milli"] == cross * 1000 // total
        assert g["repeated_milli"] == rep * 1000 // total
        # cross-doc duplicated grams are a subset of repeated grams
        assert cross <= rep


def test_gate_attribution_replays(spark):
    from jigsaw_spark.operators.text import LANG_MARKERS

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    flags = []
    for r in docs:
        text = (r["text"] or "").lower()
        t = _tokens(text)
        kept = len(re.sub("[^a-z0-9 ]", "", text))
        f_len = len(t) < 20
        f_alnum = (kept / len(text) if text else float("nan")) < 0.5
        hits = {
            lang: sum(1 for x in t if x in set(ms))
            for lang, ms in LANG_MARKERS.items()
        }
        if hits["en"] >= hits["es"] and hits["en"] >= hits["fr"]:
            pred = "en"
        elif hits["es"] >= hits["fr"]:
            pred = "es"
        else:
            pred = "fr"
        f_lang = pred != "en"
        gs = _grams(t, 3)
        f_rep = len(t) >= 3 and 2 * (len(gs) - len(set(gs))) > len(gs)
        flags.append((f_len, f_alnum, f_lang, f_rep))
    got = {
        r["rule"]: r
        for r in entrymod.queries()["curation_gate_attribution"](
            spark, SF
        ).collect()
    }
    assert set(got) == {
        "min_tokens", "alnum_ratio", "lang_en", "repetition",
    }
    n = len(flags)
    n_pass = sum(1 for f in flags if not any(f))
    for idx, rule in enumerate(
        ("min_tokens", "alnum_ratio", "lang_en", "repetition")
    ):
        fail = sum(1 for f in flags if f[idx])
        sole = sum(
            1
            for f in flags
            if f[idx] and not any(f[j] for j in range(4) if j != idx)
        )
        g = got[rule]
        assert g["n_docs"] == n
        assert g["n_pass"] == n_pass
        assert g["n_fail"] == fail
        assert g["n_sole_fail"] == sole
        assert g["fail_milli"] == fail * 1000 // n


def test_phash_components_replays(spark):
    qs = entrymod.queries()
    pairs = [
        (int(r["img_a"]), int(r["img_b"]))
        for r in qs["mm_phash_near_dup"](spark, SF).collect()
    ]
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    universe = sorted(
        int(r["doc_id"]) for r in docs if r["doc_id"] % 10 == 0
    )
    parent = {i: i for i in universe}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = defaultdict(int)
    for i in universe:
        sizes[find(i)] += 1
    hist = defaultdict(int)
    for sz in sizes.values():
        hist[sz] += 1
    got = {
        r["cluster_size"]: r
        for r in qs["mm_phash_components"](spark, SF).collect()
    }
    assert set(got) == set(hist)
    for sz, cnt in hist.items():
        assert got[sz]["n_clusters"] == cnt
        assert got[sz]["n_images"] == sz * cnt
    # every image lands in exactly one cluster
    assert sum(r["n_images"] for r in got.values()) == len(universe)
