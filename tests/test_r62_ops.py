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


# --- batch 7 ---------------------------------------------------------------


def test_contamination_bias_replays(spark):
    from jigsaw_spark.operators.text import LANG_MARKERS

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    train = set()
    hold = {}
    for r in docs:
        t = _tokens(r["text"])
        gs = set(_grams(t, 8))
        if _is_holdout(r["doc_id"]):
            hold[r["doc_id"]] = (r, t, gs)
        else:
            train |= gs
    groups = defaultdict(lambda: [0, 0, 0])  # n, n_pass, sum_chars
    for doc_id, (r, t, gs) in hold.items():
        contaminated = bool(gs & train)
        text = (r["text"] or "").lower()
        import re as _re

        kept = len(_re.sub("[^a-z0-9 ]", "", text))
        alnum = kept / len(text) if text else float("nan")
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
        passes = len(t) >= 20 and alnum >= 0.5 and pred == "en"
        g = groups[contaminated]
        g[0] += 1
        g[1] += 1 if passes else 0
        g[2] += r["n_chars"]
    got = {
        r["is_contaminated"]: r
        for r in entrymod.queries()["dq_contamination_bias"](
            spark, SF
        ).collect()
    }
    n_hold = len(hold)
    assert set(got) == set(groups)
    for flag, (n, np_, sc) in groups.items():
        g = got[flag]
        assert g["n_docs"] == n
        assert g["share_milli"] == n * 1000 // n_hold
        assert g["n_pass"] == np_
        assert g["pass_milli"] == np_ * 1000 // n
        assert g["sum_chars"] == sc
        assert g["mean_chars"] == sc // n
    assert sum(g["n_docs"] for g in got.values()) == n_hold


def test_nprobe_tradeoff_replays(spark):
    import numpy as np

    rows = sorted(
        spark.read.parquet(f"{SF}/embeddings.parquet").collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array(
        [[float(x) for x in r["embedding"]] for r in rows],
        dtype=np.float64,
    )
    norms = np.linalg.norm(M, axis=1)
    C = M[ids < 8]
    cids = ids[ids < 8]
    S = np.round(
        (M @ C.T) / np.outer(norms, np.linalg.norm(C, axis=1)), 9
    )
    cell = cids[np.argmax(S, axis=1)]
    qm = ids < 5
    qids = ids[qm]
    # probe order per query: (round-9 cos desc, cid asc)
    cosq = np.round(
        (M[qm] @ C.T)
        / np.outer(norms[qm], np.linalg.norm(C, axis=1)),
        9,
    )
    full = np.round(
        (M[qm] @ M.T) / np.outer(norms[qm], norms), 9
    )
    truth = {}
    for qi, qid in enumerate(qids):
        order = sorted(
            ((-full[qi, ci], ids[ci]) for ci in range(len(ids)) if ids[ci] != qid)
        )[:10]
        truth[qid] = {vid for _, vid in order}
    got = {
        r["nprobe"]: r
        for r in entrymod.queries()["ann_nprobe_tradeoff"](
            spark, SF
        ).collect()
    }
    assert set(got) == {1, 2, 4}
    n_brute = 5 * (len(ids) - 1)
    prev_scored = prev_hits = 0
    for np_ in (1, 2, 4):
        n_scored = 0
        hits = 0
        for qi, qid in enumerate(qids):
            probe_order = sorted(
                ((-cosq[qi, ci], cids[ci]) for ci in range(len(cids)))
            )[:np_]
            probed = {cid for _, cid in probe_order}
            cand = [
                ids[j]
                for j in range(len(ids))
                if cell[j] in probed and ids[j] != qid
            ]
            n_scored += len(cand)
            ranked = sorted(
                ((-full[qi, list(ids).index(v)], v) for v in cand)
            )[:10]
            hits += len({v for _, v in ranked} & truth[qid])
        g = got[np_]
        assert g["n_scored"] == n_scored
        assert g["hits"] == hits
        assert g["recall_milli"] == hits * 1000 // 50
        assert g["scan_share_milli"] == n_scored * 1000 // n_brute
        # more probes can only scan more and recall at least as much
        assert n_scored >= prev_scored and hits >= prev_hits
        prev_scored, prev_hits = n_scored, hits


def test_band_sweep_replays(spark):
    qs = entrymod.queries()
    got = {
        r["bands"]: r
        for r in qs["dedup_band_sweep"](spark, SF).collect()
    }
    assert set(got) == {2, 4, 8}
    # thresholds: s* = (1/b)^(1/r) in milli, exact literals
    for b, r, thr in ((2, 8, 917), (4, 4, 707), (8, 2, 354)):
        assert got[b]["rows_per_band"] == r
        assert got[b]["threshold_milli"] == thr
    # the 4x4 arm must reproduce the certified dedup_minhash_lsh count
    lsh_pairs = qs["dedup_minhash_lsh"](spark, SF).count()
    assert got[4]["n_candidate_pairs"] == lsh_pairs
    # band refinement nests: a 4-row band match implies both aligned
    # 2-row half-bands match, so candidates grow as bands multiply
    assert (
        got[8]["n_candidate_pairs"]
        >= got[4]["n_candidate_pairs"]
        >= got[2]["n_candidate_pairs"]
    )
    # the fixture must exercise the sweep
    assert got[8]["n_candidate_pairs"] > 0
