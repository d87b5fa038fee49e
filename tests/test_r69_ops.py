"""Round-12 batch 4 replays: cluster extinction and the epoch
schedule — independent Python replicas at sf0.001."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

LANG_MARKERS = None  # populated lazily from the production module


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _uf_components(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _gate_pass(text: str, toks: list[str]) -> bool:
    from jigsaw_spark.operators.text import LANG_MARKERS

    if len(toks) < 20:
        return False
    lowered = (text or "").lower()
    if lowered:
        kept = len(re.sub("[^a-z0-9 ]", "", lowered))
        if kept / len(lowered) < 0.5:
            return False
    hits = {
        lang: sum(1 for x in toks if x in set(ms))
        for lang, ms in LANG_MARKERS.items()
    }
    if not (hits["en"] >= hits["es"] and hits["en"] >= hits["fr"]):
        return False
    if len(toks) >= 3:
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        if 2 * (len(grams) - len(set(grams))) > len(grams):
            return False
    return True


def test_cluster_extinction_replays(spark):
    from pyspark.sql import functions as F

    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs_df = spark.read.parquet(f"{SF}/documents.parquet")
    keepers_df = (
        exact_dedup(docs_df, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    keepers = keepers_df.collect()
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(keepers_df, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    nodes = sorted({d for p in pairs for d in p})
    comp = _uf_components(nodes, pairs)
    clusters = defaultdict(lambda: [0, 0])
    for r in keepers:
        c = comp.get(r["doc_id"], r["doc_id"])
        t = _tokens(r["text"])
        clusters[c][0] += 1
        if _gate_pass(r["text"], t):
            clusters[c][1] += 1
    hist = defaultdict(lambda: [0, 0])
    for sz, np_ in clusters.values():
        hist[sz][0] += 1
        if np_ == 0:
            hist[sz][1] += 1
    got = {
        r["cluster_size"]: r
        for r in entrymod.queries()["curation_cluster_extinction"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(hist)
    for sz, (nc, ne) in hist.items():
        g = got[sz]
        assert g["n_clusters"] == nc
        assert g["n_extinct"] == ne
        assert g["extinct_milli"] == ne * 1000 // nc
        assert g["docs_erased"] == sz * ne
    # accounting: clusters cover every exact keeper exactly once
    assert sum(
        r["cluster_size"] * r["n_clusters"] for r in got.values()
    ) == len(keepers)
    # the fixture must exercise the metric: some gate failures exist
    assert any(r["n_extinct"] > 0 for r in got.values())


def test_epoch_schedule_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    cap = defaultdict(int)
    for r in docs:
        cap[r["source"]] += len(_tokens(r["text"]))
    total = sum(cap.values())
    budget = total * 9 // 10
    w = {
        s: (
            0
            if c == 0
            else int(_round_half_away(math.exp(0.7 * math.log(c))))
            * 1_000_000
        )
        for s, c in cap.items()
    }
    tw = sum(w.values())
    base = {s: budget * w[s] // tw for s in cap}
    rem = {s: budget * w[s] % tw for s in cap}
    lo = budget - sum(base.values())
    order = sorted(cap, key=lambda s: (-rem[s], s))
    tgt = {
        s: base[s] + (1 if order.index(s) < lo else 0) for s in cap
    }
    got = {
        r["source"]: r
        for r in entrymod.queries()["p_epoch_schedule"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(cap)
    for s in cap:
        g = got[s]
        assert g["cap_tokens"] == cap[s]
        assert g["weight_micro"] == w[s]
        assert g["target_tokens"] == tgt[s]
        epochs = 0 if cap[s] == 0 else tgt[s] * 1000 // cap[s]
        assert g["epochs_milli"] == epochs
        assert g["over_limit"] == (epochs > 4000 if cap[s] else False)
        assert g["clipped_tokens"] == min(tgt[s], 4 * cap[s])
        assert g["surplus_tokens"] == tgt[s] - min(tgt[s], 4 * cap[s])
    # the budget is exactly spent before clipping
    assert sum(r["target_tokens"] for r in got.values()) == budget
    # temperature upweights rare sources: the smallest-cap source gets
    # MORE epochs than the largest-cap source
    smallest = min(cap, key=lambda s: (cap[s], s))
    largest = max(cap, key=lambda s: (cap[s], s))
    assert (
        got[smallest]["epochs_milli"] >= got[largest]["epochs_milli"]
    )


def _round_half_away(v: float) -> float:
    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def test_gate_by_source_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in docs:
        toks = _tokens(r["text"])
        s = r["source"]
        per[s][0] += 1
        # individual rules (the curation_gate_attribution predicates)
        f_len = len(toks) < 20
        lowered = (r["text"] or "").lower()
        f_alnum = bool(lowered) and (
            len(re.sub("[^a-z0-9 ]", "", lowered)) / len(lowered) < 0.5
        )
        from jigsaw_spark.operators.text import LANG_MARKERS

        hits = {
            lang: sum(1 for x in toks if x in set(ms))
            for lang, ms in LANG_MARKERS.items()
        }
        f_lang = not (
            hits["en"] >= hits["es"] and hits["en"] >= hits["fr"]
        )
        f_rep = False
        if len(toks) >= 3:
            grams = [
                " ".join(toks[i : i + 3])
                for i in range(len(toks) - 2)
            ]
            f_rep = 2 * (len(grams) - len(set(grams))) > len(grams)
        if not (f_len or f_alnum or f_lang or f_rep):
            per[s][1] += 1
        per[s][2] += f_len
        per[s][3] += f_alnum
        per[s][4] += f_lang
        per[s][5] += f_rep
    got = {
        r["source"]: r
        for r in entrymod.queries()["curation_gate_by_source"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(per)
    for s, (n, np_, fl, fa, fg, fr) in per.items():
        g = got[s]
        assert g["n_docs"] == n
        assert g["n_pass"] == np_
        assert g["fail_len"] == fl
        assert g["fail_alnum"] == fa
        assert g["fail_lang"] == fg
        assert g["fail_rep"] == fr
        assert g["pass_milli"] == np_ * 1000 // n
    # cross-check against the corpus-wide attribution ledger
    attr = {
        r["rule"]: r
        for r in entrymod.queries()["curation_gate_attribution"](
            spark, SF
        ).collect()
    }
    assert (
        sum(r["fail_len"] for r in got.values())
        == attr["min_tokens"]["n_fail"]
    )
    assert (
        sum(r["fail_lang"] for r in got.values())
        == attr["lang_en"]["n_fail"]
    )


def test_detector_agreement_replays(spark):
    from jigsaw_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    mhp = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, "doc_id")
        .select("doc_a", "doc_b")
        .collect()
    }
    shp = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(docs, "doc_id", max_hamming=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    [g] = entrymod.queries()["dedup_detector_agreement"](
        spark, SF
    ).collect()
    assert g["n_minhash"] == len(mhp)
    assert g["n_simhash"] == len(shp)
    assert g["n_both"] == len(mhp & shp)
    assert g["n_only_minhash"] == len(mhp - shp)
    assert g["n_only_simhash"] == len(shp - mhp)
    union = len(mhp | shp)
    assert g["jaccard_milli"] == (
        0 if union == 0 else len(mhp & shp) * 1000 // union
    )
    # the fixture exercises both detectors
    assert len(mhp) > 0 and len(shp) > 0


def test_phash_cluster_sources_replays(spark):
    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    ipairs = {
        (int(r["img_a"]), int(r["img_b"]))
        for r in entrymod.queries()["mm_phash_near_dup"](
            spark, SF
        ).collect()
    }
    universe = {
        int(r["image_id"])
        for r in entrymod.queries()["mm_image_phash"](
            spark, SF
        ).collect()
    }
    nodes = sorted({d for p in ipairs for d in p})
    comp = _uf_components(nodes, ipairs)
    clusters = defaultdict(lambda: defaultdict(int))
    for img in universe:
        clusters[comp.get(img, img)][docs[img]] += 1
    hist = defaultdict(lambda: [0, 0, 0, 0])  # n, multi, maj, tot
    for srcs in clusters.values():
        sz = sum(srcs.values())
        h = hist[sz]
        h[0] += 1
        h[1] += 1 if len(srcs) > 1 else 0
        h[2] += max(srcs.values())
        h[3] += sz
    got = {
        r["cluster_size"]: r
        for r in entrymod.queries()["mm_phash_cluster_sources"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(hist)
    for sz, (nc, nm, maj, tot) in hist.items():
        g = got[sz]
        assert g["n_clusters"] == nc
        assert g["n_multi_source"] == nm
        assert g["multi_milli"] == nm * 1000 // nc
        assert g["majority_mass_milli"] == maj * 1000 // tot
    assert sum(
        r["cluster_size"] * r["n_clusters"] for r in got.values()
    ) == len(universe)
