"""Round-10 batch 3: python replays for label propagation, label
conflicts, the ER threshold sweep, the shingle-size cost model, and
max drawdown."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _keeper_edges(spark):
    """Replay keeper_pairs via the production operator (itself covered
    by the dedup suite), returning the symmetric neighbor map."""
    from jigsaw_spark.operators.dedup import keeper_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    nbrs = defaultdict(set)
    for r in keeper_pairs(docs, "doc_id").collect():
        nbrs[r["doc_a"]].add(r["doc_b"])
        nbrs[r["doc_b"]].add(r["doc_a"])
    return nbrs


def test_label_propagation_replays(spark):
    nbrs = _keeper_edges(spark)
    labels = {u: u for u in nbrs}
    for _ in range(2):
        new = {}
        for u in nbrs:
            votes = Counter(labels[v] for v in nbrs[u])
            votes[labels[u]] += 1
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            # ties to the SMALLEST label
            top = max(votes.values())
            new[u] = min(l for l, c in votes.items() if c == top)
            assert best[1] == top
        labels = new
    sizes = Counter(Counter(labels.values()).values())
    got = {
        r["size"]: r
        for r in entrymod.queries()["graph_label_propagation"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(sizes)
    for size, n_comm in sizes.items():
        assert got[size]["n_communities"] == n_comm
        assert got[size]["n_nodes"] == size * n_comm


def test_label_conflict_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    groups = defaultdict(lambda: [0, set(), set()])
    for r in docs:
        fp = hashlib.md5(" ".join(_tokens(r["text"])).encode()).hexdigest()
        g = groups[fp]
        g[0] += 1
        g[1].add(r["lang"])
        g[2].add(r["source"])
    multi = [g for g in groups.values() if g[0] > 1]
    [g] = entrymod.queries()["dq_label_conflict"](spark, SF).collect()
    assert g["n_multi_groups"] == len(multi)
    assert g["n_docs_in_groups"] == sum(m[0] for m in multi)
    assert g["n_lang_conflict_groups"] == sum(
        1 for m in multi if len(m[1]) > 1
    )
    assert g["n_source_conflict_groups"] == sum(
        1 for m in multi if len(m[2]) > 1
    )
    assert g["n_docs_lang_conflict"] == sum(
        m[0] for m in multi if len(m[1]) > 1
    )
    conf = sum(1 for m in multi if len(m[1]) > 1 or len(m[2]) > 1)
    assert g["conflict_milli"] == (
        conf * 1000 // len(multi) if multi else 0
    )


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_er_threshold_sweep_replays(spark):
    parts = spark.read.parquet(f"{SF}/part.parquet").collect()
    keepers = {}
    for r in parts:
        k = (r["p_brand"], r["p_name"])
        if k not in keepers or r["p_partkey"] < keepers[k]:
            keepers[k] = r["p_partkey"]
    by_brand = defaultdict(list)
    for (brand, name), key in keepers.items():
        by_brand[brand].append((key, name))
    cand = []
    for brand, rows in by_brand.items():
        for i, (ka, na) in enumerate(rows):
            for kb, nb in rows:
                if ka < kb:
                    lev = _lev(na, nb)
                    ml = max(len(na), len(nb))
                    cand.append(((ml - lev) * 1000 // ml, lev <= 3))
    got = {
        r["thresh"]: r
        for r in entrymod.queries()["er_threshold_sweep"](
            spark, SF
        ).collect()
    }
    assert set(got) == {600, 700, 800, 900, 950}
    for t, g in got.items():
        tp = sum(1 for s, tr in cand if s >= t and tr)
        fp = sum(1 for s, tr in cand if s >= t and not tr)
        fn = sum(1 for s, tr in cand if s < t and tr)
        assert (g["tp"], g["fp"], g["fn"]) == (tp, fp, fn)
        assert g["prec_milli"] == (tp * 1000 // (tp + fp) if tp + fp else 0)
        assert g["rec_milli"] == (tp * 1000 // (tp + fn) if tp + fn else 0)
        assert g["f1_milli"] == (
            2 * tp * 1000 // (2 * tp + fp + fn) if 2 * tp + fp + fn else 0
        )


def test_shingle_sweep_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {
        r["n"]: r
        for r in entrymod.queries()["dedup_shingle_sweep"](
            spark, SF
        ).collect()
    }
    assert set(got) == {3, 5, 8}
    n_docs = len(docs)
    for n in (3, 5, 8):
        df = Counter()
        for r in docs:
            t = _tokens(r["text"])
            df.update(
                {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}
            )
        g = got[n]
        assert g["n_shingles"] == len(df)
        assert g["n_postings"] == sum(df.values())
        assert g["max_df"] == max(df.values())
        pairs = sum(d * (d - 1) // 2 for d in df.values())
        assert g["candidate_pairs"] == pairs
        assert g["pairs_per_doc_milli"] == pairs * 1000 // n_docs


def test_max_drawdown_replays(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    from decimal import Decimal

    daily = defaultdict(Decimal)
    for r in orders:
        day = int(r["o_orderdate"].timestamp() * 1_000_000) // 86400000000
        daily[day] += Decimal(str(r["o_totalprice"])).quantize(
            Decimal("0.01")
        )
    peak, best = None, None
    for day in sorted(daily):
        cents = int(daily[day] * 100)
        peak = cents if peak is None else max(peak, cents)
        dd = peak - cents
        if best is None or dd > best[0]:
            best = (dd, day, peak, cents)
    [g] = entrymod.queries()["ts_max_drawdown"](spark, SF).collect()
    assert g["n_days"] == len(daily)
    assert g["max_drawdown_cents"] == best[0]
    assert g["trough_day"] == best[1]
    assert g["peak_cents"] == best[2]
    assert g["trough_cents"] == best[3]


def test_quota_sample_replays(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    strata = defaultdict(list)
    for r in docs:
        strata[r["lang"]].append(r["doc_id"])
    total, budget = len(docs), 1000
    base = {l: budget * len(ids) // total for l, ids in strata.items()}
    rem = {l: (budget * len(ids)) % total for l, ids in strata.items()}
    extra = budget - sum(base.values())
    order = sorted(strata, key=lambda l: (-rem[l], l))
    quota = {
        l: base[l] + (1 if i < extra else 0) for i, l in enumerate(order)
    }

    def pri(d):
        return hashlib.md5(f"quota|{d}".encode()).hexdigest()

    got = {
        r["lang"]: r
        for r in entrymod.queries()["p_quota_sample"](spark, SF).collect()
    }
    assert set(got) == set(strata)
    assert sum(r["quota"] for r in got.values()) == budget
    for l, ids in strata.items():
        picked = sorted(ids, key=lambda d: (pri(d), d))[: quota[l]]
        g = got[l]
        assert g["n_stratum"] == len(ids)
        assert g["quota"] == quota[l]
        assert g["n_sampled"] == len(picked)
        assert g["sum_doc_id"] == sum(picked)


def test_paired_ttest_replays(spark):
    import math

    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    rows = [
        (
            r["user_id"],
            int(r["ts"].timestamp() * 1_000_000) // 86400000000,
            int(round(r["value"] * 100)),
        )
        for r in events
    ]
    days = [d for _, d, _ in rows]
    cut = (min(days) + max(days)) // 2 + 1
    per = defaultdict(lambda: [0, 0, 0, 0])
    for u, d, c in rows:
        p = per[u]
        if d < cut:
            p[0] += c
            p[1] += 1
        else:
            p[2] += c
            p[3] += 1
    ds = [
        sy * 1000 // cy - sx * 1000 // cx
        for sx, cx, sy, cy in per.values()
        if cx > 0 and cy > 0
    ]
    n = len(ds)
    sd, sdd = sum(ds), sum(x * x for x in ds)
    [g] = entrymod.queries()["ab_paired_ttest"](spark, SF).collect()
    assert g["n"] == n
    assert g["mean_d_milli"] == _tdiv(sd, n)
    if n >= 2 and n * sdd != sd * sd:
        t = (sd / n) / math.sqrt((sdd - sd * sd / n) / (n - 1) / n)
        assert abs(g["t_stat"] - round(t, 6)) < 1e-5
    else:
        assert g["t_stat"] == 0.0


def test_community_conductance_replays(spark):
    nbrs = _keeper_edges(spark)
    labels = {u: u for u in nbrs}
    for _ in range(2):
        new = {}
        for u in nbrs:
            votes = Counter(labels[v] for v in nbrs[u])
            votes[labels[u]] += 1
            top = max(votes.values())
            new[u] = min(l for l, c in votes.items() if c == top)
        labels = new
    sizes = Counter(labels.values())
    top5 = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    deg = {u: len(vs) for u, vs in nbrs.items()}
    vol_all = sum(deg.values())
    got = {
        r["community"]: r
        for r in entrymod.queries()["graph_community_conductance"](
            spark, SF
        ).collect()
    }
    assert set(got) == {lbl for lbl, _ in top5}
    for rnk, (lbl, size) in enumerate(top5, 1):
        members = {u for u, l in labels.items() if l == lbl}
        vol = sum(deg[u] for u in members)
        cut = sum(
            1 for u in members for v in nbrs[u] if labels[v] != lbl
        )
        g = got[lbl]
        assert g["rnk"] == rnk
        assert g["size"] == size
        assert g["vol"] == vol
        assert g["cut_edges"] == cut
        mv = min(vol, vol_all - vol)
        assert g["conductance_milli"] == (cut * 1000 // mv if mv else 0)


def test_weekday_anova_replays(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in events:
        day = int(r["ts"].timestamp() * 1_000_000) // 86400000000
        daily[day] += int(round(r["value"] * 100))
    groups = defaultdict(list)
    for day, cents in daily.items():
        groups[day % 7].append(cents)
    n = len(daily)
    k = len(groups)
    s = sum(daily.values())
    ssq = sum(c * c for c in daily.values())
    sb = sum(sum(g) ** 2 / len(g) for g in groups.values())
    ssb = sb - s * s / n
    ssw = ssq - sb
    [g] = entrymod.queries()["ts_weekday_anova"](spark, SF).collect()
    assert g["n"] == n
    assert g["k"] == k
    assert abs(g["ssb"] - round(ssb, 2)) < 1
    assert abs(g["ssw"] - round(ssw, 2)) < 1
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(g["f_stat"] - round(f, 6)) < 1e-4
