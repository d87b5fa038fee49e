"""Round-13 batch 2 replays: streaming image admission, the session
timeout sweep, CMS width curve, and the partition advisor —
independent Python replicas at sf0.001."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _phash_bytes(spark):
    rows = entrymod.queries()["mm_image_phash"](spark, SF).collect()
    bytes_of = defaultdict(dict)
    for r in rows:
        bytes_of[int(r["image_id"])][r["byte_idx"]] = r["byte_val"]
    return bytes_of


def test_stream_phash_dedup_replays(spark):
    bytes_of = _phash_bytes(spark)
    corp = {i for i in bytes_of if i % 40 == 0}
    strm = {i for i in bytes_of if i % 40 != 0}
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(
            f"{SF}/documents.parquet"
        ).collect()
    }
    cand, blocked = set(), set()
    for s in strm:
        for c in corp:
            if any(
                bytes_of[s][k] == bytes_of[c][k] for k in bytes_of[s]
            ):
                cand.add(s)
                ham = sum(
                    bin(bytes_of[s][k] ^ bytes_of[c][k]).count("1")
                    for k in bytes_of[s]
                )
                if ham <= 6:
                    blocked.add(s)
    got = {
        r["source"]: r
        for r in entrymod.queries()["stream_phash_dedup"](
            spark, SF
        ).collect()
    }
    exp_src = {src[s] for s in strm}
    assert set(got) == exp_src
    for sname in exp_src:
        sdocs = {s for s in strm if src[s] == sname}
        g = got[sname]
        assert g["n_streamed"] == len(sdocs)
        assert g["n_candidates"] == len(sdocs & cand)
        assert g["n_blocked"] == len(sdocs & blocked)
        assert g["n_admitted"] == len(sdocs) - len(sdocs & blocked)
    # the synthetic twins (i%40==20 vs their %40==0 sibling) must be
    # caught by the admission gate: blocking is exercised
    assert any(s % 40 == 20 for s in blocked)
    # and the gate admits SOMETHING (not everything collides)
    assert sum(g["n_admitted"] for g in got.values()) > 0


def test_session_timeout_sweep_replays(spark):
    import calendar

    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    per_user = defaultdict(list)
    for r in events:
        ts = r["ts"]
        us = (
            calendar.timegm(ts.utctimetuple()) * 1_000_000
            + ts.microsecond
        )
        per_user[r["user_id"]].append((us, r["event_id"]))
    got = {
        r["timeout_s"]: r
        for r in entrymod.queries()["ts_session_timeout_sweep"](
            spark, SF
        ).collect()
    }
    assert set(got) == {60, 300, 1800, 7200}
    for t in (60, 300, 1800, 7200):
        lens = []
        for _u, evs in per_user.items():
            evs = sorted(evs)
            cur = 0
            for i, (us, _eid) in enumerate(evs):
                if i == 0 or us - evs[i - 1][0] > t * 1_000_000:
                    if cur:
                        lens.append(cur)
                    cur = 1
                else:
                    cur += 1
            if cur:
                lens.append(cur)
        g = got[t]
        n_sessions = len(lens)
        singles = sum(1 for x in lens if x == 1)
        assert g["n_sessions"] == n_sessions, t
        assert g["n_singletons"] == singles, t
        assert g["singleton_milli"] == singles * 1000 // n_sessions
        assert (
            g["events_per_session_milli"]
            == sum(lens) * 1000 // n_sessions
        )
        assert g["max_session_events"] == max(lens)
    # longer timeouts can only merge sessions
    assert (
        got[60]["n_sessions"]
        >= got[300]["n_sessions"]
        >= got[1800]["n_sessions"]
        >= got[7200]["n_sessions"]
    )


def test_cms_width_curve_replays(spark):
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    cnt = defaultdict(int)
    for r in events:
        cnt[r["user_id"]] += 1
    got = {
        r["width"]: r
        for r in entrymod.queries()["agg_cms_width_curve"](
            spark, SF
        ).collect()
    }
    assert set(got) == {256, 1024, 4096}
    for w in (256, 1024, 4096):
        cells = defaultdict(int)
        cell_of = {}
        for u, c in cnt.items():
            for j in range(4):
                h = hashlib.md5(f"{j}|{u}".encode()).hexdigest()[:12]
                cell = int(h, 16) % w
                cells[(j, cell)] += c
                cell_of[(u, j)] = cell
        overs = {
            u: min(cells[(j, cell_of[(u, j)])] for j in range(4)) - c
            for u, c in cnt.items()
        }
        g = got[w]
        assert g["n_cells"] == 4 * w
        assert g["n_keys"] == len(cnt)
        assert g["n_exact"] == sum(1 for v in overs.values() if v == 0)
        assert (
            g["mean_over_milli"]
            == sum(overs.values()) * 1000 // len(cnt)
        )
        assert g["max_over"] == max(overs.values())
        # CMS never underestimates
        assert all(v >= 0 for v in overs.values())
    # wider sketches are never worse
    assert (
        got[256]["mean_over_milli"]
        >= got[1024]["mean_over_milli"]
        >= got[4096]["mean_over_milli"]
    )


def test_partition_advisor_replays(spark):
    rows = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    cands = {
        "l_returnflag": lambda r: r["l_returnflag"],
        "l_linestatus": lambda r: r["l_linestatus"],
        "ship_month": lambda r: str(
            r["l_shipdate"].year * 100 + r["l_shipdate"].month
        ),
        "l_suppkey": lambda r: str(r["l_suppkey"]),
    }
    got = {
        r["candidate"]: r
        for r in entrymod.queries()["layout_partition_advisor"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(cands)
    for name, fn in cands.items():
        parts = defaultdict(int)
        for r in rows:
            parts[fn(r)] += 1
        n_p = len(parts)
        total = sum(parts.values())
        mx = max(parts.values())
        g = got[name]
        assert g["n_partitions"] == n_p, name
        assert g["n_rows"] == total, name
        assert g["max_part_rows"] == mx, name
        assert g["skew_milli"] == mx * n_p * 1000 // total, name
        assert g["small_parts"] == sum(
            1 for v in parts.values() if v * n_p * 2 < total
        ), name
