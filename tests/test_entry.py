"""Smoke tests for the driver contract."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"o_orderstatus", "n_orders", "total_price"}


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_every_query_runs_at_smoke_sf(spark):
    sf = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf)
        assert df.columns, name
        df.limit(1).collect()


def test_certification_window_covers_never_certified():
    """The driver's correctness gate walks the registry in order with a
    bounded window of exactly 50 slots. Round-14 policy (verdict r13 #1):
    slots 1-2 carry the r75 queue pair — the only 2 never-certified
    registry queries; the rest of the window is changed-code re-certs
    (the advisor-r10 rule): the round's direct rewrites first, then the
    narrow-keeper-frame / simhash-kernel inheritance consumers. Three
    changed-but-deferred names (r13-certified, kernel-internal refactors
    pinned by tests) plus the verdict-r13 stale pool queue directly
    behind slot 50. Overflow modules (queries_r{_OVERFLOW_BOUNDARY}+)
    queue behind slot 50 for the next round — the boundary is a single
    shared constant in plans/queries.py so this test and the registry
    cannot drift (advisor r9 #5). Clean rows-only entries
    (text_bpe_encode, ...) keep their one driver row and are never
    re-rotated."""
    import json
    import pathlib
    import re

    from jigsaw_spark.plans.queries import QUERIES, _OVERFLOW_BOUNDARY

    root = pathlib.Path(__file__).resolve().parents[1]
    certified: set[str] = set()
    for r in (
        "01", "02", "03", "04", "05", "06", "07", "08", "09", "10",
        "11", "12", "13",
    ):
        path = root / f"CORRECTNESS_r{r}.json"
        if path.exists():
            certified |= set(json.loads(path.read_text()))

    names = list(QUERIES)
    never = [
        q
        for q in names
        if q not in certified and QUERIES[q].oracle is not None
    ]

    assert names[0] == "dedup_pooled_text_detectors", (
        "slot 1 must start the r75-queue debt block (verdict r13 #1)"
    )
    assert names[1] == "dq_cluster_safe_repair", (
        "slot 2 must be the r75 queue's second query (verdict r13 #1)"
    )

    # all debt (never-certified oracle-backed) sits inside slots 1-50;
    # modules at/after the overflow boundary (next round's queue) are the
    # only exemption — derived, not hardcoded (advisor r9 #5)
    window = names[:50]

    def _is_overflow(module: str) -> bool:
        m = re.fullmatch(r"jigsaw_spark\.plans\.queries_r(\d+)", module)
        return m is not None and int(m.group(1)) >= _OVERFLOW_BOUNDARY

    debt = {
        q for q in never if not _is_overflow(QUERIES[q].spark.__module__)
    }
    outside = [q for q in debt if q not in window]
    assert not outside, f"certification debt outside slots 1-50: {outside}"

    # every window slot is oracle-backed (no rows-only row can certify)
    rows_only = [q for q in window if QUERIES[q].oracle is None]
    assert not rows_only, f"rows-only entries in the window: {rows_only}"

    # non-debt slots are padding and must already be driver-green
    padding = [q for q in window if q not in debt]
    uncertified_padding = [q for q in padding if q not in certified]
    assert not uncertified_padding, (
        f"padding slots must be long-green re-certs: {uncertified_padding}"
    )


def test_every_driver_row_names_a_live_query():
    """A green CORRECTNESS row can certify DEAD code: r10's per-node
    graph_triangles silently shadowed r4's global-count version from r5
    until the r6 duplicate-registration guard surfaced it, so the r02
    row was certifying code no longer reachable under that name (verdict
    r6 #8). Guard: every driver-row name must still exist in the
    registry, except explicitly documented deregistrations."""
    import json
    import pathlib

    from jigsaw_spark.plans.queries import QUERIES

    # r6 deliberately deregistered the four float-prone twins — their
    # exact-integer variants (ml_kmeans_exact, ...) are driver-green
    deliberate = {"ml_kmeans", "ml_logreg", "graph_pagerank", "ml_pca_pc1"}

    root = pathlib.Path(__file__).resolve().parents[1]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        dead = [n for n in rows if n not in QUERIES and n not in deliberate]
        assert not dead, (
            f"{path.name} certifies names no longer in the registry: {dead}"
        )
