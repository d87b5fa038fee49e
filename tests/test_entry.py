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
    bounded window (~50). Round-5 policy: every query with no driver row
    across CORRECTNESS_r01-r04 must sit inside the first 50 slots, with
    oracle-backed entries ahead of rows-only ones (an exact hash check is
    worth more than a rows-only check, so it must never be displaced by
    one)."""
    import json
    import pathlib

    from jigsaw_spark.plans.queries import QUERIES

    root = pathlib.Path(__file__).resolve().parents[1]
    certified: set[str] = set()
    for r in ("01", "02", "03", "04"):
        path = root / f"CORRECTNESS_r{r}.json"
        if path.exists():
            certified |= set(json.loads(path.read_text()))

    names = list(QUERIES)
    never = [q for q in names if q not in certified]
    window = names[:50]

    # every slot is spent on a never-certified query
    wasted = [q for q in window if q not in never]
    assert not wasted, f"already-certified queries inside the window: {wasted}"

    # the pre-r5 certification debt (never-certified queries that are
    # NOT this round's additions in queries_r7) must ALL be inside the
    # window — the r4 verdict's top ask; the new queries only take the
    # slots the debt leaves free
    new_modules = {
        f"jigsaw_spark.plans.queries_r{i}" for i in range(7, 24)
    }  # this round's additions (batches r7-r23) queue BEHIND the debt
    debt = [
        q for q in never if QUERIES[q].spark.__module__ not in new_modules
    ]
    outside = [q for q in debt if q not in window]
    assert not outside, f"pre-r5 debt outside the window: {outside}"

    # slots the debt leaves free go to oracle-backed new queries first
    fillers = [q for q in window if q not in debt]
    rows_only_fillers = [q for q in fillers if QUERIES[q].oracle is None]
    assert not rows_only_fillers, (
        f"rows-only new queries took window slots: {rows_only_fillers}"
    )
