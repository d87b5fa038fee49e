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
    outside = [q for q in never if q not in window]
    assert not outside, f"never-certified queries outside the window: {outside}"

    # oracle-backed before rows-only inside the window
    kinds = [QUERIES[n].oracle is None for n in window if n in never]
    assert kinds == sorted(kinds), "rows-only entry ahead of an oracle-backed one"
