"""Round-5 batch 13: Pareto class replay + the bucketed join's
no-shuffle plan property."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_pareto_abc_replay(spark):
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    rev = defaultdict(int)
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        if r["o_custkey"] in cust:
            rev[r["o_custkey"]] += int(round(r["o_totalprice"] * 100))
    by_nation = defaultdict(list)
    for ck, cents in rev.items():
        by_nation[cust[ck]].append((ck, cents))
    want = defaultdict(lambda: [0, 0])
    for nation, rows in by_nation.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        total = sum(c for _, c in rows)
        cum_prev = 0
        for ck, cents in rows:
            if cum_prev * 100 < 80 * total:
                cls = "A"
            elif cum_prev * 100 < 95 * total:
                cls = "B"
            else:
                cls = "C"
            cum_prev += cents
            want[(nation, cls)][0] += 1
            want[(nation, cls)][1] += cents
    got = {
        (r["nation"], r["abc"]): [r["n_customers"], r["class_cents"]]
        for r in entrymod.queries()["rel_pareto_abc"](spark, SF).collect()
    }
    assert got == dict(want)


def test_bucketed_join_has_no_exchange(spark):
    df = entrymod.queries()["j11_bucketed_join"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the whole point of bucketBy: the join runs bucket-to-bucket with
    # no shuffle on either input (the only Exchange allowed is the
    # single-partition one for the final small aggregate)
    join_section = plan.split("HashAggregate")[-1]
    assert "Exchange hashpartitioning" not in join_section, plan
    # and the result matches the plain (shuffled) join
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    plain = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment")
        .count()
    )
    want = {r["c_mktsegment"]: r["count"] for r in plain.collect()}
    got = {r["c_mktsegment"]: r["n_orders"] for r in df.collect()}
    assert got == want
