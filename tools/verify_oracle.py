"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, then compares row count, sorted column names, and an
order-insensitive value hash (rows rendered to canonical strings, sorted,
md5'd). Run before every commit:

    python tools/verify_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from jigsaw_spark.session import TABLES, get_spark


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical float rendering: kill -0.0 and 1e-13 noise
        if v == 0:
            v = 0.0
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted("\x1f".join(canon(r[i]) for i in col_order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use an UNCONFIGURED SparkSession like the driver does "
        "(default shuffle partitions / broadcast threshold / no engine "
        "confs) — catches config-dependent divergence the tuned session "
        "hides (the r01 merge_upsert flake class)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "verify-vanilla"
        ).getOrCreate()
    else:
        spark = get_spark("verify-oracle", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(args.sf) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            s_order = [scols.index(c) for c in sorted(scols)]
            d_order = [dcols.index(c) for c in sorted(dcols)]
            sh, dh = table_hash(srows, s_order), table_hash(drows, d_order)
            if sh != dh:
                problems.append("value-hash mismatch")
                # show first diverging canonical line for debugging
                sl = sorted("\x1f".join(canon(r[i]) for i in s_order) for r in srows)
                dl = sorted("\x1f".join(canon(r[i]) for i in d_order) for r in drows)
                for a, b in zip(sl, dl):
                    if a != b:
                        print(f"  spark: {a!r}\n  duck : {b!r}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
