"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, then compares row count, sorted column names, and an
order-insensitive value hash.

Faithful to the driver's canonicalizer (r2 + r3 lessons — each round the
replica was more permissive than the driver in one specific way and let
reds escape):

- **Both sides are converted to pandas DataFrames first** — Spark via
  ``DataFrame.toPandas()``, DuckDB via ``relation.df()`` — because that
  is what the driver does.  This is the r3 lesson: DuckDB ``sum(int)``
  returns HUGEINT, which ``.df()`` converts to **float64** (``6.0``)
  while Spark's BIGINT stays int64 (``6``) → hash mismatch on
  value-equal results.  ``fetchall()`` (Python ints) hid it and 5
  "exact-integer" queries went driver-red.  Rule: every final integer
  aggregate in the oracle must be ``CAST(sum(...) AS BIGINT)``;
  the replica now reproduces the mismatch if it isn't.
- **Array/map/struct-typed output cells are a hard FAIL.** The driver
  canonicalizes through ``pandas.DataFrame.sort_values`` over every
  column, which raises ``TypeError: unhashable type: 'list'`` on
  list-valued cells (the r2 ``ann_sq8`` / ``ml_hash_features`` ERRs).
  Queries must emit scalars only (CSV-join or explode vectors).
- **Floats render at full repr precision** (17 significant digits) —
  every final double column must be bit-identical across engines.  The
  codebase convention that makes this hold: round every final double
  (after a 9-digit inner snap when the value feeds from order-dependent
  sums), keep threshold comparisons in exact integer/decimal arithmetic.
- **Dtype class is part of the canon**: an int64 ``6`` and a float64
  ``6.0`` are different; a Decimal ``1.2300`` and a float ``1.23`` are
  different.  Final columns must land on the same pandas dtype on both
  sides (practically: BIGINT ints, rounded DOUBLE floats, strings —
  never DECIMAL, never nullable ints that pandas promotes to float).
- ``--stability`` re-runs each Spark query under a second, deliberately
  different shuffle-partition count and compares full-precision hashes:
  catches partition-order-dependent float sums (the r2
  ``text_entropy``-class flakes) even when Spark-vs-DuckDB happens to
  agree in this environment.

Run before every commit:

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


class UnsortableCell(Exception):
    """A cell the driver's pandas canonicalizer cannot sort (list/dict/…)."""


def canon(v) -> str:
    import numpy as np

    # numpy scalars → Python scalars first (pandas cells arrive as
    # np.int64 / np.float64 / np.bool_); keeps rendering identical to
    # what the driver's str/repr of the pandas cell produces.
    if isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            v = 0.0
        # full repr precision — the driver does NOT round for us.
        # NOTE: float64 6.0 renders "6.0", int64 6 renders "6" —
        # dtype divergence IS a mismatch, exactly like the driver.
        return repr(v)
    if isinstance(v, (list, tuple, set, dict, bytearray, np.ndarray)):
        raise UnsortableCell(type(v).__name__)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def to_pandas_rows(pdf) -> list[tuple]:
    """Cell tuples from a pandas DataFrame, preserving dtypes.

    itertuples keeps numpy scalar types (int64 vs float64 vs object),
    which is the whole point — the driver compares post-pandas values.
    """
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


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
    ap.add_argument(
        "--stability",
        action="store_true",
        help="run each Spark query a second time with "
        "spark.sql.shuffle.partitions=7 and compare full-precision "
        "hashes — catches partition-order-dependent float results",
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
            spdf = sdf.toPandas()
            srows = to_pandas_rows(spdf)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            # Rows-only outputs still pass through the driver's pandas
            # canonicalizer — an array/map cell raises TypeError there
            # (the r5 text_bpe_encode escape: this branch used to SKIP
            # before hashing, so the unsortable-cell ERR class was never
            # exercised locally for rows-only queries).  Hash and discard.
            try:
                table_hash(srows, list(range(len(scols))))
            except UnsortableCell as e:
                failures.append(name)
                print(
                    f"FAIL {name}: rows-only output has array-typed cell "
                    f"({e}) — driver ERR class; emit scalars only"
                )
                continue
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
            dcols = list(dpdf.columns)
            drows = to_pandas_rows(dpdf)
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
            try:
                sh, dh = table_hash(srows, s_order), table_hash(drows, d_order)
            except UnsortableCell as e:
                problems.append(
                    f"array-typed output cell ({e}) — driver ERR class; "
                    "emit scalars only"
                )
                sh = dh = None
            if sh is not None and sh != dh:
                problems.append("value-hash mismatch")
                # show first diverging canonical line for debugging
                sl = sorted("\x1f".join(canon(r[i]) for i in s_order) for r in srows)
                dl = sorted("\x1f".join(canon(r[i]) for i in d_order) for r in drows)
                for a, b in zip(sl, dl):
                    if a != b:
                        print(f"  spark: {a!r}\n  duck : {b!r}")
                        break
            if sh is not None and not problems and args.stability:
                old = spark.conf.get("spark.sql.shuffle.partitions")
                try:
                    spark.conf.set("spark.sql.shuffle.partitions", "7")
                    srows2 = to_pandas_rows(qs[name](spark, args.sf).toPandas())
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", old)
                if table_hash(srows2, s_order) != sh:
                    problems.append(
                        "UNSTABLE: result changes with shuffle partitioning "
                        "(order-dependent float path)"
                    )
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
