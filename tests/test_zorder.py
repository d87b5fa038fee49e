"""Z-order clustering: Morton key bit-parity vs a Python reference, and
real file-level min-max skipping measured from parquet footers."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from jigsaw_spark.sources.sinks import write_zordered, zorder_key


def _morton_ref(qs: list[int], bits: int) -> int:
    out = 0
    n = len(qs)
    for j, q in enumerate(qs):
        for i in range(bits):
            out |= ((q >> i) & 1) << (i * n + j)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 100, 7) for y in range(0, 50, 3)]
    df = spark.createDataFrame(rows, "x int, y int")
    with_bounds, key = zorder_key(df, ["x", "y"], bits=8)
    got = {
        (r["x"], r["y"]): r["k"]
        for r in with_bounds.withColumn("k", key).collect()
    }
    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    maxq = (1 << 8) - 1

    def scale(v, lo, hi):
        return min(maxq, int((v - lo) / (hi - lo) * maxq)) if hi > lo else 0

    for x, y in rows:
        qx = scale(x, min(xs), max(xs))
        qy = scale(y, min(ys), max(ys))
        assert got[(x, y)] == _morton_ref([qx, qy], 8), (x, y)


def _file_range_fractions(path: str, col: str) -> list[float]:
    lo_all, hi_all, spans = None, None, []
    per_file = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        fl, fh = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fl = s.min if fl is None else min(fl, s.min)
                    fh = s.max if fh is None else max(fh, s.max)
        per_file.append((fl, fh))
        lo_all = fl if lo_all is None else min(lo_all, fl)
        hi_all = fh if hi_all is None else max(hi_all, fh)
    span = (hi_all - lo_all) or 1
    return [(fh - fl) / span for fl, fh in per_file]


def test_write_zordered_shrinks_both_dims(spark, tmp_path):
    """After Z-clustering, the average per-file value range must shrink on
    BOTH dimensions; a lexicographic sort only shrinks the leading one."""
    df = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select("user_id", "value", "event_id")
        .withColumn("value", F.col("value").cast("double"))
    )
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["user_id", "value"], num_files=8)

    lpath = str(tmp_path / "lex")
    (
        df.repartitionByRange(8, "user_id", "value")
        .sortWithinPartitions("user_id", "value")
        .write.parquet(lpath)
    )

    z_u = sum(_file_range_fractions(zpath, "user_id")) / 8
    z_v = sum(_file_range_fractions(zpath, "value")) / 8
    l_u = sum(_file_range_fractions(lpath, "user_id")) / 8
    l_v = sum(_file_range_fractions(lpath, "value")) / 8

    # both dims prunable under Z-order…
    assert z_u < 0.7 and z_v < 0.7, (z_u, z_v)
    # …and Z-order strictly beats lexicographic on the trailing dim while
    # staying prunable on the leading one (lex wins the leading dim by
    # construction; Z trades a little of it for pruning on BOTH)
    assert l_u < 0.3
    assert z_v < l_v, (z_v, l_v)
    # row count preserved
    back = spark.read.parquet(zpath)
    assert back.count() == df.count()
    assert set(back.columns) == {"user_id", "value", "event_id"}
