"""Shuffle-structure A/B: per-query total shuffle bytes/records, job and
stage counts for the working tree ("new") vs a git ref ("old").

Local wall-clock at sf0.1 measures job-scheduling latency more than plan
cost (SCALE.md §9), so kept-for-scale changes need a MEASURED structural
delta, not a prose argument (r13 verdict #6). This reports what actually
crossed the shuffle: bytes written, records written, stages and jobs per
query, read from the Spark UI REST API (the same numbers the driver's
stage pages show).

Side loading follows tools/ab_interleave.py (git archive + sys.path
swap; the repo tree is never touched). Each query runs once per side in
one session (metrics are counters — we diff before/after).

Usage:
    python tools/shuffle_ab.py [--ref HEAD] [--sf DIR] name [name...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _evict() -> None:
    for mod in [m for m in sys.modules if m.split(".")[0] == "jigsaw_spark"]:
        del sys.modules[mod]


def _load_queries(side_dir: str):
    _evict()
    sys.path.insert(0, side_dir)
    try:
        from jigsaw_spark.plans.queries import QUERIES  # noqa: PLC0415

        return dict(QUERIES)
    finally:
        sys.path.pop(0)


def _totals(ui: str, app_id: str) -> dict[str, int]:
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    done = [s for s in stages if s["status"] in ("COMPLETE", "SKIPPED")]
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in done),
        "shuffle_write_records": sum(
            s.get("shuffleWriteRecords", 0) for s in done
        ),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in done),
        "stages": len(done),
        "jobs": len(jobs),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    old_dir = tempfile.mkdtemp(prefix="shab_old_")
    subprocess.run(
        f"git -C {REPO} archive {args.ref} jigsaw_spark | tar -x -C {old_dir}",
        shell=True,
        check=True,
    )

    sys.path.insert(0, str(REPO))
    from jigsaw_spark.session import get_spark  # noqa: E402

    # the UI must be on for the REST metrics; everything else matches
    # the bench session
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("jigsaw_spark-shuffle-ab")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    sys.path.pop(0)
    del get_spark

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    sides = {"old": old_dir, "new": str(REPO)}
    rows: dict[str, dict[str, dict[str, int]]] = {}
    try:
        for side, sdir in sides.items():
            qs = _load_queries(sdir)
            for name in args.names:
                before = _totals(ui, app_id)
                spark.sparkContext.setJobDescription(f"shab {name} {side}")
                df = qs[name].spark(spark, args.sf)
                df.write.mode("overwrite").format("noop").save()
                after = _totals(ui, app_id)
                rows.setdefault(name, {})[side] = {
                    k: after[k] - before[k] for k in after
                }
        spark.sparkContext.setJobDescription(None)
        for name in args.names:
            o, n = rows[name]["old"], rows[name]["new"]
            print(
                f"SHUFFLE {name}:\n"
                f"  old: write={o['shuffle_write_bytes']:,}B "
                f"records={o['shuffle_write_records']:,} "
                f"stages={o['stages']} jobs={o['jobs']}\n"
                f"  new: write={n['shuffle_write_bytes']:,}B "
                f"records={n['shuffle_write_records']:,} "
                f"stages={n['stages']} jobs={n['jobs']}",
                flush=True,
            )
    finally:
        shutil.rmtree(old_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
