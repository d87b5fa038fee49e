"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Execution is forced with the noop sink (full computation, no driver-side
collect, no output I/O) so timings reflect the query plan, not pickling.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from jigsaw_spark.session import get_spark  # noqa: E402
from jigsaw_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("jigsaw_spark-bench", cpus=cpus)

    # warm the JVM + parquet footers + Python/Arrow workers once so
    # per-query times measure the plan, not one-time session setup. The
    # warm kernel does real hash work so every worker slot actually spawns
    # a Python process and imports the deps the query kernels use.
    import glob as _glob

    for p in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        spark.read.parquet(p).count()

    def _warm(batches):
        import hashlib

        import numpy as np  # noqa: F401

        for pdf in batches:
            pdf["h"] = [
                hashlib.md5(str(x).encode()).hexdigest() for x in pdf["id"]
            ]
            yield pdf[["id"]]

    spark.range(200_000).repartition(cpus).mapInPandas(
        _warm, "id long"
    ).write.mode("overwrite").format("noop").save()

    # two passes, report min: single-pass timings on a 32-thread local JVM
    # swing 2-3x on GC pauses and Python-worker churn; the min of two runs
    # is a stable estimate of actual plan cost. Plan construction +
    # compilation stays inside the timed region both times.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}
    for _ in range(passes):
        for name, spec in QUERIES.items():
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            elapsed = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, elapsed), elapsed)

    total = round(sum(timings.values()), 4)
    # streaming drains pay fixed micro-batch + checkpoint machinery that
    # is ~independent of data volume; reported separately so a 200-row
    # stream drain can't distort the batch headline (r6 verdict #3). The
    # driver-facing "value" stays the all-query total.
    stream_names = sorted(n for n in timings if n.startswith("stream_"))
    streaming = round(sum(timings[n] for n in stream_names), 4)
    batch = round(total - streaming, 4)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    # Full per-query timings go to a file; the stdout line stays compact
    # (the r01 driver failed to parse a ~3 KB line with all 130 timings —
    # it overflowed the capture window). The printed "queries" dict keeps
    # only the slowest handful as the headline signal.
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "batch_seconds": batch,
                "streaming_seconds": streaming,
                "n_streaming": len(stream_names),
                "queries": timings,
            },
            indent=1,
            sort_keys=True,
        )
    )
    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:8])
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": top,
                "sf": sf,
                "n_queries": len(timings),
                "batch_seconds": batch,
                "streaming_seconds": streaming,
                "n_streaming": len(stream_names),
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
