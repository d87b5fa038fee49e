"""Isolate one or more registered queries: noop-sink timing (min of N
repeats, plan construction inside the timed region — bench.py
methodology) plus optional .explain("formatted") capture.

Usage:
    python tools/profile_query.py [-n 3] [--explain-dir plans/r13] \
        [--suffix before] name [name...]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jigsaw_spark.plans.queries import QUERIES  # noqa: E402
from jigsaw_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("jigsaw_spark-profile")
    # session warmup identical in spirit to bench.py so repeat 1 is not
    # measuring JVM/worker cold start
    import glob

    for p in sorted(glob.glob(os.path.join(args.sf, "*.parquet"))):
        spark.read.parquet(p).count()

    def _warm(batches):
        import hashlib

        for pdf in batches:
            pdf["h"] = [hashlib.md5(str(x).encode()).hexdigest() for x in pdf["id"]]
            yield pdf[["id"]]

    spark.range(200_000).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_warm, "id long").write.mode("overwrite").format("noop").save()

    for name in args.names:
        spec = QUERIES[name]
        times = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            df = spec.spark(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        print(f"RESULT {name}: min={min(times)} times={times}", flush=True)
        if args.explain_dir:
            out = Path(args.explain_dir)
            out.mkdir(parents=True, exist_ok=True)
            df = spec.spark(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())


if __name__ == "__main__":
    main()
