"""Interleaved same-session A/B of registered queries between the working
tree ("new") and a git ref ("old", default HEAD).

Why: at sf0.1 on a 32-thread local JVM, cross-session min-of-N timings
mislead — deep-warm sessions flatten everything and the sandbox drifts
±5 % over hours (r13 lesson). The only trustworthy comparison is
old/new alternating inside ONE Spark session.

Mechanism: the old side is materialized with `git archive <ref>` into a
temp dir, the new side is the repo itself; before every timed rep the
jigsaw_spark package is evicted from sys.modules and re-imported from
the side's directory (sys.path[0] swap). The repo working tree is never
touched. Timing methodology matches bench.py: noop sink, plan
construction inside the timed region.

Usage:
    python tools/ab_interleave.py [-n 4] [--ref HEAD] name [name...]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile
import time
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=4, help="reps per side")
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    old_dir = tempfile.mkdtemp(prefix="ab_old_")
    subprocess.run(
        f"git -C {REPO} archive {args.ref} jigsaw_spark | tar -x -C {old_dir}",
        shell=True,
        check=True,
    )

    sys.path.insert(0, str(REPO))
    from jigsaw_spark.session import get_spark  # noqa: E402

    spark = get_spark("jigsaw_spark-ab")
    sys.path.pop(0)

    import glob

    for p in sorted(glob.glob(os.path.join(args.sf, "*.parquet"))):
        spark.read.parquet(p).count()

    def _warm(batches):
        import hashlib

        for pdf in batches:
            pdf["h"] = [
                hashlib.md5(str(x).encode()).hexdigest() for x in pdf["id"]
            ]
            yield pdf[["id"]]

    spark.range(200_000).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_warm, "id long").write.mode("overwrite").format(
        "noop"
    ).save()

    sides = {"old": old_dir, "new": str(REPO)}
    results: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in args.names
    }
    try:
        for rep in range(args.n):
            for side, sdir in sides.items():
                qs = _load_queries(sdir)
                for name in args.names:
                    spec = qs[name]
                    spark.sparkContext.setJobDescription(
                        f"ab {name} {side} rep{rep}"
                    )
                    t0 = time.perf_counter()
                    df = spec.spark(spark, args.sf)
                    df.write.mode("overwrite").format("noop").save()
                    results[name][side].append(
                        round(time.perf_counter() - t0, 4)
                    )
        spark.sparkContext.setJobDescription(None)
        for name in args.names:
            o, n = results[name]["old"], results[name]["new"]
            print(
                f"AB {name}: old_min={min(o)} new_min={min(n)} "
                f"old={o} new={n} "
                f"speedup_min={round(min(o) / min(n), 3)}",
                flush=True,
            )
    finally:
        shutil.rmtree(old_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
