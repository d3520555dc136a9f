"""Per-query measurement harness for the optimization rounds (guide §1).

Times individual headline queries (bench.py variants included) with the noop
sink at any SF dir, N samples each, and optionally dumps
.explain("formatted") to plans/. bench.py stays FROZEN for the driver; this
file exists so optimization work can isolate one query at a time without a
16-minute full-bench turnaround.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain DIR] [query ...]
With no query names, runs every headline query.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # the frozen harness: reuse its variant definitions


def headline_fns():
    from kgner.queries import QUERIES

    fns = {}
    for name in bench.HEADLINE:
        fn, label = bench.PROD_VARIANTS.get(name, (QUERIES[name], "contract"))
        fns[name] = fn
        if name in bench.PROD_VARIANTS:
            fns[name + ":contract"] = QUERIES[name]
    return fns


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None, help="directory for <query>.txt explain dumps")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    os.environ.setdefault("KGNER_DRIVER_MEM", "48g")
    from kgner.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("kgner-bench-extra", master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    fns = headline_fns()
    names = args.queries or list(fns)
    # warm-up identical to bench.py
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    bench._materialize(docs.select(F.lower("text").alias("t")))
    from kgner.operators.ensemble import decode_spans_udf

    bench._materialize(
        docs.limit(512).repartition(32).select(
            decode_spans_udf(F.split("text", " ").cast("array<string>")).alias("s")
        )
    )

    out = {}
    for name in names:
        fn = fns[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(args.explain, f"{name.replace(':', '_')}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for _ in range(args.reps):
            bench._clear_persisted(spark)
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            bench._materialize(fn(spark, args.sf))
            samples.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(json.dumps({name: samples}), flush=True)
    print(json.dumps({"all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
