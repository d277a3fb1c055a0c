"""Time a subset of declared queries with the bench's methodology
(noop sink, warmed session, release_intermediates between queries).

    python tools/time_queries.py [-n REPS] <query> [query ...]

Prints per-query seconds for each rep. Uses $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and $SPARK_GRAFT_CPUS like bench.py.
For iterating on one optimization without paying the full 232-query
bench; the round's before/after evidence still comes from bench.py.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e
    from dataset_grouper_spark.cache import release_intermediates
    from dataset_grouper_spark.session import get_spark

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    qs = e.queries()
    for name in names:
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            release_intermediates()
            print(f"{name} rep{r}: {dt:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
