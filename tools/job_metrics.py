"""Deterministic execution-shape metrics for declared queries.

    python tools/job_metrics.py <query> [query ...]

Runs each query with the bench methodology (warmed session, noop sink,
release_intermediates after) and prints jobs / stages / tasks /
shuffle-write bytes consumed from the Spark status store — metrics a
throttled host cannot distort, used for before/after evidence when
wall-clock is unreliable. Uses $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys


def _counts(spark):
    store = spark._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    njobs = jobs.size()
    nstages = 0
    ntasks = 0
    for i in range(njobs):
        j = jobs.apply(i)
        nstages += j.stageIds().size()
        ntasks += j.numCompletedTasks()
    # shuffle bytes written, summed over completed stages (r14: the
    # drift-immune instrument for shuffle-codec / shuffle-volume
    # claims — wall-clock on this host cannot be trusted, bytes can).
    # stageList's trailing params have Scala defaults py4j cannot
    # apply implicitly; fetch them via the $default$N accessors.
    wbytes = 0
    defaults = [
        getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)
    ]
    stages = store.stageList(None, *defaults)
    for i in range(stages.size()):
        wbytes += stages.apply(i).shuffleWriteBytes()
    return njobs, nstages, ntasks, wbytes


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e
    from dataset_grouper_spark.cache import release_intermediates
    from dataset_grouper_spark.session import get_spark

    spark = get_spark("job-metrics")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    qs = e.queries()
    for name in names:
        j0, s0, t0, w0 = _counts(spark)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_intermediates()
        j1, s1, t1, w1 = _counts(spark)
        print(
            f"{name}: jobs={j1 - j0} stages={s1 - s0} tasks={t1 - t0} "
            f"shuffle_write={(w1 - w0) / 1e6:.2f}MB",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
