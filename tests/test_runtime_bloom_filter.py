"""Runtime bloom-filter join pruning evidence (slow-marked).

Spark's own row-level runtime filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects a bloom
filter built from a SELECTIVE dim side into the fact scan of a shuffle
join — the engine-native form of "prune the big side before the
shuffle" that complements this repo's explicit guards (broadcast dims,
salted joins, AQE skew split). At 100 TB this is the difference between
shuffling the whole fact table and shuffling the ~1% that can match.

The thresholds default to 10 MB (creation side) / 10 GB (application
side), so the feature silently never fires at test scale; this test
lowers them to force injection and asserts BOTH the plan evidence and
result equality with the unfiltered join (bloom false positives are
screened by the exact join, so results must be identical).
"""

import pytest
from pyspark.sql import functions as F


@pytest.mark.slow
def test_runtime_bloom_filter_prunes_fact_scan(spark):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # lowered so injection fires at test scale; production keeps
        # the 10MB/10GB defaults
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
        # broadcast would bypass the shuffle join the filter targets
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(2_000_000).select(
            (F.col("id") % 100_000).alias("k"), (F.col("id") * 3).alias("v")
        )
        # selective dim: filtered to 50 of 100k keys
        dim = spark.range(100_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("cat")
        ).filter(F.col("k") % 2000 == 0)
        j = fact.join(dim, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in optimized or "BloomFilter" in optimized, (
            "runtime bloom filter was not injected:\n" + optimized[:3000]
        )
        row = j.collect()[0]
        # exact equality with the unfiltered join: the bloom filter is
        # a pre-screen, never a semantics change
        assert row["n"] == 50 * 20  # 50 dim keys x 20 fact rows each
        expected = sum(
            (k + 100_000 * i) * 3
            for k in range(0, 100_000, 2000)
            for i in range(20)
        )
        assert row["sv"] == expected
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
