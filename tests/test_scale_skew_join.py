"""AQE skew-join evidence (slow-marked): a manufactured hot key must
trigger Spark's runtime skew split — the no-manual-salting path that
complements operators/joins.py's explicit salted join."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.slow
def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # thresholds lowered so the 1.6M-row hot partition qualifies
        # at test scale; production keeps the 256MB defaults
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 1.6M fact rows, 75% on ONE key; 1k-row dim side
        fact = spark.range(1_600_000).select(
            F.when(F.col("id") % 4 != 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") + 5).alias("w")
        )
        j = fact.join(dim, "k")
        # execute THIS dataframe (count()/agg() spawn separate query
        # executions whose plans are what AQE annotates instead) and
        # read its own executed adaptive plan
        rows = j.collect()
        assert len(rows) == 1_600_000
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in executed, executed[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
