"""Scale stress for the r6 session-3 operators: wide gap_fill axes and
many-file Iceberg compaction (run explicitly with -m slow)."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators.timeseries import gap_fill
from dataset_grouper_spark.sources.iceberg import (
    _live_files,
    _load_metadata,
    iceberg_append,
    iceberg_rewrite_data_files,
    read_iceberg,
)


@pytest.mark.slow
def test_gap_fill_wide_axis_distributes(spark):
    # 20 groups x ~100k hourly buckets each = 2M dense rows via the
    # per-group sequence explode — must complete without driver-side
    # materialization (the axis lives on the group rows)
    n_groups, span_h = 20, 100_000
    df = (
        spark.range(n_groups)
        .withColumnRenamed("id", "g")
        .withColumn(
            "h", F.explode(F.sequence(F.lit(0), F.lit(span_h), F.lit(500)))
        )
        .withColumn("sec", F.col("h") * 3600)
        .withColumn("v", (F.col("g") * 7 + F.col("h")).cast("double"))
    )
    out = gap_fill(
        df,
        "sec",
        3600,
        ["g"],
        [F.sum("v").alias("sv")],
        fill={"sv": "ffill"},
    )
    total = out.count()
    assert total == n_groups * (span_h + 1)
    # spot check: forward fill leaves no NULLs after the first bucket
    assert out.filter("sv IS NULL").count() == 0


@pytest.mark.slow
def test_compaction_bins_respect_target(spark, tmp_path):
    # 64 one-file appends; a target that fits ~8 inputs per bin must
    # produce multiple bins, each output under ~target, content exact
    t = str(tmp_path / "tbl")
    for i in range(64):
        iceberg_append(
            spark,
            spark.range(i * 1000, (i + 1) * 1000).withColumn(
                "s", F.concat(F.lit("x"), F.col("id"))
            ).coalesce(1),
            t,
        )
    data, _d, _r, _e = _live_files(t, _snap(t))
    assert len(data) == 64
    import os

    per_file = max(os.path.getsize(p) for p, _ in data)
    target = per_file * 8
    iceberg_rewrite_data_files(spark, t, target_file_bytes=target)
    data2, _d, _r, _e = _live_files(t, _snap(t))
    assert 6 <= len(data2) <= 12  # ~64/8 bins
    assert read_iceberg(spark, t).count() == 64_000
    assert (
        read_iceberg(spark, t).agg(F.sum("id")).collect()[0][0]
        == (64_000 - 1) * 64_000 // 2
    )


def _snap(t):
    meta = _load_metadata(t)
    return {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]


@pytest.mark.slow
def test_format_writer_many_tasks(spark, tmp_path):
    # 64-task format-API write: one file per task, one atomic commit,
    # stats recorded for every file, content exact
    from dataset_grouper_spark.sources.delta import (
        _replay,
        delta_skip_plan,
        read_delta,
    )
    from dataset_grouper_spark.streaming.delta_source import (
        DeltaLiteDataSource,
    )

    try:
        spark.dataSource.register(DeltaLiteDataSource)
    except Exception:
        pass
    t = str(tmp_path / "big")
    n = 1_000_000
    (
        spark.range(n)
        .withColumn("v", (F.col("id") * 7) % 1000)
        .repartitionByRange(64, "id")
        .sortWithinPartitions("id")
        .write.format("delta_lite")
        .mode("append")
        .option("path", t)
        .save()
    )
    adds, _m = _replay(spark, t, 0)
    assert len(adds) == 64
    got = read_delta(spark, t)
    assert got.count() == n
    assert got.agg(F.sum("id")).collect()[0][0] == (n - 1) * n // 2
    # every file carries stats: a range filter prunes most files
    kept, total = delta_skip_plan(spark, t, [("id", "<=", n // 64)])
    assert total == 64 and len(kept) <= 3
