"""Example: the incremental-lakehouse loop — streaming ingestion into
Iceberg, compaction that the change stream never notices, schema
evolution mid-stream, and a gap-filled time-series rollup of the
result; all pure Python, no format jars.

Run: python examples/incremental_lakehouse.py
"""

import os
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark.operators.timeseries import gap_fill
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources.iceberg import (
    iceberg_append,
    iceberg_rewrite_data_files,
    read_iceberg,
    read_iceberg_changes,
)
from dataset_grouper_spark.streaming.iceberg_source import (
    IcebergLiteDataSource,
)


def main() -> None:
    spark = get_spark("incremental-lakehouse")
    spark.dataSource.register(IcebergLiteDataSource)
    base = tempfile.mkdtemp(prefix="incr_lake_")
    table = os.path.join(base, "events")

    # 1) three small "ingestion" commits (one snapshot each)
    for day in range(3):
        batch = (
            spark.range(day * 200, (day + 1) * 200)
            .withColumnRenamed("id", "event_id")
            .withColumn("sec", F.col("event_id") * 1800)  # every 30 min
            .withColumn("v", (F.col("event_id") % 17).cast("double"))
        )
        iceberg_append(spark, batch.coalesce(1), table)
    print("snapshots after ingest:", 3)

    # 2) a downstream consumer tails the table incrementally — the
    #    changelog read sees exactly the new snapshots' rows
    delta_rows = read_iceberg_changes(spark, table, from_sequence=2)
    print("rows appended after seq 2:", delta_rows.count())  # 200

    # 3) compact the small files; the REPLACE snapshot is invisible
    #    to incremental consumers
    iceberg_rewrite_data_files(spark, table)
    print(
        "rows 'changed' by compaction:",
        read_iceberg_changes(spark, table, from_sequence=3).count(),  # 0
    )

    # 4) schema evolution mid-stream: a new quality column appears;
    #    old files backfill NULL
    evolved = (
        spark.range(600, 700)
        .withColumnRenamed("id", "event_id")
        .withColumn("sec", F.col("event_id") * 1800)
        .withColumn("v", (F.col("event_id") % 17).cast("double"))
        .withColumn("quality", F.lit("gold"))
    )
    iceberg_append(spark, evolved.coalesce(1), table, merge_schema=True)
    cur = read_iceberg(spark, table)
    print(
        "rows:", cur.count(),
        "| null-quality (pre-evolution):",
        cur.filter("quality IS NULL").count(),
    )

    # 5) Structured Streaming tails the snapshot log through the
    #    registered iceberg_lite source and lands the stream in a
    #    SECOND Iceberg table through the format's exactly-once
    #    streaming WRITER — lakehouse-to-lakehouse, no jars
    mirror = os.path.join(base, "mirror")
    q = (
        spark.readStream.format("iceberg_lite")
        .option("path", table)
        .load()
        .writeStream.format("iceberg_lite")
        .option("path", mirror)
        .option("epochAppId", "mirror-job")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    print("mirrored rows:", read_iceberg(spark, mirror).count())

    # 6) regularize onto a dense hourly grid with forward-fill
    rollup = gap_fill(
        cur.withColumn("g", F.lit("all")),
        "sec",
        3600,
        ["g"],
        [F.avg("v").alias("avg_v")],
        fill={"avg_v": "ffill"},
    )
    print("dense hourly buckets:", rollup.count())
    rollup.orderBy("bucket_start").show(5)


if __name__ == "__main__":
    main()
