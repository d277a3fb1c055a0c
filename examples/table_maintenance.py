"""Example: the table-maintenance lifecycle a long-lived ingestion
table needs — OPTIMIZE (compaction + z-order), data skipping, VACUUM,
RESTORE, schema evolution, streaming the log as a source, and the
Iceberg retention twins — all jar-free.

Run: python examples/table_maintenance.py
"""

import os
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources.delta import (
    delta_append,
    delta_delete_where,
    delta_optimize,
    delta_restore,
    delta_skip_plan,
    delta_vacuum,
    delta_checkpoint,
    delta_truncate_log,
    read_delta,
)
from dataset_grouper_spark.sources.iceberg import (
    iceberg_append,
    iceberg_delete_values,
    iceberg_expire_snapshots,
    iceberg_remove_orphans,
    read_iceberg,
)
from dataset_grouper_spark.streaming.delta_source import DeltaLiteDataSource


def main() -> None:
    spark = get_spark("example-maintenance")
    base = tempfile.mkdtemp(prefix="maint_")
    table = os.path.join(base, "events")

    # --- many small appends (the ingestion anti-pattern OPTIMIZE fixes)
    df = (
        spark.range(20_000)
        .withColumn("x", (F.col("id") * 37) % 1000)
        .withColumn("y", (F.col("id") * 91) % 1000)
    )
    for i in range(4):
        delta_append(spark, df.filter(F.col("id") % 4 == i), table)

    # --- OPTIMIZE ZORDER BY: compact + re-cluster on two dimensions
    v = delta_optimize(spark, table, target_file_bytes=64_000, zorder_by=("x", "y"))
    kept, total = delta_skip_plan(spark, table, [("y", "<", 100)])
    print(f"optimize -> v{v}; y<100 skip plan keeps {len(kept)}/{total} files")

    # --- retention: checkpoint, truncate the replayed log, reap files
    delta_checkpoint(spark, table)
    delta_truncate_log(table)
    reaped = delta_vacuum(spark, table)
    print(f"vacuum reaped {len(reaped)} unreferenced files")

    # --- oops: a bad DELETE lands... and rolls back diff-only
    delta_delete_where(spark, table, "id % 100 = 0")
    print(f"after bad delete: {read_delta(spark, table).count()} rows")
    restored = delta_restore(spark, table, v)
    print(f"restored to v{v} as new commit v{restored}: "
          f"{read_delta(spark, table).count()} rows")

    # --- schema evolution: a new column arrives mid-stream
    delta_append(
        spark,
        df.filter("id < 10").withColumn("score", F.col("id") * 0.5),
        table,
        merge_schema=True,
    )
    evolved = read_delta(spark, table)
    print(f"evolved columns: {evolved.columns}; "
          f"non-null scores: {evolved.filter('score IS NOT NULL').count()}")

    # --- stream the log: exactly-once tail of future commits
    spark.dataSource.register(DeltaLiteDataSource)
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    q = (
        spark.readStream.format("delta_lite")
        .option("path", table)
        .option("startingVersion", restored + 1)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    print(f"streamed {spark.read.parquet(sink).count()} rows "
          "(just the post-restore commit)")

    # --- Iceberg twins: delete-by-key, expire, remove orphans
    ice = os.path.join(base, "ice")
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    iceberg_append(spark, docs, ice)
    iceberg_delete_values(
        spark, spark.createDataFrame([(i,) for i in range(0, 100, 10)],
                                     "doc_id long"), ice
    )
    iceberg_append(
        spark, spark.createDataFrame([(0, "reborn")],
                                     "doc_id long, text string"), ice
    )
    print(f"iceberg rows after delete-by-key + reinsert: "
          f"{read_iceberg(spark, ice).count()}")
    iceberg_expire_snapshots(ice, keep_last=1)
    orphans = iceberg_remove_orphans(ice)
    print(f"iceberg retention reaped {len(orphans)} files; table still "
          f"reads {read_iceberg(spark, ice).count()} rows")

    spark.stop()


if __name__ == "__main__":
    main()
