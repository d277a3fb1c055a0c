"""Spark-native bucketed tables: co-located, shuffle-free joins.

The custom ``bucketed`` layout in ``sinks`` serves the reference's
group-stream reader (self-describing directories + sidecar index, any
engine can read it).  THIS module is the complementary Spark-native
path: ``bucketBy`` tables whose bucket metadata lives in the catalog,
so Catalyst itself elides the shuffle (and, with one file per bucket,
the sort) when two tables bucketed on the same key with the same
bucket count are joined.

100 TB rationale: a fact-fact join (orders x customer, lineitem x
orders) shuffles BOTH inputs every run — at 100 TB that is the single
largest network cost in the pipeline, paid per query.  Bucketing both
tables once at write time moves that cost to ingest; every subsequent
join on the bucket key is map-side (zero Exchange, plan-asserted in
tests/test_bucketed_tables.py).  The same trick co-locates repeated
self-joins (dedup candidate verification, session stitching).

Mechanics that matter:
- both sides must have the SAME bucket count (Spark does not coalesce
  mismatched bucketing; 4.x can coalesce multiples via
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``, but same-N is
  the portable contract);
- we repartition by the bucket columns before writing so each bucket
  is exactly ONE file (repartition and bucketBy share the murmur3-mod
  hash, so bucket i lands wholly in task i) — bounded file counts at
  ingest, and each join task reads one contiguous file per side.  The
  per-bucket Sort remains in the plan (Spark 3+ stopped consuming
  ``sortBy`` ordering metadata at scan time); it is local, linear and
  spill-safe — the eliminated Exchange is the 100 TB win;
- tables are EXTERNAL (explicit ``path``): dropping the catalog entry
  never deletes data, and a fresh session can re-register the same
  files.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as an external Spark-bucketed parquet table and
    return it re-read through the catalog (so downstream plans see the
    bucketing metadata).  The pre-write repartition on the bucket
    columns yields exactly one file per bucket — bounded file count
    and one contiguous read per join task."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.repartition(num_buckets, *bucket_cols)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    return spark.table(name)


def temp_table_name(prefix: str) -> str:
    """Catalog-safe unique table name (sessions may register many)."""
    return f"{prefix}_{uuid.uuid4().hex[:12]}"


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two registered bucketed tables on their bucket key.  When
    both were written by :func:`write_bucketed_table` with the same
    ``num_buckets`` over ``on``, the physical plan contains NO Exchange
    on either side — verify with ``plans.count_exchanges``."""
    return spark.table(left_name).join(spark.table(right_name), on, how)
