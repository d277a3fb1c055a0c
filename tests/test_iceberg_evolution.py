"""iceberg_append(merge_schema=True): additive schema evolution with
continuing field ids, NULL backfill, snapshot-schema time travel, and
field-id stability for equality deletes."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.iceberg import (
    _load_metadata,
    iceberg_append,
    iceberg_delete_values,
    read_iceberg,
    read_iceberg_changes,
)


def _base(spark, tmp_path):
    t = str(tmp_path / "tbl")
    iceberg_append(
        spark, spark.range(10).withColumn("v", F.col("id") * 2), t
    )
    return t


def test_add_column_backfills_null(spark, tmp_path):
    t = _base(spark, tmp_path)
    wide = (
        spark.range(10, 13)
        .withColumn("v", F.col("id") * 2)
        .withColumn("extra", F.lit("x"))
    )
    iceberg_append(spark, wide, t, merge_schema=True)
    got = read_iceberg(spark, t)
    assert got.columns == ["id", "v", "extra"]
    assert got.count() == 13
    assert got.filter("extra IS NULL").count() == 10
    assert got.filter("extra = 'x'").count() == 3


def test_field_ids_continue_and_time_travel_keeps_old_schema(
    spark, tmp_path
):
    t = _base(spark, tmp_path)
    pre = _load_metadata(t)["current-snapshot-id"]
    wide = (
        spark.range(10, 12)
        .withColumn("v", F.col("id") * 2)
        .withColumn("extra", F.lit(7).cast("long"))
    )
    iceberg_append(spark, wide, t, merge_schema=True)
    meta = _load_metadata(t)
    schemas = {s["schema-id"]: s for s in meta["schemas"]}
    assert len(schemas) == 2
    new = schemas[meta["current-schema-id"]]
    ids = [f["id"] for f in new["fields"]]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    assert new["fields"][-1]["name"] == "extra"
    assert new["fields"][-1]["id"] == 3  # continues past id, v
    # time travel reads the OLD snapshot with the OLD schema
    old = read_iceberg(spark, t, pre)
    assert old.columns == ["id", "v"]
    assert old.count() == 10


def test_requires_existing_columns_lead(spark, tmp_path):
    t = _base(spark, tmp_path)
    bad = spark.range(3).withColumn("extra", F.lit(1)).select("extra", "id")
    with pytest.raises(ValueError, match="existing columns"):
        iceberg_append(spark, bad, t, merge_schema=True)
    # type change is rejected even under merge_schema
    retyped = spark.range(3).withColumn("v", F.lit("s"))
    with pytest.raises(ValueError, match="type changed"):
        iceberg_append(spark, retyped, t, merge_schema=True)
    # without merge_schema the mismatch still raises
    wide = (
        spark.range(3).withColumn("v", F.col("id")).withColumn("w", F.lit(1))
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        iceberg_append(spark, wide, t)


def test_equality_delete_spans_evolution(spark, tmp_path):
    # delete-by-key written BEFORE evolution still applies to old
    # rows, and keys appended AFTER evolution survive: field ids are
    # stable across the schema change
    t = _base(spark, tmp_path)
    iceberg_delete_values(spark, spark.createDataFrame([(3,)], "id long"), t)
    wide = (
        spark.range(3, 5)
        .withColumn("v", F.col("id") * 2)
        .withColumn("extra", F.lit("n"))
    )
    iceberg_append(spark, wide, t, merge_schema=True)
    got = {(r["id"], r["extra"]) for r in read_iceberg(spark, t).collect()}
    assert (3, "n") in got and (3, None) not in got
    assert len(got) == 11  # 10 - 1 deleted + 2 appended


def test_changes_read_uses_range_end_schema(spark, tmp_path):
    t = _base(spark, tmp_path)
    wide = (
        spark.range(10, 12)
        .withColumn("v", F.col("id") * 2)
        .withColumn("extra", F.lit("x"))
    )
    iceberg_append(spark, wide, t, merge_schema=True)
    # range ending at the evolved snapshot: wide schema, old files
    # backfill NULL
    all_rows = read_iceberg_changes(spark, t, 0)
    assert all_rows.columns == ["id", "v", "extra"]
    assert all_rows.filter("extra IS NULL").count() == 10
    # range ending BEFORE evolution: the old schema
    early = read_iceberg_changes(spark, t, 0, to_sequence=1)
    assert early.columns == ["id", "v"]
