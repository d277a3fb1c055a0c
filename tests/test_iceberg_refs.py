"""Iceberg refs (tags/branches): pinning, ref reads, expiry survival."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.iceberg import (
    _load_metadata,
    iceberg_append,
    iceberg_drop_ref,
    iceberg_expire_snapshots,
    iceberg_set_ref,
    read_iceberg,
)


def _tbl(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(3):
        iceberg_append(
            spark, spark.range(i * 10, (i + 1) * 10).coalesce(1), t
        )
    return t


def test_tag_pins_and_reads(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    first = sorted(
        s["snapshot-id"] for s in _load_metadata(t)["snapshots"]
    )[0]
    assert iceberg_set_ref(t, "v1.0", first) == first
    got = read_iceberg(spark, t, ref="v1.0")
    assert sorted(r["id"] for r in got.collect()) == list(range(10))
    # default ref = current snapshot
    assert (
        iceberg_set_ref(t, "head")
        == _load_metadata(t)["current-snapshot-id"]
    )
    assert read_iceberg(spark, t, ref="head").count() == 30


def test_tagged_snapshot_survives_expiry(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    first = sorted(
        s["snapshot-id"] for s in _load_metadata(t)["snapshots"]
    )[0]
    iceberg_set_ref(t, "release", first)
    expired = iceberg_expire_snapshots(t, keep_last=1)
    assert first not in expired
    assert read_iceberg(spark, t, ref="release").count() == 10
    # dropping the ref makes it expirable
    iceberg_drop_ref(t, "release")
    expired = iceberg_expire_snapshots(t, keep_last=1)
    assert first in expired
    with pytest.raises(ValueError, match="no ref named"):
        read_iceberg(spark, t, ref="release")


def test_ref_validation(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    with pytest.raises(ValueError, match="not in table"):
        iceberg_set_ref(t, "x", 999)
    with pytest.raises(ValueError, match="'tag' or 'branch'"):
        iceberg_set_ref(t, "x", ref_type="head")
    with pytest.raises(ValueError, match="no ref named"):
        iceberg_drop_ref(t, "missing")
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(spark, t, snapshot_id=1, ref="x")
