"""iceberg_rewrite_data_files: bin-packing compaction as a REPLACE
snapshot — file counts shrink, content is invariant, time travel to
pre-compaction snapshots survives, and merge-on-read deletes (position
AND equality, including delete-then-reinsert) compact row-correctly."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.iceberg import (
    _live_files,
    _load_metadata,
    iceberg_append,
    iceberg_delete_values,
    iceberg_delete_where,
    iceberg_rewrite_data_files,
    read_iceberg,
)


def _live(t):
    meta = _load_metadata(t)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    return _live_files(t, snap)


def _rows(spark, t, snapshot_id=None):
    return sorted(
        tuple(r) for r in read_iceberg(spark, t, snapshot_id).collect()
    )


@pytest.fixture()
def small_table(spark, tmp_path):
    """Four 1-file appends of 25 rows each."""
    t = str(tmp_path / "tbl")
    for i in range(4):
        df = spark.range(i * 25, (i + 1) * 25).withColumn(
            "s", F.concat(F.lit("v"), F.col("id"))
        )
        iceberg_append(spark, df.coalesce(1), t)
    return t


def test_compaction_shrinks_and_preserves(spark, small_table):
    t = small_table
    before = _rows(spark, t)
    data, _d, _r, _e = _live(t)
    assert len(data) == 4
    pre_snap = _load_metadata(t)["current-snapshot-id"]
    sid = iceberg_rewrite_data_files(spark, t)
    assert sid != pre_snap
    data2, _d, _r, _e = _live(t)
    assert len(data2) == 1
    assert _rows(spark, t) == before
    # time travel to the pre-compaction snapshot still reads 4 files
    assert _rows(spark, t, pre_snap) == before
    # summary marks the replace
    meta = _load_metadata(t)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[sid]
    assert snap["summary"]["operation"] == "replace"
    assert snap["summary"]["compacted-data-files"] == "4"


def test_compaction_noop_below_min_input(spark, tmp_path):
    t = str(tmp_path / "tbl")
    iceberg_append(spark, spark.range(10).coalesce(1), t)
    cur = _load_metadata(t)["current-snapshot-id"]
    assert iceberg_rewrite_data_files(spark, t) == cur
    # big-file threshold: nothing qualifies
    iceberg_append(spark, spark.range(10, 20).coalesce(1), t)
    cur = _load_metadata(t)["current-snapshot-id"]
    assert (
        iceberg_rewrite_data_files(spark, t, small_file_bytes=1) == cur
    )


def test_compaction_applies_position_deletes(spark, small_table):
    t = small_table
    iceberg_delete_where(spark, t, "id % 10 = 3")
    expect = _rows(spark, t)
    assert len(expect) == 90
    iceberg_rewrite_data_files(spark, t)
    data, _d, _r, _e = _live(t)
    assert len(data) == 1
    got = _rows(spark, t)
    assert got == expect
    # compacted files carry no trace of the deleted rows even ignoring
    # the (now inert) delete files: raw row count is 90
    import pyarrow.parquet as pq

    assert sum(pq.ParquetFile(p).metadata.num_rows for p, _ in data) == 90


def test_compaction_equality_delete_then_reinsert(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"old{i}") for i in range(20)], "id long, s string"
    )
    iceberg_append(spark, df.coalesce(1), t)  # seq 1
    keys = spark.createDataFrame([(7,), (8,)], "id long")
    iceberg_delete_values(spark, keys, t)  # seq 2: delete 7, 8
    re = spark.createDataFrame([(7, "new7")], "id long, s string")
    iceberg_append(spark, re.coalesce(1), t)  # seq 3: reinsert 7
    expect = _rows(spark, t)
    assert (7, "new7") in expect and not any(r[0] == 8 for r in expect)
    iceberg_rewrite_data_files(spark, t)
    data, _d, _r, eq = _live(t)
    assert len(data) == 1  # both data files merged
    assert _rows(spark, t) == expect
    # the delete files survive (they may govern future reads of kept
    # files); a fresh append after compaction is NOT affected by them
    assert eq  # still declared
    iceberg_append(
        spark,
        spark.createDataFrame([(8, "back8")], "id long, s string").coalesce(
            1
        ),
        t,
    )
    got = _rows(spark, t)
    assert (8, "back8") in got and (7, "new7") in got


def test_compaction_partitioned_per_partition_bins(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for half in range(2):
        df = spark.createDataFrame(
            [
                (i, "de" if i % 2 else "en")
                for i in range(half * 20, (half + 1) * 20)
            ],
            "id long, lang string",
        )
        iceberg_append(
            spark,
            df.repartition(2, "lang"),
            t,
            partition_spec=[("lang", "identity")],
        )
    before = _rows(spark, t)
    data, _d, _r, _e = _live(t)
    assert len(data) == 4  # 2 partitions x 2 appends
    iceberg_rewrite_data_files(spark, t)
    data2, _d, _r, _e = _live(t)
    assert len(data2) == 2  # one file per partition
    assert _rows(spark, t) == before
    # partition structs survive: manifest-level pruning still works
    de = read_iceberg(spark, t, partition_filter={"lang": "de"})
    assert sorted(r["id"] for r in de.collect()) == list(range(1, 40, 2))
    meta = _load_metadata(t)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    kept, _p, _r2, _e2 = _live_files(t, snap, {"lang": "de"})
    assert len(kept) == 1


def test_iceberg_partitions_metadata(spark, tmp_path):
    from dataset_grouper_spark.sources.iceberg import iceberg_partitions

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 else "en") for i in range(40)],
        "id long, lang string",
    )
    iceberg_append(
        spark,
        df.repartition(2, "lang"),
        t,
        partition_spec=[("lang", "identity")],
    )
    rows = {
        r["partition"]: (r["n_files"], r["n_rows"])
        for r in iceberg_partitions(spark, t).collect()
    }
    assert rows == {'{"lang": "de"}': (1, 20), '{"lang": "en"}': (1, 20)}
    # unpartitioned: one NULL-partition row
    t2 = str(tmp_path / "tbl2")
    iceberg_append(spark, spark.range(7).coalesce(1), t2)
    rows2 = iceberg_partitions(spark, t2).collect()
    assert len(rows2) == 1 and rows2[0]["n_rows"] == 7
    assert rows2[0]["partition"] is None


def test_zorder_rewrite_narrows_both_dimensions(spark, tmp_path):
    from dataset_grouper_spark.sources.iceberg import (
        _load_metadata as _lm,
    )

    t = str(tmp_path / "ztbl")
    n, files = 20_000, 8
    df = (
        spark.range(n)
        .withColumn("y", (F.col("id") * 7919) % 1000)
    )
    # id-clustered layout: y filters prune NOTHING at the manifest
    iceberg_append(
        spark,
        df.repartitionByRange(files, "id").sortWithinPartitions("id"),
        t,
    )

    def kept(skip):
        meta = _lm(t)
        snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
            meta["current-snapshot-id"]
        ]
        data, _d, _r, _e = _live_files(
            t, snap, None, skip, {1: "long", 2: "long"}
        )
        return len(data)

    assert kept(None) == files
    assert kept([(2, "<=", 60)]) == files  # y-bounds are all-spanning
    before = _rows(spark, t)
    sid = iceberg_rewrite_data_files(
        spark, t, target_file_bytes=1 << 14, zorder_by=("id", "y")
    )
    meta = _lm(t)
    assert meta["current-snapshot-id"] == sid
    total = kept(None)
    assert total >= 4
    assert _rows(spark, t) == before
    # post-rewrite, BOTH dimensions prune at the manifest level
    assert kept([(2, "<=", 60)]) < total
    assert kept([(1, "<=", n // 8)]) < total
