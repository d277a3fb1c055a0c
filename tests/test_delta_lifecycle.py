"""Delta table lifecycle: OPTIMIZE (bin-packing + DV materialization),
VACUUM (log-horizon file reaping), RESTORE (diff-only rollback),
timestampAsOf resolution, and mergeSchema appends."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.delta import (
    _replay,
    delta_append,
    delta_checkpoint,
    delta_delete_where,
    delta_optimize,
    delta_restore,
    delta_truncate_log,
    delta_vacuum,
    delta_versions,
    read_delta,
    read_delta_changes,
    resolve_delta_version,
)


def _build(spark, tmp_path, appends=4, partitioned=False, name="tbl"):
    t = str(tmp_path / name)
    df = (
        spark.range(400)
        .withColumn("lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de"))
        .withColumn("v", F.col("id") * 3)
    )
    for i in range(appends):
        delta_append(
            spark,
            df.filter(F.col("id") % appends == i),
            t,
            partition_by=["lang"] if partitioned else None,
        )
    return t


def _content(spark, t, **kw):
    return {
        (r["id"], r["lang"], r["v"])
        for r in read_delta(spark, t, **kw).collect()
    }


class TestOptimize:
    def test_compacts_and_preserves_content(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=4, partitioned=True)
        before = _content(spark, t)
        adds0, _ = _replay(spark, t, 3)
        v = delta_optimize(spark, t, target_file_bytes=1 << 30)
        assert v == 4
        adds1, _ = _replay(spark, t, v)
        # every partition's small files packed into one file each
        assert len(adds1) < len(adds0)
        assert _content(spark, t) == before
        # pre-optimize versions still time travel to the same content
        assert _content(spark, t, version=3) == before

    def test_materializes_deletion_vectors(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=3)
        delta_delete_where(spark, t, "id % 10 = 0")
        survivors = _content(spark, t)
        v = delta_optimize(spark, t, target_file_bytes=1 << 30)
        adds, _ = _replay(spark, t, v)
        assert not any(a.get("deletionVector") for a in adds.values())
        assert _content(spark, t) == survivors
        # the DV'd state is still reachable below the optimize commit
        assert _content(spark, t, version=v - 1) == survivors

    def test_noop_returns_none(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=1)
        delta_optimize(spark, t, target_file_bytes=1 << 30)
        # one clean file per partition group: nothing left to pack
        assert delta_optimize(spark, t, target_file_bytes=1 << 30) is None

    def test_invisible_to_change_feed(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=2)
        v = delta_optimize(spark, t, target_file_bytes=1 << 30)
        # dataChange=false remove/add: CDC over the optimize commit is
        # empty, not an error
        assert read_delta_changes(spark, t, v - 1, v).count() == 0

    def test_big_clean_files_untouched(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=3)
        adds0, _ = _replay(spark, t, 2)
        # every existing file counts as "big": nothing to do
        assert delta_optimize(spark, t, small_file_bytes=1) is None
        adds1, _ = _replay(spark, t, 2)
        assert adds0.keys() == adds1.keys()


class TestVacuum:
    def test_retained_history_keeps_everything(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=3)
        delta_optimize(spark, t, target_file_bytes=1 << 30)
        # the full log is still present: the replaced small files are
        # referenced by versions 0-2 and must survive
        assert delta_vacuum(spark, t, dry_run=True) == []

    def test_reaps_after_truncation(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=3)
        delta_delete_where(spark, t, "id % 7 = 0")
        survivors = _content(spark, t)
        delta_optimize(spark, t, target_file_bytes=1 << 30)
        delta_checkpoint(spark, t)
        delta_truncate_log(t)
        doomed = delta_vacuum(spark, t)
        assert doomed  # the compacted-away files and the orphaned DV bin
        assert any(d.startswith("deletion_vector_") for d in doomed)
        assert _content(spark, t) == survivors
        # vacuum is idempotent
        assert delta_vacuum(spark, t) == []

    def test_dry_run_deletes_nothing(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=2)
        delta_optimize(spark, t, target_file_bytes=1 << 30)
        delta_checkpoint(spark, t)
        delta_truncate_log(t)
        doomed = delta_vacuum(spark, t, dry_run=True)
        assert doomed
        for rel in doomed:
            assert os.path.exists(os.path.join(t, rel))


class TestRestore:
    def test_rollback_content(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=2)
        at_v1 = _content(spark, t)
        delta_delete_where(spark, t, "id % 2 = 0")
        assert _content(spark, t) != at_v1
        v = delta_restore(spark, t, 1)
        assert v == 3
        assert _content(spark, t) == at_v1
        # history stays linear: the deleted state is still reachable
        assert _content(spark, t, version=2) != at_v1

    def test_noop_restore(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=2)
        assert delta_restore(spark, t, 1) == 1

    def test_restore_schema(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        delta_append(spark, df, t)
        delta_append(
            spark, df.withColumn("extra", F.lit("x")), t, merge_schema=True
        )
        assert read_delta(spark, t).columns == ["id", "v", "extra"]
        delta_restore(spark, t, 0)
        assert read_delta(spark, t).columns == ["id", "v"]

    def test_restore_to_truncated_version_raises(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=2)
        delta_optimize(spark, t, target_file_bytes=1 << 30)
        delta_checkpoint(spark, t)
        delta_truncate_log(t)
        delta_vacuum(spark, t)
        # version 0 predates the checkpoint horizon: replay itself fails
        with pytest.raises(ValueError, match="missing commits"):
            delta_restore(spark, t, 0)

    def test_restore_to_missing_files_raises(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=2)
        v = delta_optimize(spark, t, target_file_bytes=1 << 30)
        # simulate an out-of-band reaper racing ahead of the log horizon
        pre, _ = _replay(spark, t, 0)
        post, _ = _replay(spark, t, v)
        gone = sorted(set(pre) - set(post))[0]
        os.remove(os.path.join(t, gone))
        with pytest.raises(FileNotFoundError, match="vacuumed"):
            delta_restore(spark, t, 0)


class TestTimestampTravel:
    def _pin(self, t, base=1000.0):
        log = os.path.join(t, "_delta_log")
        for v in delta_versions(t):
            p = os.path.join(log, f"{v:020d}.json")
            os.utime(p, (base + v, base + v))

    def test_resolution(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=3)
        self._pin(t)
        assert resolve_delta_version(t, 1000.0) == 0
        assert resolve_delta_version(t, 1001.5) == 1
        assert resolve_delta_version(t, 5000.0) == 2
        with pytest.raises(ValueError):
            resolve_delta_version(t, 999.0)

    def test_read_at_timestamp(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=4)
        self._pin(t)
        n = read_delta(spark, t, timestamp=1001.0).count()
        assert n == 200  # two of four quarter-appends
        with pytest.raises(ValueError):
            read_delta(spark, t, version=1, timestamp=1001.0)

    def test_checkpoint_stands_in_after_truncation(self, spark, tmp_path):
        t = _build(spark, tmp_path, appends=2)
        delta_checkpoint(spark, t)
        delta_truncate_log(t)
        log = os.path.join(t, "_delta_log")
        cp = glob.glob(os.path.join(log, "*.checkpoint.parquet"))[0]
        os.utime(cp, (2000.0, 2000.0))
        assert resolve_delta_version(t, 2500.0) == 1


class TestMergeSchema:
    def test_new_columns_backfill_null(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(20).withColumn("v", F.col("id") * 2)
        delta_append(spark, df, t)
        with pytest.raises(ValueError):
            delta_append(spark, df.withColumn("extra", F.lit(1)), t)
        delta_append(
            spark,
            df.filter("id < 5").withColumn("extra", F.col("id") + 100),
            t,
            merge_schema=True,
        )
        out = read_delta(spark, t)
        assert out.columns == ["id", "v", "extra"]
        r = out.agg(
            F.count("*").alias("n"),
            F.count("extra").alias("ne"),
            F.sum("extra").alias("se"),
        ).collect()[0]
        assert (r["n"], r["ne"], r["se"]) == (25, 5, 510)

    def test_frame_missing_existing_column_raises(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        delta_append(spark, df, t)
        with pytest.raises(ValueError, match="missing"):
            delta_append(
                spark,
                df.select("id").withColumn("extra", F.lit(1)),
                t,
                merge_schema=True,
            )

    def test_type_change_raises(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        delta_append(spark, df, t)
        with pytest.raises(ValueError, match="cannot change"):
            delta_append(
                spark,
                df.withColumn("v", F.col("v").cast("string"))
                .withColumn("extra", F.lit(1)),
                t,
                merge_schema=True,
            )

    def test_column_order_normalized(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        delta_append(spark, df, t)
        delta_append(
            spark,
            df.withColumn("extra", F.lit(7)).select("extra", "v", "id"),
            t,
            merge_schema=True,
        )
        out = read_delta(spark, t)
        assert out.columns == ["id", "v", "extra"]
        assert out.filter("extra = 7").count() == 10
