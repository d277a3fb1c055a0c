"""Delta MERGE: copy-on-write upsert at file granularity."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.delta import (
    _replay,
    delta_append,
    delta_delete_where,
    delta_merge,
    read_delta,
)


def _tbl(spark, tmp_path, files=4):
    t = str(tmp_path / "tbl")
    df = spark.range(400).withColumn("v", F.concat(F.lit("v"), F.col("id")))
    delta_append(
        spark, df.repartitionByRange(files, "id").sortWithinPartitions("id"), t
    )
    return t


def _content(spark, t, **kw):
    return {(r["id"], r["v"]) for r in read_delta(spark, t, **kw).collect()}


class TestMerge:
    def test_update_and_insert(self, spark, tmp_path):
        t = _tbl(spark, tmp_path)
        src = spark.createDataFrame(
            [(5, "UPDATED"), (999, "NEW")], "id long, v string"
        )
        v = delta_merge(spark, src, t, on=["id"])
        got = _content(spark, t)
        assert (5, "UPDATED") in got and (999, "NEW") in got
        assert (5, "v5") not in got
        assert len(got) == 401
        # pre-merge snapshot intact
        assert (5, "v5") in _content(spark, t, version=v - 1)

    def test_only_touched_files_rewritten(self, spark, tmp_path):
        t = _tbl(spark, tmp_path, files=4)
        pre, _ = _replay(spark, t, 0)
        # one key -> one touched file (range-clustered layout)
        src = spark.createDataFrame([(5, "UPDATED")], "id long, v string")
        v = delta_merge(spark, src, t, on=["id"])
        post, _ = _replay(spark, t, v)
        untouched = set(pre) & set(post)
        assert len(untouched) == 3  # 3 of 4 original files carried over

    def test_insert_only_touches_nothing(self, spark, tmp_path):
        t = _tbl(spark, tmp_path, files=4)
        pre, _ = _replay(spark, t, 0)
        src = spark.createDataFrame([(1000, "NEW")], "id long, v string")
        v = delta_merge(spark, src, t, on=["id"])
        post, _ = _replay(spark, t, v)
        assert set(pre) <= set(post)  # pure insert: no removes
        assert len(_content(spark, t)) == 401

    def test_merge_applies_deletion_vectors(self, spark, tmp_path):
        t = _tbl(spark, tmp_path)
        delta_delete_where(spark, t, "id % 2 = 1")
        src = spark.createDataFrame([(4, "UPDATED")], "id long, v string")
        v = delta_merge(spark, src, t, on=["id"])
        got = _content(spark, t)
        assert (4, "UPDATED") in got
        assert not any(i % 2 == 1 for i, _ in got)  # deletes stay deleted
        # touched files came back DV-free
        post, _ = _replay(spark, t, v)
        rewritten = [
            a for rel, a in post.items() if rel not in
            _replay(spark, t, v - 1)[0]
        ]
        assert rewritten and not any(
            a.get("deletionVector") for a in rewritten
        )

    def test_duplicate_source_keys_raise(self, spark, tmp_path):
        t = _tbl(spark, tmp_path)
        src = spark.createDataFrame(
            [(1, "a"), (1, "b")], "id long, v string"
        )
        with pytest.raises(ValueError, match="duplicate keys"):
            delta_merge(spark, src, t, on=["id"])

    def test_schema_mismatch_raises(self, spark, tmp_path):
        t = _tbl(spark, tmp_path)
        src = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="source columns"):
            delta_merge(spark, src, t, on=["id"])

    def test_partitioned_update_insert_new_partition(self, spark, tmp_path):
        t = str(tmp_path / "p")
        df = spark.range(40).withColumn(
            "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        ).withColumn("v", F.concat(F.lit("v"), F.col("id")))
        delta_append(spark, df, t, partition_by=["lang"])
        src = spark.createDataFrame(
            [
                (0, "en", "UP0"),  # update inside partition en
                (100, "fr", "NEW"),  # insert into a BRAND-NEW partition
            ],
            "id long, lang string, v string",
        )
        delta_merge(spark, src, t, on=["id"])
        got = {
            (r["id"], r["lang"], r["v"])
            for r in read_delta(spark, t).collect()
        }
        assert (0, "en", "UP0") in got and (0, "en", "v0") not in got
        assert (100, "fr", "NEW") in got
        assert len(got) == 41
        # partition pruning still works post-merge
        fr = read_delta(spark, t, skip_filters=[("lang", "=", "fr")])
        assert {r["id"] for r in fr.filter("lang = 'fr'").collect()} == {100}

    def test_partitioned_untouched_partition_files_survive(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "p2")
        df = spark.range(40).withColumn(
            "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        ).withColumn("v", F.lit("x"))
        delta_append(spark, df, t, partition_by=["lang"])
        adds0, _m = _replay(spark, t, 0)
        de_files = {
            rel
            for rel, a in adds0.items()
            if (a.get("partitionValues") or {}).get("lang") == "de"
        }
        src = spark.createDataFrame(
            [(0, "en", "up")], "id long, lang string, v string"
        )
        delta_merge(spark, src, t, on=["id"])
        adds1, _m = _replay(spark, t, 1)
        # the de partition's files are byte-identical survivors
        assert de_files <= set(adds1)
        assert read_delta(spark, t).count() == 40

    def test_merge_into_fully_tombstoned_table(self, spark, tmp_path):
        # every row DV-deleted: the scan yields zero survivors, so the
        # merge must behave as a pure insert (and must NOT resurrect
        # tombstoned rows from the files it probes)
        t = str(tmp_path / "tbl")
        df = spark.range(10).withColumn("v", F.lit("x"))
        delta_append(spark, df, t)
        delta_delete_where(spark, t, "id >= 0")
        assert read_delta(spark, t).count() == 0
        src = spark.createDataFrame([(100, "new")], "id long, v string")
        delta_merge(spark, src, t, on=["id"])
        assert _content(spark, t) == {(100, "new")}


def test_delta_partitions_metadata(spark, tmp_path):
    from dataset_grouper_spark.sources.delta import delta_partitions

    t = str(tmp_path / "meta")
    df = spark.range(40).withColumn(
        "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
    )
    delta_append(spark, df.repartition(1), t, partition_by=["lang"])
    rows = {
        r["partition"]: (r["n_files"], r["n_rows"])
        for r in delta_partitions(spark, t).collect()
    }
    assert rows == {'{"lang": "de"}': (1, 20), '{"lang": "en"}': (1, 20)}
    # a merge into one partition updates only that partition's row
    src = spark.createDataFrame(
        [(100, "de")], "id long, lang string"
    )
    delta_merge(spark, src, t, on=["id"])
    rows2 = {
        r["partition"]: r["n_rows"]
        for r in delta_partitions(spark, t).collect()
    }
    assert rows2['{"lang": "de"}'] == 21
    assert rows2['{"lang": "en"}'] == 20
    # unpartitioned: single NULL row; time travel pins the old state
    assert delta_partitions(spark, t, version=0).collect()[0] is not None
    t2 = str(tmp_path / "meta2")
    delta_append(spark, spark.range(7).repartition(1), t2)
    r0 = delta_partitions(spark, t2).collect()
    assert len(r0) == 1 and r0[0]["partition"] is None and r0[0]["n_rows"] == 7
