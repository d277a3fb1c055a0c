"""delta_lite Python data source: batch + streaming log tailing."""

import os

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.delta import (
    delta_append,
    delta_delete_where,
    delta_optimize,
    read_delta,
)
from dataset_grouper_spark.streaming.delta_source import DeltaLiteDataSource


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(DeltaLiteDataSource)
    return spark


def _tbl(spark, tmp_path, partitioned=False, name="tbl"):
    t = str(tmp_path / name)
    df = (
        spark.range(100)
        .withColumn("lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de"))
        .withColumn("v", F.col("id") * 2)
    )
    for i in range(2):
        delta_append(
            spark,
            df.filter(F.col("id") % 2 == i),
            t,
            partition_by=["lang"] if partitioned else None,
        )
    return t


class TestBatch:
    def test_matches_read_delta(self, registered, tmp_path):
        spark = registered
        t = _tbl(spark, tmp_path)
        got = spark.read.format("delta_lite").option("path", t).load()
        assert got.columns == ["id", "lang", "v"]
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in read_delta(spark, t).collect()
        }

    def test_partition_columns_restored(self, registered, tmp_path):
        spark = registered
        t = _tbl(spark, tmp_path, partitioned=True)
        got = spark.read.format("delta_lite").option("path", t).load()
        rows = got.groupBy("lang").count().collect()
        assert {(r["lang"], r["count"]) for r in rows} == {
            ("en", 50), ("de", 50)
        }

    def test_merged_schema_backfills_null(self, registered, tmp_path):
        spark = registered
        t = str(tmp_path / "tbl")
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        delta_append(spark, df, t)
        delta_append(
            spark,
            df.filter("id < 3").withColumn("extra", F.lit(9)),
            t,
            merge_schema=True,
        )
        got = spark.read.format("delta_lite").option("path", t).load()
        r = got.agg(
            F.count("*").alias("n"), F.count("extra").alias("ne")
        ).collect()[0]
        assert (r["n"], r["ne"]) == (13, 3)

    def test_dv_table_gated(self, registered, tmp_path):
        spark = registered
        t = _tbl(spark, tmp_path)
        delta_delete_where(spark, t, "id % 10 = 0")
        with pytest.raises(Exception, match="deletion vectors"):
            spark.read.format("delta_lite").option("path", t).load().collect()


class TestStream:
    def _run_available(self, spark, t, ckpt, out, starting=None):
        reader = spark.readStream.format("delta_lite").option("path", t)
        if starting is not None:
            reader = reader.option("startingVersion", starting)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_tail_and_resume(self, registered, tmp_path):
        spark = registered
        t = _tbl(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        self._run_available(spark, t, ckpt, out)
        ids = sorted(r["id"] for r in spark.read.parquet(out).collect())
        assert ids == list(range(100))
        # new commit, SAME checkpoint: only the delta arrives
        delta_append(
            spark,
            spark.range(100, 120)
            .withColumn("lang", F.lit("fr"))
            .withColumn("v", F.col("id") * 2),
            t,
        )
        self._run_available(spark, t, ckpt, out)
        ids = sorted(r["id"] for r in spark.read.parquet(out).collect())
        assert ids == list(range(120))
        # no new commits: re-running adds nothing (exactly-once)
        self._run_available(spark, t, ckpt, out)
        assert spark.read.parquet(out).count() == 120

    def test_starting_version_skips_history(self, registered, tmp_path):
        spark = registered
        t = _tbl(spark, tmp_path)  # versions 0 (even ids), 1 (odd ids)
        ckpt = str(tmp_path / "ckpt2")
        out = str(tmp_path / "out2")
        self._run_available(spark, t, ckpt, out, starting=1)
        ids = sorted(r["id"] for r in spark.read.parquet(out).collect())
        assert ids == list(range(1, 100, 2))

    def test_optimize_commit_skipped(self, registered, tmp_path):
        spark = registered
        t = _tbl(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt3")
        out = str(tmp_path / "out3")
        self._run_available(spark, t, ckpt, out)
        assert delta_optimize(spark, t, target_file_bytes=1 << 30) is not None
        # dataChange=false commits contribute no rows
        self._run_available(spark, t, ckpt, out)
        assert spark.read.parquet(out).count() == 100

    def test_data_removal_raises(self, registered, tmp_path):
        spark = registered
        t = _tbl(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt4")
        out = str(tmp_path / "out4")
        self._run_available(spark, t, ckpt, out)
        delta_delete_where(spark, t, "id % 10 = 0")
        with pytest.raises(Exception, match="append-only"):
            self._run_available(spark, t, ckpt, out)


class TestPushdown:
    def _table(self, spark, tmp_path, n=10_000, files=8):
        t = str(tmp_path / "tbl")
        df = spark.range(n).withColumn("v", F.col("id") * 2)
        delta_append(
            spark,
            df.repartitionByRange(files, "id").sortWithinPartitions("id"),
            t,
        )
        return t

    def _load(self, spark, t, pushdown=True):
        r = spark.read.format("delta_lite").option("path", t)
        if pushdown:
            r = r.option("pushdown", "true")
        return r.load()

    def test_filter_prunes_planned_files(self, registered, tmp_path):
        spark = registered
        t = self._table(spark, tmp_path)
        # opt-in contract: ONE load() per query
        all_parts = self._load(spark, t).rdd.getNumPartitions()
        pruned = self._load(spark, t).filter("id < 1000")
        assert pruned.rdd.getNumPartitions() < all_parts
        # exactness: Spark still applies the row filter on survivors
        assert pruned.count() == 1000
        assert sorted(
            r["id"] for r in self._load(spark, t).filter("id < 1000").collect()
        ) == list(range(1000))

    def test_in_filter_prunes(self, registered, tmp_path):
        spark = registered
        t = self._table(spark, tmp_path)
        all_parts = self._load(spark, t).rdd.getNumPartitions()
        got = self._load(spark, t).filter(F.col("id").isin(5, 7, 11))
        assert got.rdd.getNumPartitions() < all_parts
        assert sorted(r["id"] for r in got.collect()) == [5, 7, 11]

    def test_unsupported_filters_keep_all_files(self, registered, tmp_path):
        spark = registered
        t = self._table(spark, tmp_path, n=1_000, files=4)
        # disjunction is not pushable: full plan, correct rows
        got = self._load(spark, t).filter("id < 10 OR v = 100")
        assert got.count() == 11

    def test_default_reader_is_stateless(self, registered, tmp_path):
        # the reason pushdown is opt-in: without it, one loaded frame
        # can serve a filtered AND an unfiltered query — Spark caches
        # the planned scan per relation, and a stateful pushdown scan
        # would leak the filtered file set into the later full read
        spark = registered
        t = self._table(spark, tmp_path)
        base = self._load(spark, t, pushdown=False)
        assert base.filter("id < 1000").count() == 1000
        assert base.count() == 10_000  # NOT pruned by the earlier query


class TestPushdownPlanReuse:
    def _table(self, spark, tmp_path, n=10_000, files=8):
        t = str(tmp_path / "tbl")
        df = spark.range(n).withColumn("v", F.col("id") * 2)
        delta_append(
            spark,
            df.repartitionByRange(files, "id").sortWithinPartitions("id"),
            t,
        )
        return t

    def test_two_filters_same_load_prune_independently(
        self, registered, tmp_path
    ):
        # every plan WITH a translatable filter re-runs the pushdown
        # runner (fresh reader, fresh file set) — two different filters
        # on the SAME load() relation must each prune for themselves
        # and return exact rows
        spark = registered
        t = self._table(spark, tmp_path)
        base = (
            spark.read.format("delta_lite")
            .option("path", t)
            .option("pushdown", "true")
            .load()
        )
        all_parts = (
            spark.read.format("delta_lite").option("path", t).load()
            .rdd.getNumPartitions()
        )
        lo = base.filter("id < 1000")
        hi = base.filter("id >= 9000")
        assert lo.rdd.getNumPartitions() < all_parts
        assert hi.rdd.getNumPartitions() < all_parts
        assert lo.count() == 1000
        assert hi.count() == 1000
        assert sorted(r["id"] for r in hi.collect()) == list(
            range(9000, 10000)
        )
        # and again in the other order — no cross-contamination
        assert lo.count() == 1000

    def test_stale_slot_canary_filtered_then_unfiltered(
        self, registered, tmp_path
    ):
        # CANARY pinning the verified Spark 4.1 wrapper hazard (the
        # reason pushdown is opt-in): PythonDataSourceV2 keeps ONE
        # readInfo slot per load() relation; an unfiltered plan after
        # a filtered one skips the Python runner
        # (pushdownFiltersInPython gates on isAnyFilterSupported) and
        # reuses the poisoned slot. If this test ever FAILS on a newer
        # Spark, the slot got fixed upstream — flip the delta_lite /
        # iceberg_lite pushdown default to ON and delete this canary.
        spark = registered
        t = self._table(spark, tmp_path)
        base = (
            spark.read.format("delta_lite")
            .option("path", t)
            .option("pushdown", "true")
            .load()
        )
        assert base.filter("id < 1000").count() == 1000
        stale = base.count()
        assert stale < 10_000, (
            "unfiltered count on a reused relation no longer serves the "
            "stale pruned file set — Spark fixed the readInfo slot; "
            "make pushdown default-on"
        )


class TestWrite:
    def test_write_creates_and_appends(self, registered, tmp_path):
        spark = registered
        t = str(tmp_path / "wtbl")
        df = spark.range(100).withColumn("v", F.col("id") * 2)
        df.write.format("delta_lite").mode("append").option("path", t).save()
        assert read_delta(spark, t).count() == 100
        spark.range(100, 120).withColumn("v", F.col("id") * 2).write.format(
            "delta_lite"
        ).mode("append").option("path", t).save()
        got = read_delta(spark, t)
        assert sorted(r["id"] for r in got.collect()) == list(range(120))
        # API-written tables carry stats: data skipping must prune
        from dataset_grouper_spark.sources.delta import delta_skip_plan

        kept, total = delta_skip_plan(spark, t, [("id", "<=", 5)])
        assert len(kept) < total

    def test_write_overwrite_replaces(self, registered, tmp_path):
        spark = registered
        t = str(tmp_path / "wtbl2")
        spark.range(50).withColumn("v", F.lit("a")).write.format(
            "delta_lite"
        ).mode("append").option("path", t).save()
        spark.range(5).withColumn("v", F.lit("b")).write.format(
            "delta_lite"
        ).mode("overwrite").option("path", t).save()
        got = read_delta(spark, t).collect()
        assert len(got) == 5 and all(r["v"] == "b" for r in got)
        # old version still time-travels
        assert read_delta(spark, t, version=0).count() == 50

    def test_write_roundtrips_through_own_reader(self, registered, tmp_path):
        spark = registered
        t = str(tmp_path / "wtbl3")
        df = spark.range(30).withColumn("v", F.col("id") % 5)
        df.write.format("delta_lite").mode("append").option("path", t).save()
        got = spark.read.format("delta_lite").option("path", t).load()
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in df.collect()
        }

    def test_write_schema_mismatch_raises(self, registered, tmp_path):
        spark = registered
        t = str(tmp_path / "wtbl4")
        spark.range(5).withColumn("v", F.lit(1)).write.format(
            "delta_lite"
        ).mode("append").option("path", t).save()
        bad = spark.range(5).withColumn("other", F.lit(1))
        with pytest.raises(Exception, match="schema mismatch"):
            bad.write.format("delta_lite").mode("append").option(
                "path", t
            ).save()
        # failed write left no stray files behind the live set
        from dataset_grouper_spark.sources.delta import _replay

        adds, _m = _replay(spark, t, 0)
        on_disk = {
            n for n in os.listdir(t)
            if n.endswith(".parquet")
        }
        assert on_disk == set(adds)

    def test_write_into_existing_partitioned_table(
        self, registered, tmp_path
    ):
        # an existing table's partition columns are honored
        # automatically — no option needed
        spark = registered
        t = str(tmp_path / "wtbl5")
        df = spark.range(10).withColumn(
            "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        )
        delta_append(spark, df, t, partition_by=["lang"])
        more = spark.range(10, 20).withColumn("lang", F.lit("fr"))
        more.write.format("delta_lite").mode("append").option(
            "path", t
        ).save()
        got = read_delta(spark, t)
        assert sorted(r["id"] for r in got.collect()) == list(range(20))
        assert got.filter("lang = 'fr'").count() == 10
        # partition literals landed in the log, not in the files
        from dataset_grouper_spark.sources.delta import (
            _latest_version,
            _replay,
        )

        adds, meta = _replay(spark, t, _latest_version(t))
        assert meta["partitionColumns"] == ["lang"]
        assert all(
            a.get("partitionValues", {}).get("lang") in ("en", "de", "fr")
            for a in adds.values()
        )

    def test_write_creates_partitioned_table_via_option(
        self, registered, tmp_path
    ):
        spark = registered
        t = str(tmp_path / "wtbl6")
        df = spark.range(100).withColumn(
            "lang", F.when(F.col("id") % 3 == 0, "en").otherwise("de")
        ).withColumn("v", F.col("id") * 2)
        (
            df.repartition(2, "lang")
            .write.format("delta_lite")
            .mode("append")
            .option("path", t)
            .option("partitionBy", "lang")
            .save()
        )
        got = read_delta(spark, t)
        assert got.count() == 100
        assert {tuple(sorted(r.asDict().items())) for r in got.collect()} == {
            tuple(sorted(r.asDict().items())) for r in df.collect()
        }
        # partition pruning works on the API-written table
        from dataset_grouper_spark.sources.delta import delta_skip_plan

        kept, total = delta_skip_plan(spark, t, [("lang", "=", "en")])
        assert len(kept) < total
        # and the format reader restores partition literals
        rt = (
            spark.read.format("delta_lite").option("path", t).load()
        )
        assert rt.filter("lang = 'en'").count() == 34

    def test_write_partition_option_mismatch_raises(
        self, registered, tmp_path
    ):
        spark = registered
        t = str(tmp_path / "wtbl7")
        df = spark.range(10).withColumn("lang", F.lit("en"))
        delta_append(spark, df, t, partition_by=["lang"])
        with pytest.raises(Exception, match="partition"):
            df.write.format("delta_lite").mode("append").option(
                "path", t
            ).option("partitionBy", "id").save()

    def test_write_null_partition_value(self, registered, tmp_path):
        spark = registered
        t = str(tmp_path / "wtbl8")
        df = spark.createDataFrame(
            [(1, "en"), (2, None), (3, "de")], "id long, lang string"
        )
        df.write.format("delta_lite").mode("append").option(
            "path", t
        ).option("partitionBy", "lang").save()
        got = read_delta(spark, t)
        assert got.filter("lang IS NULL").count() == 1
        assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]


class TestStreamWrite:
    def _drain(self, spark, src_dir, t, ckpt, app=None):
        batch = spark.read.parquet(src_dir)
        reader = spark.readStream.schema(batch.schema).parquet(src_dir)
        w = (
            reader.writeStream.format("delta_lite")
            .option("path", t)
            .option("checkpointLocation", ckpt)
        )
        if app:
            w = w.option("txnAppId", app)
        q = w.trigger(availableNow=True).start()
        q.awaitTermination(120)

    def test_stream_write_exactly_once(self, registered, tmp_path):
        spark = registered
        src = str(tmp_path / "src")
        t, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
        spark.range(50).withColumn("v", F.col("id") * 2).write.parquet(src)
        self._drain(spark, src, t, ckpt)
        assert read_delta(spark, t).count() == 50
        # drain again with the SAME checkpoint: nothing new
        self._drain(spark, src, t, ckpt)
        assert read_delta(spark, t).count() == 50
        # new source file, same checkpoint: only the delta arrives
        spark.range(50, 60).withColumn("v", F.col("id") * 2).write.mode(
            "append"
        ).parquet(src)
        self._drain(spark, src, t, ckpt)
        assert sorted(
            r["id"] for r in read_delta(spark, t).collect()
        ) == list(range(60))

    def test_stream_write_replayed_batch_is_noop(self, registered, tmp_path):
        spark = registered
        src = str(tmp_path / "src")
        t = str(tmp_path / "tbl")
        spark.range(10).withColumn("v", F.lit(1)).write.parquet(src)
        # two different checkpoints, same appId: the second stream
        # replays batchId 0, which the txn ledger must reject
        self._drain(spark, src, t, str(tmp_path / "c1"), app="app1")
        assert read_delta(spark, t).count() == 10
        self._drain(spark, src, t, str(tmp_path / "c2"), app="app1")
        assert read_delta(spark, t).count() == 10
        # a DIFFERENT appId is a genuinely new writer: rows land again
        self._drain(spark, src, t, str(tmp_path / "c3"), app="app2")
        assert read_delta(spark, t).count() == 20
        # no orphan parquet files beyond the live set
        from dataset_grouper_spark.sources.delta import _replay

        adds, _m = _replay(spark, t, 1)
        on_disk = {n for n in os.listdir(t) if n.endswith(".parquet")}
        assert on_disk == set(adds)

    def test_stream_write_partitioned_exactly_once(
        self, registered, tmp_path
    ):
        # partitioned sink: existing table partitioning honored by the
        # stream writer; replayed epochs still no-op
        spark = registered
        src = str(tmp_path / "psrc")
        t = str(tmp_path / "ptbl")
        df = spark.range(40).withColumn(
            "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        )
        delta_append(spark, df.limit(0), t, partition_by=["lang"])
        df.write.parquet(src)
        self._drain(spark, src, t, str(tmp_path / "pc1"), app="papp")
        got = read_delta(spark, t)
        assert got.count() == 40
        assert got.filter("lang = 'en'").count() == 20
        # every committed add carries a partition literal
        from dataset_grouper_spark.sources.delta import (
            _latest_version,
            _replay,
        )

        adds, meta = _replay(spark, t, _latest_version(t))
        assert meta["partitionColumns"] == ["lang"]
        assert all(
            a.get("partitionValues", {}).get("lang") in ("en", "de")
            for a in adds.values()
        )
        # replay with a fresh checkpoint, same appId: no-op + cleanup
        self._drain(spark, src, t, str(tmp_path / "pc2"), app="papp")
        assert read_delta(spark, t).count() == 40
        on_disk = {n for n in os.listdir(t) if n.endswith(".parquet")}
        assert on_disk == set(adds)

    def test_stream_write_creates_partitioned_table(
        self, registered, tmp_path
    ):
        spark = registered
        src = str(tmp_path / "qsrc")
        t = str(tmp_path / "qtbl")
        spark.range(30).withColumn(
            "lang", F.when(F.col("id") % 3 == 0, "en").otherwise("fr")
        ).write.parquet(src)
        batch = spark.read.parquet(src)
        q = (
            spark.readStream.schema(batch.schema).parquet(src)
            .writeStream.format("delta_lite")
            .option("path", t)
            .option("checkpointLocation", str(tmp_path / "qck"))
            .option("partitionBy", "lang")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = read_delta(spark, t)
        assert got.count() == 30
        assert got.filter("lang = 'en'").count() == 10
        from dataset_grouper_spark.sources.delta import delta_skip_plan

        kept, total = delta_skip_plan(spark, t, [("lang", "=", "en")])
        assert len(kept) < total


class TestNullIntPartitionValues:
    def test_null_int_partition_batch_preserves_intness(
        self, registered, tmp_path
    ):
        """ADVICE r7: a NULL in an int partition column must not coerce
        the batch's other keys to float ('2.0') — the reader's int cast
        would raise and non-null rows would corrupt."""
        spark = registered
        t = str(tmp_path / "wtbl_nullint")
        df = spark.createDataFrame(
            [(1, 2), (2, None), (3, 2), (4, 7)], "id long, bucket long"
        )
        df.coalesce(1).write.format("delta_lite").mode("append").option(
            "path", t
        ).option("partitionBy", "bucket").save()
        got = read_delta(spark, t)
        assert sorted(
            (r["id"], r["bucket"]) for r in got.collect()
        ) == [(1, 2), (2, None), (3, 2), (4, 7)]
        # the log literal is an exact int string, not a float repr
        import json as _json
        import os as _os

        log = _os.path.join(t, "_delta_log")
        pvs = set()
        for name in sorted(_os.listdir(log)):
            if not name.endswith(".json"):
                continue
            with open(_os.path.join(log, name)) as f:
                for line in f:
                    a = _json.loads(line)
                    if "add" in a:
                        pvs.add(a["add"]["partitionValues"].get("bucket"))
        assert pvs == {"2", "7", None}


class TestColumnMappedWrite:
    """r13 (VERDICT r12 task 3): delta_lite writes on COLUMN-MAPPED
    tables — files staged under physical col-<n> names, physical
    partitionValues keys and stats, both write halves."""

    def _cm_table(self, spark, tmp_path, partitioned=False):
        """Empty column-mapped table (hand-built v0 metaData, like
        TestColumnMapping in test_delta_read.py) seeded with 10 rows
        via delta_append (which writes physical on mapped tables)."""
        import json as _json

        from dataset_grouper_spark.sources.delta import delta_append

        t = str(tmp_path / "cm")
        log = os.path.join(t, "_delta_log")
        os.makedirs(log)
        schema = {
            "type": "struct",
            "fields": [
                {
                    "name": n, "type": ty, "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": i + 1,
                        "delta.columnMapping.physicalName": f"col-{i+1}",
                    },
                }
                for i, (n, ty) in enumerate(
                    (("id", "long"), ("lang", "string"), ("v", "long"))
                )
            ],
        }
        actions = [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": "0" * 32,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _json.dumps(schema),
                    "partitionColumns": ["lang"] if partitioned else [],
                    "configuration": {
                        "delta.columnMapping.mode": "name",
                        "delta.columnMapping.maxColumnId": "3",
                    },
                }
            },
        ]
        with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
            for a in actions:
                f.write(_json.dumps(a) + "\n")
        df = (
            spark.range(10)
            .withColumn(
                "lang",
                F.when(F.col("id") % 2 == 0, "en").otherwise("de"),
            )
            .withColumn("v", F.col("id") * 2)
        )
        delta_append(
            spark, df, t,
            partition_by=["lang"] if partitioned else None,
        )
        return t

    def test_batch_write_cm(self, registered, tmp_path):
        spark = registered
        t = self._cm_table(spark, tmp_path)
        extra = spark.createDataFrame(
            [(100, "fr", -1)], "id long, lang string, v long"
        )
        extra.write.format("delta_lite").mode("append").option(
            "path", t
        ).save()
        got = read_delta(spark, t)
        assert got.count() == 11
        assert [tuple(r) for r in got.filter("id = 100").collect()] == [
            (100, "fr", -1)
        ]
        # physical names in the new file, not logical (a logical-named
        # file would read back all-NULL)
        assert spark.read.format("delta_lite").option("path", t).load(
        ).filter("id = 100").count() == 1

    def test_batch_write_cm_partitioned_physical_pv_keys(
        self, registered, tmp_path
    ):
        import json as _json

        spark = registered
        t = self._cm_table(spark, tmp_path, partitioned=True)
        extra = spark.createDataFrame(
            [(100, "fr", -1), (101, "fr", -2)],
            "id long, lang string, v long",
        )
        extra.write.format("delta_lite").mode("append").option(
            "path", t
        ).save()
        got = read_delta(spark, t)
        assert got.filter("lang = 'fr'").count() == 2
        # the new add's partitionValues are keyed by the PHYSICAL name
        log = os.path.join(t, "_delta_log")
        latest = sorted(
            n for n in os.listdir(log) if n.endswith(".json")
        )[-1]
        pv_keys = set()
        with open(os.path.join(log, latest)) as f:
            for line in f:
                a = _json.loads(line)
                if "add" in a:
                    pv_keys.update(a["add"]["partitionValues"])
        assert pv_keys and all(k.startswith("col-") for k in pv_keys)

    def test_stream_write_cm(self, registered, tmp_path):
        spark = registered
        t = self._cm_table(spark, tmp_path)
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(200, "it", 5), (201, "it", 6)],
            "id long, lang string, v long",
        ).write.parquet(src)
        batch = spark.read.parquet(src)
        q = (
            spark.readStream.schema(batch.schema)
            .parquet(src)
            .writeStream.format("delta_lite")
            .option("path", t)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = read_delta(spark, t)
        assert got.filter("lang = 'it'").count() == 2
        assert got.count() == 12
