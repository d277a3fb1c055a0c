"""Write -> load -> group-stream roundtrip (integration_test.py:26-59
analogue): schema equality, group listing, seeded shuffle, pruning,
cohort batching, resume-by-skip."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark import keys, sinks
from dataset_grouper_spark.loader import PartitionedDataset


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pds"))
    df = spark.createDataFrame(
        [(i, i % 10, f"row {i}") for i in range(200)],
        "id: long, label: long, text: string",
    )
    sinks.write_partitioned(df, keys.by_feature("label"), path, order_col="id")
    return path


def test_roundtrip_schema_and_rows(spark, written):
    pds = PartitionedDataset(spark, written)
    df = pds.dataframe()
    assert df.count() == 200
    assert set(df.columns) == {"id", "label", "text", "group_id"}


def test_group_index_no_scan(spark, written):
    pds = PartitionedDataset(spark, written)
    idx = {r.group_id: r.num_examples for r in pds.group_index().collect()}
    assert len(idx) == 10
    assert all(v == 20 for v in idx.values())


def test_group_pruned_read(spark, written):
    pds = PartitionedDataset(spark, written)
    g = pds.group("3")
    assert g.count() == 20
    assert set(r.label for r in g.collect()) == {3}


def test_seeded_shuffle_deterministic(spark, written):
    pds = PartitionedDataset(spark, written)
    a = pds.list_groups(shuffle=True, seed=7)
    b = pds.list_groups(shuffle=True, seed=7)
    c = pds.list_groups(shuffle=True, seed=8)
    assert a == b
    assert sorted(a) == sorted(c)
    assert a != c  # overwhelmingly likely with 10 groups


def test_group_stream_cohorts_and_resume(spark, written):
    pds = PartitionedDataset(spark, written)
    cohorts = list(pds.group_stream(batch_groups=3))
    assert [len(c) for c in cohorts] == [3, 3, 3, 1]
    flat = [g for c in cohorts for g, _ in c]
    resumed = list(pds.group_stream(batch_groups=3, skip=6))
    assert [g for c in resumed for g, _ in c] == flat[6:]
    gid, pdf = cohorts[0][0]
    assert isinstance(pdf, pd.DataFrame)
    assert len(pdf) == 20


def test_for_each_group_distributed(spark, written):
    pds = PartitionedDataset(spark, written)
    out = pds.for_each_group(
        lambda pdf: pd.DataFrame({"n": [len(pdf)]}), schema="n long"
    )
    assert [r.n for r in out.collect()] == [20] * 10


def test_bucketed_layout_roundtrip(spark, tmp_path):
    path = str(tmp_path / "bucketed")
    df = spark.createDataFrame(
        [(i, f"dom{i % 50}.com") for i in range(500)], "id: long, domain: string"
    )
    sinks.write_partitioned(
        df, keys.by_feature("domain"), path, order_col="id",
        layout="bucketed", num_buckets=8,
    )
    pds = PartitionedDataset(spark, path)
    assert pds.layout() == ("bucketed", 8)
    assert len(pds.list_groups()) == 50
    g = pds.group("dom7.com")
    assert g.count() == 10
    # the bucket recomputed from the group id prunes to ONE directory
    from dataset_grouper_spark.plans import plan_text

    txt = plan_text(g, "formatted")
    assert "PartitionFilters" in txt
    assert "bucket_id" in txt.split("PartitionFilters")[1][:200]
    # group stream must not leak the bucket column
    _, pdf = next(iter(pds.group_stream(take=1)))[0]
    assert "bucket_id" not in pdf.columns


def test_bytecap_write(spark, tmp_path):
    path = str(tmp_path / "capped")
    df = spark.createDataFrame(
        [(i, "g", "x" * 100) for i in range(10)], "id: long, k: string, s: string"
    )
    # row bytes = 8 + 1 + 100 = 109; cap 500 keeps 4 rows (436 < 500 < 545)
    sinks.write_partitioned(
        df, keys.by_feature("k"), path, order_col="id", limit=500
    )
    pds = PartitionedDataset(spark, path)
    assert pds.dataframe().count() == 4


def test_empty_dataset_write_and_load(spark, tmp_path):
    # everything-filtered-out pipelines still produce a loadable,
    # zero-group dataset (an empty partitionBy write leaves no schema
    # footer without the sink's empty-file fallback)
    from pyspark.sql import functions as F

    from dataset_grouper_spark import sinks
    from dataset_grouper_spark.loader import PartitionedDataset

    df = spark.createDataFrame([], "id: long, text: string, user: string")
    for layout in ("partitioned", "bucketed"):
        path = str(tmp_path / f"empty_{layout}")
        sinks.write_partitioned(df, F.col("user"), path, layout=layout)
        ds = PartitionedDataset(spark, path)
        assert ds.list_groups() == []
        assert list(ds.iter_groups_bulk()) == []
        assert ds.dataframe().count() == 0


def test_null_group_key_roundtrip(spark, tmp_path):
    # a keyer over a NULL feature produces a NULL group: it must write,
    # list (sorted last), load by group, and bulk-iterate — not crash
    from pyspark.sql import functions as F

    from dataset_grouper_spark import sinks
    from dataset_grouper_spark.loader import PartitionedDataset

    df = spark.createDataFrame(
        [(1, "a", "u1"), (2, "b", None), (3, "c", "u1")],
        "id: long, text: string, user: string",
    )
    for layout in ("partitioned", "bucketed"):
        path = str(tmp_path / f"nullkey_{layout}")
        sinks.write_partitioned(df, F.col("user"), path, layout=layout)
        ds = PartitionedDataset(spark, path)
        assert ds.list_groups() == ["u1", None]
        assert ds.group(None).count() == 1
        assert ds.group("u1").count() == 2
        got = {gid: len(pdf) for gid, pdf in ds.iter_groups_bulk()}
        assert got == {"u1": 2, None: 1}
        # the NULL group streams under prefetch too (the sentinel that
        # drives the pipeline must not collide with a None group id)
        streamed = {
            gid: len(pdf)
            for c in ds.group_stream(prefetch=2)
            for gid, pdf in c
        }
        assert streamed == {"u1": 2, None: 1}


def test_group_stream_prefetch_identical_to_serial(spark, written):
    # prefetch pipelines the pruned reads but must not change the yield
    # order, cohort boundaries, or frame content — for any prefetch
    # depth, including one exceeding the group count
    pds = PartitionedDataset(spark, written)

    def consume(**kw):
        return [
            (gid, len(pdf), sorted(pdf.columns))
            for c in pds.group_stream(
                shuffle=True, seed=7, batch_groups=3, **kw
            )
            for gid, pdf in c
        ]

    serial = consume()
    assert serial == consume(prefetch=2)
    assert serial == consume(prefetch=64)
    # cohort shapes preserved under prefetch
    shapes = [
        len(c)
        for c in pds.group_stream(shuffle=True, seed=7, batch_groups=3, prefetch=3)
    ]
    assert shapes == [3, 3, 3, 1]
    # skip/take compose with prefetch
    assert consume(prefetch=2)[6:] == [
        (gid, len(pdf), sorted(pdf.columns))
        for c in pds.group_stream(
            shuffle=True, seed=7, batch_groups=3, skip=6, prefetch=2
        )
        for gid, pdf in c
    ]


def test_compact_partitioned_merges_append_fragments(spark, tmp_path):
    # three appends fragment each group dir into >=3 files; compaction
    # collapses to ceil(rows/target) per group, preserves every row and
    # the index, and splits a big group into multiple bounded files
    path = str(tmp_path / "frag")
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, f"g{i % 3}", f"t{i}") for i in range(lo, hi)],
        "id: long, k: string, text: string",
    )
    sinks.write_partitioned(mk(0, 30), keys.by_feature("k"), path, order_col="id")
    sinks.append_partitioned(mk(30, 60), keys.by_feature("k"), path, order_col="id")
    sinks.append_partitioned(mk(60, 90), keys.by_feature("k"), path, order_col="id")
    pds = PartitionedDataset(spark, path)
    before = {r.group_id: r.num_examples for r in pds.group_index().collect()}
    assert before == {"g0": 30, "g1": 30, "g2": 30}
    rows_before = {
        (r.id, r.group_id) for r in pds.dataframe().collect()
    }
    stats = sinks.compact_partitioned(spark, path, target_rows_per_file=20, order_col="id")
    assert stats["files_before"] >= 9  # 3 groups x 3 writes
    # ceil(30/20) = 2 files per group
    assert stats["files_after"] == 6
    assert stats["groups"] == 3 and stats["rows"] == 90
    pds2 = PartitionedDataset(spark, path)
    assert {
        r.group_id: r.num_examples for r in pds2.group_index().collect()
    } == before
    assert {
        (r.id, r.group_id) for r in pds2.dataframe().collect()
    } == rows_before
    # pruned single-group read still works post-compaction
    assert pds2.group("g1").count() == 30
    # bucketed layout refuses (already file-bounded)
    bpath = str(tmp_path / "bucketed")
    sinks.write_partitioned(
        mk(0, 30), keys.by_feature("k"), bpath, layout="bucketed", num_buckets=4
    )
    with pytest.raises(ValueError, match="bucketed"):
        sinks.compact_partitioned(spark, bpath)


def test_compact_files_after_matches_walk(spark, tmp_path):
    """files_after is derived from the index contract
    (sum of ceil(rows/target) per group — r14, no post-rewrite driver
    walk); pin it against a physical filesystem walk on UNEVEN group
    sizes so chunk collisions inside write tasks are exercised."""
    import os

    path = str(tmp_path / "uneven")
    # group sizes 1, 7, 20, 21, 40 -> ceil(n/7) = 1, 1, 3, 3, 6
    rows, rid = [], 0
    for g, n in (("a", 1), ("b", 7), ("c", 20), ("d", 21), ("e", 40)):
        for _ in range(n):
            rows.append((rid, g, f"t{rid}"))
            rid += 1
    df = spark.createDataFrame(rows, "id: long, k: string, text: string")
    sinks.write_partitioned(df, keys.by_feature("k"), path, order_col="id")
    stats = sinks.compact_partitioned(
        spark, path, target_rows_per_file=7, order_col="id"
    )
    walked = sum(
        1
        for _, _, fs in os.walk(f"{path}/data")
        for f in fs
        if f.endswith(".parquet")
    )
    assert stats["files_after"] == walked == 1 + 1 + 3 + 3 + 6
    assert PartitionedDataset(spark, path).dataframe().count() == 89
