"""Pruning guard: a single-group read must reach the scan as a
partition filter (directory layout) — the capability the reference
lacks entirely (it scans all shards to find a group; SURVEY §4)."""

from dataset_grouper_spark import keys, sinks
from dataset_grouper_spark.loader import PartitionedDataset
from dataset_grouper_spark.plans import plan_text


def test_group_read_is_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "pds")
    df = spark.createDataFrame(
        [(i, f"g{i % 5}") for i in range(100)], "id: long, k: string"
    )
    sinks.write_partitioned(df, keys.by_feature("k"), path, order_col="id")
    pds = PartitionedDataset(spark, path)
    g = pds.group("g2")
    txt = plan_text(g, "formatted")
    # the group predicate must appear as a PartitionFilter on the scan,
    # not a post-scan Filter over all groups
    assert "PartitionFilters" in txt
    scan_section = txt.split("PartitionFilters")[1][:200]
    assert "group_id" in scan_section
    assert g.count() == 20
