"""Giant-group stress: one >=2 GB group through the cap_prefix window.

The reference truncates oversized groups at a protobuf limit
(beam_transforms.py:26-27) but has no skew story (SURVEY §4); our
packing path keeps rows flat through a running-sum window so Tungsten's
external sorter spills instead of materializing a 2 GB accumulator.
This test pins that claim (VERDICT r1 #7): a single group holding
~2.2 GB of payload must sort, cumulate, and cap-filter to the exact
prefix row count with no OOM on default test memory.

Run explicitly: python -m pytest tests/ -m slow -q
Measured curve lives in PERF.md ("giant-group window-sort cost").
"""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.operators.packing import cap_prefix

PAYLOAD_BYTES = 1000
ROWS = 2_200_000  # ~2.2 GB of payload in ONE group
LIMIT = 1_000_000_000  # cap the prefix at ~1 GB


@pytest.mark.slow
def test_two_gb_single_group_cap_prefix_completes(spark):
    # payload must depend on the row — a constant literal would be
    # const-folded by Catalyst and never actually cross the exchange
    df = (
        spark.range(ROWS)
        .withColumn(keys.GROUP_COL, F.lit("giant"))
        .withColumn(
            "payload",
            F.concat(
                F.repeat(F.lit("x"), PAYLOAD_BYTES - 8),
                F.format_string("%08d", F.col("id")),
            ),
        )
    )
    capped = cap_prefix(
        df, "id", F.length("payload") + F.lit(8), limit=LIMIT
    )
    # running sum at row k (1-based) is k * 1008; keep while < LIMIT
    expected = (LIMIT - 1) // (PAYLOAD_BYTES + 8)
    assert capped.count() == expected
    # boundary exactness: the last kept row is the prefix edge
    top = capped.agg(F.max("id").alias("m")).collect()[0].m
    assert top == expected - 1


@pytest.mark.slow
def test_giant_group_monster_row_skipped_not_veto(spark):
    # one row bigger than the whole cap at ord 0 in a multi-million-row
    # group: the pre-filter must exclude it BEFORE the window sort, so
    # the admissible prefix after it survives. Under pure prefix
    # semantics (pre-r5) the monster's running sum vetoed every later
    # row — this asserted 0 rows then, and the exact prefix now.
    monster_sz = 10_000
    limit = 1_000
    row_sz = 100
    n = 2_200_000
    df = (
        spark.range(n)
        .withColumn(keys.GROUP_COL, F.lit("giant"))
        .withColumn(
            "sz",
            F.when(F.col("id") == 0, F.lit(monster_sz)).otherwise(
                F.lit(row_sz)
            ),
        )
    )
    capped = cap_prefix(df, "id", F.col("sz"), limit=limit)
    # admissible rows are ids 1..n at 100 bytes; running sum k*100 < 1000
    kept = capped.select("id").collect()
    assert sorted(r.id for r in kept) == list(range(1, 10))


@pytest.mark.slow
def test_bucketed_upsert_at_1m_rows_touches_one_bucket(spark, tmp_path):
    """1M rows / 10k groups / 32 buckets: a single-group upsert
    rewrites exactly ONE bucket directory (~1/32 of the data), leaves
    the other 31 byte-identical, and the merged index still sums to
    the full corpus."""
    import glob
    import os
    import zlib

    from pyspark.sql import functions as F

    from dataset_grouper_spark import keys as gkeys
    from dataset_grouper_spark import sinks

    path = str(tmp_path / "pds")
    n, groups, buckets = 1_000_000, 10_000, 32
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % groups).cast("string")).alias(
            "src"
        ),
        F.md5(F.col("id").cast("string")).alias("text"),
    )
    sinks.write_partitioned(
        df,
        gkeys.by_feature("src"),
        path,
        order_col="doc_id",
        layout="bucketed",
        num_buckets=buckets,
    )
    target = "g77"
    tb = zlib.crc32(target.encode()) % buckets
    watch = [
        d
        for d in glob.glob(path + f"/data/{sinks.BUCKET_COL}=*")
        if not d.endswith(f"={tb}")
    ]
    before = {
        d: sorted(os.listdir(d)) for d in watch
    }
    new = spark.createDataFrame(
        [(77, target, "REPLACED"), (n + 5, target, "added")],
        "doc_id long, src string, text string",
    )
    stats = sinks.upsert_bucketed(
        spark, new, gkeys.by_feature("src"), path, "doc_id", "doc_id"
    )
    assert stats == {"upserted_rows": 2, "buckets_rewritten": 1}
    assert {d: sorted(os.listdir(d)) for d in watch} == before
    idx = spark.read.parquet(path + "/" + sinks.GROUP_INDEX_DIR)
    total = idx.agg(F.sum("num_examples")).collect()[0][0]
    assert total == n + 1
    back = spark.read.parquet(path + "/data")
    assert back.filter("doc_id = 77").collect()[0]["text"] == "REPLACED"
