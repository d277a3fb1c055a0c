"""Capstone example: raw corpus -> training-ready export, end to end.

  quality filter -> PII redaction -> exact + near dedup -> group by
  source -> partitioned layout -> token-budgeted training shards ->
  group-stream consumption

Everything here is the engine's own operators at sf0.001 scale; the
same code is the 100 TB pipeline (each stage is a bounded-shuffle
DataFrame plan — see PERF.md for the shapes).

Run: python examples/training_export.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark import keys, sinks
from dataset_grouper_spark.functions import quality, redact
from dataset_grouper_spark.loader import PartitionedDataset
from dataset_grouper_spark.operators import dedup, prefix
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import read_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("example-training-export")
    docs = read_table(spark, SF, "documents")
    n0 = docs.count()

    # 1. quality gate (Gopher-style rules) + PII scrub
    # thresholds loosened for the tiny synthetic texts (the defaults
    # target real web documents)
    flags = quality.gopher_quality(
        docs, "text", "doc_id", min_words=3, min_stop_hits=0
    )
    kept = (
        docs.join(
            flags.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
        )
        .select(
            "doc_id", "source", redact.redact_pii(F.col("text")).alias("text")
        )
    )
    n1 = kept.count()

    # 2. exact dedup, then MinHash -> LSH -> connected-component
    #    clusters; keep one survivor per near-dup cluster
    exact = dedup.exact_dedup(kept, "text", "doc_id").drop("dup_count")
    clusters = dedup.cluster_near_dups(exact, "text", "doc_id", seed=7)
    survivors = exact.join(
        clusters.filter(F.col("cluster_id") == F.col("doc_id")).select(
            "doc_id"
        ),
        "doc_id",
        "left_semi",
    )
    n2 = survivors.count()

    # 3. grouped layout + token-budgeted shards
    store = tempfile.mkdtemp(prefix="corpus_")
    sinks.write_partitioned(
        survivors, keys.by_feature("source"), store, order_col="doc_id"
    )
    shards = tempfile.mkdtemp(prefix="shards_")
    prefix.write_token_shards(
        survivors.select("doc_id", "text"),
        shards,
        "size(split(text, ' ', -1))",
        "doc_id",
        tokens_per_shard=4000,
        num_partitions=8,
    )

    # 4. consume: seeded group stream (the reference's training loop)
    pds = PartitionedDataset(spark, store)
    groups = pds.list_groups(shuffle=True, seed=42)
    print(f"docs: raw={n0} quality+redacted={n1} deduped={n2}")
    print(f"groups: {groups}")
    for cohort in pds.group_stream(shuffle=True, seed=42, take=3):
        for gid, pdf in cohort:
            print(f"  group {gid}: {len(pdf)} docs")
    back = spark.read.parquet(shards)
    back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(F.split("text", " ", -1))).alias("tokens"),
    ).orderBy("shard").show()

    # 5. private release of the corpus composition (the parfait
    #    story): suppress tiny groups, then geometric-noise the counts
    from dataset_grouper_spark.functions import dp

    public = dp.thresholded_group_counts(survivors, "source", 5)
    released = dp.dp_group_counts_geometric(
        survivors.join(public.select("group_id"),
                       survivors["source"] == F.col("group_id"),
                       "left_semi"),
        "source", epsilon=1.0, seed=None,  # fresh randomness
    )
    print("--- DP-released per-source counts (eps=1, k>=5) ---")
    released.orderBy("group_id").show(24, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
