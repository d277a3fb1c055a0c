"""Example: partition a document corpus by source domain and stream it
back group-by-group — the reference's README workflow
(README.md:54-78), Spark-native.

Run: python examples/group_documents.py [sf_dir] [out_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark import keys, sinks
from dataset_grouper_spark.loader import PartitionedDataset
from dataset_grouper_spark.operators import group_counts as gc
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("grouped")
    spark = get_spark("example-group-documents")

    docs = read_table(spark, sf_dir, "documents")

    # 1. group statistics (== tfds_group_counts)
    counts = gc.compute_group_counts(docs, keys.by_feature("source"))
    gc.write_group_counts_csv(counts, f"{out}/counts")
    print(counts.orderBy("group_id").limit(5).toPandas())

    # 2. partition-and-write (== tfds_to_tfrecords), byte-capped
    sinks.write_partitioned(
        docs, keys.by_feature("source"), f"{out}/by_source",
        order_col="doc_id", limit=2_000_000_000,
    )

    # 3. stream groups back in seeded order, two groups per cohort
    pds = PartitionedDataset(spark, f"{out}/by_source")
    for cohort in pds.group_stream(shuffle=True, seed=42, batch_groups=2, take=4):
        for gid, pdf in cohort:
            print(f"group {gid}: {len(pdf)} docs")


if __name__ == "__main__":
    main()
