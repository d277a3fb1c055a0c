"""Example: the LLM-data-pipeline pass — exact dedup, near-dup
detection (MinHash-LSH candidates verified by exact Jaccard), text
quality + language ID.

Run: python examples/dedup_corpus.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark.functions import textanalysis
from dataset_grouper_spark.operators import dedup
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-dedup")
    docs = read_table(spark, sf_dir, "documents")

    survivors = dedup.exact_dedup(docs, "text", "doc_id")
    print("exact:", docs.count(), "->", survivors.count())

    near = dedup.minhash_lsh_dedup(
        docs, "text", "doc_id", n=3, num_perm=16, bands=4,
        verify_threshold=0.8,
    )
    print("near-dup pairs (verified >= 0.8 jaccard):")
    print(near.orderBy(F.desc("jaccard")).limit(5).toPandas())

    quality = docs.select(
        "doc_id",
        textanalysis.lang_id(F.col("text")).alias("pred_lang"),
        *[
            v.alias(k)
            for k, v in textanalysis.quality_features(F.col("text")).items()
        ],
    )
    print(quality.limit(5).toPandas())


if __name__ == "__main__":
    main()
