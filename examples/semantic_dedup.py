"""Example: corpus-scale SemDeDup — embedding near-duplicate
clustering with the cell-blocked cosine family.

The exact all-pairs join is O(n^2) by construction; the corpus-scale
path coarse-quantizes vectors into auto-sized cells (cells scale WITH
the corpus) and pairs only within cells. Past ~2e4 cells the
TWO-LEVEL quantizer engages automatically: only ceil(sqrt(C)) coarse
centroids are ever broadcast, fine centroids resolve their coarse
home distributedly, and vectors meet only their probed coarse cells'
fine centroids in a salted cogroup — no broadcast or per-task working
set grows with the corpus. This demo forces the two-level tier with a
tiny threshold so it runs visibly at toy scale.

Run: python examples/semantic_dedup.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark import cache
from dataset_grouper_spark.operators import similarity
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-semantic-dedup")
    emb = read_table(spark, sf_dir, "embeddings")

    # corpus-scale default: auto-sized cells, probe-2 boundary rider.
    # At real scale leave two_level_threshold at its default (20_000)
    # — the tier switches itself when the derived cell count crosses
    # it; here it is forced low so the two-level path demonstrably
    # runs.
    clusters = similarity.embedding_neardup_clusters(
        emb,
        "embedding",
        "vec_id",
        threshold=0.4,
        num_cells="auto",
        probe=2,
        target_cell_rows=8,
        two_level_threshold=4,
        coarse_probe=2,
    )
    n = emb.count()
    survivors = clusters.filter(F.col("cluster_id") == F.col("vec_id"))
    print(f"vectors: {n}, semantic survivors: {survivors.count()}")
    dups = (
        clusters.groupBy("cluster_id")
        .count()
        .filter(F.col("count") > 1)
        .orderBy(F.desc("count"))
    )
    print("largest duplicate clusters:")
    print(dups.limit(5).toPandas())
    cache.release_intermediates()


if __name__ == "__main__":
    main()
