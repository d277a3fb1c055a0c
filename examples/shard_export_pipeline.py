"""Example: training-data export end to end with the r10 tier —

  ingest a corpus
  -> fixed-memory Bloom screen against the standing corpus (only
     genuinely-new docs survive; misses never shuffle)
  -> export the survivors as WebDataset tar shards (deterministic
     bytes, one task per shard)
  -> read the shards back one streamed task per shard and verify

Run: python examples/shard_export_pipeline.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark.functions import bloom
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import webdataset as wds


def main() -> None:
    spark = get_spark("example-shard-export")

    corpus = spark.createDataFrame(
        [(i, f"document body {i % 400}", f"lang{i % 3}")
         for i in range(2_000)],
        "doc_id bigint, text string, lang string",
    )
    # a "new crawl": half fresh, half replays of corpus content
    batch = spark.createDataFrame(
        [(100_000 + i, f"fresh text {i}", "lang0") for i in range(300)]
        + [(200_000 + i, f"document body {i}", "lang1")
           for i in range(300)],
        "doc_id bigint, text string, lang string",
    )

    # 1. Bloom screen: fixed memory regardless of corpus size
    fresh = bloom.bloom_screen_against(
        batch, corpus, "text", num_bits=1 << 20
    )
    n_fresh = fresh.count()
    print(f"screen: {batch.count()} arrived, {n_fresh} genuinely new")

    # 2. export survivors as WebDataset shards
    out = tempfile.mkdtemp(prefix="wds_export_")
    manifest = wds.write_webdataset(
        fresh, out, "doc_id",
        {"text": "txt", "lang": "cls"},
        num_shards=4,
    )
    for row in manifest.collect():
        print(f"shard {row.shard}: {row.n_samples} samples, "
              f"{row.n_bytes} tar bytes -> {row.path}")

    # 3. read back (one streamed task per shard) and verify
    samples = wds.webdataset_samples(
        wds.read_webdataset(spark, out), ["txt", "cls"]
    )
    assert samples.count() == n_fresh
    print("roundtrip OK:", samples.count(), "samples")
    print(samples.select(
        "key", F.decode("cls", "utf-8").alias("lang")
    ).limit(5).toPandas().to_string(index=False))

    spark.stop()


if __name__ == "__main__":
    main()
