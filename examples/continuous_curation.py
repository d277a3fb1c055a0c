"""Example: continuous corpus curation, end to end.

  stream new batches into the VERSIONED store (exactly-once per epoch)
  -> LM-perplexity quality gate against a reference corpus
  -> temperature-flattened source mixing
  -> incremental materialized rollup (never rescans the corpus)
  -> drift check between the previous and current version

Every stage is an engine operator; the same code is the 100 TB
pipeline. Run: python examples/continuous_curation.py
"""

import os
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark.functions import lm
from dataset_grouper_spark.operators import matview, profile, sessions
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sinks import snapshots as snap
from dataset_grouper_spark.sources import read_table
from dataset_grouper_spark.streaming.snapshot_sink import (
    stream_append_snapshots,
)

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("continuous-curation", master="local[4]")
    docs = read_table(spark, SF, "documents").select(
        "doc_id", "source", "lang", "text"
    )

    # --- ingest: micro-batches stream into the snapshot store
    src = tempfile.mkdtemp(prefix="cc_src_")
    table = tempfile.mkdtemp(prefix="cc_tbl_")
    ckpt = tempfile.mkdtemp(prefix="cc_ck_")
    snap.snapshot_write(docs.limit(0), table)  # schema shell = v1
    docs.filter("doc_id % 2 = 0").write.parquet(os.path.join(src, "b0"))
    docs.filter("doc_id % 2 = 1").write.parquet(os.path.join(src, "b1"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = stream_append_snapshots(stream, table, ckpt)
    assert q.awaitTermination(120)
    versions = snap.snapshot_versions(table)
    print(f"ingested versions: {versions}")

    corpus = snap.read_snapshot(spark, table)

    # --- quality gate: drop the lowest-likelihood tier under an
    # English-reference bigram LM
    scores = lm.bigram_logprob(
        corpus, "text", "doc_id", ref=corpus.filter("lang = 'en'")
    )
    cutoff = scores.approxQuantile("avg_logprob", [0.1], 0.0)[0]
    kept = corpus.join(
        scores.filter(F.col("avg_logprob") >= cutoff).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # --- mix: flatten the source distribution at T=2
    mixed = sessions.temperature_mix(kept, "source", "doc_id", 2.0)

    # --- rollup: maintained incrementally from here on
    agg_path = os.path.join(tempfile.mkdtemp(prefix="cc_mv_"), "agg")
    matview.create_materialized_sums(
        mixed,
        ["source"],
        {"n": F.lit(1), "bytes": F.octet_length("text")},
        agg_path,
    )
    print("rollup rows:", spark.read.parquet(agg_path).count())

    # --- QA: source drift between the two ingest versions
    drift = profile.distribution_drift(
        snap.read_snapshot(spark, table, versions[-2]),
        snap.read_snapshot(spark, table, versions[-1]),
        "source",
    )
    kl = drift.agg(F.sum("kl_term").alias("kl")).collect()[0]["kl"]
    print(f"KL(prev‖current) = {kl:.4f}")


if __name__ == "__main__":
    main()
