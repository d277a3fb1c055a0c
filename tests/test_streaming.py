"""Structured Streaming group counts: file source -> windowed agg ->
memory sink, batch-equivalence check."""

from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.streaming import streaming_group_counts


def test_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(i, f"u{i % 3}", "hello world") for i in range(30)],
        "id: long, user: string, text: string",
    )
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    counts = streaming_group_counts(stream, keys.by_feature("user"))
    q = (
        counts.writeStream.format("memory")
        .queryName("gc_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.group_id: (r.num_examples, r.num_bytes, r.num_words)
        for r in spark.sql("select * from gc_stream").collect()
    }
    # batch twin
    from dataset_grouper_spark.operators import group_counts as gc

    want = {
        r.group_id: (r.num_examples, r.num_bytes, r.num_words)
        for r in gc.compute_group_counts(df, keys.by_feature("user")).collect()
    }
    assert got == want
