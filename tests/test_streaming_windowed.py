"""Event-time windowed group counts with watermark (late-data path)."""

from datetime import datetime

from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.streaming import windowed_group_counts


def test_windowed_counts_by_event_time(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        (datetime(2026, 1, 1, 10, 5), "u1", "a"),
        (datetime(2026, 1, 1, 10, 20), "u1", "bb"),
        (datetime(2026, 1, 1, 11, 5), "u1", "ccc"),
        (datetime(2026, 1, 1, 10, 40), "u2", "dddd"),
    ]
    df = spark.createDataFrame(rows, "ts: timestamp, user: string, text: string")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = windowed_group_counts(
        stream, keys.by_feature("user"), "ts", window="1 hour",
        watermark="30 minutes",
    )
    # update mode: every window updated in the batch is emitted (append
    # mode would hold hour-10 back until a LATER batch advances the
    # watermark past the window end — exercised implicitly by state
    # cleanup; here we assert the aggregation semantics).
    q = (
        out.writeStream.format("memory")
        .queryName("win_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.time_window.start.hour, r.group_id): (r.num_examples, r.num_words)
        for r in spark.sql("select * from win_stream").collect()
    }
    # num_words spans ALL string columns (user + text), matching the
    # reference's whole-example word count: 2 per row here.
    assert got[(10, "u1")] == (2, 4)
    assert got[(10, "u2")] == (1, 2)
    assert got[(11, "u1")] == (1, 2)
