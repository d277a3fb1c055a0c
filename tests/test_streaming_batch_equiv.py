"""Streaming operators vs their batch twins on identical data.

availableNow drains the whole source through the streaming plan; the
result must agree with the batch operator applied to the same rows
(VERDICT r1 #9). Same pattern as test_session_window_crosscheck for
sessions.
"""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.operators.dedup import exact_dedup
from dataset_grouper_spark.streaming import windowed_group_counts
from dataset_grouper_spark.streaming.dedup import streaming_exact_dedup


def _mixed_events(spark):
    base = datetime(2026, 3, 1)
    rows = []
    for i in range(200):
        rows.append(
            (
                base + timedelta(minutes=(i * 17) % 480),
                f"u{i % 7}",
                f"text {'x ' * (i % 5)}",
            )
        )
    return spark.createDataFrame(rows, "ts: timestamp, user: string, text: string")


def test_windowed_group_counts_equals_batch(spark, tmp_path):
    df = _mixed_events(spark)
    src = str(tmp_path / "src")
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = windowed_group_counts(
        stream, keys.by_feature("user"), "ts", window="1 hour",
        watermark="30 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wbe_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.time_window.start, r.group_id): (r.num_examples, r.num_bytes, r.num_words)
        for r in spark.sql("select * from wbe_stream").collect()
    }

    # batch twin: the same operator on the static frame (withWatermark
    # is a no-op in batch execution)
    batch = windowed_group_counts(
        spark.read.parquet(src), keys.by_feature("user"), "ts",
        window="1 hour", watermark="30 minutes",
    )
    want = {
        (r.time_window.start, r.group_id): (r.num_examples, r.num_bytes, r.num_words)
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 10


def test_streaming_exact_dedup_equals_batch(spark, tmp_path):
    base = datetime(2026, 3, 1)
    rows = [
        (base + timedelta(minutes=i), i, f"content {i % 13}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "ts: timestamp, id: long, text: string")
    src = str(tmp_path / "src")
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_exact_dedup(stream, "text", "ts", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("dbe_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dbe_stream").collect()

    batch = exact_dedup(spark.read.parquet(src), "text", "id")
    want = batch.collect()

    # one survivor per distinct content; identical surviving content
    # sets (streaming keeps the batch's arrival-order survivor, batch
    # keeps min id — content sets must still agree exactly)
    assert len(got) == len(want) == 13
    assert {r.text for r in got} == {r.text for r in want}
