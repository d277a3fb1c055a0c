from datetime import datetime

from dataset_grouper_spark.streaming.dedup import streaming_exact_dedup


def test_streaming_dedup_drops_in_horizon_dups(spark, tmp_path):
    src = str(tmp_path / "src")
    t0 = datetime(2026, 1, 1, 12, 0)
    rows = [
        (t0, 1, "same text"),
        (t0, 2, "same text"),     # dup within horizon -> dropped
        (t0, 3, "other text"),
        (t0, 4, "other text"),    # dup -> dropped
        (t0, 5, "third"),
    ]
    df = spark.createDataFrame(rows, "ts: timestamp, id: long, text: string")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_exact_dedup(stream, "text", "ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_stream").collect()
    assert len(got) == 3
    assert {r.text for r in got} == {"same text", "other text", "third"}
    assert sorted(got[0].asDict().keys()) == ["id", "text", "ts"]
