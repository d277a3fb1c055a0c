from datetime import datetime, timedelta

from dataset_grouper_spark import keys
from dataset_grouper_spark.streaming import session_group_counts


def test_streaming_session_windows(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = datetime(2026, 1, 1)
    rows = []
    for m in [0, 5, 8, 60, 62]:          # u1: two sessions (gap 10m)
        rows.append((base + timedelta(minutes=m), "u1"))
    rows.append((base + timedelta(minutes=30), "u2"))
    df = spark.createDataFrame(rows, "ts: timestamp, user: string")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = session_group_counts(
        stream, keys.by_feature("user"), "ts", gap="10 minutes",
        watermark="5 minutes",
    )

    sink = str(tmp_path / "sink")

    def run_once():
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1 ingests the events; append emits nothing until the
    # watermark passes the session ends
    run_once()
    # a much-later sentinel event advances the watermark so batch 2
    # closes and emits all earlier sessions
    spark.createDataFrame(
        [(base + timedelta(hours=6), "u1")], "ts: timestamp, user: string"
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    minutes = lambda r: int((r.session.start - base).total_seconds() // 60)
    got = {
        (r.group_id, minutes(r)): r.num_examples
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {
        ("u1", 0): 3,    # events at 0, 5, 8 merge into one session
        ("u1", 60): 2,   # events at 60, 62
        ("u2", 30): 1,
    }
