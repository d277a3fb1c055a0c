"""Stateful streaming cap-pack: state carries across micro-batches."""

from pyspark.sql import functions as F

from dataset_grouper_spark.streaming.stateful import streaming_cap_pack


def test_cap_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch of 6 rows, 2 groups; each row 10 bytes; cap 35 admits 3/group
    df = spark.createDataFrame(
        [(i, f"g{i % 2}", 10) for i in range(6)],
        "ord: long, group_id: string, sz: int",
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_cap_pack(stream, "sz", "ord", limit=35)
    q = (
        out.writeStream.format("memory")
        .queryName("cap_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r.group_id: (r.admitted, r.admitted_bytes, r.dropped)
        for r in spark.sql("select * from cap_stream").collect()
    }
    assert rows == {"g0": (3, 30, 0), "g1": (3, 30, 0)}

    # second micro-batch: cap already nearly full -> everything drops
    df2 = spark.createDataFrame(
        [(10 + i, f"g{i % 2}", 10) for i in range(4)],
        "ord: long, group_id: string, sz: int",
    )
    df2.write.mode("append").parquet(src)
    q2 = (
        out.writeStream.format("memory")
        .queryName("cap_stream2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows2 = {
        r.group_id: (r.admitted, r.admitted_bytes, r.dropped)
        for r in spark.sql("select * from cap_stream2").collect()
    }
    # fresh query -> state rebuilt from scratch over all 10 rows:
    # per group 5 rows x 10B, cap 35 admits 3, drops 2
    assert rows2 == {"g0": (3, 30, 2), "g1": (3, 30, 2)}
