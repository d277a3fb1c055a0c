"""Stream-stream interval join: watermarked two-stream inner join must
reproduce the batch interval join exactly over a drained finite source
(inner joins emit matches eagerly; watermark+window bound the state)."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.streaming.joins import stream_interval_attribution

US = 1_000_000
# keep event times off epoch zero: a row whose event time equals the
# INITIAL watermark value (1970-01-01 00:00:00) is treated as late and
# silently dropped — a Spark edge no real event stream hits
BASE = 3600 * US


def _ts(col):
    return F.expr(f"timestamp_micros(CAST({col} AS LONG))")


def test_stream_interval_join_equals_batch(spark, tmp_path):
    # anchors at t=0s,100s per user; events scattered inside/outside the
    # 30s window after each anchor, plus one exactly ON each bound
    anchors = [
        (u, 1000 + i, BASE + i * 100 * US) for u in (1, 2) for i in range(2)
    ]
    events = []
    eid = 0
    for u in (1, 2, 3):
        for t_us in (0, 1, 15 * US, 30 * US, 30 * US + 1, 99 * US,
                     100 * US, 130 * US, 131 * US):
            events.append((u, 2000 + eid, BASE + t_us))
            eid += 1
    adf = spark.createDataFrame(anchors, "user_id: long, anchor_id: long, t_a: long")
    edf = spark.createDataFrame(events, "user_id: long, event_id: long, t_e: long")
    asrc, esrc = str(tmp_path / "a"), str(tmp_path / "e")
    # one file per side -> one micro-batch: rows arrive in event-time
    # order relative to the watermark (multi-file sources would advance
    # the watermark between micro-batches and drop the early anchors --
    # correct late-data semantics, but not what this test pins)
    adf.coalesce(1).write.parquet(asrc)
    edf.coalesce(1).write.parquet(esrc)

    astream = (
        spark.readStream.schema(adf.schema).parquet(asrc)
        .withColumn("t_anchor", _ts("t_a")).drop("t_a")
    )
    estream = (
        spark.readStream.schema(edf.schema).parquet(esrc)
        .withColumn("t_event", _ts("t_e")).drop("t_e")
    )
    out = stream_interval_attribution(
        astream, estream, ["user_id"], "t_anchor", "t_event",
        window="30 seconds", watermark="10 seconds",
    ).select("user_id", "anchor_id", "event_id")
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "drain timed out"
    got = {
        (r.user_id, r.anchor_id, r.event_id)
        for r in spark.read.parquet(sink).collect()
    }
    expected = {
        (au, aid, eid2)
        for (au, aid, ta) in anchors
        for (eu, eid2, te) in events
        if au == eu and ta <= te <= ta + 30 * US  # inclusive bounds
    }
    assert got == expected and got
    # user 3 has events but no anchors: contributes nothing
    assert not any(u == 3 for (u, _, _) in got)


def test_stream_interval_join_rejects_column_overlap(spark, tmp_path):
    df = spark.createDataFrame([(1, 1, 0)], "user_id: long, x: long, t: long")
    src = str(tmp_path / "s")
    df.write.parquet(src)
    s1 = spark.readStream.schema(df.schema).parquet(src).withColumn(
        "t1", _ts("t")).drop("t")
    s2 = spark.readStream.schema(df.schema).parquet(src).withColumn(
        "t2", _ts("t")).drop("t")
    with pytest.raises(ValueError, match="disjoint"):
        stream_interval_attribution(s1, s2, ["user_id"], "t1", "t2")


def test_stream_interval_join_left_outer_emits_proven_nonmatches(
    spark, tmp_path
):
    # left outer: unmatched anchors emit NULL event columns, but only
    # once the watermark proves nothing can match them — anchors newer
    # than (final watermark - window) stay in state at drain end
    anchors = [
        (1, 10, BASE),               # will match
        (1, 11, BASE + 50 * US),     # no event in [50, 80] -> outer row
        (2, 12, BASE + 500 * US),    # near stream end: watermark never
                                     # proves it unmatched -> held back
    ]
    events = [
        (1, 20, BASE + 5 * US),      # matches anchor 10
        (1, 21, BASE + 200 * US),    # outside both windows
        (2, 22, BASE + 520 * US),    # matches anchor 12
        (1, 23, BASE + 600 * US),    # advances the event watermark
    ]
    adf = spark.createDataFrame(anchors, "user_id: long, anchor_id: long, t_a: long")
    edf = spark.createDataFrame(events, "user_id: long, event_id: long, t_e: long")
    asrc, esrc = str(tmp_path / "a"), str(tmp_path / "e")
    adf.coalesce(1).write.parquet(asrc)
    edf.coalesce(1).write.parquet(esrc)
    astream = (
        spark.readStream.schema(adf.schema).parquet(asrc)
        .withColumn("t_anchor", _ts("t_a")).drop("t_a")
    )
    estream = (
        spark.readStream.schema(edf.schema).parquet(esrc)
        .withColumn("t_event", _ts("t_e")).drop("t_e")
    )
    out = stream_interval_attribution(
        astream, estream, ["user_id"], "t_anchor", "t_event",
        window="30 seconds", watermark="10 seconds", how="left_outer",
    ).select("user_id", "anchor_id", "event_id")
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "drain timed out"
    got = {
        (r.user_id, r.anchor_id, r.event_id)
        for r in spark.read.parquet(sink).collect()
    }
    # matches emit as in the inner join; anchor 11's non-match is
    # provable (watermark = 600s-10s >> 50+30s) and emits with NULL;
    # anchor 12 matched, so no outer row for it
    assert got == {(1, 10, 20), (1, 11, None), (2, 12, 22)}


def test_stream_interval_join_rejects_bad_how(spark, tmp_path):
    df = spark.createDataFrame([(1, 0)], "user_id: long, t: long")
    src = str(tmp_path / "s2")
    df.write.parquet(src)
    s1 = spark.readStream.schema(df.schema).parquet(src).withColumn(
        "t1", _ts("t")).drop("t")
    s2 = spark.readStream.schema(df.schema).parquet(src).withColumn(
        "t2", _ts("t")).drop("t")
    with pytest.raises(ValueError, match="left_outer"):
        stream_interval_attribution(
            s1, s2, ["user_id"], "t1", "t2", how="full"
        )
