"""Cross-validation: our lag/cumsum sessionizer vs Spark's built-in
session_window aggregation — independent implementations, identical
session boundaries."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from dataset_grouper_spark.operators import sessions


def test_sessionize_matches_session_window(spark):
    base = datetime(2026, 1, 1)
    rows = []
    # user A: bursts at 0-2min, 60-61min, 200min
    for m in [0, 1, 2, 60, 61, 200]:
        rows.append(("A", base + timedelta(minutes=m)))
    # user B: single long session with 9-minute gaps
    for m in [0, 9, 18, 27]:
        rows.append(("B", base + timedelta(minutes=m)))
    df = spark.createDataFrame(rows, "user: string, ts: timestamp")

    gap_min = 10
    builtin = (
        df.groupBy("user", F.session_window("ts", f"{gap_min} minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user",
            F.col("session_window.start").alias("start"),
            "n_events",
        )
    )
    ours = sessions.sessionize(
        df.withColumn("t_us", F.expr("CAST(unix_micros(ts) AS BIGINT)")),
        "user",
        "t_us",
        gap=gap_min * 60 * 10**6 - 1,  # session_window gap is inclusive-exclusive
    )
    b = {(r.user, r.start): r.n_events for r in builtin.collect()}
    o = {(r.user, r.t_first): r.n_events for r in ours.collect()}
    # compare by (user, session start, count)
    b_keys = {(u, int(s.timestamp() * 1e6), n) for (u, s), n in b.items()}
    o_keys = {(u, t, n) for (u, t), n in o.items()}
    assert b_keys == o_keys
