"""Example: streaming purchase->click attribution — two watermarked
streams joined with a time-range condition (state bounded by
watermark+window), drained with availableNow.

Run: python examples/streaming_attribution.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import read_events_stream
from dataset_grouper_spark.streaming import stream_interval_attribution


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-streaming-attribution")
    spark.sparkContext.setLogLevel("ERROR")

    stream = read_events_stream(spark, sf_dir).withColumn(
        "_tsc", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
    )
    purchases = stream.filter("event_type = 'purchase'").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("_tsc").alias("t_purchase"),
    )
    clicks = stream.filter("event_type = 'click'").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("_tsc").alias("t_click"),
    )
    attributed = stream_interval_attribution(
        purchases, clicks, ["user_id"], "t_purchase", "t_click",
        window="1 hour", watermark="1 hour",
    )
    sink = tempfile.mkdtemp(prefix="attr_")
    q = (
        attributed.select("user_id", "purchase_id", "click_id")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="attr_ck_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        raise TimeoutError("stream drain timed out")
    out = spark.read.parquet(sink)
    print("attributed clicks:", out.count())
    out.show(5)


if __name__ == "__main__":
    main()
