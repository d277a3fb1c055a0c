"""In-flight QA metrics via DataFrame.observe — row/null/range counters
collected DURING the job (no second pass over the data), the ops
pattern for validating a 100 TB pipeline without doubling its cost."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from dataset_grouper_spark.sources import read_table

SF001 = "/root/testdata/sf0.001"


def test_observe_counts_ride_the_main_job(spark):
    docs = read_table(spark, SF001, "documents")
    obs = Observation("qa")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("text").isNull().cast("int")).alias("null_texts"),
        F.sum((F.col("n_chars") < 0).cast("int")).alias("bad_lengths"),
    )
    out = observed.filter(F.col("lang") == "en").count()
    got = obs.get
    # the observation sees EVERY scanned row, not just the filtered ones
    assert got["rows_seen"] == docs.count()
    assert got["null_texts"] == 0
    assert got["bad_lengths"] == 0
    assert out < got["rows_seen"]


def test_observe_on_write_pipeline(spark, tmp_path):
    docs = read_table(spark, SF001, "documents")
    obs = Observation("write_qa")
    (
        docs.observe(obs, F.count(F.lit(1)).alias("written"))
        .write.mode("overwrite")
        .parquet(str(tmp_path / "out"))
    )
    assert obs.get["written"] == docs.count()
