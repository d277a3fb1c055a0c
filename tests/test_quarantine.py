"""Row-level quarantine: dead-letter split, batch and streaming."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators.expectations import (
    completeness,
    in_range,
    in_set,
    matches,
    quarantine,
    row_predicate,
    satisfies,
    uniqueness,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "en", 100),   # clean
        (2, None, 100),   # null lang: fails completeness only
        (3, "xx", 100),   # bad lang: fails in_set only
        (4, "en", -5),    # bad value: fails in_range only
        (5, None, -5),    # fails completeness AND in_range
    ]
    return spark.createDataFrame(rows, "id long, lang string, v long")


SUITE = [
    completeness("lang"),
    in_set("lang", ["en", "de"]),
    in_range("v", 0, 1000),
]


def test_quarantine_split_and_names(frame):
    good, bad = quarantine(frame, SUITE)
    assert [r["id"] for r in good.orderBy("id").collect()] == [1]
    got = {
        r["id"]: list(r["failed_checks"])
        for r in bad.orderBy("id").collect()
    }
    assert got == {
        2: ["completeness:lang"],
        3: ["in_set:lang"],
        4: ["in_range:v"],
        5: ["completeness:lang", "in_range:v"],
    }


def test_null_passes_nonnull_scoped_checks(frame):
    # id=2 (NULL lang) must NOT fail in_set — null-ness is
    # completeness's job, matching the suite-rate semantics
    _good, bad = quarantine(frame, [in_set("lang", ["en", "de"])])
    assert [r["id"] for r in bad.collect()] == [3]


def test_satisfies_null_predicate_fails_row(spark):
    df = spark.createDataFrame([(1, None)], "id long, v long")
    _good, bad = quarantine(df, [satisfies("pos", "v > 0")])
    assert [r["id"] for r in bad.collect()] == [1]


def test_matches_row_level(spark):
    df = spark.createDataFrame(
        [(1, "http://a"), (2, "ftp://b"), (3, None)], "id long, u string"
    )
    good, bad = quarantine(df, [matches("u", "^https?://")])
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    assert [r["id"] for r in bad.collect()] == [2]


def test_uniqueness_has_no_row_form():
    with pytest.raises(ValueError, match="no row-level form"):
        row_predicate(uniqueness("id"))


def test_streaming_gate(spark, tmp_path):
    from dataset_grouper_spark.streaming.quality_gate import (
        quarantine_batch_writer,
    )

    src = str(tmp_path / "src")
    good_p, bad_p = str(tmp_path / "good"), str(tmp_path / "bad")
    spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, None)], "id long, lang string"
    ).write.parquet(src)
    batch = spark.read.parquet(src)
    q = (
        spark.readStream.schema(batch.schema)
        .parquet(src)
        .writeStream.foreachBatch(
            quarantine_batch_writer(
                [completeness("lang"), in_set("lang", ["en", "de"])],
                good_p,
                bad_p,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [r["id"] for r in spark.read.parquet(good_p).collect()] == [1]
    bad = {
        r["id"]: r["failed_checks"]
        for r in spark.read.parquet(bad_p).collect()
    }
    assert bad == {2: "in_set:lang", 3: "completeness:lang"}
