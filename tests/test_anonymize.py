"""k-anonymity suppression + l-diversity: reference semantics, NULL
classes, generalization recoding, SQL-twin agreement."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import anonymize

ROWS = [
    # (id, zip, age, disease)
    (1, "94105", 34, "flu"),
    (2, "94105", 36, "flu"),
    (3, "94105", 38, "cold"),
    (4, "94110", 33, "flu"),
    (5, "94110", 35, "covid"),
    (6, "10001", 60, "flu"),      # singleton zip3=100 -> suppressed
    (7, None, 41, "cold"),        # NULL zip: its own class
    (8, None, 44, "cold"),
]
SCHEMA = "id long, zip string, age long, disease string"


def test_suppression_keeps_only_big_classes(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = anonymize.k_anonymize(df, ["zip"], 2)
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3, 4, 5, 7, 8]
    assert anonymize.k_anonymize(df, ["zip"], 3).count() == 3


def test_null_quasi_is_its_own_class(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = anonymize.k_anonymize(df, ["zip"], 2)
    assert sorted(
        r["id"] for r in got.filter("zip IS NULL").collect()
    ) == [7, 8]


def test_generalization_merges_classes(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    # zip3 recoding merges 94105+94110 into one class of 5; the rows
    # RELEASED carry the generalized value, never the raw zip
    got = anonymize.k_anonymize(
        df, ["zip"], 5, generalize={"zip": F.substring("zip", 1, 3)}
    )
    rows = got.collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 3, 4, 5]
    assert {r["zip"] for r in rows} == {"941"}


def test_stats_orders_smallest_first(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    stats = anonymize.k_anonymity_stats(df, ["zip"]).collect()
    assert stats[0]["class_size"] == 1 and stats[0]["zip"] == "10001"


def test_l_diversity_flags_homogeneous_class(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {
        r["zip"]: (r["class_size"], r["n_sensitive"], r["diverse"])
        for r in anonymize.l_diversity_check(
            df, ["zip"], "disease", 2
        ).collect()
    }
    assert got["94105"] == (3, 2, True)
    assert got["94110"] == (2, 2, True)
    assert got[None] == (2, 1, False)  # both 'cold': homogeneity leak
    assert got["10001"] == (1, 1, False)


def test_k_validation(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="k must"):
        anonymize.k_anonymize(df, ["zip"], 0)
    with pytest.raises(ValueError, match="not in frame"):
        anonymize.k_anonymize(df, ["nope"], 2)


def test_sql_twin_agrees(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {
        tuple(r)
        for r in anonymize.k_anonymize(
            df,
            ["zip", "age"],
            2,
            generalize={
                "zip": F.substring("zip", 1, 3),
                "age": (F.floor(F.col("age") / 10) * 10).cast("long"),
            },
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(
            "(%d, %s, %d, '%s')"
            % (i, "NULL" if z is None else "'%s'" % z, a, d)
            for i, z, a, d in ROWS
        )
        + ") v(id, zip, age, disease)"
    )
    want = {
        tuple(r)
        for r in con.sql(
            anonymize.k_anonymize_sql(
                "SELECT * FROM t",
                ["zip", "age"],
                2,
                generalize_sql={
                    "zip": "substring(zip, 1, 3)",
                    "age": "CAST(floor(age / 10.0) * 10 AS BIGINT)",
                },
            )
        ).fetchall()
    }
    assert got == want
