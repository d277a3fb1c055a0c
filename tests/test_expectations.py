"""Constraint suites: one-pass law, rates, vacuous semantics."""

import pytest

from dataset_grouper_spark.operators import expectations as E


def _rates(df):
    return {
        (r["check"], r["column"]): (r["rate"], r["passed"])
        for r in df.collect()
    }


def test_rates_and_verdicts(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "de", 20), (3, None, 30), (3, "xx", -5)],
        "id long, lang string, n long",
    )
    out = _rates(
        E.run_checks(
            df,
            [
                E.completeness("lang", 1.0),
                E.uniqueness("id", 1.0),
                E.in_range("n", 0, 100, 1.0),
                E.in_set("lang", ["en", "de"], 0.5),
                E.satisfies("positive_n", "n > 0", 0.75),
            ],
        )
    )
    assert out[("completeness", "lang")] == (0.75, False)
    assert out[("uniqueness", "id")] == (0.75, False)  # 3 distinct / 4
    assert out[("in_range", "n")] == (0.75, False)
    # in_set counts only non-null rows in the denominator: 2/3
    rate, passed = out[("in_set", "lang")]
    assert round(rate, 6) == round(2 / 3, 6) and passed
    assert out[("satisfies", "positive_n")] == (0.75, True)


def test_empty_table_is_vacuously_green(spark):
    df = spark.createDataFrame([], "id long, lang string")
    out = _rates(
        E.run_checks(
            df, [E.completeness("lang"), E.uniqueness("id"),
                 E.in_range("id", 0, 1)]
        )
    )
    assert all(v == (1.0, True) for v in out.values())


def test_all_null_column_range_is_vacuous(spark):
    df = spark.createDataFrame([(None,), (None,)], "n: long")
    out = _rates(E.run_checks(df, [E.in_range("n", 0, 1)]))
    assert out[("in_range", "n")] == (1.0, True)


def test_single_aggregation_pass(spark):
    # the whole suite must compile to ONE aggregate over ONE scan:
    # no joins, no unions of scans
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    plan = (
        E.run_checks(
            df,
            [E.completeness("v"), E.uniqueness("id"),
             E.in_range("id", 0, 9), E.matches("v", "^a$"),
             E.in_set("v", ["a"]), E.satisfies("ok", "id > 0")],
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan and "Union" not in plan


def test_suite_validation(spark):
    df = spark.createDataFrame([(1,)], "id: long")
    with pytest.raises(ValueError, match="empty suite"):
        E.run_checks(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        E.run_checks(df, [E.completeness("id"), E.completeness("id")])
    with pytest.raises(ValueError, match="empty value set"):
        E.in_set("id", [])


def test_sql_twin_agrees(spark, tmp_path):
    import duckdb

    rows = [(i, "en" if i % 3 else None, i * 7 % 50) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, lang string, n long")
    suite = [
        E.completeness("lang", 0.6),
        E.uniqueness("n", 0.9),
        E.in_range("n", 0, 30, 0.7),
        E.in_set("lang", ["en"], 1.0),
        E.satisfies("small_id", "id < 20", 0.5),
    ]
    got = {
        (r["check"], r["column"]): (r["rate"], r["passed"])
        for r in E.run_checks(df, suite).collect()
    }
    p = str(tmp_path / "t.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}'")
    want = {
        (r[0], r[1]): (r[2], r[4])
        for r in con.sql(E.checks_sql("t", suite)).fetchall()
    }
    assert got == want


def test_suite_and_oracle_need_no_spark_session():
    # the driver may call oracle_sql() before (or without) creating a
    # SparkSession: suite construction and twin generation must be
    # engine-free (regression: eager F.col() in Check construction)
    import subprocess
    import sys

    code = (
        "import __spark_entry__ as e; "
        "assert 'quality_checks_documents' in e.oracle_sql()"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, cwd="/root/repo"
    )
    assert res.returncode == 0, res.stderr.decode()[-500:]
