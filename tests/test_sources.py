"""Source-reader contracts: the events int64-nanos time normalization
(the parquet file's timestamp unit changed between testdata
generations, which silently broke every time-arithmetic query once) and
the driver-contract invariants of the queries()/oracle_sql() registry.
"""

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as e
from dataset_grouper_spark.sources import read_events_stream, read_table

SF = "/root/testdata/sf0.001"


def test_events_ts_is_int64_nanos_whatever_the_file_unit(spark):
    df = read_table(spark, SF, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    # values must equal the file's raw ticks scaled to nanos
    tbl = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts"])
    unit = tbl.schema.field("ts").type.unit
    mult = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}[unit]
    raw = {
        i.as_py(): t.value * mult
        for i, t in zip(tbl["event_id"], tbl["ts"])
    }
    got = {
        r.event_id: r.ts
        for r in df.select("event_id", "ts").limit(50).collect()
    }
    assert got and all(raw[k] == v for k, v in got.items())


def test_events_stream_shares_the_batch_ts_contract(spark):
    stream = read_events_stream(spark, SF)
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "bigint"
    assert stream.columns == read_table(spark, SF, "events").columns


# rows-only by necessity: seeded-Python-shuffle cohort order is not
# SQL-expressible (approx_distinct_users graduated to a hash oracle in
# r10 — the sketch is asserted in-query against the exact count)
ROWS_ONLY = {
    "group_stream",
}


def test_first_50_queries_are_oracled():
    # the driver oracles only the FIRST 50 dict entries; rotation must
    # never push an oracled query into the window without its twin
    qs = list(e.queries())
    oracles = e.oracle_sql()
    missing = [q for q in qs[:50] if q not in oracles and q not in ROWS_ONLY]
    assert not missing, f"first-50 queries without oracle SQL: {missing}"
    # and every oracle key must point at a registered query
    dangling = [k for k in oracles if k not in set(qs)]
    assert not dangling, f"oracle entries without a query: {dangling}"
