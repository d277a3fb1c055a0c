"""Example: merge-on-read DELETEs on both lakehouse formats, plus an
exactly-once streaming ingest into Delta — all jar-free.

Deletes never rewrite a data file: Delta commits roaring-bitmap
deletion vectors, Iceberg commits (file, pos) position-delete parquet;
both cost O(deleted rows) to write and one anti-join to read — the
economics that make point deletes viable on a 100 TB table. Time
travel across the delete commits stays intact, and a crash-replayed
streaming epoch lands zero duplicates thanks to the Delta protocol's
txn actions.

Run: python examples/merge_on_read.py
"""

import os
import sys
import tempfile

sys.path.insert(0, ".")

from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import open_table
from dataset_grouper_spark.sources.delta import (
    delta_append,
    delta_append_txn,
    delta_delete_where,
    delta_versions,
    read_delta,
)
from dataset_grouper_spark.sources.iceberg import (
    iceberg_append,
    iceberg_delete_where,
    read_iceberg,
)


def main() -> None:
    spark = get_spark("example-mor")
    rows = [(i, f"doc {i}", "en" if i % 2 else "de") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    # --- Delta: deletion vectors -------------------------------------
    delta = os.path.join(tempfile.mkdtemp(prefix="mor_"), "delta_docs")
    delta_append(spark, df, delta)
    v = delta_delete_where(spark, delta, "lang = 'de'")
    print("delta versions:", delta_versions(delta), "delete commit:", v)
    print("delta rows now:", read_delta(spark, delta).count(), "(was 10)")
    print("delta rows @v0:", read_delta(spark, delta, version=0).count())
    dvs = [n for n in os.listdir(delta) if n.startswith("deletion_vector_")]
    print("bitmap sidecars written:", len(dvs), "- no data file rewritten")

    # --- Iceberg: position deletes -----------------------------------
    ice = os.path.join(tempfile.mkdtemp(prefix="mor_"), "ice_docs")
    first = iceberg_append(spark, df, ice)
    snap = iceberg_delete_where(spark, ice, "doc_id < 4")
    print("iceberg rows now:", read_iceberg(spark, ice).count())
    print(
        "iceberg rows @pre-delete snapshot:",
        read_iceberg(spark, ice, snapshot_id=first).count(),
    )
    assert snap != first

    # --- exactly-once streaming epoch into Delta ---------------------
    extra = spark.createDataFrame(
        [(100, "late arrival", "en")], "doc_id long, text string, lang string"
    )
    assert delta_append_txn(spark, extra, delta, "ingest-app", 0) is not None
    # a crash-replay of the same epoch is a no-op:
    assert delta_append_txn(spark, extra, delta, "ingest-app", 0) is None
    print("after epoch + replay:", read_delta(spark, delta).count(), "rows")

    # --- one entry point over both -----------------------------------
    for path in (delta, ice):
        print(path.split("/")[-1], "->", open_table(spark, path).count(), "rows")

    spark.stop()


if __name__ == "__main__":
    main()
