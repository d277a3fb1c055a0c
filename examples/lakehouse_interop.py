"""Example: lakehouse interop without any format jars — write a Delta
table with the pure-Python log writer, read it back with time travel,
and export/import Avro shards; all on the stock PySpark distribution.

Run: python examples/lakehouse_interop.py
"""

import os
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sources import avro as avro_src
from dataset_grouper_spark.sources.delta import (
    delta_append,
    delta_versions,
    read_delta,
)


def main() -> None:
    spark = get_spark("example-lakehouse")
    table = os.path.join(tempfile.mkdtemp(prefix="lake_"), "docs")

    batch1 = spark.createDataFrame(
        [(1, "alpha", "en"), (2, "beta", "de")],
        "doc_id long, text string, lang string",
    )
    batch2 = spark.createDataFrame(
        [(3, "gamma", "en")], "doc_id long, text string, lang string"
    )

    v0 = delta_append(spark, batch1, table, partition_by=["lang"])
    v1 = delta_append(spark, batch2, table, partition_by=["lang"])
    print(f"committed Delta versions: {delta_versions(table)} (v0={v0}, v1={v1})")

    print("== latest ==")
    read_delta(spark, table).orderBy("doc_id").show()
    print("== time travel to v0 ==")
    read_delta(spark, table, version=0).orderBy("doc_id").show()

    # Avro export/import with the stdlib codec
    schema = {
        "type": "record",
        "name": "doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": ["null", "string"]},
            {"name": "lang", "type": ["null", "string"]},
        ],
    }
    shard = os.path.join(tempfile.mkdtemp(prefix="avro_"), "docs.avro")
    recs = [r.asDict() for r in read_delta(spark, table).collect()]
    avro_src.write_avro_file(shard, schema, recs)
    print(f"== round-tripped through Avro ({os.path.getsize(shard)} bytes) ==")
    avro_src.read_avro(spark, [shard]).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
