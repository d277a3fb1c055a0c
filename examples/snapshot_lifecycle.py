"""Example: versioned corpus curation with the snapshot store.

  write v1 -> append a new crawl (v2) -> redact-and-upsert flagged
  docs (v3, copy-on-write) -> GDPR-delete an author (v4) -> time-travel
  audit every version -> vacuum expired versions

A training job launched against v2 keeps reading EXACTLY v2's bytes
while v3 and v4 land; the audit reconstructs what any past run saw.
Data files are immutable and shared across versions by reference —
the upsert in step 3 rewrites only the files that contain a flagged
doc.

Run: python examples/snapshot_lifecycle.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark.functions import redact
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.sinks import snapshots as snap
from dataset_grouper_spark.sources import read_table

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("snapshot-lifecycle", master="local[4]")
    docs = read_table(spark, SF, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    path = tempfile.mkdtemp(prefix="snap_demo_")

    # v1: the initial corpus
    v1 = snap.snapshot_write(docs.filter("doc_id % 2 = 0"), path)

    # v2: a new crawl arrives — append writes ONLY the new files
    v2 = snap.snapshot_append(docs.filter("doc_id % 2 = 1"), path)

    # v3: privacy review flags some docs — redact and upsert them;
    # copy-on-write rewrites only the files containing a flagged row
    flagged = (
        snap.read_snapshot(spark, path, v2)
        .filter("doc_id % 25 = 0")
        .withColumn("text", redact.redact_pii(F.col("text")))
    )
    v3 = snap.snapshot_upsert(flagged, path, id_col="doc_id")

    # v4: GDPR erasure for one source
    v4 = snap.snapshot_delete(spark, path, F.col("source") == "src3")

    print("version | rows")
    for v in (v1, v2, v3, v4):
        n = snap.read_snapshot(spark, path, v).count()
        print(f"  v{v}    | {n}")

    # expire everything but the last two versions; v3/v4 reads survive
    # min_age_seconds=0: demo only — production keeps the in-flight
    # writer guard (files younger than the window are never deleted)
    stats = snap.vacuum_snapshots(path, keep_last=2, min_age_seconds=0)
    print(
        f"vacuum: removed {len(stats['removed_files'])} files, "
        f"versions {stats['removed_versions']}; kept {stats['kept_versions']}"
    )
    print("v4 rows after vacuum:", snap.read_snapshot(spark, path, v4).count())


if __name__ == "__main__":
    main()
