"""Foreign-engine golden fixtures for the lakehouse trio (VERDICT r9
task 2).

No real Spark-Delta / pyiceberg / Hudi writer is installable in this
environment, so each fixture is HAND-ASSEMBLED to the published spec
in the exact LAYOUT AND METADATA SHAPE the real engines emit — every
field name, ordering quirk, and extra stats column below is taken
from the public format specs and the files those engines write:

* **Delta** (Spark-Delta 3.x emission shape): commitInfo action FIRST
  in each commit; ``add.stats`` as an embedded JSON STRING with
  numRecords/minValues/maxValues/nullCount; hive-style partition dirs
  whose data files OMIT the partition column (Spark-Delta stores it
  only in ``partitionValues`` — a reader that does not restore it
  returns the wrong schema); ``engineInfo``/``txnId``/
  ``operationMetrics`` riders; a remove+add second commit.
* **Iceberg** (Spark-Iceberg / pyiceberg v2 shape): full v2
  ``*.metadata.json`` (table-uuid, last-sequence-number, schemas with
  field-ids, partition-specs, sort-orders, refs, snapshot-log,
  metadata-log, properties); a manifest LIST carrying the spec's
  complete field set (content, sequence numbers, per-manifest file
  and row counts, partition field summaries); manifest ENTRIES with
  ``file_sequence_number`` and a ``data_file`` struct carrying the
  full stats block real writers emit — column_sizes / value_counts /
  null_value_counts / nan_value_counts / lower+upper bounds (Appendix
  D single-value binary) / key_metadata / split_offsets /
  sort_order_id — none of which this repo's own writer produces, so a
  reader that can only decode its own manifests fails here.
* **Hudi** (0.14 CoW + MoR shape): 17-digit ``yyyyMMddHHmmssSSS``
  instants; ``{fileId}_{writeToken}_{instant}.parquet`` base names
  with UUID file ids and task-attempt write tokens; hive-style
  partition dirs; full HoodieCommitMetadata writeStats field set;
  realistic ``hoodie.properties``; ``archived/`` + ``.aux`` timeline
  residents; a ``.clean`` instant from another action family; for
  MoR, a real HoodieLogFormat log (``.{fid}_{base}.log.1_{token}``)
  written in the binary block framing of ``sources/hudi_log.py``.

Committed fixtures use RELATIVE data paths (the Delta norm; spec-legal
for Iceberg/Hudi) so the checkout stays relocatable.  Absolute
``file://`` URIs and v2 position/equality deletes — which must embed
the table's runtime location — are exercised by the runtime half of
``tests/test_foreign_fixtures.py``, which calls the builders here
against a tmp dir with ``absolute=True``.

Regeneration: ``python tools/make_foreign_fixtures.py`` rewrites
``tests/fixtures/foreign/``.  Avro bytes are deterministic (fixed sync
marker); parquet bytes may differ across pyarrow versions, but every
pinned value lives in the tests, not the bytes.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXDIR = os.path.join(REPO, "tests", "fixtures", "foreign")


def _write_parquet(path: str, cols: dict) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tbl = pa.table(cols)
    pq.write_table(tbl, path, compression="snappy")
    return os.path.getsize(path)


# --------------------------------------------------------------- Delta


def build_delta(root: str) -> None:
    """Spark-Delta 3.x shaped table: 2 commits, partitioned by lang,
    partition column absent from the data files."""
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "txt", "type": "string", "nullable": True,
                 "metadata": {}},
                {"name": "lang", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        },
        separators=(",", ":"),
    )
    en0 = "lang=en/part-00000-0a1b2c3d-4e5f-6071-8293-a4b5c6d7e8f9-c000.snappy.parquet"
    de0 = "lang=de/part-00000-1b2c3d4e-5f60-7182-93a4-b5c6d7e8f90a-c000.snappy.parquet"
    de1 = "lang=de/part-00001-2c3d4e5f-6071-8293-a4b5-c6d7e8f90a1b-c000.snappy.parquet"
    sz_en0 = _write_parquet(
        os.path.join(root, en0),
        {"id": [1, 2, 3], "txt": ["alpha", "bravo", "charlie"]},
    )
    sz_de0 = _write_parquet(
        os.path.join(root, de0), {"id": [4, 5], "txt": ["delta", "echo"]}
    )
    sz_de1 = _write_parquet(
        os.path.join(root, de1),
        {"id": [6, 7], "txt": ["foxtrot", "golf"]},
    )

    def stats(n, lo, hi):
        return json.dumps(
            {
                "numRecords": n,
                "minValues": {"id": lo},
                "maxValues": {"id": hi},
                "nullCount": {"id": 0, "txt": 0},
            },
            separators=(",", ":"),
        )

    c0 = [
        # Spark-Delta puts commitInfo FIRST and decorates it heavily
        {
            "commitInfo": {
                "timestamp": 1710500000000,
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "ErrorIfExists",
                    "partitionBy": '["lang"]',
                },
                "isolationLevel": "Serializable",
                "isBlindAppend": True,
                "operationMetrics": {
                    "numFiles": "2",
                    "numOutputRows": "5",
                    "numOutputBytes": str(sz_en0 + sz_de0),
                },
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                "txnId": "3d4e5f60-7182-93a4-b5c6-d7e8f90a1b2c",
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "4e5f6071-8293-a4b5-c6d7-e8f90a1b2c3d",
                "name": None,
                "description": None,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": ["lang"],
                "configuration": {},
                "createdTime": 1710499999000,
            }
        },
        {
            "add": {
                "path": en0,
                "partitionValues": {"lang": "en"},
                "size": sz_en0,
                "modificationTime": 1710500000000,
                "dataChange": True,
                "stats": stats(3, 1, 3),
            }
        },
        {
            "add": {
                "path": de0,
                "partitionValues": {"lang": "de"},
                "size": sz_de0,
                "modificationTime": 1710500000000,
                "dataChange": True,
                "stats": stats(2, 4, 5),
            }
        },
    ]
    # commit 1: replaceWhere-style overwrite of the de partition
    c1 = [
        {
            "commitInfo": {
                "timestamp": 1710500060000,
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "Overwrite",
                    "partitionBy": '["lang"]',
                    "predicate": "[\"(lang = 'de')\"]",
                },
                "readVersion": 0,
                "isolationLevel": "Serializable",
                "isBlindAppend": False,
                "operationMetrics": {
                    "numFiles": "1",
                    "numOutputRows": "2",
                    "numOutputBytes": str(sz_de1),
                },
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                "txnId": "5f607182-93a4-b5c6-d7e8-f90a1b2c3d4e",
            }
        },
        {
            "remove": {
                "path": de0,
                "deletionTimestamp": 1710500060000,
                "dataChange": True,
                "extendedFileMetadata": True,
                "partitionValues": {"lang": "de"},
                "size": sz_de0,
            }
        },
        {
            "add": {
                "path": de1,
                "partitionValues": {"lang": "de"},
                "size": sz_de1,
                "modificationTime": 1710500060000,
                "dataChange": True,
                "stats": stats(2, 6, 7),
            }
        },
    ]
    for v, actions in [(0, c0), (1, c1)]:
        with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a, separators=(",", ":")) + "\n")

    # classic Spark-Delta CHECKPOINT at version 1 + _last_checkpoint:
    # parquet MAP-typed partitionValues/tags/configuration (pyarrow
    # surfaces maps as tuple lists — a reader that only understands
    # its own JSON-inferred struct checkpoints fails here), a retained
    # remove tombstone, and a txn high-water row
    import pyarrow as pa

    map_ss = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", map_ss),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("tags", map_ss),
        ]
    )
    remove_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
            ("extendedFileMetadata", pa.bool_()),
            ("partitionValues", map_ss),
            ("size", pa.int64()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("description", pa.string()),
            ("format", pa.struct(
                [("provider", pa.string()), ("options", map_ss)]
            )),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", map_ss),
            ("createdTime", pa.int64()),
        ]
    )
    protocol_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    txn_t = pa.struct(
        [
            ("appId", pa.string()),
            ("version", pa.int64()),
            ("lastUpdated", pa.int64()),
        ]
    )
    cp_schema = pa.schema(
        [
            ("txn", txn_t),
            ("add", add_t),
            ("remove", remove_t),
            ("metaData", meta_t),
            ("protocol", protocol_t),
        ]
    )

    def cp_add(path, lang, size, st):
        return {
            "path": path,
            "partitionValues": {"lang": lang},
            "size": size,
            "modificationTime": 1710500060000,
            "dataChange": False,
            "stats": st,
            "tags": {},
        }

    cp_rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "4e5f6071-8293-a4b5-c6d7-e8f90a1b2c3d",
                "name": None,
                "description": None,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": ["lang"],
                "configuration": {},
                "createdTime": 1710499999000,
            }
        },
        {"add": cp_add(en0, "en", sz_en0, stats(3, 1, 3))},
        {"add": cp_add(de1, "de", sz_de1, stats(2, 6, 7))},
        {
            # expired-file tombstone, retained in the checkpoint
            "remove": {
                "path": de0,
                "deletionTimestamp": 1710500060000,
                "dataChange": True,
                "extendedFileMetadata": True,
                "partitionValues": {"lang": "de"},
                "size": sz_de0,
            }
        },
        {"txn": {"appId": "etl-ingest", "version": 7,
                 "lastUpdated": 1710500060000}},
    ]
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pylist(cp_rows, schema=cp_schema),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
        compression="snappy",
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": len(cp_rows)}, f)

    # JSON tail after the checkpoint: one more en file at version 2
    en2 = "lang=en/part-00000-3d4e5f60-7182-93a4-b5c6-d7e8f90a1b2c-c000.snappy.parquet"
    sz_en2 = _write_parquet(
        os.path.join(root, en2), {"id": [10, 11], "txt": ["kilo", "lima"]}
    )
    c2 = [
        {
            "commitInfo": {
                "timestamp": 1710500120000,
                "operation": "WRITE",
                "operationParameters": {"mode": "Append",
                                        "partitionBy": '["lang"]'},
                "readVersion": 1,
                "isolationLevel": "Serializable",
                "isBlindAppend": True,
                "operationMetrics": {"numFiles": "1",
                                     "numOutputRows": "2",
                                     "numOutputBytes": str(sz_en2)},
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                "txnId": "607182a3-93a4-b5c6-d7e8-f90a1b2c3d4e",
            }
        },
        {
            "txn": {"appId": "etl-ingest", "version": 8,
                    "lastUpdated": 1710500120000}
        },
        {
            "add": {
                "path": en2,
                "partitionValues": {"lang": "en"},
                "size": sz_en2,
                "modificationTime": 1710500120000,
                "dataChange": True,
                "stats": stats(2, 10, 11),
            }
        },
    ]
    with open(os.path.join(log, f"{2:020d}.json"), "w") as f:
        for a in c2:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")

    # commit 3: Spark-Delta merge-on-read DELETE — the en0 file stays,
    # a 'u'-storage deletion-vector sidecar (Z85 uuid payload, roaring
    # bitmap framing) masks position 2 (id=3), with the real protocol
    # upgrade action (readerFeatures deletionVectors)
    import uuid as uuid_mod

    from dataset_grouper_spark.sources import roaring as R

    dv_uuid = uuid_mod.UUID("8293a4b5-c6d7-e8f9-0a1b-2c3d4e5f6071")
    offset, size, card = R.dv_file_write(
        os.path.join(root, f"deletion_vector_{dv_uuid}.bin"), [2]
    )
    dv_desc = {
        "storageType": "u",
        "pathOrInlineDv": R.z85_encode(dv_uuid.bytes),
        "offset": offset,
        "sizeInBytes": size,
        "cardinality": card,
    }
    c3 = [
        {
            "commitInfo": {
                "timestamp": 1710500180000,
                "operation": "DELETE",
                "operationParameters": {"predicate": '["(id = 3)"]'},
                "readVersion": 2,
                "isolationLevel": "Serializable",
                "isBlindAppend": False,
                "operationMetrics": {"numDeletedRows": "1",
                                     "numDeletionVectorsAdded": "1"},
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                "txnId": "718293b4-a4b5-c6d7-e8f9-0a1b2c3d4e5f",
            }
        },
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            # newer Spark-Delta rider action: must be tolerated, not
            # understood
            "domainMetadata": {
                "domain": "delta.universalFormat",
                "configuration": "{}",
                "removed": False,
            }
        },
        {
            "remove": {
                "path": en0,
                "deletionTimestamp": 1710500180000,
                "dataChange": True,
                "extendedFileMetadata": True,
                "partitionValues": {"lang": "en"},
                "size": sz_en0,
            }
        },
        {
            "add": {
                "path": en0,
                "partitionValues": {"lang": "en"},
                "size": sz_en0,
                "modificationTime": 1710500000000,
                "dataChange": True,
                "stats": stats(3, 1, 3),
                "deletionVector": dv_desc,
            }
        },
    ]
    with open(os.path.join(log, f"{3:020d}.json"), "w") as f:
        for a in c3:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")


def build_delta_cm(root: str) -> None:
    """The nasty combination (VERDICT r10 task 4): COLUMN MAPPING
    (name mode) + a DELETION VECTOR + a PARQUET CHECKPOINT in one
    Delta table — and the DV descriptor lives INSIDE the checkpoint's
    add struct, so the reader must decode 'u'-storage DVs out of
    parquet map/struct rows while renaming physical->logical columns.

    Shape (Spark-Delta 3.x with delta.columnMapping.mode=name):
    - data files store PHYSICAL column names (col-<uuid>), partition
      dirs and add.partitionValues keys are physical too;
    - protocol is reader 3 / writer 7 with BOTH features;
    - v0 create, v1 DELETE adding the DV, checkpoint AT v1 (+
      _last_checkpoint), v2 JSON append after the checkpoint.

    Expected logical rows after replay: (1,alpha,en) (3,charlie,en)
    (4,delta,de) (5,echo,de) (8,hotel,en) (9,india,en) — id=2 falls to
    the DV.
    """
    import uuid as uuid_mod

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataset_grouper_spark.sources import roaring as R

    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    # physical names, spec-style col-<uuid>
    p_id = "col-7a8b9c0d-1e2f-3041-5263-748596a7b8c9"
    p_txt = "col-8b9c0d1e-2f30-4152-6374-8596a7b8c9d0"
    p_lang = "col-9c0d1e2f-3041-5263-7485-96a7b8c9d0e1"
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": p_id}},
                {"name": "txt", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": p_txt}},
                {"name": "lang", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 3,
                              "delta.columnMapping.physicalName": p_lang}},
            ],
        },
        separators=(",", ":"),
    )
    meta_action = {
        "id": "0d1e2f30-4152-6374-8596-a7b8c9d0e1f2",
        "name": None,
        "description": None,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": ["lang"],
        "configuration": {
            "delta.columnMapping.mode": "name",
            "delta.columnMapping.maxColumnId": "3",
        },
        "createdTime": 1710600000000,
    }
    protocol_action = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["columnMapping", "deletionVectors"],
        "writerFeatures": ["columnMapping", "deletionVectors"],
    }
    en0 = (
        f"{p_lang}=en/part-00000-1e2f3041-5263-7485-96a7-b8c9d0e1f203"
        "-c000.snappy.parquet"
    )
    de0 = (
        f"{p_lang}=de/part-00000-2f304152-6374-8596-a7b8-c9d0e1f20314"
        "-c000.snappy.parquet"
    )
    en1 = (
        f"{p_lang}=en/part-00000-30415263-7485-96a7-b8c9-d0e1f2031425"
        "-c000.snappy.parquet"
    )
    # data files carry PHYSICAL names (the column-mapping contract)
    sz_en0 = _write_parquet(
        os.path.join(root, en0),
        {p_id: [1, 2, 3], p_txt: ["alpha", "bravo", "charlie"]},
    )
    sz_de0 = _write_parquet(
        os.path.join(root, de0),
        {p_id: [4, 5], p_txt: ["delta", "echo"]},
    )
    sz_en1 = _write_parquet(
        os.path.join(root, en1),
        {p_id: [8, 9], p_txt: ["hotel", "india"]},
    )

    def stats(n, lo, hi):
        # stats keys are PHYSICAL under column mapping (footer names)
        return json.dumps(
            {
                "numRecords": n,
                "minValues": {p_id: lo},
                "maxValues": {p_id: hi},
                "nullCount": {p_id: 0, p_txt: 0},
            },
            separators=(",", ":"),
        )

    c0 = [
        {
            "commitInfo": {
                "timestamp": 1710600000000,
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "ErrorIfExists",
                    "partitionBy": '["lang"]',
                },
                "isolationLevel": "Serializable",
                "isBlindAppend": True,
                "operationMetrics": {
                    "numFiles": "2",
                    "numOutputRows": "5",
                    "numOutputBytes": str(sz_en0 + sz_de0),
                },
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                "txnId": "41526374-8596-a7b8-c9d0-e1f203142536",
            }
        },
        {"protocol": protocol_action},
        {"metaData": meta_action},
        {
            "add": {
                "path": en0,
                "partitionValues": {p_lang: "en"},
                "size": sz_en0,
                "modificationTime": 1710600000000,
                "dataChange": True,
                "stats": stats(3, 1, 3),
            }
        },
        {
            "add": {
                "path": de0,
                "partitionValues": {p_lang: "de"},
                "size": sz_de0,
                "modificationTime": 1710600000000,
                "dataChange": True,
                "stats": stats(2, 4, 5),
            }
        },
    ]
    # v1: DELETE id=2 via a 'u'-storage deletion vector on en0
    dv_uuid = uuid_mod.UUID("52637485-96a7-b8c9-d0e1-f20314253647")
    offset, size, card = R.dv_file_write(
        os.path.join(root, f"deletion_vector_{dv_uuid}.bin"), [1]
    )
    dv_desc = {
        "storageType": "u",
        "pathOrInlineDv": R.z85_encode(dv_uuid.bytes),
        "offset": offset,
        "sizeInBytes": size,
        "cardinality": card,
    }
    c1 = [
        {
            "commitInfo": {
                "timestamp": 1710600060000,
                "operation": "DELETE",
                "operationParameters": {"predicate": '["(id = 2)"]'},
                "readVersion": 0,
                "isolationLevel": "Serializable",
                "isBlindAppend": False,
                "operationMetrics": {
                    "numDeletedRows": "1",
                    "numDeletionVectorsAdded": "1",
                },
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                "txnId": "63748596-a7b8-c9d0-e1f2-031425364758",
            }
        },
        {
            "remove": {
                "path": en0,
                "deletionTimestamp": 1710600060000,
                "dataChange": True,
                "extendedFileMetadata": True,
                "partitionValues": {p_lang: "en"},
                "size": sz_en0,
            }
        },
        {
            "add": {
                "path": en0,
                "partitionValues": {p_lang: "en"},
                "size": sz_en0,
                "modificationTime": 1710600000000,
                "dataChange": True,
                "stats": stats(3, 1, 3),
                "deletionVector": dv_desc,
            }
        },
    ]
    for v, actions in [(0, c0), (1, c1)]:
        with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a, separators=(",", ":")) + "\n")

    # checkpoint AT v1: the live adds (one carrying the DV descriptor
    # as a parquet STRUCT), protocol WITH feature lists, column-mapped
    # metaData — the full combination in one parquet file
    map_ss = pa.map_(pa.string(), pa.string())
    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", map_ss),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("tags", map_ss),
            ("deletionVector", dv_t),
        ]
    )
    remove_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
            ("extendedFileMetadata", pa.bool_()),
            ("partitionValues", map_ss),
            ("size", pa.int64()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("description", pa.string()),
            ("format", pa.struct(
                [("provider", pa.string()), ("options", map_ss)]
            )),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", map_ss),
            ("createdTime", pa.int64()),
        ]
    )
    protocol_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    cp_schema = pa.schema(
        [
            ("add", add_t),
            ("remove", remove_t),
            ("metaData", meta_t),
            ("protocol", protocol_t),
        ]
    )
    cp_rows = [
        {"protocol": protocol_action},
        {"metaData": meta_action},
        {
            "add": {
                "path": en0,
                "partitionValues": {p_lang: "en"},
                "size": sz_en0,
                "modificationTime": 1710600000000,
                "dataChange": False,
                "stats": stats(3, 1, 3),
                "tags": {},
                "deletionVector": dv_desc,
            }
        },
        {
            "add": {
                "path": de0,
                "partitionValues": {p_lang: "de"},
                "size": sz_de0,
                "modificationTime": 1710600000000,
                "dataChange": False,
                "stats": stats(2, 4, 5),
                "tags": {},
                "deletionVector": None,
            }
        },
    ]
    pq.write_table(
        pa.Table.from_pylist(cp_rows, schema=cp_schema),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
        compression="snappy",
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": len(cp_rows)}, f)
    # v2: JSON append after the checkpoint
    c2 = [
        {
            "commitInfo": {
                "timestamp": 1710600120000,
                "operation": "WRITE",
                "operationParameters": {"mode": "Append",
                                        "partitionBy": '["lang"]'},
                "readVersion": 1,
                "isolationLevel": "Serializable",
                "isBlindAppend": True,
                "operationMetrics": {"numFiles": "1",
                                     "numOutputRows": "2",
                                     "numOutputBytes": str(sz_en1)},
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.1.0",
                "txnId": "74859607-b8c9-d0e1-f203-142536475869",
            }
        },
        {
            "add": {
                "path": en1,
                "partitionValues": {p_lang: "en"},
                "size": sz_en1,
                "modificationTime": 1710600120000,
                "dataChange": True,
                "stats": stats(2, 8, 9),
            }
        },
    ]
    with open(os.path.join(log, f"{2:020d}.json"), "w") as f:
        for a in c2:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")


# ------------------------------------------------------------- Iceberg


def _ice_bound_long(v: int) -> bytes:
    return struct.pack("<q", v)


_KV_LONG = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "k_v_long",
        "fields": [
            {"name": "key", "type": "int", "field-id": 117},
            {"name": "value", "type": "long", "field-id": 118},
        ],
    },
    "logicalType": "map",
}
_KV_BYTES = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "k_v_bytes",
        "fields": [
            {"name": "key", "type": "int", "field-id": 126},
            {"name": "value", "type": "bytes", "field-id": 127},
        ],
    },
    "logicalType": "map",
}

# the data_file struct exactly as Spark-Iceberg/pyiceberg emit it —
# the full stats block rides along and the reader must tolerate it
_ICE_DATA_FILE = {
    "type": "record",
    "name": "r2",
    "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {
            "name": "partition",
            "type": {
                "type": "record",
                "name": "r102",
                "fields": [
                    {
                        "name": "lang",
                        "type": ["null", "string"],
                        "default": None,
                        "field-id": 1000,
                    }
                ],
            },
            "field-id": 102,
        },
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {"name": "column_sizes", "type": ["null", _KV_LONG],
         "default": None, "field-id": 108},
        {"name": "value_counts", "type": ["null", _KV_LONG],
         "default": None, "field-id": 109},
        {"name": "null_value_counts", "type": ["null", _KV_LONG],
         "default": None, "field-id": 110},
        {"name": "nan_value_counts", "type": ["null", _KV_LONG],
         "default": None, "field-id": 137},
        {"name": "lower_bounds", "type": ["null", _KV_BYTES],
         "default": None, "field-id": 125},
        {"name": "upper_bounds", "type": ["null", _KV_BYTES],
         "default": None, "field-id": 128},
        {"name": "key_metadata", "type": ["null", "bytes"],
         "default": None, "field-id": 131},
        {"name": "split_offsets",
         "type": ["null", {"type": "array", "items": "long"}],
         "default": None, "field-id": 132},
        {"name": "equality_ids",
         "type": ["null", {"type": "array", "items": "int"}],
         "default": None, "field-id": 135},
        {"name": "sort_order_id", "type": ["null", "int"],
         "default": None, "field-id": 140},
    ],
}

_ICE_MANIFEST_ENTRY = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "type": _ICE_DATA_FILE, "field-id": 2},
    ],
}

# v3 deletion-vector manifest entry: the same full stats block PLUS
# the three DV fields real v3 writers add (spec "Deletion vectors")
_ICE_DATA_FILE_DV = {
    "type": "record",
    "name": "r2dv",
    "fields": [dict(f) for f in _ICE_DATA_FILE["fields"]]
    + [
        {"name": "referenced_data_file", "type": ["null", "string"],
         "default": None, "field-id": 143},
        {"name": "content_offset", "type": ["null", "long"],
         "default": None, "field-id": 144},
        {"name": "content_size_in_bytes", "type": ["null", "long"],
         "default": None, "field-id": 145},
    ],
}

_ICE_MANIFEST_ENTRY_DV = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "type": _ICE_DATA_FILE_DV, "field-id": 2},
    ],
}

# v3 row-lineage data entry: the same full stats block PLUS
# first_row_id (spec "Row Lineage", field-id 142)
_ICE_DATA_FILE_RL = {
    "type": "record",
    "name": "r2rl",
    "fields": [dict(f) for f in _ICE_DATA_FILE["fields"]]
    + [
        {"name": "first_row_id", "type": ["null", "long"],
         "default": None, "field-id": 142},
    ],
}

_ICE_MANIFEST_ENTRY_RL = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "type": _ICE_DATA_FILE_RL, "field-id": 2},
    ],
}

_ICE_FIELD_SUMMARY = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "r508",
        "fields": [
            {"name": "contains_null", "type": "boolean", "field-id": 509},
            {"name": "contains_nan", "type": ["null", "boolean"],
             "default": None, "field-id": 518},
            {"name": "lower_bound", "type": ["null", "bytes"],
             "default": None, "field-id": 510},
            {"name": "upper_bound", "type": ["null", "bytes"],
             "default": None, "field-id": 511},
        ],
    },
}

_ICE_MANIFEST_FILE = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int", "field-id": 504},
        {"name": "existing_data_files_count", "type": "int",
         "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int",
         "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions", "type": ["null", _ICE_FIELD_SUMMARY],
         "default": None, "field-id": 507},
        {"name": "key_metadata", "type": ["null", "bytes"],
         "default": None, "field-id": 519},
    ],
}


def _ice_stats(n_rows: int, lo: int, hi: int, sizes: dict) -> dict:
    return {
        "column_sizes": [{"key": k, "value": v} for k, v in sizes.items()],
        "value_counts": [
            {"key": 1, "value": n_rows},
            {"key": 2, "value": n_rows},
            {"key": 3, "value": n_rows},
        ],
        "null_value_counts": [
            {"key": 1, "value": 0},
            {"key": 2, "value": 0},
            {"key": 3, "value": 0},
        ],
        "nan_value_counts": [],
        "lower_bounds": [{"key": 1, "value": _ice_bound_long(lo)}],
        "upper_bounds": [{"key": 1, "value": _ice_bound_long(hi)}],
        "key_metadata": None,
        "split_offsets": [4],
        "sort_order_id": 0,
    }


def build_iceberg(
    root: str, absolute: bool = False, with_deletes: bool = False,
    with_dv: bool = False, with_lineage: bool = False,
) -> None:
    """Spark-Iceberg/pyiceberg v2 shaped table: 2 snapshots, identity
    partition on lang (source column kept in the data, per spec).
    ``absolute=True`` stores ``file://`` URIs (what real engines write
    — requires a fixed root, so it is the runtime-test mode);
    ``with_deletes`` adds a third snapshot with a v2 POSITION delete
    manifest (runtime-only: its delete parquet embeds absolute
    paths); ``with_dv`` (requires with_deletes) adds a FOURTH
    snapshot with an Iceberg v3 DELETION VECTOR — a real Puffin file
    whose footer carries foreign rider properties, a DV manifest with
    the full stats block plus the three v3 fields, and the metadata
    upgraded to format-version 3 (the realistic v2->v3 upgrade shape:
    old position deletes stay valid for files without DVs);
    ``with_lineage`` (VERDICT r10 task 4: DV + ROW LINEAGE together)
    stamps every data entry with ``first_row_id`` (spec field-id 142,
    en0=0 de0=3 en1=5) and records ``next-row-id``=7 — deletes must
    never renumber survivors, so with the v2 delete killing (en0,1)
    and the DV killing (en1,0) the surviving ``_row_id``s are
    0,2,3,4,6."""
    from dataset_grouper_spark.sources.avro import write_avro_file

    meta = os.path.join(root, "metadata")
    os.makedirs(meta, exist_ok=True)
    en0 = "data/lang=en/00000-0-6071829a-a4b5-c6d7-e8f9-0a1b2c3d4e5f-00001.parquet"
    de0 = "data/lang=de/00000-1-7182939a-b5c6-d7e8-f90a-1b2c3d4e5f60-00002.parquet"
    en1 = "data/lang=en/00001-0-82939aa4-c6d7-e8f9-0a1b-2c3d4e5f6071-00001.parquet"
    sz = {}
    sz[en0] = _write_parquet(
        os.path.join(root, en0),
        {"id": [1, 2, 3], "txt": ["alpha", "bravo", "charlie"],
         "lang": ["en"] * 3},
    )
    sz[de0] = _write_parquet(
        os.path.join(root, de0),
        {"id": [4, 5], "txt": ["delta", "echo"], "lang": ["de"] * 2},
    )
    sz[en1] = _write_parquet(
        os.path.join(root, en1),
        {"id": [8, 9], "txt": ["hotel", "india"], "lang": ["en"] * 2},
    )

    def loc(rel: str) -> str:
        return f"file://{root}/{rel}" if absolute else rel

    # v3 row lineage: per-file first_row_id in file-creation order
    frid = {en0: 0, de0: 3, en1: 5}

    def entry(path, n, lo, hi, lang, seq):
        return {
            "status": 1,
            "snapshot_id": None,
            "sequence_number": None,  # ADDED entries inherit (spec)
            "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": loc(path),
                "file_format": "PARQUET",
                "partition": {"lang": lang},
                "record_count": n,
                "file_size_in_bytes": sz[path],
                **_ice_stats(
                    n, lo, hi, {1: 64, 2: 96, 3: 48}
                ),
                "equality_ids": None,
                **(
                    {"first_row_id": frid[path]} if with_lineage else {}
                ),
            },
        }

    entry_schema = (
        _ICE_MANIFEST_ENTRY_RL if with_lineage else _ICE_MANIFEST_ENTRY
    )
    m0 = "metadata/829a93a4-b5c6-d7e8-f90a-1b2c3d4e5f60-m0.avro"
    write_avro_file(
        os.path.join(root, m0),
        entry_schema,
        [
            entry(en0, 3, 1, 3, "en", 1),
            entry(de0, 2, 4, 5, "de", 1),
        ],
    )
    m1 = "metadata/93a4a4b5-c6d7-e8f9-0a1b-2c3d4e5f6071-m0.avro"
    write_avro_file(
        os.path.join(root, m1),
        entry_schema,
        [entry(en1, 2, 8, 9, "en", 2)],
    )

    def mf(path, content, seq, snap, added, rows):
        return {
            "manifest_path": loc(path),
            "manifest_length": os.path.getsize(os.path.join(root, path)),
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap,
            "added_data_files_count": added,
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": [
                {
                    "contains_null": False,
                    "contains_nan": False,
                    "lower_bound": b"de",
                    "upper_bound": b"en",
                }
            ],
            "key_metadata": None,
        }

    snap1, snap2, snap3 = (
        4910972762596521298,
        6395864198392318822,
        8123451122334455667,
    )
    ml1 = "metadata/snap-4910972762596521298-1-a4b5c6d7-e8f9-0a1b-2c3d-4e5f60718293.avro"
    write_avro_file(
        os.path.join(root, ml1),
        _ICE_MANIFEST_FILE,
        [mf(m0, 0, 1, snap1, 2, 5)],
    )
    ml2 = "metadata/snap-6395864198392318822-1-b5c6d7e8-f90a-1b2c-3d4e-5f6071829304.avro"
    write_avro_file(
        os.path.join(root, ml2),
        _ICE_MANIFEST_FILE,
        [mf(m0, 0, 1, snap1, 2, 5), mf(m1, 0, 2, snap2, 1, 2)],
    )

    snapshots = [
        {
            "snapshot-id": snap1,
            "timestamp-ms": 1710500000000,
            "sequence-number": 1,
            "summary": {
                "operation": "append",
                "spark.app.id": "application_1710499000000_0042",
                "added-data-files": "2",
                "added-records": "5",
                "total-records": "5",
                "total-data-files": "2",
            },
            "manifest-list": loc(ml1),
            "schema-id": 0,
        },
        {
            "snapshot-id": snap2,
            "parent-snapshot-id": snap1,
            "timestamp-ms": 1710500060000,
            "sequence-number": 2,
            "summary": {
                "operation": "append",
                "added-data-files": "1",
                "added-records": "2",
                "total-records": "7",
                "total-data-files": "3",
            },
            "manifest-list": loc(ml2),
            "schema-id": 0,
        },
    ]
    current = snap2
    last_seq = 2
    if with_deletes:
        # v2 position delete: drop (en0, pos 1) => id=2 disappears
        del0 = "data/lang=en/00002-0-deletes-9aa4b5c6-d7e8-f90a-1b2c-3d4e5f607182-00001.parquet"
        sz[del0] = _write_parquet(
            os.path.join(root, del0),
            {
                "file_path": [loc(en0) if absolute else
                              os.path.join(root, en0)],
                "pos": [1],
            },
        )
        md = "metadata/a4b5c6d7-0a1b-2c3d-4e5f-607182939aa4-m0.avro"
        write_avro_file(
            os.path.join(root, md),
            _ICE_MANIFEST_ENTRY,
            [
                {
                    "status": 1,
                    "snapshot_id": None,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 1,
                        "file_path": loc(del0),
                        "file_format": "PARQUET",
                        "partition": {"lang": "en"},
                        "record_count": 1,
                        "file_size_in_bytes": sz[del0],
                        **_ice_stats(1, 2, 2, {1: 32, 2: 32, 3: 32}),
                        "equality_ids": None,
                    },
                }
            ],
        )
        ml3 = "metadata/snap-8123451122334455667-1-c6d7e8f9-1b2c-3d4e-5f60-718293a4b5c6.avro"
        write_avro_file(
            os.path.join(root, ml3),
            _ICE_MANIFEST_FILE,
            [
                mf(m0, 0, 1, snap1, 2, 5),
                mf(m1, 0, 2, snap2, 1, 2),
                mf(md, 1, 3, snap3, 1, 1),
            ],
        )
        snapshots.append(
            {
                "snapshot-id": snap3,
                "parent-snapshot-id": snap2,
                "timestamp-ms": 1710500120000,
                "sequence-number": 3,
                "summary": {"operation": "delete",
                            "removed-position-deletes": "0",
                            "added-position-delete-files": "1"},
                "manifest-list": loc(ml3),
                "schema-id": 0,
            }
        )
        current = snap3
        last_seq = 3

    fmt_version = 2
    if with_lineage:
        fmt_version = 3  # row lineage is a v3 feature
    if with_dv:
        if not with_deletes:
            raise ValueError("with_dv requires with_deletes")
        from dataset_grouper_spark.sources import puffin as _pf

        snap4 = 9234561233445566778
        # DV on en1, position 0 => id=8 disappears; en0 keeps its v2
        # position delete (spec upgrade rule: one delete technology
        # per file, both valid side by side in an upgraded table)
        dv0 = "data/lang=en/00003-0-dv-b5c6d7e8-f90a-1b2c-3d4e-5f6071829304.puffin"
        ref = loc(en1) if absolute else os.path.join(root, en1)
        spans = _pf.write_puffin(
            os.path.join(root, dv0),
            [
                (
                    _pf.DV_BLOB_TYPE,
                    _pf.dv_blob_encode([0]),
                    {
                        "referenced-data-file": ref,
                        "cardinality": "1",
                        # foreign rider property a reader must ignore
                        "trino-engine-epoch": "467",
                        "__snapshot_id": snap4,
                        "__sequence_number": 4,
                    },
                )
            ],
            properties={"created-by": "Trino version 467"},
        )
        off, ln = spans[0]
        mdv = "metadata/b5c6d7e8-1b2c-3d4e-5f60-718293a4b5c6-m0.avro"
        write_avro_file(
            os.path.join(root, mdv),
            _ICE_MANIFEST_ENTRY_DV,
            [
                {
                    "status": 1,
                    "snapshot_id": None,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 1,
                        "file_path": loc(dv0),
                        "file_format": "PUFFIN",
                        "partition": {"lang": "en"},
                        "record_count": 1,
                        "file_size_in_bytes": os.path.getsize(
                            os.path.join(root, dv0)
                        ),
                        **_ice_stats(1, 8, 8, {1: 32, 2: 32, 3: 32}),
                        "equality_ids": None,
                        "referenced_data_file": ref,
                        "content_offset": off,
                        "content_size_in_bytes": ln,
                    },
                }
            ],
        )
        ml4 = "metadata/snap-9234561233445566778-1-d7e8f90a-2c3d-4e5f-6071-82939aa4b5c6.avro"
        write_avro_file(
            os.path.join(root, ml4),
            _ICE_MANIFEST_FILE,
            [
                mf(m0, 0, 1, snap1, 2, 5),
                mf(m1, 0, 2, snap2, 1, 2),
                mf(md, 1, 3, snap3, 1, 1),
                mf(mdv, 1, 4, snap4, 1, 1),
            ],
        )
        snapshots.append(
            {
                "snapshot-id": snap4,
                "parent-snapshot-id": snap3,
                "timestamp-ms": 1710500180000,
                "sequence-number": 4,
                "summary": {"operation": "delete", "added-dvs": "1",
                            "removed-position-deletes": "0"},
                "manifest-list": loc(ml4),
                "schema-id": 0,
            }
        )
        current = snap4
        last_seq = 4
        fmt_version = 3

    meta_json = {
        "format-version": fmt_version,
        **({"next-row-id": 7} if with_lineage else {}),
        "table-uuid": "d7e8f90a-2c3d-4e5f-6071-82939aa4b5c6",
        # the reader plans from the path it is GIVEN; location is a
        # rider (kept foreign-realistic, not checkout-dependent)
        "location": (
            f"file://{root}"
            if absolute
            else "file:///tmp/warehouse/db/foreign_iceberg"
        ),
        "last-sequence-number": last_seq,
        "last-updated-ms": 1710500120000,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "id", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "txt", "required": False,
                     "type": "string"},
                    {"id": 3, "name": "lang", "required": False,
                     "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "lang",
                        "transform": "identity",
                        "source-id": 3,
                        "field-id": 1000,
                    }
                ],
            }
        ],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "owner": "etl",
            "write.parquet.compression-codec": "zstd",
            "write.metadata.compression-codec": "none",
        },
        "current-snapshot-id": current,
        "refs": {
            "main": {"snapshot-id": current, "type": "branch"}
        },
        "snapshots": snapshots,
        "statistics": [],
        "partition-statistics": [],
        "snapshot-log": [
            {"timestamp-ms": s["timestamp-ms"],
             "snapshot-id": s["snapshot-id"]}
            for s in snapshots
        ],
        "metadata-log": [],
    }
    with open(os.path.join(meta, "v2.metadata.json"), "w") as f:
        json.dump(meta_json, f)
    with open(os.path.join(meta, "version-hint.text"), "w") as f:
        f.write("2")


# ---------------------------------------------------------------- Hudi

_HOODIE_PROPS = """\
#Properties saved on 2024-03-15T10:30:00.123Z
#Fri Mar 15 10:30:00 UTC 2024
hoodie.table.name={name}
hoodie.table.type={ttype}
hoodie.table.version=6
hoodie.timeline.layout.version=1
hoodie.table.checksum=3761817763
hoodie.table.recordkey.fields=id
hoodie.table.partition.fields=lang
hoodie.datasource.write.hive_style_partitioning=true
hoodie.datasource.write.partitionpath.urlencode=false
hoodie.table.keygenerator.class=org.apache.hudi.keygen.SimpleKeyGenerator
hoodie.table.base.file.format=PARQUET
hoodie.archivelog.folder=archived
hoodie.populate.meta.fields=true
hoodie.compaction.payload.class=org.apache.hudi.common.model.OverwriteWithLatestAvroPayload
"""


def _hudi_write_stats(
    part: str, fid: str, path: str, prev: str, n: int, size: int,
    updates: int = 0,
) -> dict:
    """The FULL HoodieWriteStat field set a real writer records."""
    return {
        "fileId": fid,
        "path": path,
        "prevCommit": prev,
        "numWrites": n,
        "numDeletes": 0,
        "numUpdateWrites": updates,
        "numInserts": n - updates,
        "totalWriteBytes": size,
        "totalWriteErrors": 0,
        "tempPath": None,
        "partitionPath": part,
        "totalLogRecords": 0,
        "totalLogFilesCompacted": 0,
        "totalLogSizeCompacted": 0,
        "totalUpdatedRecordsCompacted": 0,
        "totalLogBlocks": 0,
        "totalCorruptLogBlock": 0,
        "totalRollbackBlocks": 0,
        "fileSizeInBytes": size,
        "minEventTime": None,
        "maxEventTime": None,
        "runtimeStats": {"totalScanTime": 0, "totalUpsertTime": 12,
                         "totalCreateTime": 0},
    }


def _hudi_commit(
    hp: str, instant: str, action: str, stats: dict, op: str
) -> None:
    for suffix in (f"{action}.requested", f"{action}.inflight"):
        with open(os.path.join(hp, f"{instant}.{suffix}"), "w") as f:
            f.write("{}")
    body = {
        "partitionToWriteStats": stats,
        "compacted": False,
        "extraMetadata": {
            "schema": json.dumps(
                {
                    "type": "record",
                    "name": "foreign_record",
                    "namespace": "hoodie.foreign",
                    "fields": [
                        {"name": "id", "type": ["null", "long"]},
                        {"name": "txt", "type": ["null", "string"]},
                        {"name": "lang", "type": ["null", "string"]},
                    ],
                }
            )
        },
        "operationType": op,
    }
    with open(os.path.join(hp, f"{instant}.{action}"), "w") as f:
        json.dump(body, f)


def _hudi_base(
    root: str, part: str, fid: str, token: str, instant: str,
    ids, txts, seqno_base: int,
) -> tuple[str, int]:
    name = f"{fid}_{token}_{instant}.parquet"
    rel = f"{part}/{name}"
    lang = part.split("=", 1)[1]
    n = len(ids)
    size = _write_parquet(
        os.path.join(root, rel),
        {
            "_hoodie_commit_time": [instant] * n,
            "_hoodie_commit_seqno": [
                f"{instant}_{seqno_base}_{i}" for i in range(n)
            ],
            "_hoodie_record_key": [str(i) for i in ids],
            "_hoodie_partition_path": [part] * n,
            "_hoodie_file_name": [name] * n,
            "id": list(ids),
            "txt": list(txts),
            "lang": [lang] * n,
        },
    )
    return rel, size


FID_EN = "65e0f17a-0a1b-2c3d-4e5f-607182939aa4-0"
FID_DE = "76f10a8b-1b2c-3d4e-5f60-718293a4b5c6-0"
T1 = "20240315103000123"
T2 = "20240315104501456"
T3 = "20240315110000789"


def build_hudi_cow(root: str) -> None:
    """Hudi 0.14 CoW shape: 17-digit instants, UUID file ids, task
    write tokens, hive-style partitions, full writeStats, archived/ +
    .aux timeline residents, a foreign .clean instant."""
    hp = os.path.join(root, ".hoodie")
    os.makedirs(os.path.join(hp, "archived"), exist_ok=True)
    os.makedirs(os.path.join(hp, ".aux", ".bootstrap"), exist_ok=True)
    with open(os.path.join(hp, "hoodie.properties"), "w") as f:
        f.write(_HOODIE_PROPS.format(name="foreign_cow",
                                     ttype="COPY_ON_WRITE"))
    en0, sz_en0 = _hudi_base(
        root, "lang=en", FID_EN, "0-7-21", T1,
        [1, 2, 3], ["alpha", "bravo", "charlie"], 20,
    )
    de0, sz_de0 = _hudi_base(
        root, "lang=de", FID_DE, "0-7-22", T1,
        [4, 5], ["delta", "echo"], 21,
    )
    _hudi_commit(
        hp, T1, "commit",
        {
            "lang=en": [_hudi_write_stats(
                "lang=en", FID_EN, en0, "null", 3, sz_en0)],
            "lang=de": [_hudi_write_stats(
                "lang=de", FID_DE, de0, "null", 2, sz_de0)],
        },
        "INSERT",
    )
    # commit 2: upsert rewrites the en file group (new slice, same fid)
    en1, sz_en1 = _hudi_base(
        root, "lang=en", FID_EN, "1-12-40", T2,
        [1, 2, 3], ["ALPHA!", "bravo", "charlie"], 33,
    )
    _hudi_commit(
        hp, T2, "commit",
        {
            "lang=en": [_hudi_write_stats(
                "lang=en", FID_EN, en1, T1, 3, sz_en1, updates=1)],
        },
        "UPSERT",
    )
    # a completed clean from another action family: listed on the
    # timeline, never parsed by the reader (real .clean is Avro)
    with open(os.path.join(hp, f"{T3}.clean"), "wb") as f:
        f.write(b"Obj\x01not-json-on-purpose")
    for suffix in ("clean.requested", "clean.inflight"):
        with open(os.path.join(hp, f"{T3}.{suffix}"), "w") as f:
            f.write("{}")


def build_hudi_mor(
    root: str, with_rollover_rollback: bool = False
) -> None:
    """Hudi 0.14 MoR shape: base slice + a real HoodieLogFormat log
    (AVRO_DATA upsert with meta fields, v3 DELETE block) under a
    deltacommit, real ``.{fid}_{base}.log.1_{token}`` naming.

    ``with_rollover_rollback`` (VERDICT r10 task 4) builds the exact
    cross-file case hudi.py:827/:894 claims to handle: a FAILED T3
    upsert's AVRO_DATA block appended to ``.log.1``, then the rollback
    COMMAND_BLOCK (T4, TARGET_INSTANT_TIME=T3) written to a
    ``.log.2`` ROLLOVER file — the scanner must apply the command
    block across files or the rolled-back records resurrect. Timeline
    realism: T3 has no completed instant (its pending files were
    removed by the rollback) and T4 is a completed ``.rollback``."""
    from dataset_grouper_spark.sources import hudi_log

    hp = os.path.join(root, ".hoodie")
    os.makedirs(os.path.join(hp, "archived"), exist_ok=True)
    with open(os.path.join(hp, "hoodie.properties"), "w") as f:
        f.write(_HOODIE_PROPS.format(name="foreign_mor",
                                     ttype="MERGE_ON_READ"))
    en0, sz_en0 = _hudi_base(
        root, "lang=en", FID_EN, "0-4-11", T1,
        [1, 2, 3], ["alpha", "bravo", "charlie"], 7,
    )
    _hudi_commit(
        hp, T1, "deltacommit",
        {"lang=en": [_hudi_write_stats(
            "lang=en", FID_EN, en0, "null", 3, sz_en0)]},
        "INSERT",
    )
    schema = {
        "type": "record",
        "name": "foreign_record",
        "fields": [
            {"name": "_hoodie_commit_time", "type": ["null", "string"]},
            {"name": "_hoodie_commit_seqno", "type": ["null", "string"]},
            {"name": "_hoodie_record_key", "type": ["null", "string"]},
            {"name": "_hoodie_partition_path", "type": ["null", "string"]},
            {"name": "_hoodie_file_name", "type": ["null", "string"]},
            {"name": "id", "type": ["null", "long"]},
            {"name": "txt", "type": ["null", "string"]},
            {"name": "lang", "type": ["null", "string"]},
        ],
    }

    def rec(key, id_, txt):
        return {
            "_hoodie_commit_time": T2,
            "_hoodie_commit_seqno": f"{T2}_0_{id_}",
            "_hoodie_record_key": key,
            "_hoodie_partition_path": "lang=en",
            "_hoodie_file_name": "",
            "id": id_,
            "txt": txt,
            "lang": "en",
        }

    log_rel = f"lang=en/.{FID_EN}_{T1}.log.1_0-9-31"
    blocks = [
        hudi_log.encode_avro_data_block(
            [rec("2", 2, "BRAVO!"), rec("9", 9, "juliett")],
            schema, T2,
        ),
        hudi_log.encode_delete_block(
            [{"recordKey": "3", "partitionPath": "lang=en"}], T2
        ),
    ]
    if with_rollover_rollback:
        # a FAILED T3 upsert's leftovers in .log.1: one record that
        # corrupts an existing key, one phantom insert — both must
        # vanish once the rollover command block applies
        t3 = "20240315110000789"

        def rec3(key, id_, txt):
            r = rec(key, id_, txt)
            r["_hoodie_commit_time"] = t3
            r["_hoodie_commit_seqno"] = f"{t3}_0_{id_}"
            return r

        blocks.append(
            hudi_log.encode_avro_data_block(
                [rec3("9", 9, "SHOULD_NOT_SURVIVE"),
                 rec3("5", 5, "phantom")],
                schema, t3,
            )
        )
    hudi_log.write_log_file(os.path.join(root, log_rel), blocks)
    log_size = os.path.getsize(os.path.join(root, log_rel))
    st = _hudi_write_stats(
        "lang=en", FID_EN, log_rel, T1, 3, log_size, updates=1
    )
    st["totalLogRecords"] = 3
    st["totalLogBlocks"] = 2
    _hudi_commit(hp, T2, "deltacommit", {"lang=en": [st]}, "UPSERT")
    if with_rollover_rollback:
        # rollback COMMAND_BLOCK in a ROLLOVER file (.log.2) — the
        # cross-file application unit; plus the completed .rollback
        # timeline instant real Hudi leaves behind
        t3 = "20240315110000789"
        t4 = "20240315113000021"
        log2_rel = f"lang=en/.{FID_EN}_{T1}.log.2_0-13-47"
        hudi_log.write_log_file(
            os.path.join(root, log2_rel),
            [hudi_log.encode_rollback_block(t4, t3)],
        )
        for suffix in ("rollback.requested", "rollback.inflight"):
            with open(os.path.join(hp, f"{t4}.{suffix}"), "w") as f:
                f.write("{}")
        with open(os.path.join(hp, f"{t4}.rollback"), "w") as f:
            json.dump(
                {
                    "startRollbackTime": t4,
                    "timeTakenInMillis": 142,
                    "totalFilesDeleted": 0,
                    "commitsRollback": [t3],
                    "instantsRollback": [
                        {"commitTime": t3, "action": "deltacommit"}
                    ],
                },
                f,
            )


def build_hudi_mor_ordering(root: str) -> None:
    """Hudi MoR table with ``hoodie.table.precombine.field`` and
    OUT-OF-ORDER upserts (VERDICT r11 task 4) — the Flink/Spark-CDC
    shape where event time, not commit time, decides merge winners:

    * base T1: id 1 (evt_ts 100), id 2 (evt_ts 250), id 3 (evt_ts 50),
      id 4 (evt_ts 500);
    * ``.log.1`` at T2: upsert id 1 -> evt_ts 300 "NEWEST";
    * ``.log.2`` at T3 (LATER commit): upsert id 1 -> evt_ts 200
      "late-old" (older event time — must LOSE to the T2 row), a
      DELETE with orderingVal 150 for id 2 (below its evt_ts 250 —
      must NOT delete), a DELETE with orderingVal 400 for id 3
      (above its evt_ts 50 — deletes), a DELETE with orderingVal 0
      for id 4 (DeleteRecord's NATURAL-ORDER default: applies
      unconditionally by commit order, killing the evt_ts-500 base
      row an event-time compare would keep), then a data block
      re-upserting id 4 -> evt_ts 10 "reborn" (written AFTER the
      sentinel, so it survives — event-time competition restarts
      past a natural-order delete).

    Expected merge: {1: (300, "NEWEST"), 2: (250, "bravo"),
    4: (10, "reborn")} — a commit-time merge would wrongly yield
    id 1 = "late-old" and wrongly drop id 2; treating the sentinel
    delete as event-time 0 would wrongly resurrect id 4's base row
    (evt_ts 500)."""
    from dataset_grouper_spark.sources import hudi_log

    hp = os.path.join(root, ".hoodie")
    os.makedirs(os.path.join(hp, "archived"), exist_ok=True)
    with open(os.path.join(hp, "hoodie.properties"), "w") as f:
        f.write(
            _HOODIE_PROPS.format(name="foreign_mor_ord",
                                 ttype="MERGE_ON_READ")
            + "hoodie.table.precombine.field=evt_ts\n"
        )
    name = f"{FID_EN}_0-4-11_{T1}.parquet"
    rel = f"lang=en/{name}"
    ids, ets, txts = (
        [1, 2, 3, 4],
        [100, 250, 50, 500],
        ["alpha", "bravo", "charlie", "delta"],
    )
    size = _write_parquet(
        os.path.join(root, rel),
        {
            "_hoodie_commit_time": [T1] * 4,
            "_hoodie_commit_seqno": [f"{T1}_7_{i}" for i in range(4)],
            "_hoodie_record_key": [str(i) for i in ids],
            "_hoodie_partition_path": ["lang=en"] * 4,
            "_hoodie_file_name": [name] * 4,
            "id": ids,
            "evt_ts": ets,
            "txt": txts,
            "lang": ["en"] * 4,
        },
    )
    _hudi_commit(
        hp, T1, "deltacommit",
        {"lang=en": [_hudi_write_stats("lang=en", FID_EN, rel, "null",
                                       4, size)]},
        "INSERT",
    )
    schema = {
        "type": "record",
        "name": "foreign_record",
        "fields": [
            {"name": "_hoodie_commit_time", "type": ["null", "string"]},
            {"name": "_hoodie_commit_seqno", "type": ["null", "string"]},
            {"name": "_hoodie_record_key", "type": ["null", "string"]},
            {"name": "_hoodie_partition_path", "type": ["null", "string"]},
            {"name": "_hoodie_file_name", "type": ["null", "string"]},
            {"name": "id", "type": ["null", "long"]},
            {"name": "evt_ts", "type": ["null", "long"]},
            {"name": "txt", "type": ["null", "string"]},
            {"name": "lang", "type": ["null", "string"]},
        ],
    }

    def rec(instant, id_, evt_ts, txt):
        return {
            "_hoodie_commit_time": instant,
            "_hoodie_commit_seqno": f"{instant}_0_{id_}",
            "_hoodie_record_key": str(id_),
            "_hoodie_partition_path": "lang=en",
            "_hoodie_file_name": "",
            "id": id_,
            "evt_ts": evt_ts,
            "txt": txt,
            "lang": "en",
        }

    log1 = f"lang=en/.{FID_EN}_{T1}.log.1_0-9-31"
    hudi_log.write_log_file(
        os.path.join(root, log1),
        [hudi_log.encode_avro_data_block(
            [rec(T2, 1, 300, "NEWEST")], schema, T2)],
    )
    st1 = _hudi_write_stats(
        "lang=en", FID_EN, log1, T1, 1,
        os.path.getsize(os.path.join(root, log1)), updates=1,
    )
    st1["totalLogRecords"] = 1
    st1["totalLogBlocks"] = 1
    _hudi_commit(hp, T2, "deltacommit", {"lang=en": [st1]}, "UPSERT")
    log2 = f"lang=en/.{FID_EN}_{T1}.log.2_0-13-47"
    hudi_log.write_log_file(
        os.path.join(root, log2),
        [
            hudi_log.encode_avro_data_block(
                [rec(T3, 1, 200, "late-old")], schema, T3),
            hudi_log.encode_delete_block(
                [{"recordKey": "2", "partitionPath": "lang=en",
                  "orderingVal": 150}], T3),
            hudi_log.encode_delete_block(
                [{"recordKey": "3", "partitionPath": "lang=en",
                  "orderingVal": 400}], T3),
            hudi_log.encode_delete_block(
                [{"recordKey": "4", "partitionPath": "lang=en",
                  "orderingVal": 0}], T3),
            hudi_log.encode_avro_data_block(
                [rec(T3, 4, 10, "reborn")], schema, T3),
        ],
    )
    st2 = _hudi_write_stats(
        "lang=en", FID_EN, log2, T1, 5,
        os.path.getsize(os.path.join(root, log2)), updates=5,
    )
    st2["totalLogRecords"] = 5
    st2["totalLogBlocks"] = 5
    _hudi_commit(hp, T3, "deltacommit", {"lang=en": [st2]}, "UPSERT")


def main() -> int:
    for sub, builder in [
        ("delta", build_delta),
        ("iceberg", build_iceberg),
        ("hudi_cow", build_hudi_cow),
        ("hudi_mor", build_hudi_mor),
        ("delta_cm", build_delta_cm),
        (
            "hudi_mor_rollover",
            lambda d: build_hudi_mor(d, with_rollover_rollback=True),
        ),
        ("hudi_mor_ordering", build_hudi_mor_ordering),
    ]:
        dst = os.path.join(FIXDIR, sub)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.makedirs(dst, exist_ok=True)
        builder(dst)
        n = sum(len(fs) for _d, _s, fs in os.walk(dst))
        size = sum(
            os.path.getsize(os.path.join(d, f))
            for d, _s, fs in os.walk(dst)
            for f in fs
        )
        print(f"{sub}: {n} files, {size} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
