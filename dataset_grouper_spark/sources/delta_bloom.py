"""Per-file Bloom point-lookup index for Delta tables.

Stats-envelope skipping (``read_delta(skip_filters=...)``) prunes
range predicates, but a point lookup on a high-cardinality column
(``WHERE doc_id = k``, ``WHERE url = ...``) gets almost nothing from
[min, max] envelopes unless the layout is sorted by that column. The
classic answer — Delta Lake ships it as the "Bloom filter index" —
is one Bloom filter PER DATA FILE on the lookup column: at plan time
a miss PROVES the file holds no matching row (no false negatives),
so an unsorted 100 TB table answers a needle query by opening only
the handful of false-positive files plus the true hits.

Mechanics, all on the engine's existing primitives:

- **build** (:func:`delta_build_bloom_index`) is ONE distributed scan
  of the live files: Catalyst computes the two xxhash64 streams
  (functions/bloom.py's JVM-side double hashing), one
  ``applyInPandas`` group per file folds its bitset and writes the
  sidecar through compat/fs — executor-side, object-store-safe, no
  driver loop. Sidecars live under ``<table>/_bloom_index/`` keyed by
  data-file basename; the format is this engine's own (a JSON header
  + the raw bitset — stated plainly: the index is an engine sidecar,
  not part of the Delta protocol, exactly like the reference
  engine's group-index sidecars).
- **plan** (:func:`delta_bloom_prune`) hashes the probe value once
  (a one-row Catalyst job, so build and probe share hash math by
  construction) and tests each candidate file's bitset at
  planning scale. Files without a sidecar are KEPT — the index is
  advisory, so appends after an index build degrade to unpruned,
  never to wrong.
- **read** integration: ``read_delta(..., bloom_point=(col, v))``
  prunes the live add set through the index before the scan plans.

Honest edges: a file's bitset covers the RAW parquet contents, so
rows masked by a deletion vector still count — a pure false-positive
effect (the file is kept, the row filter drops them). Partition
columns live outside the data files (use partition pruning for
those); column-mapped tables are gated until the physical-name probe
is wired.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark.compat import fs as _fs
from dataset_grouper_spark.functions.bloom import _hash_cols, _positions

MAGIC = b"DGBF"
_ALGO = "xxhash64-km"

__all__ = [
    "delta_build_bloom_index",
    "delta_bloom_prune",
    "bloom_sidecar_path",
]


def bloom_sidecar_path(table_path: str, rel_path: str) -> str:
    return os.path.join(
        table_path, "_bloom_index", os.path.basename(rel_path) + ".bloom"
    )


def _write_sidecar(path: str, header: dict, bits: bytes) -> None:
    payload = json.dumps(header, sort_keys=True).encode("utf-8")
    with _fs.open_write(path) as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)
        f.write(bits)


def _read_sidecar(path: str) -> tuple[dict, bytes]:
    data = _fs.read_bytes(path)
    if data[:4] != MAGIC:
        raise ValueError(f"not a bloom sidecar: {path}")
    (hlen,) = struct.unpack_from("<I", data, 4)
    header = json.loads(data[8 : 8 + hlen].decode("utf-8"))
    return header, data[8 + hlen :]


def delta_build_bloom_index(
    spark: SparkSession,
    table_path: str,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    version: int | None = None,
) -> list[tuple[str, int]]:
    """Build/refresh the per-file Bloom index on ``col`` for every
    live file of the snapshot. Returns ``(data file, cardinality-ish
    bit count)`` per sidecar written. O(one scan of the table), fully
    distributed; re-running after appends only rewrites sidecars for
    files it scans (all live ones — the simple, idempotent contract).
    """
    from dataset_grouper_spark.sources.delta import (
        _latest_version,
        _physical_names,
        _replay,
        _table_abs,
    )

    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    if version is None:
        version = _latest_version(table_path)
        if version is None:
            raise FileNotFoundError(f"empty Delta log: {table_path}")
    adds, meta = _replay(spark, table_path, version)
    part_cols = list(meta.get("partitionColumns") or [])
    if col in part_cols:
        raise ValueError(
            f"delta_build_bloom_index: {col!r} is a partition column — "
            "partition pruning already answers point lookups on it"
        )
    phys = _physical_names(meta)
    if phys.get(col, col) != col:
        raise NotImplementedError(
            "delta_build_bloom_index: column-mapped tables not wired"
        )
    if col not in {
        f["name"]
        for f in json.loads(meta["schemaString"])["fields"]
    }:
        raise ValueError(f"delta_build_bloom_index: no column {col!r}")
    table_abs = _table_abs(table_path)
    by_base = {
        os.path.basename(rel): rel for rel in adds
    }
    if len(by_base) != len(adds):
        raise ValueError(
            "delta_build_bloom_index: data-file basenames collide"
        )
    paths = [os.path.join(table_abs, rel) for rel in adds]
    if not paths:
        return []
    _fs.makedirs(os.path.join(table_path, "_bloom_index"))
    h1, h2 = _hash_cols(F.col(col))
    hashed = (
        spark.read.parquet(*paths)
        .select(
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("_base"),
            h1.alias("_h1"),
            h2.alias("_h2"),
        )
    )
    mask = num_bits - 1
    nbytes = num_bits >> 3
    k = num_hashes
    idx_dir = os.path.join(table_path, "_bloom_index")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        base = pdf["_base"].iloc[0]
        bits = np.zeros(nbytes, dtype=np.uint8)
        for pos in _positions(
            pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), k, mask
        ):
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).astype(np.int64),
                np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8),
            )
        header = {
            "column": col,
            "num_bits": num_bits,
            "num_hashes": k,
            "algo": _ALGO,
            "data_file": base,
        }
        _write_sidecar(
            os.path.join(idx_dir, base + ".bloom"), header, bits.tobytes()
        )
        return pd.DataFrame(
            {"data_file": [base], "set_bits": [int(np.unpackbits(bits).sum())]}
        )

    rows = (
        hashed.groupBy("_base")
        .applyInPandas(fold, schema="data_file string, set_bits long")
        .collect()  # bounded: one row per live file (planning scale)
    )
    return [(r.data_file, r.set_bits) for r in rows]


def _probe_hashes(
    spark: SparkSession, value, probe_type: str | None
) -> tuple[int, int]:
    """Hash the probe value with the SAME Catalyst expressions the
    build used (one-row job — planning cost). ``probe_type`` (the
    indexed column's Spark type) matters for correctness: xxhash64 is
    TYPE-SENSITIVE (hashing 3 as int and as bigint differ), so the
    literal must be cast to the column's exact type or every probe
    would miss — a false negative, the one failure mode a Bloom index
    must never have."""
    lit = F.lit(value)
    if probe_type is not None:
        lit = lit.cast(probe_type)
    h1, h2 = _hash_cols(lit)
    row = spark.range(1).select(h1.alias("a"), h2.alias("b")).first()
    return row.a, row.b


def delta_bloom_prune(
    spark: SparkSession,
    table_path: str,
    adds: dict,
    col: str,
    value,
    probe_type: str | None = None,
) -> dict:
    """Prune a live ``adds`` map through the sidecar index: a file
    whose bitset misses the value CANNOT hold it (no false
    negatives); files without a sidecar (or indexed on another
    column / different params) are kept conservatively. Pass
    ``probe_type`` (the column's Spark type) whenever the Python
    literal's default Spark type could differ from the column's —
    ``read_delta`` passes it from the table schema automatically."""
    h1, h2 = _probe_hashes(spark, value, probe_type)
    a1 = np.array([h1], dtype=np.int64)
    a2 = np.array([h2], dtype=np.int64)
    kept = {}
    for rel, a in adds.items():
        side = bloom_sidecar_path(table_path, rel)
        try:
            header, bits = _read_sidecar(side)
        except (FileNotFoundError, ValueError):
            kept[rel] = a
            continue
        if (
            header.get("column") != col
            or header.get("algo") != _ALGO
            or header.get("num_bits", 0) & (header.get("num_bits", 1) - 1)
        ):
            kept[rel] = a
            continue
        arr = np.frombuffer(bits, dtype=np.uint8)
        mask = header["num_bits"] - 1
        hit = True
        for pos in _positions(a1, a2, header["num_hashes"], mask):
            byte = arr[int(pos[0]) >> 3]
            if not (byte >> (int(pos[0]) & 7)) & 1:
                hit = False
                break
        if hit:
            kept[rel] = a
    return kept
