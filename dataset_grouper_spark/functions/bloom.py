"""Fixed-memory Bloom filter, distributed: build / probe / dedup screen.

:func:`fingerprint_screen_against` (operators/dedup.py) already gives
ingest dedup a broadcast pre-join — but its broadcast grows 8 bytes per
DISTINCT corpus key, so a 10-billion-document corpus needs an 80 GB
broadcast and the screen degrades to shuffle joins. The Bloom filter
(Bloom 1970) is the fixed-memory form of the same idea: ``m`` bits and
``k`` hash probes answer "possibly seen" / "DEFINITELY not seen"
regardless of corpus cardinality — ~1.2 bytes per key at 1% false-
positive rate, 7x denser than the fingerprint set, and the budget is a
hard cap you choose, not a function of the data. False positives only
cost an extra exact check; false negatives are impossible, which is
the property the dedup screen's correctness rests on.

Everything here is engine-honest Spark:

- **build** is one scan: each input partition folds its keys into a
  local ``m``-bit numpy bitset inside ``mapInPandas`` (Arrow batches,
  zero Python-per-row cost), emitting ONE ``m/8``-byte row per
  partition. Bitsets merge by bitwise OR — associative and lossless,
  the same property that lets HLL registers union — so wide scans
  tree-merge: partition bitsets above ``merge_fanin`` are round-robin
  repartitioned (tiny rows, one bitset each) and OR-folded in a second
  ``mapInPandas`` stage before the driver ORs the survivors. Driver
  memory is ``merge_fanin x m/8`` bytes, never ``n_partitions x m/8``.
- **hashing** stays JVM-side: two independent ``xxhash64`` columns are
  computed by Catalyst, and the ``k`` probe positions derive from them
  by Kirsch-Mitzenmacher double hashing (``h1 + i*h2 mod m``, 2006) —
  k probes for the price of two real hashes, identical math in the
  build and probe paths by construction.
- **probe** broadcasts the bitset once per executor
  (``SparkContext.broadcast``) and tests membership in a vectorized
  ``pandas_udf`` over the two hash columns — no shuffle, no join: the
  100 TB new-batch side streams through map tasks untouched.

Reference analogue: the reference pipeline has no membership sketch at
all (dataset_grouper/ keeps exact per-key state); this is part of the
beyond-reference LLM-pipeline tier alongside CMS/HLL/KMV
(functions/sketches.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bloom_build",
    "bloom_might_contain",
    "bloom_screen_against",
    "bloom_false_positive_rate",
]

_H2_SEED_COL = "__bloom_h2_seed"


def _hash_cols(col: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hashes of ``col``, computed JVM-side.

    ``xxhash64`` over (value) and over (seed-marker, value): Spark's
    multi-arg xxhash64 chains arguments through the hash state, so the
    extra literal yields an independent second stream without any
    Python-side hashing of the content itself.
    """
    return (
        F.xxhash64(col),
        F.xxhash64(F.lit(_H2_SEED_COL), col),
    )


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, mask: int) -> list:
    """Kirsch-Mitzenmacher probe positions: (h1 + i*h2) & (m-1).

    Returns k arrays of bit positions (uint64). ``h2 | 1`` keeps the
    stride odd so a zero/even h2 cannot collapse all k probes onto one
    position (m is a power of two).
    """
    u1 = h1.astype(np.int64).view(np.uint64)
    u2 = h2.astype(np.int64).view(np.uint64) | np.uint64(1)
    return [
        (u1 + np.uint64(i) * u2) & np.uint64(mask) for i in range(k)
    ]


def _fold_into(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray,
               k: int, mask: int) -> None:
    for pos in _positions(h1, h2, k, mask):
        np.bitwise_or.at(
            bits, (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
        )


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    merge_fanin: int = 16,
) -> bytes:
    """Scan ``df[col]`` once and return the ``num_bits``-bit filter.

    ``num_bits`` must be a power of two (the probe math masks rather
    than mods). Partition-local bitsets OR-merge through a bounded
    tree: at most ``merge_fanin`` bitsets ever reach the driver, so
    driver memory is ``merge_fanin * num_bits/8`` bytes no matter how
    many thousands of scan partitions a 100 TB corpus produces.
    """
    if num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two, got {num_bits}")
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    mask = num_bits - 1
    nbytes = num_bits >> 3
    h1, h2 = _hash_cols(F.col(col))
    hashes = df.select(h1.alias("_h1"), h2.alias("_h2"))

    def or_fold(it):
        bits = np.zeros(nbytes, dtype=np.uint8)
        for pdf in it:
            _fold_into(
                bits, pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(),
                num_hashes, mask,
            )
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    bitsets = hashes.mapInPandas(or_fold, schema="bits binary")

    def or_merge(it):
        acc = np.zeros(nbytes, dtype=np.uint8)
        for pdf in it:
            for b in pdf["bits"]:
                np.bitwise_or(
                    acc, np.frombuffer(b, dtype=np.uint8), out=acc
                )
        yield pd.DataFrame({"bits": [acc.tobytes()]})

    if hashes.rdd.getNumPartitions() > merge_fanin:
        # tree level: shuffle the tiny one-row bitsets (not the data)
        # into merge_fanin groups and OR each group in one task.
        bitsets = bitsets.repartition(merge_fanin).mapInPandas(
            or_merge, schema="bits binary"
        )
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in bitsets.collect():  # bounded: <= merge_fanin rows
        np.bitwise_or(acc, np.frombuffer(row.bits, dtype=np.uint8), out=acc)
    return acc.tobytes()


def bloom_might_contain(
    df: DataFrame,
    col: str,
    bits: bytes,
    num_hashes: int = 5,
    result_col: str = "_might_contain",
) -> DataFrame:
    """Tag each row with a boolean: possibly in the filter / definitely
    not. The bitset ships once per executor as a Spark broadcast; the
    membership test is a vectorized numpy pandas_udf over the two
    JVM-computed hash columns — the probe side never shuffles.
    """
    num_bits = len(bits) << 3
    if num_bits & (num_bits - 1):
        raise ValueError("bits length must be a power-of-two bit count")
    mask = num_bits - 1
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bits)
    k = num_hashes

    @F.pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        hit = np.ones(len(h1), dtype=bool)
        for pos in _positions(h1.to_numpy(), h2.to_numpy(), k, mask):
            byte = arr[(pos >> np.uint64(3)).astype(np.int64)]
            bit = (pos & np.uint64(7)).astype(np.uint8)
            hit &= (byte >> bit) & np.uint8(1) > 0
        return pd.Series(hit)

    h1, h2 = _hash_cols(F.col(col))
    return df.withColumn(result_col, _probe(h1, h2))


def bloom_screen_against(
    new: DataFrame,
    existing: DataFrame,
    content_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Incremental exact dedup behind a fixed-memory Bloom screen.

    Output is ROW-IDENTICAL to ``exact_dedup_against(new, existing,
    content_col)`` — the screen is a plan optimization, never a
    semantics change: rows whose content misses the filter are
    DEFINITELY new (no false negatives) and bypass the corpus join
    entirely; only filter hits (true dups + the ~1% false positives)
    pay the exact 128-bit anti join, with the corpus side reduced to
    distinct hashes as in the unscreened operator.

    Scale shape vs fingerprint_screen_against: that screen's broadcast
    grows with corpus cardinality and falls back to shuffle joins past
    its cap; this one's memory is fixed at ``num_bits/8`` bytes chosen
    up front, so the no-shuffle fast path survives ANY corpus size —
    the build costs the corpus one scan + a tree of one-row bitset
    merges, and at ingest (|new| << |corpus|) the exact join's left
    side shrinks to the hit fraction of the batch.
    """
    from dataset_grouper_spark.operators.dedup import exact_dedup_against

    bits = bloom_build(existing, content_col, num_bits, num_hashes)
    tagged = bloom_might_contain(
        new, content_col, bits, num_hashes, "_bloom_hit"
    )
    fresh = tagged.filter(~F.col("_bloom_hit")).drop("_bloom_hit")
    maybe = tagged.filter(F.col("_bloom_hit")).drop("_bloom_hit")
    return fresh.unionByName(
        exact_dedup_against(maybe, existing, content_col)
    )


def bloom_false_positive_rate(
    n_items: int, num_bits: int, num_hashes: int
) -> float:
    """Classic FPR bound (1 - e^{-kn/m})^k — sizing helper for tests
    and capacity planning (Bloom 1970; Broder & Mitzenmacher 2004)."""
    if n_items <= 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_items / num_bits)) ** num_hashes
