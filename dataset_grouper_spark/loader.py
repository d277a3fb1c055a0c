"""Group-stream loading — the reference's ``PartitionedDataset``.

Reference (data_loaders.py:31-125): glob TFRecord shards, optionally
shuffle file order with a seed, parallel-read, parse SequenceExamples,
yield a dataset-of-datasets (one inner dataset per group).

Spark design: the dataset is a Parquet layout written by
``sinks.write_partitioned`` with a ``_group_index`` sidecar. Group
listing comes from the index (no data scan); group order is shuffled by
a seeded, content-deterministic scramble (the reference's
``shuffle_files``/``shuffle_seed`` knobs, data_loaders.py:90-100);
per-group reads are partition-pruned scans (directory layout) or
group-filtered scans over group-major sorted files (bucketed layout) —
either way Spark pushes ``group_id = X`` down to the Parquet reader,
which the reference cannot do at all (it scans every shard; SURVEY §4).

Two consumption modes:
- ``group_stream()``: driver-side iterator of (group_id, pandas
  DataFrame) for sequential training loops (== build_group_stream).
- ``for_each_group()``: in-cluster per-group compute via
  ``applyInPandas`` when the consumer is itself distributed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.sinks import DATA_DIR, GROUP_INDEX_DIR


def _shuffle_rank(group_id: str, seed: int) -> str:
    """Deterministic seeded shuffle key for group ordering."""
    return hashlib.md5(f"{seed}:{group_id}".encode()).hexdigest()


class PartitionedDataset:
    """Handle to a written partitioned dataset (data_loaders.py:31-68)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.data_path = f"{path}/{DATA_DIR}"

    def dataframe(self) -> DataFrame:
        """The whole dataset as one relation."""
        return self.spark.read.parquet(self.data_path)

    def group_index(self) -> DataFrame:
        """(group_id, num_examples) from the sidecar index — no scan."""
        return self.spark.read.parquet(f"{self.path}/{GROUP_INDEX_DIR}")

    def list_groups(
        self, shuffle: bool = False, seed: int = 0
    ) -> list[str]:
        """Group ids, optionally in seeded-shuffled order (the
        shuffle_files/shuffle_seed contract, data_loaders.py:90-100)."""
        ids = [r[0] for r in self.group_index().select(keys.GROUP_COL).collect()]
        if shuffle:
            ids.sort(key=lambda g: _shuffle_rank(g, seed))
        else:
            ids.sort()
        return ids

    def group(self, group_id: str) -> DataFrame:
        """One group's rows — a pruned scan (`group_id = X` reaches the
        Parquet reader as a partition filter / pushed predicate)."""
        return self.dataframe().filter(F.col(keys.GROUP_COL) == group_id)

    def group_stream(
        self,
        shuffle: bool = False,
        seed: int = 0,
        skip: int = 0,
        take: int | None = None,
        batch_groups: int = 1,
    ) -> Iterator[list[tuple[str, pd.DataFrame]]]:
        """Stream of cohorts of (group_id, pandas DataFrame).

        == build_group_stream (data_loaders.py:70-125) plus the cohort
        batching (train_tff.py:124-126 window) and resume-by-skip
        (train_jax.py:172) the training examples layer on top.
        ``batch_groups=1`` yields singleton cohorts (plain stream).
        """
        ids = self.list_groups(shuffle=shuffle, seed=seed)
        ids = ids[skip:]
        if take is not None:
            ids = ids[:take]
        cohort: list[tuple[str, pd.DataFrame]] = []
        for gid in ids:
            cohort.append((gid, self.group(gid).drop(keys.GROUP_COL).toPandas()))
            if len(cohort) == batch_groups:
                yield cohort
                cohort = []
        if cohort:
            yield cohort

    def for_each_group(
        self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str
    ) -> DataFrame:
        """Distributed per-group compute: groupBy(group_id).applyInPandas.
        The in-cluster analogue of iterating the group stream."""
        return self.dataframe().groupBy(keys.GROUP_COL).applyInPandas(
            lambda pdf: fn(pdf), schema=schema
        )
