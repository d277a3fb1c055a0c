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
import itertools
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.sinks import BUCKET_COL, DATA_DIR, GROUP_INDEX_DIR

# sentinel distinct from None: a NULL-key group's id IS None
_NO_MORE = object()


def _shuffle_rank(group_id: str, seed: int) -> str:
    """Deterministic seeded shuffle key for group ordering."""
    return hashlib.md5(f"{seed}:{group_id}".encode()).hexdigest()


def _bucket_of(group_id: str, num_buckets: int) -> int:
    """Python twin of sinks.bucket_expr (zlib.crc32 == Spark crc32)."""
    import zlib

    return zlib.crc32(group_id.encode()) % num_buckets


class PartitionedDataset:
    """Handle to a written partitioned dataset (data_loaders.py:31-68)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.data_path = f"{path}/{DATA_DIR}"
        self._meta: tuple[str, int] | None = None
        self._df: DataFrame | None = None
        self._idx: DataFrame | None = None

    def layout(self) -> tuple[str, int]:
        """(layout, num_buckets) from the group-index sidecar."""
        if self._meta is None:
            try:
                row = self._index_df().select("layout", "num_buckets").first()
                self._meta = (row.layout, row.num_buckets)
            except Exception as exc:
                # Fall back to the legacy partitioned layout ONLY for
                # the two states that actually mean it: a pre-descriptor
                # index (columns missing) or no index at all. A
                # transient failure (object-store hiccup, listing race
                # with an index rewrite) must NOT be cached as
                # 'partitioned' — that silently disables bucket pruning
                # for the object's lifetime and leaks bucket_id into
                # group() schemas.
                msg = str(exc)
                legacy = (
                    "UNRESOLVED_COLUMN" in msg
                    or "cannot resolve" in msg.lower()
                    or "PATH_NOT_FOUND" in msg
                    or "Path does not exist" in msg
                    or "Unable to infer schema" in msg
                )
                if not legacy:
                    self._idx = None  # drop the possibly-poisoned reader
                    raise
                self._meta = ("partitioned", 0)
        return self._meta

    def _index_df(self) -> DataFrame:
        if self._idx is None:
            self._idx = self.spark.read.parquet(
                f"{self.path}/{GROUP_INDEX_DIR}"
            ).withColumn(keys.GROUP_COL, F.col(keys.GROUP_COL).cast("string"))
        return self._idx

    def dataframe(self) -> DataFrame:
        """The whole dataset as one relation (reader reused — repeated
        per-group reads must not re-list the dataset every call).

        group_id is normalized back to string: parquet partition-column
        type inference would otherwise turn numeric-looking group
        directories into ints."""
        if self._df is None:
            self._df = self.spark.read.parquet(self.data_path).withColumn(
                keys.GROUP_COL, F.col(keys.GROUP_COL).cast("string")
            )
        return self._df

    def group_index(self) -> DataFrame:
        """(group_id, num_examples) from the sidecar index — no scan."""
        return self._index_df().select(keys.GROUP_COL, "num_examples")

    def list_groups(
        self, shuffle: bool = False, seed: int = 0
    ) -> list[str]:
        """Group ids, optionally in seeded-shuffled order (the
        shuffle_files/shuffle_seed contract, data_loaders.py:90-100)."""
        ids = [r[0] for r in self.group_index().select(keys.GROUP_COL).collect()]
        # a NULL group key (keyer over a NULL feature) is a real group:
        # sort it last instead of crashing the str comparison
        if shuffle:
            ids.sort(key=lambda g: _shuffle_rank(g, seed))
        else:
            ids.sort(key=lambda g: (g is None, g))
        return ids

    def group(self, group_id: str) -> DataFrame:
        """One group's rows — a pruned scan.

        Directory layout: `group_id = X` is a partition filter (reads
        exactly one directory). Bucketed layout: the bucket is
        recomputed from the group id, pruning to one bucket directory,
        then parquet row-group stats on the sorted group_id skip to the
        group's contiguous run. Either way the scan volume is bounded
        by the group, not the dataset."""
        df = self.dataframe()
        layout, num_buckets = self.layout()
        if group_id is None:
            # NULL-key group: equality would match nothing; bucket
            # pruning is unavailable (crc32 of NULL is NULL) so filter
            # by IS NULL across buckets
            if BUCKET_COL in df.columns:
                df = df.drop(BUCKET_COL)
            return df.filter(F.col(keys.GROUP_COL).isNull())
        if layout == "bucketed" and num_buckets > 0:
            df = df.filter(
                F.col(BUCKET_COL) == _bucket_of(group_id, num_buckets)
            ).drop(BUCKET_COL)
        return df.filter(F.col(keys.GROUP_COL) == group_id)

    def group_stream(
        self,
        shuffle: bool = False,
        seed: int = 0,
        skip: int = 0,
        take: int | None = None,
        batch_groups: int = 1,
        columns: list[str] | None = None,
        prefetch: int = 0,
    ) -> Iterator[list[tuple[str, pd.DataFrame]]]:
        """Stream of cohorts of (group_id, pandas DataFrame).

        == build_group_stream (data_loaders.py:70-125) plus the cohort
        batching (train_tff.py:124-126 window) and resume-by-skip
        (train_jax.py:172) the training examples layer on top.
        ``batch_groups=1`` yields singleton cohorts (plain stream).
        ``columns`` projects the per-group frames — the projection
        reaches the Parquet scan, so consumers that only need metadata
        never pay for the wide columns.

        ``prefetch`` overlaps the next N groups' pruned reads with the
        consumer's work (the reference's ``num_parallel_reads``
        interleave, data_loaders.py:86-121, re-expressed as pipelined
        Spark jobs: submission is thread-safe, each fetch is its own
        job). Yield ORDER IS UNCHANGED — futures resolve in submission
        order — so shuffle/seed/skip determinism and the value oracle
        hold for every prefetch setting. A training loop spending t_c
        per group on model work hides min(t_read, t_c) per group.
        """
        ids = self.list_groups(shuffle=shuffle, seed=seed)
        ids = ids[skip:]
        if take is not None:
            ids = ids[:take]

        def fetch(gid: str | None) -> tuple[str | None, pd.DataFrame]:
            g = self.group(gid).drop(keys.GROUP_COL, BUCKET_COL)
            if columns is not None:
                g = g.select(*columns)
            return gid, g.toPandas()

        cohort: list[tuple[str, pd.DataFrame]] = []
        if prefetch > 0:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            it = iter(ids)
            with ThreadPoolExecutor(max_workers=prefetch) as ex:
                pending = deque(
                    ex.submit(fetch, gid)
                    for gid in itertools.islice(it, prefetch)
                )
                while pending:
                    got = pending.popleft().result()
                    nxt = next(it, _NO_MORE)
                    if nxt is not _NO_MORE:
                        pending.append(ex.submit(fetch, nxt))
                    cohort.append(got)
                    if len(cohort) == batch_groups:
                        yield cohort
                        cohort = []
        else:
            for gid in ids:
                cohort.append(fetch(gid))
                if len(cohort) == batch_groups:
                    yield cohort
                    cohort = []
        if cohort:
            yield cohort

    def iter_groups_bulk(
        self,
        order_col: str | None = None,
        chunk_rows: int = 65536,
        spill_dir: str | None = None,
        columns: list[str] | None = None,
    ) -> Iterator[tuple[str, pd.DataFrame]]:
        """Stream EVERY group in one Spark job (group-major order).

        ``group_stream`` launches one pruned read per group — right for
        sampling a few groups; wrong for a full epoch over millions of
        them. This is the reference's sequential group stream
        (data_loaders.py:123-125) at one-full-scan cost.

        Two-stage transport (VERDICT r1 #8): one fully-parallel Spark
        job re-arranges the data group-major (hash partition on the key,
        sort within partitions) and spills it to a local parquet staging
        dir; the driver then streams that staging dir with
        ``pyarrow.dataset`` at disk speed. This beats a
        ``toLocalIterator`` pull, which walks post-shuffle partitions
        nearly serially (one shuffle-read + worker launch per
        partition on the critical path). Group boundaries are cut on
        dictionary-encoded key codes (vectorized), groups are sliced
        from each record batch zero-copy, and only the final per-group
        ``to_pandas`` materializes. Each group lives wholly in one
        staging file (one shuffle partition -> one writer task), so a
        group larger than ``chunk_rows`` spans consecutive batches of
        the same file and is reassembled by boundary merge — no single
        JVM cell ever holds a whole giant group. Group order is
        deterministic per layout but not globally sorted; use
        group_stream() when order matters.

        ``spill_dir`` must be reachable by BOTH executors and driver:
        any local path works on local[*]; on a multi-node cluster pass
        a shared-filesystem mount (the staging format is plain parquet,
        so an object-store path works wherever pyarrow can read it).

        ``columns`` projects the per-group frames — the projection
        reaches the SOURCE parquet scan (and shrinks the staging
        spill), so a metadata-only epoch never shuffles or spills the
        wide payload columns (same contract as ``group_stream``).
        """
        import glob
        import shutil
        import tempfile

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        df = self.dataframe()
        if BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        if columns is not None:
            keep = list(
                dict.fromkeys(
                    [keys.GROUP_COL, *columns]
                    + ([order_col] if order_col else [])
                )
            )
            df = df.select(*keep)
        sort_cols = [keys.GROUP_COL] + ([order_col] if order_col else [])
        arranged = df.repartition(keys.GROUP_COL).sortWithinPartitions(*sort_cols)

        own_spill = spill_dir is None
        spill = spill_dir or tempfile.mkdtemp(prefix="dg_bulk_")
        try:
            arranged.write.mode("overwrite").parquet(spill)
            # Sorted paths preserve writer-task order; rolled files within
            # a task (c000, c001, ...) also sort in write order.
            files = sorted(glob.glob(f"{spill}/part-*.parquet"))

            # sentinel object, NOT None: a NULL-key group's id IS None
            # and must not collide with "no group pending yet"
            _unset = object()
            pending_gid: object = _unset
            pending: list[pa.Table] = []

            def finish() -> pd.DataFrame:
                merged = (
                    pa.concat_tables(pending) if len(pending) > 1 else pending[0]
                )
                return merged.to_pandas()

            # One fragment at a time, threads off: batch order must
            # follow file order or contiguity (and the merge) breaks.
            def batches():
                for f in files:
                    frag_scan = pads.dataset(f, format="parquet").scanner(
                        batch_size=chunk_rows, use_threads=False
                    )
                    yield from frag_scan.to_batches()

            for batch in batches():
                if batch.num_rows == 0:
                    continue
                tbl = pa.Table.from_batches([batch])
                gid_idx = tbl.schema.get_field_index(keys.GROUP_COL)
                gid_arr = tbl.column(gid_idx).chunk(0)
                # fill nulls before encoding: null dictionary indices
                # can't round-trip through numpy for the boundary diff
                codes = pc.dictionary_encode(
                    pc.fill_null(gid_arr, "\x00<null-group>")
                ).indices.to_numpy()
                data = tbl.remove_column(gid_idx)
                cuts = np.flatnonzero(codes[1:] != codes[:-1]) + 1
                bounds = [0, *cuts.tolist(), tbl.num_rows]
                for s, e in zip(bounds[:-1], bounds[1:]):
                    gid = gid_arr[s].as_py()
                    part = data.slice(s, e - s)
                    if pending_gid is not _unset and gid == pending_gid:
                        pending.append(part)
                        continue
                    if pending_gid is not _unset:
                        yield pending_gid, finish()
                    pending_gid, pending = gid, [part]
            if pending_gid is not _unset:
                yield pending_gid, finish()
        finally:
            if own_spill:
                shutil.rmtree(spill, ignore_errors=True)

    def for_each_group(
        self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str
    ) -> DataFrame:
        """Distributed per-group compute: groupBy(group_id).applyInPandas.
        The in-cluster analogue of iterating the group stream."""
        df = self.dataframe()
        if BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        return df.groupBy(keys.GROUP_COL).applyInPandas(
            lambda pdf: fn(pdf), schema=schema
        )
