"""WebDataset tar shards: the de-facto exchange format for multimodal
training data, as a distributed Spark sink + source.

Format (public spec — webdataset/webdataset, and Aizman et al. 2019,
"High Performance I/O For Large-Scale Deep Learning"): a dataset is a
set of plain POSIX tar files ("shards"); a training sample is the
group of consecutive tar members sharing one basename key, with the
extension naming the modality (``0017.txt`` + ``0017.json`` +
``0017.jpg`` are one sample). Nothing about the container is exotic —
which is the point: shards stream sequentially from object stores at
wire speed and any tar tool can inspect them.

Spark mapping, both directions shaped for the 100 TB case:

- **write**: the shard is the unit of parallelism. Rows get a
  deterministic shard id (``xxhash64(key) mod n_shards`` — stable
  across runs and engines, no round-robin nondeterminism), co-locate
  with ONE hash shuffle (``repartition(n, _shard)``), and each shard
  is emitted by one ``applyInPandas`` group as a single tar written
  through compat/fs (executor-side, URI-routed — same idiom as the
  TFRecord sharded sink, compat/tfrecord.py). Members are sorted by
  key within the shard (WebDataset wants contiguous samples) and all
  tar metadata is pinned (mtime=0, uid/gid=0, USTAR) so shard bytes
  are REPRODUCIBLE — byte-identical re-runs, diffable fixtures.
- **read**: one task per shard (the file list parallelizes, not the
  bytes); each task STREAMS its tar (``tarfile`` mode ``r|`` over a
  compat/fs reader — members decode as they arrive, the shard is
  never materialized whole) and yields Arrow batches of
  ``(key, ext, data, shard)``. ``webdataset_samples`` regroups the
  long form into one row per sample with a binary column per
  extension — a single pivot-by-first aggregation.

The reference ships training groups as TFRecord shards
(dataset_grouper/tfds_pipelines.py:67-76); WebDataset is the
equivalent interchange surface for the tar-based loader ecosystem
and part of the beyond-reference multimodal tier.
"""

from __future__ import annotations

import gzip
import io
import json
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark.localrel import local_frame

from dataset_grouper_spark.compat import fs

__all__ = ["write_webdataset", "read_webdataset", "webdataset_samples"]


def _member_bytes(value, ext: str) -> bytes:
    """Encode one cell for its tar member: bytes pass through, text is
    utf-8, everything else (``.json``/``.cls``/metadata exts) is
    canonical JSON (sorted keys — reproducibility again)."""
    if value is None:
        return b""
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    if isinstance(value, str):
        return value.encode("utf-8")
    return json.dumps(value, sort_keys=True, default=str).encode("utf-8")


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    columns: dict,
    num_shards: int = 8,
    prefix: str = "shard",
    compression: str = "none",
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``path``.

    ``columns`` maps dataframe column -> member extension, e.g.
    ``{"text": "txt", "meta": "json"}``; each row becomes one sample
    (``{key}.{ext}`` per column, NULL cells skipped — WebDataset
    samples may have missing modalities). Returns the shard manifest
    ``(shard, path, n_samples, n_bytes)`` — an action has NOT run yet;
    collecting/writing the manifest is what executes the job.

    ``compression='gzip'`` emits ``.tar.gz`` shards (the common
    shipping form); the gzip stream is built with ``mtime=0`` so
    compressed shards stay byte-reproducible like the plain ones.

    Keys must be unique (two rows with one key would interleave into a
    malformed sample); enforced per shard with a cheap duplicate check
    that raises rather than corrupting the archive.
    """
    if not columns:
        raise ValueError("columns mapping must not be empty")
    if compression not in ("none", "gzip"):
        raise ValueError(f"unsupported compression: {compression!r}")
    suffix = ".tar.gz" if compression == "gzip" else ".tar"
    fs.makedirs(path)
    cols = dict(columns)
    key = key_col
    sel = df.select(
        F.col(key).cast("string").alias("_key"),
        F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(num_shards))
        .cast("int")
        .alias("_shard"),
        *[F.col(c) for c in cols],
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("_key", kind="mergesort")
        if pdf["_key"].duplicated().any():
            dup = pdf["_key"][pdf["_key"].duplicated()].iloc[0]
            raise ValueError(
                f"webdataset: duplicate sample key {dup!r} in shard "
                f"{shard}; keys must be unique"
            )
        dotted = pdf["_key"].str.contains(".", regex=False)
        if dotted.any():
            bad = pdf["_key"][dotted].iloc[0]
            raise ValueError(
                f"webdataset: sample key {bad!r} contains '.' — the "
                "spec splits member names at the FIRST dot, so a "
                "dotted key would shear the sample on read"
            )
        dst = f"{path.rstrip('/')}/{prefix}-{shard:06d}{suffix}"
        buf = io.BytesIO()
        sample_keys = pdf["_key"].tolist()
        col_values = {c: pdf[c].tolist() for c in cols}
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for i, skey in enumerate(sample_keys):
                for col, ext in cols.items():
                    value = col_values[col][i]
                    if value is None or (
                        isinstance(value, float) and pd.isna(value)
                    ):
                        continue
                    data = _member_bytes(value, ext)
                    info = tarfile.TarInfo(name=f"{skey}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
        raw = buf.getvalue()
        if compression == "gzip":
            zbuf = io.BytesIO()
            with gzip.GzipFile(
                fileobj=zbuf, mode="wb", mtime=0
            ) as gz:
                gz.write(raw)
            raw = zbuf.getvalue()
        with fs.open_write(dst) as out:
            out.write(raw)
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [dst],
                "n_samples": [len(pdf)],
                "n_bytes": [len(raw)],
            }
        )

    return (
        sel.groupBy("_shard")  # the applyInPandas shuffle IS the
        # shard co-location — one hash exchange on _shard, no extra
        # repartition pass
        .applyInPandas(
            write_shard,
            schema="shard int, path string, n_samples bigint, n_bytes bigint",
        )
    )


def read_webdataset(
    spark: SparkSession, path: str, pattern: str = None
) -> DataFrame:
    """Read WebDataset shards into long form ``(key, ext, data, shard)``.

    The driver lists shard files (a metadata touch); tasks stream one
    tar each — ``tarfile`` mode ``r|*`` over the compat/fs reader
    (compression auto-detected from the stream), so a 1 GB shard costs
    a task its streaming buffer, not 1 GB of memory.
    """
    files = sorted(
        f
        for f in fs.listdir(path)
        if (
            _glob_match(f, pattern)
            if pattern
            else (f.endswith(".tar") or f.endswith(".tar.gz"))
        )
    )
    paths = [f"{path.rstrip('/')}/{name}" for name in files]
    if not paths:
        return spark.createDataFrame(
            [], "key string, ext string, data binary, shard string"
        )
    files_df = local_frame(spark, 
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))

    def decode(it):
        for pdf in it:
            for shard_path in pdf["path"]:
                keys, exts, datas = [], [], []
                shard_name = shard_path.rsplit("/", 1)[-1]
                with fs.open_read(shard_path) as raw:
                    with tarfile.open(fileobj=raw, mode="r|*") as tar:
                        for member in tar:
                            if not member.isfile():
                                continue
                            name = member.name
                            # spec keying: split the BASENAME at its
                            # FIRST dot — '0017.seg.png' is sample
                            # '0017' with extension 'seg.png' (a
                            # last-dot split would shear one sample
                            # of a foreign shard into two)
                            dirname, _, fname = name.rpartition("/")
                            base, dot, ext = fname.partition(".")
                            key = (
                                f"{dirname}/{base}" if dirname else base
                            )
                            keys.append(key)
                            exts.append(ext if dot else "")
                            datas.append(tar.extractfile(member).read())
                yield pd.DataFrame(
                    {
                        "key": keys,
                        "ext": exts,
                        "data": datas,
                        "shard": [shard_name] * len(keys),
                    }
                )

    return files_df.mapInPandas(
        decode, schema="key string, ext string, data binary, shard string"
    )


def webdataset_samples(long_df: DataFrame, extensions: list) -> DataFrame:
    """Regroup long-form member rows into one row per sample: ``key``
    plus one binary column per extension (missing modality -> NULL).
    One pivot aggregation — the grouping key is the sample key, so a
    100 TB read shuffles each member once."""
    aggs = [
        F.first(
            F.when(F.col("ext") == ext, F.col("data")), ignorenulls=True
        ).alias(ext)
        for ext in extensions
    ]
    return long_df.groupBy("key").agg(*aggs)


def _glob_match(name: str, pattern: str) -> bool:
    from fnmatch import fnmatch

    return fnmatch(name, pattern)
