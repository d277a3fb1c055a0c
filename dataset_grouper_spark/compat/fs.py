"""Minimal filesystem abstraction for executor-side shard IO.

The TFRecord compat sink/source write whole files from executor tasks
(one shard per task) — a pattern Spark's own writers don't cover. Plain
``open()`` only works when every executor shares one POSIX namespace;
this module routes any URI through ``pyarrow.fs`` instead, which
resolves ``file://``, ``s3://``, ``gs://``, ``hdfs://`` (and anything
else Arrow registers) uniformly ON THE EXECUTORS — no JVM gateway
needed from Python workers, which is why the Hadoop FileSystem via
py4j is NOT an option here (py4j exists only on the driver).

Scheme-less paths take a zero-dependency local ``open()`` fast path.
The reference writes through Beam's FileSystems abstraction
(reference: dataset_grouper/tfds_pipelines.py:67-76); this is the
Spark-executor equivalent.
"""

from __future__ import annotations

import os
import re
from typing import IO
from urllib.parse import urlparse

_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def _split(path: str):
    """Return (pyarrow_fs | None, resolved_path). None fs = use builtin
    ``open`` (scheme-less local path). Only a real ``scheme://`` prefix
    routes to pyarrow: urlparse would call 'run:1/shard.tfrecord' a
    URI with scheme 'run' and crash FileSystem.from_uri on a perfectly
    valid relative local path (colons in path segments are legal)."""
    if not _URI_RE.match(path):
        return None, path
    import pyarrow.fs as pafs

    fs, p = pafs.FileSystem.from_uri(path)
    return fs, p


def open_write(path: str) -> IO[bytes]:
    fs, p = _split(path)
    if fs is None:
        return open(p, "wb")
    return fs.open_output_stream(p)


def open_read(path: str) -> IO[bytes]:
    fs, p = _split(path)
    if fs is None:
        return open(p, "rb")
    return fs.open_input_stream(p)


def makedirs(path: str) -> None:
    """Create a directory (and parents); no-op if it exists."""
    fs, p = _split(path)
    if not p:
        return
    if fs is None:
        os.makedirs(p, exist_ok=True)
    else:
        fs.create_dir(p, recursive=True)


def parent_dir(path: str) -> str:
    """Dirname that preserves the URI scheme."""
    parsed = urlparse(path)
    if parsed.scheme == "":
        return os.path.dirname(path)
    head = os.path.dirname(parsed.path)
    return f"{parsed.scheme}://{parsed.netloc}{head}"
