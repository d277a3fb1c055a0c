"""Multimodal columns — opaque binary payloads with typed metadata.

North-star extension (SURVEY §2.8). The contract: media travel as
``binary`` columns plus a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` so the heavy per-item work is vectorized per batch and
never leaves the executor.

The actual codec libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode kernels are STUBBED: ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (metadata derived from the byte content)
exercises the full Spark-side plumbing — schema, batching, partition
behavior — identically to a real codec.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "id long, n_bytes long, format string, width int, height int, sha string"
)


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real image decoder: derives
    (format, width, height) from the content hash. Replace with PIL in
    a full environment — the Spark plumbing does not change."""
    h = hashlib.sha256(payload).digest()
    fmt = ["png", "jpeg", "webp"][h[0] % 3]
    return fmt, 16 + h[1] % 241, 16 + h[2] % 241


def decode_image_meta(
    df: DataFrame, content_col: str, id_col: str, fake: bool = False
) -> DataFrame:
    """Extract per-image metadata via mapInPandas (Arrow batches).

    Real decoders plug in here; ``fake=True`` runs the deterministic
    stub so the distributed plumbing is testable without codec libs.
    """
    if not fake:
        raise NotImplementedError(
            "image codec libraries are not available in this environment; "
            "pass fake=True to run the deterministic stub decoder"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[content_col]
            metas = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "sha": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema=IMAGE_META_SCHEMA
    )


def sample_frames(
    df: DataFrame, content_col: str, id_col: str, every_n_bytes: int = 1024
) -> DataFrame:
    """Frame-sampling plumbing demo: slice the binary payload at fixed
    strides (stand-in for video frame extraction). Pure Catalyst —
    substr on binary — so it scales without Python."""
    n_frames = F.greatest(
        F.floor(F.octet_length(F.col(content_col)) / every_n_bytes), F.lit(1)
    ).cast("int")
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.substring(
                    F.col(content_col), (i * every_n_bytes + 1).cast("int"), every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    )


RESIZED_SCHEMA = "id long, width int, height int, content binary"


def resize_images(
    df: DataFrame,
    content_col: str,
    id_col: str,
    width: int,
    height: int,
    fake: bool = False,
) -> DataFrame:
    """Resize plumbing: binary in -> binary out at (width, height),
    Arrow-batched per executor. A real pipeline swaps the kernel for
    PIL/opencv; the stub emits a deterministic payload (content-hash
    seeded, sized width*height) so downstream schema/partition behavior
    is exercised for real.
    """
    if not fake:
        raise NotImplementedError(
            "image codec libraries are not available in this environment; "
            "pass fake=True to run the deterministic stub resizer"
        )

    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf[content_col]:
                b = bytes(p)
                seed = hashlib.sha256(b).digest()
                reps = target // len(seed) + 1
                out.append((seed * reps)[:target])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "content": out,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def image_embeddings(
    df: DataFrame,
    content_col: str,
    id_col: str,
    dim: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Feature extraction plumbing: binary -> ``array<float>``
    embedding, Arrow-batched. The stub embeds via a normalized byte
    histogram folded to ``dim`` (deterministic); a real pipeline runs
    its vision encoder on the same batch iterator. Output plugs
    straight into the similarity tier (cosine_topk / lsh_topk /
    cluster pipelines) — binary column in, ANN search out.
    """
    if not fake:
        raise NotImplementedError(
            "vision encoder not available in this environment; "
            "pass fake=True to run the deterministic stub embedder"
        )
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for p in pdf[content_col]:
                counts = np.bincount(
                    np.frombuffer(bytes(p), dtype=np.uint8), minlength=256
                ).astype("float64")
                folded = counts.reshape(dim, -1).sum(axis=1) if 256 % dim == 0 else np.resize(counts, dim)
                norm = np.linalg.norm(folded)
                vecs.append(
                    [float(x) for x in (folded / norm if norm else folded)]
                )
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "embedding": vecs}
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema="id long, embedding array<float>"
    )
