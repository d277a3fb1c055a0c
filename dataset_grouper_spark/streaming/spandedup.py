"""Continuous-ingest exact substring-span dedup: foreachBatch + the
snapshot corpus store (the streaming face of
``operators/spandedup.py``, plumbing-shared with
``streaming/incremental.py``'s document dedup).

Per micro-batch: clean the arriving documents against EVERYTHING ever
ingested with :func:`spandedup.remove_duplicate_spans_against`
(corpus-present spans removed, batch-internal duplicates keep the
batch-first copy), then append ``(id, original text, clean_text,
removed_tokens, epoch)`` to the snapshot store as one atomic tagged
version.

The store keeps the ORIGINAL text alongside the cleaned one, and the
screen matches against the originals. That choice is what makes the
semantics closed-form: an occurrence is removed iff a
strictly-earlier occurrence of the same k-gram exists under the
total order (batch, doc, pos) — because originals preserve every
occurrence, sequential ingest is EXACTLY global precedence-ordered
ExactSubstr, and the DuckDB twin is one query with a composite
canonical key (no per-epoch iteration). Screening against cleaned
texts instead would lose grams straddling earlier removal boundaries
and the result would depend on ingest history in non-closed-form
ways.

Exactly-once: identical contract to streaming_incremental_dedup —
each epoch commits one snapshot version tagged ``epoch-<id>``; a
crash between append and checkpoint commit replays the epoch, whose
recomputed frame (now self-matching against its own stored originals)
is discarded by the tag no-op, so the store never double-admits.

Scale: the per-epoch cost is the batch gram shuffle + ONE scan of the
corpus store for its gram set (the corpus never self-joins); at 100 TB
the store is the same bucketed snapshot layout the incremental dedup
uses, and the gram scan prunes to the text column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import spandedup
from dataset_grouper_spark.sinks import snapshots as snap

EPOCH_COL = "_epoch"


def ingest_span_batch(
    batch: DataFrame,
    epoch_id: int,
    store_path: str,
    id_col: str,
    text_col: str,
    k: int = 8,
    max_anchor_freq: int | None = None,
    hash_grams: bool = False,
) -> None:
    """Clean + commit ONE epoch into the snapshot corpus store.
    Idempotent per epoch (module docstring). Exposed so crash-replay
    tests can drive it directly.

    ``id_col`` must be unique per document WITHIN the batch — the
    span rebuild groups tokens by it; the delegated spandedup call
    fails fast on a violation (r9 review). Ids recurring ACROSS
    epochs are harmless to correctness (the corpus side contributes
    only its gram set) but make ``read_clean_corpus`` return one row
    per (id, epoch)."""
    spark = batch.sparkSession
    has_store = bool(snap.snapshot_versions(store_path))
    if has_store:
        corpus = snap.read_snapshot(spark, store_path).select(
            id_col, text_col
        )
        cleaned = spandedup.remove_duplicate_spans_against(
            batch.select(id_col, text_col),
            corpus,
            id_col,
            text_col,
            k=k,
            max_anchor_freq=max_anchor_freq,
            hash_grams=hash_grams,
        )
    else:
        cleaned = spandedup.remove_duplicate_spans(
            batch.select(id_col, text_col),
            id_col,
            text_col,
            k=k,
            max_anchor_freq=max_anchor_freq,
            hash_grams=hash_grams,
        )
    out = (
        batch.select(id_col, text_col)
        .join(cleaned, id_col)
        .withColumn(EPOCH_COL, F.lit(epoch_id))
    )
    if not has_store:
        snap.snapshot_write(out.limit(0), store_path)
    if not out.isEmpty():
        snap.snapshot_append(out, store_path, tag=f"epoch-{epoch_id}")


def streaming_span_dedup(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    id_col: str,
    text_col: str,
    k: int = 8,
    max_anchor_freq: int | None = None,
    hash_grams: bool = False,
):
    """Start a foreachBatch query span-cleaning every arriving batch
    against the ever-growing corpus store. Returns the
    StreamingQuery; the caller drains/stops it. Read results with
    :func:`read_clean_corpus`."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        ingest_span_batch(
            batch,
            epoch_id,
            store_path,
            id_col,
            text_col,
            k=k,
            max_anchor_freq=max_anchor_freq,
            hash_grams=hash_grams,
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_clean_corpus(spark: SparkSession, store_path: str) -> DataFrame:
    """The ingested corpus (latest snapshot): one row per document
    with its original text, span-cleaned text, removal count, and the
    epoch it arrived in. Time-travel via snapshots.read_snapshot."""
    return snap.read_snapshot(spark, store_path)
