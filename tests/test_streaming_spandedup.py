"""Streaming exact-substring span dedup (streaming/spandedup.py):
sequential ingest must equal global precedence-ordered ExactSubstr,
and epoch replays must be no-ops."""

import pytest

from dataset_grouper_spark.streaming import spandedup as ssd

B = 1_000_000


def _brute_global(batches, k):
    """Reference: occurrence removed iff a strictly-smaller
    (batch, doc, pos) occurrence of its gram exists."""
    from collections import defaultdict

    occ = defaultdict(list)
    toks = {}
    for bi, rows in enumerate(batches):
        for d, t in rows:
            toks[d] = t.split()
            for i in range(len(toks[d]) - k + 1):
                occ[" ".join(toks[d][i : i + k])].append(
                    bi * B * B + d * B + i
                )
    covered = defaultdict(set)
    for keys in occ.values():
        if len(keys) < 2:
            continue
        canon = min(keys)
        for key in keys:
            if key == canon:
                continue
            d, i = divmod(key % (B * B), B)
            covered[d].update(range(i, i + k))
    out = {}
    for d, t in toks.items():
        keep = [tok for i, tok in enumerate(t) if i not in covered[d]]
        out[d] = (" ".join(keep), len(t) - len(keep))
    return out


BATCHES = [
    [  # epoch 0: owns the canonical span
        (0, "u0 u1 alpha beta gamma delta epsilon zeta u2"),
        (1, "w0 w1 w2 w3 w4 w5 w6"),
    ],
    [  # epoch 1: corpus-duplicate span + batch-internal pair
        (10, "x0 alpha beta gamma delta epsilon zeta x1"),
        (11, "one two three four five six seven y0"),
        (12, "y1 one two three four five six seven"),
    ],
    [  # epoch 2: duplicates something from EACH earlier epoch
        (20, "alpha beta gamma delta epsilon zeta one two three four five six seven"),
        (21, "fresh tokens never seen before anywhere at all"),
    ],
]


def _ingest_all(spark, tmp_path, k=6):
    store = str(tmp_path / "store")
    for epoch, rows in enumerate(BATCHES):
        ssd.ingest_span_batch(
            spark.createDataFrame(rows, "doc_id long, text string"),
            epoch,
            store,
            "doc_id",
            "text",
            k=k,
        )
    return store


def test_sequential_ingest_matches_global_precedence(spark, tmp_path):
    store = _ingest_all(spark, tmp_path)
    got = {
        r["doc_id"]: (r["clean_text"], r["removed_tokens"])
        for r in ssd.read_clean_corpus(spark, store).collect()
    }
    assert got == _brute_global(BATCHES, 6)
    # spot checks: epoch-0 copy survives; later copies stripped
    assert "alpha" in got[0][0]
    assert "alpha" not in got[10][0] and "alpha" not in got[20][0]
    assert got[11][1] == 0 and got[12][1] == 7
    assert got[21][1] == 0
    # epochs recorded
    epochs = {
        r["doc_id"]: r["_epoch"]
        for r in ssd.read_clean_corpus(spark, store).collect()
    }
    assert epochs[0] == 0 and epochs[12] == 1 and epochs[21] == 2


def test_epoch_replay_is_noop(spark, tmp_path):
    store = _ingest_all(spark, tmp_path)
    before = sorted(
        map(tuple, ssd.read_clean_corpus(spark, store).collect())
    )
    # crash-replay of the last epoch: recomputed against a corpus that
    # already contains its own originals -> tag no-op, store unchanged
    ssd.ingest_span_batch(
        spark.createDataFrame(BATCHES[2], "doc_id long, text string"),
        2,
        store,
        "doc_id",
        "text",
        k=6,
    )
    after = sorted(
        map(tuple, ssd.read_clean_corpus(spark, store).collect())
    )
    assert after == before


def test_streaming_drive_end_to_end(spark, tmp_path):
    """The actual foreachBatch query over a 3-file source."""
    src = tmp_path / "src"
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))
    store = str(tmp_path / "store2")
    ckpt = str(tmp_path / "ck")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    q = ssd.streaming_span_dedup(
        stream, store, ckpt, "doc_id", "text", k=6
    )
    q.awaitTermination()
    got = {
        r["doc_id"]: (r["clean_text"], r["removed_tokens"])
        for r in ssd.read_clean_corpus(spark, store).collect()
    }
    assert got == _brute_global(BATCHES, 6)
