"""Token-chunking semantics (dataset_utils.py:85-148 contract)."""

import hashlib

from dataset_grouper_spark import keys
from dataset_grouper_spark.operators import chunking


def test_chunks_concat_across_docs(spark):
    # group g: doc0 '"a b c", doc1 "d e" -> stream a b c d e
    # chunk_len=2 -> [a b][c d][e]
    df = spark.createDataFrame(
        [("g", 0, "a b c"), ("g", 1, "d e"), ("h", 0, "x y z w")],
        "group_id: string, ord: long, text: string",
    )
    out = chunking.chunk_tokens(df, "text", "ord", chunk_len=2)
    rows = {(r.group_id, r.chunk_id): (r.n_tokens, r.chunk_hash) for r in out.collect()}
    assert rows[("g", 0)][0] == 2
    assert rows[("g", 1)][0] == 2
    assert rows[("g", 2)][0] == 1  # tail chunk
    assert rows[("h", 0)] == (2, hashlib.md5(b"x y").hexdigest())
    assert rows[("h", 1)] == (2, hashlib.md5(b"z w").hexdigest())
    # chunk crossing the doc boundary: c (doc0) + d (doc1)
    assert rows[("g", 1)][1] == hashlib.md5(b"c d").hexdigest()


def test_pack_doc_sequences_preserves_doc_boundaries(spark):
    # docs of 3/4/5/2 tokens, budget 6: exclusive cumsums 0,3,7,12 ->
    # seq ids 0,0,1,2. Seq 0 holds docs 1+2 (7 tokens, overflowed);
    # doc 3 starts a new sequence; no doc is ever split.
    df = spark.createDataFrame(
        [
            ("g", 1, "a b c"),
            ("g", 2, "d e f g"),
            ("g", 3, "h i j k l"),
            ("g", 4, "m n"),
            ("h", 1, "solo"),
        ],
        "group_id: string, ord: long, text: string",
    )
    rows = {
        (r.group_id, r.seq_id): r
        for r in chunking.pack_doc_sequences(df, "text", "ord", 6).collect()
    }
    assert set(rows) == {("g", 0), ("g", 1), ("g", 2), ("h", 0)}
    g0 = rows[("g", 0)]
    assert (g0.n_docs, g0.n_tokens, g0.first_ord, g0.last_ord) == (2, 7, 1, 2)
    assert g0.overflowed
    g1 = rows[("g", 1)]
    assert (g1.n_docs, g1.n_tokens, g1.overflowed) == (1, 5, False)
    assert (rows[("g", 2)].n_docs, rows[("h", 0)].n_docs) == (1, 1)


def test_chunking_deterministic_under_order(spark):
    df = spark.createDataFrame(
        [("g", i, f"tok{i} tok{i}b") for i in range(50)],
        "group_id: string, ord: long, text: string",
    )
    a = {(r.group_id, r.chunk_id): r.chunk_hash
         for r in chunking.chunk_tokens(df, "text", "ord", 7).collect()}
    b = {(r.group_id, r.chunk_id): r.chunk_hash
         for r in chunking.chunk_tokens(
             df.orderBy("ord", ascending=False), "text", "ord", 7).collect()}
    assert a == b  # input order never changes the chunk stream


def test_chunk_sliding_window_math(spark):
    # 10 tokens, W=4, S=3 -> starts 0,3,6 (ceil((10-4)/3)=2): all full
    # 5 tokens, W=4, S=3 -> starts 0,3: lengths 4,2 (tail shorter)
    # 3 tokens (< W)      -> one window, length 3
    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),
            (2, "a b c d e"),
            (3, "x y z"),
        ],
        "doc_id: long, text: string",
    )
    rows = {
        (r.doc_id, r.win_id): r.n_tokens
        for r in chunking.chunk_sliding(df, "text", "doc_id", 4, 3).collect()
    }
    assert rows == {
        (1, 0): 4, (1, 1): 4, (1, 2): 4,
        (2, 0): 4, (2, 1): 2,
        (3, 0): 3,
    }


def test_chunk_sliding_overlap_content(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id: long, text: string"
    )
    out = chunking.chunk_sliding(df, "text", "doc_id", 4, 2).collect()
    # windows: [a b c d], [c d e f] -> the 2-token overlap means the
    # second window's hash covers c..f
    import hashlib

    hashes = {r.win_id: r.chunk_hash for r in out}
    assert hashes[0] == hashlib.md5(b"a b c d").hexdigest()
    assert hashes[1] == hashlib.md5(b"c d e f").hexdigest()
    assert len(hashes) == 2


def test_chunk_sliding_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunking.chunk_sliding(df, "text", "doc_id", 0, 1)
    with _pytest.raises(ValueError):
        chunking.chunk_sliding(df, "text", "doc_id", 4, 0)
