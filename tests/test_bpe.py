"""BPE merge learning: classic-algorithm golden, determinism, encode."""

import pytest

from dataset_grouper_spark.functions import bpe


def _python_bpe(word_counts, num_merges):
    """Reference implementation (Sennrich 2016 pseudocode), ties broken
    (count desc, left asc, right asc)."""
    vocab = {
        " ".join(list(w)) + " </w>": c for w, c in word_counts.items()
    }
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for seq, c in vocab.items():
            syms = seq.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        merges.append((l, r, cnt))
        new_vocab = {}
        for seq, c in vocab.items():
            padded = f" {seq} "
            padded = padded.replace(f" {l} {r} ", f" {l}{r} ")
            new_vocab[padded.strip()] = c
        vocab = new_vocab
    return merges, vocab


WORDS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_fit_matches_reference_algorithm(spark):
    rows = []
    doc = 0
    for w, c in WORDS.items():
        for _ in range(c):
            rows.append((doc, w))
            doc += 1
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got, vocab = bpe.fit_bpe(df, "text", 6)
    want, want_vocab = _python_bpe(WORDS, 6)
    assert got == want
    # final sequences agree too
    seqs = {r["w"]: r["seq"] for r in vocab.collect()}
    assert seqs == {
        w: next(s for s, _ in [(s, c) for s, c in want_vocab.items()
                               if s.replace(" ", "").replace("</w>", "") == w])
        for w in WORDS
    }


def test_fit_deterministic_under_ties(spark):
    # two runs over a shuffled frame must learn identical merges
    rows = [(i, t) for i, t in enumerate(["ab ab", "ba ba", "ab ba"] * 20)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    a, _ = bpe.fit_bpe(df, "text", 4)
    b, _ = bpe.fit_bpe(df.orderBy("text"), "text", 4)
    assert a == b


def test_token_counts_shrink_with_merges(spark):
    df = spark.createDataFrame(
        [(1, "aaaa aaaa"), (2, "aaaa")], "doc_id: long, text: string"
    )
    _, v0 = bpe.fit_bpe(df, "text", 1)   # merges (a,a)
    _, v3 = bpe.fit_bpe(df, "text", 3)
    c0 = {r["doc_id"]: r["n_bpe_tokens"]
          for r in bpe.bpe_token_counts(df, "text", "doc_id", v0).collect()}
    c3 = {r["doc_id"]: r["n_bpe_tokens"]
          for r in bpe.bpe_token_counts(df, "text", "doc_id", v3).collect()}
    # char-level 'aaaa </w>' = 5 symbols; ONE padded-replace pass of
    # (a,a) gives 'aa a a </w>' = 4 (leftmost-non-overlap consumes the
    # shared delimiter — see the module docstring; later iterations
    # finish the run)
    assert c0[2] == 4
    assert c3[2] < c0[2]
    assert c0[1] == 2 * c0[2] and c3[1] == 2 * c3[2]


def test_non_ascii_words_excluded(spark):
    df = spark.createDataFrame(
        [(1, "héllo world"), (2, "world")], "doc_id: long, text: string"
    )
    merges, vocab = bpe.fit_bpe(df, "text", 1)
    words = {r["w"] for r in vocab.collect()}
    assert words == {"world"}


def test_fit_rejects_bad_merges(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
    with pytest.raises(ValueError):
        bpe.fit_bpe(df, "text", 0)
