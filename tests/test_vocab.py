"""Vocabulary statistics: counts, pruning, deterministic ranking."""

from dataset_grouper_spark.functions.vocab import token_counts, vocabulary


def test_counts_and_rank(spark):
    df = spark.createDataFrame(
        [
            (1, "a b b c"),
            (2, "b c c d"),
            (3, ""),
            (4, None),
        ],
        "doc_id: long, text: string",
    )
    counts = {
        r.token: (r.term_freq, r.doc_freq)
        for r in token_counts(df, "text", "doc_id").collect()
    }
    assert counts == {"a": (1, 1), "b": (3, 2), "c": (3, 2), "d": (1, 1)}

    vocab = [
        (r.rank, r.token, r.term_freq)
        for r in vocabulary(df, "text", "doc_id", min_count=2).collect()
    ]
    # tie between b and c broken by token order
    assert sorted(vocab) == [(1, "b", 3), (2, "c", 3)]

    top1 = vocabulary(df, "text", "doc_id", top_k=1).collect()
    assert [(r.rank, r.token) for r in top1] == [(1, "b")]
