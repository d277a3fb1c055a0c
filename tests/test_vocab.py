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


def test_tfidf_and_top_terms(spark):
    import math

    from dataset_grouper_spark.functions.vocab import tf_idf, top_terms

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "z z z")],
        "doc_id: long, text: string",
    )
    scores = {
        (r.doc_id, r.token): (r.tf, r.tfidf)
        for r in tf_idf(df, "text", "doc_id").collect()
    }
    # N=3; df(x)=2, df(y)=1, df(z)=2
    assert scores[(1, "x")] == (2, round(2 * math.log(4 / 3), 6))
    assert scores[(1, "y")] == (1, round(math.log(4 / 2), 6))
    assert scores[(3, "z")] == (3, round(3 * math.log(4 / 3), 6))

    top = {
        r.doc_id: r.token
        for r in top_terms(df, "text", "doc_id", k=1).collect()
    }
    # doc1: y (rare, df=1, tfidf ln2=0.693) beats x (tf 2 but df=2,
    # 2*ln(4/3)=0.575) — rarity wins, the point of idf; doc3: z
    assert top[1] == "y" and top[3] == "z"


def test_vocabulary_top_k_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta gamma " + ("alpha " * (i % 3))) for i in range(40)],
        "doc_id: long, text: string",
    )
    top = vocabulary(df, "text", "doc_id", top_k=2)
    rows = sorted((r.rank, r.token) for r in top.collect())
    assert rows == [(1, "alpha"), (2, "beta")]  # tie beta/gamma -> token asc
    # the global sort must be bounded: TakeOrdered, not a full Sort
    # feeding the single-partition window
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
