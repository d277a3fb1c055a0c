from dataset_grouper_spark.functions import textanalysis


def test_repetition_flags_boilerplate(spark):
    rows = [
        (1, "buy now buy now buy now buy now"),
        (2, "each word here appears exactly once today"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r.doc_id: r for r in textanalysis.repetition_features(
        df, "text", "doc_id", n=2
    ).collect()}
    # doc1: 7 bigrams, 'buy now' appears 4 times
    assert out[1].n_ngrams == 7
    assert out[1].top_ngram_count == 4
    assert out[1].top_ngram_frac > 0.5
    # doc2: all bigrams unique
    assert out[2].top_ngram_count == 1
    assert out[2].top_ngram_frac < 0.2
