"""Text-analysis function semantics on crafted inputs."""

from pyspark.sql import functions as F

from dataset_grouper_spark.functions import textanalysis


def run(spark, col_fn, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t: string")
    return [r[0] for r in df.select(col_fn(F.col("t"))).collect()]


def test_lang_id_markers(spark):
    got = run(
        spark,
        textanalysis.lang_id,
        [
            "the cat and the dog is here",      # en
            "der hund und die katze ist da",    # de
            "le chat et la mer est grande",     # fr
            "xyz qrs tuv",                      # no markers -> und
        ],
    )
    assert got == ["en", "de", "fr", "und"]


def test_lang_id_tie_breaks_by_code(spark):
    # one 'en' marker ('the') vs one 'de' marker ('der'): tie -> 'de'
    # (earlier language code wins deterministically)
    got = run(spark, textanalysis.lang_id, ["the der"])
    assert got == ["de"]


def test_token_count_bpe_ish(spark):
    got = run(spark, textanalysis.token_count, ["Hello, world! x2", ""])
    # Hello | , | world | ! | x2  -> 5
    assert got == [5, 0]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    a, b, c = run(
        spark,
        textanalysis.fingerprint,
        ["Hello   World", "hello world", "different text"],
    )
    assert a == b
    assert a != c


def test_quality_features(spark):
    df = spark.createDataFrame([("the cat sat",)], "t: string")
    feats = textanalysis.quality_features(F.col("t"))
    row = df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]
    assert row.n_chars == 11
    assert row.n_words == 3
    assert row.avg_word_len == round(11 / 3, 4)
    assert row.punct_ratio == 0.0
    assert row.stopword_ratio == round(1 / 3, 4)


def test_lang_id_null_text_is_und(spark):
    from dataset_grouper_spark.functions import textanalysis

    df = spark.createDataFrame([(None,), ("the of and",)], "t: string")
    got = [r.l for r in df.select(
        textanalysis.lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["und", "en"]
