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


def test_winnow_fingerprints_guarantee_and_normalization(spark):
    from dataset_grouper_spark.functions.textanalysis import winnow_fingerprints

    k, w = 8, 4
    shared = "this exact phrase is long enough to guarantee a match"
    rows = [
        (1, f"prefix words here {shared} and a suffix"),
        (2, f"completely other opening text {shared} different ending"),
        (3, "no overlap with anything else in this tiny corpus at all"),
        (4, "THIS  exact phrase is long enough to guarantee a match"),  # ~doc1 normalized overlap
        (5, "tiny"),   # < k chars -> no fingerprints
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    fps = {}
    for r in winnow_fingerprints(df, "text", "doc_id", k=k, window=w).collect():
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    # winnowing guarantee: any shared substring >= k + w - 1 chars
    # yields at least one common fingerprint
    assert fps[1] & fps[2]
    assert fps[1] & fps[4]  # case/whitespace-insensitive via normalization
    assert not (fps[3] & fps[1]) and not (fps[3] & fps[2])
    assert 5 not in fps and 6 not in fps
    # sampling density: far fewer fingerprints than positions
    n1 = len(f"prefix words here {shared} and a suffix") - k + 1
    assert len(fps[1]) < n1 / 2
    # no-shuffle plan: a single projection stage
    plan = winnow_fingerprints(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the split+ascii codepoint projection must appear exactly once in
    # the optimized plan — CollapseProject inlining it into the
    # position lambdas would recompute it per position (O(n^2))
    opt = winnow_fingerprints(df, "text", "doc_id")._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("split(") == 1


def test_winnow_parallelism_is_value_invariant(spark):
    rows = [
        (i, f"document number {i} with some shared boilerplate text "
            f"and a unique tail segment {i * 7919}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    from dataset_grouper_spark.functions.textanalysis import winnow_fingerprints

    base = {(r.doc_id, r.fingerprint)
            for r in winnow_fingerprints(df, "text", "doc_id").collect()}
    par = {(r.doc_id, r.fingerprint)
           for r in winnow_fingerprints(
               df, "text", "doc_id", parallelism=8).collect()}
    assert base == par and base


def test_winnow_cross_engine_exact_including_bmp(spark):
    import duckdb
    from dataset_grouper_spark.functions.textanalysis import (
        winnow_fingerprints, winnow_fingerprints_sql)

    rows = [
        (1, "A shared phrase of considerable length appears here."),
        (2, "prefix… the shared phrase of considerable length — café."),
        (3, "short"),
        (4, None),
        (5, "çà et là, naïve café déjà-vu — non-ASCII BMP codepoints"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {(r.doc_id, r.fingerprint)
           for r in winnow_fingerprints(df, "text", "doc_id").collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if t is None else chr(39) + t.replace(chr(39), chr(39)*2) + chr(39)})"
            for i, t in rows
        )
        + ") t(doc_id, text)"
    )
    sql = winnow_fingerprints_sql("docs", "text", "doc_id")
    want = {(r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert got == want and got
