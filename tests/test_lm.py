"""Bigram LM scoring: closed-form probabilities, smoothing, backoff."""

import math

import pytest

from dataset_grouper_spark.functions import lm


def test_bigram_logprob_closed_form(spark):
    # corpus: "a b a", "b a" -> c(a)=3, c(b)=2, V=2
    # c(a->b)=1, c(b->a)=2; k=0.5:
    #   P(b|a) = (1+.5)/(3+.5*2) = 1.5/4
    #   P(a|b) = (2+.5)/(2+.5*2) = 2.5/3
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a")], "doc_id: long, text: string"
    )
    out = {
        r["doc_id"]: r
        for r in lm.bigram_logprob(df, "text", "doc_id", k=0.5).collect()
    }
    p_ba = math.log(1.5 / 4)
    p_ab = math.log(2.5 / 3)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["avg_logprob"] == pytest.approx((p_ba + p_ab) / 2, abs=1e-12)
    assert out[2]["avg_logprob"] == pytest.approx(p_ab, abs=1e-12)
    assert out[2]["ppl"] == pytest.approx(math.exp(-p_ab), abs=1e-12)


def test_bigram_unseen_pair_smoothed_and_unseen_predecessor_uniform(spark):
    ref = spark.createDataFrame(
        [(1, "a b a"), (2, "b a")], "doc_id: long, text: string"
    )
    probe = spark.createDataFrame(
        [(10, "a a"), (11, "z q")], "doc_id: long, text: string"
    )
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.bigram_logprob(
            probe, "text", "doc_id", ref=ref, k=0.5
        ).collect()
    }
    # (a,a) never seen but a is: (0+.5)/(3+1)
    assert out[10] == pytest.approx(math.log(0.5 / 4), abs=1e-12)
    # z never seen as predecessor: uniform 1/V = 1/2
    assert out[11] == pytest.approx(math.log(0.5), abs=1e-12)


def test_bigram_short_docs_omitted(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "solo"), (3, "")], "doc_id: long, text: string"
    )
    ids = {r["doc_id"] for r in lm.bigram_logprob(df, "text", "doc_id").collect()}
    assert ids == {1}


def test_bigram_reference_ranks_gibberish_below_reference_style(spark):
    ref_rows = [(i, "the cat sat on the mat") for i in range(10)]
    df = spark.createDataFrame(
        ref_rows + [(100, "the cat sat"), (101, "mat the on cat")],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.bigram_logprob(
            df, "text", "doc_id", ref=df.filter("doc_id < 100")
        ).collect()
    }
    assert out[100] > out[101]  # in-style text scores higher


def test_bigram_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id: long, text: string")
    with pytest.raises(ValueError):
        lm.bigram_logprob(df, "text", "doc_id", k=0.0)


def test_bigram_sql_twin_handles_duplicate_ids(spark):
    # duplicate doc ids must not multiply the oracle's bigram counts
    import duckdb

    rows = [(7, "a b a"), (7, "b a b"), (8, "a b")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r["doc_id"], r["n_bigrams"]): round(r["avg_logprob"], 9)
        for r in lm.bigram_logprob(df, "text", "doc_id").collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW t AS SELECT * FROM (VALUES (7, 'a b a'), "
        "(7, 'b a b'), (8, 'a b')) AS v(doc_id, text)"
    )
    twin = {
        (int(i), int(n)): round(float(a), 9)
        for i, n, a, _ in con.sql(
            lm.bigram_logprob_sql("t", "text", "doc_id")
        ).fetchall()
    }
    assert twin == got
