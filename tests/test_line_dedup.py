"""Cross-corpus line-level boilerplate removal (CCNet/RefinedWeb)."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import dedup

BOILER = "COOKIE NOTICE we use cookies"
NEWSLETTER = "Subscribe to our newsletter today"


@pytest.fixture()
def docs(spark):
    rows = [
        (1, f"{BOILER}\nalpha body one two three\n{NEWSLETTER}"),
        (2, f"{BOILER}\nbeta content four five six\n{NEWSLETTER}"),
        (3, f"{BOILER}\ngamma words seven eight nine"),
        (4, f"{BOILER}\n{BOILER}"),          # only boilerplate -> empty
        (5, "delta unique standalone text"),
        (6, None),                            # NULL text
        (7, "short\nx\n \ndelta unique words"),  # short lines never count
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_thresholds(spark, docs):
    b = dedup.boilerplate_lines(docs, "text", "doc_id", min_docs=3, min_len=10)
    rows = b.collect()
    # BOILER appears in docs 1-4 (4 distinct docs); NEWSLETTER in only 2
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 4
    # doc 4 repeats BOILER twice but counts once (distinct docs)


def test_line_dedup_rebuild(spark, docs):
    out = dedup.line_dedup(
        docs, "text", "doc_id", min_docs=3, min_len=10
    ).orderBy("doc_id")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["text_clean"])
        for r in out.collect()
    }
    assert got[1] == (3, 1, f"alpha body one two three\n{NEWSLETTER}")
    assert got[2] == (3, 1, f"beta content four five six\n{NEWSLETTER}")
    assert got[3] == (2, 1, "gamma words seven eight nine")
    assert got[4] == (2, 2, "")                 # all lines were boilerplate
    assert got[5] == (1, 0, "delta unique standalone text")
    assert got[6] == (1, 0, "")                 # NULL -> one empty line, kept
    assert got[7][1] == 0                       # short lines never removed
    assert got[7][2] == "short\nx\n \ndelta unique words"  # order preserved
    # schema-preserving: original columns still present
    assert {"doc_id", "text"} <= set(out.columns)


def test_line_dedup_matches_sql_twin(spark, docs):
    import duckdb

    out = dedup.line_dedup(docs, "text", "doc_id", min_docs=3, min_len=10)
    spark_pdf = (
        out.select(
            "doc_id",
            "n_lines",
            "n_removed",
            F.octet_length("text_clean").alias("clean_len"),
            F.md5("text_clean").alias("clean_md5"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    oracle = (
        con.sql(
            dedup.line_dedup_sql(
                "documents", "text", "doc_id", min_docs=3, min_len=10
            )
            + " ORDER BY doc_id"
        )
        .df()
    )
    assert spark_pdf["n_removed"].tolist() == oracle["n_removed"].tolist()
    assert spark_pdf["clean_md5"].tolist() == oracle["clean_md5"].tolist()
    assert spark_pdf["clean_len"].tolist() == oracle["clean_len"].tolist()
