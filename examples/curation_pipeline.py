"""Example: web-corpus curation — the line-level boilerplate pass,
the Bloom-style ingest screen, and a closed-form quality model, chained
the way a crawl-refresh pipeline runs them.

1. line_dedup strips nav/footer lines repeated across >= 3 docs and
   rebuilds every text (CCNet paragraph dedup, cross-corpus).
2. fingerprint_screen_against admits only never-seen cleaned texts
   against the standing corpus — the broadcast fingerprint set splits
   the batch without shuffling it.
3. ols_fit2 fits chars ~ spaces + vowels over the admitted batch in
   ONE aggregation pass (sufficient statistics; no MLlib).

Run: python examples/curation_pipeline.py
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dataset_grouper_spark.operators import dedup, regress
from dataset_grouper_spark.session import get_spark

BOILER = "ACCEPT COOKIES TO CONTINUE"
FOOTER = "(c) example.com all rights reserved"


def main() -> None:
    spark = get_spark("example-curation")

    corpus = spark.createDataFrame(
        [
            (1, f"{BOILER}\nthe quick brown fox jumps\n{FOOTER}"),
            (2, f"{BOILER}\npack my box with five dozen jugs\n{FOOTER}"),
            (3, f"{BOILER}\nsphinx of black quartz judge my vow\n{FOOTER}"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, f"{BOILER}\nthe quick brown fox jumps\n{FOOTER}"),  # dup
            (11, f"{BOILER}\nhow vexingly quick daft zebras jump\n{FOOTER}"),
            (12, f"{BOILER}\nbright vixens jump dozy fowl quack\n{FOOTER}"),
        ],
        "doc_id long, text string",
    )

    # 1. strip cross-document boilerplate from corpus AND batch in one
    #    pass over their union (the boilerplate table must see both)
    both = corpus.unionByName(batch)
    cleaned = dedup.line_dedup(both, "text", "doc_id", min_docs=3, min_len=10)
    print("== line_dedup ==")
    cleaned.select("doc_id", "n_lines", "n_removed", "text_clean").show(
        truncate=48
    )

    clean_corpus = cleaned.filter("doc_id < 10").select(
        "doc_id", F.col("text_clean").alias("text")
    )
    clean_batch = cleaned.filter("doc_id >= 10").select(
        "doc_id", F.col("text_clean").alias("text")
    )

    # 2. admit only never-seen cleaned content
    admitted = dedup.fingerprint_screen_against(
        clean_batch, clean_corpus, "text"
    )
    print("== fingerprint screen: admitted ==")
    admitted.show(truncate=48)

    # 3. one-pass linear quality model over the admitted batch
    feats = admitted.withColumn(
        "n_spaces",
        F.octet_length("text")
        - F.octet_length(F.replace(F.col("text"), F.lit(" "), F.lit(""))),
    ).withColumn(
        "n_vowels",
        F.octet_length("text")
        - F.octet_length(
            F.regexp_replace(F.col("text"), "[aeiou]", "")
        ),
    ).withColumn("n_chars", F.octet_length("text"))
    print("== OLS: chars ~ spaces + vowels (one aggregation pass) ==")
    regress.ols_fit2(feats, "n_chars", ["n_spaces", "n_vowels"]).show()

    spark.stop()


if __name__ == "__main__":
    main()
