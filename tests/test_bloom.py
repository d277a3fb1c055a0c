"""Bloom filter: build/probe invariants and the exact-screen contract."""

import pytest

from dataset_grouper_spark.functions import bloom
from dataset_grouper_spark.operators.dedup import exact_dedup_against


def _docs(spark, n=200, prefix="doc"):
    return spark.createDataFrame(
        [(i, f"{prefix} text number {i % 97}") for i in range(n)],
        "doc_id bigint, text string",
    )


class TestBuildProbe:
    def test_no_false_negatives(self, spark):
        df = _docs(spark)
        bits = bloom.bloom_build(df, "text", num_bits=1 << 16)
        tagged = bloom.bloom_might_contain(df, "text", bits)
        assert tagged.filter("NOT _might_contain").count() == 0

    def test_misses_on_fresh_keys(self, spark):
        corpus = _docs(spark, prefix="corpus")
        other = _docs(spark, n=500, prefix="fresh")
        bits = bloom.bloom_build(corpus, "text", num_bits=1 << 20)
        hits = (
            bloom.bloom_might_contain(other, "text", bits)
            .filter("_might_contain")
            .count()
        )
        # 97 distinct corpus keys in 2^20 bits: FPR is ~0; a handful of
        # hits would already mean the probe math diverged from build.
        assert hits == 0

    def test_fpr_tracks_bound(self, spark):
        # Deliberately tight filter: 97 distinct keys in 2^10 bits.
        corpus = _docs(spark, prefix="corpus")
        other = spark.createDataFrame(
            [(i, f"fresh {i}") for i in range(2000)],
            "doc_id bigint, text string",
        )
        bits = bloom.bloom_build(corpus, "text", num_bits=1 << 10)
        hits = (
            bloom.bloom_might_contain(other, "text", bits)
            .filter("_might_contain")
            .count()
        )
        bound = bloom.bloom_false_positive_rate(97, 1 << 10, 5)
        # generous 3x tolerance on 2000 trials
        assert hits / 2000.0 <= 3 * bound + 0.01

    def test_tree_merge_equals_flat_build(self, spark):
        df = _docs(spark, n=300).repartition(12)
        wide = bloom.bloom_build(df, "text", num_bits=1 << 14, merge_fanin=3)
        flat = bloom.bloom_build(
            df.coalesce(1), "text", num_bits=1 << 14, merge_fanin=64
        )
        assert wide == flat

    def test_power_of_two_enforced(self, spark):
        df = _docs(spark, n=5)
        with pytest.raises(ValueError, match="power of two"):
            bloom.bloom_build(df, "text", num_bits=1000)

    def test_empty_corpus_all_miss(self, spark):
        empty = _docs(spark).filter("doc_id < 0")
        bits = bloom.bloom_build(empty, "text", num_bits=1 << 12)
        probe = _docs(spark, n=50)
        tagged = bloom.bloom_might_contain(probe, "text", bits)
        assert tagged.filter("_might_contain").count() == 0


class TestScreen:
    def test_row_identical_to_exact(self, spark):
        corpus = _docs(spark, n=300, prefix="corpus")
        fresh = _docs(spark, n=80, prefix="fresh")
        replay = corpus.filter("doc_id % 7 = 0")
        new = fresh.unionByName(replay)
        got = bloom.bloom_screen_against(new, corpus, "text", num_bits=1 << 16)
        want = exact_dedup_against(new, corpus, "text")
        assert sorted(r.doc_id for r in got.collect()) == sorted(
            r.doc_id for r in want.collect()
        )

    def test_exact_even_when_filter_saturated(self, spark):
        # 2^6 bits vs 97 keys * 5 hashes: nearly every probe hits, so
        # nearly all rows route through the exact join — output must
        # STILL match the unscreened anti join exactly.
        corpus = _docs(spark, n=300, prefix="corpus")
        new = _docs(spark, n=100, prefix="fresh").unionByName(
            corpus.filter("doc_id % 3 = 0")
        )
        got = bloom.bloom_screen_against(new, corpus, "text", num_bits=1 << 6)
        want = exact_dedup_against(new, corpus, "text")
        assert sorted(r.doc_id for r in got.collect()) == sorted(
            r.doc_id for r in want.collect()
        )

    def test_null_content_rows_survive(self, spark):
        corpus = spark.createDataFrame(
            [(1, "a"), (2, None)], "doc_id bigint, text string"
        )
        new = spark.createDataFrame(
            [(10, None), (11, "a"), (12, "b")], "doc_id bigint, text string"
        )
        got = bloom.bloom_screen_against(new, corpus, "text", num_bits=1 << 10)
        want = exact_dedup_against(new, corpus, "text")
        assert sorted(
            r.doc_id for r in got.collect()
        ) == sorted(r.doc_id for r in want.collect())
