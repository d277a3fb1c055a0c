"""Dedup operator semantics on small literal corpora."""

import pytest

from dataset_grouper_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near dup
        (4, "completely different text with no overlap here at all"),
        (5, "another unrelated document full of other words entirely"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_exact_dedup_keeps_min_id(docs):
    out = dedup.exact_dedup(docs, "text", "doc_id")
    rows = {r.doc_id: r.dup_count for r in out.collect()}
    assert 1 in rows and 2 not in rows
    assert rows[1] == 2
    assert rows[3] == rows[4] == rows[5] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert (2, 3) in got
    assert not any(4 in p or 5 in p for p in got)


def test_minhash_lsh_recalls_exact_dup(docs):
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", n=3, num_perm=16, seed=1)
    srows = {r.doc_id: [r[f"m{i}"] for i in range(16)] for r in sigs.collect()}
    assert srows[1] == srows[2]  # identical text -> identical signature
    cands = dedup.lsh_candidate_pairs(sigs, "doc_id", num_perm=16, bands=4)
    got = {(r.id_a, r.id_b) for r in cands.collect()}
    assert (1, 2) in got


def test_minhash_verify_filters_false_positives(docs):
    out = dedup.minhash_lsh_dedup(
        docs, "text", "doc_id", n=3, num_perm=16, bands=8, seed=1,
        verify_threshold=0.9,
    )
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(1, 2)}  # only the exact dup survives verification


def test_simhash_identical_and_different(docs):
    out = {r.doc_id: r.simhash for r in dedup.simhash(docs, "text", "doc_id").collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] < (1 << 16)
    assert out[1] != out[4]


def test_simhash_near_dup_close(docs):
    out = {r.doc_id: r.simhash for r in dedup.simhash(docs, "text", "doc_id").collect()}
    ham = bin(out[1] ^ out[3]).count("1")
    ham_far = bin(out[1] ^ out[4]).count("1")
    assert ham < ham_far


def test_lsh_hot_bucket_cap_bounds_pairs(spark):
    # degenerate bucket: many identical docs share every band; the cap
    # must bound the candidate output at ~cap^2/2, not n^2/2
    n, cap = 200, 20
    base = "the same boilerplate template page text repeated everywhere"
    df = spark.createDataFrame(
        [(i, base) for i in range(n)], "doc_id: long, text: string"
    )
    sigs = dedup.minhash_signatures(df, "text", "doc_id")
    capped = dedup.lsh_candidate_pairs(
        sigs, "doc_id", max_bucket_size=cap
    ).count()
    assert capped == cap * (cap - 1) // 2  # smallest `cap` ids, all pairs
    # deterministic membership: smallest ids survive
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=cap)
    ids = {r.id_a for r in pairs.collect()} | {r.id_b for r in pairs.collect()}
    assert ids == set(range(cap))
    # audit helper reports the oversized bucket
    over = dedup.lsh_oversized_buckets(
        sigs, "doc_id", max_bucket_size=cap
    ).collect()
    assert over and all(r.n_docs == n and r.n_dropped == n - cap for r in over)
    # uncapped (None) emits the full quadratic set
    assert (
        dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=None).count()
        == n * (n - 1) // 2
    )


def test_shared_shingle_frame_validated(docs):
    # a shingle_df built with a different n must raise, not silently
    # produce wrong signatures (ADVICE r4); n/text_col are taken from
    # the supplied frame, so a matching n passes
    sh2 = dedup.shingles(docs, "text", "doc_id", n=2)
    with pytest.raises(ValueError, match="built with n=2"):
        dedup.minhash_signatures(docs, "text", "doc_id", n=3, shingle_df=sh2)
    with pytest.raises(ValueError, match="built with n=2"):
        dedup.duplicate_ngram_fraction(
            docs, "text", "doc_id", n=3, shingle_df=sh2
        )
    # missing columns caught even without metadata
    with pytest.raises(ValueError, match="missing"):
        dedup.minhash_signatures(
            docs, "text", "doc_id", shingle_df=docs.select("doc_id")
        )
    ok = dedup.minhash_signatures(
        docs, "text", "doc_id", n=2, shingle_df=sh2
    )
    plain = dedup.minhash_signatures(docs, "text", "doc_id", n=2)
    assert sorted(map(tuple, ok.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_contamination_guarded_broadcast_identical(spark, docs):
    # above the bound the bench side must not broadcast; results are
    # identical either way
    bench = spark.createDataFrame(
        [(100, "quick brown fox"), (101, "words entirely")],
        "doc_id: long, text: string",
    )
    a = dedup.contamination(docs, bench, "text", "doc_id", n=3)
    b = dedup.contamination(
        docs, bench, "text", "doc_id", n=3, max_broadcast_shingles=0
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and any(r[2] > 0 for r in ra)  # contamination found


def test_lsh_rejects_degenerate_band_config(spark):
    # bands > num_perm would make every band key collapse to the band
    # index (all docs collide; the incremental screen then drops the
    # whole batch) — must raise instead
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "x y z")], "doc_id: long, text: string"
    )
    sigs = dedup.minhash_signatures(df, "text", "doc_id", 3, num_perm=16)
    with _pytest.raises(ValueError):
        dedup.lsh_candidate_pairs(sigs, "doc_id", num_perm=16, bands=32)
    with _pytest.raises(ValueError):
        dedup.lsh_candidate_pairs(sigs, "doc_id", num_perm=16, bands=5)
    with _pytest.raises(ValueError):
        dedup.minhash_dedup_against(
            df, df, "text", "doc_id", num_perm=16, bands=32
        )


def test_cluster_near_dups_id_column_named_id(spark):
    # a caller whose id column is literally "id" must not hit
    # AMBIGUOUS_REFERENCE from the components join
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "something else entirely here")],
        "id: long, text: string",
    )
    out = {
        r["id"]: r["cluster_id"]
        for r in dedup.cluster_near_dups(
            df, "text", "id", n=2, num_perm=8, bands=4
        ).collect()
    }
    assert out[1] == out[2] == 1
    assert out[3] == 3


class TestFingerprintScreen:
    def _frames(self, spark):
        existing = spark.createDataFrame(
            [(1, "alpha text"), (2, "beta text"), (3, "gamma text")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (10, "delta fresh"),       # definitely new
                (11, "beta text"),         # exact replay -> screened
                (12, None),                # NULL text -> survives (md5 NULL)
                (13, "epsilon fresh"),
            ],
            "doc_id long, text string",
        )
        return new, existing

    def test_identical_to_exact_screen_small(self, spark):
        from dataset_grouper_spark.operators import dedup

        new, existing = self._frames(spark)
        screened = dedup.fingerprint_screen_against(new, existing, "text")
        plain = dedup.exact_dedup_against(new, existing, "text")
        assert sorted(r["doc_id"] for r in screened.collect()) == sorted(
            r["doc_id"] for r in plain.collect()
        ) == [10, 12, 13]

    def test_identical_above_broadcast_cap(self, spark):
        from dataset_grouper_spark.operators import dedup

        new, existing = self._frames(spark)
        out = dedup.fingerprint_screen_against(
            new, existing, "text", max_broadcast_fps=1
        )
        assert sorted(r["doc_id"] for r in out.collect()) == [10, 12, 13]
        # over-cap shape: fp misses pass through (anti), fp HITS route
        # through the exact check (semi) — a plain anti join alone
        # would drop fp-collision false positives permanently
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LeftAnti" in plan and "LeftSemi" in plan

    def test_screen_branch_broadcasts_not_shuffles_fresh(self, spark):
        from dataset_grouper_spark.operators import dedup

        new, existing = self._frames(spark)
        plan = dedup.fingerprint_screen_against(
            new, existing, "text"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_schema_preserved(self, spark):
        from dataset_grouper_spark.operators import dedup

        new, existing = self._frames(spark)
        out = dedup.fingerprint_screen_against(new, existing, "text")
        assert out.columns == new.columns
