"""Near-dup clustering: connected components + full cluster pipeline."""

from pyspark.sql import functions as F

from dataset_grouper_spark.operators import dedup


def test_connected_components_chain_triangle_islands(spark):
    # components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (21, 20)],
        "id_a: long, id_b: long",
    )
    got = {
        r.id: r.component
        for r in dedup.connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_converges_early(spark):
    # single clique: must converge in 2 rounds regardless of max_iter
    edges = spark.createDataFrame(
        [(i, j) for i in range(6) for j in range(i + 1, 6)],
        "id_a: long, id_b: long",
    )
    got = {r.id: r.component for r in dedup.connected_components(edges, max_iter=3).collect()}
    assert got == {i: 0 for i in range(6)}


def test_connected_components_raises_when_unconverged(spark):
    # path graph 0-1-2-...-7: diameter 7, min-label propagation needs
    # ~7 rounds; max_iter=2 must raise, not return wrong components
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "id_a: long, id_b: long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iter=2)
    # with enough rounds the same graph resolves to one component
    got = {r.id: r.component for r in dedup.connected_components(edges).collect()}
    assert got == {i: 0 for i in range(8)}


def test_connected_components_escalates_on_long_chains(spark):
    # path graph 0-1-...-40: diameter 40. Plain min-label needs ~40
    # rounds; the r13 auto-escalation to pointer shortcutting after
    # _CC_ESCALATE_AFTER rounds must resolve it within ~3 + 2*log2(40)
    # rounds — max_iter=16 converges ONLY if escalation engages, and
    # the labels must equal the plain fixpoint (component = min id)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a: long, id_b: long"
    )
    got = {
        r.id: r.component
        for r in dedup.connected_components(edges, max_iter=16).collect()
    }
    assert got == {i: 0 for i in range(41)}


def test_connected_components_releases_round_caches(spark):
    # per-round persisted label frames must be unpersisted as rounds
    # advance — only sym + the final labels frame may remain cached
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "id_a: long, id_b: long"
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    dedup.connected_components(edges).collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    # raw edges + sym + final step frame = at most 3 new cached RDDs
    # (not 1/round)
    assert after - before <= 3


def test_cluster_near_dups_planted(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and again!"),  # near-dup
        (4, "completely different text about spark dataframes and shuffles"),
        (5, "another unrelated document mentioning parquet files and arrow"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.cluster_near_dups(df, "text", "doc_id").collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4 and got[5] == 5
    # survivors = one per cluster
    survivors = {d for d, c in got.items() if d == c}
    assert survivors == {1, 4, 5}


def test_contamination_counts_and_filter(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),       # contains bench 13-gram? n=3 here
            (2, "alpha beta gamma completely different tail"),
            (3, "nothing in common with the benchmark set"),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id: long, text: string"
    )
    out = {
        r.doc_id: (r.total_ngrams, r.contaminated_ngrams, r.bench_docs_hit)
        for r in dedup.contamination(docs, bench, "text", "doc_id", n=3).collect()
    }
    # doc 1: 4 total 3-grams, 3 shared with bench; doc 2 shares 1; doc 3 none
    assert out[1] == (4, 3, 1)
    assert out[2] == (4, 1, 1)
    assert out[3] == (5, 0, 0)

    kept = {
        r.doc_id
        for r in dedup.decontaminate(docs, bench, "text", "doc_id", n=3).collect()
    }
    assert kept == {3}
    # benchmark side must be broadcast — the corpus never shuffles to
    # meet an eval set
    plan = dedup.contamination(docs, bench, "text", "doc_id", n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_duplicate_ngram_fraction(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # 3 trigrams, all shared with doc 2
            (2, "a b c d e f"),        # 4 trigrams, 3 shared
            (3, "q r s t"),            # 2 trigrams, unique
            (4, "x"),                  # too short: no trigrams
        ],
        "doc_id: long, text: string",
    )
    got = {
        r.doc_id: (r.total_ngrams, r.dup_ngrams, r.dup_frac)
        for r in dedup.duplicate_ngram_fraction(docs, "text", "doc_id", 3).collect()
    }
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (4, 3, 0.75)
    assert got[3] == (2, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_exact_dedup_against(spark):
    existing = spark.createDataFrame(
        [(1, "known text"), (2, "other known")], "doc_id: long, text: string"
    )
    new = spark.createDataFrame(
        [(10, "known text"), (11, "fresh content"), (12, "other known")],
        "doc_id: long, text: string",
    )
    kept = {r.doc_id for r in dedup.exact_dedup_against(new, existing, "text").collect()}
    assert kept == {11}


def test_minhash_dedup_against_screens_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    existing = spark.createDataFrame(
        [(1, base), (2, "some other standing corpus document entirely")],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        [
            (10, base + "!"),                                 # near-dup of 1
            (11, "genuinely novel text about spark shuffles"),
        ],
        "doc_id: long, text: string",
    )
    kept = {
        r.doc_id
        for r in dedup.minhash_dedup_against(new, existing, "text", "doc_id").collect()
    }
    assert kept == {11}


def test_connected_components_jump_long_chain(spark):
    # path graph of 120 nodes (diameter 119): pointer jumping must
    # converge in <= 25 rounds; plain propagation with a round budget
    # below the escalation threshold still raises (r13: beyond that
    # budget plain CC auto-escalates and converges too — see
    # test_connected_components_escalates_on_long_chains)
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "id_a: long, id_b: long"
    )
    got = {
        r.id: r.component
        for r in dedup.connected_components_jump(edges).collect()
    }
    assert got == {i: 0 for i in range(120)}
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iter=3)


def test_connected_components_jump_matches_plain(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    plain = {
        r.id: r.component for r in dedup.connected_components(df).collect()
    }
    jump = {
        r.id: r.component
        for r in dedup.connected_components_jump(df).collect()
    }
    assert plain == jump
