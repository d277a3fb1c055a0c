"""Exact substring-span dedup (operators/spandedup.py) against a
brute-force reference on planted-duplicate fixtures."""

import pytest

from dataset_grouper_spark.operators import spandedup

B = 1_000_000  # brute-force packed key (test ids are small ints)


def _brute_remove(rows, k, cap=None):
    wins = []
    toks = {d: t.split() for d, t in rows}
    for d, t in toks.items():
        for i in range(len(t) - k + 1):
            wins.append((d, i, " ".join(t[i : i + k])))
    from collections import defaultdict

    occ = defaultdict(list)
    for d, i, g in wins:
        occ[g].append(d * B + i)
    covered = defaultdict(set)
    for g, keys in occ.items():
        if len(keys) < 2 or (cap is not None and len(keys) > cap):
            continue
        canon = min(keys)
        for key in keys:
            if key == canon:
                continue
            d, i = divmod(key, B)
            covered[d].update(range(i, i + k))
    out = {}
    for d, t in toks.items():
        keep = [tok for i, tok in enumerate(t) if i not in covered[d]]
        out[d] = (" ".join(keep), len(t) - len(keep))
    return out


FIX = [
    # doc 0 owns the canonical copy of the shared span
    (0, "u0 u1 alpha beta gamma delta epsilon zeta u2 u3"),
    # doc 1 repeats the span mid-text: span removed here
    (1, "w0 w1 w2 alpha beta gamma delta epsilon zeta w3"),
    # doc 2 repeats it twice -> both occurrences removed
    (2, "alpha beta gamma delta epsilon zeta x0 alpha beta gamma delta epsilon zeta"),
    # doc 3: shorter than k, untouched
    (3, "tiny doc"),
    # doc 4: no duplication
    (4, "q0 q1 q2 q3 q4 q5 q6 q7 q8"),
]


def _df(spark, rows=FIX):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_removal_matches_bruteforce(spark):
    k = 6
    got = {
        r["doc_id"]: (r["clean_text"], r["removed_tokens"])
        for r in spandedup.remove_duplicate_spans(
            _df(spark), "doc_id", "text", k=k
        ).collect()
    }
    assert got == _brute_remove(FIX, k)
    # the planted span survives exactly once, in the canonical doc 0
    assert "alpha beta gamma" in got[0][0]
    assert "alpha" not in got[1][0] and "alpha" not in got[2][0]
    assert got[3] == ("tiny doc", 0)
    assert got[4][1] == 0


def test_hash_grams_same_answer(spark):
    k = 6
    plain = spandedup.remove_duplicate_spans(
        _df(spark), "doc_id", "text", k=k
    )
    hashed = spandedup.remove_duplicate_spans(
        _df(spark), "doc_id", "text", k=k, hash_grams=True
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, hashed.collect())
    )


def test_spans_merge_overlapping_windows(spark):
    spans = {}
    for r in spandedup.duplicate_spans(
        _df(spark), "doc_id", "text", k=5
    ).collect():
        spans.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"])
        )
    # doc 0 holds the canonical copy: no spans there
    assert 0 not in spans and 3 not in spans and 4 not in spans
    # doc 1: two overlapping dup 5-gram windows (pos 3, 4) merge into
    # ONE maximal span over alpha..zeta at token positions 3..8
    assert spans[1] == {(3, 8)}
    # doc 2 repeats the span twice with a gap token between -> two
    # disjoint maximal spans
    assert spans[2] == {(0, 5), (7, 12)}


def test_everything_duplicated_doc_empties(spark):
    rows = [(0, "a b c d e f"), (1, "a b c d e f")]
    got = {
        r["doc_id"]: (r["clean_text"], r["removed_tokens"])
        for r in spandedup.remove_duplicate_spans(
            _df(spark, rows), "doc_id", "text", k=6
        ).collect()
    }
    assert got[0] == ("a b c d e f", 0)
    assert got[1] == ("", 6)


def test_hot_anchor_cap_drops_and_audits(spark):
    # the same 6-gram planted in 5 docs: freq 5 > cap 3 -> dropped
    rows = [(i, f"p{i} alpha beta gamma delta epsilon zeta s{i}")
            for i in range(5)]
    rows.append((9, "z0 z1 rare span of six whole toks z2"))
    rows.append((10, "y0 y1 rare span of six whole toks y2"))
    k = 6
    capped = {
        r["doc_id"]: r["removed_tokens"]
        for r in spandedup.remove_duplicate_spans(
            _df(spark, rows), "doc_id", "text", k=k, max_anchor_freq=3
        ).collect()
    }
    assert capped == {
        d: n for d, (_t, n) in _brute_remove(rows, k, cap=3).items()
    }
    # the hot anchor was NOT removed anywhere; the rare one was
    assert all(capped[i] == 0 for i in range(5))
    assert capped[10] == 6 and capped[9] == 0
    # audit names the hot gram with its frequency
    top = spandedup.anchor_frequencies(
        _df(spark, rows), "doc_id", "text", k=k
    ).first()
    assert top["freq"] == 5 and "alpha" in top["gram"]


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k must be"):
        spandedup.remove_duplicate_spans(
            _df(spark), "doc_id", "text", k=1
        ).collect()


def _brute_against(batch, corpus, k, cap=None):
    """Reference: corpus grams always win; batch-internal dups keep
    the batch-first occurrence."""
    from collections import defaultdict

    cg = defaultdict(int)
    for _d, t in corpus:
        toks = t.split()
        for i in range(len(toks) - k + 1):
            cg[" ".join(toks[i : i + k])] += 1
    cgrams = {
        g for g, n in cg.items() if cap is None or n <= cap
    }
    toks = {d: t.split() for d, t in batch}
    occ = defaultdict(list)
    for d, t in toks.items():
        for i in range(len(t) - k + 1):
            occ[" ".join(t[i : i + k])].append(d * B + i)
    covered = defaultdict(set)
    for g, keys in occ.items():
        hits = set()
        if g in cgrams:
            hits.update(keys)
        if len(keys) >= 2 and (cap is None or len(keys) <= cap):
            canon = min(keys)
            hits.update(kk for kk in keys if kk != canon)
        for key in hits:
            d, i = divmod(key, B)
            covered[d].update(range(i, i + k))
    out = {}
    for d, t in toks.items():
        keep = [tok for i, tok in enumerate(t) if i not in covered[d]]
        out[d] = (" ".join(keep), len(t) - len(keep))
    return out


def test_incremental_against_matches_bruteforce(spark):
    k = 6
    corpus = [
        (100, "c0 c1 alpha beta gamma delta epsilon zeta c2"),
        (101, "c3 c4 c5 c6 c7 c8"),
    ]
    batch = [
        # span exists in corpus -> removed here (corpus copy survives)
        (0, "b0 b1 alpha beta gamma delta epsilon zeta b2"),
        # batch-internal duplicate: doc 1 keeps it, doc 2 loses it
        (1, "x0 one two three four five six x1"),
        (2, "y0 y1 one two three four five six"),
        # clean doc
        (3, "q0 q1 q2 q3 q4 q5 q6"),
    ]
    got = {
        r["doc_id"]: (r["clean_text"], r["removed_tokens"])
        for r in spandedup.remove_duplicate_spans_against(
            _df(spark, batch), _df(spark, corpus), "doc_id", "text", k=k
        ).collect()
    }
    assert got == _brute_against(batch, corpus, k)
    assert got[0][1] == 6 and "alpha" not in got[0][0]
    assert got[1][1] == 0 and got[2][1] == 6
    assert got[3][1] == 0


def test_incremental_corpus_cap_drops_boilerplate(spark):
    k = 6
    corpus = [(100 + i, "hot span of six whole toks") for i in range(5)]
    batch = [(0, "b0 hot span of six whole toks b1")]
    capped = spandedup.remove_duplicate_spans_against(
        _df(spark, batch), _df(spark, corpus), "doc_id", "text",
        k=k, max_anchor_freq=3,
    ).collect()[0]
    assert capped["removed_tokens"] == 0  # freq 5 > cap 3: dropped
    uncapped = spandedup.remove_duplicate_spans_against(
        _df(spark, batch), _df(spark, corpus), "doc_id", "text", k=k
    ).collect()[0]
    assert uncapped["removed_tokens"] == 6


def test_duplicate_ids_fail_fast(spark):
    """r9 review: a non-unique id_col would silently interleave two
    documents' token streams into one corrupted clean_text — the
    public entry points must refuse up front."""
    rows = [
        (1, "a b c d e f g h"),
        (1, "p q r s t u v w"),
        (2, "x0 x1 x2 x3 x4 x5 x6 x7"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in (
        spandedup.remove_duplicate_spans,
        spandedup.duplicate_spans,
    ):
        with pytest.raises(ValueError, match="must uniquely identify"):
            fn(df, "doc_id", "text", k=4)
    with pytest.raises(ValueError, match="must uniquely identify"):
        spandedup.remove_duplicate_spans_against(
            df, _df(spark), "doc_id", "text", k=4
        )
    # duplicate CORPUS ids are harmless (gram set only) and a caller
    # that guarantees uniqueness can opt out of the probe
    ok = spandedup.remove_duplicate_spans_against(
        spark.createDataFrame(
            [(9, "m0 m1 m2 m3 m4 m5 m6")], "doc_id long, text string"
        ),
        df,
        "doc_id",
        "text",
        k=4,
    ).collect()
    assert len(ok) == 1
    assert (
        spandedup.remove_duplicate_spans(
            spark.createDataFrame(
                [(9, "m0 m1 m2 m3 m4 m5 m6")], "doc_id long, text string"
            ),
            "doc_id",
            "text",
            k=4,
            check_unique_ids=False,
        ).count()
        == 1
    )


def test_string_doc_ids_supported(spark):
    """r9 review: the canonical key is a struct min, not a numeric
    cast — string ids must dedup, not silently no-op (a long cast of
    'doc-1' is NULL, which used to void every removal)."""
    rows = [
        ("doc-b", "x0 x1 alpha beta gamma delta epsilon zeta"),
        ("doc-a", "alpha beta gamma delta epsilon zeta y0 y1"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: r["removed_tokens"]
        for r in spandedup.remove_duplicate_spans(
            df, "doc_id", "text", k=6
        ).collect()
    }
    # 'doc-a' < 'doc-b': the lexicographically-first doc keeps the span
    assert got == {"doc-a": 0, "doc-b": 6}
