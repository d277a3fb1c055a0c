"""Scale stress for the LLM-pipeline tier (slow-marked, run with -m slow).

Each test replicates the sf0.1 synthetic tables well past bench size
and asserts the scale-path operators complete with sane outputs — the
committed evidence that the candidate-generation joins and the as-of
window hold their shape as data grows (plan guards elsewhere pin the
shapes; this pins behavior). Timings recorded in PERF.md.
"""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import dedup, similarity
from dataset_grouper_spark.operators.asof import asof_join
from dataset_grouper_spark.sources import read_table

SF = "/root/testdata/sf0.1"


def _replicate(df, times, id_col, id_stride):
    out = df
    for i in range(1, times):
        out = out.unionAll(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * id_stride))
        )
    return out


@pytest.mark.slow
def test_minhash_lsh_at_16x_documents(spark):
    # 80k docs (16 x 5000): signatures + banded candidates complete;
    # replicas collide with their originals, so the candidate count is
    # at least the replica pairing and far below all-pairs
    docs = _replicate(
        read_table(spark, SF, "documents"), 16, "doc_id", 1_000_000
    )
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", 3, 16, 42)
    cands = dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4)
    n = cands.count()
    n_docs = docs.count()
    assert n_docs == 80_000
    assert n >= 15 * n_docs / 16  # every original pairs with 15 replicas
    assert n < n_docs * 200  # nowhere near quadratic


@pytest.mark.slow
def test_cosine_pairs_blocked_at_4x_embeddings(spark):
    # 20k vectors through the triangle tile join (no driver collect)
    base = read_table(spark, SF, "embeddings")
    n_base = base.count()
    emb = _replicate(base, 4, "vec_id", 1_000_000)
    pairs = similarity.cosine_pairs(emb, "embedding", "vec_id", 0.999)
    n = pairs.count()
    # each replica group (cosine 1.0): C(4,2) pairs per original vector
    assert n >= 6 * n_base


@pytest.mark.slow
def test_asof_join_at_16x_events(spark):
    # 1.6M events, purchases asof-joined to clicks in one window pass
    ev = _replicate(
        read_table(spark, SF, "events"), 16, "event_id", 10_000_000
    ).withColumn("ts_us", F.expr("CAST(ts DIV 1000 AS BIGINT)"))
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", "value"
    )
    out = asof_join(left, right, "ts_us", ["user_id"], ["value"])
    total = out.count()
    matched = out.filter(F.col("value_asof").isNotNull()).count()
    assert total == left.count()
    assert matched > total * 0.9  # dense click history -> most match


@pytest.mark.slow
def test_salted_join_hot_key_at_16x(spark):
    # 1.6M left rows with ONE manufactured 100x-hot key: the salted
    # join must produce aggregates identical to the plain join while
    # spreading the hot key's reducer across the salt sub-keys
    import time

    from dataset_grouper_spark.operators.joins import salted_join

    ev = _replicate(
        read_table(spark, SF, "events"), 16, "event_id", 10_000_000
    )
    # key 0 swallows ~99% of rows; everything else keeps its user
    left = ev.select(
        "event_id",
        F.when(F.col("event_id") % 100 != 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("key"),
        "value",
    )
    right = (
        read_table(spark, SF, "events")
        .select(F.col("user_id").alias("key"))
        .distinct()
        .withColumn("tag", F.concat(F.lit("t"), F.col("key")))
    )
    t0 = time.time()
    plain = (
        left.join(right.hint("shuffle_hash"), ["key"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()[0]
    )
    t_plain = time.time() - t0
    t0 = time.time()
    salted = (
        salted_join(left, right, ["key"], num_salts=32)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()[0]
    )
    t_salted = time.time() - t0
    assert (plain.n, plain.s) == (salted.n, salted.s)
    # record, don't flake: single-host timing noise can swamp the win,
    # but the salted path must never be catastrophically slower
    assert t_salted < t_plain * 3, (t_plain, t_salted)


@pytest.mark.slow
def test_interval_join_at_16x_events(spark):
    # 1.6M points against per-user hour intervals: equijoin on
    # (user, bin) with the span fuse active at its default
    from dataset_grouper_spark.operators.joins import interval_join

    ev = _replicate(
        read_table(spark, SF, "events"), 16, "event_id", 10_000_000
    ).withColumn("ts_us", F.expr("CAST(ts DIV 1000 AS BIGINT)"))
    points = ev.select("event_id", "user_id", "ts_us")
    hour = 3_600_000_000
    intervals = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("ts_us").alias("iv_start"),
            (F.col("ts_us") + hour).alias("iv_end"),
            F.col("event_id").alias("iv_id"),
        )
    )
    out = interval_join(
        points, intervals, "ts_us", "iv_start", "iv_end",
        by=["user_id"], bin_width=hour,
    )
    n = out.count()
    assert n >= intervals.count()  # each interval matches its own point


@pytest.mark.slow
def test_ivf_disk_index_at_4x_embeddings(spark, tmp_path):
    # 20k vectors: build the partitioned index once, then verify a
    # search touches only the probed cells' files (input_file_name
    # cardinality), and matches the in-memory flat IVF exactly
    from dataset_grouper_spark.operators import similarity

    base = read_table(spark, SF, "embeddings")
    emb = _replicate(base, 4, "vec_id", 1_000_000)
    idx = similarity.IvfDiskIndex.build(
        emb, "embedding", "vec_id", str(tmp_path / "ivf"), num_centroids=16
    )
    qs = emb.filter(F.col("vec_id") < 4)
    got = idx.search(qs, "embedding", "vec_id", k=5, nprobe=2)
    rows = got.collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3}
    flat = similarity.ivf_topk_flat(
        emb, qs, "embedding", "vec_id", "vec_id", k=5,
        num_centroids=16, nprobe=2,
    )
    kf = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in flat.collect()}
    kg = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in rows}
    assert kg == kf
    # pruning: probed cells (<= 4 queries x 2 probes) out of 16 dirs
    import os

    dirs = [d for d in os.listdir(tmp_path / "ivf" / "index") if d.startswith("_cluster=")]
    assert len(dirs) >= 12  # the index really is spread over many cells
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


@pytest.mark.slow
def test_streaming_windowed_counts_at_16x(spark, tmp_path):
    # 1.6M events through the availableNow streaming path (watermark +
    # windowed agg + file sink in append mode) must agree with the
    # batch twin on emitted windows
    from dataset_grouper_spark import keys
    from dataset_grouper_spark.streaming import windowed_group_counts

    ev = _replicate(
        read_table(spark, SF, "events"), 16, "event_id", 10_000_000
    )
    src = str(tmp_path / "events_16x")
    ev.write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    tsc = "timestamp_micros(CAST(ts DIV 1000 AS LONG))"
    out = windowed_group_counts(
        stream.withColumn("_tsc", F.expr(tsc)),
        keys.by_feature("event_type"),
        "_tsc",
        window="1 day",
        watermark="1 hour",
        count_cols=batch.columns,
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = spark.read.parquet(sink)
    # batch twin of the emitted set: windows fully below the final
    # watermark (append mode holds back the tail windows)
    bt = (
        batch.withColumn("_tsc", F.expr(tsc))
        .groupBy(
            F.window("_tsc", "1 day").alias("time_window"),
            F.col("event_type").alias("group_id"),
        )
        .agg(F.count(F.lit(1)).alias("num_examples"))
    )
    wm = batch.agg(
        F.expr(f"max({tsc}) - INTERVAL 1 HOUR").alias("w")
    ).collect()[0].w
    expected = {
        (r.time_window.start, r.group_id): r.num_examples
        for r in bt.collect()
        if r.time_window.end <= wm
    }
    actual = {
        (r.time_window.start, r.group_id): r.num_examples
        for r in got.select("time_window", "group_id", "num_examples").collect()
    }
    assert actual == expected and actual


@pytest.mark.slow
def test_streaming_session_windows_at_16x_hot_user(spark, tmp_path):
    # 1.6M events with ONE manufactured hot user holding ~20% of all
    # rows, through the streaming session-window path: state-store skew
    # must not break append-mode emission — results equal the batch
    # session_window twin, and the state operator's row count stays
    # bounded by the session count, not the event count
    from dataset_grouper_spark import keys
    from dataset_grouper_spark.streaming import session_group_counts

    ev = _replicate(
        read_table(spark, SF, "events"), 16, "event_id", 10_000_000
    ).withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(1)).otherwise(
            F.col("user_id")
        ),
    )
    src = str(tmp_path / "events_hot")
    ev.write.parquet(src)
    batch = spark.read.parquet(src)
    assert (
        batch.filter("user_id = 1").count() / batch.count() >= 0.2
    )
    stream = spark.readStream.schema(batch.schema).parquet(src)
    tsc = "timestamp_micros(CAST(ts DIV 1000 AS LONG))"
    out = session_group_counts(
        stream.withColumn("_tsc", F.expr(tsc)),
        keys.by_feature("user_id"),
        "_tsc",
        gap="30 minutes",
        watermark="1 hour",
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "drain timed out"
    state_rows = max(
        (
            so["numRowsTotal"]
            for p in q.recentProgress
            for so in p.get("stateOperators", [])
        ),
        default=0,
    )
    got = spark.read.parquet(sink)
    # batch twin: session_window works in batch groupBy too; append
    # mode emits sessions fully below the final watermark
    bt = (
        batch.withColumn("_tsc", F.expr(tsc))
        .groupBy(
            F.col("user_id").cast("string").alias("group_id"),
            F.session_window(F.col("_tsc"), "30 minutes").alias("session"),
        )
        .agg(F.count(F.lit(1)).alias("num_examples"))
    )
    wm = batch.agg(
        F.expr(f"max({tsc}) - INTERVAL 1 HOUR").alias("w")
    ).collect()[0].w
    all_sessions = {
        (r.group_id, r.session.start, r.session.end): r.num_examples
        for r in bt.collect()
    }
    expected = {
        k: v for k, v in all_sessions.items() if k[2] <= wm
    }
    actual = {
        (r.group_id, r.session.start, r.session.end): r.num_examples
        for r in got.select("group_id", "session", "num_examples").collect()
    }
    assert actual == expected and actual
    # the hot user's dense 320k events merge into session(s) — a
    # mega-session still open at the final watermark stays IN STATE
    # (append mode holds it back), which is precisely the skew shape:
    # it must exist in the batch twin and must not have blown up state
    hot_sessions = [k for k in all_sessions if k[0] == "1"]
    assert hot_sessions
    # state scales with the session count, never the event count
    n_sessions = len(all_sessions)
    assert 0 < state_rows <= n_sessions * 4 + 1000
    assert state_rows < 100_000  # 1.6M events, sessions only


@pytest.mark.slow
def test_compact_partitioned_at_scale(spark, tmp_path):
    # 1M rows / 1000 groups fragmented by three appends, compacted to
    # 2000-row files: every group lands at exactly ceil(rows/target)
    # files, all rows survive, and the index stays consistent
    from dataset_grouper_spark import keys, sinks
    from dataset_grouper_spark.loader import PartitionedDataset

    path = str(tmp_path / "bigfrag")
    mk = lambda lo, hi: (
        spark.range(lo, hi)
        .withColumn("k", (F.col("id") % 1000).cast("string"))
        .withColumn("payload", F.concat(F.lit("p"), F.col("id")))
    )
    sinks.write_partitioned(
        mk(0, 400_000), keys.by_feature("k"), path, order_col="id"
    )
    for lo, hi in ((400_000, 700_000), (700_000, 1_000_000)):
        sinks.append_partitioned(
            mk(lo, hi), keys.by_feature("k"), path, order_col="id"
        )
    stats = sinks.compact_partitioned(
        spark, path, target_rows_per_file=2000, order_col="id"
    )
    assert stats["rows"] == 1_000_000 and stats["groups"] == 1000
    # 1000 rows per group -> ceil(1000/2000) = 1 file each, down from >=3
    assert stats["files_before"] >= 3000
    assert stats["files_after"] == 1000
    pds = PartitionedDataset(spark, path)
    idx = {r.group_id: r.num_examples for r in pds.group_index().collect()}
    assert len(idx) == 1000 and all(v == 1000 for v in idx.values())
    assert pds.group("7").count() == 1000


@pytest.mark.slow
def test_span_dedup_at_8x_documents_with_hot_boilerplate(spark):
    """40k docs (8x sf0.1), every 4th doc carrying the SAME planted
    boilerplate sentence: the gram aggregation must stay
    partial-aggregated (no per-gram window sort to detonate on the
    10k-occurrence anchor) and the cap must bound the join. Asserts
    both the uncapped run (boilerplate removed everywhere but the
    global first) and the capped run (boilerplate ignored)."""
    from dataset_grouper_spark.operators import spandedup

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    big = _replicate(docs, 8, "doc_id", 1_000_000_000 // 8)
    boiler = "terms of service apply to all content on this site"
    big = big.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(boiler + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    n = big.count()
    assert n == 40_000
    uncapped = spandedup.remove_duplicate_spans(
        big, "doc_id", "text", k=8, hash_grams=True
    )
    removed = uncapped.agg(F.sum("removed_tokens")).collect()[0][0]
    # ~10k boilerplate carriers x (>=9 tokens of planted span) minus
    # the single surviving canonical copy
    assert removed >= 9 * (n // 4 - 1)
    capped = spandedup.remove_duplicate_spans(
        big, "doc_id", "text", k=8, hash_grams=True,
        max_anchor_freq=100,
    )
    removed_capped = capped.agg(F.sum("removed_tokens")).collect()[0][0]
    assert removed_capped < removed  # the hot anchor was dropped
    assert capped.count() == n
