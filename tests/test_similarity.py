"""Similarity-search operators: exact top-k vs numpy oracle, LSH recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import similarity


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    m = rng.standard_normal((60, 8)).astype("float32")
    # plant a near-duplicate of vector 0
    m[59] = m[0] + rng.standard_normal(8).astype("float32") * 0.01
    rows = [(i, [float(x) for x in m[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    return df, m


def np_topk(m, qi, k):
    sims = (m @ m[qi]) / (np.linalg.norm(m, axis=1) * np.linalg.norm(m[qi]))
    order = sorted(
        (i for i in range(len(m)) if i != qi),
        key=lambda i: (-round(float(sims[i]), 6), i),
    )
    return order[:k]


def test_cosine_topk_matches_numpy(vecs):
    df, m = vecs
    qs = df.filter(F.col("vec_id") < 3)
    out = similarity.cosine_topk(df, qs, "embedding", "vec_id", "vec_id", k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for qid in range(3):
        nbrs = [n for _, n in sorted(got[qid])]
        assert nbrs == np_topk(m.astype("float64"), qid, 5)


def test_cosine_topk_finds_planted_dup(vecs):
    df, _ = vecs
    qs = df.filter(F.col("vec_id") == 0)
    out = similarity.cosine_topk(df, qs, "embedding", "vec_id", "vec_id", k=1)
    row = out.collect()[0]
    assert row.neighbor_id == 59
    assert row.cosine > 0.99


def test_blocked_topk_identical_to_catalyst(vecs):
    df, _ = vecs
    qs = df.filter(F.col("vec_id") < 4)
    a = similarity.cosine_topk(df, qs, "embedding", "vec_id", "vec_id", k=6)
    b = similarity.cosine_topk_blocked(
        df.repartition(5), qs, "embedding", "vec_id", "vec_id", k=6
    )
    ka = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in a.collect()}
    kb = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in b.collect()}
    assert ka == kb


def test_cosine_pairs_matches_numpy_all_blockings(vecs):
    df, m = vecs
    md = m.astype("float64")
    sims = (md @ md.T) / np.outer(
        np.linalg.norm(md, axis=1), np.linalg.norm(md, axis=1)
    )
    expected = {
        (i, j, round(float(sims[i, j]), 6))
        for i in range(60)
        for j in range(i + 1, 60)
        if round(float(sims[i, j]), 6) >= 0.3
    }
    # pair set must be identical for any blocking factor (1 = single
    # tile, 7 = uneven blocks, default = count-derived)
    for nb in (1, 7, None):
        out = similarity.cosine_pairs(
            df, "embedding", "vec_id", 0.3, num_blocks=nb
        )
        got = {(r.id_a, r.id_b, r.cosine) for r in out.collect()}
        assert got == expected, f"num_blocks={nb}"


def _patchable_df_class():
    # patching pyspark.sql.DataFrame is a no-op in Spark 4: the classic
    # session returns pyspark.sql.classic.dataframe.DataFrame, which
    # OVERRIDES collect/toPandas — patch the concrete class
    try:
        from pyspark.sql.classic.dataframe import DataFrame

        return DataFrame
    except ImportError:  # older pyspark: one concrete class
        from pyspark.sql import DataFrame

        return DataFrame


def test_patch_target_is_effective(spark, monkeypatch):
    # meta-guard: if this stops intercepting, every no-collect test
    # below is vacuous
    cls = _patchable_df_class()

    def boom(self, *a, **k):
        raise AssertionError("intercepted")

    monkeypatch.setattr(cls, "collect", boom)
    try:
        spark.range(1).collect()
        assert False, "collect patch did not intercept"
    except AssertionError as e:
        assert "intercepted" in str(e)


def test_cosine_pairs_never_collects_corpus(vecs, monkeypatch):
    # 100 TB guard: building the pair plan must not pull rows to the
    # driver (VERDICT r1 #1) — collect/toPandas/broadcast are banned
    # during plan construction
    df, _ = vecs
    cls = _patchable_df_class()

    def boom(self, *a, **k):
        raise AssertionError("driver-side corpus materialization")

    monkeypatch.setattr(cls, "collect", boom)
    monkeypatch.setattr(cls, "toPandas", boom)
    plan = similarity.cosine_pairs(
        df, "embedding", "vec_id", 0.9, num_blocks=4
    )
    assert "id_a" in plan.columns


def test_lsh_pairs_find_planted_dup(vecs):
    df, _ = vecs
    pairs = similarity.random_hyperplane_lsh_pairs(
        df, "embedding", "vec_id", dim=8, bits=6, tables=6, seed=5
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 59) in got
    # and it's far from exhaustive: candidates << all pairs
    assert len(got) < 60 * 59 / 2 / 2


def test_ivf_topk_recall(vecs):
    df, m = vecs
    qs = df.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(df, qs, "embedding", "vec_id", "vec_id", k=3)
    ivf = similarity.ivf_topk(
        df, qs, "embedding", "vec_id", "vec_id", k=3,
        num_centroids=8, nprobe=4, seed=3,
    )
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    iv = {}
    for r in ivf.collect():
        iv.setdefault(r.query_id, set()).add(r.neighbor_id)
    # probing half the cells must recover most of the exact top-3
    hits = sum(len(ex[q] & iv.get(q, set())) for q in ex)
    total = sum(len(v) for v in ex.values())
    assert hits / total >= 0.6
    # and the planted near-dup of query 0 must be found
    assert 59 in iv[0]


def test_ivf_topk_fit_is_sampled(vecs):
    # the KMeans fit input must be bounded by fit_sample_rows (hash
    # TakeOrdered) — a tiny cap must still produce a working index
    df, _ = vecs
    qs = df.filter(F.col("vec_id") < 3)
    out = similarity.ivf_topk(
        df, qs, "embedding", "vec_id", "vec_id", k=3,
        num_centroids=4, nprobe=4, seed=3, fit_sample_rows=16,
    )
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(got) == {0, 1, 2}
    assert all(len(v) == 3 for v in got.values())
    # nprobe == num_centroids probes every cell -> exact results even
    # though the quantizer only saw 16 training rows
    exact = similarity.cosine_topk(df, qs, "embedding", "vec_id", "vec_id", k=3)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert {q: set(v) for q, v in got.items()} == ex


def test_ivf_topk_flat_full_probe_is_exact(vecs):
    # probing every cell must reduce the flat IVF to exact top-k
    df, _ = vecs
    qs = df.filter(F.col("vec_id") < 3)
    exact = similarity.cosine_topk(df, qs, "embedding", "vec_id", "vec_id", k=3)
    ivf = similarity.ivf_topk_flat(
        df, qs, "embedding", "vec_id", "vec_id", k=3,
        num_centroids=8, nprobe=8,
    )
    ke = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in exact.collect()}
    ki = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in ivf.collect()}
    assert ke == ki


def test_ivf_topk_flat_finds_planted_dup(vecs):
    df, _ = vecs
    qs = df.filter(F.col("vec_id") == 0)
    out = similarity.ivf_topk_flat(
        df, qs, "embedding", "vec_id", "vec_id", k=1,
        num_centroids=6, nprobe=3,
    )
    rows = out.collect()
    # near-dup 59 is ~identical to query 0 → same cell → found
    assert rows and rows[0].neighbor_id == 59


def test_lsh_topk_recovers_exact_top1(vecs):
    df, m = vecs
    qs = df.filter(F.col("vec_id") == 0)
    out = similarity.lsh_topk(
        df, qs, "embedding", "vec_id", "vec_id", dim=8, k=1,
        bits=4, tables=8, seed=5,
    )
    assert out.collect()[0].neighbor_id == 59

def test_blocked_topk_large_q_tiled_path_identical(vecs, monkeypatch):
    # |Q| above the collect threshold takes the 2-D tiled path: results
    # must be identical to the broadcast path, and the only driver
    # fetch allowed during construction is the BOUNDED guard probe
    # (a plan with a limit) — never the full query set (VERDICT r1 #10)
    df, _ = vecs
    qs = df.filter(F.col("vec_id") < 4)
    small_q = similarity.cosine_topk_blocked(
        df, qs, "embedding", "vec_id", "vec_id", k=6
    )
    ka = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in small_q.collect()}

    cls = _patchable_df_class()
    real_collect = cls.collect

    def bounded_only_collect(self, *a, **k):
        plan = self._jdf.queryExecution().logical().toString()
        assert "GlobalLimit" in plan, "unbounded driver-side collect"
        return real_collect(self, *a, **k)

    def no_topandas(self, *a, **k):
        raise AssertionError("driver-side query-set materialization")

    monkeypatch.setattr(cls, "collect", bounded_only_collect)
    monkeypatch.setattr(cls, "toPandas", no_topandas)
    tiled = similarity.cosine_topk_blocked(
        df,
        qs,
        "embedding",
        "vec_id",
        "vec_id",
        k=6,
        max_collect_queries=2,  # force the tiled path (|Q| = 4)
        query_block_rows=3,  # several query blocks
        corpus_block_rows=25,  # several corpus blocks
    )
    monkeypatch.setattr(cls, "collect", real_collect)
    kb = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in tiled.collect()}
    assert ka == kb


def test_ivf_topk_large_q_distributed_probes_identical(vecs):
    # same query set through both probe paths -> identical neighbors
    df, _ = vecs
    qs = df.filter(F.col("vec_id") < 5)
    kwargs = dict(k=3, num_centroids=8, nprobe=4, seed=3)
    a = similarity.ivf_topk(df, qs, "embedding", "vec_id", "vec_id", **kwargs)
    b = similarity.ivf_topk(
        df, qs, "embedding", "vec_id", "vec_id", max_collect_queries=2, **kwargs
    )
    ka = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in a.collect()}
    kb = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in b.collect()}
    assert ka == kb


def test_zero_vectors_never_match_and_never_throw(spark):
    # cosine is undefined for zero vectors; under Spark 4 ANSI mode a
    # raw norm division throws DIVIDE_BY_ZERO — the scored paths must
    # instead exclude zero vectors (NULL cosine filtered)
    rows = [(0, [1.0, 2.0]), (1, [0.0, 0.0]), (2, [2.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    qs = df.filter("vec_id = 0")
    got = similarity.cosine_topk(df, qs, "embedding", "vec_id", "vec_id", k=5).collect()
    assert [r.neighbor_id for r in got] == [2]  # zero vector absent
    # zero vector AS the query: no matches, no error
    zq = df.filter("vec_id = 1")
    assert (
        similarity.cosine_topk(df, zq, "embedding", "vec_id", "vec_id", k=5).count()
        == 0
    )
    flat = similarity.ivf_topk_flat(
        df, qs, "embedding", "vec_id", "vec_id", k=5, num_centroids=2, nprobe=2
    ).collect()
    assert 1 not in {r.neighbor_id for r in flat}


def test_zero_vectors_excluded_in_blocked_and_tiled_paths(spark):
    # the numpy kernels must drop NaN sims from zero-norm vectors, not
    # emit them as NULL-cosine rows when k exceeds finite candidates
    rows = [(0, [1.0, 2.0]), (1, [1.9, 1.1]), (2, [2.0, 1.0]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    qs = df.filter("vec_id = 0")
    exact = similarity.cosine_topk(
        df, qs, "embedding", "vec_id", "vec_id", k=5
    ).collect()
    blocked = similarity.cosine_topk_blocked(
        df, qs, "embedding", "vec_id", "vec_id", k=5
    ).collect()
    tiled = similarity.cosine_topk_blocked(
        df, qs, "embedding", "vec_id", "vec_id", k=5, max_collect_queries=0
    ).collect()
    want = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in exact}
    for got in (blocked, tiled):
        assert all(r.cosine is not None for r in got)
        assert {
            (r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in got
        } == want
    # zero vector AS the query: empty, not NULL rows
    zq = df.filter("vec_id = 3")
    assert (
        similarity.cosine_topk_blocked(
            df, zq, "embedding", "vec_id", "vec_id", k=5
        ).count()
        == 0
    )


def test_embedding_neardup_clusters_planted(spark):
    # 0/1 nearly identical, 2 close to them, 3/4 a second pair, 5 alone
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),
        (2, [0.95, 0.3, 0.05]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.01, 0.999, 0.0]),
        (5, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    got = {
        r.vec_id: r.cluster_id
        for r in similarity.embedding_neardup_clusters(
            df, "embedding", "vec_id", 0.9, num_blocks=2
        ).collect()
    }
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3
    assert got[5] == 5
    # survivors: one per cluster
    assert {v for v, c in got.items() if v == c} == {0, 3, 5}


@pytest.fixture()
def no_auto_broadcast(spark):
    # silence AQE/static auto-broadcast so any BroadcastHashJoin in the
    # plan can only come from an explicit F.broadcast hint
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {}
    for key in keys:
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, "-1")
    yield
    for key, v in old.items():
        if v is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, v)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_ann_large_q_never_broadcasts_query_side(
    vecs, tmp_path, no_auto_broadcast
):
    # Above max_collect_queries every ANN entry point must fall back to
    # a plain shuffle equijoin: a broadcast of the query-probe frame
    # materializes wholly on every executor and OOMs at scale —
    # precisely on the branch built for large Q. max_collect_queries=0
    # forces the fallback; results must match the broadcast path.
    df, _ = vecs
    qs = df.filter(F.col("vec_id") < 3)

    def pairs(frame):
        return {
            (r.query_id, r.rank): (r.neighbor_id, r.cosine)
            for r in frame.collect()
        }

    flat_small = similarity.ivf_topk_flat(
        df, qs, "embedding", "vec_id", "vec_id", k=3, num_centroids=6, nprobe=2
    )
    flat_large = similarity.ivf_topk_flat(
        df, qs, "embedding", "vec_id", "vec_id", k=3, num_centroids=6,
        nprobe=2, max_collect_queries=0,
    )
    assert "BroadcastHashJoin" in _plan(flat_small)
    assert "BroadcastHashJoin" not in _plan(flat_large)
    assert pairs(flat_small) == pairs(flat_large) and pairs(flat_small)

    lsh_small = similarity.lsh_topk(
        df, qs, "embedding", "vec_id", "vec_id", dim=8, k=3, bits=4, tables=2
    )
    lsh_large = similarity.lsh_topk(
        df, qs, "embedding", "vec_id", "vec_id", dim=8, k=3, bits=4,
        tables=2, max_collect_queries=0,
    )
    assert "BroadcastHashJoin" in _plan(lsh_small)
    assert "BroadcastHashJoin" not in _plan(lsh_large)
    assert pairs(lsh_small) == pairs(lsh_large) and pairs(lsh_small)

    idx = similarity.IvfDiskIndex.build(
        df, "embedding", "vec_id", str(tmp_path / "ivf_guard"), num_centroids=6
    )
    disk_small = idx.search(qs, "embedding", "vec_id", k=3, nprobe=2)
    disk_large = idx.search(
        qs, "embedding", "vec_id", k=3, nprobe=2, max_collect_queries=0
    )
    assert "BroadcastHashJoin" in _plan(disk_small)
    assert "BroadcastHashJoin" not in _plan(disk_large)
    assert pairs(disk_small) == pairs(disk_large) and pairs(disk_small)


def test_ivf_disk_index_matches_flat_and_prunes(vecs, tmp_path):
    # the persisted index must return EXACTLY ivf_topk_flat's results
    # (same cell scheme), and its search scan must carry a partition
    # filter on the probed cells only
    df, _ = vecs
    qs = df.filter(F.col("vec_id") < 3)
    idx = similarity.IvfDiskIndex.build(
        df, "embedding", "vec_id", str(tmp_path / "ivf"), num_centroids=6
    )
    got = idx.search(qs, "embedding", "vec_id", k=3, nprobe=2)
    flat = similarity.ivf_topk_flat(
        df, qs, "embedding", "vec_id", "vec_id", k=3,
        num_centroids=6, nprobe=2,
    )
    kg = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in got.collect()}
    kf = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in flat.collect()}
    assert kg == kf and kg
    # static partition pruning: the scan reads only probed cell dirs
    txt = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in txt and "_cluster" in txt
    # reload from disk and search again: same answer
    reloaded = similarity.IvfDiskIndex(df.sparkSession, str(tmp_path / "ivf"))
    kr = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in reloaded.search(
            qs, "embedding", "vec_id", k=3, nprobe=2
        ).collect()
    }
    assert kr == kg


def test_cosine_topk_large_q_reroutes_to_blocked(vecs, no_auto_broadcast):
    # above max_broadcast_queries the exact path must hand off to the
    # blocked/tiled variant instead of broadcasting an unbounded query
    # frame; results stay identical
    df, _ = vecs
    qs = df.filter(F.col("vec_id") < 4)
    small = similarity.cosine_topk(df, qs, "embedding", "vec_id", "vec_id", k=5)
    large = similarity.cosine_topk(
        df, qs, "embedding", "vec_id", "vec_id", k=5, max_broadcast_queries=2
    )
    ks = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in small.collect()}
    kl = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in large.collect()}
    assert ks == kl and ks
    # the rerouted plan never broadcast-joins the raw query frame
    assert "BroadcastHashJoin" not in _plan(large)


def test_bounded_broadcast_join_above_cap_single_pass(spark):
    # above the cap, the query-side subplan must be evaluated ONCE:
    # the guard probe already executed it, so the join must read the
    # persisted copy (InMemoryTableScan), not recompute the pipeline
    from dataset_grouper_spark.cache import release_intermediates

    left = spark.range(100).withColumnRenamed("id", "k")
    right = (
        spark.range(10)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k") * 2)
    )
    over = similarity._bounded_broadcast_join(left, right, "k", 3)
    assert "InMemoryTableScan" in _plan(over)
    assert over.count() == 10
    # below the cap: the local relation replaces `right`, is broadcast,
    # and the probe's cache is dropped eagerly (no cache scan lingers)
    under = similarity._bounded_broadcast_join(left, right, "k", 50)
    p = _plan(under)
    assert "BroadcastHashJoin" in p and "InMemoryTableScan" not in p
    assert under.count() == 10
    release_intermediates()


def test_mmr_rerank_diversifies(spark):
    # corpus: two near-identical vectors (a, b) highly relevant, one
    # orthogonal-ish vector (c) less relevant. Plain top-3 ranks a,b,c;
    # MMR at lam=0.5 must promote c to rank 2 (b is redundant with a).
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id: long, embedding: array<double>",
    )
    cands = spark.createDataFrame(
        [(100, 1, 0.95), (100, 2, 0.94), (100, 3, 0.50)],
        "query_id: long, neighbor_id: long, cosine: double",
    )
    out = similarity.mmr_rerank(
        cands, vecs, "embedding", "vec_id", select_k=3, lam=0.5
    ).collect()
    by_rank = {r["mmr_rank"]: r["neighbor_id"] for r in out}
    assert by_rank == {1: 1, 2: 3, 3: 2}


def test_mmr_rerank_matches_python_golden(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [(i, rng.normal(size=8).tolist()) for i in range(30)]
    vdf = spark.createDataFrame(vecs, "vec_id: long, embedding: array<double>")
    # two query groups with 10 candidates each, synthetic relevance
    cands = [
        (q, i, round(1.0 - 0.03 * i + 0.001 * ((i * q) % 5), 6))
        for q in (500, 501)
        for i in range(10)
    ]
    cdf = spark.createDataFrame(
        cands, "query_id: long, neighbor_id: long, cosine: double"
    )
    got = {
        (r["query_id"], r["mmr_rank"]): r["neighbor_id"]
        for r in similarity.mmr_rerank(
            cdf, vdf, "embedding", "vec_id", select_k=5, lam=0.7
        ).collect()
    }

    # pure-python reference
    V = {i: np.array(v) for i, v in vecs}

    def cos(a, b):
        return float(
            V[a] @ V[b] / (np.linalg.norm(V[a]) * np.linalg.norm(V[b]))
        )

    for q in (500, 501):
        pool = sorted(
            [(i, rel) for (qq, i, rel) in cands if qq == q],
            key=lambda t: (-t[1], t[0]),
        )
        sel = []
        rem = [i for i, _ in pool]
        rel = dict(pool)
        for rank in range(1, 6):
            if not sel:
                best = rem[0]
            else:
                scored = [
                    (
                        round(
                            0.7 * rel[i]
                            - 0.3 * max(cos(i, s) for s in sel),
                            12,
                        ),
                        pos,
                        i,
                    )
                    for pos, i in enumerate(rem)
                ]
                best = max(scored, key=lambda t: (t[0], -t[1]))[2]
            sel.append(best)
            rem.remove(best)
            assert got[(q, rank)] == best, (q, rank, sel)


def test_mmr_rerank_composes_with_cosine_topk(spark):
    rng_rows = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(6)]) for i in range(40)
    ]
    df = spark.createDataFrame(rng_rows, "vec_id: long, embedding: array<double>")
    topk = similarity.cosine_topk(
        df, df.limit(4), "embedding", "vec_id", "vec_id", k=8
    )
    out = similarity.mmr_rerank(
        topk, df, "embedding", "vec_id", select_k=4, lam=0.6
    )
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["mmr_rank"])
    assert set(per_q) == {0, 1, 2, 3}
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3, 4]


def test_mmr_rejects_bad_lambda(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, [1.0])], "vec_id: long, embedding: array<double>")
    c = spark.createDataFrame([(1, 1, 0.5)], "query_id: long, neighbor_id: long, cosine: double")
    with _pytest.raises(ValueError):
        similarity.mmr_rerank(c, df, "embedding", "vec_id", lam=1.5)


def test_embedding_neardup_clusters_id_column_named_id(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0001]), (3, [0.0, 1.0])],
        "id: long, embedding: array<double>",
    )
    out = {
        r["id"]: r["cluster_id"]
        for r in similarity.embedding_neardup_clusters(
            df, "embedding", "id", threshold=0.999
        ).collect()
    }
    assert out[1] == out[2] == 1
    assert out[3] == 3


def test_cosine_topk_blocked_empty_queries(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id: long, embedding: array<double>",
    )
    empty = corpus.filter("vec_id < 0")
    out = similarity.cosine_topk_blocked(
        corpus, empty, "embedding", "vec_id", "vec_id", k=3
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_cosine_pairs_cells_full_probe_equals_exact(vecs):
    # probe == num_cells puts every vector in every cell: the cell
    # variant must then equal the exact triangle join EXACTLY — and
    # each pair must surface exactly once (canonical-cell dedup)
    df, _ = vecs
    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs(
            df, "embedding", "vec_id", 0.3, num_blocks=3
        ).collect()
    }
    rows = similarity.cosine_pairs_cells(
        df, "embedding", "vec_id", 0.3, num_cells=4, probe=4,
        target_block_rows=16,
    ).collect()
    got = [(r.id_a, r.id_b, r.cosine) for r in rows]
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == exact


def test_cosine_pairs_cells_single_cell_equals_exact(vecs):
    df, _ = vecs
    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs(
            df, "embedding", "vec_id", 0.3
        ).collect()
    }
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3, num_cells=1
        ).collect()
    }
    assert got == exact


def test_cosine_pairs_cells_probe1_subset_and_planted(vecs):
    # probe=1 (published SemDeDup shape): a SUBSET of the exact pair
    # set; near-identical vectors quantize into the same cell, so the
    # planted dup (0, 59) must be found
    df, _ = vecs
    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs(
            df, "embedding", "vec_id", 0.3
        ).collect()
    }
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3, num_cells=6
        ).collect()
    }
    assert got <= exact
    assert any(a == 0 and b == 59 for a, b, _c in got)
    # probe=2 rider can only ADD boundary pairs, still a subset
    got2 = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3, num_cells=6, probe=2
        ).collect()
    }
    assert got <= got2 <= exact


def test_cosine_pairs_cells_probe_validation(vecs):
    df, _ = vecs
    with pytest.raises(ValueError, match="probe"):
        similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3, num_cells=4, probe=0
        )
    with pytest.raises(ValueError, match="probe"):
        similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3, num_cells=4, probe=5
        )


def test_cosine_pairs_cells_never_collects_corpus(vecs, monkeypatch):
    # 100 TB guard: the ONLY driver-side pull during plan construction
    # is the bounded centroid collect (one row per CELL — planning
    # scale); per-cell block counts ride a broadcast JOIN, and the
    # corpus itself never reaches the driver
    df, _ = vecs
    cls = _patchable_df_class()
    orig = cls.collect
    sizes = []

    def spy(self, *a, **k):
        rows = orig(self, *a, **k)
        sizes.append(len(rows))
        return rows

    def boom(self, *a, **k):
        raise AssertionError("driver-side corpus materialization")

    monkeypatch.setattr(cls, "collect", spy)
    monkeypatch.setattr(cls, "toPandas", boom)
    plan = similarity.cosine_pairs_cells(
        df, "embedding", "vec_id", 0.9, num_cells=4
    )
    assert "id_a" in plan.columns
    assert sizes == [4], f"unexpected driver pulls: {sizes}"


def test_embedding_neardup_clusters_cell_mode(spark):
    # the corpus-scale mode: near-identical vectors land in one cell,
    # so the planted clusters still resolve; singletons label selves
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),
        (2, [0.95, 0.3, 0.05]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.01, 0.999, 0.0]),
        (5, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    got = {
        r.vec_id: r.cluster_id
        for r in similarity.embedding_neardup_clusters(
            df, "embedding", "vec_id", 0.9, num_cells=3, probe=2
        ).collect()
    }
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3
    assert got[5] == 5


def test_cosine_pairs_cells_auto_sizing(vecs):
    # auto mode (num_cells=None): cells derive from a distributed
    # count at target_cell_rows occupancy — the corpus-scale setting.
    # 60 vectors at the default target -> 1 cell -> exact; at
    # target 16 -> 4 cells -> a subset with probe clamped sanely
    df, _ = vecs
    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs(
            df, "embedding", "vec_id", 0.3
        ).collect()
    }
    auto_one = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3
        ).collect()
    }
    assert auto_one == exact
    sub = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3, probe=2,
            target_cell_rows=16,
        ).collect()
    }
    assert sub <= exact
    assert any(a == 0 and b == 59 for a, b, _c in sub)
    # probe clamps to the derived cell count instead of raising
    assert (
        similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3, probe=99,
            target_cell_rows=4096,
        ).count()
        == len(exact)
    )


# ---- two-level coarse quantizer (VERDICT r11 task 1) ----


def _twolevel(df, threshold=0.3, **kw):
    kw.setdefault("num_cells", 12)
    kw.setdefault("probe", 2)
    kw.setdefault("two_level_threshold", 4)
    kw.setdefault("coarse_probe", 2)
    return similarity.cosine_pairs_cells(
        df, "embedding", "vec_id", threshold, **kw
    )


def test_twolevel_full_coarse_probe_equals_single_level(vecs):
    # coarse_probe >= coarse count means every vector sees EVERY fine
    # centroid as a candidate, so the two-level argmin degenerates to
    # the single-level exact argmin — results must match exactly
    df, _ = vecs
    single = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3, num_cells=12, probe=2
        ).collect()
    }
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in _twolevel(df, coarse_probe=12).collect()
    }
    assert got == single


def test_twolevel_subset_of_exact_and_planted_dup(vecs):
    df, _ = vecs
    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.cosine_pairs(
            df, "embedding", "vec_id", 0.3
        ).collect()
    }
    got = {(r.id_a, r.id_b, r.cosine) for r in _twolevel(df).collect()}
    assert got <= exact
    assert any(a == 0 and b == 59 for a, b, _c in got)


def test_twolevel_salting_invariant(vecs):
    # forcing many salt buckets (7 rows per assignment task) must not
    # change the result: per-group top-probe winners merge to the same
    # global top-probe whatever the bucketing
    df, _ = vecs
    wide = {(r.id_a, r.id_b, r.cosine) for r in _twolevel(df).collect()}
    salted = {
        (r.id_a, r.id_b, r.cosine)
        for r in _twolevel(df, target_assign_rows=7).collect()
    }
    assert salted == wide


def test_twolevel_pair_emitted_once(vecs):
    df, _ = vecs
    got = [(r.id_a, r.id_b) for r in _twolevel(df).collect()]
    assert len(got) == len(set(got)), "pair emitted more than once"


def test_twolevel_never_collects_corpus(vecs, monkeypatch):
    # 100 TB guard: the ONLY driver-side pull is the bounded COARSE
    # centroid collect (ceil(sqrt(C)) rows) — neither the corpus nor
    # the C fine centroids ever reach the driver
    df, _ = vecs
    cls = _patchable_df_class()
    orig = cls.collect
    sizes = []

    def spy(self, *a, **k):
        rows = orig(self, *a, **k)
        sizes.append(len(rows))
        return rows

    def boom(self, *a, **k):
        raise AssertionError("driver-side corpus materialization")

    monkeypatch.setattr(cls, "collect", spy)
    monkeypatch.setattr(cls, "toPandas", boom)
    plan = _twolevel(df, num_cells=16, coarse_probe=2)
    assert "id_a" in plan.columns
    assert sizes == [4], f"unexpected driver pulls: {sizes}"


def test_twolevel_auto_mode_engages_past_threshold(vecs):
    # auto cell count 60/8 = 8 cells > threshold 4: the two-level tier
    # must engage (observable as the sqrt-C coarse collect) and still
    # find the planted dup
    df, _ = vecs
    got = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.3, probe=2,
            target_cell_rows=8, two_level_threshold=4, coarse_probe=2,
        ).collect()
    }
    assert (0, 59) in got


def test_twolevel_neardup_clusters_passthrough(spark):
    # embedding_neardup_clusters forwards the two-level knobs; planted
    # dup pair must land in one cluster, ids preserved
    rng = np.random.default_rng(5)
    m = rng.standard_normal((40, 8))
    m[39] = m[7] + 1e-4
    rows = [(i, [float(x) for x in m[i]]) for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>"
    )
    out = similarity.embedding_neardup_clusters(
        df, "embedding", "vec_id", 0.99, num_cells="auto", probe=2,
        target_cell_rows=4, two_level_threshold=4, coarse_probe=2,
    )
    lab = {r.vec_id: r.cluster_id for r in out.collect()}
    assert len(lab) == 40
    assert lab[39] == lab[7] == 7


def test_twolevel_empty_coarse_cell(spark):
    # duplicate vectors among the coarse centroids tie-break every
    # fine assignment to the smallest id, leaving the other coarse
    # cells EMPTY — vectors probing an empty cell must not crash the
    # cogroup (r12: the dtype-pinned empty frame; a default float64
    # _vec column failed Arrow's list<float> conversion) and pairing
    # must still find every duplicate pair within the occupied cell
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(12)]
    rows += [(100, [0.0, 1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.001, 0.0])]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>"
    )
    got = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs_cells(
            df, "embedding", "vec_id", 0.99, num_cells=14, probe=2,
            two_level_threshold=4, coarse_probe=2,
        ).collect()
    }
    # all 12 identical vectors pair up; the planted near-dup too
    assert (100, 101) in got
    assert {(a, b) for a in range(12) for b in range(a + 1, 12)} <= got
