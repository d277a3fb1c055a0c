"""PageRank: golden values vs numpy power iteration, mass conservation,
dangling handling, NULL hygiene."""

import numpy as np
import pytest

from dataset_grouper_spark.operators import graph


def _numpy_pagerank(edges, iterations, damping):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in edges:
        outdeg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[idx[b]] += r[idx[a]] / outdeg[idx[a]]
        dang = r[outdeg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dang / n)
    return {v: r[idx[v]] for v in nodes}


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (3, 4),
    (6, 1),  # 6 has no in-edges; 2 has out-edges; add a sink:
    (2, 7),  # 7 is dangling
]


def test_pagerank_matches_power_iteration(spark):
    df = spark.createDataFrame(EDGES, "a: long, b: long")
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, "a", "b", iterations=6).collect()
    }
    want = _numpy_pagerank(EDGES, 6, 0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_mass_conserved(spark):
    df = spark.createDataFrame(EDGES, "a: long, b: long")
    out = graph.pagerank(df, "a", "b", iterations=4)
    total = sum(r["rank"] for r in out.collect())
    assert total == pytest.approx(1.0, abs=1e-12)


def test_pagerank_sink_accumulates(spark):
    # 1->2, 3->2: the sink must outrank its feeders
    df = spark.createDataFrame([(1, 2), (3, 2)], "a: long, b: long")
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, "a", "b", iterations=8).collect()
    }
    assert got[2] > got[1]
    assert got[1] == pytest.approx(got[3], abs=1e-15)


def test_pagerank_drops_null_edges(spark):
    df = spark.createDataFrame(
        [(1, 2), (None, 3), (2, None)], "a: long, b: long"
    )
    out = graph.pagerank(df, "a", "b", iterations=2)
    assert {r["node"] for r in out.collect()} == {1, 2}


def test_pagerank_sql_twin_agrees(spark):
    import duckdb

    df = spark.createDataFrame(EDGES, "a: long, b: long")
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, "a", "b", iterations=5).collect()
    }
    vals = ", ".join(f"({a}, {b})" for a, b in EDGES)
    sql = graph.pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(a, b)", "a", "b", iterations=5
    )
    twin = {
        int(n): float(r) for n, r in duckdb.sql(sql).fetchall()
    }
    assert set(twin) == set(got)
    for v in got:
        assert twin[v] == pytest.approx(got[v], abs=1e-12)


@pytest.mark.slow
def test_pagerank_scale_2m_edges(spark):
    """2M-edge synthetic graph (100k nodes, power-ish fan-out via
    modular hubs): the loop must converge its fixed rounds with mass
    conserved to 1e-9 and the hub outranking leaf nodes."""
    from pyspark.sql import functions as F

    edges = spark.range(2_000_000).select(
        (F.col("id") % 100_000).alias("a"),
        # heavy fan-in to node 0..9 (hubs), rest uniform
        F.when(F.col("id") % 5 == 0, F.col("id") % 10)
        .otherwise((F.col("id") * 7919) % 100_000)
        .alias("b"),
    )
    out = graph.pagerank(edges, "a", "b", iterations=5)
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    assert len(ranks) == 100_000
    total = sum(ranks.values())
    assert total == pytest.approx(1.0, abs=1e-9)
    hub = ranks[0]
    leaf = ranks[99_999]
    assert hub > leaf * 10  # hubs concentrate rank


# ---------------------------------------------------------- triangles


def _brute_triangles(edges):
    """Pure-python reference: per-node triangle counts over the simple
    undirected graph."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {n: 0 for n in adj}
    for u, v in und:
        for w in adj[u] & adj[v]:
            # each triangle hits a node via 2 of its 3 edges
            tri[u] += 1
            tri[v] += 1
    for n in tri:
        tri[n] //= 2
    deg = {n: len(adj[n]) for n in adj}
    return tri, deg


TRI_EDGES = [
    (1, 2), (2, 3), (3, 1),          # triangle
    (3, 4), (4, 5), (5, 3),          # second triangle sharing node 3
    (5, 6),                          # pendant
    (2, 1),                          # duplicate (reverse)
    (7, 7),                          # self-loop (dropped)
    (6, 5),                          # duplicate
    (1, 4),                          # closes (1,3,4)
]


def test_triangle_counts_match_bruteforce(spark):
    df = spark.createDataFrame(TRI_EDGES, "a: long, b: long")
    got = {
        r["node"]: (r["triangles"], r["degree"])
        for r in graph.triangle_counts(df, "a", "b").collect()
    }
    tri, deg = _brute_triangles(TRI_EDGES)
    assert got == {n: (tri[n], deg[n]) for n in tri}


def test_triangle_clustering_coefficient(spark):
    # K3: every node clustering 1.0; pendant node 6 has deg 1 -> 0.0
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 6)], "a: long, b: long"
    )
    got = {
        r["node"]: r["clustering"]
        for r in graph.triangle_counts(df, "a", "b").collect()
    }
    assert got[1] == 1.0 and got[2] == 1.0
    assert got[3] == pytest.approx(2 * 1 / (3 * 2), abs=1e-6)
    assert got[6] == 0.0


def test_triangle_counts_sql_twin_agrees(spark, tmp_path):
    import duckdb

    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 40, size=(300, 2))
    ]
    df = spark.createDataFrame(edges, "a: long, b: long")
    got = {
        (r["node"], r["triangles"], r["degree"], r["clustering"])
        for r in graph.triangle_counts(df, "a", "b").collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE edges AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in edges)
        + ") t(a, b)"
    )
    want = {
        tuple(r)
        for r in con.sql(
            graph.triangle_counts_sql("SELECT * FROM edges", "a", "b")
        ).fetchall()
    }
    assert got == want


def test_triangle_counts_empty_after_filtering(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "a: long, b: long")
    assert graph.triangle_counts(df, "a", "b").count() == 0


# --------------------------------------------------------------- BFS


def _brute_bfs(edges, source, max_hops):
    adj = {}
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {source: 0}
    frontier = [source]
    for hop in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    return dist


BFS_EDGES = [
    (1, 2), (2, 3), (3, 4), (4, 5),   # chain
    (2, 6), (6, 7),                   # branch
    (8, 9),                           # unreachable component
    (1, 3),                           # shortcut: 3 is at dist 1 via it? no: 1-3 direct
]


def test_bfs_matches_bruteforce(spark):
    df = spark.createDataFrame(BFS_EDGES, "a: long, b: long")
    got = {
        r["node"]: r["dist"]
        for r in graph.bfs_distances(df, "a", "b", 1, max_hops=10).collect()
    }
    assert got == _brute_bfs(BFS_EDGES, 1, 10)
    assert 8 not in got and 9 not in got  # unreachable absent


def test_bfs_max_hops_truncates(spark):
    df = spark.createDataFrame(BFS_EDGES, "a: long, b: long")
    got = {
        r["node"]: r["dist"]
        for r in graph.bfs_distances(df, "a", "b", 1, max_hops=2).collect()
    }
    assert got == _brute_bfs(BFS_EDGES, 1, 2)
    assert max(got.values()) <= 2


def test_bfs_sql_twin_agrees(spark):
    import duckdb

    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 30, size=(120, 2))
    ]
    df = spark.createDataFrame(edges, "a: long, b: long")
    got = {
        (r["node"], r["dist"])
        for r in graph.bfs_distances(df, "a", "b", 0, max_hops=8).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE edges AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in edges)
        + ") t(a, b)"
    )
    want = {
        tuple(r)
        for r in con.sql(
            graph.bfs_distances_sql("SELECT * FROM edges", "a", "b", 0, 8)
        ).fetchall()
    }
    assert got == want


def test_bfs_source_only(spark):
    df = spark.createDataFrame([(5, 6)], "a: long, b: long")
    got = graph.bfs_distances(df, "a", "b", 99, max_hops=5).collect()
    assert [(r["node"], r["dist"]) for r in got] == [(99, 0)]


# ---------------------------------------------------------------- kNN graph

# bipartite (group, member): groups g1..g3 induce co-membership
BIPARTITE = [
    (10, 1), (10, 2), (10, 3),          # {1,2,3} share group 10
    (20, 2), (20, 3),                   # {2,3} also share 20 -> n=2
    (30, 4), (30, 5),                   # isolated pair
    (40, 6),                            # singleton group: no pairs
]


def _brute_knn(rows, k, cap=None):
    from collections import defaultdict

    groups = defaultdict(set)
    for g, m in rows:
        groups[g].add(m)
    weights = defaultdict(int)
    for g, ms in groups.items():
        if cap is not None and len(ms) > cap:
            continue
        ms = sorted(ms)
        for i, u in enumerate(ms):
            for v in ms[i + 1:]:
                weights[(u, v)] += 1
    per = defaultdict(list)
    for (u, v), n in weights.items():
        per[u].append((-n, v))
        per[v].append((-n, u))
    out = set()
    for u, lst in per.items():
        for negn, v in sorted(lst)[:k]:
            out.add((u, v))
    return out


def test_bipartite_knn_matches_reference(spark):
    df = spark.createDataFrame(BIPARTITE, "g: long, m: long")
    got = {
        (r["src"], r["dst"])
        for r in graph.bipartite_knn(df, "g", "m", 2).collect()
    }
    assert got == _brute_knn(BIPARTITE, 2)
    # strongest partner of 2 is 3 (weight 2 via groups 10+20)
    assert (2, 3) in got


def test_bipartite_knn_k_bounds_out_degree(spark):
    df = spark.createDataFrame(BIPARTITE, "g: long, m: long")
    out = graph.bipartite_knn(df, "g", "m", 1)
    deg = out.groupBy("src").count().collect()
    assert all(r["count"] == 1 for r in deg)


def test_bipartite_knn_fanout_cap_drops_hot_key(spark):
    hot = [(99, m) for m in range(50)]  # one key shared by 50 members
    df = spark.createDataFrame(BIPARTITE + hot, "g: long, m: long")
    capped = {
        (r["src"], r["dst"])
        for r in graph.bipartite_knn(
            df, "g", "m", 2, max_right_fanout=10
        ).collect()
    }
    # the hot key contributes NOTHING; result equals the uncontaminated
    # reference (members 0..49 overlap ids 1..6 but gain no edges from 99)
    assert capped == _brute_knn(BIPARTITE + hot, 2, cap=10)
    assert capped == _brute_knn(BIPARTITE, 2)


def test_bipartite_fanout_audit(spark):
    hot = [(99, m) for m in range(50)]
    df = spark.createDataFrame(BIPARTITE + hot, "g: long, m: long")
    rows = graph.bipartite_fanout(df, "g", "m").collect()
    assert rows[0]["left"] == 99 and rows[0]["fanout"] == 50


def test_bipartite_knn_sql_twin_agrees(spark):
    import duckdb

    df = spark.createDataFrame(BIPARTITE, "g: long, m: long")
    got = {
        (r["src"], r["dst"])
        for r in graph.bipartite_knn(
            df, "g", "m", 2, max_right_fanout=10
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE bp AS SELECT * FROM (VALUES "
        + ",".join("(%d, %d)" % r for r in BIPARTITE)
        + ") v(g, m)"
    )
    want = {
        tuple(r)
        for r in con.sql(
            graph.bipartite_knn_sql(
                "SELECT g, m FROM bp", "g", "m", 2, max_right_fanout=10
            )
        ).fetchall()
    }
    assert got == want


@pytest.mark.slow
def test_bipartite_knn_hot_key_bounded_pairs(spark):
    # one synthetic hot key with 20k members would emit ~2e8 projection
    # pairs uncapped; with the cap the whole query stays tiny and fast
    import time

    normal = [(g, g * 3 + j) for g in range(200) for j in range(3)]
    hot = [(10**6, m) for m in range(20_000)]
    df = spark.createDataFrame(normal + hot, "g: long, m: long")
    t0 = time.time()
    out = graph.bipartite_knn(df, "g", "m", 5, max_right_fanout=100)
    n = out.count()
    took = time.time() - t0
    # bounded by n_members * k, and the hot key's members contribute 0
    assert n <= 600 * 5
    assert out.filter("src >= 1000").count() == 0
    assert took < 120


def test_bipartite_knn_cap_plan_broadcasts_hot_keys(spark):
    """VERDICT r7 task 4: the fanout cap must not re-shuffle the whole
    projection against the size frame — the over-cap key set (tiny by
    definition) broadcasts into an anti-join."""
    df = spark.createDataFrame(BIPARTITE, "g: long, m: long")
    out = graph.bipartite_knn(df, "g", "m", 2, max_right_fanout=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_bipartite_knn_uncapped_streams_no_adjacency_buffer(spark):
    """ADVICE r8: with no fanout cap the adjacency-list plan would
    buffer an entire hot key's partner set in one task (collect_set ->
    OOM on a pathological key). The uncapped path must take the
    join-based plan, which streams any fanout through shuffles."""
    from dataset_grouper_spark.plans import plan_text

    df = spark.createDataFrame(BIPARTITE, "g: long, m: long")
    uncapped = graph.bipartite_knn(df, "g", "m", 2)
    capped = graph.bipartite_knn(df, "g", "m", 2, max_right_fanout=100)
    assert "collect_list" not in plan_text(uncapped, "simple")
    assert "collect_list" in plan_text(capped, "simple")
    # same answer from both plans on a fixture no cap actually drops
    got_u = {(r["src"], r["dst"]) for r in uncapped.collect()}
    got_c = {(r["src"], r["dst"]) for r in capped.collect()}
    assert got_u == got_c == _brute_knn(BIPARTITE, 2)
