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
