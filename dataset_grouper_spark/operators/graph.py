"""PageRank — importance scoring over a link graph.

The web-corpus curation use: rank hosts/documents by link structure and
feed the score into mixing/sampling decisions (a quality prior the
reference cannot express — it has no joins at all, SURVEY §2). Also the
second representative of the iterative-algorithm genre next to
connected components (dedup.py): where CC converges by monotone label
shrinking, PageRank is a fixed-iteration weighted power method with a
dangling-mass correction — the numerically fussier shape.

Per iteration: one join edges⋈ranks (hash on the source key), one
aggregation (hash on the destination) — two shuffles, the minimum for
edge-propagated aggregation; the dangling mass rides as a broadcast
1-row frame inside the SAME lazy plan (no extra driver round-trip).
Lineage is truncated every round exactly like the CC loop (without it
the analyzed plan triples per round and the driver dies stringifying
it), with the previous round's partitions released — storage stays
bounded at two rank tables regardless of iteration count.

At 100 TB: edges and ranks are co-partitioned on the source key, so the
join is one shuffle of the (small) rank table per round once the edge
list is cached hash-partitioned; AQE handles hub skew (a hot host's
fan-in is a skewed agg key, split at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.cache import defer_release, persist_tracked
from dataset_grouper_spark.operators.dedup import (
    _release_truncated,
    _truncate_lineage,
)


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iterations: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over the DIRECTED edge list (duplicate
    pairs should be deduplicated by the caller if simple-graph
    semantics are wanted; duplicates act as edge weights).

    Dangling nodes (no out-edges) redistribute their rank uniformly —
    the standard correction; without it rank mass leaks and the vector
    no longer sums to 1 (asserted in tests). Returns (node, rank) for
    every node that appears as a source or destination.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # NULL endpoints are dropped: a NULL never equi-joins, so it would
    # silently become a rank-absorbing phantom node (and the SQL twin's
    # NOT IN would go empty-set on a NULL source)
    spark = edges.sparkSession
    ep = persist_tracked(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).na.drop()
    )
    nodes = persist_tracked(
        ep.select(F.col("s").alias("node"))
        .union(ep.select(F.col("d").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    m = ep.count()
    # scope the loop's shuffle width to the GRAPH size: 6 rounds x
    # several exchanges at the session default (e.g. 32-200 partitions)
    # is pure per-task overhead for a small graph — measured 18.5s ->
    # ~4s at 210k edges. Big graphs keep the session width. Same
    # scoped-conf idiom as the streaming oracle compilation (PERF.md).
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(2, min(default_parts, (n + m) // 250_000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        outdeg = ep.groupBy("s").agg(F.count(F.lit(1)).alias("_od"))
        # fold the 1/outdeg weight INTO the edge list once — per round
        # that's one join saved (the loop body is the cost center)
        ew = persist_tracked(
            ep.join(outdeg, "s").select(
                "s", "d", (F.lit(1.0) / F.col("_od")).alias("_w")
            )
        )
        # dangling is a STATIC property of the graph: flag it once on
        # the node table; the per-round mass is then a filter+agg over
        # ranks, not an anti-join
        flagged = persist_tracked(
            nodes.join(
                outdeg, nodes["node"] == outdeg["s"], "left"
            ).select(
                "node", F.col("_od").isNull().alias("_dangling")
            )
        )
        ranks = _truncate_lineage(
            flagged.withColumn("rank", F.lit(1.0 / n))
        )
        prev = ranks
        for _ in range(iterations):
            contrib = (
                ew.join(ranks, F.col("s") == ranks["node"])
                .groupBy("d")
                .agg(F.sum(F.col("rank") * F.col("_w")).alias("_contrib"))
            )
            # dangling mass, spread uniformly — a 1-row frame broadcast
            # into the same lazy plan
            dang = ranks.filter(F.col("_dangling")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
            )
            step = (
                flagged.join(contrib, flagged["node"] == contrib["d"], "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "node",
                    "_dangling",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("_contrib"), F.lit(0.0))
                            + F.col("_dang") / n
                        )
                    ).alias("rank"),
                )
            )
            step = _truncate_lineage(step)
            step.count()  # materialize: one job per round, flat lineage
            _release_truncated(prev)
            prev = step
            ranks = step
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(default_parts))
    defer_release(lambda df=prev: _release_truncated(df))
    return ranks.select("node", "rank")


def pagerank_sql(
    edges_sql: str,
    src: str,
    dst: str,
    iterations: int = 8,
    damping: float = 0.85,
) -> str:
    """DuckDB twin of :func:`pagerank`: the fixed iteration count is
    UNROLLED into one CTE chain per round (r0 → r1 → …), sidestepping
    the single-self-reference limit of recursive CTEs (each round needs
    the previous ranks twice: contributions and dangling mass).
    Per-rank float sums may differ from Spark's in the last ulps
    (summation order); the driver's comparator rounds floats to 6
    decimals, which absorbs it."""
    d = damping
    parts = [
        f"e AS (SELECT {src} AS s, {dst} AS dd FROM ({edges_sql}) "
        f"WHERE {src} IS NOT NULL AND {dst} IS NOT NULL)",
        "nodes AS (SELECT s AS node FROM e UNION SELECT dd FROM e)",
        "odeg AS (SELECT s, count(*) AS outdeg FROM e GROUP BY s)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(
            f"""c{t} AS (
              SELECT e.dd AS node, sum(r.rank / o.outdeg) AS contrib
              FROM e JOIN odeg o ON o.s = e.s
                     JOIN r{p} r ON r.node = e.s
              GROUP BY e.dd
            )"""
        )
        parts.append(
            f"""g{t} AS (
              SELECT coalesce(sum(rank), 0.0) AS m FROM r{p}
              WHERE node NOT IN (SELECT s FROM odeg)
            )"""
        )
        parts.append(
            f"""r{t} AS (
              SELECT n.node,
                     {(1.0 - d)!r} / (SELECT n FROM nn)
                     + {d!r} * (coalesce(c.contrib, 0.0)
                                + g.m / (SELECT n FROM nn)) AS rank
              FROM nodes n
              LEFT JOIN c{t} c ON c.node = n.node
              CROSS JOIN g{t} g
            )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, rank FROM r{iterations}"
    )
