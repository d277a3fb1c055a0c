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
from dataset_grouper_spark.functions.hashing import round_even
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
    # Loop-shuffle width scoped to the GRAPH size — but per-PLAN
    # (r14), not by mutating the session conf (the r13 conf mutation
    # leaked the narrow width to any concurrent query on the same
    # session): the two persisted loop inputs are hash-partitioned
    # ONCE at `parts` on their join keys, the checkpointed rank table
    # inherits that partitioning through every round, and the single
    # explicit repartition(parts, d) before the contribution agg both
    # sets the agg width and leaves the result co-partitioned with
    # `flagged` for the rank-update join — so a round runs exactly ONE
    # exchange, where the session-width plan ran three.
    default_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    parts = max(2, min(default_parts, (n + m) // 250_000 + 1))
    outdeg = ep.groupBy("s").agg(F.count(F.lit(1)).alias("_od"))
    # fold the 1/outdeg weight INTO the edge list once — per round
    # that's one join saved (the loop body is the cost center)
    ew = persist_tracked(
        ep.join(outdeg, "s")
        .select("s", "d", (F.lit(1.0) / F.col("_od")).alias("_w"))
        .repartition(parts, "s")
    )
    # dangling is a STATIC property of the graph: flag it once on
    # the node table; the per-round mass is then a filter+agg over
    # ranks, not an anti-join
    flagged = persist_tracked(
        nodes.join(
            outdeg, nodes["node"] == outdeg["s"], "left"
        )
        .select(
            "node", F.col("_od").isNull().alias("_dangling")
        )
        .repartition(parts, "node")
    )
    ranks = _truncate_lineage(
        flagged.withColumn("rank", F.lit(1.0 / n))
    )
    prev = ranks
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, F.col("s") == ranks["node"])
            .select("d", "rank", "_w")  # project before the exchange
            .groupBy("d")  # partial agg ships one row per (task, d)
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


def bipartite_fanout(df: DataFrame, left: str, right: str) -> DataFrame:
    """Audit frame for :func:`bipartite_knn`'s hot-key cap: the number
    of distinct ``right`` values per ``left`` key, descending. Run it
    to size ``max_right_fanout`` and to see what a chosen cap drops."""
    return (
        df.select(F.col(left).alias("left"), F.col(right).alias("right"))
        .na.drop()
        .distinct()
        .groupBy("left")
        .agg(F.count(F.lit(1)).alias("fanout"))
        .orderBy(F.desc("fanout"), F.asc("left"))
    )


def bipartite_knn(
    df: DataFrame,
    left: str,
    right: str,
    k: int,
    max_right_fanout: int | None = None,
) -> DataFrame:
    """kNN similarity graph over the ``right`` entities of a bipartite
    relation (the similarity-graph builder behind the triangle / BFS /
    community queries): two right nodes are neighbors weighted by how
    many distinct ``left`` keys they share (bipartite projection of
    distinct (left, right) pairs), and each node keeps its K strongest
    partners — ties broken by partner id — so the output stays SPARSE
    at any scale: at most n·K directed (src, dst) edges no matter how
    dense co-membership gets.

    ``max_right_fanout`` is the hot-key cap: a left key shared by f
    right nodes emits f·(f-1)/2 projection pairs, so ONE pathological
    key (a part supplied by 10^5 suppliers, a token present in every
    document) detonates the join quadratically. Keys whose fanout
    exceeds the cap are dropped BEFORE the pair join — the same
    drop-and-audit contract as linkage's ``max_block_size`` and the
    LSH hot-bucket cap; audit candidates with :func:`bipartite_fanout`.
    A dropped key is a recall trade on edge WEIGHTS only (its
    co-members almost surely co-occur under other keys); correctness
    of the kNN cut is unaffected for surviving weights.

    With a cap: one shuffle for the adjacency aggregation (cap-bounded
    per-key buffers), pairs explode in-task, one shuffle for the pair
    count, one for the per-node top-K window (partitioned by node,
    never global). WITHOUT a cap the adjacency plan would buffer each
    left key's ENTIRE partner set in one task (collect_set), turning an
    uncapped hot key from slow into executor OOM — so the uncapped path
    keeps the join-based plan, which streams arbitrary fanout through
    ordinary shuffles and only pays with time.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    raw = df.select(F.col(left).alias("_l"), F.col(right).alias("_r")).na.drop()
    # dedup (left, right) FIRST: map-side partial dedup shrinks every
    # downstream shuffle to the distinct-pair count (lineitem-shaped
    # inputs repeat each pair many times), and turns the fanout screen
    # into a plain count (r9 perf: the edge build dominated the graph
    # queries' cold cost — this removes the count_distinct expand and
    # ~7x of shuffled rows at sf0.1)
    d = raw.distinct()
    if max_right_fanout is not None:
        # screen the over-cap keys FIRST (a count aggregate is
        # buffer-safe for any fanout; the over-cap set is
        # pathological-by-definition, so a broadcast anti-join removes
        # it without re-shuffling the projection — VERDICT r7 task 4),
        # so the collect_list below is provably bounded by the cap.
        hot = (
            d.groupBy("_l")
            .agg(F.count(F.lit(1)).alias("_fan"))
            .filter(F.col("_fan") > max_right_fanout)
            .select("_l")
        )
        d = d.join(F.broadcast(hot), "_l", "left_anti")
        # adjacency-list wedge generation: ONE aggregation builds each
        # left key's (deduped, sorted, cap-bounded) partner array, and
        # the f*(f-1)/2 projection pairs explode from it in-task — no
        # distinct+self-join chain (2 fewer exchanges and no join at
        # all; the textbook pair-enumeration plan for bounded
        # adjacency lists). Sound ONLY because the cap bounds every
        # per-key buffer (VERDICT r8 ADVICE: uncapped keys take the
        # join plan below). collect_list suffices — input is distinct.
        # The wedge explode's work is QUADRATIC in each key's fanout
        # while its input is a few bytes per key — AQE sizes the
        # adjacency exchange by BYTES and coalesces it to 2-3
        # partitions, serializing the f*(f-1)/2 pair generation on a
        # couple of cores (measured: 8.7M wedges from a 3.8 MB input
        # ran 3 tasks x 2.6 s; r14). Spread the tiny aggregated rows
        # round-robin across the session width before exploding —
        # the extra exchange moves kilobytes, the explode then runs
        # fully parallel.
        expl_width = max(
            2,
            int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            ),
        )
        pairs = (
            d.groupBy("_l")
            .agg(F.sort_array(F.collect_list("_r")).alias("_rs"))
            .repartition(expl_width)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(_rs, (x, i) -> "
                        "transform(slice(_rs, i + 2, size(_rs) - i - 1), "
                        "y -> struct(x AS u, y AS v))))"
                    )
                ).alias("_p")
            )
            .select("_p.u", "_p.v")
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    else:
        # no cap -> no bounded-buffer guarantee: stream the projection
        # through a self-equijoin on the left key, which shuffles but
        # never holds a key's full partner set in memory.
        pairs = (
            d.select("_l", F.col("_r").alias("u"))
            .join(d.select("_l", F.col("_r").alias("v")), "_l")
            .filter(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    # symmetrize by EXPLODING each counted pair into both directions —
    # NOT a self-union: unionByName(pairs, pairs.swapped) duplicates
    # the whole pair-build subtree in the physical plan (scan, distinct,
    # hot screen, wedge explode, pair count — all executed twice; r13
    # plan audit), while a Generate over the counted pairs runs it once.
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v"), F.col("n")),
                F.struct(
                    F.col("v").alias("u"),
                    F.col("u").alias("v"),
                    F.col("n"),
                ),
            )
        ).alias("_e")
    ).select("_e.u", "_e.v", "_e.n")
    w = Window.partitionBy("u").orderBy(F.desc("n"), F.asc("v"))
    return (
        sym.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )


def bipartite_knn_sql(
    pairs_sql: str,
    left: str,
    right: str,
    k: int,
    max_right_fanout: int | None = None,
) -> str:
    """DuckDB twin of :func:`bipartite_knn` — same distinct projection,
    same fanout cap, same symmetrize, same (n DESC, v ASC) top-K."""
    cap = ""
    if max_right_fanout is not None:
        cap = (
            " WHERE l IN (SELECT l FROM ps GROUP BY l"
            f" HAVING count(*) <= {max_right_fanout})"
        )
    return f"""
        WITH ps AS (
          SELECT DISTINCT {left} AS l, {right} AS r FROM ({pairs_sql})
          WHERE {left} IS NOT NULL AND {right} IS NOT NULL
        ),
        capped AS (SELECT l, r FROM ps{cap}),
        pairs AS (
          SELECT a.r AS u, b.r AS v, count(*) AS n
          FROM capped a JOIN capped b ON a.l = b.l AND a.r < b.r
          GROUP BY 1, 2
        ),
        sym AS (
          SELECT u, v, n FROM pairs
          UNION ALL
          SELECT v AS u, u AS v, n FROM pairs
        )
        SELECT u AS src, v AS dst FROM (
          SELECT u, v,
                 row_number() OVER (PARTITION BY u ORDER BY n DESC, v ASC)
                   AS rnk
          FROM sym
        ) WHERE rnk <= {k}
    """


def triangle_counts(
    edges: DataFrame, a: str, b: str
) -> DataFrame:
    """Per-node triangle participation counts + clustering coefficient
    over the UNDIRECTED simple graph induced by ``edges`` (self-loops
    and duplicate/NULL pairs dropped here).

    Scale strategy is DEGREE ORIENTATION (the standard distributed
    triangle algorithm): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, so each node's
    oriented out-degree is O(sqrt(m)) on any graph — the wedge join
    (e1.u = e2.u) then fans out quadratically only in THAT bounded
    out-degree, never in a hub's raw degree. A popular node with 10^6
    neighbors contributes wedges from its few oriented out-edges
    instead of 10^12 raw pairs. Three hash joins total (wedge build +
    closing-edge semi join + degree join); no driver data path.

    The DuckDB twin (:func:`triangle_counts_sql`) enumerates the same
    triangles from canonically ordered (u < v) edges — a different,
    simpler physical strategy whose result set is provably identical
    (each triangle found exactly once either way), which is what makes
    the operator oracle-able while the Spark side keeps the scalable
    plan.

    Returns (node, triangles, degree, clustering) where clustering =
    2*T / (deg*(deg-1)) rounded to ``6`` decimals (0.0 for deg < 2).
    """
    und = persist_tracked(
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u").isNotNull() & (F.col("u") != F.col("v")))
        .distinct()
    )
    deg = persist_tracked(
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient by (degree, node): lower endpoint -> higher endpoint
    du = deg.select(
        F.col("node").alias("u"), F.col("degree").alias("_du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("degree").alias("_dv")
    )
    oriented = persist_tracked(
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("_du") < F.col("_dv"))
                | ((F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
            )
            .otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("d"))
            )
            .alias("e")
        )
        .select("e.s", "e.d")
    )
    # wedges: two oriented edges out of the same source; close with a
    # third oriented edge between the two destinations (either
    # direction — orientation order between d1,d2 follows THEIR degree
    # rank, so normalize the closing probe to the canonical pair)
    e1 = oriented.select(F.col("s"), F.col("d").alias("d1"))
    e2 = oriented.select(F.col("s"), F.col("d").alias("d2"))
    wedges = e1.join(e2, "s").filter(F.col("d1") < F.col("d2"))
    closing = oriented.select(
        F.least("s", "d").alias("d1"), F.greatest("s", "d").alias("d2")
    )
    tris = wedges.join(closing, ["d1", "d2"])  # (s, d1, d2) triangles
    per_node = (
        tris.select(F.col("s").alias("node"))
        .union(tris.select(F.col("d1").alias("node")))
        .union(tris.select(F.col("d2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            "degree",
            F.when(
                F.col("degree") < 2, F.lit(0.0)
            )
            .otherwise(
                round_even(
                    F.lit(2.0)
                    * F.coalesce("triangles", F.lit(0)).cast("double")
                    / (
                        F.col("degree").cast("double")
                        * (F.col("degree") - F.lit(1)).cast("double")
                    ),
                    6,
                )
            )
            .alias("clustering"),
        )
    )
    defer_release(lambda: (und.unpersist(), deg.unpersist(), oriented.unpersist()))
    return out


def triangle_counts_sql(edges_sql: str, a: str, b: str) -> str:
    """DuckDB twin of :func:`triangle_counts`: canonical (u<v) edges,
    each triangle enumerated once as a < b < c via two joins, then the
    per-node rollup — identical result set to the degree-oriented
    Spark plan by construction."""
    return f"""
    WITH und AS (
      SELECT DISTINCT least({a}, {b}) AS u, greatest({a}, {b}) AS v
      FROM ({edges_sql})
      WHERE {a} IS NOT NULL AND {b} IS NOT NULL AND {a} <> {b}
    ),
    deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM und e1
      JOIN und e2 ON e2.u = e1.v
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    per_node AS (
      SELECT node, count(*) AS triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    )
    SELECT d.node,
           coalesce(p.triangles, 0) AS triangles,
           d.degree,
           CASE WHEN d.degree < 2 THEN 0.0
                ELSE round_even(2.0 * coalesce(p.triangles, 0)
                                / (d.degree * (d.degree - 1.0)), 6)
           END AS clustering
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    """


def bfs_distances(
    edges: DataFrame,
    a: str,
    b: str,
    source,
    max_hops: int = 10,
) -> DataFrame:
    """Unweighted single-source shortest-path hop counts over the
    UNDIRECTED graph, by frontier expansion: round t joins the
    CURRENT FRONTIER (nodes first reached at distance t) against the
    edge list and keeps genuinely new nodes — each round shuffles
    O(frontier out-edges), not O(graph), and the loop stops EARLY the
    first round the frontier empties (diameter-bounded, not
    max_hops-bounded). Lineage is truncated per round like the CC /
    PageRank loops. ``max_hops`` caps the rounds for pathological
    chains; unreached nodes are absent from the result (no sentinel
    rows at 100 TB node counts).

    Returns (node, dist) with dist 0 for the source itself.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    sym = persist_tracked(
        edges.select(F.col(a).alias("s"), F.col(b).alias("d"))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .union(
            edges.select(F.col(b).alias("s"), F.col(a).alias("d")).filter(
                F.col(a).isNotNull() & F.col(b).isNotNull()
            )
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    spark = edges.sparkSession
    # Shuffle width is left to AQE coalescing (session conf stays
    # untouched — r14: the r13 scoped-width conf mutation leaked the
    # narrow width to any concurrent query on the session, and its
    # sym.count() sizing probe cost a job per call; the CC loop's r13
    # experiment showed AQE already coalesces these tiny per-round
    # shuffles at least as well as explicit scoping).
    frontier = _truncate_lineage(
        spark.createDataFrame(
            [(source, 0)], schema="node long, dist int"
        )
    )
    # `seen` stays a UNION of the per-hop checkpointed frontiers
    # (each a flat in-memory scan), so a round materializes ONLY
    # its new frontier — one job/round, not two, and no O(seen)
    # union rewrite per round (r13; results identical).
    seen_frames = [frontier]
    seen = frontier
    for hop in range(1, max_hops + 1):
        reached = (
            sym.join(frontier, sym["s"] == frontier["node"])
            .select(F.col("d").alias("node"))
            .distinct()
        )
        new = _truncate_lineage(
            reached.join(seen, "node", "left_anti").withColumn(
                "dist", F.lit(hop)
            )
        )
        if new.count() == 0:
            _release_truncated(new)
            break
        seen_frames.append(new)
        seen = seen.unionByName(new)
        frontier = new
    defer_release(
        lambda frames=tuple(seen_frames): [
            _release_truncated(f) for f in frames
        ]
    )
    defer_release(lambda: sym.unpersist())
    return seen


def bfs_distances_sql(
    edges_sql: str, a: str, b: str, source, max_hops: int = 10
) -> str:
    """DuckDB twin of :func:`bfs_distances`: a recursive CTE carrying
    (node, dist), minimized per node afterwards (the recursion visits
    nodes at every distance they are reachable; min() recovers the
    shortest), capped at the same ``max_hops``."""
    return f"""
    WITH RECURSIVE bfs_sym AS (
      -- name avoids capturing CTEs inside edges_sql: under WITH
      -- RECURSIVE, DuckDB resolves a nested subquery's CTE reference
      -- against the OUTER recursive scope first
      SELECT {a} AS s, {b} AS d FROM ({edges_sql})
      WHERE {a} IS NOT NULL AND {b} IS NOT NULL AND {a} <> {b}
      UNION
      SELECT {b} AS s, {a} AS d FROM ({edges_sql})
      WHERE {a} IS NOT NULL AND {b} IS NOT NULL AND {a} <> {b}
    ),
    walk(node, dist) AS (
      SELECT CAST({source} AS BIGINT), 0
      UNION
      -- UNION (not ALL): dedup (node, dist) pairs per step, so the
      -- recursion enumerates at most n*max_hops rows instead of every
      -- PATH (which is exponential on dense graphs)
      SELECT bfs_sym.d, walk.dist + 1
      FROM walk JOIN bfs_sym ON bfs_sym.s = walk.node
      WHERE walk.dist < {max_hops}
    )
    SELECT node, CAST(min(dist) AS INT) AS dist FROM walk GROUP BY node
    """
