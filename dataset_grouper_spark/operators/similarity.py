"""Similarity search over embedding columns — north-star extension.

Two paths (SURVEY §2.8):

- ``cosine_topk``: brute-force exact top-k. Query set is broadcast
  (small dim table), the corpus scan stays distributed; dot products
  are Catalyst ``aggregate``/``zip_with`` folds — JVM-side, no Python.
  O(|queries| * |corpus|) work but one pass over the corpus, no
  shuffle until the final per-query top-k (a windowed rank over
  |queries| * k candidates).
- ``random_hyperplane_lsh``: sign-random-projection buckets (Charikar
  2002). Vectors sharing the b-bit signature land in one bucket;
  candidate join is bucket-equijoin — the 100 TB path where the cross
  product is impossible. Probe multiplicity via band repetition.

Both operate on ``array<float>`` columns; norms are precomputed once.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold dot product — deterministic summation order
    (cross-engine reproducible, unlike a parallel reduction)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def _cosine_expr(dot: Column, norm_prod: Column, round_digits: int) -> Column:
    """Rounded cosine; NULL when either norm is zero (cosine undefined
    for zero vectors — a raw division would throw DIVIDE_BY_ZERO under
    Spark 4's default ANSI mode). Scored paths filter the NULLs, so
    zero vectors simply never match."""
    from dataset_grouper_spark.functions.hashing import round_even

    # binary-value banker's rounding: bit-identical to the numpy
    # paths' np.round (and DuckDB round_even) — F.round's decimal
    # HALF_UP diverges on midpoints, which would let the broadcast ->
    # blocked reroute change a score
    return round_even(dot / F.nullif(norm_prod, F.lit(0.0)), round_digits)


def with_norm(df: DataFrame, vec_col: str, out: str = "_norm") -> DataFrame:
    return df.withColumn(out, _norm(F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
    round_digits: int = 6,
    max_broadcast_queries: int = 65536,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank), rank 1..k, cosine
    rounded for stable comparison, ties broken by neighbor id. Small
    query sets are broadcast — the corpus is never shuffled to meet
    them; above ``max_broadcast_queries`` the call reroutes to
    :func:`cosine_topk_blocked` (numerically identical results,
    asserted in tests), so no caller can broadcast an unbounded query
    frame by accident.
    """
    # guard in ONE bounded job (the limit(cap+1) idiom)
    n_q = queries.select(query_id_col).limit(max_broadcast_queries + 1).count()
    if n_q > max_broadcast_queries:
        # straight to the tiled path: routing through
        # cosine_topk_blocked would collect max+1 FULL VECTOR rows to
        # the driver (hundreds of MB at high dim) only to re-discover
        # the count this guard already knows
        return _cosine_topk_tiled(
            corpus,
            queries,
            vec_col,
            id_col,
            query_id_col,
            k,
            round_digits,
            4096,
            65536,
        )
    c = with_norm(corpus, vec_col, "_cn").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_cn"
    )
    q = with_norm(queries, vec_col, "_qn").select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "_qn"
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _cosine_expr(
                _dot(F.col("_cv"), F.col("_qv")),
                F.col("_cn") * F.col("_qn"),
                round_digits,
            ),
        )
        .filter(F.col("cosine").isNotNull())
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    round_digits: int = 6,
    num_blocks: int | None = None,
    target_block_rows: int = 4096,
) -> DataFrame:
    """All pairs with cosine >= threshold — exact, blocked pair join.

    Fully distributed: no driver collect, no whole-corpus broadcast.
    Rows are hashed into ``B`` blocks; each row is replicated into the
    block-pairs it participates in (side A of pairs ``(b, j >= b)``,
    side B of pairs ``(i <= b, b)``), then one shuffle groups each
    block-pair and a BLAS kernel scores its |A| x |B| similarity tile,
    emitting only pairs above threshold with ``id_a < id_b``. No
    single task ever holds more than two blocks (~2 * target_block_rows
    vectors); the triangle of B*(B+1)/2 tiles spreads across the
    cluster. Data replication is B+1 per row — the standard triangle-
    join tradeoff for exact all-pairs (O(n^2) work is inherent; for
    corpora where that is impossible, use random_hyperplane_lsh_pairs
    for candidates + exact re-score).

    Dense tiles use numpy because a per-element Catalyst fold over
    O(n^2) pairs is interpreted per element; BLAS does the same work
    vectorized — measured 20x.

    ``num_blocks=None`` derives B from a distributed count (one cheap
    aggregate job, never a data collect).
    """
    import math

    import pandas as pd

    if num_blocks is None:
        n = df.count()
        num_blocks = max(1, math.ceil(n / target_block_rows))
    B = int(num_blocks)

    blocked = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int").alias("_blk"),
    )
    # ONE explode enumerates both tile sides (see _tile_sides) — the
    # former a-side/b-side union recomputed the upstream plan twice
    sides = blocked.select(
        "_id",
        "_vec",
        F.explode(_tile_sides(F.col("_blk"), F.lit(B))).alias("_p"),
    ).select(
        "_id",
        "_vec",
        F.col("_p._pi").alias("_pi"),
        F.col("_p._pj").alias("_pj"),
        F.col("_p._side").alias("_side"),
    )

    def tile(key, pdf):
        pi, pj = key
        a = pdf[pdf["_side"] == 0]
        bb = pdf[pdf["_side"] == 1]
        if a.empty or bb.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        a_ids = a["_id"].to_numpy(dtype="int64")
        b_ids = bb["_id"].to_numpy(dtype="int64")
        a_mat = np.array(list(a["_vec"]), dtype="float64")
        b_mat = np.array(list(bb["_vec"]), dtype="float64")
        sims = np.round(
            (a_mat @ b_mat.T)
            / np.outer(
                np.linalg.norm(a_mat, axis=1), np.linalg.norm(b_mat, axis=1)
            ),
            round_digits,
        )
        mask = sims >= threshold
        if pi == pj:
            # diagonal tile: A and B are the same block; strict id
            # order keeps each unordered pair exactly once
            mask &= a_ids[:, None] < b_ids[None, :]
            ai, bi = np.nonzero(mask)
            id_a, id_b = a_ids[ai], b_ids[bi]
        else:
            # off-diagonal: each unordered pair appears in exactly one
            # tile; normalize the id order on emit
            ai, bi = np.nonzero(mask)
            x, y = a_ids[ai], b_ids[bi]
            id_a, id_b = np.minimum(x, y), np.maximum(x, y)
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": sims[ai, bi]})

    return sides.groupBy("_pi", "_pj").applyInPandas(
        tile, schema="id_a long, id_b long, cosine double"
    )


def cosine_pairs_cells(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    num_cells: int | None = None,
    probe: int = 1,
    round_digits: int = 6,
    target_block_rows: int = 4096,
    target_cell_rows: int = 4096,
    two_level_threshold: int = 20_000,
    coarse_probe: int = 2,
    target_assign_rows: int = 65_536,
) -> DataFrame:
    """Cell-blocked near-duplicate pairs — the corpus-scale SemDeDup
    edge generator (Abbas et al. 2023, §3: dedup WITHIN coarse
    clusters, never across the whole corpus).

    The exact triangle join (:func:`cosine_pairs`) is O(n^2) work by
    construction — 100x data = 10,000x compute. This variant first
    coarse-quantizes every vector into one of ``num_cells`` cells
    (the deterministic hash-sampled flat quantizer shared with
    ``ivf_topk_flat`` — no ML fit, reproducible in any SQL engine),
    then runs the exact blocked tile join only WITHIN each cell. With
    cells sized to a target occupancy the work is
    O(n * cell_size) — linear in the corpus, embarrassingly parallel
    across cells — instead of O(n^2).

    Recall contract: a pair is emitted iff the two vectors share at
    least one of their ``probe`` nearest cells (argmin L2, ties to the
    smaller centroid id) AND their cosine >= ``threshold``. ``probe=1``
    is the published SemDeDup shape (within-cluster only; near-dups
    straddling a cell boundary are missed — acceptable because
    near-identical vectors quantize together almost surely).
    ``probe=2`` adds each vector's second-nearest cell as a boundary
    rider, catching straddlers at 2x replication. Each found pair is
    emitted exactly once (canonical cell = the smallest shared cell).

    ``num_cells=None`` (the corpus-scale default) derives the cell
    count from a distributed count at a ``target_cell_rows`` occupancy
    — CELLS SCALE WITH THE CORPUS, so the within-cell PAIRING work
    stays O(n * target_cell_rows). Assignment is tiered on the cell
    count: up to ``two_level_threshold`` cells the SINGLE-LEVEL
    quantizer broadcasts all C centroids and pays n x C BLAS distance
    evaluations — with C = n/target that is O(n^2 * dim / target)
    FLOPs, cheap through ~1e5 cells but the wrong tool past it. Above
    the threshold the TWO-LEVEL quantizer engages: the first
    ceil(sqrt(C)) centroids (in the same hash order — a PREFIX of the
    fine set, so both levels share one deterministic contract) become
    coarse cells; every fine centroid is assigned to its nearest
    coarse cell (distributed, broadcast = sqrt(C) x dim only); every
    vector probes its ``coarse_probe`` nearest coarse cells and takes
    its ``probe`` nearest FINE cells among the fine centroids living
    under those coarse cells (salted cogroup — no task ever sees more
    than ~``target_assign_rows`` vectors x that coarse cell's fine
    centroids). Assignment FLOPs drop from n x C to
    n x sqrt(C) x (1 + coarse_probe) and NO broadcast grows with C —
    the scale bound the single-level path documented is gone. The
    two-level argmin is approximate by contract (a vector whose true
    nearest fine cell hides under an unprobed coarse cell gets its
    best PROBED cell — the standard IVF trade); the DuckDB twin
    (``oracles`` two-level mode) implements the identical contract,
    so it is oracle-exact, and near-identical vectors still quantize
    together almost surely, which is all SemDeDup needs. A FIXED
    ``num_cells`` makes assignment linear but within-cell pairing
    O(n^2 / C) — pass it only when the cell count is part of an
    external contract. ``probe`` is clamped to the derived cell count
    in auto mode (a corpus smaller than one cell degrades to the
    exact join).

    Scale shape: cell assignment is ONE Arrow-vectorized map over the
    corpus (the C centroid rows — planning-scale, one per cell — are
    broadcast as a numpy matrix; each batch computes its distances in
    BLAS), PERSISTED so the per-cell counts and the tile sides read
    the assignment once (the .explain audit showed 4 recomputes
    without it; the cached frame is one (id, vec, cells) row per
    vector, disk-spillable). Per-cell counts come back as a tiny
    broadcast, then the same triangle tile join as ``cosine_pairs``
    runs keyed by (cell, block-pair), both tile sides generated in ONE
    explode. No task ever holds more than ~2 * ``target_block_rows``
    vectors; hot cells spread across their own block triangle. Any
    change to the pairing contract must be mirrored in the DuckDB twin
    (``oracles.semdedup_cells_sql``). The returned frame reads the
    tracked cache: consume it before
    ``cache.release_intermediates()``.
    """
    import math

    import pandas as pd

    if probe < 1:
        raise ValueError(
            f"cosine_pairs_cells: probe must be >= 1, got {probe}"
        )
    if num_cells is None:
        n = df.count()
        num_cells = max(1, math.ceil(n / target_cell_rows))
        probe = min(probe, num_cells)
    elif probe > num_cells:
        raise ValueError(
            f"cosine_pairs_cells: probe must be in [1, num_cells], got "
            f"{probe} with num_cells={num_cells}"
        )
    from dataset_grouper_spark.cache import persist_tracked

    cents = _flat_centroids(df, vec_col, id_col, num_cells)
    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    )
    spark = df.sparkSession
    if num_cells <= two_level_threshold:
        # SINGLE-LEVEL assignment, one vectorized map over the corpus:
        # the C centroid rows are a bounded planning-scale collect
        # (same policy as every other guarded collect in this repo —
        # one row per CELL, never per data row), broadcast as a numpy
        # matrix, and each Arrow batch computes its (batch x C)
        # distance matrix in BLAS. No n x C intermediate rows, no
        # assignment shuffle. Two slower designs died in the 10x
        # probe: the exploded crossJoin+groupBy shuffled n*C wide
        # rows (exponent 1.31), and a Catalyst higher-order-function
        # rewrite kept the explosion out but HOFs are CodegenFallback
        # — 4e8 interpreted ops measured ~90s where BLAS takes <1s.
        # Tie semantics match the DuckDB twin: centroid columns sit
        # in cent_id order and the stable argsort breaks equal
        # distances toward the smaller cent_id. Broadcast bytes =
        # C * dim * 8 (~50 MB at the 1e5-cell threshold); past the
        # threshold the two-level branch below takes over.
        cent_rows = cents.collect()  # bounded: one row per cell
        if not cent_rows:
            return spark.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        bc = _centroid_broadcast(spark, cent_rows)
        k = min(probe, len(cent_rows))
        per_row = persist_tracked(
            base.select(
                "_id",
                "_vec",
                _nearest_cells_udf(bc, k)(F.col("_vec")).alias("_cells"),
            )
        )
    else:
        # TWO-LEVEL assignment: only the ceil(sqrt(C)) coarse
        # centroids — a PREFIX of the fine set in the same (md5, id)
        # order, so both levels share one deterministic contract —
        # are ever collected/broadcast. Fine centroids get their
        # coarse home distributedly (C x sqrt(C) BLAS over the cents
        # frame); vectors probe their coarse_probe nearest coarse
        # cells (n x sqrt(C) BLAS), then meet ONLY their probed
        # coarse cells' fine centroids in a salted cogroup whose
        # per-task working set is bounded by target_assign_rows
        # vectors x that cell's fine centroids. The global
        # probe-nearest merge over the per-coarse-cell winners is one
        # groupBy: per-group top-probe always contains the global
        # top-probe. Tie law everywhere: (distance, cent_id) — the
        # fine matrix is sorted by cent_id inside each task and the
        # stable argsort breaks equal distances toward the smaller
        # id, exactly the DuckDB twin's ORDER BY list_distance,
        # cent_id.
        n_coarse = max(1, math.ceil(math.sqrt(num_cells)))
        coarse_rows = _flat_centroids(
            df, vec_col, id_col, n_coarse
        ).collect()  # bounded: ~sqrt(C) rows
        if not coarse_rows:
            return spark.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        bc_co = _centroid_broadcast(spark, coarse_rows)
        kco = min(coarse_probe, len(coarse_rows))
        k = min(probe, num_cells)
        _coarse_of = _nearest_cells_udf(bc_co, kco)
        f2c = cents.select(
            "_cent_id",
            "_cent_v",
            F.element_at(_coarse_of(F.col("_cent_v")), 1).alias("_co"),
        )
        vpro = persist_tracked(
            base.select(
                "_id",
                "_vec",
                F.explode(_coarse_of(F.col("_vec"))).alias("_co"),
            )
        )
        # per-coarse-cell vector counts -> salt fan-out, tiny
        # broadcast (one row per NON-EMPTY probed coarse cell); fine
        # centroids replicate across their cell's salts so every
        # (cell, salt) bucket sees the full fine set it must rank
        co_cnt = vpro.groupBy("_co").agg(
            F.greatest(
                F.lit(1),
                F.ceil(F.count("*") / F.lit(target_assign_rows)),
            )
            .cast("int")
            .alias("_S")
        )
        vpro_s = vpro.join(F.broadcast(co_cnt), "_co").withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col("_id")), F.col("_S")).cast("int"),
        )
        f2c_s = f2c.join(F.broadcast(co_cnt), "_co").select(
            "_co",
            "_cent_id",
            "_cent_v",
            F.explode(
                F.sequence(F.lit(0), F.col("_S") - F.lit(1))
            ).alias("_salt"),
        )
        id_t = base.schema["_id"].dataType.simpleString()

        def fine_assign(left, right):
            import pandas as pd

            if left.empty or right.empty:
                # a probed coarse cell can have ZERO fine members
                # (e.g. duplicate coarse centroids tie-break to one
                # id): dtype-pinned empty frame. _id inherits the
                # cogroup frame's own dtype (left["_id"].iloc[:0]) so
                # string-keyed corpora don't ride an int64->string
                # zero-row conversion (ADVICE r12)
                return pd.DataFrame(
                    {
                        "_id": left["_id"].iloc[:0],
                        "_cell": pd.Series([], dtype="int64"),
                        "_d2": pd.Series([], dtype="float64"),
                    }
                )
            r = right.sort_values("_cent_id")
            fids = r["_cent_id"].to_numpy(dtype="int64")
            fmat = np.array(list(r["_cent_v"]), dtype="float64")
            kk = min(k, len(fids))
            lid = left["_id"].to_numpy()
            arr = np.array(list(left["_vec"]), dtype="float64")
            ids_out, cell_out, d2_out = [], [], []
            # same chunk bound + direct (v - c)^2 form as the
            # single-level UDF (cancellation-safe near zero distance)
            step = max(
                32, min(1024, (64 << 20) // max(1, fmat.size * 8))
            )
            for lo in range(0, len(arr), step):
                chunk = arr[lo : lo + step]
                d2 = ((chunk[:, None, :] - fmat[None, :, :]) ** 2).sum(
                    -1
                )
                idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
                rows = np.repeat(np.arange(len(chunk)), idx.shape[1])
                cols = idx.ravel()
                ids_out.append(lid[lo + rows])
                cell_out.append(fids[cols])
                d2_out.append(d2[rows, cols])
            return pd.DataFrame(
                {
                    "_id": np.concatenate(ids_out),
                    "_cell": np.concatenate(cell_out),
                    "_d2": np.concatenate(d2_out),
                }
            )

        # the cogroup emits ONLY (_id, _cell, _d2) — shipping _vec
        # here would copy each vector up to coarse_probe x probe
        # times through the dominant shuffle (ADVICE r12); the
        # payload re-joins ONCE from the persisted base after the
        # per-id top-k merge
        cand_cells = (
            vpro_s.groupBy("_co", "_salt")
            .cogroup(f2c_s.groupBy("_co", "_salt"))
            .applyInPandas(
                fine_assign,
                schema=f"_id {id_t}, _cell long, _d2 double",
            )
        )
        top = F.slice(
            F.array_sort(
                F.collect_list(F.struct(F.col("_d2"), F.col("_cell")))
            ),
            1,
            k,
        )
        assigned = cand_cells.groupBy("_id").agg(
            F.transform(top, lambda s: s["_cell"]).alias("_cells")
        )
        per_row = persist_tracked(
            base.select("_id", "_vec").join(assigned, "_id")
        )
    exploded = per_row.select(
        "_id", "_vec", "_cells", F.explode("_cells").alias("_cell")
    )
    # per-cell block count: num_cells rows, broadcast back
    cell_b = exploded.groupBy("_cell").agg(
        F.greatest(
            F.lit(1),
            F.ceil(F.count("*") / F.lit(target_block_rows)),
        )
        .cast("int")
        .alias("_B")
    )
    blocked = exploded.join(F.broadcast(cell_b), "_cell").withColumn(
        "_blk",
        F.pmod(F.xxhash64(F.col("_id")), F.col("_B")).cast("int"),
    )
    sides = blocked.select(
        "_cell",
        "_id",
        "_vec",
        "_cells",
        F.explode(_tile_sides(F.col("_blk"), F.col("_B"))).alias("_p"),
    ).select(
        "_cell",
        "_id",
        "_vec",
        "_cells",
        F.col("_p._pi").alias("_pi"),
        F.col("_p._pj").alias("_pj"),
        F.col("_p._side").alias("_side"),
    )
    multi = probe > 1

    def tile(key, pdf):
        cell, pi, pj = key
        a = pdf[pdf["_side"] == 0]
        bb = pdf[pdf["_side"] == 1]
        empty = pd.DataFrame(
            {"id_a": [], "id_b": [], "cosine": []}
        ).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )
        if a.empty or bb.empty:
            return empty
        a_ids = a["_id"].to_numpy(dtype="int64")
        b_ids = bb["_id"].to_numpy(dtype="int64")
        a_mat = np.array(list(a["_vec"]), dtype="float64")
        b_mat = np.array(list(bb["_vec"]), dtype="float64")
        sims = np.round(
            (a_mat @ b_mat.T)
            / np.outer(
                np.linalg.norm(a_mat, axis=1),
                np.linalg.norm(b_mat, axis=1),
            ),
            round_digits,
        )
        mask = sims >= threshold
        if pi == pj:
            mask &= a_ids[:, None] < b_ids[None, :]
            ai, bi = np.nonzero(mask)
            id_a, id_b = a_ids[ai], b_ids[bi]
        else:
            ai, bi = np.nonzero(mask)
            x, y = a_ids[ai], b_ids[bi]
            id_a, id_b = np.minimum(x, y), np.maximum(x, y)
        cos = sims[ai, bi]
        if multi and len(ai):
            # multi-probe: a pair sharing >1 cell appears in each —
            # emit only in its canonical (smallest shared) cell, so
            # every found pair surfaces exactly once with no dedup
            # shuffle downstream. Vectorized: pad each side's cell
            # list to a (rows, probe) matrix with side-distinct
            # sentinels (so padding never matches padding), then the
            # min over element-wise-equal entries is the smallest
            # shared cell.
            def pad(series, fill):
                lists = list(series)
                width = max(len(c) for c in lists)
                m = np.full((len(lists), width), fill, dtype="int64")
                for r, c in enumerate(lists):
                    m[r, : len(c)] = c
                return m

            big = np.iinfo("int64").max
            am = pad(a["_cells"], -1)[ai]
            bm = pad(bb["_cells"], -2)[bi]
            eq = am[:, :, None] == bm[:, None, :]
            shared_min = np.where(eq, am[:, :, None], big).min(
                axis=(1, 2)
            )
            keep = shared_min == cell
            id_a, id_b, cos = id_a[keep], id_b[keep], cos[keep]
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": cos})

    return sides.groupBy("_cell", "_pi", "_pj").applyInPandas(
        tile, schema="id_a long, id_b long, cosine double"
    )


def _tile_sides(blk: Column, b: Column) -> Column:
    """Array of (_pi, _pj, _side) structs enumerating every triangle
    tile a row participates in: side A of pairs ``(blk, j >= blk)``
    and side B of ``(i <= blk, blk)`` — the diagonal tile gets the row
    on BOTH sides. One explode of this array replaces the
    a-side/b-side union, halving upstream recomputation."""
    a = F.transform(
        F.sequence(blk, b - F.lit(1)),
        lambda j: F.struct(
            blk.alias("_pi"), j.alias("_pj"), F.lit(0).alias("_side")
        ),
    )
    bb = F.transform(
        F.sequence(F.lit(0), blk),
        lambda i: F.struct(
            i.alias("_pi"), blk.alias("_pj"), F.lit(1).alias("_side")
        ),
    )
    return F.concat(a, bb)


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
    round_digits: int = 6,
    max_collect_queries: int = 65536,
    query_block_rows: int = 4096,
    corpus_block_rows: int = 65536,
) -> DataFrame:
    """Exact top-k, scale variant: numpy block scoring + two-level
    top-k. Each corpus partition computes its (batch x queries)
    similarity block with BLAS and keeps only its local top-k per
    query; a final window rank merges partials. Shuffle volume is
    O(partitions * k * |queries|) instead of O(|corpus| * |queries|).
    Results are identical to cosine_topk (exact; same rounding and
    tie-break).

    The query set is collected + broadcast only while its row count is
    at most ``max_collect_queries`` (dim-table-sized). Above that the
    operator switches to a fully distributed 2-D tiled join — corpus
    hashed into row blocks, queries into query blocks, each (corpus
    block x query block) tile scored with BLAS in its own task and
    reduced to per-tile top-k before the same global rank merge — so
    no single process ever holds the query set. Same exact results;
    extra cost is the tile replication (corpus rows x query blocks).
    """
    import numpy as np
    import pandas as pd

    # guard + fetch in ONE bounded job: the limit caps what can ever
    # reach the driver, and an overflow row reroutes to the tiled path
    qrows = (
        queries.select(query_id_col, vec_col)
        .limit(max_collect_queries + 1)
        .collect()
    )
    if len(qrows) > max_collect_queries:
        return _cosine_topk_tiled(
            corpus,
            queries,
            vec_col,
            id_col,
            query_id_col,
            k,
            round_digits,
            query_block_rows,
            corpus_block_rows,
        )
    if not qrows:
        # np.linalg.norm(axis=1) on a 0-row matrix raises; the other
        # paths return empty for empty queries — match them
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    q_ids = np.array([r[0] for r in qrows], dtype="int64")
    q_mat = np.array([r[1] for r in qrows], dtype="float64")
    q_norm = np.linalg.norm(q_mat, axis=1)
    b = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def block(pdf_iter):
        qi_ids, qi_mat, qi_norm = b.value
        for pdf in pdf_iter:
            c_ids = pdf[id_col].to_numpy(dtype="int64")
            c_mat = np.array(list(pdf[vec_col]), dtype="float64")
            sims = np.round(
                (c_mat @ qi_mat.T)
                / np.outer(np.linalg.norm(c_mat, axis=1), qi_norm),
                round_digits,
            )
            frames = []
            for j, qid in enumerate(qi_ids):
                col = sims[:, j]
                mask = c_ids != qid
                cand_ids, cand_sims = c_ids[mask], col[mask]
                # zero-norm vectors produce NaN sims; exclude them so
                # results match the SQL paths' isNotNull contract
                finite = np.isfinite(cand_sims)
                cand_ids, cand_sims = cand_ids[finite], cand_sims[finite]
                # local top-k with the SAME order as the final rank:
                # (-cosine, neighbor_id) lexicographic
                order = np.lexsort((cand_ids, -cand_sims))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cand_ids[order],
                            "cosine": cand_sims[order],
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine": []}
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(
        block, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _cosine_topk_tiled(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int,
    round_digits: int,
    query_block_rows: int,
    corpus_block_rows: int,
) -> DataFrame:
    """Large-Q exact top-k: 2-D tiled corpus x query join, no collect.

    Both sides are hashed into blocks; every (corpus block, query
    block) tile is a groupBy key scored by one BLAS task that keeps
    its local per-query top-k (same (-cosine, neighbor_id) order as
    the final rank, so the global merge is exact). No driver collect,
    no query broadcast — this is ``cosine_pairs``' triangle-join
    pattern applied to a rectangular corpus x queries product.
    """
    import math

    import pandas as pd

    n_q = queries.count()
    n_c = corpus.count()
    QB = max(1, math.ceil(n_q / query_block_rows))
    CB = max(1, math.ceil(n_c / corpus_block_rows))

    c_side = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(CB)).cast("int").alias("_cb"),
        F.explode(F.sequence(F.lit(0), F.lit(QB - 1))).alias("_qb"),
        F.lit(0).alias("_side"),
    )
    q_side = queries.select(
        F.col(query_id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.explode(F.sequence(F.lit(0), F.lit(CB - 1))).alias("_cb"),
        F.pmod(F.xxhash64(F.col(query_id_col)), F.lit(QB)).cast("int").alias("_qb"),
        F.lit(1).alias("_side"),
    )

    def tile(key, pdf):
        empty = pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cosine": []}
        ).astype({"query_id": "int64", "neighbor_id": "int64", "cosine": "float64"})
        cp = pdf[pdf["_side"] == 0]
        qp = pdf[pdf["_side"] == 1]
        if cp.empty or qp.empty:
            return empty
        c_ids = cp["_id"].to_numpy(dtype="int64")
        q_ids = qp["_id"].to_numpy(dtype="int64")
        c_mat = np.array(list(cp["_vec"]), dtype="float64")
        q_mat = np.array(list(qp["_vec"]), dtype="float64")
        sims = np.round(
            (c_mat @ q_mat.T)
            / np.outer(
                np.linalg.norm(c_mat, axis=1), np.linalg.norm(q_mat, axis=1)
            ),
            round_digits,
        )
        frames = []
        for j, qid in enumerate(q_ids):
            col = sims[:, j]
            mask = c_ids != qid
            cand_ids, cand_sims = c_ids[mask], col[mask]
            # exclude NaN sims from zero-norm vectors (match cosine_topk)
            finite = np.isfinite(cand_sims)
            cand_ids, cand_sims = cand_ids[finite], cand_sims[finite]
            order = np.lexsort((cand_ids, -cand_sims))[:k]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": cand_ids[order],
                        "cosine": cand_sims[order],
                    }
                )
            )
        return pd.concat(frames) if frames else empty

    partial = (
        c_side.unionByName(q_side)
        .groupBy("_cb", "_qb")
        .applyInPandas(tile, schema="query_id long, neighbor_id long, cosine double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    round_digits: int = 6,
    max_collect_queries: int = 65536,
    fit_sample_rows: int = 262144,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus with KMeans,
    probe only the ``nprobe`` centroids nearest each query, exact-rerank
    within the probed cells (the inverted-file index of Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", §IV-A, minus
    the PQ compression).

    Scale shape: one KMeans fit over a hash-sampled subset capped at
    ``fit_sample_rows`` (the quantizer needs a sample, never the full
    corpus), one
    cluster-assignment pass, then the search touches ~nprobe/num_centroids
    of the corpus per query via a broadcast (query_id, cluster) probe
    join. Written-to-disk variants would partition the corpus by
    cluster id so probes prune at the scan (same trick as
    sinks.write_partitioned bucketing).

    Query sets above ``max_collect_queries`` rows are never collected:
    probe assignment moves to the executors (only the tiny centroid
    table is broadcast) and the probe join runs as a regular shuffle
    join. Results are identical either way.
    """
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from dataset_grouper_spark.cache import persist_tracked

    train = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    # The coarse quantizer only needs a sample. Hash-order TakeOrdered
    # bounds the fit input at ``fit_sample_rows`` (a seeded-hash
    # pseudo-random subset, deterministic, no count job, no full sort)
    # so the KMeans iterations scan a few hundred thousand rows — never
    # ``iterations x full corpus``. Assignment stays one full pass.
    fit_cap = max(fit_sample_rows, 100 * num_centroids)
    fit_input = persist_tracked(
        train.orderBy(
            F.xxhash64(F.col("_cid"), F.lit(seed)), F.col("_cid")
        ).limit(fit_cap)
    )
    model = KMeans(k=num_centroids, seed=seed, featuresCol="features").fit(
        fit_input
    )
    fit_input.unpersist()
    # transform passes input columns through — selecting _cv out of
    # its output saves the full-corpus re-join (one corpus exchange)
    assigned = model.transform(train).select(
        F.col("_cid"), F.col("_cv"), F.col("prediction").alias("_cluster")
    )
    centroids = np.array(model.clusterCenters())
    spark = corpus.sparkSession

    # guard + fetch in ONE bounded job (see cosine_topk_blocked)
    qrows = (
        queries.select(query_id_col, vec_col)
        .limit(max_collect_queries + 1)
        .collect()
    )
    if len(qrows) > max_collect_queries:
        # Large Q: the centroid table (num_centroids x dim) is the only
        # thing broadcast; probe assignment runs on the executors and
        # the probe join is a plain shuffle join AQE can plan.
        import pandas as pd

        cent_b = spark.sparkContext.broadcast(centroids)

        def probe_fn(pdf_iter):
            cents = cent_b.value
            for pdf in pdf_iter:
                out_q, out_c, out_v = [], [], []
                for qid, vec in zip(pdf[query_id_col], pdf[vec_col]):
                    qv = np.array(vec, dtype="float64")
                    d = np.linalg.norm(cents - qv, axis=1)
                    lv = [float(x) for x in qv]
                    for c in np.argsort(d)[:nprobe]:
                        out_q.append(qid)
                        out_c.append(int(c))
                        out_v.append(lv)
                yield pd.DataFrame(
                    {"query_id": out_q, "_cluster": out_c, "_qv": out_v}
                )

        probes = queries.select(query_id_col, vec_col).mapInPandas(
            probe_fn, "query_id long, _cluster int, _qv array<double>"
        )
        cands = assigned.join(probes, "_cluster").filter(
            F.col("_cid") != F.col("query_id")
        )
    else:
        probe_rows = []
        for r in qrows:
            qv = np.array(r[1], dtype="float64")
            d = np.linalg.norm(centroids - qv, axis=1)
            for c in np.argsort(d)[:nprobe]:
                probe_rows.append((r[0], int(c), [float(x) for x in qv]))
        probes = spark.createDataFrame(
            probe_rows, "query_id long, _cluster int, _qv array<double>"
        )
        cands = assigned.join(F.broadcast(probes), "_cluster").filter(
            F.col("_cid") != F.col("query_id")
        )
    scored = (
        cands.withColumn(
            "cosine",
            _cosine_expr(
                _dot(F.col("_cv"), F.col("_qv")),
                _norm(F.col("_cv")) * _norm(F.col("_qv")),
                round_digits,
            ),
        )
        .filter(F.col("cosine").isNotNull())
        .select("query_id", F.col("_cid").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _dist2(a: Column, b: Column) -> Column:
    """Squared L2 distance, sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_topk_flat(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    round_digits: int = 6,
    max_collect_queries: int = 65536,
) -> DataFrame:
    """Deterministic IVF top-k — the oracle-checkable twin of
    ``ivf_topk``.

    Same inverted-file mechanism (coarse cells, probe ``nprobe`` cells
    per query, exact rerank within probed cells) but the coarse
    quantizer is a *hash-sampled flat index* instead of KMeans: the
    centroids are the ``num_centroids`` corpus vectors with the
    smallest engine-portable md5 hash of their id. No ML fit, and the
    entire index — centroid pick, cell assignment (argmin L2, ties to
    the smaller centroid id), probes, rerank — is reproducible in any
    SQL engine, which makes the whole ANN path value-hashable against
    a DuckDB oracle (VERDICT r1 #3).

    Scale shape: top-C-by-hash is a TakeOrdered (no full sort);
    assignment is a broadcast of C centroid rows against the corpus
    with a map-side partial ``min(struct)`` argmin — one corpus
    shuffle; probing joins the (query x cell) list through the shared
    guarded candidate join (broadcast only below
    ``max_collect_queries * nprobe`` probe rows, plain equijoin above).
    """
    cents = _flat_centroids(corpus, vec_col, id_col, num_centroids)
    assigned = _assign_cells(corpus, vec_col, id_col, cents)
    probes = _probe_cells(queries, vec_col, query_id_col, cents, nprobe)
    return _score_probed(
        _bounded_broadcast_join(
            assigned, probes, "_cluster", max_collect_queries * nprobe
        ),
        k,
        round_digits,
    )


def _flat_centroids(
    corpus: DataFrame, vec_col: str, id_col: str, num_centroids: int
) -> DataFrame:
    """The deterministic flat coarse quantizer shared by
    ``ivf_topk_flat`` and ``IvfDiskIndex``: centroids are the
    ``num_centroids`` corpus vectors with the smallest engine-portable
    md5 hash of their id. These helpers are the oracle contract — any
    change must be mirrored in ``oracles.ivf_topk_flat_sql``."""
    from dataset_grouper_spark.functions.hashing import md5_long

    return (
        corpus.select(
            F.col(id_col).alias("_cent_id"),
            F.col(vec_col).alias("_cent_v"),
            md5_long(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "_cent_id")
        .limit(num_centroids)
        .select("_cent_id", "_cent_v")
    )


def _centroid_broadcast(spark, cent_rows):
    """Broadcast collected ``(_cent_id, _cent_v)`` rows as (ids,
    matrix) numpy pair, rows sorted by cent_id so a stable argsort
    over the matrix's distance columns breaks ties toward the smaller
    centroid id (the oracle's ORDER BY list_distance, cent_id)."""
    cent_rows = sorted(cent_rows, key=lambda r: r["_cent_id"])
    ids = np.array([r["_cent_id"] for r in cent_rows], dtype="int64")
    mat = np.array([r["_cent_v"] for r in cent_rows], dtype="float64")
    return spark.sparkContext.broadcast((ids, mat))


def _nearest_cells_udf(bc, k: int):
    """Arrow-vectorized argmin-k over a broadcast centroid matrix:
    array<long> of the k nearest centroid ids per input vector, ties
    to the smaller id (stable argsort over id-ordered columns). Each
    batch chunks so the (chunk x C x dim) difference tensor stays
    bounded (~64 MB) whatever the cell count; the direct (v - c)^2
    form is kept (NOT the v^2+c^2-2vc BLAS identity) because
    near-duplicate corpora put vectors at ~zero distance from a
    centroid, where the expanded form's cancellation error could flip
    the argmin vs the oracle."""

    def fn(vecs):
        import pandas as pd

        ids, cm = bc.value
        out = []
        arr = np.array(list(vecs), dtype="float64")
        step = max(32, min(1024, (64 << 20) // max(1, cm.size * 8)))
        for lo in range(0, len(arr), step):
            chunk = arr[lo : lo + step]
            d2 = ((chunk[:, None, :] - cm[None, :, :]) ** 2).sum(-1)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
            out.extend(ids[row].tolist() for row in idx)
        return pd.Series(out)

    return F.pandas_udf(fn, "array<long>")


def _assign_cells(
    corpus: DataFrame, vec_col: str, id_col: str, cents: DataFrame
) -> DataFrame:
    """(_cid, _cluster, _cv): argmin-L2 cell per corpus vector, ties to
    the smaller centroid id."""
    c = corpus.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv"))
    return (
        c.crossJoin(F.broadcast(cents))
        .withColumn("_d2", _dist2(F.col("_cv"), F.col("_cent_v")))
        .groupBy("_cid")
        .agg(F.min(F.struct(F.col("_d2"), F.col("_cent_id"))).alias("_m"))
        .select("_cid", F.col("_m._cent_id").alias("_cluster"))
        .join(c, "_cid")
    )


def _probe_cells(
    queries: DataFrame,
    vec_col: str,
    query_id_col: str,
    cents: DataFrame,
    nprobe: int,
) -> DataFrame:
    """(query_id, _qv, _cluster): each query's ``nprobe`` nearest cells
    (L2, ties to the smaller centroid id)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("_d2"), F.col("_cent_id"))
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_d2", _dist2(F.col("_qv"), F.col("_cent_v")))
        .withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "_qv", F.col("_cent_id").alias("_cluster"))
    )


def _score_probed(
    cands: DataFrame, k: int, round_digits: int
) -> DataFrame:
    """Exact cosine rerank + per-query rank over probed candidates
    carrying (_cid, _cv, query_id, _qv)."""
    scored = (
        cands.filter(F.col("_cid") != F.col("query_id"))
        .withColumn(
            "cosine",
            _cosine_expr(
                _dot(F.col("_cv"), F.col("_qv")),
                _norm(F.col("_cv")) * _norm(F.col("_qv")),
                round_digits,
            ),
        )
        .filter(F.col("cosine").isNotNull())
        .select("query_id", F.col("_cid").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _bounded_broadcast_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    max_collect_rows: int,
    prune_left: bool = False,
) -> DataFrame:
    """The guarded candidate equijoin shared by every ANN entry point:
    broadcast the query side ONLY when it is provably small.

    guard + fetch in ONE bounded job (the ``limit(cap+1).collect()``
    idiom of ``cosine_topk_blocked``): if ``right`` has at most
    ``max_collect_rows`` rows, re-create it as a local relation and
    broadcast-join — with ``prune_left``, additionally push a static
    ``isin`` filter on the join key into ``left`` (partition pruning at
    the scan for cluster-partitioned disk layouts). Above the cap the
    join stays a plain shuffle equijoin AQE can plan; an unbounded
    relation is never broadcast (a broadcast must materialize wholly on
    every executor — at 100 TB with a 10M-row query batch that is an
    OOM, precisely on the branch built for large query sets).

    The query-side subplan is persisted BEFORE the guard probe: the
    probe executes ``right`` once, and on the large-Q branch the join
    would otherwise re-evaluate the whole probe/bucket pipeline behind
    it (``_probe_cells`` / ``_bucket_frame``) from scratch — persisting
    makes the large-Q branch single-pass. The cached copy is released
    by ``release_intermediates`` between runs, like every other
    operator intermediate.
    """
    from dataset_grouper_spark.cache import persist_tracked

    spark = right.sparkSession
    right = persist_tracked(right)
    rows = right.limit(max_collect_rows + 1).collect()
    if len(rows) <= max_collect_rows:
        # small side: the local relation replaces `right` in the plan,
        # so its cache is dead weight — drop it eagerly
        right.unpersist()
        if prune_left:
            keys = sorted({r[on] for r in rows})
            left = left.filter(F.col(on).isin(keys))
        local = spark.createDataFrame(rows, right.schema)
        return left.join(F.broadcast(local), on)
    return left.join(right, on)


def hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Seeded random hyperplane normals for sign-projection LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def signature_expr(vec_col: str | Column, planes: list[list[float]]) -> Column:
    """b-bit sign signature of a vector as a bigint bucket id."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = _dot(v, arr)
        sig = sig + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


signature_expr_col = signature_expr


def _bucket_frame(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    id_alias: str,
    vec_alias: str | None,
    dim: int,
    bits: int,
    tables: int,
    seed: int,
) -> DataFrame:
    """One row per (vector, table): table-tagged LSH bucket keys,
    computed in a single Arrow-batched numpy pass.

    Numerically identical to exploding ``signature_expr`` per table —
    the accumulation loops over dimensions in index order, so every
    (row, bit) partial sum reproduces the Catalyst fold's left-to-right
    float addition exactly (same bucket ids, same oracle hashes) — but
    ~bits*tables Catalyst HOF folds per row become ``dim`` vectorized
    adds per batch (the HOF-no-CSE cost documented in PERF.md).
    ``vec_alias=None`` drops the vector from the output (pairs path).
    """
    import pandas as pd

    planes = np.array(
        [hyperplanes(dim, bits, seed + t) for t in range(tables)]
    )  # (tables, bits, dim)
    carry = vec_alias is not None
    cols = [id_col, vec_col]
    src = df.select(*cols)
    id_dt = src.schema[id_col].dataType.simpleString()
    vec_dt = src.schema[vec_col].dataType.simpleString()
    out_cols = [id_alias] + ([vec_alias] if carry else []) + ["_bucket"]
    schema = ", ".join(
        [f"{id_alias} {id_dt}"]
        + ([f"{vec_alias} {vec_dt}"] if carry else [])
        + ["_bucket string"]
    )
    weights = 1 << np.arange(bits, dtype="int64")

    def fn(pdf_iter):
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            m = np.array(list(pdf[vec_col]), dtype="float64")
            n = len(pdf)
            frames = []
            for t in range(tables):
                P = planes[t]
                acc = np.zeros((n, bits))
                for i in range(dim):
                    acc += m[:, i : i + 1] * P[:, i][None, :]
                sig = (acc > 0).astype("int64") @ weights
                out = pd.DataFrame({id_alias: pdf[id_col].to_numpy()})
                if carry:
                    out[vec_alias] = pdf[vec_col].values
                out["_bucket"] = [f"{t}_{s}" for s in sig]
                frames.append(out[out_cols])
            yield pd.concat(frames)

    return src.mapInPandas(fn, schema)


def random_hyperplane_lsh_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-neighbor pairs: same b-bit sign signature in any
    of ``tables`` independent hash tables.

    Per table: one narrow projection pass + an equijoin on the bucket
    id. Bucket sizes concentrate around n/2^bits — pick bits so
    buckets fit comfortably in a task (AQE skew-split covers stragglers).
    """
    # One row per (vector, table) with a table-tagged bucket key: all
    # tables join in a single equijoin (one shuffle, one corpus pass)
    # instead of `tables` separate self-joins. Keys come from the
    # numpy signature pass (_bucket_frame, bit-exact with
    # signature_expr).
    from dataset_grouper_spark.cache import persist_tracked

    bucketed = persist_tracked(
        _bucket_frame(df, vec_col, id_col, "_id", None, dim, bits, tables, seed)
    )
    x, y = bucketed.alias("x"), bucketed.alias("y")
    return (
        x.join(
            y,
            (F.col("x._bucket") == F.col("y._bucket"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    dim: int,
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    max_collect_queries: int = 65536,
) -> DataFrame:
    """ANN top-k: LSH-bucket candidates, exact cosine re-rank.

    The scale path: corpus and queries are bucketed by the same
    signatures; only same-bucket pairs get the exact cosine. Recall
    tunes with bits/tables; the re-rank is exact over candidates.
    """
    # Single corpus pass: every table's bucket key is computed in one
    # Arrow-batched numpy projection (see _bucket_frame — bit-exact
    # with signature_expr); the query side goes through the shared
    # guarded candidate join — broadcast only below
    # max_collect_queries * tables bucket rows, plain equijoin above.
    cb = _bucket_frame(
        corpus, vec_col, id_col, "neighbor_id", "_cv", dim, bits, tables, seed
    )
    qb = _bucket_frame(
        queries, vec_col, query_id_col, "query_id", "_qv", dim, bits, tables, seed
    )
    cands = (
        _bounded_broadcast_join(
            cb, qb, "_bucket", max_collect_queries * tables
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_cv", "_qv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        cands.withColumn(
            "cosine",
            _cosine_expr(
                _dot(F.col("_cv"), F.col("_qv")),
                _norm(F.col("_cv")) * _norm(F.col("_qv")),
                6,
            ),
        )
        .filter(F.col("cosine").isNotNull())
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


class IvfDiskIndex:
    """Persisted inverted-file ANN index: the corpus written to parquet
    PARTITIONED BY coarse cell, plus a centroids sidecar — build once,
    search many times. Searches read ONLY the probed cells' partition
    directories, so at scale a query touches ~nprobe/num_centroids of
    the corpus at the SCAN (the on-disk realization ivf_topk's
    docstring promises; same cell scheme as ``ivf_topk_flat``, so the
    search results are value-hashable against the same SQL oracle).

    Layout under ``path``: ``index/`` — (_cid, _cv) partitioned by
    ``_cluster``; ``centroids/`` — (_cent_id, _cent_v).
    """

    def __init__(self, spark, path: str):
        self._spark = spark
        self.path = path
        self._cents = spark.read.parquet(f"{path}/centroids")

    @staticmethod
    def build(
        corpus: DataFrame,
        vec_col: str,
        id_col: str,
        path: str,
        num_centroids: int = 16,
    ) -> "IvfDiskIndex":
        """Deterministic flat centroid pick (smallest md5-of-id corpus
        vectors), argmin cell assignment, partitioned write — the same
        shared helpers ``ivf_topk_flat`` composes, so the two paths
        cannot drift. One corpus shuffle (the argmin agg); the write
        reuses its partitioning."""
        cents = _flat_centroids(corpus, vec_col, id_col, num_centroids)
        assigned = _assign_cells(corpus, vec_col, id_col, cents)
        assigned.write.partitionBy("_cluster").mode("overwrite").parquet(
            f"{path}/index"
        )
        cents.write.mode("overwrite").parquet(f"{path}/centroids")
        return IvfDiskIndex(corpus.sparkSession, path)

    def search(
        self,
        queries: DataFrame,
        vec_col: str,
        query_id_col: str,
        k: int = 10,
        nprobe: int = 4,
        round_digits: int = 6,
        max_collect_queries: int = 65536,
    ) -> DataFrame:
        """Top-k by cosine within the probed cells. Small query sets
        collect their (bounded) probe list so the index scan carries a
        STATIC partition filter — only the probed directories are read.
        Larger sets stay executor-side with a plain shuffle equijoin
        (never a broadcast of the unbounded probe frame); the join key
        is the partition column, so AQE/DPP can still prune. Same probe
        tie-breaks and scoring as ``ivf_topk_flat`` (shared helpers) —
        identical results, oracle-compatible."""
        probes = _probe_cells(
            queries, vec_col, query_id_col, self._cents, nprobe
        )
        idx = self._spark.read.parquet(f"{self.path}/index")
        return _score_probed(
            _bounded_broadcast_join(
                idx,
                probes,
                "_cluster",
                max_collect_queries * nprobe,
                prune_left=True,
            ),
            k,
            round_digits,
        )


def embedding_neardup_clusters(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    num_blocks: int | None = None,
    max_iter: int = 50,
    num_cells: int | str | None = None,
    probe: int = 1,
    target_cell_rows: int = 4096,
    two_level_threshold: int = 20_000,
    coarse_probe: int = 2,
) -> DataFrame:
    """Semantic (embedding-cosine) near-duplicate clustering — the
    SemDeDup-style dedup tier (Abbas et al. 2023): vectors whose cosine
    similarity is >= ``threshold`` are duplicates; transitive closure
    groups them, and every id gets a ``cluster_id`` (the min id of its
    component; untouched vectors are their own singleton). Keep
    ``cluster_id == id`` rows for the survivor set.

    Scale shape: with ``num_cells`` set (the CORPUS-SCALE mode, and
    what any run beyond a few hundred thousand vectors should use)
    edges come from the cell-blocked tile join
    (:func:`cosine_pairs_cells` — O(n * cell_size) work, the published
    SemDeDup within-cluster contract; ``probe=2`` adds a boundary
    rider). With ``num_cells=None`` (default, exact mode for small n /
    verification) edges come from the global blocked triangle tile
    join (``cosine_pairs`` — exact but O(n^2) work by construction).
    The closure is min-label propagation either way (one join+agg per
    round, raises on non-convergence). At very high thresholds the
    duplicate graph is clique-shaped, so rounds = 2-3. The returned
    frame is backed by a lineage-truncated checkpoint: consume it
    (collect/write) BEFORE calling ``cache.release_intermediates()``
    — afterwards it can neither be read nor recomputed.
    """
    from dataset_grouper_spark.operators.dedup import connected_components

    if num_cells is not None:
        edges = cosine_pairs_cells(
            df,
            vec_col,
            id_col,
            threshold,
            # "auto": derive the cell count from the corpus size so the
            # work stays linear at any scale (the corpus-scale setting)
            None if num_cells == "auto" else num_cells,
            probe=probe,
            target_cell_rows=target_cell_rows,
            two_level_threshold=two_level_threshold,
            coarse_probe=coarse_probe,
        )
    else:
        edges = cosine_pairs(
            df, vec_col, id_col, threshold, num_blocks=num_blocks
        )
    comp = connected_components(
        edges.select("id_a", "id_b"), "id_a", "id_b", max_iter
    ).select(
        # aliased: a caller whose id column is literally named "id"
        # would otherwise hit AMBIGUOUS_REFERENCE after the join
        F.col("id").alias("_cc_id"),
        F.col("component").alias("_cc_component"),
    )
    return (
        df.select(F.col(id_col))
        .join(comp, df[id_col] == F.col("_cc_id"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_cc_component"), F.col(id_col)).alias(
                "cluster_id"
            ),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    vec_col: str,
    id_col: str,
    select_k: int = 10,
    lam: float = 0.7,
    round_digits: int = 6,
) -> DataFrame:
    """Maximal-marginal-relevance diversification of per-query
    candidate lists (Carbonell & Goldstein 1998) — the retrieval
    rerank step after :func:`cosine_topk`/ANN: greedily pick the
    candidate maximizing ``lam * rel - (1-lam) * max_sim_to_selected``
    so near-duplicate hits don't crowd the result page.

    ``candidates`` is a (query_id, neighbor_id, cosine) frame (the
    top-k output); candidate vectors are equijoined in (no broadcast
    hint — size-based planning). The greedy loop is inherently
    sequential PER QUERY but embarrassingly parallel ACROSS queries,
    so it runs as one ``applyInPandas`` over query groups: each group
    is k candidates (k^2 sims in one numpy matmul), never the corpus.
    Deterministic: candidates pre-sorted by (relevance desc, id asc),
    scores rounded to 12 before argmax, first-max wins.

    Returns (query_id, neighbor_id, cosine, mmr_score, mmr_rank) for
    the ``select_k`` chosen per query, rank 1..select_k. Sequential
    greedy selection has no SQL twin — verified against a pure-Python
    golden in tests instead (the PQ precedent).
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    cand = candidates.join(
        vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
        ),
        "neighbor_id",
    )

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.array(pdf["_v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        S = (V / norms[:, None]) @ (V / norms[:, None]).T
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        n = len(pdf)
        m = min(select_k, n)
        remaining = list(range(n))
        selected: list[int] = []
        scores_out: list[float] = []
        for _ in range(m):
            if not selected:
                best_pos = 0
                best_score = lam * rel[remaining[0]]
            else:
                maxsim = S[np.ix_(remaining, selected)].max(axis=1)
                sc = np.round(
                    lam * rel[remaining] - (1.0 - lam) * maxsim, 12
                )
                best_pos = int(np.argmax(sc))
                best_score = float(sc[best_pos])
            selected.append(remaining.pop(best_pos))
            scores_out.append(round(float(best_score), round_digits))
        out = pdf.iloc[selected][["query_id", "neighbor_id", "cosine"]]
        out = out.assign(
            mmr_score=scores_out, mmr_rank=range(1, m + 1)
        )
        return out

    return cand.groupBy("query_id").applyInPandas(
        fn,
        "query_id long, neighbor_id long, cosine double, "
        "mmr_score double, mmr_rank int",
    )
