"""Deduplication operators — north-star extensions (SURVEY §2.8).

Four tiers, each a standard technique re-expressed as declarative
DataFrame ops so Catalyst plans the shuffles:

- exact:        content hash -> groupBy -> keep canonical row
- ngram-jaccard: shingle self-join -> exact pairwise Jaccard
- minhash-LSH:  seeded universal-hash signatures -> banded bucket
                join -> candidate pairs (approx Jaccard at scale)
- simhash:      per-token hash bit-voting -> near-identical buckets

All hashing goes through functions/hashing.py (md5-based) so results
are engine-portable and oracle-checkable in SQL.

Scale notes (100 TB): exact dedup is one hash-shuffle; the LSH path is
the scalable near-dup join — candidate generation is |bands| narrow
shuffles on band keys instead of an O(n^2) cross join; the exact
jaccard path is for verification / small corpora (its shingle join
explodes on common shingles — cap via distinct shingles per doc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataset_grouper_spark.cache import defer_release, persist_tracked
from dataset_grouper_spark.localrel import local_frame

from dataset_grouper_spark.functions.hashing import (
    MERSENNE31,
    md5_long,
    minhash_params,
    perm_hash,
    word_ngrams,
)


def exact_dedup(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Keep one canonical row (min id) per exact content value.

    One shuffle on the 128-bit content hash; ties broken by id so the
    survivor set is deterministic. Returns the df filtered to
    survivors, plus a ``dup_count`` column (1 = unique).
    """
    w = Window.partitionBy("_h")
    ranked = (
        df.withColumn("_h", F.md5(F.col(content_col)))
        .withColumn("_rn", F.row_number().over(w.orderBy(F.col(id_col))))
        .withColumn("dup_count", F.count(F.lit(1)).over(w))
    )
    return ranked.filter(F.col("_rn") == 1).drop("_h", "_rn")


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle-hash) pairs — distinct word n-grams per doc, hashed
    to 60-bit longs BEFORE the distinct/shuffle.

    Two deliberate choices for scale:
    - Tokenization is projected into a column before the n-gram
      higher-order function so the split/regexp runs once per doc, not
      once per shingle (see hashing.ngrams_of_tokens).
    - Shingles shuffle as 8-byte hashes, not ~30-byte strings: the
      dedup semantics only need equality, and a 60-bit md5-derived
      space makes collisions negligible (~n^2/2^61) while cutting
      shuffle volume and join key comparisons several-fold.
    """
    from dataset_grouper_spark.functions.hashing import ngrams_of_tokens, tokens

    # n and the source columns ride along as column metadata so shared
    # shingle frames can be validated at their consumers (a frame built
    # with a different n would silently yield wrong signatures)
    meta = {"shingle_n": n, "text_col": text_col, "id_col": id_col}
    return (
        df.select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_t"))
        .select("_id", F.explode(ngrams_of_tokens(F.col("_t"), n)).alias("_sh"))
        .select(
            "_id", md5_long(F.col("_sh")).alias("shingle_h", metadata=meta)
        )
        .distinct()
    )


def _check_shingle_frame(sh: DataFrame, n: int, caller: str) -> None:
    """Guard a caller-supplied shared shingle frame: required columns,
    and — when the frame still carries :func:`shingles` metadata — the
    same ``n`` it was built with. A frame built with a different n
    would produce silently wrong signatures/fractions."""
    missing = {"_id", "shingle_h"} - set(sh.columns)
    if missing:
        raise ValueError(
            f"{caller}: shingle_df must have columns ('_id', 'shingle_h') "
            f"as produced by shingles(); missing {sorted(missing)}"
        )
    meta = sh.schema["shingle_h"].metadata or {}
    built_n = meta.get("shingle_n")
    if built_n is not None and int(built_n) != n:
        raise ValueError(
            f"{caller}: shingle_df was built with n={int(built_n)} but "
            f"n={n} was requested — pass a matching frame (n/text_col "
            "are taken from shingle_df when it is supplied)"
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise Jaccard similarity over word n-gram sets.

    intersection via shingle self-join; union = |A| + |B| - inter.
    Emits (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6
    for stable cross-engine comparison. O(sum_sh freq^2) — use the
    minhash path at scale, this one to verify it.
    """
    # The shingle frame feeds three subplans (two join sides + sizes);
    # persist it so the explode+distinct shuffle runs once, spilling to
    # disk when it outgrows memory.
    sh = persist_tracked(shingles(df, text_col, id_col, n))
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    # A shingle held by a single doc can never witness a pair — drop it
    # from BOTH join sides before the self-join (set sizes above are
    # already fixed from the full sets, so Jaccard is unchanged). In a
    # real corpus most shingles are unique, so this shrinks the join
    # input by far more than the extra freq aggregation costs.
    shared = (
        sh.groupBy("shingle_h")
        .agg(F.count(F.lit(1)).alias("_f"))
        .filter(F.col("_f") >= 2)
        .select("shingle_h")
    )
    sh_join = sh.join(shared, "shingle_h")
    a = sh_join.alias("a")
    b = sh_join.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle_h") == F.col("b.shingle_h")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_sz", "_sza"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_sz", "_szb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_perm: int = 16,
    seed: int = 42,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Per-doc minhash signature columns m0..m{k-1}.

    min over shingles of h_i(md5_long(shingle)) — one aggregation, all
    Catalyst min()s, partial-aggregated map-side. Docs with no shingles
    (fewer than n words) have no rows here and are absent from the
    output — they cannot near-duplicate anything under this measure.

    ``shingle_df`` lets compositions that already computed
    ``shingles(df, text_col, id_col, n)`` (ideally persisted) share the
    pass instead of re-tokenizing the corpus. When supplied, it is the
    source of truth: ``text_col`` and ``n`` are NOT re-applied — the
    frame is validated against ``n`` (via the metadata ``shingles()``
    stamps) and a mismatch raises.
    """
    params = minhash_params(num_perm, seed)
    if shingle_df is not None:
        _check_shingle_frame(shingle_df, n, "minhash_signatures")
        sh = shingle_df
    else:
        sh = shingles(df, text_col, id_col, n)  # already 60-bit hashed
    aggs = [
        F.coalesce(
            F.min(perm_hash(F.col("shingle_h"), a, b)), F.lit(MERSENNE31)
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    return sh.groupBy(F.col("_id").alias(id_col)).agg(*aggs)


def _band_keys(num_perm: int, bands: int) -> Column:
    """Shared LSH band-key array: band index + its r signature
    components, '_'-joined. ONE definition — the candidate join, the
    oversized-bucket audit, and the incremental screen must agree on
    the key format or they silently diverge. Validates the config:
    bands must divide num_perm (a non-dividing config silently ignores
    the signature tail), and bands > num_perm would make r = 0 — every
    band key collapses to the bare band index and ALL docs collide in
    every bucket (observed failure mode: the incremental screen then
    drops the entire new batch)."""
    if bands < 1 or num_perm < 1:
        raise ValueError("num_perm and bands must be >= 1")
    if num_perm % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_perm={num_perm} exactly "
            "(r = num_perm // bands signature rows per band)"
        )
    r = num_perm // bands
    return F.array(
        *[
            F.concat_ws(
                "_",
                F.lit(str(b)),
                *[F.col(f"m{b * r + j}").cast("string") for j in range(r)],
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    num_perm: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing any band of the
    signature. rows_per_band = num_perm // bands; collision prob for
    jaccard s is 1-(1-s^r)^b (the S-curve).

    One narrow shuffle per band on the band key — no cross join.
    Returns distinct (id_a, id_b), id_a < id_b.

    Hot-bucket guard: the band self-join emits |bucket|^2/2 pairs per
    bucket, and web-scale corpora have degenerate buckets (boilerplate
    pages — millions of near-identical docs sharing every band). One
    such key would become a single task computing 10^12 pairs; AQE
    skew-split fixes the shuffle, not the quadratic output. So bucket
    membership is capped at ``max_bucket_size`` docs (smallest ids
    kept — deterministic), bounding any bucket's output at cap^2/2.
    Docs above the cap in a hot bucket still pair via their other
    bands, and a bucket that hot means near-identical docs whose
    survivors the kept members' components already represent. Use
    ``lsh_oversized_buckets`` to audit what a cap would truncate;
    ``max_bucket_size=None`` disables the guard.
    """
    # One row per (doc, band) with the band key embedding the band
    # index — so ALL bands join in a single equijoin on one shuffle,
    # instead of `bands` separate self-joins each recomputing the
    # signature subplan. At 100 TB this is the difference between 1
    # and `2*bands` passes over the corpus.
    band_keys = _band_keys(num_perm, bands)
    banded = sigs.select(
        F.col(id_col).alias("_id"), F.explode(band_keys).alias("_band")
    )
    if max_bucket_size is not None:
        wb = Window.partitionBy("_band").orderBy("_id")
        banded = (
            banded.withColumn("_bk_rank", F.row_number().over(wb))
            .filter(F.col("_bk_rank") <= max_bucket_size)
            .drop("_bk_rank")
        )
    banded = persist_tracked(banded)
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x._band") == F.col("y._band"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )


def lsh_oversized_buckets(
    sigs: DataFrame,
    id_col: str,
    num_perm: int = 16,
    bands: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Audit twin of the hot-bucket guard in ``lsh_candidate_pairs``:
    per-band-key membership counts for buckets ABOVE the cap —
    (band_key, n_docs, n_dropped). One agg over the exploded bands;
    empty output means the cap is inert on this corpus."""
    band_keys = _band_keys(num_perm, bands)
    return (
        sigs.select(F.explode(band_keys).alias("band_key"))
        .groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket_size)
        .withColumn("n_dropped", F.col("n_docs") - F.lit(max_bucket_size))
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    seed: int = 42,
    verify_threshold: float | None = None,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates ->
    (optional) exact-jaccard verification of candidates only.

    With ``verify_threshold`` set, candidates are re-scored with exact
    n-gram Jaccard (join back to shingles) — the classic
    candidate-then-verify shape that keeps the exact computation off
    the full corpus.

    ``max_bucket_size`` (default 1000) caps per-LSH-bucket membership:
    buckets larger than the cap keep only the smallest ``max_bucket_size``
    doc ids, so a degenerate bucket (e.g. the empty-text bucket) cannot
    produce O(n^2) candidate pairs. This drops candidate pairs — and so
    reduces dedup RECALL — in hot buckets; pass ``None`` to disable the
    cap, and use ``lsh_oversized_buckets`` to audit what a given cap
    would drop.
    """
    sigs = minhash_signatures(df, text_col, id_col, n, num_perm, seed)
    cands = lsh_candidate_pairs(
        sigs, id_col, num_perm, bands, max_bucket_size=max_bucket_size
    )
    if verify_threshold is None:
        return cands
    # exact Jaccard over CANDIDATE DOCS ONLY — computing it over the
    # full corpus would re-run the quadratic shingle self-join LSH
    # exists to avoid; the intersection with `cands` is unchanged
    # (every candidate pair has both endpoints in the subset)
    cand_ids = (
        cands.select(F.col("id_a").alias("_cid"))
        .union(cands.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    subset = df.join(
        cand_ids, df[id_col] == F.col("_cid"), "left_semi"
    )
    exact = ngram_jaccard_pairs(subset, text_col, id_col, n, verify_threshold)
    return cands.join(exact, ["id_a", "id_b"], "inner")


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16
) -> DataFrame:
    """Per-doc simhash: each token votes +1/-1 on each bit of its hash;
    bit = 1 where the vote sum is positive (Charikar 2002).

    Shape: explode (token, bit) pairs -> two-level aggregation — all
    built-in, partial-aggregated. Near-identical docs share simhash
    values; group on it for near-dup buckets.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.split(
                F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"^\s+|\s+$", ""),
                " ",
                -1,
            )
        ).alias("_tok"),
    ).withColumn("_h", md5_long(F.col("_tok")))
    # One aggregate column per bit (literal shifts keep everything in
    # int64 — no float pow, no per-row Python). Partial aggregation
    # means each map task ships `bits` longs per doc, not tokens.
    votes = [
        F.sum(
            F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"_s{i}")
        for i in range(bits)
    ]
    per_doc = toks.groupBy(F.col("_id").alias(id_col)).agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim + F.when(F.col(f"_s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return per_doc.select(F.col(id_col), sim.alias("simhash"))


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Checkpoint ``df`` lazily so iterative plans stay flat.

    Every min-label round references the previous round's labels 2-3
    times, so without truncation the analyzed plan grows ~2-3x per
    round — by round ~25 the tree has millions of nodes and the
    driver OOMs just STRINGIFYING it for the SQL listener (measured).
    With truncation each round plans against a flat scan of the
    previous round's materialized partitions.

    Uses a reliable ``checkpoint`` when the session has a checkpoint
    dir (cluster-safe: survives executor loss), else ``localCheckpoint``
    (fast, but partitions die with their executor — fine on local and
    for short loops; set a checkpoint dir for long cluster runs).
    ``eager=False`` so the convergence count doubles as the
    materializing action — one job per round.
    """
    sc = df.sparkSession.sparkContext
    if getattr(sc, "getCheckpointDir", lambda: None)():
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def _release_truncated(df: DataFrame) -> None:
    """Unpersist a checkpointed frame's backing partitions (best
    effort — the analyzed plan of a checkpointed Dataset is a
    LogicalRDD wrapping the materialized RDD)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # private API drifted — ContextCleaner reclaims on GC


# plain min-label rounds before the loop escalates to pointer
# shortcutting: covers the clique-shaped graphs (diameter 1-2) on the
# cheap rounds, bounds everything else at ~3 + log2(diameter) rounds
_CC_ESCALATE_AFTER = 3


def _cc_min_label_loop(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    jump: bool,
    name: str,
) -> DataFrame:
    """Shared min-label-propagation loop; ``jump=True`` adds pointer
    shortcutting from round 1. Per round: 1-2 shuffle joins + one agg;
    the driver sees only the 1-row convergence count; each round's
    labels are lineage-truncated and the previous round's partitions
    released, so storage stays bounded at two label tables.

    With ``jump=False`` the loop AUTO-ESCALATES to pointer shortcutting
    after ``_CC_ESCALATE_AFTER`` non-converged rounds (r13): clique
    near-dup graphs still converge on the cheap 1-join rounds, but a
    chain-shaped graph (measured: embedding near-dup at bench scale has
    diameter ~17, costing 17 x ~6 scheduler-bound jobs) switches to
    O(log diameter) rounds instead of O(diameter). Shortcutting only
    tightens labels (monotone), and convergence is checked on the
    combined step, so the fixpoint — component = min id — is the same
    by either route."""
    # persist the RAW edge list before symmetrizing: the union reads its
    # input twice, and edges is typically an expensive pair join (LSH
    # bucket join, blocked cosine tiles) that must not execute twice
    ep = persist_tracked(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    sym = persist_tracked(
        ep.union(ep.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    labels = _truncate_lineage(
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    prev = labels
    changed = 0
    for _round in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("label").alias("_nl"))
        )
        step = labels.join(nbr, labels["id"] == nbr["a"], "left").select(
            "id",
            F.col("label").alias("_old"),
            F.least(
                F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
            ).alias("label"),
        )
        if jump or _round >= _CC_ESCALATE_AFTER:
            # shortcut: l(v) <- min(l(v), l(l(v))). l is monotone
            # non-increasing, so jumping can only tighten labels.
            l2 = labels.select(
                F.col("id").alias("_lid"), F.col("label").alias("_ll")
            )
            step = step.join(l2, step["label"] == l2["_lid"], "left").select(
                "id",
                "_old",
                F.least(
                    F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))
                ).alias("label"),
            )
        step = _truncate_lineage(step)
        changed = step.filter(F.col("label") != F.col("_old")).count()
        _release_truncated(prev)
        prev = step
        labels = step.select("id", "label")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"{name} did not converge in {max_iter} rounds "
            f"({changed} labels still changing). The graph diameter exceeds "
            "the round budget — raise max_iter, or use "
            "connected_components_jump (O(log diameter)) for long-chain "
            "graphs."
        )
    # the final round's partitions back the RETURNED frame — release
    # them with the other intermediates once the caller is done
    defer_release(lambda df=prev: _release_truncated(df))
    return labels.select("id", F.col("label").alias("component"))


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over an undirected edge list by min-label
    propagation: every node starts labeled with its own id; each round
    it takes the min of its own and its neighbors' labels, until a
    round changes nothing. Returns (id, component) for every node WITH
    at least one edge — component is the min node id of its component.

    Rounds needed = graph diameter. Near-dup graphs are dense little
    cliques (diameter 1-2, so 2-3 rounds); for long-chain /
    high-diameter graphs use :func:`connected_components_jump`
    (O(log diameter) rounds, same per-round join shape).

    Each round is one shuffle join + one aggregation, driver-side only
    the 1-row convergence count; per-round labels are lineage-truncated
    and released next round (bounded storage, flat plans). Raises
    RuntimeError if ``max_iter`` rounds end with labels still changing
    — silent unconverged labels would be silently wrong components.

    The returned frame is backed by a lineage-truncated checkpoint:
    consume it (collect/write) BEFORE calling
    ``cache.release_intermediates()`` — afterwards it can neither be
    read nor recomputed.
    """
    return _cc_min_label_loop(
        edges, src, dst, max_iter, jump=False, name="connected_components"
    )


def connected_components_jump(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components with pointer jumping — O(log diameter)
    rounds on ANY graph shape, vs ``connected_components``'s
    O(diameter). Use this for long-chain / high-diameter graphs; on the
    clique-shaped near-dup graphs the plain scheme's cheaper rounds
    win.

    Each round does the min-label neighbor step PLUS label
    shortcutting (l(v) <- min of l(v), min_u l(u), l(l(v)) — the
    classic parallel shortcut that halves the pointer-chain depth every
    round, Shiloach-Vishkin style). Two shuffle joins + one agg per
    round, driver sees only the 1-row convergence count. 25 rounds
    covers graphs of diameter ~2^25.

    Returns (id, component) for every node with at least one edge;
    component = min node id of the component. Raises on
    non-convergence like ``connected_components``.
    """
    return _cc_min_label_loop(
        edges, src, dst, max_iter, jump=True,
        name="connected_components_jump",
    )


def cluster_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    seed: int = 42,
    verify_threshold: float | None = None,
    max_iter: int = 50,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Assign every document a near-dup cluster id (the min doc id of
    its connected component in the candidate graph); docs with no
    near-dup edge are their own singleton cluster.

    This is the standard production dedup shape (e.g. the RefinedWeb /
    SlimPajama pipelines): MinHash -> banded LSH candidates ->
    (optional) exact-Jaccard verify -> connected components ->
    keep one survivor per cluster (``cluster_id == id`` rows).
    Returns (id_col, cluster_id).

    ``max_bucket_size`` caps hot LSH buckets (see ``minhash_lsh_dedup``);
    capped buckets lose candidate edges, which can split clusters that
    an uncapped run would merge. ``None`` disables the cap.
    """
    edges = minhash_lsh_dedup(
        df, text_col, id_col, n, num_perm, bands, seed, verify_threshold,
        max_bucket_size=max_bucket_size,
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


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    max_broadcast_shingles: int = 4_000_000,
) -> DataFrame:
    """Benchmark decontamination scan (the GPT-3 appendix-C shape):
    per training doc, how many of its distinct word n-grams appear in
    ANY benchmark/eval doc, and how many benchmark docs it hits.

    Returns one row per doc: (id_col, total_ngrams,
    contaminated_ngrams, bench_docs_hit) — all counts, zero for clean
    docs, so thresholding (drop if contaminated_ngrams > 0, or by
    ratio) is the caller's one filter.

    Scale shape: ONE corpus shingle pass — a left join against the
    benchmark shingles marks contaminated shingles in place, and a
    single conditional aggregation produces all three counts, so the
    corpus is never tokenized or shuffled twice (a separate total/hit
    branch pair would re-run the whole shingle subtree — no exchange
    reuse across groupBys). Eval sets are ~1e3-1e6 n-grams, tiny vs a
    100 TB corpus, so the bench side broadcasts — but only after a
    bounded guard job confirms it is under ``max_broadcast_shingles``
    (nothing stops a caller passing a corpus as ``bench``; an
    unbounded relation is never broadcast). n=13 is the canonical
    contamination gram size; lower it for short texts.
    """
    d = shingles(docs, text_col, id_col, n)
    # persist BEFORE the guard probe: the probe job executes the bench
    # shingle expansion, and without the cache the join would re-run it
    # from scratch on either branch (the _bounded_broadcast_join
    # lesson, similarity.py). Released by release_intermediates.
    b = persist_tracked(
        shingles(bench, text_col, id_col, n).select(
            F.col("_id").alias("_bid"), "shingle_h"
        )
    )
    n_b = b.limit(max_broadcast_shingles + 1).count()
    bj = F.broadcast(b) if n_b <= max_broadcast_shingles else b
    marked = d.join(bj, "shingle_h", "left")
    stats = marked.groupBy(F.col("_id").alias("id")).agg(
        F.countDistinct("shingle_h").alias("total_ngrams"),
        F.countDistinct(
            F.when(F.col("_bid").isNotNull(), F.col("shingle_h"))
        ).alias("contaminated_ngrams"),
        F.countDistinct("_bid").alias("bench_docs_hit"),
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("total_ngrams", F.lit(0)).alias("total_ngrams"),
            F.coalesce("contaminated_ngrams", F.lit(0)).alias(
                "contaminated_ngrams"
            ),
            F.coalesce("bench_docs_hit", F.lit(0)).alias("bench_docs_hit"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    max_contaminated_ngrams: int = 0,
) -> DataFrame:
    """Filter ``docs`` to rows whose benchmark n-gram overlap is at
    most ``max_contaminated_ngrams`` (default: any overlap drops the
    doc). Schema-preserving."""
    bad = (
        contamination(docs, bench, text_col, id_col, n)
        .filter(F.col("contaminated_ngrams") > max_contaminated_ngrams)
        .select(F.col(id_col))
    )
    return docs.join(bad, id_col, "left_anti")


def duplicate_ngram_fraction(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Per-doc duplicated-span signal: the fraction of a doc's distinct
    word n-grams that also appear in ANY other doc ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022 — the
    cheap relational stand-in for their suffix-array substring dedup).
    High-fraction docs are boilerplate/template suspects even when no
    single near-dup partner exists.

    One shingle pass + one n-gram-key aggregation joined back: a
    shingle is duplicated iff its doc-frequency > 1. Returns
    (id_col, total_ngrams, dup_ngrams, dup_frac), dup_frac rounded for
    cross-engine hashing; docs with no n-grams report zeros.
    ``shingle_df``: see :func:`minhash_signatures` (validated the same
    way; ``n``/``text_col`` are not re-applied to a supplied frame).
    """
    # the shingle frame feeds both the doc-frequency agg and the
    # join-back — persist it or the corpus tokenizes twice
    if shingle_df is not None:
        _check_shingle_frame(shingle_df, n, "duplicate_ngram_fraction")
        d = shingle_df
    else:
        d = persist_tracked(shingles(df, text_col, id_col, n))
    freq = d.groupBy("shingle_h").agg(F.count(F.lit(1)).alias("_df"))
    stats = (
        d.join(freq, "shingle_h")
        .groupBy(F.col("_id").alias("id"))
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.sum((F.col("_df") > 1).cast("long")).alias("dup_ngrams"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("total_ngrams", F.lit(0)).alias("total_ngrams"),
            F.coalesce("dup_ngrams", F.lit(0)).alias("dup_ngrams"),
            F.round(
                F.coalesce(
                    F.col("dup_ngrams") / F.col("total_ngrams"), F.lit(0.0)
                ),
                6,
            ).alias("dup_frac"),
        )
    )


def exact_dedup_against(
    new: DataFrame, existing: DataFrame, content_col: str
) -> DataFrame:
    """Incremental exact dedup: drop new-batch rows whose content
    already exists in the corpus. One anti join on the 128-bit content
    hash — the existing side reduces to distinct hashes first, so the
    join input is |corpus-distinct|, not |corpus|. Schema-preserving."""
    seen = existing.select(
        F.md5(F.col(content_col)).alias("_h")
    ).distinct()
    return (
        new.withColumn("_h", F.md5(F.col(content_col)))
        .join(seen, "_h", "left_anti")
        .drop("_h")
    )


def minhash_dedup_against(
    new: DataFrame,
    existing: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Incremental near-dup screen: drop new-batch docs that share any
    LSH band with an existing-corpus doc (the ingest-time variant of
    minhash_lsh_dedup — a new crawl batch is screened against the
    standing corpus without self-joining the corpus).

    Scale shape: both sides get one signature pass; the band join is
    new x existing ONLY (the big corpus never self-joins), and at
    ingest |new| << |corpus| so the banded new side is the small probe.
    Returns the surviving new rows, schema-preserving.
    """
    def banded(sigs: DataFrame) -> DataFrame:
        band_keys = _band_keys(num_perm, bands)
        return sigs.select(
            F.col(id_col).alias("_id"), F.explode(band_keys).alias("_band")
        )

    new_b = banded(minhash_signatures(new, text_col, id_col, n, num_perm, seed))
    old_b = banded(
        minhash_signatures(existing, text_col, id_col, n, num_perm, seed)
    ).select("_band").distinct()
    hit_ids = new_b.join(old_b, "_band").select("_id").distinct()
    return new.join(
        hit_ids.withColumnRenamed("_id", id_col), id_col, "left_anti"
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 3,
    min_len: int = 10,
) -> DataFrame:
    """Lines that repeat across >= ``min_docs`` DISTINCT documents —
    the nav/footer/cookie-banner boilerplate a crawl smears over every
    page (the line-level repetition-removal pass of CCNet/RefinedWeb
    pipelines, applied cross-corpus). A line is eligible when its
    trimmed length >= ``min_len`` chars, so blank separators and
    one-char bullets are never counted. Returns (line_h, n_docs) — the
    60-bit line hash and its distinct-document frequency.

    Scale shape: lines shuffle as 8-byte md5-derived hashes, never as
    strings (the agg key for a 100 TB crawl's distinct-line table is
    what dominates this pass); the distinct-doc count is a two-level
    partial agg Catalyst plans on its own. One shuffle total.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "_line"
        ),
    ).filter(F.length(F.trim(F.col("_line"))) >= min_len)
    return (
        lines.select("_id", md5_long(F.col("_line")).alias("line_h"))
        .groupBy("line_h")
        .agg(F.count_distinct(F.col("_id")).alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(min_docs))
    )


def line_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 3,
    min_len: int = 10,
) -> DataFrame:
    """Strip cross-document boilerplate lines from every document:
    any line occurring in >= ``min_docs`` distinct docs (at trimmed
    length >= ``min_len``) is removed from ALL of them, and each text
    is rebuilt from its surviving lines in order. The standard
    line-level dedup pass of web-crawl curation (CCNet §3 'paragraph
    deduplication', RefinedWeb line-wise filtering), cross-corpus.

    Returns one row per input doc: every original column plus
    ``n_lines`` (original line count), ``n_removed`` (boilerplate
    lines dropped), and ``{text_col}_clean`` (the rebuilt text; empty
    string when every line was boilerplate).

    Scale shape: one agg shuffle for the boilerplate table
    (:func:`boilerplate_lines`, 8-byte hash keys), one broadcast-or-
    shuffle anti join of exploded lines against it (Catalyst/AQE
    chooses — the boilerplate table is the min_docs-filtered tail, far
    smaller than the line table), one regroup by doc to rebuild texts.
    ``n_lines`` is a pure projection (``size(split(..))``) on the
    original row — the only explode+regroup is over SURVIVING lines.
    The rebuild sorts each doc's surviving lines by position inside a
    single ``array_sort`` over the collected struct array — no global
    window, no skew beyond the largest single document.
    """
    boiler = boilerplate_lines(df, text_col, id_col, min_docs, min_len)
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("_pos", "_line"),
    ).withColumn("line_h", md5_long(F.col("_line")))
    kept = lines.join(
        boiler.select("line_h"), "line_h", "left_anti"
    )
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_line")))
                ),
                lambda s: s.getField("_line"),
            ),
            "\n",
        ).alias(f"{text_col}_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    return (
        df.withColumn(
            "n_lines",
            F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).cast(
                "long"
            ),
        )
        .join(rebuilt.withColumnRenamed("_id", id_col), id_col, "left")
        .withColumn(
            "n_removed",
            F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0)),
        )
        .withColumn(
            f"{text_col}_clean",
            F.coalesce(F.col(f"{text_col}_clean"), F.lit("")),
        )
        .drop("_n_kept")
    )


def line_dedup_sql(
    table: str,
    text_col: str,
    id_col: str,
    min_docs: int = 3,
    min_len: int = 10,
) -> str:
    """DuckDB twin of :func:`line_dedup` (per-doc summary projection:
    id, n_lines, n_removed, clean length, clean-text md5)."""
    from dataset_grouper_spark.functions.hashing import md5_long_sql

    return f"""
        WITH lines AS (
            SELECT {id_col} AS _id,
                   x.pos AS _pos,
                   x.line AS _line,
                   {md5_long_sql("x.line")} AS line_h
            FROM {table},
                 LATERAL (
                     SELECT UNNEST(string_split(coalesce({text_col}, ''), chr(10))) AS line,
                            generate_subscripts(string_split(coalesce({text_col}, ''), chr(10)), 1) AS pos
                 ) AS x
        ),
        boiler AS (
            SELECT line_h
            FROM lines
            WHERE length(trim(_line)) >= {min_len}
            GROUP BY line_h
            HAVING count(DISTINCT _id) >= {min_docs}
        ),
        kept AS (
            SELECT l.* FROM lines l ANTI JOIN boiler b USING (line_h)
        ),
        rebuilt AS (
            SELECT _id,
                   string_agg(_line, chr(10) ORDER BY _pos) AS clean_text,
                   count(*) AS _n_kept
            FROM kept GROUP BY _id
        ),
        totals AS (
            SELECT _id, count(*) AS n_lines FROM lines GROUP BY _id
        )
        SELECT t._id AS {id_col},
               CAST(t.n_lines AS BIGINT) AS n_lines,
               CAST(t.n_lines - coalesce(r._n_kept, 0) AS BIGINT) AS n_removed,
               CAST(strlen(coalesce(r.clean_text, '')) AS BIGINT) AS clean_len,
               md5(coalesce(r.clean_text, '')) AS clean_md5
        FROM totals t LEFT JOIN rebuilt r USING (_id)
    """


def fingerprint_screen_against(
    new: DataFrame,
    existing: DataFrame,
    content_col: str,
    max_broadcast_fps: int = 2_000_000,
) -> DataFrame:
    """Incremental exact dedup with a BROADCAST FINGERPRINT SCREEN —
    the relational form of the Bloom-filter pre-join every large-scale
    dedup pipeline runs: the corpus's distinct 60-bit content
    fingerprints broadcast to every task and split the new batch
    WITHOUT shuffling it; rows whose fingerprint is absent are
    DEFINITELY new (a fingerprint set has no false negatives) and
    skip the exact check entirely, only fingerprint hits go through
    the exact 128-bit anti join. Output is row-identical to
    :func:`exact_dedup_against` — the screen is a pure plan
    optimization, never a semantics change.

    Scale shape: the broadcast is bounded by a guarded count (the
    ``_bounded_broadcast_join`` idiom): at most ``max_broadcast_fps``
    distinct fingerprints (8 bytes each — the default caps the
    broadcast at ~16 MB) are fetched in one bounded job; past the cap
    the screen is skipped and the operator degrades to the plain
    shuffle anti join AQE plans — an unbounded relation is never
    broadcast. At ingest (|new| << |corpus|) with the screen active,
    the 100 TB corpus contributes ONE distinct-fingerprint aggregation
    and zero shuffled rows of the new batch; without the screen every
    new-batch row shuffles against the corpus hash table.
    """
    fps = (
        existing.select(md5_long(F.col(content_col)).alias("_fp"))
        .distinct()
    )
    fps = persist_tracked(fps)
    probe = fps.limit(max_broadcast_fps + 1).collect()
    if len(probe) > max_broadcast_fps:
        # corpus fingerprints exceed the broadcast budget: the same
        # hit/miss split as the broadcast branch, but as shuffle
        # semi/anti joins. Misses are DEFINITELY new (no false
        # negatives); only fingerprint hits — which include 60-bit
        # collisions on genuinely-new content — go through the exact
        # 128-bit check, so the output stays row-identical to
        # exact_dedup_against.
        tagged = new.withColumn("_fp", md5_long(F.col(content_col)))
        fresh = tagged.join(fps, "_fp", "left_anti").drop("_fp")
        maybe = tagged.join(fps, "_fp", "left_semi").drop("_fp")
        return fresh.unionByName(
            exact_dedup_against(maybe, existing, content_col)
        )
    spark = new.sparkSession
    local = local_frame(spark, probe, fps.schema)
    fps.unpersist()
    tagged = new.withColumn(
        "_fp", md5_long(F.col(content_col))
    ).join(F.broadcast(local.withColumn("_hit", F.lit(1))), "_fp", "left")
    fresh = tagged.filter(F.col("_hit").isNull()).drop("_fp", "_hit")
    maybe = tagged.filter(F.col("_hit").isNotNull()).drop("_fp", "_hit")
    return fresh.unionByName(
        exact_dedup_against(maybe, existing, content_col)
    )
