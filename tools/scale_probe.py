"""10x scale probe (VERDICT r8 task 6): measure the heaviest queries
at sf0.1 AND at a replicated sf1, and report the scaling exponent.

The 100 TB posture has so far been argued from plan shape; this tool
makes it measured. It synthesizes an sf1 dataset by replicating sf0.1
ten times with key-space offsets (cardinalities scale like the data:
customers/orders/parts/suppliers/docs/users all 10x; nation/region
stay fixed like TPC-H). Document texts get a per-replica token suffix
so replication does NOT plant artificial cross-replica duplicates —
dedup queries see constant duplicate density, the way a real 10x
corpus would.

Usage::

    python tools/scale_probe.py            # build (if absent) + run
    python tools/scale_probe.py --rebuild  # force dataset rebuild

Writes BENCH_sf1.json: per-query cold seconds at both scales plus the
log10 scaling exponent (1.0 = linear). The probe list is the heavy
tier from the r8 verdict's audit table plus the r9 additions.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scratch", "sf1")
REPLICAS = 10

PROBE = [
    # graph pair + pagerank (lineitem-derived)
    "triangle_suppliers",
    "bfs_suppliers",
    "pagerank_partsupp",
    # entity resolution (customer)
    "entity_match_customers",
    "entity_clusters_customers",
    # dedup tier (documents)
    "minhash_lsh_candidates",
    "neardup_clusters_documents",
    "line_dedup_documents",
    "span_dedup_documents",
    # lakehouse lifecycle + streaming sources/sinks
    "compaction_roundtrip",
    "hudi_mor_read",
    "streaming_iceberg_source",
    "streaming_delta_sink_partitioned",
    # foreachBatch dedup family: state grows with the corpus — the
    # exactly-once snapshot-store scan is the superlinear risk the r9
    # probe never measured (r9 verdict task 4)
    "streaming_incremental_dedup",
    "streaming_span_dedup_documents",
    # join-heavy TPC-H + a cheap scan as the fixed-cost calibrator
    "tpch_q9_product_profit",
    "tpch_q1_pricing_summary",
    # r10 additions: fixed-memory bloom screen (bitset build scans the
    # corpus once; the screen must stay ~linear) and the tar-shard
    # lifecycle (shard write + streamed read both scale with bytes)
    "bloom_screen_dedup_documents",
    "webdataset_roundtrip",
    # r11: the exact all-pairs cosine family — O(n^2) BY CONTRACT
    # (expect exponent ~2: quantified honestly, the way r9 did for
    # ER) — and the cell-blocked SemDeDup that replaces it at corpus
    # scale (auto-sized cells; expect exponent ~1)
    "text_hashed_cosine_pairs",
    "embedding_neardup_clusters",
    "semdedup_cells_embeddings",
    "text_cosine_cells_documents",
    # r12: the TWO-LEVEL quantizer tier (forced past its threshold at
    # every scale) — the sqrt(C)-broadcast salted-cogroup assignment
    # must keep the family sublinear with the n x C term gone
    "semdedup_twolevel_embeddings",
    "text_cosine_twolevel_documents",
]


def _offsets(tbl, cols):
    """Per-column offset = max+1, so replica keyspaces never collide."""
    import pyarrow.compute as pc

    return {c: pc.max(tbl[c]).as_py() + 1 for c in cols}


def build_sf1() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    key_cols = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for name in ["region", "nation"]:
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(DST, f"{name}.parquet"),
        )
    for name, cols in key_cols.items():
        tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        offs = _offsets(tbl, cols)
        parts = []
        for r in range(REPLICAS):
            t = tbl
            for c in cols:
                t = t.set_column(
                    t.schema.get_field_index(c),
                    c,
                    pc.add(t[c], pa.scalar(r * offs[c], type=t[c].type)),
                )
            if name == "customer" and r > 0:
                # names literally encode the key (Customer#%09d): remap
                # them with the offset key, else replicas plant 10
                # exact-duplicate names and the ER queries measure an
                # artifact instead of block-size growth
                keys = t["c_custkey"].to_pylist()
                t = t.set_column(
                    t.schema.get_field_index("c_name"),
                    "c_name",
                    pa.array([f"Customer#{k:09d}" for k in keys]),
                )
            if name == "supplier" and r > 0:
                keys = t["s_suppkey"].to_pylist()
                t = t.set_column(
                    t.schema.get_field_index("s_name"),
                    "s_name",
                    pa.array([f"Supplier#{k:09d}" for k in keys]),
                )
            if name == "documents" and r > 0:
                # suffix every token so replicas are NOT near-dups of
                # each other: duplicate density stays constant at 10x
                texts = pc.replace_substring_regex(
                    t["text"], pattern=r"(\S+)", replacement=rf"\1_r{r}"
                )
                t = t.set_column(
                    t.schema.get_field_index("text"), "text", texts
                )
                t = t.set_column(
                    t.schema.get_field_index("n_chars"),
                    "n_chars",
                    pc.cast(pc.utf8_length(texts), pa.int64()),
                )
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(
            out, os.path.join(DST, f"{name}.parquet"), row_group_size=200_000
        )
        print(f"built {name}: {out.num_rows} rows", file=sys.stderr)


def entity_fix_probe() -> int:
    """Measure entity matching with max_block_size engaged at BOTH
    scales. Since r10 the CONTRACT queries engage the cap themselves
    (ER_MAX_BLOCK=400 mirrored into the DuckDB twins), so the main
    probe list already measures this shape; kept as the standalone
    A/B lever. Appends to BENCH_sf1.json."""
    import __spark_entry__ as entrymod
    from dataset_grouper_spark.operators import linkage
    from dataset_grouper_spark.session import get_spark
    from dataset_grouper_spark.sources import read_table

    spark = get_spark("scale_probe_fix")
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict[str, float] = {}
    for sf_name, sf_dir in [("sf0.1", SRC), ("sf1", DST)]:
        cust = read_table(spark, sf_dir, "customer")
        t0 = time.perf_counter()
        pairs = linkage.blocked_pairs(
            cust,
            "c_custkey",
            entrymod._customer_blocks(),
            max_block_size=400,
        )
        linkage.match_pairs(
            cust, pairs, "c_custkey", "c_name", entrymod.ER_MAX_DIST
        ).write.format("noop").mode("overwrite").save()
        rec[sf_name] = round(time.perf_counter() - t0, 3)
        print(f"{sf_name} entity_match_capped400: {rec[sf_name]}s",
              file=sys.stderr)
    import math

    rec["ratio"] = round(rec["sf1"] / rec["sf0.1"], 2)
    rec["exponent"] = round(math.log10(max(rec["ratio"], 0.01)), 2)
    path = os.path.join(REPO, "BENCH_sf1.json")
    with open(path) as f:
        data = json.load(f)
    data["probe"]["entity_match_capped400"] = rec
    with open(path, "w") as f:
        json.dump(data, f)
        f.write("\n")
    print(json.dumps(rec))
    return 0


def twolevel_prod_probe() -> int:
    """r13 (VERDICT r12 task 5): the two-level quantizer at a
    PRODUCTION-SHAPED cell count. The driver queries force the tier
    with threshold=4 at toy scale; here ``target_cell_rows=1``
    derives C = n cells — 5,000 at sf0.1 and 50,000 at sf1, the top
    scale past the DEFAULT ``two_level_threshold`` (2e4) — with the
    DEFAULT ``coarse_probe``/``target_assign_rows``, so the sqrt(C)
    coarse broadcast (~224 rows at sf1) and the salted-cogroup
    fan-out run at real C. Both scales pin ``two_level_threshold``
    low so the pair measures one code path. Per-task working set is
    bounded BY CONSTRUCTION at target_assign_rows vectors x that
    coarse cell's fine members (the salt fan-out enforces it); the
    rec records the derived C/sqrt(C) so the bound is auditable.
    Appends probe row 'text_cosine_twolevel_prodcells' to
    BENCH_sf1.json."""
    import math

    import __spark_entry__ as entrymod
    from dataset_grouper_spark.cache import release_intermediates
    from dataset_grouper_spark.functions import featurize
    from dataset_grouper_spark.operators import similarity
    from dataset_grouper_spark.session import get_spark
    from dataset_grouper_spark.sources import read_table

    spark = get_spark("scale_probe_twolevel")
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {}
    cells: dict = {}
    for sf_name, sf_dir in [("sf0.1", SRC), ("sf1", DST)]:
        docs = read_table(spark, sf_dir, "documents")
        n = docs.count()
        vecs = featurize.hashed_tf(
            docs, "text", "doc_id", entrymod.TF_DIM, normalize=False
        )
        t0 = time.perf_counter()
        similarity.cosine_pairs_cells(
            vecs,
            "vector",
            "doc_id",
            entrymod.TF_COSINE_T,
            probe=entrymod.SEMDEDUP_PROBE,
            target_cell_rows=1,  # C = n: 5e3 -> 5e4 cells
            two_level_threshold=1000,  # both scales on the tier
        ).write.format("noop").mode("overwrite").save()
        rec[sf_name] = round(time.perf_counter() - t0, 3)
        cells[sf_name] = {
            "rows": n,
            "cells": n,
            "n_coarse": math.ceil(math.sqrt(n)),
        }
        release_intermediates()
        print(
            f"{sf_name} twolevel_prodcells (C={n}): {rec[sf_name]}s",
            file=sys.stderr,
        )
    rec["ratio"] = round(rec["sf1"] / rec["sf0.1"], 2)
    rec["exponent"] = round(math.log10(max(rec["ratio"], 0.01)), 2)
    rec["shape"] = cells
    path = os.path.join(REPO, "BENCH_sf1.json")
    with open(path) as f:
        data = json.load(f)
    data["probe"]["text_cosine_twolevel_prodcells"] = rec
    with open(path, "w") as f:
        json.dump(data, f)
        f.write("\n")
    print(json.dumps(rec))
    return 0


def main() -> int:
    if "--rebuild" in sys.argv and os.path.isdir(DST):
        shutil.rmtree(DST)
    if not os.path.exists(os.path.join(DST, "lineitem.parquet")):
        build_sf1()
    if "--entity-fix" in sys.argv:
        return entity_fix_probe()
    if "--twolevel-prod" in sys.argv:
        return twolevel_prod_probe()

    import bench as benchmod
    import __spark_entry__ as entrymod
    from dataset_grouper_spark.cache import release_intermediates
    from dataset_grouper_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    queries = entrymod.queries()
    out: dict[str, dict] = {}
    # the same machine-speed calibrators bench.py embeds (r11): a
    # probe window whose per-tier calibrators disagree had its load
    # change mid-run — exponents from it are attribution-unsafe
    cals = {"start": benchmod._calibrate(spark, SRC)}
    for sf_name, sf_dir in [("sf0.1", SRC), ("sf1", DST)]:
        for name in PROBE:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            out.setdefault(name, {})[sf_name] = dt
            release_intermediates()
            entrymod._knn_cache_clear()
            print(f"{sf_name} {name}: {dt}s", file=sys.stderr)
        cals["after_" + sf_name] = benchmod._calibrate(spark, SRC)
    import math

    for name, rec in out.items():
        rec["ratio"] = round(rec["sf1"] / rec["sf0.1"], 2)
        # exponent e such that time ~ data^e (10x data step)
        rec["exponent"] = round(math.log10(max(rec["ratio"], 0.01)), 2)
    line = json.dumps(
        {
            "replicas": REPLICAS,
            "probe": out,
            "calibrators": cals,
            "calibrator_ref": benchmod.CALIBRATOR_REF,
            "note": "cold one-pass",
        }
    )
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as f:
        f.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
