"""Benchmark harness: runs every contract query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is executed to completion (count() materializes the whole
plan) and timed wall-clock after a warm-up of the session. The value is
the summed per-query seconds.

Queries run in FIXED alphabetical order, independent of the
queries() dict order: the dict rotates every round for the
correctness-oracle cap, and letting that rotation reorder the bench
shifts which query pays residual session state (JIT, shuffle-file
cache, GC pressure) — r4's "2.7x regression" on byte-identical
gopher_quality_documents was exactly this attribution artifact.
Pinned order makes per-query numbers comparable across rounds.

Two passes: "queries"/"value" are the FIRST (cold) pass — same
semantics as every earlier round's file, including each query's
one-time codegen/footer-cache costs. "queries_warm"/"value_warm" are
a SECOND pass over the same session, where those one-time costs are
gone; measured cold/warm gaps are 2-4x per query, so the warm numbers
are the ones stable enough for cross-round mover analysis.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from dataset_grouper_spark.cache import release_intermediates
from dataset_grouper_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session so the first measured query doesn't pay
    # one-time startup costs (codegen, Hadoop FS init, parquet footer
    # reader classes).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # fork the Python worker pool so the first pandas-UDF query is not
    # charged the one-time worker startup
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    def one_pass() -> dict[str, float]:
        timings: dict[str, float] = {}
        for name, fn in sorted(entrymod.queries().items()):
            t0 = time.perf_counter()
            # noop sink materializes EVERY output column (count() would
            # let Catalyst prune the projections we're trying to
            # measure).
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            # drop operator-persisted intermediates so cached partitions
            # don't accumulate across the query loop (long-lived session)
            release_intermediates()
        return timings

    cold = one_pass()
    warm = one_pass()
    # artifact completeness is structural, not procedural: the bench
    # CANNOT emit a file whose query set drifts from queries() —
    # VERDICT r6 #2 found 7 end-of-round queries missing from the
    # committed full artifact because the snapshot predated them
    missing = set(entrymod.queries()) - set(cold)
    extra = set(cold) - set(entrymod.queries())
    assert not missing and not extra, (
        f"bench artifact out of sync with queries(): "
        f"missing={sorted(missing)} extra={sorted(extra)}"
    )
    line = json.dumps(
        {
            "metric": "total_query_seconds",
            "value": round(sum(cold.values()), 3),
            "unit": "sec",
            "queries": cold,
            "value_warm": round(sum(warm.values()), 3),
            "queries_warm": warm,
            "sf": sf,
        }
    )
    print(line)
    # full per-query artifact (the driver's committed tail truncates):
    # set SPARK_GRAFT_BENCH_OUT to persist the whole cold+warm JSON —
    # committed per round as PERF_r{N}_full.json so movers can be
    # diffed across the entire surface (VERDICT r5 #3)
    dst = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if dst:
        with open(dst, "w") as f:
            f.write(line + "\n")
    sys.stdout.flush()
    # LAST line = a compact record that survives the driver's bounded
    # tail capture (r9's full line overflowed it: parsed null). Keeps
    # the driver-contract keys; "queries" holds the top-25 by cold
    # seconds, the full per-query dict lives in the line above and in
    # the committed PERF artifact.
    top = dict(
        sorted(cold.items(), key=lambda kv: -kv[1])[:25]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(cold.values()), 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(cold),
                "value_warm": round(sum(warm.values()), 3),
                "queries": {k: round(v, 1) for k, v in top.items()},
                "note": "compact tail record: queries=top-25 cold; "
                "full per-query cold+warm JSON precedes this line "
                "and is committed as PERF_r{N}_full.json",
            }
        )
    )


if __name__ == "__main__":
    main()
