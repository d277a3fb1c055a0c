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


# Machine-speed calibrators (VERDICT r10 task 3): the same committed
# tree measured 382.8 / 406.5 / 484.7 total seconds in three r10
# windows on this shared VM — pure measurement-window drift. Each
# artifact now embeds a fixed calibrator trio timed at START and END
# of the run: a pure-JVM whole-stage-codegen sum and one parquet
# scan+agg (median of 3), plus — VERDICT r11 task 3, the burst
# calibrators demonstrably miss sustained-load throttling — one
# SUSTAINED ~5-10s three-join shuffle+agg over generated data (min of
# 2 after a codegen warm-up; min is the load-interference-robust
# statistic). REF below is the quiet-window reference measured when
# each calibrator landed (jvm/parquet r11, sustained r12); "drift" =
# mean measured/REF ratio, and value_drift_normalized = value / drift
# puts any two rounds' totals on the same machine-speed axis
# (per-query normalized = raw / drift, derivable — only totals are
# emitted to keep the artifact shape stable). The definitive
# code-vs-machine instrument remains the order-controlled same-code
# A/B (tools/ab_check.py), embedded below as ab_vs_prev.
#
# sustained REF derivation (r12, recorded honestly): no quiet window
# was available when it landed — measured 4.25s in a window whose
# burst calibrators read 1.40x over their r11 quiet REFs, so REF =
# 4.25 / 1.40 ~= 3.0. Re-pin from a genuinely quiet window if one
# shows a materially different value.
CALIBRATOR_REF = {"jvm": 0.17, "parquet": 0.30, "sustained": 3.0}


def _sustained_query(spark, n: int) -> None:
    # fixed TPC-H-shaped 3-join: 32-way shuffles, broadcast dim,
    # multi-stage agg — long enough (~5-10s at 50M) to surface the
    # sustained-load throttling the 0.2s bursts cannot see
    a = spark.range(n).selectExpr(
        "id", "id % 1000000 AS k1", "id % 971 AS k2"
    )
    b = spark.range(1_000_000).selectExpr("id AS k1", "id % 1013 AS v1")
    c = spark.range(971).selectExpr("id AS k2", "id * 7 AS v2")
    (
        a.join(b, "k1")
        .join(c, "k2")
        .selectExpr("v1 % 31 AS g", "id + v1 + v2 AS x")
        .groupBy("g")
        .agg({"x": "sum", "*": "count"})
        .collect()
    )


def _calibrate(spark, sf_dir: str) -> dict[str, float]:
    import gc
    import statistics

    jvm, pq = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(150_000_000).selectExpr("sum(id * 3 + 1)").collect()
        jvm.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        spark.read.parquet(
            os.path.join(sf_dir, "lineitem.parquet")
        ).selectExpr(
            "sum(l_extendedprice)", "sum(l_quantity)", "count(*)"
        ).collect()
        pq.append(time.perf_counter() - t0)
    sust = []
    _sustained_query(spark, 1_000_000)  # codegen warm-up, unmeasured
    for _ in range(2):
        # accumulated shuffle files from the measured run inflate the
        # next one by 2-3x unless the JVM cleaner runs — force it
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        _sustained_query(spark, 50_000_000)
        sust.append(time.perf_counter() - t0)
    return {
        "jvm": round(statistics.median(jvm), 3),
        "parquet": round(statistics.median(pq), 3),
        "sustained": round(min(sust), 3),
    }


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

    cal_start = _calibrate(spark, sf_dir)
    cold = one_pass()
    warm = one_pass()
    cal_end = _calibrate(spark, sf_dir)
    drift = round(
        sum(
            cal[k] / CALIBRATOR_REF[k]
            for cal in (cal_start, cal_end)
            for k in CALIBRATOR_REF
        )
        / (2 * len(CALIBRATOR_REF)),
        3,
    )
    # order-controlled same-code A/B vs the prior round-close commit
    # (VERDICT r11 task 3) — the definitive code-vs-machine number;
    # runs in its own subprocesses AFTER this session stops so the
    # four passes get the whole machine. Skip with SPARK_GRAFT_AB=0
    # (e.g. when iterating at sf0.01) or when the pin is absent.
    ab: dict = {}
    ab_pin = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools",
        "ab_prev_commit.txt",
    )
    if os.environ.get("SPARK_GRAFT_AB", "1") != "0" and os.path.exists(
        ab_pin
    ):
        import subprocess

        spark.stop()
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "tools",
                        "ab_check.py",
                    ),
                    "--json",
                ],
                capture_output=True,
                text=True,
                timeout=3600,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            )
            full = json.loads(proc.stdout.strip().splitlines()[-1])
            ab = {
                "ab_vs_prev": full.get("ab_vs_prev"),
                "ab_prev_commit": full.get("ab_prev_commit"),
                "ab_ratios": full.get("ab_ratios"),
            }
        except Exception as exc:  # noqa: BLE001 — bench must still emit
            ab = {"ab_vs_prev": None, "ab_error": str(exc)[:300]}
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
            "calibrator_start": cal_start,
            "calibrator_end": cal_end,
            "calibrator_ref": CALIBRATOR_REF,
            "drift": drift,
            "value_drift_normalized": round(
                sum(cold.values()) / max(drift, 0.01), 3
            ),
            "value_warm_drift_normalized": round(
                sum(warm.values()) / max(drift, 0.01), 3
            ),
            **ab,
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
    # seconds UNION the previous round's reported tail (r14, VERDICT
    # r13 task 4: additions-only — a query that fell OUT of the top-25
    # because it got FASTER was being misreported as dropped; carrying
    # the prior round's names keeps every mover comparable). The full
    # per-query dict lives in the line above and in the committed PERF
    # artifact.
    top = dict(
        sorted(cold.items(), key=lambda kv: -kv[1])[:25]
    )
    try:
        import glob

        bench_files = glob.glob(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_r*.json",
            )
        )
        rounds = [
            (int(m.group(1)), p)
            for p in bench_files
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)))
        ]
        if rounds:
            with open(max(rounds)[1]) as f:
                prev_tail = (json.load(f).get("parsed") or {}).get(
                    "queries"
                ) or {}
            for prev_name in sorted(prev_tail):
                if prev_name in cold and prev_name not in top:
                    top[prev_name] = cold[prev_name]
    except Exception:
        pass  # tail enrichment is best-effort; the top-25 still emits
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(cold.values()), 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(cold),
                "value_warm": round(sum(warm.values()), 3),
                "drift": drift,
                "value_drift_normalized": round(
                    sum(cold.values()) / max(drift, 0.01), 3
                ),
                "ab_vs_prev": ab.get("ab_vs_prev"),
                "queries": {k: round(v, 1) for k, v in top.items()},
                "note": "compact tail record: queries=top-25 cold; "
                "full per-query cold+warm JSON precedes this line "
                "and is committed as PERF_r{N}_full.json",
            }
        )
    )


if __name__ == "__main__":
    main()
