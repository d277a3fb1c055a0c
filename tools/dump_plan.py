"""Dump .explain("formatted") for declared queries to plans/<tag>/.

    python tools/dump_plan.py <tag> <query> [query ...]

Writes plans/<dir>/<query>_<tag>.txt for each query, where <tag> is
e.g. "before" / "after" and <dir> comes from $SPARK_GRAFT_PLANS_DIR
(default plans/r13). $SPARK_GRAFT_SF_DIR picks the data (default
sf0.01 — plan SHAPE, not timing, is what these files pin; shapes do
not change between sf0.01 and sf0.1 for these queries).

Lifecycle/streaming queries return the final (batch) frame of their
pipeline; the dump captures that frame's plan, which is the part a
plan diff can meaningfully pin.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "plans/r13")
    os.makedirs(out_dir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e
    from dataset_grouper_spark.cache import release_intermediates
    from dataset_grouper_spark.session import get_spark

    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
        release_intermediates()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
