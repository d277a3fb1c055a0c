"""Order-controlled same-code A/B vs the prior round-close commit
(VERDICT r11 task 3).

The burst calibrators in bench.py under-measure sustained drift on
this shared VM (PERF.md "Calibrator lesson"), so the definitive
code-vs-machine instrument is this A/B: run a fixed 10-query subset
under the CURRENT tree and under a git worktree at the prior
round-close commit, in BOTH orders (head-first then prev-first) so
page-cache / JIT / thermal bias cancels, and report the geometric
mean of head/prev per-query ratios. ~1.0 = same speed; the committed
artifact totals may still differ by machine drift, which this number
factors out.

Each of the four measurement passes is its OWN subprocess with its
own Spark session — the two trees must never share a JVM or a Python
module cache. The runner mode (``--run``) is invoked from the HEAD
copy of this file for both sides; the repo dir argument decides which
code gets imported.

Usage::

    python tools/ab_check.py            # human + JSON line
    python tools/ab_check.py --json     # JSON line only
    python tools/ab_check.py --run REPO SF_DIR q1,q2,...   # internal

The prior round-close commit is pinned in ``tools/ab_prev_commit.txt``
(updated as part of each round-close ritual). bench.py shells out to
this tool and embeds the result as ``ab_vs_prev`` in the artifact.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PIN = os.path.join(REPO, "tools", "ab_prev_commit.txt")

# fixed, tier-spanning subset: scan+agg, Catalyst text, join-heavy
# graph, window packing, iterative graph, analytic window, agg
# pipeline, and the cell-blocked cosine family. Stable names only —
# a name missing on either side is skipped (and reported).
AB_QUERIES = [
    "tpch_q1_pricing_summary",
    "gopher_quality_documents",
    "triangle_suppliers",
    "pack_bytecap_documents",
    "pagerank_partsupp",
    "moving_avg_events",
    "vocab_index_documents",
    "text_cosine_cells_documents",
    "semdedup_cells_embeddings",
    "neardup_clusters_documents",
]


def _run_side(repo: str, sf_dir: str, names: list[str]) -> None:
    """Runner mode: time each named query once (cold) in the given
    repo's code, print one JSON line {name: seconds}."""
    sys.path.insert(0, repo)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = entry
    spec.loader.exec_module(entry)
    from dataset_grouper_spark.cache import release_intermediates
    from dataset_grouper_spark.session import get_spark

    import time

    spark = get_spark("ab-check")
    spark.sparkContext.setLogLevel("ERROR")
    # same session warm-up as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    qs = entry.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
        release_intermediates()
    print("ABRESULT " + json.dumps(out))
    spark.stop()


def _subprocess_side(repo: str, sf_dir: str) -> dict[str, float]:
    cmd = [
        sys.executable,
        os.path.abspath(__file__),  # HEAD copy of the runner, always
        "--run",
        repo,
        sf_dir,
        ",".join(AB_QUERIES),
    ]
    proc = subprocess.run(
        cmd, cwd=repo, capture_output=True, text=True, timeout=3600
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"ab runner produced no result for {repo}: "
        f"rc={proc.returncode} stderr_tail={proc.stderr[-500:]!r}"
    )


def run_ab(sf_dir: str) -> dict:
    """Orchestrate the four passes; returns the artifact fragment."""
    if not os.path.exists(PIN):
        raise FileNotFoundError(f"no prev-commit pin at {PIN}")
    prev = open(PIN).read().strip()
    wt = tempfile.mkdtemp(prefix="ab_prev_")
    os.rmdir(wt)  # git worktree add wants to create it
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, prev],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        head_first = {
            "head": _subprocess_side(REPO, sf_dir),
            "prev": _subprocess_side(wt, sf_dir),
        }
        prev_first = {
            "prev": _subprocess_side(wt, sf_dir),
            "head": _subprocess_side(REPO, sf_dir),
        }
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            capture_output=True,
        )
    shared = (
        set(head_first["head"])
        & set(head_first["prev"])
        & set(prev_first["head"])
        & set(prev_first["prev"])
    )
    ratios = {}
    for q in sorted(shared):
        r1 = head_first["head"][q] / max(head_first["prev"][q], 1e-9)
        r2 = prev_first["head"][q] / max(prev_first["prev"][q], 1e-9)
        ratios[q] = round(math.sqrt(r1 * r2), 3)
    geo = (
        round(
            math.exp(
                sum(math.log(r) for r in ratios.values()) / len(ratios)
            ),
            3,
        )
        if ratios
        else None
    )
    return {
        "ab_vs_prev": geo,
        "ab_prev_commit": prev,
        "ab_ratios": ratios,
        "ab_skipped": sorted(set(AB_QUERIES) - shared),
        "ab_head_first": head_first,
        "ab_prev_first": prev_first,
    }


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--run":
        _run_side(sys.argv[2], sys.argv[3], sys.argv[4].split(","))
        return
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    result = run_ab(sf_dir)
    if "--json" not in sys.argv:
        print(
            f"geomean head/prev = {result['ab_vs_prev']} "
            f"(prev {result['ab_prev_commit'][:9]}, "
            f"{len(result['ab_ratios'])} queries)",
            file=sys.stderr,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
