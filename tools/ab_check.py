"""Order-controlled same-code A/B vs the prior round-close commit
(VERDICT r11 task 3).

The burst calibrators in bench.py under-measure sustained drift on
this shared VM (PERF.md "Calibrator lesson"), so the definitive
code-vs-machine instrument is this A/B: a fixed 10-query subset timed
under the CURRENT tree and under a git worktree at the prior
round-close commit, and the geometric mean of head/prev per-query
ratios reported. ~1.0 = same speed; committed artifact totals may
still differ by machine drift, which this number factors out.

Protocol (v2, r12): QUERY-LEVEL interleaving. The r12 close window
showed pass-granularity A/B cannot cancel this VM's minutes-scale
load oscillation — byte-identical code measured ratio 0.2x-3.4x per
query across ~5-minute passes, while an interleaved probe of the
worst "regression" showed parity. So both trees now keep a
LONG-LIVED runner session alive (own subprocess each, the HEAD copy
of this file serving both), and each query is timed back-to-back in
the two trees twice, alternating which side goes first (head,prev
then prev,head) so adjacency cancels load within each pair and the
order swap cancels first-mover bias. Per-query ratio = geomean of the
two paired ratios; final = geomean over queries.

Usage::

    python tools/ab_check.py            # human + JSON line
    python tools/ab_check.py --json     # JSON line only
    python tools/ab_check.py --serve REPO SF_DIR   # internal runner

The prior round-close commit is pinned in ``tools/ab_prev_commit.txt``
(updated as part of each round-start ritual). bench.py shells out to
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


def _serve(repo: str, sf_dir: str) -> None:
    """Runner mode: boot one session over ``repo``'s code, then answer
    ``<query-name>`` lines on stdin with ``ABTIME <name> <sec>`` (or
    ``ABSKIP <name>`` when the registry lacks it) until EOF/EXIT."""
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
    print("ABREADY", flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name or name == "EXIT":
            break
        fn = qs.get(name)
        if fn is None:
            print(f"ABSKIP {name}", flush=True)
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_intermediates()
        print(f"ABTIME {name} {dt:.3f}", flush=True)
    spark.stop()


class _Runner:
    def __init__(self, repo: str, sf_dir: str):
        self.proc = subprocess.Popen(
            [
                sys.executable,
                os.path.abspath(__file__),  # HEAD copy, always
                "--serve",
                repo,
                sf_dir,
            ],
            cwd=repo,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        self._expect("ABREADY")

    def _expect(self, prefix: str) -> str:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError("ab runner died")
            if line.startswith(prefix) or line.startswith("ABSKIP"):
                return line.strip()

    def time(self, name: str) -> float | None:
        self.proc.stdin.write(name + "\n")
        self.proc.stdin.flush()
        resp = self._expect("ABTIME")
        if resp.startswith("ABSKIP"):
            return None
        return float(resp.split()[2])

    def close(self) -> None:
        try:
            self.proc.stdin.write("EXIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def run_ab(sf_dir: str) -> dict:
    """Orchestrate the interleaved A/B; returns the artifact fragment."""
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
    ratios: dict[str, float] = {}
    raw: dict[str, dict] = {}
    skipped: list[str] = []
    try:
        head = _Runner(REPO, sf_dir)
        prev_r = _Runner(wt, sf_dir)
        try:
            for q in AB_QUERIES:
                pair_ratios = []
                samples = {"head": [], "prev": []}
                ok = True
                # rep 0: head first; rep 1: prev first — adjacency
                # cancels load within the pair, the swap cancels
                # first-mover bias
                for order in (("head", "prev"), ("prev", "head")):
                    t = {}
                    for side in order:
                        r = head if side == "head" else prev_r
                        dt = r.time(q)
                        if dt is None:
                            ok = False
                            break
                        t[side] = dt
                    if not ok:
                        break
                    samples["head"].append(t["head"])
                    samples["prev"].append(t["prev"])
                    pair_ratios.append(t["head"] / max(t["prev"], 1e-9))
                if not ok:
                    skipped.append(q)
                    continue
                ratios[q] = round(
                    math.exp(
                        sum(math.log(r) for r in pair_ratios)
                        / len(pair_ratios)
                    ),
                    3,
                )
                raw[q] = {
                    "head": [round(x, 3) for x in samples["head"]],
                    "prev": [round(x, 3) for x in samples["prev"]],
                }
        finally:
            head.close()
            prev_r.close()
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            capture_output=True,
        )
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
        "ab_skipped": skipped,
        "ab_samples": raw,
    }


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--serve":
        _serve(sys.argv[2], sys.argv[3])
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
