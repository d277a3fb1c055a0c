"""Assert a committed bench artifact covers the CURRENT query surface.

    python tools/check_bench_artifact.py PERF_r07_full.json

Exit 1 (listing the drift) if the artifact's cold/warm query sets do
not exactly equal ``__spark_entry__.queries()`` — the r6 failure mode
where 7 end-of-round queries landed after the bench snapshot and
shipped without committed numbers. Run this as the LAST act of a
round, right after regenerating the artifact.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    with open(sys.argv[1]) as f:
        art = json.load(f)
    want = set(entrymod.queries())
    ok = True
    for key in ("queries", "queries_warm"):
        have = set(art.get(key) or {})
        missing, extra = sorted(want - have), sorted(have - want)
        if missing or extra:
            ok = False
            print(f"{key}: missing={missing} extra={extra}")
    # VERDICT r11 task 3: the round-close artifact must carry the
    # calibrator trio (incl. sustained) AND the same-code A/B geomean
    # so the judge never re-derives code-vs-drift by hand
    for key in ("calibrator_start", "calibrator_end", "drift"):
        if key not in art:
            ok = False
            print(f"missing field: {key}")
    for side in ("calibrator_start", "calibrator_end"):
        if "sustained" not in (art.get(side) or {}):
            ok = False
            print(f"{side}: missing the sustained calibrator")
    if art.get("ab_vs_prev") is None:
        ok = False
        print(
            "ab_vs_prev absent/null: run bench.py with the "
            "tools/ab_prev_commit.txt pin in place "
            f"(ab_error={art.get('ab_error')!r})"
        )
    print("OK: artifact covers all"
          f" {len(want)} queries" if ok else "DRIFT — rerun bench.py")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
