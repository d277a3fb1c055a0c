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
    print("OK: artifact covers all"
          f" {len(want)} queries" if ok else "DRIFT — rerun bench.py")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
