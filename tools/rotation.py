"""Mechanical driver-oracle rotation (VERDICT r7 task 1).

The driver oracles only the FIRST 50 entries of ``queries()`` each
round.  Hand-maintained ordering comments failed to keep the rotation
honest twice (r6, r7 verdicts), so the order is now computed from the
committed record itself:

* read the ``CORRECTNESS_r*.json`` files pinned in the committed
  manifest ``tools/rotation_manifest.json`` (``--update`` refreshes the
  manifest to every such file present, so the round-start ritual picks
  up the driver's new record; files the driver drops *untracked after*
  the last commit cannot silently shift the committed order — VERDICT
  r8 "What's wrong" #1);
* a query's *last green round* is the newest round whose record shows
  ``rows_match & schema_match & hash_match`` with no ``err`` (for
  rows-only queries — ``err == "no_oracle"`` — a recorded non-null
  ``spark_rows`` counts, that being the strongest check they get);
* order: never-driver-green first, then stalest-green-first, ties
  broken by declaration order in ``_query_registry()``.

Changed-code queries may NOT jump ahead of never-oracled entries (the
never bucket is larger than the window, so nothing may displace it);
they re-verify from their staleness slot like everything else.

Usage::

    python tools/rotation.py            # print the full computed order
    python tools/rotation.py --update   # rewrite _QUERY_ORDER in
                                        # __spark_entry__.py in place
    python tools/rotation.py --check    # exit 1 if entry file is stale

``tests/test_rotation.py`` pins ``list(queries())[:50]`` to this
tool's output at commit time.
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BEGIN = "# --- BEGIN GENERATED _QUERY_ORDER (tools/rotation.py --update) ---"
_END = "# --- END GENERATED _QUERY_ORDER ---"


def _load_entry():
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__spark_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def _green(rec: dict, has_oracle: bool = False) -> bool:
    if rec.get("err") == "no_oracle":
        # rows-only query: the driver recorded that it ran and returned
        # a row count — the strongest signal such a query can get.
        # But if the query HAS an oracle NOW (it graduated from
        # rows-only), old no_oracle rows are weaker evidence than the
        # hash check it can get today: treat it as not-yet-green so it
        # rotates into the window for its first hash verification.
        return rec.get("spark_rows") is not None and not has_oracle
    return (
        bool(rec.get("rows_match"))
        and bool(rec.get("schema_match"))
        and bool(rec.get("hash_match"))
        and not rec.get("err")
    )


def _manifest_path(repo: str = REPO) -> str:
    return os.path.join(repo, "tools", "rotation_manifest.json")


def history_files(repo: str = REPO) -> list[str]:
    """CORRECTNESS files to consult, pinned by the committed manifest.

    Falls back to a repo-root glob when no manifest exists (first run /
    legacy checkouts).  Manifest entries that have since been deleted
    are skipped rather than erroring.
    """
    manifest = _manifest_path(repo)
    if os.path.exists(manifest):
        with open(manifest) as f:
            names = json.load(f)["correctness_files"]
        return [
            p
            for p in (os.path.join(repo, n) for n in sorted(names))
            if os.path.exists(p)
        ]
    return sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))


def refresh_manifest(repo: str = REPO) -> list[str]:
    """Repin the manifest to every CORRECTNESS file currently present."""
    names = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    )
    with open(_manifest_path(repo), "w") as f:
        json.dump({"correctness_files": names}, f, indent=1)
        f.write("\n")
    return names


def last_green_rounds(
    repo: str = REPO, oracled: set[str] | None = None
) -> dict[str, int]:
    """Map query name -> newest round with a green driver row.
    ``oracled`` names queries that currently carry an oracle twin —
    for those, rows-only (no_oracle) records do not count as green."""
    oracled = oracled or set()
    out: dict[str, int] = {}
    for path in history_files(repo):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if isinstance(rec, dict) and _green(rec, name in oracled):
                out[name] = max(out.get(name, 0), rnd)
    return out


def compute_order(registry_names: list[str] | None = None) -> list[str]:
    """Full rotation order over the current query registry."""
    entry = _load_entry()
    if registry_names is None:
        registry_names = list(entry._query_registry().keys())
    oracled = set(entry.oracle_sql().keys())
    greens = last_green_rounds(oracled=oracled)
    idx = {n: i for i, n in enumerate(registry_names)}

    def key(name: str):
        if name not in greens:
            return (0, 0, idx[name])  # never driver-green: first
        return (1, greens[name], idx[name])  # stalest-green next

    return sorted(registry_names, key=key)


def _render_block(order: list[str]) -> str:
    lines = [_BEGIN, "_QUERY_ORDER: list[str] = ["]
    for n in order:
        lines.append(f'    "{n}",')
    lines.append("]")
    lines.append(_END)
    return "\n".join(lines)


def update_entry_file() -> bool:
    """Rewrite the generated block; return True if the file changed."""
    path = os.path.join(REPO, "__spark_entry__.py")
    with open(path) as f:
        src = f.read()
    begin = src.index(_BEGIN)
    end = src.index(_END) + len(_END)
    new = src[:begin] + _render_block(compute_order()) + src[end:]
    if new != src:
        with open(path, "w") as f:
            f.write(new)
        return True
    return False


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.update:
        refresh_manifest()
        changed = update_entry_file()
        print("updated" if changed else "already current")
        return 0
    order = compute_order()
    if args.check:
        entry_order = list(_load_entry().queries().keys())
        if entry_order != order:
            first = next(
                i for i, (a, b) in enumerate(zip(entry_order, order)) if a != b
            )
            print(
                f"STALE at position {first}: entry has "
                f"{entry_order[first]!r}, rotation wants {order[first]!r}; "
                "run: python tools/rotation.py --update"
            )
            return 1
        print(f"current ({len(order)} queries; window = first 50)")
        return 0
    greens = last_green_rounds()
    for i, n in enumerate(order):
        tag = "never" if n not in greens else f"r{greens[n]}"
        marker = "*" if i < 50 else " "
        print(f"{marker} {i:3d} {tag:>5} {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
