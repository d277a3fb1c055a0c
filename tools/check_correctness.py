"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, sorted column
names, and an order-insensitive value hash. Use while iterating:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    rows = ["|".join(r) for r in df.itertuples(index=False)]
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), sorted(df.columns), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from dataset_grouper_spark.session import get_spark
    from dataset_grouper_spark.sources import TABLES

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        finally:
            # pair-op intermediates persist per invocation; a 39-query
            # session must not accumulate dead cached partitions
            from dataset_grouper_spark.cache import release_intermediates

            release_intermediates()
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(spark_pdf)})")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        sn, sc, sh = canon(spark_pdf)
        dn, dc, dh = canon(duck_pdf)
        if (sn, sc, sh) == (dn, dc, dh):
            print(f"OK   {name}: rows={sn}")
        else:
            failures += 1
            print(f"FAIL {name}: spark(rows={sn},cols={sc},hash={sh[:8]}) "
                  f"duck(rows={dn},cols={dc},hash={dh[:8]})")
            if sc != dc:
                print(f"     column mismatch: {set(sc) ^ set(dc)}")
            elif sn == dn:
                s = spark_pdf[sorted(spark_pdf.columns)].astype(str)
                d = duck_pdf[sorted(duck_pdf.columns)].astype(str)
                srows = sorted("|".join(r) for r in s.itertuples(index=False))
                drows = sorted("|".join(r) for r in d.itertuples(index=False))
                diffs = [
                    (a, b) for a, b in zip(srows, drows) if a != b
                ][:3]
                for a, b in diffs:
                    print(f"     spark: {a}\n     duck : {b}")
    print(f"\n{failures} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
