"""Randomized cap-semantics check: the Spark window formulation must
agree with a direct Python model of the deterministic prefix rule
(drop rows whose individual size meets the limit, then keep row iff
inclusive running byte sum < limit, in ord order) for arbitrary
sizes/limits/groupings. 50 seeded random cases, batched into one
DataFrame per limit so the whole sweep costs a handful of jobs."""

import random

from pyspark.sql import functions as F

from dataset_grouper_spark.operators import packing


def python_model(rows, limit):
    kept = set()
    by_group = {}
    for g, o, s in rows:
        if s >= limit:  # monster pre-filter: never admissible
            continue
        by_group.setdefault(g, []).append((o, s))
    for g, items in by_group.items():
        acc = 0
        for o, s in sorted(items):
            acc += s
            if acc < limit:
                kept.add((g, o))
    return kept


def test_cap_prefix_matches_python_model(spark):
    rng = random.Random(1234)
    for limit in [1, 7, 23, 64, 10**6]:
        rows = []
        for case in range(10):
            n = rng.randint(1, 25)
            ords = rng.sample(range(100), n)
            for o in ords:
                g = f"{case}|{rng.randint(0, 3)}"
                rows.append((g, o, rng.randint(0, 20)))
        # unique (group, ord)
        uniq = {}
        for g, o, s in rows:
            uniq.setdefault((g, o), s)
        rows = [(g, o, s) for (g, o), s in uniq.items()]
        df = spark.createDataFrame(rows, "group_id: string, ord: long, sz: long")
        got = {
            (r.group_id, r.ord)
            for r in packing.cap_prefix(df, "ord", F.col("sz"), limit).collect()
        }
        assert got == python_model(rows, limit), f"limit={limit}"
