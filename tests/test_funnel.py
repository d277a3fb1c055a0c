"""Funnel semantics: ordering constraint, nulls, monotone counts."""

from dataset_grouper_spark.operators.funnel import (
    funnel_counts,
    funnel_first_completion,
)


def _events(spark):
    rows = [
        # u1 completes the whole funnel in order
        ("u1", 1, "view"), ("u1", 5, "click"), ("u1", 9, "buy"),
        # u2 clicks BEFORE viewing: click must not count until after view
        ("u2", 1, "click"), ("u2", 3, "view"), ("u2", 8, "click"),
        # u3 views only
        ("u3", 2, "view"),
        # u4 never views: absent entirely
        ("u4", 1, "click"), ("u4", 2, "buy"),
    ]
    return spark.createDataFrame(rows, "user: string, ts: long, typ: string")


def test_first_completion_ordering(spark):
    per = {
        r.user: (r.t_0, r.t_1, r.t_2)
        for r in funnel_first_completion(
            _events(spark), "user", "ts", "typ", ["view", "click", "buy"]
        ).collect()
    }
    assert per["u1"] == (1, 5, 9)
    assert per["u2"] == (3, 8, None)   # pre-view click at ts=1 ignored
    assert per["u3"] == (2, None, None)
    assert "u4" not in per


def test_counts_monotone(spark):
    got = {
        r.step: r.n_entities
        for r in funnel_counts(
            _events(spark), "user", "ts", "typ", ["view", "click", "buy"]
        ).collect()
    }
    assert got == {"view": 3, "click": 2, "buy": 1}


def test_retention_cohorts(spark):
    from dataset_grouper_spark.operators.funnel import retention_cohorts

    rows = [
        ("u1", 5), ("u1", 15), ("u1", 25),   # cohort 0, active periods 0,1,2
        ("u2", 12), ("u2", 28),              # cohort 1, active 1,2
        ("u3", 3),                           # cohort 0, active 0 only
    ]
    df = spark.createDataFrame(rows, "user: string, ts: long")
    got = {
        (r.cohort_period, r.period_offset): r.n_active
        for r in retention_cohorts(df, "user", "ts", 10).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1, (1, 1): 1}
