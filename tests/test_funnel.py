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
