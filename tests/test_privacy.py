"""k-anonymity / l-diversity audit (operators/privacy.py) against
hand-built fixtures."""

from __future__ import annotations

from reddit_tech_jobs_data_pipeline_spark.operators import privacy


def _df(spark, rows):
    return spark.createDataFrame(rows, "seg string, nat long, sens long")


FIX = (
    [("a", 1, s) for s in (10, 20, 30, 10, 40)]  # n=5, 4 distinct → pass k=5,l=2
    + [("a", 2, 10), ("a", 2, 10)]  # n=2 → fails k=5; 1 distinct → fails l=2
    + [("b", 1, s) for s in (7, 7, 7, 7, 7, 7)]  # n=6 → k ok; 1 distinct → l fails
)


def test_report_flags(spark):
    rep = {
        (r.seg, r.nat): r
        for r in privacy.anonymity_report(
            _df(spark, FIX), ["seg", "nat"], "sens", k=5, l=2
        ).collect()
    }
    a1, a2, b1 = rep[("a", 1)], rep[("a", 2)], rep[("b", 1)]
    assert (a1.n_rows, a1.n_sensitive, a1.k_anonymous, a1.l_diverse) == (5, 4, True, True)
    assert (a2.n_rows, a2.n_sensitive, a2.k_anonymous, a2.l_diverse) == (2, 1, False, False)
    assert (b1.n_rows, b1.n_sensitive, b1.k_anonymous, b1.l_diverse) == (6, 1, True, False)


def test_suppression_keeps_only_passing_groups(spark):
    kept = privacy.suppress_small_groups(
        _df(spark, FIX), ["seg", "nat"], "sens", k=5, l=2
    ).collect()
    assert len(kept) == 5
    assert {(r.seg, r.nat) for r in kept} == {("a", 1)}
    # loosening l admits the k-anonymous single-diagnosis group too
    kept_l1 = privacy.suppress_small_groups(
        _df(spark, FIX), ["seg", "nat"], "sens", k=5, l=1
    ).collect()
    assert {(r.seg, r.nat) for r in kept_l1} == {("a", 1), ("b", 1)}
    assert len(kept_l1) == 11


def test_null_sensitive_not_counted_as_diversity(spark):
    rows = [("a", 1, None), ("a", 1, None), ("a", 1, 5), ("a", 1, 5), ("a", 1, 5)]
    rep = privacy.anonymity_report(
        _df(spark, rows), ["seg", "nat"], "sens", k=5, l=2
    ).collect()[0]
    # count_distinct skips NULLs: one real value → not l-diverse
    assert rep.n_rows == 5 and rep.n_sensitive == 1
    assert rep.k_anonymous and not rep.l_diverse
