"""The sentinel triage in tools/bench_compare.py: tail readings whose
neighboring contention-sentinel samples drifted >= 2x the series median
are mechanically marked contended (the README triage rule, r12 verdict
item: stop applying it by hand)."""

from __future__ import annotations

import importlib.util
import pathlib

spec = importlib.util.spec_from_file_location(
    "bench_compare",
    pathlib.Path(__file__).resolve().parent.parent / "tools" / "bench_compare.py",
)
bc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bc)


def _detail(series, tail_names):
    return {
        "tail_queries": {n: 0.5 for n in tail_names},
        "sentinel": {
            "every_n_tail": 4,
            "series": series,
            "median_sec": 0.3,
        },
    }


def test_quiet_series_marks_nothing():
    names = [f"q{i:02d}" for i in range(10)]
    series = [{"before_tail_index": i, "sec": 0.3} for i in (0, 4, 8)]
    assert bc.contended_queries(_detail(series, names)) == set()


def test_drifted_sentinel_taints_both_adjacent_segments():
    names = [f"q{i:02d}" for i in range(12)]  # sorted order == index order
    series = [
        {"before_tail_index": 0, "sec": 0.31},
        {"before_tail_index": 4, "sec": 1.9},  # >= 2 x 0.3: drifted
        {"before_tail_index": 8, "sec": 0.29},
    ]
    got = bc.contended_queries(_detail(series, names))
    # segments [0,4) and [4,8) are tainted; [8,12) is clean
    assert got == {f"q{i:02d}" for i in range(0, 8)}


def test_missing_series_is_graceful():
    assert bc.contended_queries({"queries": {"a": 1.0}}) == set()
    assert bc.contended_queries({"tail_queries": {"a": 1.0}, "sentinel": {}}) == set()
