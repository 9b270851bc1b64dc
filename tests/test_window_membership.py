"""CORRECTNESS_WINDOW.md must track the live registry.

The driver's external correctness gate samples the first 50 entries of
``queries()`` in order; CORRECTNESS_WINDOW.md records that membership so
window changes between rounds are explicit. The r10 judge found the file
stale (said 264 queries; registry had 288) — these tests make the record
self-enforcing: any catalog registration change that isn't followed by
``python tools/window_membership.py --write`` fails the suite.
"""

from __future__ import annotations

import pathlib
import re

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry

WINDOW_FILE = pathlib.Path(__file__).resolve().parent.parent / "CORRECTNESS_WINDOW.md"


def test_recorded_catalog_size_matches_registry():
    text = WINDOW_FILE.read_text()
    m = re.search(r"Catalog size: (\d+) registered queries", text)
    assert m, "CORRECTNESS_WINDOW.md lost its 'Catalog size: N' line"
    assert int(m.group(1)) == len(get_registry()), (
        "CORRECTNESS_WINDOW.md records a different catalog size than the "
        "live registry — regenerate with `python tools/window_membership.py "
        "--write`"
    )


def test_recorded_window_matches_first_50_registration_order():
    text = WINDOW_FILE.read_text()
    recorded = re.findall(r"^\s*\d+\. (\S+)$", text, flags=re.MULTILINE)
    live = list(get_registry())[:50]
    assert recorded == live, (
        "CORRECTNESS_WINDOW.md's ordered window differs from the live "
        "first-50 registration order — regenerate with `python "
        "tools/window_membership.py --write`"
    )


def test_promoted_recent_queries_inside_window():
    """The rotation lever actually lands recent-family representatives in
    the driver-sampled window (r10 advisor item 3)."""
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _WINDOW_PROMOTED

    window = set(list(get_registry())[:50])
    for name in _WINDOW_PROMOTED:
        assert name in window, f"promoted query {name} fell outside the window"
