"""Docs/README consistency guards.

Round-11 verdict item 7: README.md carried a stale catalog count
("304/304 as of round 11" in one section, 305/305 in another). The
counts are now asserted against the live registry so a new query
landing without a README status update fails the suite instead of
shipping a self-inconsistent doc.
"""

from __future__ import annotations

import re
from pathlib import Path

import reddit_tech_jobs_data_pipeline_spark.plans  # noqa: F401  (registers catalogs)
from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry

README = Path(__file__).resolve().parents[1] / "README.md"


def test_readme_oracle_counts_match_registry():
    n = len(get_registry())
    text = README.read_text()
    # "oracle 305/305" style claims — every one must be the live count.
    claims = re.findall(r"oracle (\d+)/(\d+)", text)
    assert claims, "README should state the full-catalog oracle count"
    for a, b in claims:
        assert int(a) == int(b) == n, (
            f"README claims oracle {a}/{b} but the registry has {n} "
            "queries — update the latest Round status section"
        )
    # "-> 305 oracle-gated queries" style claims (arrow growth notation:
    # only the RIGHT side of the arrow must be current).
    for m in re.findall(r"→ (\d+) oracle-gated queries", text):
        assert int(m) == n, (
            f"README claims {m} oracle-gated queries; registry has {n}"
        )
