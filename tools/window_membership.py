#!/usr/bin/env python3
"""Emit the driver's correctness-window membership: the ordered first-50
registration-order query names (the set the external CORRECTNESS_r{N}.json
gate verifies), plus the full catalog count.

Why this exists: registration order is a deliberate lever (plans/__init__.py
pulls the newest families into the sampled window), which means the window's
MEMBERSHIP can change between rounds — CORRECTNESS_r09.json covers a
different query set than r04-r08. Recording the ordered membership alongside
each round's artifact makes those set changes explicit and keeps
round-over-round comparisons honest; tools/check_oracle.py full-catalog runs
remain the compensating check for queries displaced out of the window.

Usage:
    python tools/window_membership.py            # print markdown to stdout
    python tools/window_membership.py --write    # rewrite CORRECTNESS_WINDOW.md
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import reddit_tech_jobs_data_pipeline_spark.plans  # noqa: F401  (window order owner)
from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry


def render() -> str:
    # plans/__init__ (imported above, FIRST) owns registration order;
    # get_registry() completes the set (it registers catalog_pipelineops,
    # which plans/__init__ doesn't import — those land after index 50).
    names = list(get_registry())
    window = names[:50]
    lines = [
        "# Correctness-window membership",
        "",
        "The driver's per-round `CORRECTNESS_r{N}.json` verifies the FIRST 50",
        "registration-order queries. This file records that ordered membership",
        "so window changes between rounds are explicit (regenerate with",
        "`python tools/window_membership.py --write` whenever registration",
        "order changes). Queries outside the window are value-checked by the",
        "full-catalog `tools/check_oracle.py` run instead.",
        "",
        f"Catalog size: {len(names)} registered queries.",
        "",
        "## Window (indices 0-49, registration order)",
        "",
    ]
    lines += [f"{i:2d}. {n}" for i, n in enumerate(window)]
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    text = render()
    if "--write" in sys.argv:
        import pathlib

        out = pathlib.Path(__file__).resolve().parent.parent / "CORRECTNESS_WINDOW.md"
        out.write_text(text)
        print(f"wrote {out}")
    else:
        print(text)
