"""Measure actual shuffle bytes per catalog query.

PLANS.md counts Exchange operators; this tool weighs them: it runs each
named query (or a default headline subset) and reports total shuffle
WRITE bytes and records from Spark's status REST API, summed over the
stages the query ran. Shuffle bytes are the cluster-bound cost a plan
shape implies — two queries with one Exchange each can differ 1000× in
what that Exchange moves.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Numbers recorded in SCALE.md ("Shuffle weight" note).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry
from reddit_tech_jobs_data_pipeline_spark.session import get_spark

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "d1_dedup_first_seen",
    "posts_pipeline_e2e",
    "minhash_lsh_near_dup",
    "incremental_minhash_ingest",
    "token_budget_packing",
    "kmv_distinct_sketch",
    "corpus_profile_report",
    "pii_redaction",
]


def _stages(ui: str):
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("shuffle_audit")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("Spark UI disabled; shuffle audit needs the status API")
    import reddit_tech_jobs_data_pipeline_spark.plans  # noqa: F401

    reg = get_registry()
    print(f"{'query':34s} {'shuffle_write':>14s} {'records':>12s} {'stages':>7s}")
    for name in names:
        seen = {s["stageId"] for s in _stages(ui)}
        reg[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        new = [s for s in _stages(ui) if s["stageId"] not in seen]
        wr = sum(s.get("shuffleWriteBytes", 0) for s in new)
        recs = sum(s.get("shuffleWriteRecords", 0) for s in new)
        print(f"{name:34s} {wr:14,d} {recs:12,d} {len(new):7d}")


if __name__ == "__main__":
    main()
