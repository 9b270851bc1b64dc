"""Scaling measurement harness: time a set of catalog queries at one or
more SF dirs with bench.py's exact protocol (untimed warm pass for
JVM/codegen, then best-of-2 timed passes with caches cleared) and print
one JSON line per SF dir.

Built for SCALE.md's measured-scaling table — e.g. extending the
sf0.01→sf0.1 decade to sf1.0 data produced by tools/gen_sf.py:

    python tools/gen_sf.py /tmp/testdata_sf1.0 1.0
    python tools/scale_bench.py --queries pagerank_suppliers_scale,... \
        /root/testdata/sf0.1 /tmp/testdata_sf1.0

Default query set: the commutative scale modes plus the incremental
corpus-ingest family — the paths that CLAIM flat-per-row cost and must
prove it across decades.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry
from reddit_tech_jobs_data_pipeline_spark.session import get_spark

DEFAULT_QUERIES = [
    "pagerank_suppliers_scale",
    "personalized_pagerank_suppliers_scale",
    "hits_part_chain_scale",
    "bfs_supplier_reachability_scale",
    "kmeans_lloyd_clusters_scale",
    "ks_statistic_click_view_scale",
    "revenue_decile_share_scale",
    "revenue_gini_scale",
    "rfm_segmentation_scale",
    "token_budget_packing_scale",
    "incremental_minhash_ingest",
    "incremental_corpus_daily_e2e",
    "corpus_mixture_waterfill",
    "canonical_url_dedup",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]
    queries = DEFAULT_QUERIES
    if args and args[0] == "--queries":
        queries = args[1].split(",")
        args = args[2:]
    sf_dirs = args or ["/root/testdata/sf0.1"]
    spark = get_spark("scale_bench")
    reg = get_registry()
    names = [n for n in queries if n in reg]
    missing = [n for n in queries if n not in reg]
    if missing:
        print(f"unknown queries skipped: {missing}", file=sys.stderr)
    for sf_dir in sf_dirs:
        m = re.search(r"sf([0-9.]+)", sf_dir)
        sf = float(m.group(1)) if m else -1.0
        for name in names:  # warm: JVM, listing, codegen
            materialize(reg[name].spark(spark, sf_dir))
        spark.catalog.clearCache()
        timings: dict[str, float] = {}
        for name in names:
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(reg[name].spark(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "metric": "scale_queries_total_sec",
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "sf_dir": sf_dir,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
