"""Per-query profiling harness for the optimization rounds.

For each named catalog query: one untimed warm pass (JVM/codegen/file
listing), then N timed noop-sink passes (bench.py methodology), plus the
number of Spark jobs and tasks the timed pass launched (from the status
tracker's job-id high-water mark) — the job count is the fixed-overhead
proxy at demo SF: a query that runs 40 sequential tiny jobs is bounded
by scheduling latency, not data.

Usage: python tools/query_profile.py <query> [query...] [--passes N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry
from reddit_tech_jobs_data_pipeline_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    passes = 2
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--passes"):
            # accept --passes=N and --passes N (r14 ADVICE)
            if "=" in a:
                passes = int(a.split("=", 1)[1])
            else:
                i += 1
                passes = int(argv[i])
        else:
            args.append(a)
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("query_profile")
    reg = get_registry()
    tracker = spark.sparkContext.statusTracker()

    def run(name: str) -> None:
        spark.sparkContext.setJobDescription(name)
        reg[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)

    for name in args:
        if name not in reg:
            print(f"{name}: NOT REGISTERED")
            continue
        run(name)  # warm
        spark.catalog.clearCache()
        best, best_jobs = float("inf"), 0
        for _ in range(passes):
            spark.catalog.clearCache()
            all_before = len(tracker.getJobIdsForGroup())
            t0 = time.perf_counter()
            run(name)
            dt = time.perf_counter() - t0
            all_after = len(tracker.getJobIdsForGroup())
            if dt < best:
                best, best_jobs = dt, all_after - all_before
        print(f"{name}: {best:7.3f}s  jobs/pass={best_jobs}")


if __name__ == "__main__":
    main()
