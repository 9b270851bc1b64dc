"""Interleaved A/B of catalog queries under an env-var toggle.

Usage: python tools/ab_env.py VAR=a,b [--passes N] <query> [query...]

For each query, runs ``passes`` interleaved pairs: one noop-sink pass
with VAR=<a>, one with VAR=<b> (empty value = unset), alternating so
shared-host drift cancels. Prints min/median per variant plus the job
count of the last pass of each variant. The toggle must be read at
call time by the code under test (e.g. SPARK_GRAFT_LOOP_AQE,
SPARK_GRAFT_ITER_PARTITIONS).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry
from reddit_tech_jobs_data_pipeline_spark.session import get_spark


def main() -> None:
    spec = sys.argv[1]
    var, vals = spec.split("=", 1)
    variants = vals.split(",")
    passes = 4
    names: list[str] = []
    argv = sys.argv[2:]
    i = 0
    while i < len(argv):
        if argv[i].startswith("--passes"):
            if "=" in argv[i]:
                passes = int(argv[i].split("=", 1)[1])
            else:
                i += 1
                passes = int(argv[i])
        else:
            names.append(argv[i])
        i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_env")
    reg = get_registry()
    tracker = spark.sparkContext.statusTracker()

    def set_var(v: str) -> None:
        if v == "":
            os.environ.pop(var, None)
        else:
            os.environ[var] = v

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        reg[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        # warm once per variant (codegen caches differ per plan shape)
        for v in variants:
            set_var(v)
            run(name)
        results: dict[str, list[float]] = {v: [] for v in variants}
        jobs: dict[str, int] = {}
        for _ in range(passes):
            for v in variants:
                set_var(v)
                before = len(tracker.getJobIdsForGroup())
                dt = run(name)
                jobs[v] = len(tracker.getJobIdsForGroup()) - before
                results[v].append(dt)
        for v in variants:
            r = results[v]
            label = f"{var}={v or '<unset>'}"
            print(
                f"{name} [{label}]: min={min(r):.3f} med={statistics.median(r):.3f}"
                f" all={[round(x, 2) for x in r]} jobs={jobs[v]}"
            )
        set_var("")


if __name__ == "__main__":
    main()
