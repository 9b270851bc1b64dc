"""Dump `.explain("formatted")` for named catalog queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [query...]
Writes <outdir>/<query>_<suffix>.txt — the round's before/after plan
evidence (plans/r14/...). Only the FINAL returned DataFrame's plan is
captured (streaming/iterative side jobs are invisible here — the known
explain_audit blind spot; job-count deltas for those are recorded in
OPTIMIZATION_r14.md instead).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry
from reddit_tech_jobs_data_pipeline_spark.session import get_spark


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    reg = get_registry()
    for name in names:
        df = reg[name].spark(spark, sf_dir)
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
