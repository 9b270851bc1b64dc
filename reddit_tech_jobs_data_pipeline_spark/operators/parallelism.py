"""Input-parallelism repair for CPU-bound narrow stages.

Spark sizes a scan's task count from file splits
(spark.sql.files.maxPartitionBytes), which is right when the cost of a
stage is I/O — but a SMALL input feeding a CPU-heavy narrow transform
(per-doc fingerprinting, BPE encoding, n-gram explosion) inherits that
tiny task count and runs effectively single-threaded no matter how many
cores the cluster has: a 600 KB parquet file is one split, so one task
computes every md5 of a 64-bit SimHash sweep (measured 26 s → 8 s at
sf0.1 / local[32] just by widening). At 100 TB the same table arrives as
thousands of splits and no repair is needed — which is why this helper
is CONDITIONAL: it shuffles only when the scan's parallelism is below
the cluster's, so it is a no-op exactly where a blind ``repartition``
would add a full-table shuffle of text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin ``df`` to at least ``min_parts`` partitions (default:
    the cluster's defaultParallelism) IF its current plan would run on
    fewer — otherwise return it untouched. Call it between a scan and a
    CPU-heavy narrow transform; partition-count inspection is
    plan-time only (no job runs)."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
