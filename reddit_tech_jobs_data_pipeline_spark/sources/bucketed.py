"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the fact⋈fact join (lineitem ⋈ orders on orderkey) is the
dominant shuffle: both sides move over the network every query. Writing
both tables bucketed by the join key with the same bucket count makes
the join a zero-exchange zip of corresponding buckets — the scan is
already hash-partitioned the way the join needs.

Bucketing requires the session catalog (``bucketBy`` + ``saveAsTable``);
pure path-based parquet cannot carry bucket metadata. The verification
(tests/test_bucketed.py) asserts the physical plan contains no Exchange
on either side of the bucketed join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally enables sort-merge joins without
    the sort step — scan-merge-join directly."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — planner elides
    both Exchanges when bucket specs line up."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_left] == rt[key_right])
