"""Distributed global ranking — exact ``row_number``/``ntile`` over a
total order without a single-partition sort.

``Window.orderBy(...)`` with no ``partitionBy`` is correct but moves
every row through one task. The scale path here is the same two-phase
prefix-sum shape as ``operators/packing.py``:

1. ``repartitionByRange`` on the order expressions — partition *p*
   holds a contiguous slice of the total order, everything in *p*
   precedes everything in *p + 1* (Spark's RangePartitioner).
2. Eager ``localCheckpoint`` to pin the sampled range boundaries
   between the two passes.
3. Per-partition row COUNTS (num_partitions rows), prefix-summed on
   the driver into per-partition base ranks — a bounded collect.
4. Per-partition ``row_number`` window (parallel across partitions) +
   broadcast base rank = the exact global rank.

Rank arithmetic is integer, so the result is IDENTICAL to the global
window — same oracle gates both modes. The order must be total (include
a unique tiebreaker column), exactly as a deterministic global window
requires anyway.

The sampled-CDF / ``percentile_approx`` bucketing alternative trades
that exactness for one fewer shuffle; since the range shuffle here
replaces the global-sort shuffle one-for-one, exact rank is the better
deal — nothing approximate, no tolerance gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "i",
    *,
    scale: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` + ``rank_col`` = 1-based global row number under
    ``order_by`` (sort-order Columns, e.g. ``F.col("x").desc()``; must
    form a total order for a well-defined result)."""
    if not scale:
        w = Window.orderBy(*order_by)
        return df.withColumn(rank_col, F.row_number().over(w).cast("long"))

    # row_number over a total order ≡ inclusive prefix sum of ones —
    # delegate to the shared two-phase primitive
    from reddit_tech_jobs_data_pipeline_spark.operators.packing import (
        distributed_prefix_sum,
    )

    return distributed_prefix_sum(
        df.withColumn("_one", F.lit(1)), order_by, {"_one": rank_col}, num_partitions
    ).drop("_one")


def ntile_from_rank(rank: Column, n_rows: Column, buckets: int) -> Column:
    """SQL ``ntile(buckets)`` reproduced exactly from a global rank:
    with ``n`` rows, the first ``n % buckets`` tiles hold
    ``n div buckets + 1`` rows and the rest hold ``n div buckets`` —
    so ntile is pure arithmetic once the rank exists, and the
    distributed rank path can feed it with no global window at all."""
    base = F.floor(n_rows / buckets)
    rem = n_rows % buckets
    big = rem * (base + 1)  # rows living in the size-(base+1) tiles
    return (
        F.when(rank <= big, F.ceil(rank / (base + 1)))
        .otherwise(rem + F.ceil((rank - big) / base))
        .cast("long")
    )
