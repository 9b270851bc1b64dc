"""Token-budget sequence packing — assign ordered documents to
fixed-token-budget shards by running token offset.

This is the corpus→training-shards step (no reference analog; it is a
north-star op for the 100 TB pipeline): given rows ``(order_col,
token_col)``, compute each row's global token offset (sum of tokens of
all rows strictly before it in ``order_col`` order) and the shard it
lands in, ``floor(offset / budget)``.

Two modes, mirroring ``operators/graph.pagerank`` and
``operators/kmeans``:

* ``scale=False`` — a global-order window (``Window.orderBy`` with no
  ``partitionBy``). Bit-simple, deterministic, and the DuckDB oracle's
  exact twin, but Spark moves every row through ONE task for the prefix
  sum. Correct at any SF; a bottleneck at 100 TB.

* ``scale=True`` — the two-phase distributed prefix sum:

  1. ``repartitionByRange(order_col)`` so partition *p* holds a
     contiguous key range and all keys in *p* precede all keys in
     *p + 1* (Spark's RangePartitioner); sort within partitions.
  2. Pin partition assignment with an eager ``localCheckpoint`` (range
     boundaries come from sampling; the plan must not recompute them
     between the subtotal pass and the offset pass).
  3. Per-partition token subtotals: ``groupBy(spark_partition_id())``
     — exactly ``num_partitions`` rows.
  4. Prefix-sum those subtotals on the DRIVER (a bounded collect of
     ``num_partitions`` longs — dozens to thousands of rows at any
     corpus size, never data-sized) into per-partition base offsets.
  5. Broadcast-join the base offsets back and add the per-partition
     local running sum (``Window.partitionBy(pid).orderBy(order_col)``
     — parallel across partitions, no global sort).

  All arithmetic on the offsets is exact ``long`` addition, so the two
  modes produce IDENTICAL shard assignments — proven by
  ``tests/test_packing.py``'s property test — and share one oracle.

At 100 TB: one range shuffle + one hash shuffle (by pid, which the
range partitioning already satisfies AQE-locally), a num-partitions-row
collect, and a broadcast of the same — nothing data-sized crosses the
driver, no single-partition Exchange appears in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    sums: dict[str, str],
    num_partitions: int | None = None,
) -> DataFrame:
    """The shared two-phase primitive: ``df`` + an INCLUSIVE running sum
    over the total order ``order_by`` for each entry of ``sums``
    (input column → output column), with no single-partition Exchange.

    All requested columns ride ONE range shuffle and one bounded
    collect. Sums are computed in ``long`` arithmetic — callers pass
    integral columns (token counts, row counts), which is what keeps
    the result bit-identical to a global window and lets one oracle
    gate both modes. ``order_by`` must be a total order.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    srcs = list(sums)
    ranged = (
        df.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        # Eager pin: range boundaries are sampled, so the subtotal pass
        # and the prefix pass MUST see the same partition assignment.
        .localCheckpoint()
    )
    # Phase 1: per-partition subtotals — num_partitions rows, collected
    # on the driver (bounded: one row per shuffle partition, never
    # data-sized) and prefix-summed in exact Python int arithmetic.
    subtotals = ranged.groupBy("_pid").agg(
        *[F.sum(c).cast("long").alias(f"_s{i}") for i, c in enumerate(srcs)]
    ).collect()
    acc = [0] * len(srcs)
    bases = []
    for row in sorted(subtotals, key=lambda r: r["_pid"]):
        bases.append((row["_pid"], *acc))
        acc = [a + (row[f"_s{i}"] or 0) for i, a in enumerate(acc)]
    schema = "_pid int, " + ", ".join(f"_b{i} long" for i in range(len(srcs)))
    base_df = df.sparkSession.createDataFrame(bases, schema)
    # Phase 2: per-partition local prefix (parallel across partitions)
    # + broadcast base offsets.
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = ranged.join(F.broadcast(base_df), "_pid")
    for i, src in enumerate(srcs):
        out = out.withColumn(
            sums[src], (F.col(f"_b{i}") + F.sum(src).over(w_local)).cast("long")
        )
    return out.drop("_pid", *[f"_b{i}" for i in range(len(srcs))])


def pack_token_budget(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int = 4096,
    *,
    scale: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` + ``shard_id``: the fixed-token-budget shard each
    row starts in when rows are packed in ``order_col`` order.

    ``shard_id = floor(offset / budget)`` where ``offset`` is the sum of
    ``token_col`` over all rows strictly preceding this one in
    ``order_col`` order. ``order_col`` must be a total order (unique
    keys) for the assignment to be well-defined.
    """
    if not scale:
        w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
        offset = F.sum(token_col).over(w) - F.col(token_col)
        return df.withColumn("shard_id", _shard(offset, budget))

    ps = distributed_prefix_sum(
        df, [F.col(order_col)], {token_col: "_cum"}, num_partitions
    )
    # inclusive prefix − own tokens = exclusive offset, exactly the
    # windowed mode's expression
    return ps.withColumn(
        "shard_id", _shard(F.col("_cum") - F.col(token_col), budget)
    ).drop("_cum")


def _shard(offset: Column, budget: int) -> Column:
    # offset is an exact long in both modes; the float division by the
    # same literal therefore floors identically in both modes (and in
    # the DuckDB oracle, which uses the same `/ budget.0` expression).
    return F.floor(offset / F.lit(float(budget))).cast("long")


def shard_summary(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-shard doc counts + token totals (the oracle-compared shape)."""
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("shard_tokens"),
    )


def length_bucket_batches(
    df: DataFrame,
    token_col: str,
    id_col: str,
    batch_size: int = 16,
) -> DataFrame:
    """Length-bucketed dynamic batching: group rows into power-of-two
    length buckets (smallest 2^k >= length), order each bucket by
    (length, id), and cut fixed-count batches. Per batch, every sequence
    pads to the batch MAX length, so the padding waste is
    ``max_len·n_rows − Σ len`` — all integers, engine-exact. Returns one
    row per (bucket, batch): (bucket, batch, n_docs, max_len,
    real_tokens, pad_tokens).

    This is the training-loader trick that cuts padding FLOPs vs
    arrival-order batching (compare via bucket = −1 in the catalog
    query): batching within a 2× length band bounds per-batch waste at
    <2× even adversarially, and near-sorted order makes it tiny.

    100 TB: the window partitions by bucket — ~log2(max_len) groups,
    each shuffled independently; if one bucket dominates, sub-salt it by
    a hash band the way epoch_shuffle shards do (the batch id then
    composes (band, batch)). No global order anywhere.

    Rows with ``token_col`` <= 0 are dropped here (log2 of a nonpositive
    length is undefined — they'd otherwise pool under a NULL bucket);
    empty sequences carry no training signal to batch.
    """
    df = df.filter(F.col(token_col) > 0)
    n = F.col(token_col).cast("double")
    bucket = F.pow(F.lit(2.0), F.ceil(F.log2(n))).cast("long")
    b = df.select(
        id_col, F.col(token_col).alias("__len"), bucket.alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy("__len", id_col)
    batched = b.withColumn(
        "batch", ((F.row_number().over(w) - 1) / batch_size).cast("long")
    )
    return batched.groupBy("bucket", "batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("__len").alias("max_len"),
        F.sum("__len").alias("real_tokens"),
        (F.max("__len") * F.count(F.lit(1)) - F.sum("__len")).alias("pad_tokens"),
    )
