"""Deterministic epoch shuffling for training-data export.

LLM training wants each epoch to read the corpus in a fresh, uniform
pseudorandom order, reproducibly, sharded into fixed-count output files.
``rand(seed)`` cannot provide this on a cluster (it is partitioning- and
retry-dependent); a keyed hash can: the permutation key for epoch *e* is
``md5('<seed>:<epoch>:<id>')`` — a pure function of the row identity, so
any cluster size, any partitioning, any retry produces the SAME order
(the same universe-sampling property deterministic_sample relies on,
applied to ordering instead of selection).

100 TB shape: shard assignment is a stateless map (zero shuffles);
producing the physically shuffled epoch is ONE repartition on shard +
sortWithinPartitions on the hash key — Spark's writer then emits one
file per shard. A new epoch changes only the seed string: no state, no
extra passes. The in-shard position (rank) is computed here with a
per-shard window for the manifest/oracle surface; the writer path does
not need it (the sort alone realizes the order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def permutation_key(id_col: str, seed: str, epoch: int) -> Column:
    """The md5 hex permutation key for (seed, epoch, row id) — a pure
    function of row identity, identical on any engine/partitioning."""
    return F.md5(F.concat(F.lit(f"{seed}:{epoch}:"), F.col(id_col).cast("string")))


def shard_key(id_col: str, seed: str, epoch: int, num_shards: int) -> Column:
    """Shard assignment (long): first-byte band of the permutation hash
    mod num_shards. Stateless — costs no shuffle to compute."""
    return (
        F.conv(F.substring(permutation_key(id_col, seed, epoch), 1, 2), 16, 10)
        .cast("long")
        % num_shards
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "s0",
    epoch: int = 1,
    num_shards: int = 8,
) -> DataFrame:
    """Assign every row a (shard, pos_in_shard) for the given epoch.

    shard = first-byte band of the permutation hash mod num_shards;
    pos_in_shard = rank by (hash, id) within the shard. Both are exact
    integer/string operations on the md5 hex digest — engine-agnostic
    and bit-stable, so the training order is auditable cross-engine.

    Returns the input columns plus ``shard`` (long) and ``pos_in_shard``
    (long, 1-based). Deterministic: ties on the 64-bit-prefix hash are
    broken by id (and full 32-hex-char hashes collide only for equal
    ids, which are assumed unique).
    """
    keyed = df.withColumn("__h", permutation_key(id_col, seed, epoch)).withColumn(
        "shard", shard_key(id_col, seed, epoch, num_shards)
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        keyed.withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def write_epoch_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    seed: str = "s0",
    epoch: int = 1,
    num_shards: int = 8,
) -> None:
    """Physically materialize one epoch: repartition by shard, sort
    within partitions by the permutation key, write one directory per
    shard. This is the production path — a single shuffle, no windows;
    readers stream each shard file in stored order."""
    (
        df.withColumn("__h", permutation_key(id_col, seed, epoch))
        .withColumn("shard", shard_key(id_col, seed, epoch, num_shards))
        .repartition(num_shards, "shard")
        # shard leads the sort so the dynamic-partition writer's required
        # ordering (partition cols first) is already satisfied and it
        # does NOT inject its own re-sort, which would not preserve the
        # permutation order within each shard
        .sortWithinPartitions("shard", "__h", id_col)
        .drop("__h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
