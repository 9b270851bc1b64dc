"""Table maintenance for the parquet lake: small-file compaction and
multi-dimensional (Z-order) file layout.

At 100 TB the scan cost of a table is set less by its logical size than
by its FILE GEOMETRY: thousands of kilobyte files per partition (the
natural residue of incremental micro-batch appends, e.g. the reference's
daily loads — dags/dag.py:449) drown a scan in open/seek overhead, and
files whose min/max footer stats span the whole key domain make
stats-based skipping useless. Compaction fixes the first; Z-ordering
fixes the second for multi-column predicates (a single-column sort only
helps that column).

Both rewrite data files only — pure DataFrame jobs, no table format
required; with a transactional format (Delta/Iceberg) the same rewrites
run under OPTIMIZE. Swap-by-staging mirrors sources/sink.py's
last-writer-wins rewrite.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def table_file_sizes(spark: SparkSession, path: str) -> list[int]:
    """Byte sizes of the table's data files, via the JVM FileSystem API
    (works on any Hadoop-supported store, not just local disk)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    sizes: list[int] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            sizes.append(f.getLen())
    return sizes


def partition_dirs(spark: SparkSession, path: str) -> list[str]:
    """Names of the Hive-style partition columns (``col=value`` top-level
    subdirectories) under ``path``; empty for a flat table. Uses the JVM
    FileSystem API so it answers for any Hadoop-supported store. Layout
    guards (compact_append_store, compact_ivf_index) key off this: a
    partitioned table must be rewritten WITH partitionBy or its
    directory-level pruning is silently destroyed."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    cols: set[str] = set()
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and "=" in name and not name.startswith(("_", ".")):
            cols.add(name.split("=", 1)[0])
    return sorted(cols)


def partition_values(spark: SparkSession, path: str, col: str) -> list[str]:
    """The distinct values of Hive-style partition column ``col`` under
    ``path``, read from the DIRECTORY NAMES (``col=value``) — the same
    metadata Spark's partition discovery uses, at FS-listing cost
    instead of a Spark job. ``compact(partition_col=...)`` sizes its
    rewrite from this: the former ``select(col).distinct().count()``
    launched a full scan-shaped job per compaction call, which inside a
    streaming maintenance cadence is one extra job per compaction for a
    number the directory listing already knows (r15, guide §1.2)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    vals: list[str] = []
    prefix = col + "="
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(prefix):
            vals.append(name[len(prefix):])
    return sorted(vals)


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> int:
    """Rewrite ``path`` into ≈``target_bytes`` files; returns the new
    file count. Output file count = ceil(current_bytes / target): sized
    from the table's REAL bytes, not row counts, so the same call is
    right at any SF. For a partitioned table pass ``partition_col``:
    rows are hash-distributed per partition value so each partition
    compacts independently (at 100 TB you'd additionally restrict to
    recently-appended partitions — the write path below is already
    per-partition). Swap is write-to-staging + rename (_swap_dirs) —
    two metadata ops, and every crash state is recoverable BY
    recover_interrupted_swap, which runs first here so a rerun after a
    mid-swap crash self-heals instead of failing the read."""
    recover_interrupted_swap(spark, path)
    current = sum(table_file_sizes(spark, path))
    n_out = max(1, math.ceil(current / target_bytes))
    df = spark.read.parquet(path)
    staging = _staging_path(path)
    if partition_col is None:
        df.repartition(n_out).write.mode("overwrite").parquet(staging)
    else:
        # partition count from the col=value directory names — no job
        # (see partition_values); a partitioned table with zero dirs
        # cannot occur here (compact is only called on existing stores)
        n_parts = len(partition_values(spark, path, partition_col))
        per_part = max(1, math.ceil(n_out / max(n_parts, 1)))
        # staging keeps the partitioned directory layout — downstream
        # partition pruning and PARTITION_COL-based rewrites
        # (purge_keys, upsert) depend on the col=value dirs existing
        df.repartition(per_part * n_parts, F.col(partition_col)).write.mode(
            "overwrite"
        ).partitionBy(partition_col).parquet(staging)
    _swap_dirs(spark, staging, path)
    return len(table_file_sizes(spark, path))


def _staging_path(path: str) -> str:
    """The staging sibling ``compact`` writes before swapping — a fixed
    derivation so crash recovery can find it without any state."""
    return path.rstrip("/") + "__compact_staging"


def recover_interrupted_swap(spark: SparkSession, path: str) -> bool:
    """Repair the one non-atomic window in compaction's swap: _swap_dirs
    is delete(path) then rename(staging -> path), so a crash between the
    two leaves the table MISSING with the only surviving copy sitting in
    the staging dir. Before this existed, every streaming store reader
    treated a missing path as the legitimate first-batch case — on
    replay it would silently rebuild the store from the current batch
    alone, and the NEXT cadence compaction would overwrite staging,
    destroying that last copy (round-11 advisor finding). Callers (the
    store readers' missing-path fallbacks, compact itself,
    run_store_maintenance) invoke this first; it returns True iff it
    completed the rename and the table is back.

    State table (delete only ever runs after staging's write committed,
    so the dangerous state is unambiguous):

    - no staging dir            -> nothing to do (False)
    - staging + path both exist -> crash BEFORE the delete (or a stale
      rerun): path is authoritative and staging holds the same rows —
      drop staging so later checks stay unambiguous (False)
    - staging, path missing     -> the interrupted swap: staging is the
      complete table; finish the rename (True). A staging dir without
      its _SUCCESS marker in this state is corruption, not a crash
      artifact — refuse loudly rather than promote a partial table.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(path)
    src = jvm.org.apache.hadoop.fs.Path(_staging_path(path))
    fs = dst.getFileSystem(conf)
    if not fs.exists(src):
        return False
    if fs.exists(dst):
        fs.delete(src, True)
        return False
    success = jvm.org.apache.hadoop.fs.Path(_staging_path(path) + "/_SUCCESS")
    if not fs.exists(success):
        raise IOError(
            f"recover_interrupted_swap: {path} is missing and its staging "
            f"sibling has no _SUCCESS marker — refusing to promote a "
            "partial table; inspect the staging dir by hand."
        )
    if not fs.rename(src, dst):
        raise IOError(
            f"recover_interrupted_swap: rename {_staging_path(path)} -> "
            f"{path} failed"
        )
    return True


def _swap_dirs(spark: SparkSession, staging: str, path: str) -> None:
    """Promote a fully-written staging table over ``path`` with two
    metadata operations (delete + rename) instead of re-reading staging
    and rewriting it into place. This halves compaction's write volume
    AND shrinks the crash exposure: the old read-back form could crash
    MID-OVERWRITE and leave ``path`` partially written with staging
    already consumed, while here every crash state is recoverable —
    either ``path`` still exists (before the delete; staging is complete
    and the compaction can simply rerun) or staging is complete and the
    recovery is one rename (staging-present-and-path-missing is the
    unambiguous marker). recover_interrupted_swap IMPLEMENTS that
    recovery and runs at the head of compact, run_store_maintenance, and
    every streaming store reader's missing-path fallback — the
    delete-to-rename window is therefore routine-crash-safe, not just
    recoverable in principle. Uses the Hadoop FileSystem API, so it holds on
    any store with directory rename (local, HDFS; object stores emulate
    it per-key but the ordering argument is unchanged)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(staging)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    if not fs.delete(dst, True):
        raise IOError(f"compact: could not remove {path} for swap")
    if not fs.rename(src, dst):
        raise IOError(f"compact: rename {staging} -> {path} failed")


def compact_append_store(
    spark: SparkSession,
    store_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact an append-only streaming store (streaming/{cms,hll,
    boilerplate}_ingest.py): those stores grow one parquet fragment per
    micro-batch FOREVER, so after N ingest days a merged read opens N
    kilobyte files — exactly the small-file geometry ``compact`` exists
    for. This is a row-preserving rewrite (no dedup, no re-aggregation):
    merged reads are groupBy-sums/unions over the same rows, and replay
    skip keys off ``batch_key`` values, so both are invariant under the
    rewrite (proved by tests/test_store_compaction.py, which checks
    merged-read equivalence AND that a replayed batch is still skipped
    after compaction). Run it only while no writer is active — the
    staging+overwrite swap would drop a concurrent append (under
    Delta/Iceberg the same rewrite runs as a transactional OPTIMIZE).

    FLAT STORES ONLY: this rewrite does not partitionBy, so running it
    on a Hive-partitioned directory (e.g. an IVF index's ``cell_id=``
    layout) would flatten it — a later partitioned append would then mix
    root-level files with ``col=`` subdirs, which Spark's partition
    discovery rejects, and directory-level pruning would be silently
    lost even without one. It refuses such paths; use compact_ivf_index
    (or ``compact(..., partition_col=...)``) for those. Returns the new
    file count."""
    parts = partition_dirs(spark, store_path)
    if parts:
        raise ValueError(
            f"compact_append_store: {store_path} is partitioned by "
            f"{parts}; a flat rewrite would destroy the col= layout. "
            "Use compact_ivf_index / compact(..., partition_col=...)."
        )
    return compact(spark, store_path, target_bytes=target_bytes)


def compact_ivf_index(
    spark: SparkSession,
    index_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact the hot-cell fragments an append_ivf_index /
    append_ivfpq_index ingest loop leaves behind, PRESERVING the
    ``cell_id=`` directory layout that directory-level probe pruning
    (ivf_index_topk / ivfpq_index_topk's ``isin`` filter) depends on.
    Accepts either index root: write_ivf_index puts the cell dirs at
    ``index_path`` itself; write_ivfpq_index nests them at
    ``index_path/codes`` beside the frozen ``books``/``cents`` model
    tables (which hold no fragments and are never touched). Probe
    results are invariant — the rewrite is row-preserving and cell
    membership rides on the directory key (test_store_compaction.py
    value-checks probes before/after). Same single-writer caveat as
    compact_append_store. Returns the new data-file count."""
    if partition_dirs(spark, index_path) == ["cell_id"]:
        root = index_path
    else:
        codes = index_path.rstrip("/") + "/codes"
        if partition_dirs(spark, codes) != ["cell_id"]:
            raise ValueError(
                f"compact_ivf_index: neither {index_path} nor {codes} has a "
                "cell_id= partition layout — for flat stores use "
                "compact_append_store."
            )
        root = codes
    return compact(spark, root, target_bytes=target_bytes, partition_col="cell_id")


def run_store_maintenance(
    spark: SparkSession,
    store_path: str,
    batch_id: int,
    every_n_batches: int = 8,
    target_bytes: int = 128 * 1024 * 1024,
) -> int | None:
    """Scheduled compaction hook for streaming foreachBatch loops — the
    piece that makes the append-only stores' fragment growth BOUNDED in
    operation, not just compactable in principle: call it at the end of
    every micro-batch and it compacts the store on every
    ``every_n_batches``-th batch (cadence keyed to the engine's
    monotonic batch_id, so restarts don't reset the schedule). Between
    compactions a store holds at most ``every_n_batches`` fresh
    fragments on top of the compacted base — O(interval), not O(total
    batches ever ingested).

    Safe inside foreachBatch: the caller is the store's ONLY writer and
    its append completed before this runs (the single-writer requirement
    of compact_append_store), and the rewrite is row-preserving so
    merged reads and batch_key replay-skip survive it — including a
    crash-replay of the same batch after a compaction
    (tests/test_store_compaction.py). Returns the new file count, or
    None when this batch isn't on the cadence (or the store doesn't
    exist yet)."""
    if every_n_batches <= 0 or (batch_id + 1) % every_n_batches != 0:
        return None
    # a crash between the previous compaction's delete and rename leaves
    # the store missing with staging holding the only copy — repair that
    # BEFORE the existence check, or this batch would skip maintenance
    # and the next cadence's staging write would destroy the copy
    recover_interrupted_swap(spark, store_path)
    if not os.path.exists(store_path):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(store_path)
        if not p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p):
            return None
    return compact_append_store(spark, store_path, target_bytes=target_bytes)


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into a
    Z-order (Morton) key — pure Catalyst bit arithmetic, codegen'd.
    Callers with non-integer columns rank them first (see
    zorder_write)."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        code = (
            code.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
                F.shiftleft(bbit, 2 * i + 1)
            )
        )
    return code


def morton_decode(z: Column, bits: int = 16) -> tuple[Column, Column]:
    """Inverse of morton_code: (a, b) back from the interleaved key —
    used to recover the bucket rectangle a file covers when debugging a
    layout (and to property-test the encoding round-trips)."""
    a = F.lit(0).cast("long")
    b = F.lit(0).cast("long")
    for i in range(bits):
        a = a.bitwiseOR(
            F.shiftleft(F.shiftright(z.cast("long"), 2 * i).bitwiseAND(F.lit(1)), i)
        )
        b = b.bitwiseOR(
            F.shiftleft(F.shiftright(z.cast("long"), 2 * i + 1).bitwiseAND(F.lit(1)), i)
        )
    return a, b


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` range-partitioned and sorted by the Morton key of
    (col_a, col_b): every output file then covers a small RECTANGLE of
    the 2-D key space, so parquet footer min/max stats prune files for
    predicates on EITHER column (a plain sort would prune only its lead
    column). Columns are first mapped to equi-depth integer buckets via
    the DISTRIBUTED exact rank (operators/ranking.py two-phase prefix
    sum) + ntile arithmetic — no global-sort window anywhere, so the
    whole layout job is range shuffles + narrow arithmetic at any scale.
    The row count is a scalar probe (bounded collect, same class as the
    watermark). tests/test_maintenance.py MEASURES the effect on footer
    stats rather than trusting this docstring."""
    from reddit_tech_jobs_data_pipeline_spark.operators.ranking import (
        global_row_number,
        ntile_from_rank,
    )

    n_buckets = 1 << bits
    n_rows = F.lit(df.count())
    keyed = global_row_number(
        df, [F.col(col_a), F.col(col_b)], "__ra", scale=True
    )
    keyed = global_row_number(
        keyed, [F.col(col_b), F.col(col_a)], "__rb", scale=True
    )
    za = ntile_from_rank(F.col("__ra"), n_rows, n_buckets) - 1
    zb = ntile_from_rank(F.col("__rb"), n_rows, n_buckets) - 1
    keyed = keyed.withColumn("__z", morton_code(za, zb, bits)).drop("__ra", "__rb")
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stat_coverage(path: str, col: str) -> float:
    """Mean fraction of the column's global [min, max] range that a
    single data file's footer stats span — the file-skipping figure of
    merit (1.0 = every file covers everything, stats prune nothing;
    1/num_files = perfect clustering)."""
    import pyarrow.parquet as pq

    spans: list[tuple[float, float]] = []
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, fn))
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            spans.append((lo, hi))
    gmin = min(s[0] for s in spans)
    gmax = max(s[1] for s in spans)
    rng = (gmax - gmin) or 1
    return sum((hi - lo) / rng for lo, hi in spans) / len(spans)
