"""Gold-table sink: DDL bootstrap + date-partitioned parquet layout.

Replaces the reference's Postgres DDL + btree index (S7, dags/dag.py:490-514):
the ``created_date`` partition column + parquet column statistics serve the
same access pattern the ``idx_posts_created_datetime`` index served —
watermark probes (max over recent partitions) and recency filters prune to
a handful of partitions instead of scanning the table.

At 100 TB: daily partitions keep rewrite units bounded (see
operators/merge.upsert_partitioned); a second-level bucket-by on the merge
key (post_id) would additionally make upsert joins shuffle-free — noted
here because vanilla parquet tables only support bucketing through the
catalog (``bucketBy`` + saveAsTable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators.merge import merge_upsert

PARTITION_COL = "created_date"


def _touched_pred(touched: list) -> F.Column:
    """Membership predicate over partition values that is NULL-correct:
    ``isin()`` never matches NULL (SQL three-valued logic), so a null
    partition value — possible because ``created_date`` derives from a
    nullable timestamp and lands on disk as ``__HIVE_DEFAULT_PARTITION__``
    — needs an explicit ``isNull`` arm. Without it, null-partition rows
    are invisible to the touched-partition filters and a rewrite would
    silently drop (upsert) or wrongly delete (purge) them."""
    pred = F.col(PARTITION_COL).isin([v for v in touched if v is not None])
    if any(v is None for v in touched):
        pred = pred | F.col(PARTITION_COL).isNull()
    return pred


def ensure_gold_table(spark: SparkSession, path: str, name: str = "posts_gold") -> None:
    """CREATE TABLE IF NOT EXISTS analog (S7): external parquet table
    partitioned by date, registered in the session catalog."""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {name} (
          post_id STRING, title STRING, url STRING, text STRING,
          author STRING, subreddit STRING, created_datetime TIMESTAMP,
          upvotes INT, comments_count INT, salary_currency STRING,
          lower_salary DOUBLE, upper_salary DOUBLE, job_position STRING,
          location STRING, field STRING, technologies ARRAY<STRING>,
          ingest_ts TIMESTAMP, {PARTITION_COL} DATE
        )
        USING parquet
        PARTITIONED BY ({PARTITION_COL})
        LOCATION '{path}'
        """
    )


def with_partition_col(df: DataFrame, ts_col: str = "created_datetime") -> DataFrame:
    return df.withColumn(PARTITION_COL, F.to_date(F.col(ts_col)))


def write_gold(df: DataFrame, path: str) -> None:
    """Initial/full write of the partitioned layout.

    Rows are clustered by post_id within each date partition
    (sortWithinPartitions): parquet row-group min/max stats on post_id
    then prune point lookups and merge-key probes inside a partition —
    the poor man's secondary index, free at write time."""
    (
        with_partition_col(df)
        .sortWithinPartitions(PARTITION_COL, "post_id")
        .write.mode("overwrite")
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def upsert_gold(spark: SparkSession, path: str, new: DataFrame, version_col: str = "ingest_ts") -> None:
    """S8/D2 — keyed last-writer-wins upsert touching ONLY the partitions
    present in the incoming batch (dynamic partition overwrite).

    The merge result is staged to a scratch path before overwriting:
    overwriting a path that the same plan lazily reads races file deletion
    against the read (FAILED_READ_FILE). The stage-then-swap costs one
    extra write of the touched partitions only — bounded by batch size,
    not table size. (A transactional table format would make this a
    single-commit MERGE; on vanilla parquet staging is the safe primitive.)

    INVARIANT: the partition column derives from ``created_datetime``,
    which is immutable per post_id (a post's creation time never changes;
    the reference's ON CONFLICT upsert relies on the same fact). Updates
    therefore always land in the partition that already holds their key.
    A merge key whose partition attribute can change would need a
    key→partition index or a full-key semi-join — different operator.
    """
    new = with_partition_col(new)
    touched = [r[0] for r in new.select(PARTITION_COL).distinct().collect()]
    old = spark.read.parquet(path).filter(_touched_pred(touched))
    merged = merge_upsert(old, new, ["post_id"], version_col)
    staging = path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").partitionBy(PARTITION_COL).parquet(staging)
    _dynamic_overwrite(spark, staging, path, schema=merged.schema)
    _rm(staging)
    # drop the cached file listing for the path — stale entries would point
    # readers at the overwritten part files
    spark.catalog.refreshByPath(path)


def purge_keys(spark: SparkSession, path: str, keys: DataFrame, key_col: str = "post_id") -> int:
    """Targeted row deletion (the right-to-erasure / bad-record purge
    corner of the sink's CRUD surface): remove every row whose key
    appears in ``keys``, rewriting ONLY the partitions that contain one.

    Two phases, both pruned: (1) a semi-join over the table finds the
    affected partition values — at 100 TB this is a broadcast semi-join
    of the (tiny) key list against the partition column projection;
    (2) those partitions are re-written via left_anti and dynamic
    partition overwrite through the same stage-then-swap as upsert_gold.
    Untouched partitions keep their files byte-identical
    (tests/test_purge.py proves it). Returns the number of rows removed.

    Partitions whose rows are ALL purged need special care: dynamic
    partition overwrite only replaces partitions PRESENT in the staged
    data, so an emptied partition would silently survive the swap. After
    staging we diff the staged partition values against ``touched`` and
    explicitly delete every emptied partition directory (Hadoop FS API,
    so it works on any store). If EVERY touched partition empties, the
    staged data has no partitions at all and the swap is skipped
    entirely — only the deletes run.
    """
    keys = keys.select(F.col(key_col)).distinct()
    table = spark.read.parquet(path)
    touched = [
        r[0]
        for r in table.join(F.broadcast(keys), key_col, "left_semi")
        .select(PARTITION_COL)
        .distinct()
        .collect()
    ]
    if not touched:
        return 0
    touched_pred = _touched_pred(touched)
    affected = table.filter(touched_pred)
    n_before = affected.count()
    kept = affected.join(F.broadcast(keys), key_col, "left_anti")
    staging = path.rstrip("/") + "__purge_staging"
    kept.write.mode("overwrite").partitionBy(PARTITION_COL).parquet(staging)
    staged_vals = _partition_values(spark, staging)
    # compare ESCAPED dir names on both sides: Spark percent-escapes
    # special characters (space, ':', '/') in partition directory values,
    # so a raw str(v) comparison would misclassify any escaping-needing
    # value as emptied and then delete the wrong (unescaped) path
    emptied = [
        e
        for e in (_escape_partition_value(spark, v) for v in touched)
        if e not in staged_vals
    ]
    if staged_vals:
        _dynamic_overwrite(spark, staging, path, schema=kept.schema)
    for e in emptied:
        _fs_delete(spark, f"{path.rstrip('/')}/{PARTITION_COL}={e}")
    _rm(staging)
    spark.catalog.refreshByPath(path)
    # explicit schema: a fully-emptied table has no files to infer from
    n_after = (
        spark.read.schema(table.schema)
        .parquet(path)
        .filter(touched_pred)
        .count()
    )
    return n_before - n_after


def _dynamic_overwrite(spark: SparkSession, staging: str, path: str, schema=None) -> None:
    """Swap staged partitions into ``path`` under dynamic partition
    overwrite, saving and restoring the session-level mode so a later
    mode=overwrite write that expects static semantics is unaffected.

    ``schema`` (the staged DataFrame's schema) must be passed whenever
    the staged data can be null-partition-only: with nothing but a
    ``__HIVE_DEFAULT_PARTITION__`` directory to look at, partition-type
    inference yields VOID and the re-write would fail with
    INVALID_PARTITION_COLUMN_DATA_TYPE."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        reader = spark.read.schema(schema) if schema is not None else spark.read
        reader.parquet(staging).write.mode("overwrite").partitionBy(
            PARTITION_COL
        ).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _partition_values(spark: SparkSession, path: str) -> set[str]:
    """Partition values present as ``col=value`` directories under
    ``path`` (stringified, matching Spark's partition-dir encoding)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    vals: set[str] = set()
    if not fs.exists(p):
        return vals
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isDirectory() and "=" in name:
            vals.add(name.split("=", 1)[1])
    return vals


def _escape_partition_value(spark: SparkSession, v) -> str:
    """Spark's own partition-directory encoding for a value — the same
    `ExternalCatalogUtils.escapePathName` the writer uses, so names built
    here always match what `partitionBy` put on disk. A null partition
    value is written by Spark as the `__HIVE_DEFAULT_PARTITION__`
    directory (never the string 'None'), so it maps there explicitly —
    possible in practice because the partition column derives from a
    nullable timestamp."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    return spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(
        str(v)
    )


def _fs_delete(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def _rm(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
