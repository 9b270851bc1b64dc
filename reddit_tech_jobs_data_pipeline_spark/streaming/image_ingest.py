"""Streaming image dedup-at-ingest: perceptual-hash batches deduped
against a persisted hash store — the image modality's
incremental_dedup.py (text got this in round 8; images got their hash
family this round).

The corpus of already-accepted images is represented ONLY by its hash
store (id + two longs per image — the raster is never re-read, never
re-decoded): each arriving micro-batch is decoded + aHashed once
(multimodal.image_ahash), then

  1. batch-vs-store near-dups via the cross band join
     (dedup.hamming_band_pairs_cross) — an arriving image within
     Hamming ≤ 2 of ANY stored survivor is a duplicate and is dropped;
  2. batch-internal near-dups via the self band join — the larger id
     of a verified pair drops (the incremental_lsh_ingest rule:
     earlier/smaller id survives);
  3. survivors append their 3-long hash rows to the store. The store
     grows by survivors only, keeping every later batch's join
     right-sized.

Replay safety is STRUCTURAL here: a replayed batch's survivors are
already in the store, so they self-match at Hamming 0 in step 1 and
drop — nothing is appended twice, no id bookkeeping needed (the cross
join deliberately keeps id_a == id_b matches for exactly this reason).
A missing store is accepted only as the first batch, after interrupted-
compaction-swap repair (the _recover_or_first_batch contract).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time as _time

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_tech_jobs_data_pipeline_spark.operators import maintenance, multimodal
from reddit_tech_jobs_data_pipeline_spark.operators.dedup import (
    hamming_band_pairs,
    hamming_band_pairs_cross,
)
from reddit_tech_jobs_data_pipeline_spark.streaming.events import (
    _stream_shuffle_partitions,
)
from reddit_tech_jobs_data_pipeline_spark.streaming.incremental_dedup import (
    _recover_or_first_batch,
)
from reddit_tech_jobs_data_pipeline_spark.workdirs import stable_work_key

_HASH_STORE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("h_lo", T.LongType()),
        T.StructField("h_hi", T.LongType()),
    ]
)


def ingest_batch_image_hashes(
    batch_blobs: DataFrame,
    store_path: str,
    max_hamming: int = 2,
) -> None:
    """Hash one micro-batch of image blobs (id, content) and append the
    near-dup SURVIVORS' hash rows to the store (see module docstring
    for the dup rules and the structural replay skip)."""
    sp = batch_blobs.sparkSession
    hashes = multimodal.image_ahash(batch_blobs).localCheckpoint()

    def _read_store() -> DataFrame:
        store = sp.read.schema(_HASH_STORE_SCHEMA).parquet(store_path)
        store.isEmpty()  # force the existence check eagerly
        return store

    try:
        store = _read_store()
    except AnalysisException as e:
        store = _read_store() if _recover_or_first_batch(sp, store_path, e) else None

    dup_ids = None
    if store is not None:
        dup_ids = (
            hamming_band_pairs_cross(hashes, store, max_hamming=max_hamming)
            .select(F.col("id_a").alias("id"))
            .distinct()
        )
    batch_dups = (
        hamming_band_pairs(hashes, max_hamming=max_hamming)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    dup_ids = batch_dups if dup_ids is None else dup_ids.unionByName(batch_dups).distinct()
    survivors = hashes.join(dup_ids, "id", "left_anti")
    if not survivors.isEmpty():
        survivors.write.mode("append").parquet(store_path)


def run_image_dedup_ingest_batchlike(
    spark: SparkSession,
    sf_dir: str,
    maintenance_every: int = 2,
) -> DataFrame:
    """Run the image dedup-at-ingest to completion over a two-batch
    replay of the planted-family images (batch 1 = family members
    doc_id % 4 < 2, batch 2 = the rest; FileStreamSource consumes by
    mtime, pinned so batch order is deterministic), compacting the flat
    hash store on the cadence, and return the final store's ids — the
    accepted, deduplicated image corpus. Batch 1's families collapse to
    their min-id member (batch-internal rule); batch 2's members then
    collide with the stored survivors and drop unless their variant
    pixel pushed them past Hamming 2. The oracle replays both rounds in
    SQL over the same md5-derived hashes."""
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog_analytics import (
        _phash_blobs,
    )
    from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table

    work = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_imgdedup_{stable_work_key(sf_dir)}",
    )
    src_dir = os.path.join(work, "src")
    store = os.path.join(work, "store")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = _phash_blobs(docs)
    b1 = blobs.filter(F.col("id") % 4 < 2)
    b2 = blobs.filter(F.col("id") % 4 >= 2)
    for i, b in enumerate((b1, b2)):
        tmp = os.path.join(src_dir, f"_tmp{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(src_dir, f"batch{i}.parquet"))
        shutil.rmtree(tmp)
    # deterministic micro-batch order: mtime is the FileStreamSource key
    now = _time.time()
    os.utime(os.path.join(src_dir, "batch0.parquet"), (now - 100, now - 100))
    os.utime(os.path.join(src_dir, "batch1.parquet"), (now, now))

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_image_hashes(batch, store)
        maintenance.run_store_maintenance(
            batch.sparkSession, store, batch_id, every_n_batches=maintenance_every
        )

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    with _stream_shuffle_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .queryName("stream_image_dedup")
            .start()
        )
        q.awaitTermination()
        q.stop()

    return (
        spark.read.schema(_HASH_STORE_SCHEMA)
        .parquet(store)
        .select("id")
        .orderBy("id")
        .localCheckpoint()
    )
