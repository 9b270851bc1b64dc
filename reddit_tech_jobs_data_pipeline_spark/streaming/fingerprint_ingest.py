"""Modality-agnostic streaming dedup-at-ingest over packed 64-bit
fingerprints — the shared engine behind the image, audio, and video
dedup-at-ingest paths (round 12 built it image-only; the audio/video
fingerprints ride the identical (id, h_lo, h_hi) shape, so the store +
band-join pattern generalizes verbatim — r12 verdict item 2).

The corpus of already-accepted items is represented ONLY by its
fingerprint store (id + two longs per item for whole-item fingerprints;
id + two longs per DISTINCT FRAME for videos — payloads are never
re-read, never re-decoded). Each arriving micro-batch is fingerprinted
once, then deduped by one of two rules:

- whole-item (image aHash, audio energy-delta): an arrival within
  Hamming ≤ ``max_hamming`` of ANY stored survivor drops
  (dedup.hamming_band_pairs_cross, store side kept collapsed to one rep
  per distinct hash); batch-internal near-dups drop the larger id of a
  verified pair (the linear star-edge form — same survivor set).
- per-frame vote (video): an arrival sharing ≥ ``min_shared`` distinct
  frame hashes with ANY single stored video drops
  (dedup.shared_hash_vote_pairs_cross — the CBVR blocking vote);
  batch-internal pairs drop the larger id.

Survivors append their fingerprint rows; the store grows by survivors
only, keeping every later batch's join right-sized. Replay safety is
STRUCTURAL for whole-item fingerprints (a replayed survivor self-matches
at Hamming 0 — the cross join keeps id_a == id_b for exactly this
reason); the vote rule additionally carries an id-presence skip, because
a stored single-distinct-frame video cannot out-vote the ≥2 threshold
against itself. A missing store is accepted only as the first batch,
after interrupted-compaction-swap repair (_recover_or_first_batch).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_tech_jobs_data_pipeline_spark.operators import maintenance, multimodal
from reddit_tech_jobs_data_pipeline_spark.operators.dedup import (
    hamming_band_pairs,
    hamming_band_pairs_cross,
    shared_hash_vote_pairs,
    shared_hash_vote_pairs_cross,
)
from reddit_tech_jobs_data_pipeline_spark.streaming.events import (
    _stream_shuffle_partitions,
)
from reddit_tech_jobs_data_pipeline_spark.streaming.incremental_dedup import (
    _recover_or_first_batch,
)
from reddit_tech_jobs_data_pipeline_spark.workdirs import stable_work_key
from reddit_tech_jobs_data_pipeline_spark.streaming.tagfiles import write_tag_files

HASH_STORE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("h_lo", T.LongType()),
        T.StructField("h_hi", T.LongType()),
    ]
)


def _read_store_or_none(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Read a fingerprint store, repairing an interrupted compaction
    swap first; None only for the genuine first batch."""

    def _read() -> DataFrame:
        store = spark.read.schema(HASH_STORE_SCHEMA).parquet(store_path)
        store.isEmpty()  # force the existence check eagerly
        return store

    try:
        return _read()
    except AnalysisException as e:
        return _read() if _recover_or_first_batch(spark, store_path, e) else None


def ingest_batch_fingerprints(
    fps: DataFrame,
    store_path: str,
    max_hamming: int = 2,
) -> None:
    """Dedup one micro-batch of WHOLE-ITEM fingerprints (id, h_lo, h_hi)
    against the store and itself, appending the survivors' rows (see
    module docstring for the rules and the structural replay skip).
    ``fps`` should already be materialized (localCheckpoint) by the
    caller — the decode pass is the expensive part and feeds two joins."""
    sp = fps.sparkSession
    store = _read_store_or_none(sp, store_path)
    dup_ids = None
    if store is not None:
        # expand_right=False: only WHETHER a batch id matched matters —
        # a store flooded with identical hashes stays one rep row
        dup_ids = (
            hamming_band_pairs_cross(
                fps, store, max_hamming=max_hamming, expand_right=False
            )
            .select(F.col("id_a").alias("id"))
            .distinct()
        )
    # exact_pairs=False: the linear star-edge form has the same survivor
    # set (every non-minimal member still appears as id_b) without the
    # B² within-group expansion a degenerate batch would pay
    batch_dups = (
        hamming_band_pairs(fps, max_hamming=max_hamming, exact_pairs=False)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    dup_ids = batch_dups if dup_ids is None else dup_ids.unionByName(batch_dups).distinct()
    survivors = fps.join(dup_ids, "id", "left_anti")
    if not survivors.isEmpty():
        survivors.write.mode("append").parquet(store_path)


def ingest_batch_frame_votes(
    fh: DataFrame,
    store_path: str,
    min_shared: int = 2,
    max_frame_df: int | None = None,
) -> None:
    """Dedup one micro-batch of PER-FRAME hashes (id, h_lo, h_hi — one
    row per distinct frame hash per video) against the frame store and
    the batch itself with the ≥``min_shared``-shared-frames vote,
    appending survivors' frame rows. The id-presence skip (anti-join on
    stored ids) makes replays total even for videos whose distinct-frame
    count is below the vote threshold."""
    sp = fh.sparkSession
    frames = fh.select("id", "h_lo", "h_hi").distinct()
    store = _read_store_or_none(sp, store_path)
    dup_ids = None
    if store is not None:
        frames = frames.join(store.select("id").distinct(), "id", "left_anti")
        dup_ids = (
            shared_hash_vote_pairs_cross(
                frames, store, min_shared=min_shared, max_frame_df=max_frame_df
            )
            .select(F.col("id_a").alias("id"))
            .distinct()
        )
    batch_dups = (
        shared_hash_vote_pairs(frames, min_shared=min_shared, max_frame_df=max_frame_df)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    dup_ids = batch_dups if dup_ids is None else dup_ids.unionByName(batch_dups).distinct()
    survivors = frames.join(dup_ids, "id", "left_anti")
    if not survivors.isEmpty():
        survivors.write.mode("append").parquet(store_path)


def run_two_batch_ingest_batchlike(
    spark: SparkSession,
    blobs: DataFrame,
    work_name: str,
    ingest_fn: Callable[[DataFrame, str], None],
    maintenance_every: int = 2,
    distinct_ids: bool = False,
) -> DataFrame:
    """Shared harness: split ``blobs`` (id, content) into two
    deterministic micro-batches (family members id % 4 < 2, then the
    rest — mtime pinned so FileStreamSource's batch order is fixed), run
    the real Structured Streaming loop (foreachBatch → ``ingest_fn(batch,
    store_path)`` → cadenced store compaction), and return the final
    store's ids — the accepted, deduplicated corpus. ``distinct_ids``
    for per-frame stores where one id holds many rows."""
    work = os.path.join(
        tempfile.gettempdir(), f"spark_graft_{work_name}_{stable_work_key(work_name)}"
    )
    src_dir = os.path.join(work, "src")
    store = os.path.join(work, "store")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    # one scan, one shuffle; write_tag_files stamps increasing mtimes
    # (the FileStreamSource ordering key) in batch order
    write_tag_files(
        blobs,
        F.when(F.col("id") % 4 < 2, F.lit(0)).otherwise(F.lit(1)),
        src_dir,
        2,
        prefix="batch",
    )

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        ingest_fn(batch, store)
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
            .queryName(f"stream_{work_name}")
            .start()
        )
        q.awaitTermination()
        q.stop()

    out = spark.read.schema(HASH_STORE_SCHEMA).parquet(store).select("id")
    if distinct_ids:
        out = out.distinct()
    return out.orderBy("id").localCheckpoint()


def run_audio_dedup_ingest_batchlike(
    spark: SparkSession, sf_dir: str, maintenance_every: int = 2
) -> DataFrame:
    """Audio dedup-at-ingest over the planted-family PCM16 clips
    (catalog_analytics._afp_blobs): decode + energy-delta fingerprint
    once per batch (multimodal.audio_fingerprint), whole-item Hamming
    rules against the store, survivors append 3 longs per clip."""
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog_analytics import (
        _afp_blobs,
    )
    from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _ingest(batch: DataFrame, store_path: str) -> None:
        ingest_batch_fingerprints(
            multimodal.audio_fingerprint(batch).localCheckpoint(), store_path
        )

    return run_two_batch_ingest_batchlike(
        spark,
        _afp_blobs(docs),
        f"audiodedup_{stable_work_key(sf_dir)}",
        _ingest,
        maintenance_every=maintenance_every,
    )


def run_video_dedup_ingest_batchlike(
    spark: SparkSession, sf_dir: str, maintenance_every: int = 2
) -> DataFrame:
    """Video dedup-at-ingest over the planted-family 4-frame clips
    (catalog_analytics._vfh_blobs): walk + decode + aHash every frame
    once per batch (multimodal.video_frame_hashes), the ≥2-shared-frames
    vote against the per-frame store, survivors append one row per
    distinct frame hash."""
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog_analytics import (
        _vfh_blobs,
    )
    from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _ingest(batch: DataFrame, store_path: str) -> None:
        ingest_batch_frame_votes(
            multimodal.video_frame_hashes(batch).localCheckpoint(), store_path
        )

    return run_two_batch_ingest_batchlike(
        spark,
        _vfh_blobs(docs),
        f"videodedup_{stable_work_key(sf_dir)}",
        _ingest,
        maintenance_every=maintenance_every,
        distinct_ids=True,
    )
