"""Streaming ingest into the persisted PQ index — the frozen-MODEL
generalization of streaming/srp_ingest.py (round-11 verdict item 5:
IVF/PQ/IVF-PQ appends were batch-only while their frozen-model encodes
are exactly micro-batch-shaped).

Operational shape: the codebooks are trained ONCE on the historical
corpus and persisted (the model — m×ks rows, KBs); the stream then
ingests vector micro-batches, each encoded with the FROZEN books by the
map-only expression encode (similarity.append_pq_index /
_frozen_encode_exprs) and appended to the flat ``codes`` table. Because
per-subspace nearest-centroid assignment is deterministic given the
books, stream-ingested ≡ one-shot encode of the union — the catalog
gates the post-stream probe with the SAME unrolled oracle as the batch
append (``_pq_sql(train_where=...)``).

Idempotent-append discipline (the incremental_dedup contract): a
replayed batch's vectors already have codes, so the ingest left-anti
joins the batch against the codes table's vec_ids (column-pruned id
scan — m+1 small ints per row, never raw vectors) before encoding; only
the first-batch missing-path read may fall back to an empty store, and
an interrupted compaction swap is repaired first
(_recover_or_first_batch). Scheduled compaction
(maintenance.run_store_maintenance) bounds the flat codes table's
fragment growth to O(cadence); books are a single file and never
compacted.

Training the books BEFORE the stream (rather than on "whatever batch
happens to arrive first") is deliberate: it makes the result
independent of micro-batch arrival order — the file-source ordering is
an implementation detail no correctness property should ride on — and
it is the real production shape (model trained on history, stream
encodes forward).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import maintenance, similarity
from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table
from reddit_tech_jobs_data_pipeline_spark.streaming.events import (
    _stream_shuffle_partitions,
)
from reddit_tech_jobs_data_pipeline_spark.streaming.incremental_dedup import (
    _recover_or_first_batch,
)
from reddit_tech_jobs_data_pipeline_spark.workdirs import stable_work_key
from reddit_tech_jobs_data_pipeline_spark.streaming.tagfiles import write_tag_files


def ingest_batch_pq(
    batch: DataFrame,
    index_path: str,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books_model=None,
) -> None:
    """Encode one micro-batch with the index's frozen books and append
    its codes, idempotently: vectors whose id already has a code are
    dropped (replay skip — a column-pruned anti-join on vec_id).
    ``books_model`` (similarity.load_pq_books) lets a multi-batch run
    load the frozen model once instead of re-reading it per batch; a
    crash-replay in a fresh process simply reloads from disk — the
    model is immutable after the build, so the encode is identical."""
    sp = batch.sparkSession
    codes_path = f"{index_path}/codes"

    def _read_ids() -> DataFrame:
        # eager-infer read raises PATH_NOT_FOUND here (srp_ingest note)
        return sp.read.parquet(codes_path).select("vec_id")

    try:
        existing = _read_ids()
    except AnalysisException as e:
        # repair an interrupted compaction swap (and retry) before
        # treating a missing path as the first batch
        existing = _read_ids() if _recover_or_first_batch(sp, codes_path, e) else None
    new = batch
    if existing is not None:
        new = batch.join(
            existing, batch[id_col] == existing["vec_id"], "left_anti"
        )
    if new.isEmpty():
        return  # full replay: no empty fragment appended
    similarity.append_pq_index(
        sp, new, index_path, dim=dim, id_col=id_col, vec_col=vec_col,
        books_model=books_model,
    )


def run_pq_ingest_batchlike(
    spark: SparkSession,
    sf_dir: str,
    n_tags: int = 4,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    k: int = 5,
    rerank_n: int = 50,
    maintenance_every: int = 3,
) -> DataFrame:
    """Train the books on the tag-0 slice (the 'historical corpus'),
    then stream ALL embeddings in n_tags micro-batches (vec_id % n_tags
    tag files, maxFilesPerTrigger=1) through the idempotent frozen-books
    ingest, compacting the codes table on the cadence, and probe the
    streamed index. The probe value-hash-matches the batch append's
    oracle (train rows = vec_id % n_tags = 0, encode = full corpus) —
    stream-ingested ≡ batch-built, the frozen-model guarantee made
    end-to-end observable for a TRAINED quantizer, not just SRP's
    data-independent planes."""
    work = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_pqstream_{stable_work_key(sf_dir, n_tags, m, ks)}",
    )
    src_dir = os.path.join(work, "src")
    index = os.path.join(work, "index")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    emb = load_table(spark, sf_dir, "embeddings")
    write_tag_files(emb, F.col("vec_id") % n_tags, src_dir, n_tags)

    # the model: books trained ONCE on history (tag 0), codes NOT
    # written here — every code row arrives through the stream
    books = similarity.pq_train_books(
        emb.filter(F.col("vec_id") % n_tags == 0), m=m, ks=ks, train_iters=1, dim=dim
    )
    books.coalesce(1).write.mode("overwrite").parquet(f"{index}/books")
    # frozen model loaded ONCE for the whole drain — per-batch reload
    # was a parquet read + collect inside every micro-batch
    books_model = similarity.load_pq_books(spark, index, dim, "stream_pq_ingest")

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_pq(batch, index, dim=dim, books_model=books_model)
        # flat codes table: the plain append-store compaction applies
        maintenance.run_store_maintenance(
            batch.sparkSession,
            f"{index}/codes",
            batch_id,
            every_n_batches=maintenance_every,
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
            .queryName("stream_pq_ingest")
            .start()
        )
        q.awaitTermination()
        q.stop()

    return similarity.pq_index_topk(
        spark,
        index,
        emb.filter(F.col("vec_id") < 20),
        corpus=emb,
        k=k,
        rerank_n=rerank_n,
    ).localCheckpoint()


def ingest_batch_ivfpq(
    batch: DataFrame,
    index_path: str,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model=None,
) -> None:
    """Assign + residual-encode one micro-batch with the index's frozen
    coarse centroids AND residual codebooks, appending into the
    cell_id= directories, idempotently (column-pruned anti-join on the
    codes table's vec_ids — partition columns and m+1 small ints, never
    raw vectors). ``model`` (similarity.load_ivfpq_model) lets a
    multi-batch run load both frozen models once — see ingest_batch_pq."""
    sp = batch.sparkSession
    codes_path = f"{index_path}/codes"

    def _read_ids() -> DataFrame:
        return sp.read.parquet(codes_path).select("vec_id")

    try:
        existing = _read_ids()
    except AnalysisException as e:
        existing = _read_ids() if _recover_or_first_batch(sp, codes_path, e) else None
    new = batch
    if existing is not None:
        new = batch.join(
            existing, batch[id_col] == existing["vec_id"], "left_anti"
        )
    if new.isEmpty():
        return
    similarity.append_ivfpq_index(
        sp, new, index_path, dim=dim, id_col=id_col, vec_col=vec_col, model=model
    )


def run_ivfpq_ingest_batchlike(
    spark: SparkSession,
    sf_dir: str,
    n_tags: int = 4,
    num_cells: int = 8,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    k: int = 5,
    nprobe: int = 3,
    rerank_n: int = 200,
    maintenance_every: int = 3,
) -> DataFrame:
    """The IVF-PQ index built BY A STREAM — both models frozen: the
    coarse quantizer is the seeded historical one (vec_id < num_cells,
    frozen across generations), the residual codebooks train once on
    the tag-0 slice, then ALL embeddings replay in n_tags micro-batches
    through the idempotent frozen-models ingest; the CELL-PARTITIONED
    codes table compacts on the cadence via the layout-preserving
    compact(partition_col='cell_id') (the flat compact_append_store
    path would destroy the cell_id= pruning — it refuses such dirs by
    design). Probe value-hashes the batch append's unrolled oracle.

    The model train reuses write_ivfpq_index on the historical slice
    and drops its codes (every code row must arrive through the
    stream); production would factor the model-train out, but reusing
    the audited builder keeps one encode path."""
    cents = similarity.seeded_centroids(
        load_table(spark, sf_dir, "embeddings"), num_cells
    )
    work = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_ivfpqstream_{stable_work_key(sf_dir, n_tags, m, ks)}",
    )
    src_dir = os.path.join(work, "src")
    index = os.path.join(work, "index")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    emb = load_table(spark, sf_dir, "embeddings")
    write_tag_files(emb, F.col("vec_id") % n_tags, src_dir, n_tags)

    # models: frozen coarse quantizer + residual books trained on the
    # tag-0 history; the builder's codes are dropped — the stream is
    # the only code writer
    similarity.write_ivfpq_index(
        emb.filter(F.col("vec_id") % n_tags == 0),
        index,
        num_cells=num_cells,
        m=m,
        ks=ks,
        train_iters=1,
        dim=dim,
        centroids=cents,
    )
    shutil.rmtree(f"{index}/codes")
    # both frozen models loaded ONCE for the whole drain (see the PQ
    # runner) — per-batch reload was 2 parquet reads + a collect each
    ivfpq_model = similarity.load_ivfpq_model(spark, index, dim, "stream_ivfpq_ingest")

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_ivfpq(batch, index, dim=dim, model=ivfpq_model)
        # layout-preserving compaction: cell_id= dirs must survive
        codes = f"{index}/codes"
        if maintenance_every > 0 and (batch_id + 1) % maintenance_every == 0:
            if os.path.exists(codes):
                maintenance.compact(
                    batch.sparkSession, codes, partition_col="cell_id"
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
            .queryName("stream_ivfpq_ingest")
            .start()
        )
        q.awaitTermination()
        q.stop()

    return similarity.ivfpq_index_topk(
        spark,
        index,
        emb.filter(F.col("vec_id") < 20),
        corpus=emb,
        k=k,
        nprobe=nprobe,
        rerank_n=rerank_n,
    ).localCheckpoint()
