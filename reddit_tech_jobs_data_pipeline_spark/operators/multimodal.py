"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schema contract,
partition-preserving batch iteration, UDF signatures, bounded batch
sizes via ``spark.sql.execution.arrow.maxRecordsPerBatch``. The actual
codecs (image decode / audio resample / video frame-sample) are STUBBED:
this container has no imaging/audio libraries, so ``decode_features``
computes deterministic pseudo-features from the bytes, and
``real_decode`` raises NotImplementedError with the integration point
documented. Swapping in PIL/torchaudio/ffmpeg touches only the inner
per-batch function — the distributed plumbing is unchanged.

At 100 TB: binary columns ride in parquet alongside metadata, pruning
and predicate pushdown still apply to the scalar columns, and the
pandas stage is the only Python hop — one Arrow round-trip per batch,
no per-row pickling.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("image", "audio", "video")

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def synthesize_blobs(docs: DataFrame) -> DataFrame:
    """Deterministic multimodal table from ``documents``: text bytes as
    the opaque payload, modality round-robined, metadata map attached."""
    return docs.select(
        F.col("doc_id").alias("id"),
        F.element_at(
            F.lit(list(MODALITIES)), (F.col("doc_id") % len(MODALITIES) + 1).cast("int")
        ).alias("modality"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("content"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def real_decode(content: bytes, modality: str):  # pragma: no cover - stub
    """Integration point for real codecs (PIL.Image.open /
    torchaudio.load / ffmpeg frame sampling). Not available in this
    environment."""
    raise NotImplementedError(
        "real image/audio/video decoding requires PIL/torchaudio/ffmpeg; "
        "plug the codec in here — the mapInPandas plumbing is unchanged"
    )


def _pseudo_feature(content: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in feature: bytes of md5(content) scaled to
    [0,1] — stable across runs/engines, shaped like a real embedding."""
    h = hashlib.md5(content or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def decode_features(blobs: DataFrame, dim: int = 4) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": content.map(lambda b, d=dim: _pseudo_feature(b, d)),
                }
            )

    return blobs.mapInPandas(_batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)


def _n_frames(modality: str, n_bytes: int) -> int:
    # deterministic stand-in for codec-reported frame/window counts:
    # videos sample 1-4 frames by payload size, audio gets 2 windows,
    # images are single-frame
    if modality == "video":
        return 1 + n_bytes % 4
    if modality == "audio":
        return 2
    return 1


def frame_sample(blobs: DataFrame) -> DataFrame:
    """1 blob → N frame rows (the fan-out shape of video frame sampling
    / audio windowing), Arrow-batched. The per-frame decode is stubbed
    (md5 of payload + frame index — see real_decode); the 1→N row
    production, schema contract, and batch iteration are the real
    mapInPandas plumbing a codec would plug into.

    At 100 TB the fan-out multiplies row counts ~4×, not byte counts
    (frames here are references, not materialized rasters) — repartition
    AFTER sampling if downstream per-frame work is heavy, so the
    explode doesn't concentrate hot videos on one task.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, mods, idxs, hashes = [], [], [], []
            for _id, mod, content in zip(pdf["id"], pdf["modality"], pdf["content"]):
                payload = content or b""
                for i in range(_n_frames(mod, len(payload))):
                    ids.append(_id)
                    mods.append(mod)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(payload + b"#" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "modality": pd.Series(mods, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return blobs.mapInPandas(_batches, schema=FRAME_SCHEMA)
