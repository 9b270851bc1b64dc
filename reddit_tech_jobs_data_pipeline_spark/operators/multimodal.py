"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schema contract,
partition-preserving batch iteration, UDF signatures, bounded batch
sizes via ``spark.sql.execution.arrow.maxRecordsPerBatch``. Decoding
comes in two tiers:

- ``real_decode`` / ``decode_real_features``: REAL pure-numpy decoders
  for the formats that need no codec library — binary PPM and 24-bit
  BMP images, PCM16 WAV audio — with an F5-style per-row error channel
  for everything else (tests feed actual PPM/BMP/WAV bytes through the
  distributed path and check pixels/samples).
- Compressed codecs (JPEG/PNG, MP3/AAC, video containers) require
  PIL/torchaudio/ffmpeg, absent in this container; those paths raise
  NotImplementedError at the documented integration point, and
  ``decode_features`` provides a deterministic md5-based stand-in
  feature so downstream plumbing stays exercised end-to-end.

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


def _parse_p6_header(content: bytes, pos: int = 0) -> tuple[int, int, int, int]:
    """Parse one binary-PPM (P6) header starting at ``pos``: ASCII tokens
    "P6 <w> <h> <maxval>" separated by whitespace, '#' comments running
    to end-of-line, one whitespace byte after maxval, then the raster.
    Returns (w, h, maxval, raster_offset). The ONE P6 tokenizer — both
    the single-image decode and the concatenated-frame walk call it, so
    their byte-offset arithmetic can never diverge (a desync would
    silently corrupt every frame hash after the first)."""
    if content[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 header")
    p, tokens = pos + 2, []
    while len(tokens) < 3:
        while p < len(content) and content[p : p + 1].isspace():
            p += 1
        if content[p : p + 1] == b"#":
            while p < len(content) and content[p : p + 1] != b"\n":
                p += 1
            continue
        start = p
        while p < len(content) and not content[p : p + 1].isspace():
            p += 1
        tokens.append(int(content[start:p]))
    p += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    return w, h, maxval, p


def decode_image(content: bytes):
    """REAL pure-numpy decode of uncompressed raster formats — binary
    PPM (P6) and 24-bit uncompressed BMP — returning an (H, W, 3) uint8
    RGB array. Compressed codecs (JPEG/PNG/WebP/…) require an external
    library; that remaining integration point raises NotImplementedError.
    """
    import numpy as np

    if content[:2] == b"P6":
        w, h, maxval, pos = _parse_p6_header(content)
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        raster = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
        return raster.reshape(h, w, 3)
    if content[:2] == b"BM":
        # BMP: little-endian header; only 24bpp uncompressed handled
        import struct

        data_offset = struct.unpack_from("<I", content, 10)[0]
        w = struct.unpack_from("<i", content, 18)[0]
        h = struct.unpack_from("<i", content, 22)[0]
        bpp = struct.unpack_from("<H", content, 28)[0]
        compression = struct.unpack_from("<I", content, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only 24-bit uncompressed BMP is decoded natively")
        row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte boundary
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        rows = np.frombuffer(
            content, dtype=np.uint8, count=row_bytes * h, offset=data_offset
        ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        if flip:
            rows = rows[::-1]
        return rows[..., ::-1].copy()  # BGR -> RGB
    raise NotImplementedError(
        "compressed image codecs (JPEG/PNG/…) require an external library; "
        "plug it in here — the mapInPandas plumbing is unchanged"
    )


def decode_wav(content: bytes):
    """REAL pure-numpy decode of PCM16 WAV: returns (sample_rate,
    int16 ndarray of shape (n_samples, n_channels)). Compressed audio
    (MP3/AAC/FLAC) is the remaining external-codec integration point."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed audio codecs require an external library; "
            "plug it in here — the mapInPandas plumbing is unchanged"
        )
    pos, rate, channels, fmt = 12, None, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", content, pos + 8)
            bits = struct.unpack_from("<H", content, pos + 22)[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV is decoded natively")
        elif cid == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt chunk")
            samples = np.frombuffer(content, dtype="<i2", count=size // 2, offset=pos + 8)
            return rate, samples.reshape(-1, channels)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV has no data chunk")


def real_decode(content: bytes, modality: str):
    """Real decode for the formats a lakehouse can handle without codec
    libraries: uncompressed rasters (PPM/BMP) and PCM WAV, pure numpy.
    Video containers (and compressed image/audio codecs) still require
    ffmpeg/PIL-class libraries and raise NotImplementedError — swapping
    them in touches only this function; the mapInPandas plumbing
    (schema, batching, partitioning) is identical either way."""
    if modality == "image":
        return decode_image(content)
    if modality == "audio":
        return decode_wav(content)
    raise NotImplementedError(
        "video frame decoding requires ffmpeg-class tooling; "
        "plug it in here — the mapInPandas plumbing is unchanged"
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


REAL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("shape", T.ArrayType(T.IntegerType()), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_real_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode over the binary column, with the F5-style
    per-row error channel: rows whose payload the native decoders handle
    (PPM/BMP images, PCM WAV audio) come back ``decode_ok=true`` with
    real shape + features (per-channel pixel means; sample rate + RMS);
    payloads needing external codecs come back ``decode_ok=false`` with
    the reason — the same quarantine-split contract as the parse
    pipeline, so bad media never kills a 100 TB batch.
    """
    import numpy as np

    def _one(_id, mod, content):
        try:
            decoded = real_decode(bytes(content or b""), mod)
            if mod == "image":
                img = decoded
                feat = [float(img[..., c].mean()) for c in range(img.shape[2])]
                return (_id, mod, True, None, [int(d) for d in img.shape], feat)
            rate, samples = decoded
            rms = float(np.sqrt(np.mean(samples.astype("float64") ** 2)))
            return (
                _id,
                mod,
                True,
                None,
                [int(d) for d in samples.shape],
                [float(rate), rms],
            )
        except (NotImplementedError, ValueError, IndexError, EOFError) as e:
            return (_id, mod, False, str(e), None, None)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                _one(_id, mod, content)
                for _id, mod, content in zip(pdf["id"], pdf["modality"], pdf["content"])
            ]
            yield pd.DataFrame(
                rows, columns=["id", "modality", "decode_ok", "error", "shape", "feature"]
            )

    return blobs.mapInPandas(_batches, schema=REAL_FEATURE_SCHEMA)


def resize_nn(raster, out_h: int, out_w: int):
    """Nearest-neighbor resize of an (H, W, C) uint8 raster — pure numpy
    fancy indexing (src row = floor(i·H/out_h)), the standard NN
    convention, no image library."""
    import numpy as np

    h, w = raster.shape[0], raster.shape[1]
    rows = np.floor(np.arange(out_h) * h / out_h).astype(int)
    cols = np.floor(np.arange(out_w) * w / out_w).astype(int)
    return raster[rows][:, cols]


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("shape", T.ArrayType(T.IntegerType()), True),
        T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
    ]
)


def resize_images(blobs: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """REAL image resize over the binary column: decode (PPM/BMP, pure
    numpy) → nearest-neighbor resample → resized shape + flattened
    pixel values, with the same per-row quarantine channel as
    decode_real_features. The resample itself is vectorized numpy per
    Arrow batch — the shape every bulk image-preprocessing stage takes
    at 100 TB (decode and transform riding one executor pass, raster
    never crossing a shuffle)."""

    def _one(_id, content):
        try:
            img = decode_image(bytes(content or b""))
            out = resize_nn(img, out_h, out_w)
            return (
                _id,
                True,
                None,
                [int(d) for d in out.shape],
                [int(v) for v in out.reshape(-1)],
            )
        except (NotImplementedError, ValueError, IndexError, EOFError) as e:
            return (_id, False, str(e), None, None)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_one(_id, content) for _id, content in zip(pdf["id"], pdf["content"])]
            yield pd.DataFrame(
                rows, columns=["id", "decode_ok", "error", "shape", "pixels"]
            )

    return blobs.select("id", "content").mapInPandas(_batches, schema=RESIZE_SCHEMA)


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


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("window_i", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("is_silence", T.BooleanType(), False),
    ]
)


def audio_energy_windows(
    blobs: DataFrame, frame: int = 4, silence_rms: float = 8192.0
) -> DataFrame:
    """Windowed energy extraction over PCM WAV payloads — the audio
    sibling of frame sampling: decode (pure-numpy RIFF walk), split the
    mono sample stream into non-overlapping ``frame``-sample windows
    (only FULL windows are emitted — the standard hop=frame framing; a
    trailing partial frame carries no comparable energy), and emit one
    row per (id, window) with its RMS and a silence flag. This is the
    shape voice-activity trimming and silence-stripping take in a
    training-data pipeline: decode + frame + feature ride ONE executor
    pass (mapInPandas), samples never cross a shuffle, and the output is
    a narrow relational table any filter can consume. Undecodable
    payloads are dropped here (the quarantine-channel variant is
    decode_real_features; this operator is the post-quarantine hot
    path)."""
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"id": [], "window_i": [], "n_samples": [], "rms": [], "is_silence": []}
            for _id, content in zip(pdf["id"], pdf["content"]):
                try:
                    _rate, samples = decode_wav(bytes(content or b""))
                except (NotImplementedError, ValueError, IndexError, EOFError):
                    continue
                mono = samples.reshape(-1).astype("float64")
                for w in range(len(mono) // frame):
                    seg = mono[w * frame : (w + 1) * frame]
                    rms = float(np.sqrt(np.mean(seg**2)))
                    out["id"].append(_id)
                    out["window_i"].append(w)
                    out["n_samples"].append(frame)
                    out["rms"].append(rms)
                    out["is_silence"].append(rms < silence_rms)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_batches, schema=AUDIO_WINDOW_SCHEMA)


_POW2_32 = None


def _pack_halves(bits) -> tuple[int, int]:
    """Pack a 0/1 int64 vector (≤64 bits, LSB-first, split at bit 32)
    into two 32-bit longs via one numpy dot against powers of two —
    bit-identical to the per-bit shift-add it replaces (the pure-python
    property tests pin the resulting hashes), but vectorized: the last
    per-row Python arithmetic in the fingerprint hot loops is gone."""
    global _POW2_32
    import numpy as np

    if _POW2_32 is None:
        _POW2_32 = np.int64(1) << np.arange(32, dtype=np.int64)
    n = len(bits)
    lo = int(bits[:32] @ _POW2_32[: min(32, n)])
    hi = int(bits[32:] @ _POW2_32[: n - 32]) if n > 32 else 0
    return lo, hi


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("h_lo", T.LongType(), True),
        T.StructField("h_hi", T.LongType(), True),
    ]
)


def image_ahash(blobs: DataFrame, hash_h: int = 8, hash_w: int = 8) -> DataFrame:
    """Perceptual average-hash (aHash) over the binary image column —
    the multimodal near-dup fingerprint: decode (REAL pure-numpy
    PPM/BMP raster decoder), nearest-neighbor resize to hash_h×hash_w,
    integer grayscale ((r+g+b)//3), then one bit per pixel set iff
    P·gray > Σgray (strict, all-integer — no float threshold, so the
    hash is bit-reproducible by any engine doing the same integer
    arithmetic, which is what the DuckDB oracle does). Brightness
    shifts, recompression artifacts and small crops move a few grays
    across the mean and flip a few bits; near-duplicate images land
    within small Hamming distance while unrelated images are ~32 bits
    apart — the property hamming_band_pairs exploits.

    The 64 bits are packed into TWO longs (h_lo = bits 0..31, h_hi =
    bits 32..63, pixel-row-major): 32-bit halves keep every downstream
    xor/bit_count in plain signed-64 arithmetic on BOTH engines (a full
    64-bit pack would overflow signed BIGINT at bit 63). Undecodable
    payloads are dropped (post-quarantine hot path — the error channel
    is decode_real_features).

    100 TB: decode + resize + hash ride ONE mapInPandas executor pass;
    rasters never cross a shuffle; the output is 3 longs per image."""
    import numpy as np

    n_px = hash_h * hash_w
    assert n_px == 64, "packing below assumes a 64-bit hash (8x8)"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"id": [], "h_lo": [], "h_hi": []}
            for _id, content in zip(pdf["id"], pdf["content"]):
                try:
                    img = decode_image(bytes(content or b""))
                except (NotImplementedError, ValueError, IndexError, EOFError):
                    continue
                small = resize_nn(img, hash_h, hash_w)
                gray = small.astype(np.int64).sum(axis=2) // 3  # (r+g+b)//3
                flat = gray.reshape(-1)
                s = int(flat.sum())
                bits = (n_px * flat > s).astype(np.int64)
                lo, hi = _pack_halves(bits)
                out["id"].append(_id)
                out["h_lo"].append(lo)
                out["h_hi"].append(hi)
            yield pd.DataFrame(out)

    return blobs.select("id", "content").mapInPandas(_batches, schema=AHASH_SCHEMA)


def audio_fingerprint(blobs: DataFrame, window: int = 2) -> DataFrame:
    """Energy-delta audio fingerprint — the audio member of the
    multimodal near-dup family (simplified Haitsma–Kalker 2002 shape:
    fingerprint bits are signs of energy differences between adjacent
    frames, which survive volume scaling, re-encoding noise and small
    edits far better than raw sample hashes): decode (REAL pure-numpy
    PCM16 RIFF walk), frame the mono stream into 64 non-overlapping
    ``window``-sample frames, per-frame integer energy Σs², then bit j
    (j = 0..62) set iff E[j+1] > E[j] (strict, all-integer — exactly
    reproducible by the DuckDB oracle), bit 63 fixed 0. Packed into two
    32-bit longs like image_ahash, so dedup.hamming_band_pairs consumes
    BOTH modalities' fingerprints unchanged.

    Clips shorter than 64 frames are dropped (no comparable
    fingerprint); longer clips fingerprint their first 64 frames — the
    production variant fingerprints every offset window for
    subsequence matching, same bits, more rows. One mapInPandas pass;
    samples never cross a shuffle — 3 longs per clip leave the
    executor."""
    import numpy as np

    n_frames = 64

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"id": [], "h_lo": [], "h_hi": []}
            for _id, content in zip(pdf["id"], pdf["content"]):
                try:
                    _rate, samples = decode_wav(bytes(content or b""))
                except (NotImplementedError, ValueError, IndexError, EOFError):
                    continue
                mono = samples.reshape(-1).astype(np.int64)
                if len(mono) < n_frames * window:
                    continue
                seg = mono[: n_frames * window].reshape(n_frames, window)
                e = (seg * seg).sum(axis=1)  # int64-exact
                bits = (e[1:] > e[:-1]).astype(np.int64)  # 63 comparisons
                lo, hi = _pack_halves(bits)
                out["id"].append(_id)
                out["h_lo"].append(lo)
                out["h_hi"].append(hi)
            yield pd.DataFrame(out)

    return blobs.select("id", "content").mapInPandas(_batches, schema=AHASH_SCHEMA)


FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("h_lo", T.LongType(), True),
        T.StructField("h_hi", T.LongType(), True),
    ]
)


def _p6_frame_bounds(content: bytes, pos: int) -> int:
    """Byte length of the P6 frame starting at ``pos`` (header tokens +
    raster), so a concatenated-frame stream can be walked frame by
    frame — offsets come from the SAME header parser decode_image uses
    (_parse_p6_header), so the walk and the per-frame decode can never
    disagree on where a raster ends. Raises ValueError on anything that
    isn't a P6 header."""
    w, h, _maxval, raster_offset = _parse_p6_header(content, pos)
    return (raster_offset - pos) + w * h * 3


def video_frame_hashes(blobs: DataFrame, hash_h: int = 8, hash_w: int = 8) -> DataFrame:
    """Per-frame perceptual hashes over a video payload — the video
    member of the multimodal near-dup family: the payload is walked
    frame by frame, each frame decoded with the REAL raster decoder and
    aHashed exactly like image_ahash (same integer threshold, same
    two-long packing), one output row per (id, frame_idx). Video-level
    near-dup is then a relational question — videos sharing ≥T frame
    hashes (the content-based-video-retrieval blocking shape) — that
    plain joins answer; no pairwise video comparison ever happens.

    Container honesty: this walks CONCATENATED P6 frames (raw
    uncompressed video — the one format needing no codec library, the
    decode_image contract). Compressed containers (MP4/WebM) require
    ffmpeg-class tooling; that integration point raises
    NotImplementedError inside decode_image and the payload is dropped
    like any undecodable row. One mapInPandas pass; rasters never cross
    a shuffle — (frame_idx, 2 longs) per frame leaves the executor."""
    import numpy as np

    n_px = hash_h * hash_w
    assert n_px == 64, "packing assumes a 64-bit hash (8x8)"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"id": [], "frame_idx": [], "h_lo": [], "h_hi": []}
            for _id, content in zip(pdf["id"], pdf["content"]):
                try:
                    raw = bytes(content or b"")
                    frames = []
                    pos = 0
                    while pos < len(raw):
                        ln = _p6_frame_bounds(raw, pos)
                        frames.append(decode_image(raw[pos : pos + ln]))
                        pos += ln
                except (NotImplementedError, ValueError, IndexError, EOFError):
                    continue
                for fi, img in enumerate(frames):
                    small = resize_nn(img, hash_h, hash_w)
                    gray = small.astype(np.int64).sum(axis=2) // 3
                    flat = gray.reshape(-1)
                    s = int(flat.sum())
                    bits = (n_px * flat > s).astype(np.int64)
                    lo, hi = _pack_halves(bits)
                    out["id"].append(_id)
                    out["frame_idx"].append(fi)
                    out["h_lo"].append(lo)
                    out["h_hi"].append(hi)
            yield pd.DataFrame(out)

    return blobs.select("id", "content").mapInPandas(_batches, schema=FRAME_HASH_SCHEMA)
