"""Multimodal (image/audio/video) column handling.

Media travel as opaque ``BINARY`` columns + typed metadata structs; all
compute-heavy steps run as Arrow-batched ``mapInPandas`` stages so the scan
-> decode -> feature chain crosses the Python boundary exactly once per
batch. The codec layer (Pillow/ffmpeg/soundfile) is NOT available in this
container, so the decode kernels are gated: ``decoder="stub"`` (default)
produces a deterministic fake decode from the bytes themselves — the Spark
plumbing (schemas, batching, partitioning, UDF signatures) is real and
tested; swapping in a real codec changes ONE inner function.

Schemas:
  MEDIA_SCHEMA    asset_id, kind(image|audio|video), content BINARY,
                  meta STRUCT<width,height,sample_rate,duration_ms,codec>
  image features  byte histogram (real), fake-decode mean/std per channel
  audio features  frame energies over fixed windows of the raw bytes
  video sampling  frame offsets at a target fps from duration metadata
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_STRUCT = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("content", BinaryType()),
        StructField("meta", META_STRUCT),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", DoubleType()),
        StructField("histogram", ArrayType(LongType())),  # 16 byte-buckets
        StructField("channel_mean", ArrayType(DoubleType())),  # 3 channels
        StructField("channel_std", ArrayType(DoubleType())),
    ]
)

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame_energy", ArrayType(DoubleType())),
        StructField("peak_frame", IntegerType()),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("offset_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def _fake_decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a codec: tile the raw bytes into an
    (h, w, 3) uint8 array. Replace with PIL.Image.open in production."""
    need = width * height * 3
    buf = np.frombuffer(content, dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(need / len(buf)))
    return np.tile(buf, reps)[:need].reshape(height, width, 3)


def decode_image_features(
    media: DataFrame, decoder: str = "stub", hist_buckets: int = 16
) -> DataFrame:
    """image rows -> per-asset features. ``decoder='real'`` requires Pillow
    (not in this container) and raises NotImplementedError."""
    if decoder not in ("stub", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "real":  # pragma: no cover — codec libs absent by design
        raise NotImplementedError(
            "real image decoding needs Pillow; this container ships none "
            "(BASELINE task: stub the decode, keep the plumbing real)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["asset_id"].to_numpy()
            contents = [bytes(c or b"") for c in pdf["content"]]
            metas = list(pdf["meta"])
            n_rows = len(contents)
            # Histogram + entropy vectorized across the WHOLE batch: one
            # concatenated byte buffer, one bincount keyed by
            # (row_index * buckets + byte_bucket) — no per-row numpy calls.
            lens = np.array([len(c) for c in contents], dtype=np.int64)
            if lens.sum():
                cat = np.frombuffer(b"".join(contents), dtype=np.uint8)
                row_of = np.repeat(np.arange(n_rows), lens)
                bucket = cat.astype(np.int64) * hist_buckets // 256
                hists = np.bincount(
                    row_of * hist_buckets + bucket,
                    minlength=n_rows * hist_buckets,
                ).reshape(n_rows, hist_buckets)
            else:
                hists = np.zeros((n_rows, hist_buckets), dtype=np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                p = hists / np.maximum(lens, 1)[:, None]
                logp = np.where(p > 0, np.log2(np.where(p > 0, p, 1.0)), 0.0)
            ents = np.round(-(p * logp).sum(axis=1), 6)
            out = []
            # Per-row loop only for the decode itself (inherent to a codec).
            for i in range(n_rows):
                meta = metas[i]
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                img = _fake_decode_image(contents[i], w, h).astype(np.float64)
                out.append(
                    (
                        int(ids[i]),
                        int(lens[i]),
                        float(ents[i]),
                        hists[i].astype(np.int64).tolist(),
                        np.round(img.mean(axis=(0, 1)), 6).tolist(),
                        np.round(img.std(axis=(0, 1)), 6).tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("asset_id", "content", "meta")
        .mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),  # raw HxWx3 uint8, row-major
    ]
)


def resize_images(
    media: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    decoder: str = "stub",
) -> DataFrame:
    """image rows -> fixed-size raw pixel buffers (the resize step of a
    training-data image pipeline; downstream consumers get uniform
    ``target_h x target_w x 3`` tensors regardless of source size).

    The stub decodes via ``_fake_decode_image`` and resamples with
    vectorized nearest-neighbor indexing (pure numpy — the same
    index-grid code drives a real decoder's output; swapping in
    Pillow changes only the decode call).
    """
    if decoder == "real":  # pragma: no cover — codec libs absent by design
        raise NotImplementedError("real image decoding needs Pillow")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                img = _fake_decode_image(bytes(content or b""), w, h)
                # nearest-neighbor grid: source index per target pixel
                ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                resized = img[ys[:, None], xs[None, :], :]
                out.append(
                    (asset_id, target_w, target_h, resized.tobytes())
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("asset_id", "content", "meta")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )


def audio_frame_energy(
    media: DataFrame, frame_bytes: int = 1024, decoder: str = "stub"
) -> DataFrame:
    """audio rows -> fixed-window energy profile over the raw byte stream
    (stub treats bytes as unsigned 8-bit PCM; a real decoder would emit
    float PCM via soundfile/ffmpeg with identical downstream shape)."""
    if decoder == "real":  # pragma: no cover
        raise NotImplementedError("real audio decoding needs soundfile/ffmpeg")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                buf = np.frombuffer(
                    bytes(content or b""), dtype=np.uint8
                ).astype(np.float64)
                if len(buf) == 0:
                    out.append((asset_id, 0, [], None))
                    continue
                n_frames = int(np.ceil(len(buf) / frame_bytes))
                pad = n_frames * frame_bytes - len(buf)
                x = np.pad(buf - 128.0, (0, pad)).reshape(n_frames, frame_bytes)
                energy = np.round(np.sqrt((x * x).mean(axis=1)), 6)
                out.append(
                    (
                        asset_id,
                        n_frames,
                        energy.tolist(),
                        int(energy.argmax()),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("asset_id", "content")
        .mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
    )


def sample_video_frames(
    media: DataFrame, fps: float = 1.0, decoder: str = "stub"
) -> DataFrame:
    """video rows -> one output row per sampled frame at ``fps`` using the
    duration metadata; the stub frame payload is the byte-slice at the
    offset (a real decoder would seek+decode at offset_ms)."""
    if decoder == "real":  # pragma: no cover
        raise NotImplementedError("real frame extraction needs ffmpeg")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                duration = int(meta["duration_ms"] or 0)
                content = bytes(content or b"")
                if duration <= 0 or not content:
                    continue
                # fps > 1000 would truncate to step 0 (range() raises);
                # clamp to the 1 ms metadata resolution
                step_ms = max(1, round(1000 / fps))
                for i, off in enumerate(range(0, duration, step_ms)):
                    # stub "frame": 64-byte slice proportional to position
                    pos = int(len(content) * off / duration)
                    out.append((asset_id, i, off, content[pos : pos + 64]))
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("asset_id", "content", "meta")
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )


def generate_media_fixture(spark, n_assets: int = 60, seed: int = 42):
    """Deterministic synthetic media table (no external data)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_assets):
        kind = kinds[i % 3]
        size = int(rng.randint(200, 4000))
        content = bytes(rng.randint(0, 256, size=size, dtype=np.int64).astype("uint8"))
        meta = {
            "width": int(rng.randint(4, 64)) if kind == "image" else None,
            "height": int(rng.randint(4, 64)) if kind == "image" else None,
            "sample_rate": 8000 if kind == "audio" else None,
            "duration_ms": int(rng.randint(1000, 10000)) if kind == "video" else None,
            "codec": {"image": "fake/raw", "audio": "fake/pcm8", "video": "fake/mjpeg"}[kind],
        }
        rows.append((i, kind, content, meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
