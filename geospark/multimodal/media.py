"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Spark-side plumbing (schema, batching, partitioning)
fully real and the codec step stubbed (no image/audio libs in this
container — decode raises NotImplementedError unless the deterministic
fake codec is selected).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

# deterministic fake payload header: b"FAKE" + u32 width + u32 height
_FAKE_MAGIC = b"FAKE"


def fake_image_payload(media_id: int, width: int, height: int) -> bytes:
    body = hashlib.sha256(f"img-{media_id}".encode()).digest()
    return _FAKE_MAGIC + struct.pack("<II", width, height) + body


def decode_image(payload: bytes, codec: str = "stub") -> np.ndarray:
    """Decode an image payload to HxWx3 uint8.

    codec='stub' raises NotImplementedError (real decoders aren't in
    this container); codec='fake' decodes the deterministic fake
    format so the distributed plumbing is testable end-to-end.
    """
    if codec == "fake":
        if payload[:4] != _FAKE_MAGIC:
            raise ValueError("not a fake payload")
        w, h = struct.unpack_from("<II", payload, 4)
        seed = np.frombuffer(payload[12:44], dtype=np.uint8).astype(np.uint32)
        rows = (np.arange(h, dtype=np.uint32)[:, None] * 31) & 0xFF
        cols = (np.arange(w, dtype=np.uint32)[None, :] * 17) & 0xFF
        base = (rows + cols + int(seed.sum())) & 0xFF
        return np.stack([base, (base * 3) & 0xFF, (base * 7) & 0xFF], axis=-1).astype(np.uint8)
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment"
    )


_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mean_rgb", ArrayType(DoubleType())),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def image_features(media: DataFrame, codec: str = "stub", batch_limit: int = 1024) -> DataFrame:
    """Decode + feature-extract per Arrow batch (mapInPandas).  The
    batch shape / schema / partitioning is the production path; only
    the pixel decode is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, ws, hs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload, codec=codec)
                ids.append(mid)
                feats.append(img.reshape(-1, 3).mean(axis=0).tolist())
                hs.append(img.shape[0])
                ws.append(img.shape[1])
            yield pd.DataFrame(
                {"media_id": ids, "mean_rgb": feats, "width": ws, "height": hs}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=_FEAT_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int, codec: str = "stub") -> DataFrame:
    """Resize pipeline stage: same plumbing, stubbed resample."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload, codec=codec)
                ys = (np.linspace(0, img.shape[0] - 1, height)).astype(int)
                xs = (np.linspace(0, img.shape[1] - 1, width)).astype(int)
                small = img[ys][:, xs]
                out.append((mid, small.tobytes()))
            yield pd.DataFrame(out, columns=["media_id", "pixels"])

    return media.select("media_id", "payload").mapInPandas(
        run,
        schema=StructType(
            [StructField("media_id", LongType()), StructField("pixels", BinaryType())]
        ),
    )


def generate_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                w = 32 + (i * 7 + seed) % 96
                h = 32 + (i * 13 + seed) % 64
                rows.append(
                    (
                        int(i),
                        "image",
                        "image/fake",
                        fake_image_payload(int(i), int(w), int(h)),
                        int(w),
                        int(h),
                        0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "payload", "width", "height", "duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# audio: opaque payload + typed metadata; decode stubbed, fake codec real
# ---------------------------------------------------------------------------

_FAKE_AUDIO_MAGIC = b"FAKA"


def fake_audio_payload(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    body = hashlib.sha256(f"aud-{media_id}".encode()).digest()
    return _FAKE_AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + body


def decode_audio(payload: bytes, codec: str = "stub") -> tuple:
    """Decode an audio payload to (sample_rate, int16 mono samples).

    codec='fake': sample t = ((t*37 + S) % 2048) - 1024 with
    S = Σ sha256('aud-id') bytes — integer arithmetic, engine-portable.
    codec='stub' raises (no audio libs in this container)."""
    if codec == "fake":
        if payload[:4] != _FAKE_AUDIO_MAGIC:
            raise ValueError("not a fake audio payload")
        sr, n = struct.unpack_from("<II", payload, 4)
        seed = int(np.frombuffer(payload[12:44], dtype=np.uint8).astype(np.uint32).sum())
        t = np.arange(n, dtype=np.int64)
        samples = ((t * 37 + seed) % 2048) - 1024
        return sr, samples.astype(np.int16)
    raise NotImplementedError(
        "audio decode requires a codec library not present in this environment"
    )


_AUDIO_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("mean_abs", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_features(media: DataFrame, codec: str = "stub") -> DataFrame:
    """Per-clip features over mapInPandas — mean |amplitude| and
    zero-crossing count (sign-change transitions, zeros non-crossing).
    Same production plumbing as image_features; only decode is fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, s = decode_audio(payload, codec=codec)
                s64 = s.astype(np.int64)
                sign = np.sign(s64)
                nz = sign[sign != 0]
                zc = int(np.count_nonzero(nz[1:] != nz[:-1])) if len(nz) > 1 else 0
                rows.append((int(mid), int(sr), len(s), float(np.abs(s64).mean()), zc))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "mean_abs", "zero_crossings"],
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=_AUDIO_FEAT_SCHEMA)


# ---------------------------------------------------------------------------
# video: frame sampling (every_n) + per-frame features
# ---------------------------------------------------------------------------

_FAKE_VIDEO_MAGIC = b"FAKV"


def fake_video_payload(media_id: int, width: int, height: int, n_frames: int) -> bytes:
    body = hashlib.sha256(f"vid-{media_id}".encode()).digest()
    return _FAKE_VIDEO_MAGIC + struct.pack("<III", width, height, n_frames) + body


def decode_frame(payload: bytes, frame_idx: int, codec: str = "stub") -> np.ndarray:
    """Decode ONE frame to HxW luma uint8.  codec='fake': pixel (r,c)
    of frame f = ((r*31)%256 + (c*17)%256 + f*101 + S) % 256, the image
    fake pattern shifted per frame."""
    if codec == "fake":
        if payload[:4] != _FAKE_VIDEO_MAGIC:
            raise ValueError("not a fake video payload")
        w, h, nf = struct.unpack_from("<III", payload, 4)
        if not (0 <= frame_idx < nf):
            raise IndexError(f"frame {frame_idx} out of range 0..{nf-1}")
        seed = int(np.frombuffer(payload[16:48], dtype=np.uint8).astype(np.uint32).sum())
        rows = (np.arange(h, dtype=np.int64)[:, None] * 31) % 256
        cols = (np.arange(w, dtype=np.int64)[None, :] * 17) % 256
        return ((rows + cols + frame_idx * 101 + seed) % 256).astype(np.uint8)
    raise NotImplementedError(
        "video decode requires a codec library not present in this environment"
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 10, codec: str = "stub") -> DataFrame:
    """Sample every_n-th frame of each clip and emit per-frame features
    (one output row per sampled frame — the fan-out happens INSIDE the
    python stage, so a 1 B-clip table never materializes a per-frame
    exchange before sampling; at 100 TB this is one scan, no shuffle)."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if codec == "fake":
                    w, h, nf = struct.unpack_from("<III", bytes(payload), 4)
                else:  # pragma: no cover - stub metadata probe
                    raise NotImplementedError("video decode requires a codec library")
                for f in range(0, nf, every_n):
                    frame = decode_frame(bytes(payload), f, codec=codec)
                    rows.append(
                        (int(mid), f, w, h, float(frame.astype(np.int64).mean()))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "width", "height", "mean_luma"]
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=_FRAME_SCHEMA)
