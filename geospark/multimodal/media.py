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
