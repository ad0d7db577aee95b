"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow batch shapes, UDF
signatures) is real and tested; the actual media decode is STUBBED because
this container has no image/audio libraries — ``decode_stub`` raises
``NotImplementedError`` for real decoding and provides a deterministic fake
(seeded from the payload bytes) so downstream feature plumbing is exercised
end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, modality string, payload binary, "
    "meta map<string,string>"
)

FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes int, feature array<float>, "
    "decoder string"
)

MODALITIES = ("image", "audio", "video")


def synth_assets(spark: SparkSession, n: int = 300, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets (no media libs involved)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                mod = MODALITIES[int(i) % len(MODALITIES)]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (
                    2 + int(i) % 5
                )
                rows.append(
                    {
                        "asset_id": int(i),
                        "modality": mod,
                        "payload": payload,
                        "meta": {
                            "codec": {"image": "png", "audio": "wav", "video": "mp4"}[mod],
                            "n_bytes": str(len(payload)),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).repartition(8).mapInPandas(gen, schema=ASSET_SCHEMA)


def decode_stub(payload: bytes, modality: str, real: bool = False) -> np.ndarray:
    """STUB decode: the real path (``real=True``) would use PIL/librosa/ffmpeg
    — not present in this container."""
    if real:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not in this container"
        )
    # deterministic fake: 16-dim feature from payload bytes
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32) / 255.0)


def extract_features(assets: DataFrame) -> DataFrame:
    """Feature extraction over Arrow batches (mapInPandas: 1 row -> 1 row,
    but batch-vectorized; the pattern for decode/resize/frame-sample)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m).tolist()
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                    "decoder": "stub-sha256",
                }
            )

    return assets.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: 1 row -> N rows fan-out via posexplode
    over a (stubbed) frame-index sequence derived from metadata."""
    n_frames = (F.length("payload") / F.lit(32)).cast("int")
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.posexplode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("sample_idx", "frame_no"),
        )
    )
