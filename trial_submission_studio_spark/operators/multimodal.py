"""Multimodal (image/audio/video) column operators — north-star
extension (BASELINE.json).

Design for 100 TB: media lives as opaque ``binary`` columns (or
object-store URIs) beside typed metadata columns; every decode /
feature-extract / resize / frame-sample step is an Arrow-batched
``mapInPandas`` operator so bytes stay in columnar batches end to
end and partitioning is inherited from the table.

The actual codecs (PIL/torchaudio/ffmpeg) are NOT present in this
environment, so the decode kernels are stubbed: with
``deterministic_fake=True`` they produce seeded, reproducible
features (so the Spark-side plumbing — schema, batching, partition
behavior — is fully testable); otherwise they raise
``NotImplementedError`` marking the integration point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema for a media table: binary payload + typed metadata
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)

IMAGE_FEATURE_SCHEMA = "media_id long, feat array<float>, feat_dim int"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_png binary"


def _make_fake_feature():
    """Deterministic stand-in for an image-embedding kernel: bytes →
    seeded feature vector (stable across runs/partitions). Built as a
    closure so cloudpickle ships it by value — executors cannot
    import this package (the host app controls PYTHONPATH)."""

    def fake_feature(payload: bytes | None, dim: int) -> list[float]:
        import hashlib
        import struct

        h = hashlib.sha256(payload or b"").digest()
        out: list[float] = []
        i = 0
        while len(out) < dim:
            block = hashlib.sha256(h + struct.pack("<I", i)).digest()
            for j in range(0, 32, 4):
                if len(out) >= dim:
                    break
                out.append(struct.unpack("<I", block[j : j + 4])[0] / 2**32)
            i += 1
        return out

    return fake_feature


_fake_feature = _make_fake_feature()


def image_features(
    df: DataFrame,
    dim: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode + embed images → (media_id, feat, feat_dim).

    Real kernel: PIL decode + a vision embedding, batch-at-a-time in
    Arrow. Stubbed here (see module docstring).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image decode requires PIL/torchvision — not in this "
                    "environment; pass deterministic_fake=True to test plumbing"
                )
            feats = [_fake_feature(p, dim) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feat": feats,
                    "feat_dim": [dim] * len(pdf),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Video → sampled frames (media_id, frame_idx, frame_png).

    Real kernel: ffmpeg frame extraction. The fake emits one empty
    marker frame per sampling point so row-explosion semantics and
    output partitioning are testable.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg — not in this environment; "
                    "pass deterministic_fake=True to test plumbing"
                )
            ids, idxs, frames = [], [], []
            for mid, dur in zip(pdf[id_col], pdf[duration_col]):
                n = max(int((dur or 0) // every_ms), 1)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b"\x89PNG-fake-" + str(i).encode())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_png": frames})

    return df.select(id_col, duration_col, payload_col).mapInPandas(
        kernel, FRAME_SAMPLE_SCHEMA
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Expression-only metadata profile of a media table (no decode):
    per kind: count, total/avg payload bytes, avg duration."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.round(F.avg(F.length("payload")), 2).alias("avg_bytes"),
        F.round(F.avg("duration_ms"), 2).alias("avg_duration_ms"),
    )
