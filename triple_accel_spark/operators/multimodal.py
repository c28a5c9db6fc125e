"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partition-aware
``mapInPandas`` operators — is real and tested; the actual media
decoding is STUBBED (the sandbox image has no image/audio libs): the
default decoder is a deterministic fake that derives pseudo-features
from the bytes, and ``decode_image_real`` raises ``NotImplementedError``
with the intended implementation documented. Swap the decoder callable
to go live.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes int, feature array<float>"


def decode_image_real(content: bytes) -> np.ndarray:
    """Real decoder: decodes to an RGB pixel array via Pillow when it
    is importable at runtime; raises ``NotImplementedError`` otherwise
    (this sandbox has no imaging libs — the try-import keeps the module
    importable everywhere while going live automatically where Pillow
    exists)."""
    try:
        import io

        from PIL import Image  # optional dependency, gated at call time
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "inject a decoder via extract_features(decoder=...)"
        ) from e
    return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))


def image_feature_real(content: bytes, dim: int = 16) -> np.ndarray:
    """Real image feature: per-channel-folded mean-intensity histogram
    of the decoded pixels, unit-norm (same contract as
    ``fake_feature``: deterministic float32[dim])."""
    px = decode_image_real(content).reshape(-1)
    hist = np.bincount(px.astype(np.int64) % dim, minlength=dim).astype(np.float32)
    n = np.linalg.norm(hist)
    return hist / n if n else hist


def fake_feature(content: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature: folded byte histogram, unit-norm.
    Keeps the pipeline end-to-end testable without media libs."""
    arr = np.frombuffer(content or b"\0", dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    n = np.linalg.norm(hist)
    return hist / n if n else hist


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    dim: int = 16,
) -> DataFrame:
    """Arrow-batched feature extraction over a binary media column.

    ``mapInPandas`` keeps whole partitions streaming through Python in
    Arrow batches — the shape a real decode/resize/frame-sample stage
    needs (one task per partition, no per-row serialization)."""
    dec = decoder or (lambda b: fake_feature(b, dim))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if b is None else dec(bytes(b)).astype(np.float32).tolist()
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if b is None else len(b) for b in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, int(rng.integers(64, 512)), dtype=np.uint8)
        rows.append(
            (
                i,
                kind,
                bytes(payload.tobytes()),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 1024)),
                int(rng.integers(16, 1024)),
                int(rng.integers(100, 60000)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
