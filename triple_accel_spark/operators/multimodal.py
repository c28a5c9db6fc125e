"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partition-aware
``mapInPandas`` operators — is real and tested. Decoding has three
tiers:

* ``decode_ppm``        — REAL, dependency-free binary-PPM (P6)
                          parser: header -> (h, w, 3) uint8 pixels.
                          Runs everywhere, including this sandbox.
* ``decode_image_real`` — dispatches: P6 payloads decode via
                          ``decode_ppm``; anything else needs Pillow
                          (gated at call time — the sandbox has no
                          imaging libs, so non-PPM formats raise
                          ``NotImplementedError`` here and go live
                          automatically where Pillow exists).
* ``fake_feature``      — deterministic byte-histogram stand-in for
                          keeping opaque-payload pipelines testable.

``decode_stats`` runs a real decoder over a media table and emits
decoded-pixel statistics with exact integer/double semantics, giving
the decode path a DuckDB-verifiable driver query on PPM payloads
synthesized from the documents table.
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


def decode_ppm(content: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) image to an ``(h, w, 3)`` uint8 pixel
    array. Dependency-free (header parse + one ``np.frombuffer``), so
    the REAL decode -> feature path is exercisable in any environment.
    Supports the standard header grammar: ``P6``, whitespace-separated
    width/height/maxval with ``#`` comments, maxval <= 255."""
    if not content.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize the header: 4 tokens (magic, w, h, maxval); '#' starts a
    # comment running to end of line; ONE whitespace byte after maxval
    # precedes the raw pixel block
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if i < len(content) and content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        tokens.append(content[i:j])
        i = j
    i += 1  # the single whitespace separator before the raster
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    raster = np.frombuffer(content, dtype=np.uint8, count=n, offset=i)
    return raster.reshape(h, w, 3)


def decode_image_real(content: bytes) -> np.ndarray:
    """Real decoder: P6/PPM payloads decode via the built-in
    dependency-free parser; every other format needs Pillow, gated at
    call time (this sandbox has no imaging libs — the try-import keeps
    the module importable everywhere while going live automatically
    where Pillow exists)."""
    if content.startswith(b"P6"):
        return decode_ppm(content)
    try:
        import io

        from PIL import Image  # optional dependency, gated at call time
    except ImportError as e:
        raise NotImplementedError(
            "non-PPM image decoding requires Pillow, which is not "
            "installed; inject a decoder via extract_features(decoder=...)"
        ) from e
    return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))


def image_feature_real(
    content: bytes, dim: int = 16, normalize: bool = True
) -> np.ndarray:
    """Real image feature: per-channel-folded intensity histogram of
    the DECODED pixels, unit-norm by default (same contract as
    ``fake_feature``: deterministic float32[dim]).

    ``normalize=False`` returns the raw integer counts (exact in
    float32 — counts are far below 2^24), which is what lets the
    decode->feature path be hash-oracled bit-for-bit in SQL: the
    normalized form divides by a float32 sqrt that a double-precision
    SQL engine cannot reproduce bit-identically, while integer counts
    compare exactly (see the ``media_feature_ppm`` driver query; the
    normalized==counts/norm identity is pytest-asserted)."""
    px = decode_image_real(content).reshape(-1)
    hist = np.bincount(px.astype(np.int64) % dim, minlength=dim).astype(np.float32)
    if not normalize:
        return hist
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


def encode_ppm(pixels: np.ndarray, comment: str | None = None) -> bytes:
    """Inverse of ``decode_ppm`` (test/synthesis helper): ``(h, w, 3)``
    uint8 pixels -> binary P6 bytes."""
    h, w = pixels.shape[0], pixels.shape[1]
    header = f"P6\n{'# ' + comment + chr(10) if comment else ''}{w} {h}\n255\n"
    return header.encode("ascii") + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


STATS_SCHEMA = (
    "media_id bigint, kind string, width bigint, height bigint, "
    "n_px bigint, mean_px double"
)


def decode_stats(
    media: DataFrame, decoder: Callable[[bytes], np.ndarray] | None = None
) -> DataFrame:
    """Decoded-pixel statistics via a REAL decoder (default
    ``decode_image_real``): ``(media_id, kind, width, height, n_px,
    mean_px)`` where ``n_px`` counts raw pixel bytes and ``mean_px`` is
    their mean computed as an exact-integer sum divided once in double
    precision — deterministic and replayable in SQL, which is what
    makes the decode path DuckDB-oracle-able on synthesized PPM
    payloads (see the ``media_decode_ppm`` driver query)."""
    dec = decoder or decode_image_real

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "media_id", "kind", "width", "height", "n_px", "mean_px")}
            for mid, kind, b in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                px = dec(bytes(b))
                n = int(px.size)
                s = int(px.astype(np.int64).sum())
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["width"].append(px.shape[1])
                rows["height"].append(px.shape[0])
                rows["n_px"].append(n)
                rows["mean_px"].append(s / n if n else 0.0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, STATS_SCHEMA)


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
