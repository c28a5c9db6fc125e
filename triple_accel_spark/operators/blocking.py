"""Blocking-key generation: q-gram shingles, MinHash band keys, and
simple SQL-expressible prefix keys.

All key generation is pure Column expressions (JVM-side, whole-stage
codegen, zero Python): shingles via ``sequence``+``substring`` inside
``transform``, MinHash via ``xxhash64(gram, seed)`` folded with
``array_min``, band keys via ``xxhash64`` over the banded signature
slice. A conversation lands in ``num_bands`` blocks; two conversations
collide in a band with probability ``s^band_size`` for Jaccard
similarity ``s`` — the standard LSH S-curve, tuned for high recall at
the 0.99-F1 operating point.

At 10^12-turn scale this stage is a narrow projection followed by one
explode — no shuffle until the pair join groups by block key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(col, lowercase: bool = True) -> Column:
    """Canonicalize text for blocking (NOT for scoring — scoring uses
    raw text): lowercase + collapse whitespace runs."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.regexp_replace(c, r"\s+", " ")


def qgrams(col, q: int = 4) -> Column:
    """Array of overlapping q-grams of the column (empty-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.when(
        n >= q,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(q - 1)),
            lambda i: c.substr(i, F.lit(q)),
        ),
    ).otherwise(F.array(c))


def minhash_signature(grams: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: per seed, the minimum ``xxhash64(gram, seed)``
    over the shingle set (array<bigint>, length ``num_hashes``)."""
    return F.array(
        *[
            F.array_min(F.transform(grams, lambda g: F.xxhash64(g, F.lit(s))))
            for s in range(num_hashes)
        ]
    )


def minhash_band_keys(
    signature: Column, num_bands: int, band_size: int
) -> Column:
    """LSH band keys: hash each ``band_size`` slice of the signature;
    array<bigint> of length ``num_bands``. Band index is mixed in so
    keys from different bands never collide."""
    keys = []
    for b in range(num_bands):
        sl = F.slice(signature, b * band_size + 1, band_size)
        keys.append(F.xxhash64(F.lit(b), F.concat_ws("_", F.transform(sl, lambda x: x.cast("string")))))
    return F.array(*keys)


def with_minhash_blocks(
    df: DataFrame,
    text_col: str = "doc",
    q: int = 4,
    num_hashes: int = 16,
    num_bands: int = 8,
    lowercase: bool = True,
    out_col: str = "block_key",
) -> DataFrame:
    """Explode each row into ``num_bands`` rows with a ``block_key``.

    ``num_hashes`` must equal ``num_bands * band_size``.
    """
    if num_hashes % num_bands:
        raise ValueError("num_hashes must be divisible by num_bands")
    band_size = num_hashes // num_bands
    sig = minhash_signature(qgrams(normalized_text(text_col, lowercase), q), num_hashes)
    keys = minhash_band_keys(sig, num_bands, band_size)
    return df.withColumn(out_col, F.explode(keys))


def with_prefix_blocks(
    df: DataFrame,
    text_col: str = "doc",
    prefix_len: int = 8,
    lowercase: bool = True,
    out_col: str = "block_key",
) -> DataFrame:
    """Simple deterministic prefix block key (SQL-expressible; used for
    DuckDB-verifiable oracle queries and as a cheap sorted-neighborhood
    style key)."""
    key = F.substring(normalized_text(text_col, lowercase), 1, prefix_len)
    return df.withColumn(out_col, key)
