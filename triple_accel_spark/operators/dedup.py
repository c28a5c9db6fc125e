"""Large-scale corpus deduplication operators.

The building blocks a training-data pipeline needs over a document
table (``doc_id, text``):

* ``exact_duplicates``      — hash-groupBy on a content digest.
* ``minhash_lsh_duplicates``— shingle -> MinHash -> banded LSH ->
                              bucket self-join -> verified Jaccard.
* ``simhash``               — 64-bit SimHash fingerprint column (pure
                              Column expressions; Hamming-ball search
                              via the engine's hamming kernel).
* ``ngram_jaccard``         — exact n-gram Jaccard for a pair frame.
* ``embedding_near_duplicates`` — cosine near-dup over a vector column.

All hot paths are built-in Column expressions (JVM, codegen); only the
verified-Jaccard option touches arrays, still JVM-side via
``array_intersect``/``array_union``. Designed so the candidate
generation is the only shuffle and it is keyed by LSH bucket (bounded
skew; cap + salt reuse ``pairs.candidate_pairs``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from triple_accel_spark.operators.blocking import normalized_text, qgrams
from triple_accel_spark.operators.pairs import candidate_pairs


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical documents: ``(digest, n_copies, ids)``.

    One map-side-combinable aggregation on a fixed-width digest — the
    canonical first pass at any corpus scale."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .where(F.col("n_copies") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical-content group."""
    from pyspark.sql import Window

    win = Window.partitionBy(F.md5(F.col(text_col)))
    return df.withColumn("_keep", F.min(F.col(id_col)).over(win)).where(
        F.col(id_col) == F.col("_keep")
    ).drop("_keep")


def minhash_lsh_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q: int = 5,
    num_hashes: int = 32,
    num_bands: int = 8,
    jaccard_threshold: float = 0.7,
    max_block_size: int | None = 5000,
) -> DataFrame:
    """Near-duplicate pairs by MinHash LSH, verified with exact q-gram
    Jaccard: ``(id_a, id_b, jaccard)``.

    Band collision probability for Jaccard ``s`` is
    ``1 - (1 - s^(num_hashes/num_bands))^num_bands`` — defaults give
    >99% recall at s >= 0.7."""
    if num_hashes % num_bands:
        raise ValueError("num_hashes must be divisible by num_bands")
    band_size = num_hashes // num_bands
    norm = normalized_text(text_col)
    base = df.select(F.col(id_col).alias("rid"), norm.alias("_t"))
    n = F.length("_t")
    # ONE explode + ONE aggregation produces both the minhash signature
    # (band keys) and the doc's hashed gram SET used for exact-Jaccard
    # verification — grams are 64-bit hashes, so set intersections are
    # long-array ops instead of string-array ops (~10x cheaper), and
    # the band self-join shuffles bare ids only
    gram_rows = base.select(
        "rid",
        F.explode(
            F.sequence(F.lit(1), F.greatest(n - F.lit(q - 1), F.lit(1)))
        ).alias("_i"),
        "_t",
    ).select("rid", F.expr(f"substring(_t, _i, {q})").alias("_g"))
    per_doc = gram_rows.groupBy("rid").agg(
        *[
            F.min(F.xxhash64("_g", F.lit(s))).alias(f"_h{s}")
            for s in range(num_hashes)
        ],
        F.collect_set(F.xxhash64("_g", F.lit(-1))).alias("gset"),
    ).persist()
    bands = []
    for b in range(num_bands):
        cols = [F.col(f"_h{i}") for i in range(b * band_size, (b + 1) * band_size)]
        bands.append(F.xxhash64(F.lit(b), *cols))
    blocked = per_doc.select(
        "rid", F.explode(F.array(*bands)).alias("block_key")
    )
    pairs = candidate_pairs(
        blocked,
        id_col="rid",
        block_col="block_key",
        payload_cols=(),
        max_block_size=max_block_size,
    )
    gsets = per_doc.select("rid", "gset")
    pairs = (
        pairs.join(gsets.withColumnRenamed("rid", "id_a"), "id_a")
        .withColumnRenamed("gset", "gset_a")
        .join(gsets.withColumnRenamed("rid", "id_b"), "id_b")
        .withColumnRenamed("gset", "gset_b")
    )
    inter = F.size(F.array_intersect("gset_a", "gset_b"))
    union = F.size(F.array_union("gset_a", "gset_b"))
    return (
        pairs.withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
                F.lit(1.0)
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_near(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q: int = 5,
    num_hashes: int = 32,
    num_bands: int = 8,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Keep one representative (min id) per NEAR-duplicate group: the
    standard training-corpus dedup endpoint. Composition: MinHash-LSH
    candidate pairs -> verified Jaccard edges -> connected components
    -> keep each component's minimum id (deterministic, idempotent)."""
    from triple_accel_spark.operators.clustering import connected_components

    edges = minhash_lsh_duplicates(
        df, text_col, id_col, q=q, num_hashes=num_hashes,
        num_bands=num_bands, jaccard_threshold=jaccard_threshold,
    )
    labels = connected_components(edges.select("id_a", "id_b"))
    drop = labels.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def simhash64(text_col, q: int = 4) -> Column:
    """64-bit SimHash of the q-gram multiset, as a bigint Column.

    Per bit b: sign of sum over grams of (bit b of xxhash64(gram)),
    folded JVM-side with ``aggregate`` over the gram array — no UDF."""
    grams = qgrams(normalized_text(text_col), q)
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    bits = []
    for b in range(64):
        # +1 when bit set, -1 otherwise; sign of the sum is the fingerprint bit
        contrib = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b if b < 63 else -(2**63))) != 0, 1).otherwise(-1),
        )
        bit = F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bits.append(F.shiftleft(bit, b) if b else bit)
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def ngram_jaccard(
    pairs: DataFrame, text_a: str = "text_a", text_b: str = "text_b", n: int = 3
) -> DataFrame:
    """Exact character n-gram Jaccard similarity for a pair frame."""
    ga = F.array_distinct(qgrams(F.col(text_a), n))
    gb = F.array_distinct(qgrams(F.col(text_b), n))
    inter = F.size(F.array_intersect(ga, gb))
    union = F.size(F.array_union(ga, gb))
    return pairs.withColumn(
        "jaccard",
        F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
            F.lit(1.0)
        ),
    )


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    max_block_size: int | None = 20000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    Sign-bucket the vectors with ``n_planes`` deterministic hyperplanes
    (one bigint bucket key), self-join within buckets, verify exact
    cosine JVM-side. Collision probability for angle θ is
    ``(1 - θ/π)^n_planes`` — near-duplicates (θ≈0) almost surely
    collide; distant vectors are pruned."""
    from triple_accel_spark.operators.similarity import (
        cosine_expr,
        hyperplane_bucket,
    )

    base = df.select(
        F.col(id_col).alias("rid"), F.col(vec_col).alias("vec")
    ).withColumn("block_key", hyperplane_bucket(F.col("vec"), n_planes, seed))
    pairs = candidate_pairs(
        base,
        id_col="rid",
        block_col="block_key",
        payload_cols=("vec",),
        max_block_size=max_block_size,
    )
    return (
        pairs.withColumn("cosine", cosine_expr("vec_a", "vec_b"))
        .where(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", "cosine")
    )
