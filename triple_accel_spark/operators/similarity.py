"""Similarity search over embedding columns (``array<float>``).

* ``cosine_expr``        — exact cosine as a pure Column expression
                           (``aggregate``/``zip_with``; JVM-side).
* ``brute_force_topk``   — exact top-k neighbors for a (small) query
                           set: broadcast queries x corpus, window
                           rank. The correctness baseline.
* ``hyperplane_bucket``  — deterministic random-hyperplane LSH key.
* ``lsh_topk``           — bucketed approximate top-k: equi-join on
                           bucket instead of the full cross product —
                           the 100 TB scale path (cross product is
                           O(N*Q); bucketing cuts it by ~2^planes).

Hyperplanes are generated from ``xxhash64`` of (plane, dim) so they are
deterministic, identical on every executor, and need no broadcast of
random state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    scored: DataFrame,
    key_col: str,
    k: int,
    order_col: str = "cosine",
    tiebreak_col: str = "vec_id",
    salt_buckets: int = 64,
) -> DataFrame:
    """Exact per-key top-k that never funnels one key's full candidate
    set through a single task.

    A plain ``Window.partitionBy(key)`` rank sends EVERY candidate of a
    key to one reducer — for corpus-sized candidate sets (brute-force
    ANN) that is the scale killer. Two stages, both exact: rank within
    ``(key, hash(tiebreak) % salt_buckets)`` and keep k per salt bucket
    (partitions are 1/salt_buckets of the candidate set), then rank the
    surviving ``<= k * salt_buckets`` rows per key. The global top-k is
    contained in the union of per-bucket top-ks, so the result is
    identical to the single-window rank, including the deterministic
    ``(order desc, tiebreak asc)`` tie-break."""
    salt = F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(F.col(key_col), salt).orderBy(
        F.desc(order_col), F.asc(tiebreak_col)
    )
    pre = scored.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= k
    ).drop("_r1")
    w2 = Window.partitionBy(key_col).orderBy(F.desc(order_col), F.asc(tiebreak_col))
    return pre.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= k
    )


def dot_expr(a, b) -> Column:
    """Dot product of two array<float> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_expr(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_expr(a, b) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def _plane_component(plane: int, dim_idx: Column, seed: int) -> Column:
    """Deterministic pseudo-gaussian-ish component in [-1, 1): derived
    from xxhash64(plane, dim, seed) — sign-LSH only needs symmetry."""
    h = F.xxhash64(F.lit(plane), dim_idx, F.lit(seed))
    return (h % 10_000_019).cast("double") / F.lit(10_000_019.0)


def hyperplane_bucket(vec: Column, n_planes: int = 12, seed: int = 42) -> Column:
    """Sign-pattern bucket id (bigint) from ``n_planes`` deterministic
    hyperplanes."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        comp = F.zip_with(
            vec, idx, lambda v, i: v.cast("double") * _plane_component(p, i, seed)
        )
        proj = F.aggregate(comp, F.lit(0.0).cast("double"), lambda acc, v: acc + v)
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: ``(query_id, vec_id, cosine, rank)``.

    The query side is broadcast — the corpus is never shuffled, so this
    scales to arbitrary corpus size as long as the query set is small
    (the usual ANN-baseline shape)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cvec"))
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", cosine_expr("qvec", "cvec")
    )
    return topk_per_key(scored, "query_id", k, tiebreak_col=id_col).select(
        "query_id", id_col, "cosine", "rank"
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via multi-table hyperplane LSH.

    Each of ``n_tables`` independent sign-LSH tables buckets corpus and
    queries; candidates are the union of same-bucket collisions, then
    exact cosine + rank. Recall grows as ``1-(1-p^planes)^tables``."""
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cvec"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cand = None
    for t in range(n_tables):
        cb = c.withColumn("bucket", hyperplane_bucket(F.col("cvec"), n_planes, seed + t))
        qb = q.withColumn("bucket", hyperplane_bucket(F.col("qvec"), n_planes, seed + t))
        hit = cb.join(F.broadcast(qb), "bucket").select(
            "query_id", id_col, "qvec", "cvec"
        )
        cand = hit if cand is None else cand.union(hit)
    cand = cand.dropDuplicates(["query_id", id_col])
    scored = cand.withColumn("cosine", cosine_expr("qvec", "cvec"))
    return topk_per_key(scored, "query_id", k, tiebreak_col=id_col).select(
        "query_id", id_col, "cosine", "rank"
    )


def brute_force_all_pairs_topk(
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact corpus x corpus top-k neighbor lists:
    ``(query_id, vec_id, cosine, rank)`` for every corpus row.

    O(N^2) cross product — the CORRECTNESS BASELINE for all-pairs
    similarity (validation, small corpora, and recall measurement for
    ``lsh_all_pairs_topk``). Not a 100 TB plan by design; the scale
    path is the bucketed variant below."""
    a = corpus.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    b = corpus.select(F.col(id_col), F.col(vec_col).alias("cvec"))
    scored = (
        a.join(b, F.col("query_id") != F.col(id_col))
        .withColumn("cosine", cosine_expr("qvec", "cvec"))
    )
    return topk_per_key(scored, "query_id", k, tiebreak_col=id_col).select(
        "query_id", id_col, "cosine", "rank"
    )


def lsh_all_pairs_topk(
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    max_block_size: int | None = 100_000,
) -> DataFrame:
    """Approximate corpus x corpus top-k (no broadcastable query side):
    the large-query-set ANN scale path.

    ``n_tables`` independent sign-LSH keys per row -> ONE salted,
    capped bucket self-join (reusing ``candidate_pairs``: exact-once
    unordered pairs, hot buckets sharded) -> exact cosine on the
    candidates -> expand to both directions -> per-id window top-k.
    Cost is sum of bucket sizes squared instead of N^2; recall per
    neighbor at angle θ is ``1-(1-(1-θ/π)^planes)^tables`` (tune
    planes up / tables down as density grows). Ranks are top-k OF THE
    CANDIDATE SET — recall vs the exact baseline is asserted in tests
    on the testdata embeddings."""
    from triple_accel_spark.operators.pairs import candidate_pairs

    base = corpus.select(F.col(id_col).alias("rid"), F.col(vec_col).alias("vec"))
    keys = F.array(
        *[
            F.xxhash64(
                F.lit(t), hyperplane_bucket(F.col("vec"), n_planes, seed + t)
            )
            for t in range(n_tables)
        ]
    )
    blocked = base.withColumn("block_key", F.explode(keys))
    pairs = candidate_pairs(
        blocked,
        id_col="rid",
        block_col="block_key",
        payload_cols=("vec",),
        max_block_size=max_block_size,
    )
    scored = pairs.withColumn("cosine", cosine_expr("vec_a", "vec_b"))
    both = scored.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias(id_col), "cosine"
    ).union(
        scored.select(
            F.col("id_b").alias("query_id"), F.col("id_a").alias(id_col), "cosine"
        )
    )
    out = topk_per_key(both, "query_id", k, tiebreak_col=id_col).select(
        "query_id", id_col, "cosine", "rank"
    )
    out._persisted_frames = getattr(pairs, "_persisted_frames", [])
    return out
