"""Bucketed-table helpers: co-located joins without a shuffle.

At 10^12-turn scale the repeated joins on stable keys (conv_id for
doc/label joins, block_key for pair generation, digest for dedup
membership) should not re-shuffle the big table every run. Writing the
table bucketed — ``bucketBy(n, key)`` + ``sortBy(key)`` — persists the
hash-partitioning in the table metadata, so joins and aggregations on
the bucket key read co-located buckets directly: Catalyst plans a
sort-merge or hash join with NO Exchange on either bucketed side
(asserted in tests/test_plans_and_parity.py on the physical plan).

Bucket count guidance at scale: pick ``n_buckets`` so one bucket of
the LARGEST co-located table is a few hundred MB (e.g. 100 TB of
assembled docs -> ~2^18 buckets); both sides of a co-located join must
use the SAME bucket count and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides along from the
    catalog — a plain ``read.parquet`` of the files would lose it)."""
    return spark.table(table)
