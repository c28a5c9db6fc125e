"""Structured Streaming operators: incremental blocking & scoring."""

from triple_accel_spark.streaming.incremental import (  # noqa: F401
    stream_block_keys,
    stream_match_against_index,
)
