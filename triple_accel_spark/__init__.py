"""triple_accel_spark — a PySpark-native entity-resolution engine.

A from-scratch Spark implementation of the query semantics of the
``triple_accel`` string edit-distance / fuzzy-search library
(reference at /root/reference, Rust, MIT), wrapped in an idiomatic
Spark record-linkage pipeline:

    blocking -> candidate-pair self-join -> batched Arrow/pandas-UDF
    scoring (Hamming / banded Levenshtein / Myers bit-parallel /
    restricted Damerau-Levenshtein / alignment search) -> k-cutoff
    pruning -> transitive clustering (connected components) ->
    lineage / metrics sinks

Layers
------
``kernels``    pure NumPy batch kernels (no Spark import) + exact scalar
               oracle ports of the reference semantics.
``functions``  pandas-UDF column functions wrapping the kernels.
``operators``  DataFrame-level pipeline operators (blocking, pairing,
               scoring, clustering, dedup, similarity, text analysis).
``sources``    deterministic synthetic transcript generation/IO.
``pipeline``   end-to-end resolve_entities() with checkpoint/resume.
"""

__version__ = "0.1.0"

from triple_accel_spark.kernels.costs import (  # noqa: F401
    EditCosts,
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
)
