"""Pure NumPy scoring kernels (no Spark imports at this layer).

``reference``  exact scalar ports of the reference algorithms — slow,
               trusted-by-construction pytest oracles.
``hamming``    batch Hamming distance + sliding-window Hamming search.
``myers``      batch Myers bit-parallel Levenshtein (unit costs) over
               uint64 bit-vectors.
``banded``     batch generalized-cost Levenshtein DP (affine gaps,
               OSA transpositions, k cutoff, traceback).
``search``     batch semi-global alignment search with match-length
               tie-breaking (All/Best/anchored).
``jaro``       batch Jaro / Jaro-Winkler name-field similarity
               (ER-graft extension; DuckDB-oracled bit-for-bit).
``damerau``    batch UNRESTRICTED Damerau-Levenshtein (the reference
               ships restricted/OSA only).
"""

from triple_accel_spark.kernels.costs import (  # noqa: F401
    EditCosts,
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
)
