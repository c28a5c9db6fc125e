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
"""

from triple_accel_spark.kernels.costs import (  # noqa: F401
    EditCosts,
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
)
