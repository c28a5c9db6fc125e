"""One Column function per reference public API symbol.

A user of the reference library (``triple_accel``) can port call sites
one-to-one: every ``pub fn`` re-exported or defined in
/root/reference/src/{lib,hamming,levenshtein}.rs has a same-named
Column function here with the same semantics over string columns.
Naive / words / SIMD / movemask variants of one operation are
performance tiers of identical semantics in the reference (asserted by
its own benches, rand_benchmarks.rs:17-21,65-67) — here they share one
vectorized kernel, so the aliases simply delegate.

Reference ``Option<u32>``/``None`` maps to SQL NULL; ``panic!`` on
unequal Hamming lengths maps to NULL (a distributed job must not kill
the task); ``Match``/``Edit`` structs map to array<struct> columns.

The ``*_str`` adapters take ``unicode=True`` semantics: per-codepoint
distances via a per-pair ≤256-symbol dictionary
(levenshtein.rs:609-651), NULL where the alphabet overflows.

All distance functions here are marked ``asNondeterministic()``
(deterministic in fact — see ``functions.edit_distance``): this stops
Catalyst evaluating the kernel twice across pushed-down filters, but
means the returned Column cannot appear inside join conditions or
grouping keys; compute it with ``withColumn`` first, then join/group
on the materialized column.
"""

from __future__ import annotations

from pyspark.sql import Column

from triple_accel_spark.functions import (
    edit_distance,
    edit_search,
    edit_with_traceback,
)
from triple_accel_spark.functions import hamming as _hamming
from triple_accel_spark.functions import hamming_search as _hamming_search
from triple_accel_spark.functions import rdamerau as _rdamerau
from triple_accel_spark.kernels.costs import EditCosts, LEVENSHTEIN_COSTS

# --- hamming.rs -----------------------------------------------------------


def hamming(a, b) -> Column:
    """hamming.rs:390 (dispatch of the SIMD variant)."""
    return _hamming(a, b)


def hamming_naive(a, b) -> Column:
    """hamming.rs:36 — same results as ``hamming``."""
    return _hamming(a, b)


def hamming_words_64(a, b) -> Column:
    """hamming.rs:176 — word-wise XOR/popcount tier; same results."""
    return _hamming(a, b)


def hamming_words_128(a, b) -> Column:
    """hamming.rs:249 — same results."""
    return _hamming(a, b)


def hamming_simd_parallel(a, b) -> Column:
    """hamming.rs:317 — same results."""
    return _hamming(a, b)


def hamming_simd_movemask(a, b) -> Column:
    """hamming.rs:354 — same results."""
    return _hamming(a, b)


def hamming_search(needle, haystack) -> Column:
    """hamming.rs:588 — default k = ceil(len(needle)/2), Best mode."""
    return _hamming_search(needle, haystack, None, "best")


def hamming_search_naive(needle, haystack) -> Column:
    """hamming.rs:70 — same results as ``hamming_search``."""
    return _hamming_search(needle, haystack, None, "best")


def hamming_search_naive_with_opts(needle, haystack, k, search_type) -> Column:
    """hamming.rs:96; ``search_type`` in {'all', 'best'}."""
    return _hamming_search(needle, haystack, k, search_type)


def hamming_search_simd(needle, haystack) -> Column:
    """hamming.rs:422 — same results."""
    return _hamming_search(needle, haystack, None, "best")


def hamming_search_simd_with_opts(needle, haystack, k, search_type) -> Column:
    """hamming.rs:454 — same results."""
    return _hamming_search(needle, haystack, k, search_type)


# --- levenshtein.rs: distances --------------------------------------------


def levenshtein(a, b) -> Column:
    """levenshtein.rs:1397 — unit costs, unbounded."""
    return edit_distance(a, b)


def levenshtein_naive(a, b) -> Column:
    """levenshtein.rs:105 — same results."""
    return edit_distance(a, b)


def levenstein_naive_str(a, b) -> Column:
    """levenshtein.rs:123 (sic — the reference's typo is preserved):
    per-CHARACTER distance on str input."""
    return edit_distance(a, b, unicode=True)


def levenshtein_naive_with_opts(
    a, b, trace_on: bool = False, costs: EditCosts = LEVENSHTEIN_COSTS
) -> Column:
    """levenshtein.rs:148 — ``(cost, trace)`` struct in one kernel run
    when ``trace_on`` (see levenshtein_simd_k_with_opts)."""
    if trace_on:
        return edit_with_traceback(a, b, costs=costs)
    return edit_distance(a, b, costs=costs)


def levenshtein_naive_k(a, b, k: int) -> Column:
    """levenshtein.rs:342 — NULL where distance > k."""
    return edit_distance(a, b, k=k)


def levenshtein_naive_k_with_opts(
    a, b, k: int, trace_on: bool = False, costs: EditCosts = LEVENSHTEIN_COSTS
) -> Column:
    """levenshtein.rs:376 — ``(cost, trace)`` struct in one kernel run
    when ``trace_on``; fields NULL above ``k``."""
    if trace_on:
        return edit_with_traceback(a, b, k=k, costs=costs)
    return edit_distance(a, b, k=k, costs=costs)


def levenshtein_simd_k(a, b, k: int) -> Column:
    """levenshtein.rs:677 — banded Myers path; NULL where > k."""
    return edit_distance(a, b, k=k)


def levenshtein_simd_k_str(a, b, k: int) -> Column:
    """levenshtein.rs:641 — per-codepoint via translate_str; NULL where
    > k or the pair's alphabet exceeds 256 codepoints."""
    return edit_distance(a, b, k=k, unicode=True)


def levenshtein_simd_k_with_opts(
    a, b, k: int, trace_on: bool = False, costs: EditCosts = LEVENSHTEIN_COSTS
) -> Column:
    """levenshtein.rs:714 — with ``trace_on`` the reference returns the
    ``(cost, Option<trace>)`` TUPLE from one DP run; mirrored here as a
    ``struct<cost, trace>`` column from one kernel run."""
    if trace_on:
        return edit_with_traceback(a, b, k=k, costs=costs)
    return edit_distance(a, b, k=k, costs=costs)


def levenshtein_exp(a, b) -> Column:
    """levenshtein.rs:1445 — exact distance (the exponential k-search
    is an execution strategy, not a semantic)."""
    return edit_distance(a, b)


def levenshtein_exp_with_opts(
    a, b, trace_on: bool = False, costs: EditCosts = LEVENSHTEIN_COSTS
) -> Column:
    """levenshtein.rs:1480 — ``(cost, trace)`` struct in one kernel run
    when ``trace_on`` (see levenshtein_simd_k_with_opts)."""
    if trace_on:
        return edit_with_traceback(a, b, costs=costs)
    return edit_distance(a, b, costs=costs)


def rdamerau(a, b) -> Column:
    """levenshtein.rs:1419 — restricted (OSA) Damerau-Levenshtein."""
    return _rdamerau(a, b)


def rdamerau_exp(a, b) -> Column:
    """levenshtein.rs:1516 — same results as ``rdamerau``."""
    return _rdamerau(a, b)


# --- levenshtein.rs: search ------------------------------------------------


def levenshtein_search(needle, haystack) -> Column:
    """levenshtein.rs:2508 — default k = ceil(n/2), Best, unit costs."""
    return edit_search(needle, haystack, None, "best")


def levenshtein_search_naive(needle, haystack) -> Column:
    """levenshtein.rs:1549 — same results."""
    return edit_search(needle, haystack, None, "best")


def levenshtein_search_naive_with_opts(
    needle, haystack, k: int, search_type: str,
    costs: EditCosts = LEVENSHTEIN_COSTS, anchored: bool = False,
) -> Column:
    """levenshtein.rs:1589."""
    return edit_search(needle, haystack, k, search_type, costs, anchored)


def levenshtein_search_simd(needle, haystack) -> Column:
    """levenshtein.rs:1866 — same results."""
    return edit_search(needle, haystack, None, "best")


def levenshtein_search_simd_with_opts(
    needle, haystack, k: int, search_type: str,
    costs: EditCosts = LEVENSHTEIN_COSTS, anchored: bool = False,
) -> Column:
    """levenshtein.rs:1911."""
    return edit_search(needle, haystack, k, search_type, costs, anchored)
