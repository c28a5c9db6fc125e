"""Ported reference unit tests (oracle layer).

Every assert in /root/reference/tests/basic_tests.rs becomes a case
here, run against the exact scalar ports in
triple_accel_spark.kernels.reference. These same vectors also drive the
batch kernels (test_kernels_vectors.py).
"""

from __future__ import annotations

import pytest

from triple_accel_spark.kernels.costs import (
    EditCosts,
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
)
from triple_accel_spark.kernels.reference import (
    Edit,
    Match,
    hamming,
    hamming_search,
    levenshtein,
    levenshtein_k,
    levenshtein_search,
)

C = EditCosts
TRANS1 = EditCosts(1, 1, 0, 1)


# --- hamming (basic_tests.rs:6-16, 75-98) ---------------------------------

HAMMING_CASES = [
    (b"abc", b"abd", 1),
    (b"", b"", 0),
    (b"abcaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", b"abdaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", 1),
]


@pytest.mark.parametrize("a,b,want", HAMMING_CASES)
def test_hamming(a, b, want):
    assert hamming(a, b) == want


def test_hamming_unequal_len_raises():
    with pytest.raises(ValueError):
        hamming(b"ab", b"abc")


# --- hamming search (basic_tests.rs:18-42) --------------------------------

HAMMING_SEARCH_CASES = [
    (b"abc", b"  abc  abb", 1, "all", [Match(2, 5, 0), Match(7, 10, 1)]),
    (b"abc", b"  abc  abb", None, "best", [Match(2, 5, 0)]),
    (
        b"abc",
        b"  abc  abb" + b"a" * 61,
        1,
        "all",
        [Match(2, 5, 0), Match(7, 10, 1)],
    ),
    (b"abc", b"ab", 1, "all", []),  # needle longer than haystack
]


@pytest.mark.parametrize("needle,hay,k,st,want", HAMMING_SEARCH_CASES)
def test_hamming_search(needle, hay, k, st, want):
    assert hamming_search(needle, hay, k, st) == want


# --- levenshtein distance (basic_tests.rs:101-161, 198-251, 254-307) ------
# (a, b, costs, expected)
LEV_CASES = [
    (b"abcde", b" ab cde", LEVENSHTEIN_COSTS, 2),
    (b"abcde", b"", LEVENSHTEIN_COSTS, 5),
    (b"abcde", b"abcdee", LEVENSHTEIN_COSTS, 1),
    (b"abcde", b"acde", LEVENSHTEIN_COSTS, 1),
    (b"abcde", b"abbde", LEVENSHTEIN_COSTS, 1),
    (b"abcde", b"acbde", TRANS1, 1),
    (b"ab", b"ba", TRANS1, 1),
    (b"abc", b"aac", C(2, 3, 0, None), 2),
    (b"abc", b"aac", C(3, 1, 0, None), 2),
    (b"abc", b"ac", C(1, 1, 2, None), 3),
    (b"acde", b"abce", C(2, 1, 2, None), 4),
    (b"abcde", b"abe", C(1, 1, 2, None), 4),
    # rdamerau vectors (basic_tests.rs:254-279)
    (b"abcde", b" ab dce", RDAMERAU_COSTS, 3),
    (b"abcde", b"", RDAMERAU_COSTS, 5),
    (b"abcde", b"bacdee", RDAMERAU_COSTS, 2),
    (b"abcde", b"acde", RDAMERAU_COSTS, 1),
    (b"abcde", b"abbde", RDAMERAU_COSTS, 1),
    # null-byte cases (basic_tests.rs:503-537)
    (b"\0", b"", LEVENSHTEIN_COSTS, 1),
    (b"ab\0de", b"a\0bde", TRANS1, 1),
    (b"\0b", b"b\0", TRANS1, 1),
    (b"\0", b"\0\0", LEVENSHTEIN_COSTS, 1),
    (b"\0", b"\0", TRANS1, 0),
    (b"\0\0b\0", b"\0b\0\0", TRANS1, 1),
]


@pytest.mark.parametrize("a,b,costs,want", LEV_CASES)
def test_levenshtein(a, b, costs, want):
    assert levenshtein(a, b, False, costs)[0] == want


# --- k-bounded (basic_tests.rs:309-393, 430-543) --------------------------

LEV_K_CASES = [
    (b"abcde", b" ab cde", 2, LEVENSHTEIN_COSTS, 2),
    (b"abcde", b"", 10, LEVENSHTEIN_COSTS, 5),
    (b"abcde", b"", 30, LEVENSHTEIN_COSTS, 5),
    (b"abcde", b"abcdee", 2, LEVENSHTEIN_COSTS, 1),
    (b"abcde", b"abcdee", 20, LEVENSHTEIN_COSTS, 1),
    (b"abcde", b"acde", 2, LEVENSHTEIN_COSTS, 1),
    (b"abcde", b"acde", 1, LEVENSHTEIN_COSTS, 1),
    (b"abcde", b"abbde", 1, LEVENSHTEIN_COSTS, 1),
    (b"abcde", b"acbde", 1, TRANS1, 1),
    (b"ab", b"ba", 1, TRANS1, 1),
    (b"abc", b"aac", 5, C(2, 3, 0, None), 2),
    (b"abc", b"aac", 5, C(3, 1, 0, None), 2),
    (b"abc", b"ac", 5, C(1, 1, 2, None), 3),
    (b"acde", b"abce", 5, C(2, 1, 2, None), 4),
    (b"abcde", b"abe", 5, C(1, 1, 2, None), 4),
    (b"abcde", b"hello", 1, RDAMERAU_COSTS, None),
    (b"abcde", b"hello", 1, LEVENSHTEIN_COSTS, None),
]


@pytest.mark.parametrize("a,b,k,costs,want", LEV_K_CASES)
def test_levenshtein_k(a, b, k, costs, want):
    got = levenshtein_k(a, b, k, False, costs)
    if want is None:
        assert got is None
    else:
        assert got is not None and got[0] == want


# --- traceback goldens (basic_tests.rs:164-195, 396-427, 546-577) ---------

TRACE_CASES = [
    (
        b"abcde",
        b" ab cde",
        LEVENSHTEIN_COSTS,
        2,
        [Edit("a_gap", 1), Edit("match", 2), Edit("a_gap", 1), Edit("match", 3)],
    ),
    (b"abcde", b"", LEVENSHTEIN_COSTS, 5, [Edit("b_gap", 5)]),
    (
        b"abcde",
        b"abcce",
        LEVENSHTEIN_COSTS,
        1,
        [Edit("match", 3), Edit("mismatch", 1), Edit("match", 1)],
    ),
    (
        b"abcde",
        b"acbde",
        TRANS1,
        1,
        [Edit("match", 1), Edit("transpose", 1), Edit("match", 2)],
    ),
]


@pytest.mark.parametrize("a,b,costs,want_d,want_tr", TRACE_CASES)
def test_traceback(a, b, costs, want_d, want_tr):
    d, tr = levenshtein(a, b, True, costs)
    assert d == want_d
    assert tr == want_tr
    # the k-bounded path returns identical traces (basic_tests.rs:396-427)
    got = levenshtein_k(a, b, 30, True, costs)
    assert got is not None and got[0] == want_d and got[1] == want_tr


# --- levenshtein search (basic_tests.rs:580-815) ---------------------------
# (needle, haystack, k, search_type, costs, anchored, expected)
SEARCH_CASES = [
    (b"bcc", b"abcde", 1, "all", LEVENSHTEIN_COSTS, False,
     [Match(1, 3, 1), Match(1, 4, 1)]),
    (b"", b"", 1, "all", LEVENSHTEIN_COSTS, False, []),
    (b"tast", b"testing 123 tating!", 1, "all", LEVENSHTEIN_COSTS, False,
     [Match(0, 4, 1), Match(12, 15, 1)]),
    (b"tst", b"testing 123 tasting!", 1, "all", LEVENSHTEIN_COSTS, False,
     [Match(0, 4, 1), Match(12, 16, 1)]),
    (b"tst", b"testing 123 tasting!", None, "best", LEVENSHTEIN_COSTS, False,
     [Match(0, 4, 1), Match(12, 16, 1)]),
    (b"ab", b"ba", 1, "all", TRANS1, False,
     [Match(0, 1, 1), Match(0, 2, 1)]),
    (b"test", b"...tseting!", 1, "all", TRANS1, False, [Match(3, 7, 1)]),
    (b"test", b"...tssting!", 2, "all", C(3, 1, 0, None), False,
     [Match(3, 5, 2), Match(3, 7, 2)]),
    (b"test", b" testing 123 tasting", 1, "all", LEVENSHTEIN_COSTS, True,
     [Match(1, 5, 1)]),
    (b"test", b" etsting 123 tasting", 2, "all", RDAMERAU_COSTS, True,
     [Match(0, 3, 2), Match(0, 4, 2), Match(1, 5, 2)]),
    (b"test", b"etsting", 1, "all", RDAMERAU_COSTS, True, [Match(0, 4, 1)]),
    (b"test", b"est", 3, "all", C(1, 1, 2, None), True, [Match(0, 3, 3)]),
    (b"testing", b"   teing", 4, "all", C(1, 1, 2, None), False,
     [Match(1, 8, 4)]),
    (b"testing", b"   teing", 4, "all", C(2, 1, 2, None), False,
     [Match(3, 8, 4)]),
    (b"abc", b"", 5, "all", LEVENSHTEIN_COSTS, False, [Match(0, 0, 3)]),
    (b"", b"abc", 2, "all", LEVENSHTEIN_COSTS, True,
     [Match(0, 0, 0), Match(0, 1, 1), Match(0, 2, 2)]),
    # SIMD-path extras with null bytes (basic_tests.rs:774-814)
    (b"\0b", b"b\0", 1, "all", RDAMERAU_COSTS, True,
     [Match(0, 1, 1), Match(0, 2, 1)]),
    (b"\0\0", b"\0\0", 0, "all", RDAMERAU_COSTS, True, [Match(0, 2, 0)]),
    (b"testing", b"   \0esting", 1, "all", LEVENSHTEIN_COSTS, False,
     [Match(3, 10, 1)]),
    (b"\0\0\0", b"\0\0", 1, "all", LEVENSHTEIN_COSTS, True, [Match(0, 2, 1)]),
    (b"\0\0", b"   \0\0", 0, "all", RDAMERAU_COSTS, False, [Match(3, 5, 0)]),
    # doc example (levenshtein.rs:1584-1587)
    (b"abc", b"  acb", 1, "all", RDAMERAU_COSTS, False,
     [Match(2, 4, 1), Match(2, 5, 1)]),
    # default best (levenshtein.rs:1545-1547)
    (b"abc", b"  abd", None, "best", LEVENSHTEIN_COSTS, False,
     [Match(2, 5, 1)]),
]


@pytest.mark.parametrize("needle,hay,k,st,costs,anch,want", SEARCH_CASES)
def test_levenshtein_search(needle, hay, k, st, costs, anch, want):
    assert levenshtein_search(needle, hay, k, st, costs, anch) == want


def test_search_first_match_only():
    # basic_tests.rs:628-632 — first yielded match
    got = levenshtein_search(b"tst", b"testing 123 tasting", 1, "all",
                             LEVENSHTEIN_COSTS, False)
    assert got[0] == Match(0, 4, 1)
