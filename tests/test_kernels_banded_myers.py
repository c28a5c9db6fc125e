"""Banded (Ukkonen-window) Myers path: agreement with the scalar
oracle across the full regime grid, including the empty-pattern-chunk
and trim-to-empty regressions."""

from __future__ import annotations

import numpy as np
import pytest

from triple_accel_spark.kernels.myers import myers_batch
from triple_accel_spark.kernels.reference import levenshtein as ref_lev


def test_empty_side_chunks():
    # regression: a chunk whose every pattern is empty must still
    # report dist = len(text) (the m_max==0 fallback)
    d, ok = myers_batch(["a", "", "aa", "xyz"], ["", "a", "a", "xyz"], None)
    assert list(d) == [1, 1, 1, 0]
    assert ok.all()


@pytest.mark.parametrize("k", [0, 3, 11, 37, 90, None])
def test_banded_agrees_with_oracle(k):
    rng = np.random.default_rng(123)
    A, B = [], []
    for _ in range(300):
        L = int(rng.integers(0, 400))
        a = bytes(rng.integers(97, 123, L, dtype=np.uint8))
        if rng.random() < 0.5 and L > 4:
            b = a[: L // 2] + bytes(
                rng.integers(97, 123, 2, dtype=np.uint8)
            ) + a[L // 2 + 3:]
        else:
            b = bytes(rng.integers(97, 123, int(rng.integers(0, 400)), dtype=np.uint8))
        A.append(a)
        B.append(b)
    d, ok = myers_batch(A, B, k)
    for i in range(len(A)):
        true, _ = ref_lev(A[i], B[i])
        if k is None:
            assert ok[i] and d[i] == true, (i, d[i], true)
        elif true <= k:
            assert ok[i] and d[i] == true, (i, d[i], true, k)
        else:
            assert not ok[i], (i, d[i], true, k)


def test_per_row_k_array():
    A = [b"abcdefgh"] * 4
    B = [b"abcdefgh", b"abcdefgX", b"Xbcdefgx", b"XXXXXXXX"]
    ks = np.array([0, 0, 2, 3])
    d, ok = myers_batch(A, B, ks)
    assert list(ok) == [True, False, True, False]
    assert d[0] == 0 and d[2] == 2
