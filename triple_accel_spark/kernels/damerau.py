"""Batch-vectorized UNRESTRICTED Damerau-Levenshtein distance
(Lowrance-Wagner 1975: adjacent transposition may be edited again,
unlike the reference's restricted/OSA ``rdamerau``,
levenshtein.rs:1419-1423 — the reference deliberately ships OSA only;
this is the ER-graft completion of the family, and the one DuckDB
oracles natively via ``damerau_levenshtein`` on bytes).

Algorithm: the alphabet-indexed DP (``da[char]`` = last row where the
char occurred in ``a``; ``db`` = last column matched in the current
row), vectorized ACROSS THE BATCH: the two DP loops run
``max_la * max_lb`` times in Python, each step doing O(1) NumPy ops
over the whole chunk, with the transpose term gathered from the
per-row DP cube by fancy indexing. Memory is the full
``(n, la+2, lb+2) int32`` cube per chunk — callers chunk length-sorted
so the budget holds; intended for short name-like fields (the
restricted OSA kernel remains the long-document scale path).

Padding soundness: cells beyond a row's ``(la, lb)`` compute garbage,
but the row's result cell ``d[la+1, lb+1]`` is finalized at
``i == la, j == lb`` and never rewritten; ``da``/``db`` pollution from
out-of-range positions only feeds cells beyond the result cell.
"""

from __future__ import annotations

import numpy as np

from triple_accel_spark.kernels.encode import encode_batch

_CUBE_BUDGET_BYTES = 64 << 20


def _dl_core(
    a_mat: np.ndarray, a_len: np.ndarray, b_mat: np.ndarray, b_len: np.ndarray
) -> np.ndarray:
    n = a_mat.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = a_len.astype(np.int64)
    lb = b_len.astype(np.int64)
    max_la = int(la.max())
    max_lb = int(lb.max())
    inf = max_la + max_lb + 1

    d = np.empty((n, max_la + 2, max_lb + 2), dtype=np.int32)
    d[:, 0, :] = inf
    d[:, :, 0] = inf
    d[:, 1, 1:] = np.arange(max_lb + 1, dtype=np.int32)
    d[:, 1:, 1] = np.arange(max_la + 1, dtype=np.int32)
    da = np.zeros((n, 256), dtype=np.int32)
    rows = np.arange(n)
    for i in range(1, max_la + 1):
        ach = a_mat[:, i - 1]
        db = np.zeros(n, dtype=np.int32)
        for j in range(1, max_lb + 1):
            bch = b_mat[:, j - 1]
            k = da[rows, bch]
            ll = db
            eq = ach == bch
            db = np.where(eq, np.int32(j), db)
            trans = d[rows, k, ll] + (i - k - 1) + 1 + (j - ll - 1)
            sub = d[:, i, j] + (~eq).astype(np.int32)
            ins = d[:, i + 1, j] + 1
            dele = d[:, i, j + 1] + 1
            d[:, i + 1, j + 1] = np.minimum(
                np.minimum(sub, trans), np.minimum(ins, dele)
            )
        da[rows, ach] = i
    return d[rows, la + 1, lb + 1].astype(np.int64)


def dl_scalar(a: bytes, b: bytes) -> int:
    """Scalar oracle implementation (Lowrance-Wagner), for tests."""
    la, lb = len(a), len(b)
    inf = la + lb
    da: dict[int, int] = {}
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            ll = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][ll] + (i - k - 1) + 1 + (j - ll - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def dl_batch(a_rows, b_rows) -> tuple[np.ndarray, np.ndarray]:
    """Object-array entry point: encode, length-sorted cube-budget
    chunking, scatter back. Returns ``(dist, valid)``; invalid rows
    hold -1."""
    a_mat, a_len, a_ok = encode_batch(a_rows)
    b_mat, b_len, b_ok = encode_batch(b_rows)
    valid = a_ok & b_ok
    n = len(a_len)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return out, valid
    key = np.maximum(a_len, b_len)
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    i = 0
    while i < n:
        width = max(int(key_sorted[i]) + 2, 2)
        cap = max(32, _CUBE_BUDGET_BYTES // (4 * width * width))
        end = min(i + cap, n)
        width = max(int(key_sorted[end - 1]) + 2, 2)
        cap = max(32, _CUBE_BUDGET_BYTES // (4 * width * width))
        end = min(i + cap, n)
        idx = order[i:end]
        wa = max(int(a_len[idx].max()), 1)
        wb = max(int(b_len[idx].max()), 1)
        out[idx] = _dl_core(
            a_mat[idx][:, :wa], a_len[idx], b_mat[idx][:, :wb], b_len[idx]
        )
        i = end
    out[~valid] = -1
    return out, valid
