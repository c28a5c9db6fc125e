"""Batch-vectorized Jaro / Jaro-Winkler similarity.

ER-graft EXTENSION beyond the reference API: triple_accel implements
edit-family distances only (levenshtein.rs), but name-field record
linkage conventionally scores with Jaro-Winkler (Winkler 1990; the
Fellegi-Sunter string comparator literature). Semantics here are the
standard ones, pinned bit-for-bit to DuckDB's
``jaro_winkler_similarity`` so the driver hash oracle is the NATIVE
DuckDB function, not a replay:

- operates on raw UTF-8 BYTES (same u8 semantics as every other kernel
  in this package, reference lib.rs:41-44; DuckDB scores bytes too);
- match window ``max(la, lb)//2 - 1`` (floored at 0), greedy
  first-unmatched matching left to right;
- transpositions = half the positional mismatches between the two
  matched-character sequences;
- jaro = (m/la + m/lb + (m-t)/m) / 3; either side empty -> 0.0
  (DuckDB returns 0.0 even for ''~'' — adopted here), m == 0 -> 0.0;
- Winkler boost only when jaro > 0.7: jw = j + l*0.1*(1-j), common
  prefix l capped at 4.

Vectorization is across the batch axis like every kernel here (the
outer loop runs ``max_len`` times over ``(n, max_len)`` boolean
masks, O(n * la * lb) total like the scalar algorithm); callers chunk
length-sorted batches so a long outlier never widens short rows'
masks. Intended for short name-like fields — for long documents use
the edit-distance kernels.
"""

from __future__ import annotations

import numpy as np

from triple_accel_spark.kernels.encode import encode_batch

_CHUNK_BUDGET_CELLS = 1 << 22  # n * max_len bool cells per mask


def _jaro_core(
    a_mat: np.ndarray, a_len: np.ndarray, b_mat: np.ndarray, b_len: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Returns ``(jaro, jw)`` float64 arrays for zero-padded encoded
    batches. Padding never matches: eligibility is masked to ``j < lb``
    and rows stop contributing past ``i >= la``."""
    n = a_mat.shape[0]
    if n == 0:
        z = np.zeros(0, dtype=np.float64)
        return z, z.copy()
    la = a_len.astype(np.int64)
    lb = b_len.astype(np.int64)
    max_la = int(la.max())
    max_lb = int(lb.max())
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    matched_a = np.zeros((n, max(max_la, 1)), dtype=bool)
    matched_b = np.zeros((n, max(max_lb, 1)), dtype=bool)
    jpos = np.arange(max(max_lb, 1), dtype=np.int64)
    bm = b_mat[:, : max(max_lb, 1)]
    for i in range(max_la):
        act = i < la
        if not act.any():
            break
        ach = a_mat[:, i]
        elig = (bm == ach[:, None]) & ~matched_b
        elig &= (jpos >= (i - w)[:, None]) & (jpos <= (i + w)[:, None])
        elig &= jpos < lb[:, None]
        elig &= act[:, None]
        hit = elig.any(axis=1)
        if hit.any():
            rows = np.nonzero(hit)[0]
            matched_b[rows, elig.argmax(axis=1)[rows]] = True
            matched_a[rows, i] = True

    m = matched_a.sum(axis=1).astype(np.int64)
    max_m = int(m.max())
    t = np.zeros(n, dtype=np.int64)
    if max_m > 0:
        # matched chars of each side in order: rank-within-row scatter
        sa = np.zeros((n, max_m), dtype=np.uint8)
        sb = np.zeros((n, max_m), dtype=np.uint8)
        ra, ca = np.nonzero(matched_a)
        sa[ra, np.cumsum(matched_a, axis=1)[ra, ca] - 1] = a_mat[ra, ca]
        rb, cb = np.nonzero(matched_b)
        sb[rb, np.cumsum(matched_b, axis=1)[rb, cb] - 1] = b_mat[rb, cb]
        t = (
            ((sa != sb) & (np.arange(max_m) < m[:, None])).sum(axis=1) // 2
        ).astype(np.int64)

    laf = la.astype(np.float64)
    lbf = lb.astype(np.float64)
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        # EXACT op order of the scalar formula (and DuckDB's result):
        # (m/la + m/lb + (m-t)/m) / 3 — bit-identity matters for the
        # driver's repr()-based float compare
        j = (mf / laf + mf / lbf + (mf - t) / mf) / 3.0
    j = np.where((m > 0) & (la > 0) & (lb > 0), j, 0.0)

    # common prefix, capped at 4
    pcap = min(4, max_la, max_lb)
    if pcap > 0:
        peq = (a_mat[:, :pcap] == b_mat[:, :pcap]) & (
            np.arange(pcap) < np.minimum(la, lb)[:, None]
        )
        pl = np.cumprod(peq, axis=1).sum(axis=1).astype(np.int64)
    else:
        pl = np.zeros(n, dtype=np.int64)
    jw = np.where(j > 0.7, j + (pl * 0.1) * (1.0 - j), j)
    return j, jw


def jaro_scalar(a: bytes, b: bytes) -> tuple[float, float]:
    """Scalar oracle implementation (tests compare the batch kernel
    against this and both against DuckDB)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0, 0.0
    w = max(max(la, lb) // 2 - 1, 0)
    mb = [False] * lb
    ma = [False] * la
    m = 0
    for i in range(la):
        for j in range(max(0, i - w), min(lb, i + w + 1)):
            if not mb[j] and b[j] == a[i]:
                mb[j] = ma[i] = True
                m += 1
                break
    if m == 0:
        return 0.0, 0.0
    sa = [a[i] for i in range(la) if ma[i]]
    sb = [b[j] for j in range(lb) if mb[j]]
    t = sum(1 for x, y in zip(sa, sb) if x != y) // 2
    j = (m / la + m / lb + (m - t) / m) / 3
    l = 0
    for x, y in zip(a, b):
        if x == y and l < 4:
            l += 1
        else:
            break
    jw = j + (l * 0.1) * (1 - j) if j > 0.7 else j
    return j, jw


def jaro_batch(
    a_rows, b_rows
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Object-array entry point: encode, length-sorted chunking (a long
    outlier must not widen every row's masks), scatter back.

    Returns ``(jaro, jw, valid)``; invalid (NULL-input) rows hold 0.0.
    """
    a_mat, a_len, a_ok = encode_batch(a_rows)
    b_mat, b_len, b_ok = encode_batch(b_rows)
    valid = a_ok & b_ok
    n = len(a_len)
    jaro = np.zeros(n, dtype=np.float64)
    jw = np.zeros(n, dtype=np.float64)
    if n == 0:
        return jaro, jw, valid
    key = np.maximum(a_len, b_len)
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    i = 0
    while i < n:
        width = max(int(key_sorted[i]), 1)
        end = min(i + max(64, _CHUNK_BUDGET_CELLS // width), n)
        width = max(int(key_sorted[end - 1]), 1)
        end = min(i + max(64, _CHUNK_BUDGET_CELLS // width), n)
        idx = order[i:end]
        wa = max(int(a_len[idx].max()), 1)
        wb = max(int(b_len[idx].max()), 1)
        j, w_ = _jaro_core(
            a_mat[idx][:, :wa], a_len[idx], b_mat[idx][:, :wb], b_len[idx]
        )
        jaro[idx] = j
        jw[idx] = w_
        i = end
    jaro[~valid] = 0.0
    jw[~valid] = 0.0
    return jaro, jw, valid
