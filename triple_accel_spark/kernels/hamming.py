"""Batch Hamming distance and sliding-window Hamming search.

Semantics: reference src/hamming.rs. The reference's word-wise /
SIMD variants (hamming_words_64/128, hamming_simd_parallel/movemask —
hamming.rs:176-292,317-367) are performance-equivalent implementations
of the same mismatch count; here a single NumPy elementwise-compare
kernel subsumes all of them (vectorized across the batch instead of
within one pair). The reference panics on unequal lengths
(hamming.rs:38); the batch kernel flags those rows invalid so Spark can
surface NULL instead of failing the task.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from triple_accel_spark.kernels.encode import encode_batch


def hamming_batch(a_rows: Sequence, b_rows: Sequence) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(dist int64, valid bool)`` for a batch of string pairs.

    ``valid`` is False for null inputs or unequal-length pairs.
    """
    a_mat, a_len, a_ok = encode_batch(a_rows)
    b_mat, b_len, b_ok = encode_batch(b_rows)
    n = a_mat.shape[0]
    valid = a_ok & b_ok & (a_len == b_len)
    width = min(a_mat.shape[1], b_mat.shape[1])
    neq = a_mat[:, :width] != b_mat[:, :width]
    # only positions inside the (equal) length count
    colmask = np.arange(width)[None, :] < a_len[:, None]
    dist = (neq & colmask).sum(axis=1).astype(np.int64)
    dist[~valid] = -1
    return dist, valid


# cap on rows*windows*needle_len per 3-D compare slice: keeps the
# boolean temp ~32 MB so the compare stays cache/bandwidth friendly
_SEARCH_SLICE_BUDGET = 1 << 25


def hamming_search_batch(
    needle_rows: Sequence,
    haystack_rows: Sequence,
    k: int | None = None,
    search_type: str = "best",
) -> list[list[tuple[int, int, int]] | None]:
    """Sliding-window Hamming search per row.

    Returns per row a list of ``(start, end, k)`` matches, or None for
    null inputs. Default ``k = ceil(len(needle)/2)`` per row
    (hamming.rs:71). ``best`` keeps only the final-minimum-cost matches
    after the running threshold tightened (hamming.rs:123,135-143).

    Vectorized ACROSS the batch, not just within a row: rows are
    grouped by needle length and each group's window-compare is one
    3-D ``sliding_window_view`` operation over the whole group
    (sliced to a fixed memory budget) — no per-row NumPy dispatch, so
    many short haystacks cost the same per byte as one long one.
    Python touches only the emitted hits.
    """
    nd_mat, nd_len, nd_ok = encode_batch(needle_rows)
    hs_mat, hs_len, hs_ok = encode_batch(haystack_rows)
    n_rows = nd_mat.shape[0]
    valid = nd_ok & hs_ok
    out: list[list[tuple[int, int, int]] | None] = [None] * n_rows
    for i in np.nonzero(valid)[0]:
        out[i] = []  # default: no matches (covers needle > haystack)
    if n_rows == 0:
        return out
    k_arr = (
        ((nd_len >> 1) + (nd_len & 1)).astype(np.int64)
        if k is None
        else np.full(n_rows, k, dtype=np.int64)
    )
    best = search_type == "best"

    # empty needles: every position 0..h matches with cost 0
    for i in np.nonzero(valid & (nd_len == 0))[0]:
        if 0 <= k_arr[i]:
            out[i] = [(p, p, 0) for p in range(int(hs_len[i]) + 1)]
    for n in np.unique(nd_len[valid & (nd_len > 0)]):
        n = int(n)
        rows = np.nonzero(valid & (nd_len == n) & (hs_len >= n))[0]
        if rows.size == 0:
            continue
        # slice the group so rows*windows*n stays inside the budget
        step = max(1, _SEARCH_SLICE_BUDGET // max(1, int(hs_len[rows].max()) * n))
        for s in range(0, rows.size, step):
            rr = rows[s : s + step]
            wmax = int(hs_len[rr].max())
            H = np.ascontiguousarray(hs_mat[rr, :wmax])
            win = np.lib.stride_tricks.sliding_window_view(H, n, axis=1)
            d = (win != nd_mat[rr, None, :n]).sum(axis=2, dtype=np.int64)
            nwin = (hs_len[rr] - n + 1).astype(np.int64)
            pos_ok = np.arange(wmax - n + 1, dtype=np.int64)[None, :] < nwin[:, None]
            d = np.where(pos_ok, d, np.int64(1) << 40)
            if best:
                dmin = d.min(axis=1)
                hit_r, hit_p = np.nonzero(
                    (d == dmin[:, None]) & (dmin[:, None] <= k_arr[rr][:, None])
                )
            else:
                hit_r, hit_p = np.nonzero(d <= k_arr[rr][:, None])
            for r, p in zip(hit_r.tolist(), hit_p.tolist()):
                out[rr[r]].append((p, p + n, int(d[r, p])))
    return out
