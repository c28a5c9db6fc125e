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

from triple_accel_spark.kernels.encode import encode_batch, to_bytes_list


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

    Each row's window-compare is a vectorized 2-D operation
    (sliding_window_view); the loop is over rows only, so cost is
    O(len(haystack) * len(needle)) NumPy work per row.
    """
    needles, n_ok = to_bytes_list(needle_rows)
    haystacks, h_ok = to_bytes_list(haystack_rows)
    out: list[list[tuple[int, int, int]] | None] = []
    for needle, hay, ok1, ok2 in zip(needles, haystacks, n_ok, h_ok):
        if not (ok1 and ok2):
            out.append(None)
            continue
        n, h = len(needle), len(hay)
        kk = (n >> 1) + (n & 1) if k is None else k
        if n > h:
            out.append([])
            continue
        if n == 0:
            # every position matches with cost 0
            d = np.zeros(h + 1, dtype=np.int64)
        else:
            na = np.frombuffer(needle, dtype=np.uint8)
            ha = np.frombuffer(hay, dtype=np.uint8)
            win = np.lib.stride_tricks.sliding_window_view(ha, n)
            d = (win != na[None, :]).sum(axis=1).astype(np.int64)
        if search_type == "best":
            dmin = int(d.min()) if d.size else 0
            if dmin > kk:
                out.append([])
                continue
            idx = np.nonzero(d == dmin)[0]
            out.append([(int(i), int(i) + n, dmin) for i in idx])
        else:
            # All mode with a fixed threshold: emitted iff d <= k
            idx = np.nonzero(d <= kk)[0]
            out.append([(int(i), int(i) + n, int(d[i])) for i in idx])
    return out
