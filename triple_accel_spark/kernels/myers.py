"""Batch Myers bit-parallel Levenshtein over NumPy uint64 bit-vectors.

Implements the published Myers (JACM 1999) bit-parallel edit-distance
algorithm with Hyyrö-style multi-word blocks, vectorized ACROSS a batch
of pairs: every DP step is a handful of uint64 bitwise ops on
``(batch, words)`` arrays. This is the engine's unit-cost fast path,
semantically equal to the reference's ``levenshtein`` /
``levenshtein_exp`` / ``levenshtein_simd_k`` with ``LEVENSHTEIN_COSTS``
(/root/reference/src/levenshtein.rs:677-684,1397-1399,1445-1454 —
same results; the reference uses banded anti-diagonal SIMD instead,
which is an execution detail, not a semantic one).

k-bounded behaviour: returns ``valid=False`` where distance > k, which
matches the reference's ``None`` (the reference's ``max_k`` clamp,
levenshtein.rs:399-426, is an upper bound on the true distance, so
``None`` iff ``dist > k``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from triple_accel_spark.kernels.encode import encode_batch

_ONES = np.uint64(0xFFFFFFFFFFFFFFFF)
_ONE = np.uint64(1)
_SHIFT63 = np.uint64(63)


def _build_peq(a_mat: np.ndarray, a_len: np.ndarray, words: int) -> np.ndarray:
    """Pattern-match bit table: ``peq[row, word, char]`` has bit ``j%64``
    set iff ``a[row][j] == char`` for ``j`` in word ``word``."""
    n = a_mat.shape[0]
    peq = np.zeros((n, words, 256), dtype=np.uint64)
    total = int(a_len.sum())
    if total == 0:
        return peq
    row_idx = np.repeat(np.arange(n), a_len)
    starts = np.concatenate(([0], np.cumsum(a_len)[:-1]))
    pos = np.arange(total) - np.repeat(starts, a_len)
    word = pos >> 6
    bit = (pos & 63).astype(np.uint64)
    chars = a_mat[row_idx, pos]
    np.bitwise_or.at(peq, (row_idx, word, chars), _ONE << bit)
    return peq


def myers_batch(
    a_rows: Sequence,
    b_rows: Sequence,
    k: int | np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Unit-cost Levenshtein distance for a batch of pairs.

    Returns ``(dist int64, valid bool)``; ``valid=False`` for null
    inputs or (when ``k`` is given) distances above ``k``. ``dist`` is
    always the true distance where inputs are non-null.
    """
    a_mat, a_len, a_ok = encode_batch(a_rows)
    b_mat, b_len, b_ok = encode_batch(b_rows)
    return myers_batch_encoded(a_mat, a_len, b_mat, b_len, a_ok & b_ok, k)


def myers_batch_encoded(
    a_mat: np.ndarray,
    a_len: np.ndarray,
    b_mat: np.ndarray,
    b_len: np.ndarray,
    valid: np.ndarray,
    k: int | np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Kernel core over pre-encoded batches (see ``encode_batch``).

    Pattern = the shorter string per pair (fewer words); text = the
    longer (edit distance is symmetric). One python-level loop over text
    positions; inner constant-size loop over the (few) 64-bit words.
    """
    n = a_mat.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=bool)

    # swap so pattern is the shorter string (reference swaps too,
    # levenshtein.rs:157-161)
    swap = a_len > b_len
    if swap.any():
        wa, wb = a_mat.shape[1], b_mat.shape[1]
        width = max(wa, wb)
        if wa < width:
            a_mat = np.pad(a_mat, ((0, 0), (0, width - wa)))
        if wb < width:
            b_mat = np.pad(b_mat, ((0, 0), (0, width - wb)))
        a_mat, b_mat = (
            np.where(swap[:, None], b_mat, a_mat),
            np.where(swap[:, None], a_mat, b_mat),
        )
        a_len, b_len = np.where(swap, b_len, a_len), np.where(swap, a_len, b_len)

    m_max = int(a_len.max()) if n else 0
    n_max = int(b_len.max()) if n else 0
    dist = np.zeros(n, dtype=np.int64)

    if m_max == 0:
        dist[:] = b_len
    else:
        words = (m_max + 63) >> 6
        peq = _build_peq(a_mat, a_len, words)

        vp = np.zeros((n, words), dtype=np.uint64)
        vn = np.zeros((n, words), dtype=np.uint64)
        # valid pattern bits start as VP=1 (column 0 scores 0..m)
        wrange = np.arange(words)
        bits_in_word = np.clip(a_len[:, None] - (wrange[None, :] << 6), 0, 64)
        full = bits_in_word >= 64
        vp = np.where(
            full,
            _ONES,
            np.where(
                bits_in_word > 0,
                (_ONE << bits_in_word.astype(np.uint64)) - _ONE,
                np.uint64(0),
            ),
        )

        score = a_len.astype(np.int64).copy()
        hi_word = np.maximum(a_len - 1, 0) >> 6
        hi_bit = (np.maximum(a_len - 1, 0) & 63).astype(np.uint64)
        row_ar = np.arange(n)
        empty_pat = a_len == 0

        for i in range(n_max):
            active = (i < b_len) & ~empty_pat
            if not active.any():
                break
            c = b_mat[:, i]
            eq = peq[row_ar[:, None], wrange[None, :], c[:, None]]  # (n, words)

            add_carry = np.zeros(n, dtype=np.uint64)
            hp_carry = np.ones(n, dtype=np.uint64)  # boundary: row 0 grows by 1
            hn_carry = np.zeros(n, dtype=np.uint64)
            new_vp = vp.copy()
            new_vn = vn.copy()
            hp_words = np.zeros((n, words), dtype=np.uint64)
            hn_words = np.zeros((n, words), dtype=np.uint64)

            for w in range(words):
                eqw = eq[:, w]
                vpw = vp[:, w]
                vnw = vn[:, w]
                x = eqw | vnw
                t = x & vpw
                s1 = vpw + t
                c1 = s1 < t
                s2 = s1 + add_carry
                c2 = s2 < add_carry
                add_carry = (c1 | c2).astype(np.uint64)
                d0 = (s2 ^ vpw) | x
                hp = vnw | ~(vpw | d0)
                hn = vpw & d0
                hp_words[:, w] = hp
                hn_words[:, w] = hn
                hp_out = hp >> _SHIFT63
                hn_out = hn >> _SHIFT63
                x2 = (hp << _ONE) | hp_carry
                hn_sh = (hn << _ONE) | hn_carry
                new_vn[:, w] = x2 & d0
                new_vp[:, w] = hn_sh | ~(x2 | d0)
                hp_carry = hp_out
                hn_carry = hn_out

            delta = (
                (hp_words[row_ar, hi_word] >> hi_bit) & _ONE
            ).astype(np.int64) - (
                (hn_words[row_ar, hi_word] >> hi_bit) & _ONE
            ).astype(np.int64)
            score = np.where(active, score + delta, score)
            act2 = active[:, None]
            vp = np.where(act2, new_vp, vp)
            vn = np.where(act2, new_vn, vn)

        dist = np.where(empty_pat, b_len.astype(np.int64), score)

    ok = valid.copy()
    if k is not None:
        ok &= dist <= k
    dist = np.where(valid, dist, -1)
    return dist, ok
