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

from triple_accel_spark.kernels.encode import bag_lower_bound, encode_batch

_ONES = np.uint64(0xFFFFFFFFFFFFFFFF)
_ONE = np.uint64(1)
_SHIFT63 = np.uint64(63)

_ABANDON_CHECK = 32  # banded-mode early-abandon check interval (positions)

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)
_S56 = np.uint64(56)


def _popcnt64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount for uint64 arrays (numpy<2 lacks
    ``bitwise_count``)."""
    x = x - ((x >> _ONE) & _M1)
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> _S56).astype(np.int64)


def _build_peq(
    a_mat: np.ndarray, a_len: np.ndarray, words: int, sigma: int = 256
) -> np.ndarray:
    """Pattern-match bit table, word-major ``(word, row, char)``: bit
    ``j%64`` set iff ``a[row][j] == char`` for ``j`` in word ``word`` —
    laid out so the per-step gather walks rows sequentially."""
    n = a_mat.shape[0]
    peq = np.zeros((words, n, sigma), dtype=np.uint64)
    total = int(a_len.sum())
    if total == 0:
        return peq
    row_idx = np.repeat(np.arange(n), a_len)
    starts = np.concatenate(([0], np.cumsum(a_len)[:-1]))
    pos = np.arange(total) - np.repeat(starts, a_len)
    word = pos >> 6
    bit = (pos & 63).astype(np.uint64)
    chars = a_mat[row_idx, pos]
    np.bitwise_or.at(peq, (word, row_idx, chars), _ONE << bit)
    return peq


def myers_batch(
    a_rows: Sequence,
    b_rows: Sequence,
    k: int | np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Unit-cost Levenshtein distance for a batch of pairs.

    Returns ``(dist int64, valid bool)``; ``valid=False`` for null
    inputs or (when ``k`` is given) distances above ``k``. ``dist`` is
    the true distance wherever ``valid`` is True; where the banded
    path proves only ``dist > k`` the row is invalid and ``dist``
    carries a sentinel above ``k`` — never read ``dist`` without
    checking ``valid``.
    """
    a_mat, a_len, a_ok = encode_batch(a_rows)
    b_mat, b_len, b_ok = encode_batch(b_rows)
    return myers_batch_encoded(a_mat, a_len, b_mat, b_len, a_ok & b_ok, k)


def _trim_common(a_mat, a_len, b_mat, b_len, _block: int = 64):
    """Strip the common prefix and suffix of every pair (exact for unit
    costs: ``d(Px, Py) = d(x, y)`` and symmetrically for suffixes —
    near-duplicate pairs, the ER hot path, shrink to their differing
    core). Returns compacted matrices + lengths.

    Scans in 64-column blocks with an early-out: a row leaves the
    active set at its first mismatch, so unrelated pairs (which
    mismatch almost immediately) cost one block instead of a full-width
    compare, and the expensive reversed-index suffix gathers touch only
    still-matching rows. When no row has a prefix trim and the widths
    would barely shrink, the rebuild is skipped: with ``p == 0``
    everywhere the suffix trim is just a length reduction, so the
    original matrices are returned with the shortened lengths (the
    per-row loop-bound benefit survives; only the width compaction is
    forgone)."""
    n = a_mat.shape[0]
    wa, wb = a_mat.shape[1], b_mat.shape[1]
    w = min(wa, wb)
    minlen = np.minimum(a_len, b_len)
    rows = np.arange(n)

    p = np.zeros(n, dtype=np.int64)
    act = rows
    lo = 0
    while lo < w and act.size:
        hi = min(lo + _block, w)
        cols = np.arange(lo, hi)
        sub = (
            a_mat[act[:, None], cols[None, :]]
            != b_mat[act[:, None], cols[None, :]]
        ) | (cols[None, :] >= minlen[act][:, None])
        has = sub.any(axis=1)
        p[act] = np.minimum(
            np.where(has, lo + np.argmax(sub, axis=1), hi), minlen[act]
        )
        act = act[~has]
        lo = hi
    if act.size:
        p[act] = minlen[act]

    rem = minlen - p
    s = np.zeros(n, dtype=np.int64)
    act = rows
    off = 0
    while act.size and off < w:
        hi = min(off + _block, w)
        cols = np.arange(off, hi)
        ai = np.maximum(a_len[act][:, None] - 1 - cols[None, :], 0)
        bi = np.maximum(b_len[act][:, None] - 1 - cols[None, :], 0)
        sub = (a_mat[act[:, None], ai] != b_mat[act[:, None], bi]) | (
            cols[None, :] >= rem[act][:, None]
        )
        has = sub.any(axis=1)
        s[act] = np.minimum(
            np.where(has, off + np.argmax(sub, axis=1), hi), rem[act]
        )
        act = act[~has]
        off = hi
    if act.size:
        s[act] = rem[act]

    na_len = a_len - p - s
    nb_len = b_len - p - s
    wa2 = max(int(na_len.max()), 1)
    wb2 = max(int(nb_len.max()), 1)
    if int(p.max()) == 0 and wa2 > 0.9 * wa and wb2 > 0.9 * wb:
        # rebuild-skip: returns the ORIGINAL matrices with shortened
        # lengths, so bytes past the new lengths hold live suffix chars
        # — the zero-padding invariant documented by encode_batch does
        # NOT hold on this path. Every current consumer is
        # length-aware; bag_l1 (which corrects histogram bin 0
        # assuming zero padding) must only run on pre-trim matrices.
        return a_mat, na_len, b_mat, nb_len
    ca = np.arange(wa2)
    cb = np.arange(wb2)
    na = np.where(
        ca[None, :] < na_len[:, None],
        a_mat[rows[:, None], np.minimum(p[:, None] + ca[None, :], wa - 1)],
        0,
    ).astype(np.uint8)
    nb = np.where(
        cb[None, :] < nb_len[:, None],
        b_mat[rows[:, None], np.minimum(p[:, None] + cb[None, :], wb - 1)],
        0,
    ).astype(np.uint8)
    return na, na_len, nb, nb_len


def myers_batch_encoded(
    a_mat: np.ndarray,
    a_len: np.ndarray,
    b_mat: np.ndarray,
    b_len: np.ndarray,
    valid: np.ndarray,
    k: int | np.ndarray | None = None,
    prefilter: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Kernel core over pre-encoded batches (see ``encode_batch``).

    Pattern = the shorter string per pair (fewer words); text = the
    longer (edit distance is symmetric). One python-level loop over text
    positions; inner constant-size loop over the (few) 64-bit words.
    Rows are processed sorted by text length so finished pairs drop out
    of the working arrays (a shrinking active suffix, not a mask).

    k-bounded calls first reject rows whose histogram lower bound
    (``bag_lower_bound``) already exceeds k — O(chars) per row versus
    O(chars * band) for the DP, which on reject-heavy candidate-pair
    workloads (the ER hot path: most pairs are far apart) skips the DP
    for the bulk of the batch. Callers that know the bound cannot fire
    (e.g. rows pre-split by the same bound) pass ``prefilter=False``.
    """
    n = a_mat.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=bool)

    if k is not None and prefilter:
        karr = (
            k.astype(np.int64)
            if isinstance(k, np.ndarray)
            else np.full(n, int(k), dtype=np.int64)
        )
        lb = bag_lower_bound(a_mat, a_len, b_mat, b_len)
        reject = valid & (lb > karr)
        if reject.any():
            keep = np.nonzero(~reject)[0]
            kk = karr[keep] if isinstance(k, np.ndarray) else k
            d_in, ok_in = myers_batch_encoded(
                a_mat[keep], a_len[keep], b_mat[keep], b_len[keep],
                valid[keep], kk, prefilter=False,
            )
            # rejected rows: proven dist > k -> invalid, sentinel above k
            dist = np.where(valid, karr + 1, np.int64(-1))
            ok = np.zeros(n, dtype=bool)
            dist[keep] = d_in
            ok[keep] = ok_in
            return dist, ok

    a_mat, a_len, b_mat, b_len = _trim_common(a_mat, a_len, b_mat, b_len)

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

    # rows sorted by text length: the i-loop then retires a PREFIX of
    # rows as i passes their text end, so every step operates on a
    # contiguous active slice instead of masking the whole batch
    order = np.argsort(b_len, kind="stable")
    a_mat, b_mat = a_mat[order], b_mat[order]
    a_len, b_len = a_len[order], b_len[order]

    m_max = int(a_len.max()) if n else 0
    n_max = int(b_len.max()) if n else 0
    # empty-pattern rows: distance is the text length — set here (not
    # inside the DP block) so an all-empty-pattern chunk is also right
    score = np.where(a_len == 0, b_len, a_len).astype(np.int64)

    if m_max > 0:
        # dense alphabet remap: the peq table is gathered once per text
        # position, so its footprint dominates cache behaviour — remap
        # the chunk's live bytes to 0..sigma so the table shrinks from
        # 256 columns to sigma+1 (ASCII corpora: ~95)
        lut = np.zeros(256, dtype=np.uint8)
        seen = np.zeros(256, dtype=bool)
        seen[a_mat.reshape(-1)] = True
        seen[b_mat.reshape(-1)] = True
        present = np.flatnonzero(seen)
        lut[present] = np.arange(len(present), dtype=np.uint8)
        a_mat = lut[a_mat]
        b_mat = lut[b_mat]

        words = (m_max + 63) >> 6
        sigma = int(len(present))
        peq = _build_peq(a_mat, a_len, words, sigma)  # (words, n, sigma)

        wrange = np.arange(words)
        bits_in_word = np.clip(a_len[None, :] - (wrange[:, None] << 6), 0, 64)
        # word-major (words, n): each word's lane is contiguous, so the
        # inner loop reads/writes whole cache-resident vectors
        vp = np.where(
            bits_in_word >= 64,
            _ONES,
            np.where(
                bits_in_word > 0,
                (_ONE << bits_in_word.astype(np.uint64)) - _ONE,
                np.uint64(0),
            ),
        )
        vn = np.zeros((words, n), dtype=np.uint64)
        bT = np.ascontiguousarray(b_mat.T)  # text chars, position-major

        hi_word = np.maximum(a_len - 1, 0) >> 6
        hi_bit = (np.maximum(a_len - 1, 0) & 63).astype(np.uint64)
        row_ar = np.arange(n, dtype=np.int64)
        sel_w = [hi_word == w for w in range(words)]
        empty_pat = a_len == 0

        # preallocated buffers: the whole inner loop runs without a
        # single heap allocation (allocation churn, not compute, was
        # the profiled bottleneck at high worker counts)
        U = [np.empty(n, dtype=np.uint64) for _ in range(11)]
        (b_eq, b_x, b_t, b_s, b_d0, b_hp, b_hn, b_x2, b_hs, b_cp, b_cn) = U
        add_c = np.empty(n, dtype=np.uint64)
        hi_hp = np.empty(n, dtype=np.uint64)
        hi_hn = np.empty(n, dtype=np.uint64)
        d64 = np.empty(n, dtype=np.int64)
        bb0 = np.empty(n, dtype=bool)
        bb1 = np.empty(n, dtype=bool)
        fidx = np.empty(n, dtype=np.int64)

        def step(
            i: int, lo: int, wlo: int, whi: int, capture_hi: bool, hi: int = n
        ):
            """One text position over the active rows [lo, hi), words
            [wlo, whi]. Returns final (hp_carry, hn_carry) out of word
            ``whi`` — the horizontal delta at that word's bottom row."""
            m = hi - lo
            sl = slice(lo, hi)
            fi = fidx[:m]
            np.multiply(row_ar[sl], sigma, out=fi)
            fi += bT[i, sl]

            ac = add_c[:m]
            ac.fill(0)
            hpc = b_cp[:m]
            hpc.fill(1)  # boundary/below-band: cost grows by 1 per char
            hnc = b_cn[:m]
            hnc.fill(0)
            hh_p = hi_hp[:m]
            hh_n = hi_hn[:m]
            eqw = b_eq[:m]
            x = b_x[:m]
            t = b_t[:m]
            s = b_s[:m]
            d0 = b_d0[:m]
            hp = b_hp[:m]
            hn = b_hn[:m]
            x2 = b_x2[:m]
            hs = b_hs[:m]
            c1 = bb0[:m]
            c2 = bb1[:m]

            for w in range(wlo, whi + 1):
                np.take(peq[w].reshape(-1), fi, out=eqw, mode="clip")
                vpw = vp[w, sl]
                vnw = vn[w, sl]
                np.bitwise_or(eqw, vnw, out=x)
                np.bitwise_and(x, vpw, out=t)
                np.add(vpw, t, out=s)
                np.less(s, t, out=c1)
                np.add(s, ac, out=s)
                np.less(s, ac, out=c2)
                np.logical_or(c1, c2, out=c1)
                np.copyto(ac, c1, casting="unsafe")
                np.bitwise_xor(s, vpw, out=d0)
                np.bitwise_or(d0, x, out=d0)
                np.bitwise_or(vpw, d0, out=hp)
                np.invert(hp, out=hp)
                np.bitwise_or(vnw, hp, out=hp)
                np.bitwise_and(vpw, d0, out=hn)
                if capture_hi:
                    sel = sel_w[w]
                    if w == 0 and words == 1:
                        np.copyto(hh_p, hp)
                        np.copyto(hh_n, hn)
                    else:
                        np.copyto(hh_p, hp, where=sel[sl])
                        np.copyto(hh_n, hn, where=sel[sl])
                np.left_shift(hp, _ONE, out=x2)
                np.bitwise_or(x2, hpc, out=x2)
                np.left_shift(hn, _ONE, out=hs)
                np.bitwise_or(hs, hnc, out=hs)
                np.right_shift(hp, _SHIFT63, out=hpc)
                np.right_shift(hn, _SHIFT63, out=hnc)
                np.bitwise_and(x2, d0, out=vn[w, sl])
                np.bitwise_or(x2, d0, out=x)
                np.invert(x, out=x)
                np.bitwise_or(hs, x, out=vp[w, sl])
            return hpc, hnc

        kmax = None
        if k is not None:
            kmax = int(np.max(k)) if isinstance(k, np.ndarray) else int(k)
            if kmax < 0:
                kmax = 0
        # banded mode (Ukkonen window over Myers blocks, as published in
        # edlib): only words intersecting the |i-j|<=k diagonal band are
        # computed; cells inside the band stay exact, so the k-bounded
        # contract (exact dist iff dist<=k, else invalid) is preserved
        # while work per text position drops from `words` to ~2k/64+2
        use_band = kmax is not None and ((2 * kmax) >> 6) + 2 < words

        if use_band:
            whi_cur = min(words - 1, kmax >> 6)
            bscore = np.minimum(
                np.int64(64) * np.int64(whi_cur + 1), a_len
            ).astype(np.int64)
            len_bad = (b_len - a_len) > kmax
            # early abandonment (the published edlib strategy adapted to
            # the batch axis): every _ABANDON_CHECK positions, recover
            # the exact in-band cell on each row's FINAL diagonal
            # (j = a_len - (b_len - t)) via the same vp/vn popcount
            # telescoping retire() uses. D is non-decreasing along a
            # diagonal, so that cell > k proves the final distance > k;
            # proven rows get the sentinel and are compacted out of the
            # working arrays so later steps do no work for them.
            pos = np.arange(n)  # compacted index -> sorted-order row
            k_sorted = (
                k.astype(np.int64)[order] if isinstance(k, np.ndarray) else None
            )
            n_act = n

            def retire(r0: int, r1: int, whi_r: int) -> None:
                """Convert bottom-of-window scores to pattern-end cells
                for rows [r0, r1): subtract the vertical vp/vn deltas
                between the pattern end and the window bottom."""
                if r0 >= r1:
                    return
                sl_r = slice(r0, r1)
                hw = hi_word[sl_r]
                hb = hi_bit[sl_r]
                mask = np.where(
                    hb >= _SHIFT63,
                    np.uint64(0),
                    _ONES << ((hb + _ONE) & _SHIFT63),
                )
                corr = np.zeros(r1 - r0, dtype=np.int64)
                for W in range(0, whi_r + 1):
                    vpw = vp[W, sl_r]
                    vnw = vn[W, sl_r]
                    at = hw == W
                    if at.any():
                        corr += np.where(
                            at,
                            _popcnt64(vpw & mask) - _popcnt64(vnw & mask),
                            0,
                        )
                    above = hw < W
                    if above.any():
                        corr += np.where(
                            above, _popcnt64(vpw) - _popcnt64(vnw), 0
                        )
                res = bscore[sl_r] - corr
                tgt = pos[sl_r]
                score[tgt] = np.where(
                    empty_pat[sl_r],
                    score[tgt],
                    np.where(len_bad[sl_r], np.int64(kmax + 1), res),
                )

            lo = 0
            i_chk = _ABANDON_CHECK
            for i in range(n_max):
                lo_new = int(np.searchsorted(b_len, i, side="right"))
                if lo_new > lo:
                    retire(lo, lo_new, whi_cur)
                    lo = lo_new
                if lo >= n_act:
                    break
                wlo = max(0, (i - kmax) >> 6)
                whi = min(words - 1, (i + kmax) >> 6)
                if whi > whi_cur:
                    # window slid down: extend the bottom-of-window
                    # score over the (still column-initial) new words
                    for W in range(whi_cur + 1, whi + 1):
                        bscore[lo:] += _popcnt64(vp[W, lo:]) - _popcnt64(
                            vn[W, lo:]
                        )
                    whi_cur = whi
                hpc, hnc = step(i, lo, wlo, whi, False, n_act)
                dd = d64[: n_act - lo]
                np.copyto(dd, hpc, casting="unsafe")
                dd -= hnc.view(np.int64)
                bscore[lo:] += dd

                if i >= i_chk:
                    i_chk = i + _ABANDON_CHECK
                    t = i + 1  # D-matrix text row after this step
                    sl = slice(lo, n_act)
                    j_d = a_len[sl] - (b_len[sl] - t)
                    # clamped rows (j_d<0, only while t < b_len-a_len
                    # <= kmax, so cell (t,0) is still in-band/exact):
                    # walking off-diagonal loses at most 1 per step
                    slack = np.maximum(-j_d, 0)
                    np.maximum(j_d, 0, out=j_d)
                    jw = j_d >> 6
                    jb = (j_d & 63).astype(np.uint64)
                    corr = np.zeros(n_act - lo, dtype=np.int64)
                    for W in range(int(jw.min()), whi_cur + 1):
                        vpw = vp[W, sl]
                        vnw = vn[W, sl]
                        at = jw == W
                        if at.any():
                            mask = _ONES << jb
                            corr += np.where(
                                at,
                                _popcnt64(vpw & mask) - _popcnt64(vnw & mask),
                                0,
                            )
                        above = jw < W
                        if above.any():
                            corr += np.where(
                                above, _popcnt64(vpw) - _popcnt64(vnw), 0
                            )
                    est = bscore[sl] - corr
                    thr = k_sorted[sl] if k_sorted is not None else kmax
                    bad = (est - slack > thr) & ~empty_pat[sl]
                    nbad = int(bad.sum())
                    # compact only when enough rows die to repay the
                    # copy (the peq slice is the expensive part)
                    if nbad >= 32 and nbad * 8 >= (n_act - lo):
                        score[pos[sl][bad]] = np.int64(kmax + 1)
                        keep_abs = lo + np.nonzero(~bad)[0]
                        a_len = a_len[keep_abs]
                        b_len = b_len[keep_abs]
                        bscore = bscore[keep_abs]
                        len_bad = len_bad[keep_abs]
                        empty_pat = empty_pat[keep_abs]
                        hi_word = hi_word[keep_abs]
                        hi_bit = hi_bit[keep_abs]
                        pos = pos[keep_abs]
                        if k_sorted is not None:
                            k_sorted = k_sorted[keep_abs]
                        vp = vp[:, keep_abs]
                        vn = vn[:, keep_abs]
                        peq = np.ascontiguousarray(peq[:, keep_abs, :])
                        bT = np.ascontiguousarray(bT[:, keep_abs])
                        lo = 0
                        n_act = keep_abs.size
                        if n_act == 0:
                            break
            retire(lo, n_act, whi_cur)
        else:
            for i in range(n_max):
                # retire rows whose text is exhausted (b_len <= i):
                # rows are b_len-sorted, so the active set is a suffix
                lo = int(np.searchsorted(b_len, i, side="right"))
                if lo >= n:
                    break
                m = n - lo
                sl = slice(lo, n)
                step(i, lo, 0, words - 1, capture_hi=True)

                hh_p = hi_hp[:m]
                hh_n = hi_hn[:m]
                hb = hi_bit[sl]
                dd = d64[:m]
                np.right_shift(hh_p, hb, out=hh_p)
                np.bitwise_and(hh_p, _ONE, out=hh_p)
                np.copyto(dd, hh_p, casting="unsafe")
                np.right_shift(hh_n, hb, out=hh_n)
                np.bitwise_and(hh_n, _ONE, out=hh_n)
                dd -= hh_n.view(np.int64)
                np.copyto(dd, 0, where=empty_pat[sl], casting="unsafe")
                score[sl] += dd

    # restore caller order
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    dist = score[inv]

    ok = valid.copy()
    if k is not None:
        ok &= dist <= k
    dist = np.where(valid, dist, -1)
    return dist, ok
