"""Batch semi-global alignment search (fuzzy needle-in-haystack).

Semantics: the reference's ``levenshtein_search_*_with_opts`` family
(/root/reference/src/levenshtein.rs:1589-1838,1911-2451): Sellers-style
semi-global DP (free prefix shift unless anchored), a parallel
match-length matrix for longest-match tie-breaking (including the
reference's exact — and quirky — equal-cost comparisons), ``all`` /
``best`` modes with the tightening running threshold, the Best-mode
full-overlap replacement rule, and the empty-needle / anchored special
cases. Default ``k = ceil(len(needle)/2)``.

Vectorization: one DP step per (haystack position i, needle position j)
pair is required because both the cost *and the length tie-break* of
the in-row haystack-gap chain depend on the finalized previous cell.
Everything without an in-row dependency (substitution, needle-gap) is
computed as whole-row NumPy ops; the j loop runs over the needle only.
Cost model: O(len(needle)) Python iterations per haystack char,
vectorized across the batch — intended for short needles against long
haystacks (the reference benches needles at 1/10 of haystack length,
benches/rand_benchmarks.rs:39-43).

Unit-cost fast path (free-start AND anchored): a Myers bit-parallel
SEMI-GLOBAL scan (the reference's own SIMD search strategy,
levenshtein.rs:1911-2451 — first DP row free, or the global-boundary
carry-in for anchored mode; O(words) uint64 ops per haystack char
instead of O(len(needle)) DP cells; multi-word Hyyrö blocks for
needles of any length) computes the exact per-end-position cost for
the whole batch first; the quirk-exact DP (start positions, length tie-breaks,
Best-mode merge) then runs ONLY on rows that have at least one end
within k. Search over a corpus is hit-sparse, so the expensive
machinery touches a tiny fraction of rows; results are bit-identical
to the DP on every row by construction. Measured (1000-2000 rows,
400-800-char haystacks, 5% planted hits, k = len/10): 1.7x at
needle 12, 7.1x at 48, 4.5x at 128, 5.1x at 256 over DP-only.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from triple_accel_spark.kernels.costs import EditCosts, LEVENSHTEIN_COSTS
from triple_accel_spark.kernels.encode import encode_batch

INF = np.int64(1) << np.int64(40)

_ONES = np.uint64(0xFFFFFFFFFFFFFFFF)
_ONE = np.uint64(1)


def _semiglobal_any_hit(
    nd_mat: np.ndarray,
    nd_len: np.ndarray,
    hs_mat: np.ndarray,
    hs_len: np.ndarray,
    valid: np.ndarray,
    k_arr: np.ndarray,
    anchored: bool = False,
) -> np.ndarray:
    """Exact "does any end position cost <= k" per row, via the Myers
    bit-parallel semi-global recurrence (unit costs). Alignment-start
    modes: free start (word-0 horizontal carry-in 0 — D[i][0] = 0) or
    ``anchored`` (carry-in 1 per step, Myers's global-boundary ``| 1``
    injection — D[i][0] = i; scan bounded at m + k haystack chars,
    past which D[i][m] >= i - m > k always). The score column starts at
    m in both modes. Multi-word (Hyyrö block) for needles of any
    length; one batch-vectorized uint64 step per (haystack char,
    needle word); rows are scan-length-sorted so finished rows retire
    from a contiguous suffix."""
    n = nd_mat.shape[0]
    hit = np.zeros(n, dtype=bool)
    rows = np.nonzero(valid & (nd_len > 0))[0]
    if rows.size == 0:
        return hit
    # the fully-gapped match at position 0 (cost = needle length)
    hit[rows] = nd_len[rows] <= k_arr[rows]

    eff_len = hs_len.astype(np.int64)
    if anchored:
        eff_len = np.minimum(eff_len, nd_len.astype(np.int64) + k_arr)
    order = rows[np.argsort(eff_len[rows], kind="stable")]
    r = order.size
    m = nd_len[order]
    hl = eff_len[order]
    kk = k_arr[order]

    # dense alphabet remap shrinks the peq gather table
    lut = np.zeros(256, dtype=np.int64)
    present = np.union1d(np.unique(nd_mat[order]), np.unique(hs_mat[order]))
    lut[present] = np.arange(len(present))
    sigma = int(len(present))
    m_max = int(m.max())
    words = (m_max + 63) >> 6
    # peq[(w, row, char)]: bit j%64 set iff needle[row][j] == char
    peq = np.zeros((words, r, sigma), dtype=np.uint64)
    total = int(m.sum())
    if total:
        row_idx = np.repeat(np.arange(r), m)
        starts = np.concatenate(([0], np.cumsum(m)[:-1]))
        pos = np.arange(total) - np.repeat(starts, m)
        chars = lut[nd_mat[order][row_idx, pos]]
        np.bitwise_or.at(
            peq, (pos >> 6, row_idx, chars), _ONE << (pos & 63).astype(np.uint64)
        )

    hsT = lut[np.ascontiguousarray(hs_mat[order].T)]
    # vp bits set for positions < m within each word
    wrange = np.arange(words)
    bits_in_word = np.clip(m[None, :] - (wrange[:, None] << 6), 0, 64)
    vp = np.where(
        bits_in_word >= 64,
        _ONES,
        np.where(
            bits_in_word > 0,
            (_ONE << bits_in_word.astype(np.uint64)) - _ONE,
            np.uint64(0),
        ),
    )
    vn = np.zeros((words, r), dtype=np.uint64)
    score = m.astype(np.int64)
    hi_word = (np.maximum(m - 1, 0) >> 6).astype(np.int64)
    hi_bit = ((m - 1) & 63).astype(np.uint64)
    row_base = np.arange(r, dtype=np.int64) * sigma
    hit_local = np.zeros(r, dtype=bool)
    _S63 = np.uint64(63)

    n_max = int(hl.max())
    for i in range(n_max):
        lo = int(np.searchsorted(hl, i, side="right"))
        if lo >= r:
            break
        sl = slice(lo, r)
        w_hi = int(hi_word[sl].max())
        c = hsT[i, sl]
        fi = row_base[sl] + c
        ac = np.zeros(r - lo, dtype=np.uint64)
        # word-0 horizontal carry-in: 0 for free-start semi-global (an
        # alignment may begin at any text position), 1 for anchored
        # (every skipped haystack prefix char costs one deletion)
        if anchored:
            hpc = np.ones(r - lo, dtype=np.uint64)
        else:
            hpc = np.zeros(r - lo, dtype=np.uint64)
        hnc = np.zeros(r - lo, dtype=np.uint64)
        dd = np.zeros(r - lo, dtype=np.int64)
        for w in range(w_hi + 1):
            eq = peq[w].reshape(-1)[fi]
            vpw = vp[w, sl]
            vnw = vn[w, sl]
            x = eq | vnw
            t = x & vpw
            s = vpw + t
            c1 = s < t
            s = s + ac
            c2 = s < ac
            ac = (c1 | c2).astype(np.uint64)
            d0 = (s ^ vpw) | x
            hp = vnw | ~(d0 | vpw)
            hn = vpw & d0
            at = hi_word[sl] == w
            if at.any():
                dd = np.where(
                    at,
                    ((hp >> hi_bit[sl]) & _ONE).view(np.int64)
                    - ((hn >> hi_bit[sl]) & _ONE).view(np.int64),
                    dd,
                )
            x2 = (hp << _ONE) | hpc
            hs2 = (hn << _ONE) | hnc
            hpc = hp >> _S63
            hnc = hn >> _S63
            vn[w, sl] = x2 & d0
            vp[w, sl] = hs2 | ~(x2 | d0)
        score[sl] += dd
        hit_local[sl] |= score[sl] <= kk[sl]

    hit[order] |= hit_local
    return hit


def lev_search_batch(
    needle_rows: Sequence,
    haystack_rows: Sequence,
    k: int | None = None,
    search_type: str = "best",
    costs: EditCosts = LEVENSHTEIN_COSTS,
    anchored: bool = False,
) -> list[list[tuple[int, int, int]] | None]:
    """Fuzzy search per row: returns per row a list of
    ``(start, end, k)`` matches (or None for null inputs)."""
    costs.check_search()
    nd_mat, nd_len, nd_ok = encode_batch(needle_rows)
    hs_mat, hs_len, hs_ok = encode_batch(haystack_rows)
    n = nd_mat.shape[0]
    valid = nd_ok & hs_ok
    if n == 0:
        return []

    k_all = (
        ((nd_len >> 1) + (nd_len & 1)).astype(np.int64)
        if k is None
        else np.full(n, k, dtype=np.int64)
    )
    m_max_all = int(nd_len.max())
    if costs.is_unit and m_max_all > 0:
        hit = _semiglobal_any_hit(
            nd_mat, nd_len, hs_mat, hs_len, valid, k_all, anchored
        )
        hit |= nd_len == 0  # empty needles keep their DP special case
        out: list[list[tuple[int, int, int]] | None] = [None] * n
        for i in np.nonzero(valid)[0]:
            out[i] = []
        keep = np.nonzero(valid & hit)[0]
        if keep.size:
            sub = _lev_search_dp(
                nd_mat[keep], nd_len[keep], hs_mat[keep], hs_len[keep],
                np.ones(keep.size, dtype=bool), k_all[keep],
                search_type, costs, anchored,
            )
            for pos, i in enumerate(keep):
                out[i] = sub[pos]
        return out
    return _lev_search_dp(
        nd_mat, nd_len, hs_mat, hs_len, valid, k_all, search_type, costs, anchored
    )


def _lev_search_dp(
    nd_mat: np.ndarray,
    nd_len: np.ndarray,
    hs_mat: np.ndarray,
    hs_len: np.ndarray,
    valid: np.ndarray,
    k_arr: np.ndarray,
    search_type: str,
    costs: EditCosts,
    anchored: bool,
) -> list[list[tuple[int, int, int]] | None]:
    """Reference-exact DP core (costs, lengths, tie-break quirks,
    Best-mode merge) over pre-encoded batches."""
    n = nd_mat.shape[0]
    mis = np.int64(costs.mismatch_cost)
    gap = np.int64(costs.gap_cost)
    sg = np.int64(costs.start_gap_cost)
    tc = np.int64(costs.transpose_cost or 0)
    allow_t = costs.allow_transpose

    m_max = int(nd_len.max())
    # subset calls (fast-path survivors) can carry a wider encode
    # matrix than their own max needle length — the recurrences assume
    # nd_mat width == m_max
    if nd_mat.shape[1] != m_max:
        nd_mat = nd_mat[:, :m_max]
    w = m_max + 1
    jj = np.arange(w, dtype=np.int64)

    # per-row haystack iteration bound (levenshtein.rs:1650-1661)
    if anchored:
        iter_len = np.minimum(
            hs_len, nd_len + np.maximum(k_arr - sg, 0) // gap
        )
    else:
        iter_len = hs_len.copy()
    # rows with empty needles are special-cased at the end
    nonempty = nd_len > 0
    iter_len = np.where(nonempty & valid, iter_len, 0)
    n_max = int(iter_len.max()) if n else 0

    dp0 = np.zeros((n, w), dtype=np.int64)
    dp1 = jj[None, :] * gap + np.where(jj[None, :] > 0, sg, 0)
    dp1 = np.broadcast_to(dp1, (n, w)).copy()
    dp2 = np.zeros((n, w), dtype=np.int64)
    ng_dp = np.full((n, w), INF, dtype=np.int64)
    hg_dp = np.full((n, w), INF, dtype=np.int64)
    len0 = np.zeros((n, w), dtype=np.int64)
    len1 = np.zeros((n, w), dtype=np.int64)
    len2 = np.zeros((n, w), dtype=np.int64)
    ng_len = np.zeros((n, w), dtype=np.int64)
    hg_len = np.zeros((n, w), dtype=np.int64)

    rows = np.arange(n)
    curr_k = k_arr.copy()
    best = search_type == "best"
    hits: list[list[tuple[int, int, int]]] = [[] for _ in range(n)]

    # initial row: the fully-gapped needle at position 0
    init_cost = dp1[rows, nd_len]
    emit = nonempty & valid & (init_cost <= curr_k)
    if best:
        curr_k = np.where(emit, init_cost, curr_k)
    for r in np.nonzero(emit)[0]:
        hits[r].append((0, 0, int(init_cost[r])))

    for i in range(n_max):
        active = i < iter_len
        if not active.any():
            break
        hc = hs_mat[:, i][:, None] if i < hs_mat.shape[1] else np.zeros((n, 1), np.uint8)
        boundary = (
            np.int64(i + 1) * gap + sg if anchored else np.int64(0)
        )
        ng_dp[:, 0] = boundary
        dp2[:, 0] = boundary
        ng_len[:, 0] = 0
        len2[:, 0] = 0

        # vectorized over j: substitution and needle-gap (no in-row dep)
        sub_all = np.empty((n, w), dtype=np.int64)
        sub_all[:, 0] = INF
        sub_all[:, 1:] = dp1[:, :-1] + (nd_mat != hc).astype(np.int64) * mis

        new_gap = dp1 + sg + gap
        cont_gap = np.minimum(ng_dp + gap, INF)
        lt = new_gap < cont_gap
        gt = new_gap > cont_gap
        ng_len_new = np.where(
            lt, len1 + 1, np.where(gt, ng_len + 1, np.maximum(len1, ng_len) + 1)
        )
        ng_dp_new = np.minimum(new_gap, cont_gap)
        ng_dp[:, 1:] = ng_dp_new[:, 1:]
        ng_len[:, 1:] = ng_len_new[:, 1:]

        trans_all = None
        if allow_t and i > 0:
            hc_prev = hs_mat[:, i - 1][:, None]
            cond = np.zeros((n, w), dtype=bool)
            cond[:, 2:] = (nd_mat[:, 1:] == hc_prev) & (nd_mat[:, :-1] == hc)
            trans_all = np.where(cond, np.roll(dp0, 2, axis=1) + tc, INF)
            trans_len = np.roll(len0, 2, axis=1) + 2

        # in-row chain over the needle, vectorized across the batch
        for j in range(1, w):
            new_g = dp2[:, j - 1] + sg + gap
            cont_g = np.minimum(hg_dp[:, j - 1] + gap, INF)
            lt = new_g < cont_g
            gt = new_g > cont_g
            hg_len[:, j] = np.where(
                lt,
                len2[:, j - 1],
                np.where(gt, hg_len[:, j - 1],
                         np.maximum(len2[:, j - 1], hg_len[:, j - 1])),
            )
            hg_dp[:, j] = np.minimum(new_g, cont_g)

            d = ng_dp[:, j].copy()
            ln = ng_len[:, j].copy()
            # reference quirk: the equal-cost comparison uses
            # len2[j-1], not hg_len[j] (levenshtein.rs:1755-1760)
            repl = (hg_dp[:, j] < d) | ((hg_dp[:, j] == d) & (len2[:, j - 1] > ln))
            d = np.where(repl, hg_dp[:, j], d)
            ln = np.where(repl, hg_len[:, j], ln)

            sub = sub_all[:, j]
            sub_len = len1[:, j - 1] + 1
            repl = (sub < d) | ((sub == d) & (sub_len > ln))
            d = np.where(repl, sub, d)
            ln = np.where(repl, sub_len, ln)

            if trans_all is not None and j > 1:
                tr = trans_all[:, j]
                repl = tr <= d
                d = np.where(repl, tr, d)
                ln = np.where(repl, trans_len[:, j], ln)

            dp2[:, j] = d
            len2[:, j] = ln

        final_res = dp2[rows, nd_len]
        final_len = len2[rows, nd_len]

        act2 = active[:, None]
        dp0 = np.where(act2, dp1, dp0)
        dp1 = np.where(act2, dp2, dp1)
        len0 = np.where(act2, len1, len0)
        len1 = np.where(act2, len2, len1)

        emit = active & (final_res <= curr_k)
        if best:
            curr_k = np.where(emit, final_res, curr_k)
        for r in np.nonzero(emit)[0]:
            hits[r].append(
                (int(i + 1 - final_len[r]), i + 1, int(final_res[r]))
            )

    out: list[list[tuple[int, int, int]] | None] = []
    for r in range(n):
        if not valid[r]:
            out.append(None)
            continue
        if nd_len[r] == 0:
            out.append(
                _empty_needle(int(hs_len[r]), int(k_arr[r]), search_type,
                              costs, anchored)
            )
            continue
        ms = hits[r]
        if best:
            merged: list[tuple[int, int, int]] = []
            for m in ms:
                if merged and m[0] <= merged[-1][0]:
                    merged[-1] = m
                else:
                    merged.append(m)
            ck = int(curr_k[r])
            ms = [m for m in merged if m[2] == ck]
        out.append(ms)
    return out


def _empty_needle(
    hs_len: int, k: int, search_type: str, costs: EditCosts, anchored: bool
) -> list[tuple[int, int, int]]:
    """Empty-needle semantics (levenshtein.rs:1600-1644)."""
    if not anchored:
        return []
    if search_type == "best":
        return [(0, 0, 0)]
    out = [(0, 0, 0)]
    cost = costs.start_gap_cost
    for i in range(1, hs_len + 1):
        cost += costs.gap_cost
        if cost <= k:
            out.append((0, i, cost))
    return out
