"""Batch generalized-cost Levenshtein DP (affine gaps, OSA
transpositions, k cutoff, optional RLE traceback).

Semantics: the reference's ``levenshtein_simd_k_with_opts`` /
``levenshtein_naive_k_with_opts`` family
(/root/reference/src/levenshtein.rs:376-607,714-827), including
``rdamerau`` (OSA: adjacent transposition, no edits inside a transposed
pair — NOT full Damerau-Levenshtein). Returns invalid (NULL) where the
distance exceeds ``k`` — equivalent to the reference's ``None`` because
its ``max_k`` clamp (levenshtein.rs:399-426) is an upper bound on the
true distance.

Vectorization: the reference computes one pair per call and vectorizes
*within* the pair along DP anti-diagonals (SIMD registers). This kernel
computes a whole batch per call and vectorizes *across pairs and along
the longer string*: one Python-level loop over the shorter string's
positions; each step is a handful of NumPy ops on ``(batch, max_len+1)``
int64 arrays. The in-row affine-gap recurrence
``A[j] = min(dp[j-1]+open+gap, A[j-1]+gap)`` is evaluated without a
sequential scan via the classic prefix-min identity
``A[j] = open + gap + min_{j'<j}(T[j'] + (j-1-j')*gap)``
(= ``np.minimum.accumulate`` of ``T - gap*j``), valid because reopening
a gap from inside a gap can never beat extending it (open >= 0).

Tie-breaking for traceback pointers matches the reference's k-bounded
scalar core (levenshtein.rs:469-532): substitution wins ties, then
a-gap strictly below, then b-gap strictly below, then transpose wins
ties — with a/b swapped back for output when ``len(a) > len(b)``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from triple_accel_spark.kernels.costs import EditCosts, LEVENSHTEIN_COSTS
from triple_accel_spark.kernels.encode import bag_l1, encode_batch

INF = np.int64(1) << np.int64(40)

_SUB, _AGAP, _BGAP, _TRANS = 0, 1, 2, 3


def lev_batch(
    a_rows: Sequence,
    b_rows: Sequence,
    k: int | np.ndarray | None = None,
    costs: EditCosts = LEVENSHTEIN_COSTS,
    trace: bool = False,
) -> tuple[np.ndarray, np.ndarray, list[list[tuple[str, int]] | None] | None]:
    """Distance (and optional traceback) for a batch of pairs.

    Returns ``(dist int64, valid bool, traces)``; ``traces`` is None
    unless ``trace=True``, else a per-row list of run-length-encoded
    ``(edit, count)`` tuples with edit in
    ``match|mismatch|a_gap|b_gap|transpose``.
    """
    a_mat, a_len, a_ok = encode_batch(a_rows)
    b_mat, b_len, b_ok = encode_batch(b_rows)
    valid_in = a_ok & b_ok
    n = a_mat.shape[0]
    if n == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=bool),
            [] if trace else None,
        )

    # histogram prefilter for k-bounded non-trace calls: each sub
    # reduces the histogram L1 by <= 2 at cost `mismatch`, each indel
    # by <= 1 at cost >= `gap`, a transposition by 0 — so
    # cost >= L1 * min(mismatch, 2*gap) / 2; independently the length
    # difference needs |dl| gap extensions plus one gap open. Rows the
    # bound already proves > k skip the O(len^2/band) DP entirely
    # (reject-heavy candidate workloads are the common case).
    sel = None
    full = None
    if k is not None and not trace:
        karr = (
            k.astype(np.int64)
            if isinstance(k, np.ndarray)
            else np.full(n, int(k), dtype=np.int64)
        )
        m2g = min(int(costs.mismatch_cost), 2 * int(costs.gap_cost))
        dl = np.abs(a_len - b_len)
        lb = np.maximum(
            (bag_l1(a_mat, a_len, b_mat, b_len) * m2g + 1) // 2,
            dl * int(costs.gap_cost)
            + np.where(dl > 0, int(costs.start_gap_cost), 0),
        )
        reject = valid_in & (lb > karr)
        if reject.any():
            # dist for rejected rows: sentinel above k (contract: never
            # read dist without checking valid)
            full = (
                np.where(valid_in, karr + 1, np.int64(-1)),
                np.zeros(n, dtype=bool),
            )
            sel = np.nonzero(~reject)[0]
            if sel.size == 0:
                return full[0], full[1], None
            a_mat, a_len = a_mat[sel], a_len[sel]
            b_mat, b_len = b_mat[sel], b_len[sel]
            valid_in = valid_in[sel]
            if isinstance(k, np.ndarray):
                k = k[sel]
            n = sel.size

    # per-row swap so the "pattern" (outer loop) is the shorter string
    swap = a_len > b_len
    width = max(a_mat.shape[1], b_mat.shape[1])
    if a_mat.shape[1] < width:
        a_mat = np.pad(a_mat, ((0, 0), (0, width - a_mat.shape[1])))
    if b_mat.shape[1] < width:
        b_mat = np.pad(b_mat, ((0, 0), (0, width - b_mat.shape[1])))
    p_mat = np.where(swap[:, None], b_mat, a_mat)
    t_mat = np.where(swap[:, None], a_mat, b_mat)
    p_len = np.where(swap, b_len, a_len)
    t_len = np.where(swap, a_len, b_len)

    mis = np.int64(costs.mismatch_cost)
    gap = np.int64(costs.gap_cost)
    sg = np.int64(costs.start_gap_cost)
    tc = np.int64(costs.transpose_cost or 0)
    allow_t = costs.allow_transpose

    m_max = int(p_len.max())
    n_max = int(t_len.max())
    w = n_max + 1  # DP row width (over the longer string)
    jj = np.arange(w, dtype=np.int64)

    # row 0: gapping the text prefix
    dp1 = jj[None, :] * gap + np.where(jj[None, :] > 0, sg, 0)
    dp1 = np.broadcast_to(dp1, (n, w)).copy()
    dp0 = np.zeros_like(dp1)
    bgap = np.full((n, w), INF, dtype=np.int64)  # cross-row gap state

    result = np.full(n, -1, dtype=np.int64)
    done0 = p_len == 0
    result[done0] = dp1[done0, t_len[done0]]

    ptr = (
        np.zeros((m_max + 1, n, w), dtype=np.uint8) if trace else None
    )
    if trace:
        ptr[0, :, :] = _AGAP  # row 0: consume text chars

    # Ukkonen band (reference unit_k, levenshtein.rs:426,760-763): with a
    # cost budget k only columns |j - i| <= uk can host a <=k path, so
    # each row computes a 2*uk+1 slice. Out-of-window cells keep older
    # (row-0 / earlier-row) values, which only OVERestimate — safe, the
    # standard banded-DP surrogate; rows whose length difference exceeds
    # uk are invalid by construction (reference's early None,
    # levenshtein.rs:428-430). Tracing walks the full matrix, so the
    # band applies only to non-trace k-bounded calls.
    uk = None
    if k is not None and not trace:
        kmax = int(np.max(k)) if isinstance(k, np.ndarray) else int(k)
        # per-row cutoff for the early stop (rows with a smaller k than
        # the batch max die sooner); the band width itself stays global
        krow = (
            k.astype(np.int64)
            if isinstance(k, np.ndarray)
            else np.int64(kmax)
        )
        uk = max((kmax - int(sg)) // int(gap), 0)
        if 2 * uk + 3 >= w:
            uk = None

    rows = np.arange(n)
    for i in range(1, m_max + 1):
        live = i <= p_len
        if not live.any():
            break
        if uk is None:
            js = slice(0, w)
        else:
            js = slice(max(0, i - uk), min(w, i + uk + 1))
        lo, hi = js.start, js.stop
        jw = jj[js]
        pc = p_mat[:, i - 1][:, None]  # pattern char this row
        neq = (t_mat[:, max(lo - 1, 0):hi - 1] != pc).astype(np.int64) * mis
        sub = np.empty((n, hi - lo), dtype=np.int64)
        if lo == 0:
            sub[:, 0] = INF
            sub[:, 1:] = dp1[:, : hi - 1] + neq
        else:
            sub[:, :] = dp1[:, lo - 1 : hi - 1] + neq

        bgap[:, js] = np.minimum(
            dp1[:, js] + sg + gap, np.minimum(bgap[:, js] + gap, INF)
        )

        t_cand = np.minimum(sub, bgap[:, js])

        trans = None
        if allow_t and i > 1:
            # transpose: p[i-1]==t[j-2] and p[i-2]==t[j-1], cost dp0[j-2]+tc
            pc2 = p_mat[:, i - 2][:, None]
            cond = np.zeros((n, hi - lo), dtype=bool)
            first2 = max(2 - lo, 0)  # slice-local index of column j=2
            tl = t_mat[:, max(lo - 2, 0) : hi - 2]
            tr = t_mat[:, max(lo - 1, 1) : hi - 1]
            cond[:, first2:] = (tl == pc) & (tr == pc2)
            trans = np.full((n, hi - lo), INF, dtype=np.int64)
            dpl = dp0[:, max(lo - 2, 0) : hi - 2]
            trans[:, first2:] = np.where(cond[:, first2:], dpl + tc, INF)
            t_cand = np.minimum(t_cand, trans)

        # in-row gap (consume text char) via prefix-min identity;
        # accumulation starts at the window edge — columns left of the
        # band contribute nothing (INF), matching the reference window
        c = t_cand - jw[None, :] * gap
        pmin = np.minimum.accumulate(c, axis=1)
        agap = np.full((n, hi - lo), INF, dtype=np.int64)
        agap[:, 1:] = np.minimum(sg + gap * jw[None, 1:] + pmin[:, :-1], INF)

        dp2_w = np.minimum(t_cand, agap)
        dp2 = dp1.copy() if uk is not None else np.empty_like(dp1)
        dp2[:, js] = dp2_w
        if trace:  # trace implies uk is None: window == full width
            # reference pointer priority (levenshtein.rs:493-532):
            # start at sub; a_gap replaces if strictly less; b_gap
            # replaces if strictly less; transpose replaces on ties too
            ptr_row = np.full((n, w), _SUB, dtype=np.uint8)
            cur = sub
            ptr_row = np.where(agap < cur, np.uint8(_AGAP), ptr_row)
            cur = np.minimum(cur, agap)
            ptr_row = np.where(bgap < cur, np.uint8(_BGAP), ptr_row)
            cur = np.minimum(cur, bgap)
            if trans is not None:
                ptr_row = np.where(trans <= cur, np.uint8(_TRANS), ptr_row)
            ptr[i] = ptr_row

        grab = live & (p_len == i)
        if grab.any():
            result[grab] = dp2[grab, t_len[grab]]

        dp0, dp1 = dp1, np.where(live[:, None], dp2, dp1)

        if uk is not None and (i & 15) == 15:
            # Ukkonen early stop: any <=k path visits row i or i-1 (a
            # transpose can jump one row) inside its band; if both
            # rows' band minima exceed k the pair is proven > k. The
            # union window is conservative for each row — stale
            # neighbours can only under-estimate the minimum (safe).
            lo2 = max(0, i - 1 - uk)
            wmin = np.minimum(
                dp1[:, lo2:hi].min(axis=1), dp0[:, lo2:hi].min(axis=1)
            )
            dead = live & (wmin > krow)
            if dead.any():
                # drop from the live set; result stays -1 -> invalid
                p_len = np.where(dead, np.int64(0), p_len)

    if uk is not None:
        # outside-band extraction is undefined: a pair whose length
        # difference exceeds the band cannot cost <= k (reference's
        # early None, levenshtein.rs:428-430)
        result = np.where((t_len - p_len) > uk, np.int64(-1), result)

    valid = valid_in.copy()
    if k is not None:
        valid &= (result <= k) & (result >= 0)
    dist = np.where(valid_in, result, -1)

    if sel is not None:
        fd, fv = full
        fd[sel] = dist
        fv[sel] = valid
        return fd, fv, None

    traces: list[list[tuple[str, int]] | None] | None = None
    if trace:
        traces = []
        for r in range(n):
            if not valid[r]:
                traces.append(None)
                continue
            traces.append(
                _walk(ptr, r, int(p_len[r]), int(t_len[r]),
                      p_mat[r], t_mat[r], bool(swap[r]))
            )
    return dist, valid, traces


def _walk(
    ptr: np.ndarray,
    r: int,
    m: int,
    nn: int,
    p_row: np.ndarray,
    t_row: np.ndarray,
    swapped: bool,
) -> list[tuple[str, int]]:
    """Walk pointer matrix back from (m, n) and RLE-compress edits.

    In kernel orientation AGap consumes a text char, BGap a pattern
    char; when the operands were swapped the labels flip back so output
    is in terms of the original (a, b)."""
    i, j = m, nn
    edits: list[str] = []
    ag = "b_gap" if swapped else "a_gap"
    bg = "a_gap" if swapped else "b_gap"
    while i > 0 or j > 0:
        p = ptr[i, r, j]
        if p == _SUB:
            i -= 1
            j -= 1
            edits.append("match" if p_row[i] == t_row[j] else "mismatch")
        elif p == _AGAP:
            j -= 1
            edits.append(ag)
        elif p == _BGAP:
            i -= 1
            edits.append(bg)
        else:
            i -= 2
            j -= 2
            edits.append("transpose")
    edits.reverse()
    out: list[tuple[str, int]] = []
    for e in edits:
        if out and out[-1][0] == e:
            out[-1] = (e, out[-1][1] + 1)
        else:
            out.append((e, 1))
    return out
