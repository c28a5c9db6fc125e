"""Exact scalar ports of the reference algorithm *semantics*.

These are slow, simple, trusted-by-construction implementations used as
pytest oracles and as the behavioural spec for the vectorized batch
kernels. They reproduce, case for case, the outputs of the reference
library's scalar routines:

* ``hamming``                  — /root/reference/src/hamming.rs:36-47
* ``hamming_search``           — /root/reference/src/hamming.rs:96-146
* ``levenshtein``              — /root/reference/src/levenshtein.rs:148-319
  (full DP, affine gaps, OSA transpositions, RLE traceback with the
  reference's tie-breaking: on equal cost prefer transpose, then
  substitution, then a-gap, then b-gap)
* ``levenshtein_k``            — /root/reference/src/levenshtein.rs:376-607
  (returns None when the distance exceeds ``k``)
* ``levenshtein_search``       — /root/reference/src/levenshtein.rs:1589-1838
  (semi-global DP with per-cell match-length tracking, All/Best modes,
  anchored mode, Best-mode full-overlap replacement + min-k filter)

NOT copied code: the reference is Rust; these are fresh Python
implementations of the published algorithms, written to match the
reference's observable outputs (including tie-breaking quirks).
"""

from __future__ import annotations

from typing import Iterable, NamedTuple

from triple_accel_spark.kernels.costs import EditCosts, LEVENSHTEIN_COSTS

INF = float("inf")


class Match(NamedTuple):
    """One fuzzy-search hit: [start, end) window in the haystack with
    cost ``k`` (reference src/lib.rs:134-142)."""

    start: int
    end: int
    k: int


class Edit(NamedTuple):
    """Run-length-encoded traceback element
    (reference src/lib.rs:147-165). ``edit`` is one of
    ``match | mismatch | a_gap | b_gap | transpose``."""

    edit: str
    count: int


# traceback pointer codes
_SUB, _AGAP, _BGAP, _TRANS = 0, 1, 2, 3


def hamming(a: bytes, b: bytes) -> int:
    """Hamming distance; strings must have equal length
    (reference panics — we raise)."""
    if len(a) != len(b):
        raise ValueError("hamming requires equal-length strings")
    return sum(x != y for x, y in zip(a, b))


def hamming_search(
    needle: bytes,
    haystack: bytes,
    k: int | None = None,
    search_type: str = "best",
) -> list[Match]:
    """Sliding-window Hamming search (reference hamming.rs:96-146).

    Default ``k`` is ceil(len(needle)/2) (hamming.rs:71). ``best`` mode
    tightens the running threshold as better matches stream in, then
    keeps only matches at the final minimum cost.
    """
    n = len(needle)
    if k is None:
        k = (n >> 1) + (n & 1)
    if n > len(haystack):
        return []
    curr_k = k
    out: list[Match] = []
    for i in range(len(haystack) + 1 - n):
        d = 0
        ok = True
        for j in range(n):
            d += needle[j] != haystack[i + j]
            if d > curr_k:
                ok = False
                break
        if not ok:
            continue
        if search_type == "best":
            curr_k = d
        out.append(Match(i, i + n, d))
    if search_type == "best":
        out = [m for m in out if m.k == curr_k]
    return out


def _rle(edits: Iterable[str]) -> list[Edit]:
    res: list[Edit] = []
    for e in edits:
        if res and res[-1].edit == e:
            res[-1] = Edit(e, res[-1].count + 1)
        else:
            res.append(Edit(e, 1))
    return res


def levenshtein(
    a: bytes,
    b: bytes,
    trace_on: bool = False,
    costs: EditCosts = LEVENSHTEIN_COSTS,
) -> tuple[int, list[Edit] | None]:
    """Generalized edit distance with optional RLE traceback.

    Full-matrix DP equivalent to reference levenshtein.rs:148-319:
    operands swapped so ``len(a) <= len(b)``; affine gaps carried in
    separate gap-state rows with "saturating" (infinite) initial values;
    tie-break priority on equal cost: transpose >= sub > a_gap > b_gap.
    ``a_gap`` means a gap in (original) ``a``, i.e. a char of ``b`` is
    consumed unmatched.
    """
    swap = len(a) > len(b)
    aa, bb = (b, a) if swap else (a, b)
    m, n = len(aa), len(bb)
    mis, gap, sg = costs.mismatch_cost, costs.gap_cost, costs.start_gap_cost
    tc = costs.transpose_cost
    allow_t = tc is not None

    width = m + 1
    dp0 = [0.0] * width
    dp1 = [0.0] * width
    dp2 = [0.0] * width
    a_gap_dp = [INF] * width
    b_gap_dp = [INF] * width
    tb = [[0] * width for _ in range(n + 1)] if trace_on else None

    for j in range(width):
        dp1[j] = j * gap + (sg if j else 0)
        if trace_on:
            tb[0][j] = _BGAP

    for i in range(1, n + 1):
        a_gap_dp[0] = i * gap + sg
        dp2[0] = i * gap + sg
        if trace_on:
            tb[i][0] = _AGAP
        for j in range(1, width):
            sub = dp1[j - 1] + (aa[j - 1] != bb[i - 1]) * mis
            a_gap_dp[j] = min(dp1[j] + sg + gap, a_gap_dp[j] + gap)
            b_gap_dp[j] = min(dp2[j - 1] + sg + gap, b_gap_dp[j - 1] + gap)
            dp2[j] = a_gap_dp[j]
            ptr = _AGAP
            if b_gap_dp[j] < dp2[j]:
                dp2[j] = b_gap_dp[j]
                ptr = _BGAP
            if sub <= dp2[j]:
                dp2[j] = sub
                ptr = _SUB
            if (
                allow_t
                and i > 1
                and j > 1
                and aa[j - 1] == bb[i - 2]
                and aa[j - 2] == bb[i - 1]
            ):
                trans = dp0[j - 2] + tc
                if trans <= dp2[j]:
                    dp2[j] = trans
                    ptr = _TRANS
            if trace_on:
                tb[i][j] = ptr
        dp0, dp1, dp2 = dp1, dp2, dp0

    dist = int(dp1[m])
    if not trace_on:
        return dist, None

    edits: list[str] = []
    i, j = n, m
    while i > 0 or j > 0:
        p = tb[i][j]
        if p == _SUB:
            i -= 1
            j -= 1
            edits.append("match" if aa[j] == bb[i] else "mismatch")
        elif p == _AGAP:
            i -= 1
            edits.append("b_gap" if swap else "a_gap")
        elif p == _BGAP:
            j -= 1
            edits.append("a_gap" if swap else "b_gap")
        else:
            i -= 2
            j -= 2
            edits.append("transpose")
    edits.reverse()
    return dist, _rle(edits)


def max_k_clamp(len_a: int, len_b: int, k: int, costs: EditCosts) -> int:
    """Upper bound on the edit cost given string lengths
    (reference levenshtein.rs:399-423). Used to clamp oversized ``k``."""
    a_len, b_len = min(len_a, len_b), max(len_a, len_b)
    mis, gap, sg = costs.mismatch_cost, costs.gap_cost, costs.start_gap_cost
    bound = min(
        a_len * mis,
        (a_len << 1) * gap
        + (0 if a_len == 0 else sg + (sg if b_len == a_len else 0)),
    )
    return min(k, bound + (b_len - a_len) * gap + (0 if b_len == a_len else sg))


def levenshtein_k(
    a: bytes,
    b: bytes,
    k: int,
    trace_on: bool = False,
    costs: EditCosts = LEVENSHTEIN_COSTS,
) -> tuple[int, list[Edit] | None] | None:
    """k-bounded edit distance: ``None`` when the distance exceeds ``k``.

    The reference's banded variant (levenshtein.rs:376-607) returns None
    iff the true distance exceeds ``min(k, max_k_clamp)``; since the
    clamp is an upper bound on the true distance, that is equivalent to
    ``dist > k`` — which is what this oracle checks after a full DP.
    """
    dist, trace = levenshtein(a, b, trace_on, costs)
    if dist > k:
        return None
    return dist, trace


def levenshtein_search(
    needle: bytes,
    haystack: bytes,
    k: int | None = None,
    search_type: str = "best",
    costs: EditCosts = LEVENSHTEIN_COSTS,
    anchored: bool = False,
) -> list[Match]:
    """Semi-global fuzzy search (reference levenshtein.rs:1589-1838).

    DP columns index the needle; one row per haystack char. Unanchored
    mode gives free prefix shifts (row boundary cost 0); anchored mode
    charges gap costs for shifts. A parallel match-length matrix
    implements longest-match tie-breaking; ``best`` mode tightens the
    running threshold, replaces fully-overlapped earlier matches, and
    finally keeps only global-min-cost matches. Default
    ``k = ceil(len(needle)/2)`` (levenshtein.rs:1556).
    """
    n = len(needle)
    hn = len(haystack)
    if k is None:
        k = (n >> 1) + (n & 1)
    mis, gap, sg = costs.mismatch_cost, costs.gap_cost, costs.start_gap_cost
    tc = costs.transpose_cost
    allow_t = tc is not None

    if n == 0:
        if not anchored:
            return []
        if search_type == "best":
            return [Match(0, 0, 0)]
        out = [Match(0, 0, 0)]
        cost = sg
        for i in range(1, hn + 1):
            cost += gap
            if cost <= k:
                out.append(Match(0, i, cost))
        return out

    costs.check_search()

    width = n + 1
    iter_len = (
        min(hn, n + max(k - sg, 0) // gap) if anchored else hn
    )

    dp0 = [0.0] * width
    dp1 = [j * gap + (sg if j else 0) for j in range(width)]
    dp2 = [0.0] * width
    ng_dp = [INF] * width  # gap in needle (consume haystack char)
    hg_dp = [INF] * width  # gap in haystack (consume needle char)
    len0 = [0] * width
    len1 = [0] * width
    len2 = [0] * width
    ng_len = [0] * width
    hg_len = [0] * width

    curr_k = k
    raw: list[Match] = []

    # initial row: matching the needle entirely with gaps at position 0
    if dp1[n] <= curr_k:
        if search_type == "best":
            curr_k = int(dp1[n])
        raw.append(Match(0, 0, int(dp1[n])))

    for i in range(iter_len):
        boundary = (i + 1) * gap + sg if anchored else 0
        ng_dp[0] = boundary
        dp2[0] = boundary
        ng_len[0] = 0
        len2[0] = 0
        for j in range(1, width):
            sub = dp1[j - 1] + (needle[j - 1] != haystack[i]) * mis

            new_gap = dp1[j] + sg + gap
            cont_gap = ng_dp[j] + gap
            if new_gap < cont_gap:
                ng_dp[j] = new_gap
                ng_len[j] = len1[j] + 1
            elif new_gap > cont_gap:
                ng_dp[j] = cont_gap
                ng_len[j] += 1
            else:
                ng_dp[j] = cont_gap
                ng_len[j] = max(len1[j], ng_len[j]) + 1

            new_gap = dp2[j - 1] + sg + gap
            cont_gap = hg_dp[j - 1] + gap
            if new_gap < cont_gap:
                hg_dp[j] = new_gap
                hg_len[j] = len2[j - 1]
            elif new_gap > cont_gap:
                hg_dp[j] = cont_gap
                hg_len[j] = hg_len[j - 1]
            else:
                hg_dp[j] = cont_gap
                hg_len[j] = max(len2[j - 1], hg_len[j - 1])

            dp2[j] = ng_dp[j]
            len2[j] = ng_len[j]
            # NOTE: the equal-cost comparison uses len2[j-1], not
            # hg_len[j] — reproduced verbatim from the reference
            # (levenshtein.rs:1755-1760)
            if hg_dp[j] < dp2[j] or (hg_dp[j] == dp2[j] and len2[j - 1] > len2[j]):
                dp2[j] = hg_dp[j]
                len2[j] = hg_len[j]
            if sub < dp2[j] or (sub == dp2[j] and len1[j - 1] + 1 > len2[j]):
                dp2[j] = sub
                len2[j] = len1[j - 1] + 1
            if (
                allow_t
                and i > 0
                and j > 1
                and needle[j - 1] == haystack[i - 1]
                and needle[j - 2] == haystack[i]
            ):
                trans = dp0[j - 2] + tc
                if trans <= dp2[j]:
                    dp2[j] = trans
                    len2[j] = len0[j - 2] + 2
        final_res = dp2[n]
        final_length = len2[n]
        dp0, dp1, dp2 = dp1, dp2, dp0
        len0, len1, len2 = len1, len2, len0
        if final_res <= curr_k:
            if search_type == "best":
                curr_k = int(final_res)
            raw.append(Match(i + 1 - final_length, i + 1, int(final_res)))

    if search_type == "best":
        merged: list[Match] = []
        for m in raw:
            if merged and m.start <= merged[-1].start:
                merged[-1] = m  # replace fully-overlapped earlier match
            else:
                merged.append(m)
        return [m for m in merged if m.k == curr_k]
    return raw
