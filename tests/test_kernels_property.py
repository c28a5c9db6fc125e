"""Randomized property tests: batch kernels == scalar oracle.

Mirrors the reference's cross-implementation equivalence asserts
(benches/rand_benchmarks.rs:17-21,65-67,88-90,113-114) with a NumPy RNG
(fixed seed) instead of StdRng(1234)."""

from __future__ import annotations

import random

import pytest

from triple_accel_spark.kernels.banded import lev_batch
from triple_accel_spark.kernels.costs import (
    EditCosts,
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
)
from triple_accel_spark.kernels.hamming import hamming_batch, hamming_search_batch
from triple_accel_spark.kernels.myers import myers_batch
from triple_accel_spark.kernels.reference import (
    hamming,
    hamming_search,
    levenshtein,
    levenshtein_search,
)
from triple_accel_spark.kernels.search import lev_search_batch

COST_MODELS = [
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
    EditCosts(2, 3, 0, None),
    EditCosts(1, 1, 2, None),
    EditCosts(2, 1, 2, None),
    EditCosts(3, 2, 1, 2),
]


def _rand_pairs(rng, n, max_len, alpha=(33, 126)):
    out = []
    for _ in range(n):
        la, lb = rng.randint(0, max_len), rng.randint(0, max_len)
        out.append(
            (
                bytes(rng.randint(*alpha) for _ in range(la)),
                bytes(rng.randint(*alpha) for _ in range(lb)),
            )
        )
    return out


@pytest.mark.parametrize("costs", COST_MODELS)
def test_lev_batch_random_vs_oracle(costs):
    rng = random.Random(1234)
    pairs = _rand_pairs(rng, 120, 35, (97, 101))
    dist, ok, _ = lev_batch([p[0] for p in pairs], [p[1] for p in pairs], None, costs)
    assert ok.all()
    for i, (a, b) in enumerate(pairs):
        assert dist[i] == levenshtein(a, b, False, costs)[0]


def test_hamming_random_vs_oracle():
    rng = random.Random(5)
    rows = []
    for _ in range(200):
        length = rng.randint(0, 300)
        a = bytes(rng.randint(33, 126) for _ in range(length))
        b = bytearray(a)
        for _ in range(rng.randint(0, 10)):
            if b:
                b[rng.randrange(len(b))] = rng.randint(33, 126)
        rows.append((a, bytes(b)))
    dist, ok = hamming_batch([r[0] for r in rows], [r[1] for r in rows])
    assert ok.all()
    for i, (a, b) in enumerate(rows):
        assert dist[i] == hamming(a, b)


@pytest.mark.parametrize("st", ["all", "best"])
def test_hamming_search_random_vs_oracle(st):
    rng = random.Random(17)
    for _ in range(80):
        n = rng.randint(0, 8)
        needle = bytes(rng.randint(97, 100) for _ in range(n))
        hay = bytes(rng.randint(97, 100) for _ in range(rng.randint(0, 60)))
        k = rng.choice([None, 0, 1, 2])
        got = hamming_search_batch([needle], [hay], k, st)[0]
        want = [tuple(m) for m in hamming_search(needle, hay, k, st)]
        assert got == want, (needle, hay, k, st)


@pytest.mark.parametrize("costs", [LEVENSHTEIN_COSTS, RDAMERAU_COSTS,
                                   EditCosts(2, 1, 1, None)])
@pytest.mark.parametrize("st", ["all", "best"])
@pytest.mark.parametrize("anchored", [False, True])
def test_search_batch_random_vs_oracle(costs, st, anchored):
    rng = random.Random(31)
    needles, hays = [], []
    for _ in range(100):
        needles.append(bytes(rng.randint(97, 100) for _ in range(rng.randint(0, 5))))
        hays.append(bytes(rng.randint(97, 100) for _ in range(rng.randint(0, 25))))
    for k in (1, 2, None):
        got = lev_search_batch(needles, hays, k, st, costs, anchored)
        for i in range(len(needles)):
            want = [
                tuple(m)
                for m in levenshtein_search(needles[i], hays[i], k, st, costs, anchored)
            ]
            assert got[i] == want, (needles[i], hays[i], k, st, anchored)


def test_trace_cost_consistency():
    """Traces from the batch kernel must sum to the reported distance
    (linear-gap cost models) and be valid edit scripts."""
    rng = random.Random(77)
    for costs in [LEVENSHTEIN_COSTS, RDAMERAU_COSTS, EditCosts(2, 3, 0, None)]:
        pairs = _rand_pairs(rng, 40, 20, (97, 100))
        dist, ok, traces = lev_batch(
            [p[0] for p in pairs], [p[1] for p in pairs], None, costs, trace=True
        )
        for i, (a, b) in enumerate(pairs):
            cost = 0
            na = nb = 0
            for edit, count in traces[i]:
                if edit == "mismatch":
                    cost += count * costs.mismatch_cost
                    na += count
                    nb += count
                elif edit == "match":
                    na += count
                    nb += count
                elif edit == "a_gap":
                    cost += count * costs.gap_cost
                    nb += count
                elif edit == "b_gap":
                    cost += count * costs.gap_cost
                    na += count
                else:
                    cost += count * (costs.transpose_cost or 0)
                    na += 2 * count
                    nb += 2 * count
            assert cost == dist[i]
            assert na == len(a) and nb == len(b)
