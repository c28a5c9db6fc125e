"""Spark-free kernel micro-benchmark: single-thread NumPy-batch
throughput per kernel family, printed as one JSON line.

Purpose: a round-over-round kernel regression signal that is immune to
Spark/VM scheduling noise — the per-round bench measures the system
(Arrow exchange + scheduling + kernel); this isolates the kernel. Run:

    python scripts/kernel_bench.py

Corpus: deterministic printable-byte strings (the reference's own bench
corpus shape: random printable bytes, length 500, k = len/10 —
/root/reference/benches/rand_benchmarks.rs:8-14), unrelated pairs
(worst case: full-band work, no common-prefix trim win).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from triple_accel_spark.kernels.banded import lev_batch  # noqa: E402
from triple_accel_spark.kernels.costs import (  # noqa: E402
    EditCosts,
    LEVENSHTEIN_COSTS,
    RDAMERAU_COSTS,
)
from triple_accel_spark.kernels.hamming import hamming_batch  # noqa: E402
from triple_accel_spark.kernels.myers import myers_batch  # noqa: E402
from triple_accel_spark.kernels.search import lev_search_batch  # noqa: E402

N_PAIRS = 2000
LEN = 500
SEED = 1234


def corpus(n, length, rng):
    # printable bytes 33..126 (reference bench alphabet)
    return [
        bytes(rng.integers(33, 127, length, dtype=np.uint8).tobytes())
        for _ in range(n)
    ]


def bench(fn, n_items, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(n_items / best, 1)


def main() -> None:
    rng = np.random.default_rng(SEED)
    a = corpus(N_PAIRS, LEN, rng)
    b = corpus(N_PAIRS, LEN, rng)
    k = LEN // 10
    out = {"n_pairs": N_PAIRS, "str_len": LEN, "k": k, "unit": "pairs/sec"}

    out["myers_unit"] = bench(lambda: myers_batch(a, b), N_PAIRS)
    out["myers_banded_k"] = bench(lambda: myers_batch(a, b, k=k), N_PAIRS)
    # anagram pairs: b is a per-row shuffle of a — identical histograms,
    # so the bag-bound prefilter can never reject; isolates the banded
    # DP itself on reject-heavy input (true distance ~0.6*len >> k)
    anag = [
        bytes(rng.permutation(np.frombuffer(s, dtype=np.uint8)).tobytes())
        for s in a
    ]
    out["myers_banded_k_anagram"] = bench(
        lambda: myers_batch(a, anag, k=k), N_PAIRS
    )
    out["banded_generalized"] = bench(
        lambda: lev_batch(a, b, k, EditCosts(2, 3, 1)), N_PAIRS
    )
    out["banded_generalized_anagram"] = bench(
        lambda: lev_batch(a, anag, k, EditCosts(2, 3, 1)), N_PAIRS
    )
    out["banded_unit"] = bench(
        lambda: lev_batch(a, b, k, LEVENSHTEIN_COSTS), N_PAIRS
    )
    out["rdamerau"] = bench(lambda: lev_batch(a, b, k, RDAMERAU_COSTS), N_PAIRS)
    out["hamming"] = bench(lambda: hamming_batch(a, b), N_PAIRS)

    # search: short + long needles over 400-char haystacks, 5% planted
    hay = corpus(N_PAIRS, 400, rng)
    for nl in (12, 48):
        needles = [h[50 : 50 + nl] if i % 20 == 0 else c[:nl]
                   for i, (h, c) in enumerate(zip(hay, corpus(N_PAIRS, nl, rng)))]
        out[f"search_n{nl}"] = bench(
            lambda: lev_search_batch(
                np.array(needles, dtype=object), np.array(hay, dtype=object),
                nl // 4, "best", LEVENSHTEIN_COSTS, False,
            ),
            N_PAIRS,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
