"""The rdamerau_natural DuckDB oracle must implement OSA, not plain
Levenshtein: the driver compare on natural text would pass either way
if transpositions never fire, so this guard runs the recursive-CTE SQL
over a corpus of PLANTED adjacent swaps (where OSA is strictly below
Levenshtein) and checks it against the scalar reference kernel
pair-for-pair. Spark-free — DuckDB + the Python oracle only."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from triple_accel_spark.kernels.costs import RDAMERAU_COSTS
from triple_accel_spark.kernels.reference import levenshtein as ref_lev


def _osa(a: str, b: str) -> int:
    cost, _ = ref_lev(a.encode(), b.encode(), costs=RDAMERAU_COSTS)
    return int(cost)


def _lev(a: str, b: str) -> int:
    from triple_accel_spark.kernels.costs import LEVENSHTEIN_COSTS

    cost, _ = ref_lev(a.encode(), b.encode(), costs=LEVENSHTEIN_COSTS)
    return int(cost)


@pytest.fixture(scope="module")
def swap_corpus():
    """Adjacent docs differ by adjacent swaps (plus assorted edits), so
    the transpose branch fires on most pairs."""
    base = "the quick brown fox jumps over"
    docs = [base]
    docs.append("hte quick brown fox jumps over")      # swap at 0
    docs.append("hte quikc brown fox jumps over")      # two swaps
    docs.append("the quick brwon fox jmups over")      # two swaps elsewhere
    docs.append("the quick brown fox jumps ovre")      # swap at end
    docs.append("teh qucik brwon fxo jupms voer")      # swaps everywhere
    docs.append("a completely different sentence !")   # unrelated
    docs.append("ab")
    docs.append("ba")                                  # pure transposition
    docs.append("b")                                   # deletion boundary
    return docs


def test_osa_cte_matches_reference_on_swaps(swap_corpus):
    sql = entrymod.oracle_sql()["rdamerau_natural"]
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(swap_corpus))
    )
    got = {(r[0], r[1]): r[2] for r in con.sql(sql).fetchall()}
    assert len(got) == len(swap_corpus) - 1
    transpose_strictly_better = 0
    for i in range(len(swap_corpus) - 1):
        a, b = swap_corpus[i][:30], swap_corpus[i + 1][:30]
        want = _osa(a, b)
        assert got[(i, i + 1)] == want, (a, b)
        if want < _lev(a, b):
            transpose_strictly_better += 1
    # the guard is only meaningful if the transpose branch actually won
    # somewhere (OSA strictly below Levenshtein)
    assert transpose_strictly_better >= 4


def test_osa_cte_matches_reference_on_random_strings():
    # dense random coverage on a 2-letter alphabet (maximal transpose
    # density): the CTE must equal the scalar reference OSA on every
    # adjacent pair. Deterministic LCG, no external entropy.
    def lcg(seed):
        x = seed
        while True:
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            yield x

    g = lcg(12345)
    docs = []
    for _ in range(40):
        n = next(g) % 13
        docs.append("".join("ab"[next(g) % 2] for _ in range(n)))
    # DuckDB's recursive CTE needs non-empty sb lists (lb >= 0 works:
    # range(0, 1) = [0]); empty strings are legal inputs
    sql = entrymod.oracle_sql()["rdamerau_natural"]
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(docs))
    )
    got = {(r[0], r[1]): r[2] for r in con.sql(sql).fetchall()}
    for i in range(len(docs) - 1):
        a, b = docs[i][:30], docs[i + 1][:30]
        assert got[(i, i + 1)] == _osa(a, b), (a, b, got[(i, i + 1)])
