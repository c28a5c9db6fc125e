"""The compat surface: every reference public fn exists by name and
agrees with its canonical twin on a live DataFrame."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from triple_accel_spark.functions import compat

REFERENCE_API = [
    # lib.rs re-exports + every pub fn in hamming.rs / levenshtein.rs
    "hamming", "hamming_naive", "hamming_words_64", "hamming_words_128",
    "hamming_simd_parallel", "hamming_simd_movemask",
    "hamming_search", "hamming_search_naive",
    "hamming_search_naive_with_opts", "hamming_search_simd",
    "hamming_search_simd_with_opts",
    "levenshtein", "levenshtein_naive", "levenstein_naive_str",
    "levenshtein_naive_with_opts", "levenshtein_naive_k",
    "levenshtein_naive_k_with_opts", "levenshtein_simd_k",
    "levenshtein_simd_k_str", "levenshtein_simd_k_with_opts",
    "levenshtein_exp", "levenshtein_exp_with_opts",
    "rdamerau", "rdamerau_exp",
    "levenshtein_search", "levenshtein_search_naive",
    "levenshtein_search_naive_with_opts", "levenshtein_search_simd",
    "levenshtein_search_simd_with_opts",
]


def test_every_reference_symbol_exists():
    missing = [n for n in REFERENCE_API if not callable(getattr(compat, n, None))]
    assert not missing, missing


def test_variant_tiers_agree(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("abcd", "abcd"), ("", "xy")],
        "a string, b string",
    )
    got = df.select(
        compat.levenshtein("a", "b").alias("lev"),
        compat.levenshtein_naive("a", "b").alias("naive"),
        compat.levenshtein_exp("a", "b").alias("exp"),
        compat.levenshtein_simd_k("a", "b", 10).alias("simd_k"),
        compat.rdamerau("a", "b").alias("osa"),
        compat.rdamerau_exp("a", "b").alias("osa_exp"),
        F.levenshtein("a", "b").alias("builtin"),
    ).collect()
    for r in got:
        assert r["lev"] == r["naive"] == r["exp"] == r["simd_k"] == r["builtin"]
        assert r["osa"] == r["osa_exp"]


def test_hamming_tiers_agree(spark):
    df = spark.createDataFrame([("karolin", "kathrin"), ("aa", "ab")], "a string, b string")
    got = df.select(
        compat.hamming("a", "b").alias("h"),
        compat.hamming_naive("a", "b").alias("hn"),
        compat.hamming_words_64("a", "b").alias("h64"),
        compat.hamming_simd_parallel("a", "b").alias("hs"),
    ).collect()
    assert [r["h"] for r in got] == [3, 1]
    for r in got:
        assert r["h"] == r["hn"] == r["h64"] == r["hs"]


def test_search_tiers_agree(spark):
    df = spark.createDataFrame(
        [("abc", "xxabcyyaXczz"), ("q", "qqq")], "n string, h string"
    )
    got = df.select(
        compat.levenshtein_search("n", "h").alias("s1"),
        compat.levenshtein_search_simd("n", "h").alias("s2"),
        compat.hamming_search("n", "h").alias("hs"),
    ).collect()
    for r in got:
        assert r["s1"] == r["s2"]
        assert r["s1"] is not None and len(r["s1"]) >= 1
