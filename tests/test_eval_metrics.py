"""B-cubed cluster evaluation (operators/scoring.py): hand-computed
example from the Bagga & Baldwin formulation, plus identity/degenerate
partitions."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def frames(spark):
    # pred: {a,b,c}, {d,e}; truth: {a,b}, {c,d,e}
    pred = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 2), ("e", 2)],
        "id string, cluster_id long",
    )
    truth = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 20), ("d", 20), ("e", 20)],
        "id string, true_id long",
    )
    return pred, truth


def test_bcubed_hand_computed(spark, frames):
    from triple_accel_spark.operators.scoring import bcubed

    pred, truth = frames
    # per record precision: a,b = 2/3; c = 1/3; d,e = 1 -> mean 11/15
    # per record recall:    a,b = 1;   c = 1/3; d,e = 2/3 -> mean 11/15
    m = bcubed(pred, truth)
    assert m["n_records"] == 5
    assert abs(m["bcubed_precision"] - 11 / 15) < 1e-12
    assert abs(m["bcubed_recall"] - 11 / 15) < 1e-12
    assert abs(m["bcubed_f1"] - 11 / 15) < 1e-12


def test_bcubed_rows_counts(spark, frames):
    from triple_accel_spark.operators.scoring import bcubed_rows

    pred, truth = frames
    rows = {
        (r.cluster_id, r.true_id): (r.n_ct, r.n_c, r.n_t)
        for r in bcubed_rows(pred, truth).collect()
    }
    assert rows == {
        (1, 10): (2, 3, 2),
        (1, 20): (1, 3, 3),
        (2, 20): (2, 2, 3),
    }


def test_bcubed_identity_and_degenerate(spark, frames):
    from pyspark.sql import functions as F

    from triple_accel_spark.operators.scoring import bcubed

    pred, truth = frames
    # identical partitions -> all three metrics 1.0
    same = truth.select("id", F.col("true_id").alias("cluster_id"))
    m = bcubed(same, truth)
    assert m["bcubed_precision"] == m["bcubed_recall"] == 1.0
    # all-singletons prediction: precision 1, recall = mean(1/|L(e)|)
    singles = truth.select("id", F.monotonically_increasing_id().alias("cluster_id"))
    m = bcubed(singles, truth)
    assert m["bcubed_precision"] == 1.0
    assert abs(m["bcubed_recall"] - (2 * (1 / 2) + 3 * (1 / 3)) / 5) < 1e-12
    # records missing from one side are excluded (join on id)
    m = bcubed(pred.where(F.col("id") != "e"), truth)
    assert m["n_records"] == 4
